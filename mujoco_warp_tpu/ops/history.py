"""Time-delay history buffers for actuator ctrl and sensor readings.

TPU-native counterpart of reference mujoco_warp/_src/history.py: circular
time-indexed buffers in ``d.history`` (nhistory,) with per-channel layout
``[unused, cursor, times[n], values[n·dim]]`` (matching MuJoCo C), binary
search on time, and ZOH/linear/cubic (Catmull-Rom) interpolation.

Functional JAX style: inserts/reads are pure ops on the history array.
Channels are few and have static (offset, n, dim), so each is processed
with a statically-unrolled vectorized block; the time search is a masked
argmin over the n samples instead of a sequential binary search (n is
small — typically <64 — so the O(n) lane-parallel scan beats divergent
binary search on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import types

_EPS = 1e-6


def _phys(cursor, n, logical):
  return (cursor + 1 + logical) % n


def _read_channel(hist, offset, n, dim, t, interp):
  """Interpolated read of one channel at time t; returns (dim,) vector."""
  cursor = hist[offset + 1].astype(jnp.int32)
  times = jax.lax.dynamic_slice(hist, (offset + 2,), (n,))
  values = jax.lax.dynamic_slice(hist, (offset + 2 + n,), (n * dim,))
  values = values.reshape(n, dim)

  logical = jnp.arange(n)
  phys = _phys(cursor, n, logical)
  t_sorted = times[phys]  # oldest..newest
  v_sorted = values[phys]

  # find smallest logical i with t_sorted[i] >= t (lane-parallel scan)
  ge = t_sorted >= t
  i = jnp.argmax(ge)  # first True; if none, argmax=0 → handle below
  none_ge = ~jnp.any(ge)
  i = jnp.where(none_ge, n, i)

  t_old, t_new = t_sorted[0], t_sorted[n - 1]
  v_old, v_new = v_sorted[0], v_sorted[n - 1]

  ic = jnp.clip(i, 1, n - 1)
  t_lo = t_sorted[ic - 1]
  t_hi = t_sorted[ic]
  v_lo = v_sorted[ic - 1]
  v_hi = v_sorted[ic]
  dt = jnp.maximum(t_hi - t_lo, _EPS)
  alpha = (t - t_lo) / dt

  if interp == 0:  # zero-order hold
    v = v_lo
  elif interp == 1:  # linear
    v = v_lo + alpha * (v_hi - v_lo)
  else:  # cubic Catmull-Rom with zero end slopes
    a2 = alpha * alpha
    a3 = a2 * alpha
    h00 = 2 * a3 - 3 * a2 + 1
    h10 = a3 - 2 * a2 + alpha
    h01 = -2 * a3 + 3 * a2
    h11 = a3 - a2
    im2 = jnp.clip(ic - 2, 0, n - 1)
    ip1 = jnp.clip(ic + 1, 0, n - 1)
    m_lo = jnp.where(ic > 1,
                     (v_hi - v_sorted[im2]) /
                     jnp.maximum(t_hi - t_sorted[im2], _EPS), 0.0)
    m_hi = jnp.where(ic < n - 1,
                     (v_sorted[ip1] - v_lo) /
                     jnp.maximum(t_sorted[ip1] - t_lo, _EPS), 0.0)
    v = h00 * v_lo + h10 * dt * m_lo + h01 * v_hi + h11 * dt * m_hi

  v = jnp.where(jnp.abs(t - t_hi) < _EPS, v_hi, v)
  v = jnp.where(t <= t_old + _EPS, v_old, v)
  v = jnp.where(t >= t_new - _EPS, v_new, v)
  return v


def _insert_channel(hist, offset, n, dim, t, value):
  """Insert (dim,) value at time t into one channel (circular advance)."""
  cursor = hist[offset + 1].astype(jnp.int32)
  times = jax.lax.dynamic_slice(hist, (offset + 2,), (n,))
  newest = times[cursor]
  # exact-match overwrite of the newest sample, else advance cursor
  advance = jnp.abs(t - newest) >= _EPS
  new_cursor = jnp.where(advance, (cursor + 1) % n, cursor)
  hist = hist.at[offset + 1].set(new_cursor.astype(hist.dtype))
  hist = jax.lax.dynamic_update_slice(hist, t[None].astype(hist.dtype),
                                      (offset + 2 + new_cursor,))
  hist = jax.lax.dynamic_update_slice(
      hist, value.astype(hist.dtype), (offset + 2 + n + new_cursor * dim,))
  return hist


def insert_ctrl_history(m: types.Model, d: types.Data) -> types.Data:
  """Insert current ctrl values (reference: history.py:531)."""
  if m.nhistory == 0 or not m.nu:
    return d
  hist = d.history
  for u in range(m.nu):
    n = int(m.actuator_history[u, 0])
    if n == 0:
      continue
    off = int(m.actuator_historyadr[u])
    hist = _insert_channel(hist, off, n, 1, d.time, d.ctrl[u][None])
  return d.replace(history=hist)


def read_ctrl_delayed(m: types.Model, d: types.Data) -> jax.Array:
  """Delayed ctrl per actuator (reference: history.py:361)."""
  if m.nhistory == 0 or not m.nu:
    return d.ctrl
  ctrl = d.ctrl
  for u in range(m.nu):
    n = int(m.actuator_history[u, 0])
    delay = float(m.actuator_delay[u])
    if n == 0 or delay == 0.0:
      continue
    interp = int(m.actuator_history[u, 1])
    off = int(m.actuator_historyadr[u])
    v = _read_channel(d.history, off, n, 1, d.time - delay, interp)
    ctrl = ctrl.at[u].set(v[0])
  return ctrl


def apply_sensor_delay(m: types.Model, d: types.Data) -> types.Data:
  """Replace fresh sensordata with delayed reads, insert fresh values.

  Reference: history.py:549 `apply_sensor_delay` — read-then-insert order
  matches MuJoCo C (delayed read happens before the fresh insert).
  Interval sampling: when sensor_interval[s] > 0 the fresh value is only
  inserted on the interval grid; reads use ZOH between samples.
  """
  if m.nhistory == 0 or not m.nsensor:
    return d
  sd = d.sensordata
  hist = d.history
  for s in range(m.nsensor):
    n = int(m.sensor_history[s, 0])
    if n == 0:
      continue
    delay = float(m.sensor_delay[s])
    interval = float(np.asarray(m.sensor_interval)[s].flat[0])
    interp = int(m.sensor_history[s, 1])
    off = int(m.sensor_historyadr[s])
    adr = int(m.sensor_adr[s])
    dim = int(m.sensor_dim[s])
    fresh = jax.lax.dynamic_slice(sd, (adr,), (dim,))
    delayed = _read_channel(hist, off, n, dim, d.time - delay, interp)
    sd = jax.lax.dynamic_update_slice(sd, delayed, (adr,))
    if interval > 0:
      # insert only on the interval grid (within half a timestep)
      dt = m.opt.timestep
      phase = jnp.mod(d.time + 0.5 * dt, interval)
      on_grid = phase < dt
      hist_new = _insert_channel(hist, off, n, dim, d.time, fresh)
      hist = jax.tree.map(
          lambda new, old: jnp.where(on_grid, new, old), hist_new, hist)
    else:
      hist = _insert_channel(hist, off, n, dim, d.time, fresh)
  return d.replace(sensordata=sd, history=hist)


def init_history(m: types.Model, d: types.Data) -> types.Data:
  """Prefill history with the current ctrl/sensor values at early times
  (reference: init_ctrl_history:796, init_sensor_history:881)."""
  if m.nhistory == 0:
    return d
  hist = d.history
  dtype = hist.dtype

  def prefill(hist, off, n, dim, value):
    # monotonically increasing ancient timestamps so reads extrapolate
    times = (-1e9 + np.arange(n)).astype(np.float32)
    hist = jax.lax.dynamic_update_slice(hist, jnp.asarray(times, dtype),
                                        (off + 2,))
    vals = jnp.tile(value.astype(dtype), n)
    hist = jax.lax.dynamic_update_slice(hist, vals, (off + 2 + n,))
    hist = hist.at[off + 1].set(jnp.asarray(n - 1, dtype))
    return hist

  for u in range(m.nu):
    n = int(m.actuator_history[u, 0])
    if n:
      hist = prefill(hist, int(m.actuator_historyadr[u]), n, 1,
                     d.ctrl[u][None])
  for s in range(m.nsensor):
    n = int(m.sensor_history[s, 0])
    if n:
      adr, dim = int(m.sensor_adr[s]), int(m.sensor_dim[s])
      hist = prefill(hist, int(m.sensor_historyadr[s]), n, dim,
                     jax.lax.dynamic_slice(d.sensordata, (adr,), (dim,)))
  return d.replace(history=hist)
