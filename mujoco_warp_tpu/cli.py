"""Shared CLI plumbing: model loading, struct init, rollout unroll.

TPU-native counterpart of reference mujoco_warp/_src/cli.py: `load_model`
(MJCF/MJB + keyframe), `init_structs`, and `unroll` (the jitted host-loop
replay with OU control noise — the XLA analog of graph replay,
cli.py:190-242).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def load_model(path: str, keyframe: Optional[int] = None,
               overrides: Sequence[str] = ()):
  """Load MJCF or MJB into (mjm, mjd) with oracle forward (cli.py:69)."""
  import mujoco

  if path.endswith('.mjb'):
    mjm = mujoco.MjModel.from_binary_path(path)
  else:
    mjm = mujoco.MjModel.from_xml_path(path)
  mjd = mujoco.MjData(mjm)
  if keyframe is not None:
    mujoco.mj_resetDataKeyframe(mjm, mjd, keyframe)
  mujoco.mj_forward(mjm, mjd)
  return mjm, mjd


def init_structs(mjm, mjd, nworld: int = 1, overrides: Sequence[str] = ()):
  """Device Model/Data from host structs (cli.py:139)."""
  from mujoco_warp_tpu import io

  m = io.put_model(mjm)
  if overrides:
    m = io.override_model(m, overrides)
  d = io.put_data(mjm, mjd, m, nworld=nworld if nworld > 1 else None)
  return m, d


def unroll(m, d, nstep: int, ctrl_noise: float = 0.2, tau: float = 0.2,
           seed: int = 0, callback=None):
  """Host-loop rollout of the jitted step with OU ctrl noise (cli.py:190).

  ``callback(k, d)`` runs every step with the (device) Data — note it
  forces a sync, so leave it None for throughput measurement.
  """
  import jax
  import jax.numpy as jnp

  from mujoco_warp_tpu.ops import forward as fwd

  dt = float(jax.device_get(m.opt.timestep))
  nu = m.nu

  def step_fn(dd, key):
    if nu and ctrl_noise:
      key, sub = jax.random.split(key)
      eta = jax.random.normal(sub, dd.ctrl.shape, dd.ctrl.dtype)
      dd = dd.replace(ctrl=dd.ctrl * jnp.exp(-dt / tau) +
                      ctrl_noise * np.sqrt(dt) * eta)
    return fwd.step(m, dd), key

  step = jax.jit(step_fn, donate_argnums=0)
  key = jax.random.PRNGKey(seed)
  for k in range(nstep):
    d, key = step(d, key)
    if callback is not None:
      callback(k, jax.block_until_ready(d))
  return jax.block_until_ready(d)
