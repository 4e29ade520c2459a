"""Benchmark harness: batched rollout throughput (testspeed analog).

TPU-native counterpart of reference mujoco_warp/testspeed.py: loads a
scene, builds a batched Data, jits an unrolled step, reports steps/s,
realtime factor, and converged (NaN-free) worlds.  The reference replays a
captured CUDA graph from a host loop (testspeed.py:140-303); here the
rollout is a `lax.scan` inside one jit — XLA's equivalent of graph replay
with zero per-step host involvement.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp

# TPU matmuls default to bfloat16 inputs; the jnp solver/smooth fallback
# paths (used beyond the Pallas kernels' scale gates) need f32 products
# or Newton diverges (three_humanoids NaNs at nv=81).  The Pallas kernels
# are unaffected (explicit VPU f32).
jax.config.update('jax_default_matmul_precision', 'highest')

# persistent compile cache: the step program takes ~30 s to build cold;
# cached reruns (driver/bench iterations) skip it (reference analog: CUDA
# graph capture is 0.3 s, so it never needed one)
import os as _os_cache

jax.config.update(
    'jax_compilation_cache_dir',
    _os_cache.environ.get('JAX_COMPILATION_CACHE_DIR',
                          _os_cache.path.expanduser('~/.cache/jax_tpu_cache')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
import numpy as np

from mujoco_warp_tpu import io, types
from mujoco_warp_tpu.ops import forward as fwd

import os as _os

# the reference suite's flagship scene (benchmarks/humanoid/__init__.py):
# apples-to-apples with BASELINE.md's 2.73M steps/s anchor. Falls back to
# the dm_control humanoid (same 27-DoF class) if the reference checkout
# isn't mounted.
REF_HUMANOID_XML = '/root/reference/benchmarks/humanoid/humanoid.xml'
DMC_HUMANOID_XML = ('/opt/venv/lib/python3.12/site-packages/dm_control/'
                    'suite/humanoid.xml')
HUMANOID_XML = (REF_HUMANOID_XML if _os.path.exists(REF_HUMANOID_XML)
                else DMC_HUMANOID_XML)


def load_humanoid_benchmark():
  """Flagship benchmark model: the reference suite's humanoid."""
  import mujoco

  if HUMANOID_XML == REF_HUMANOID_XML:
    return mujoco.MjModel.from_xml_path(HUMANOID_XML)

  # dm_control fallback: strip sensors/cameras (not part of the
  # physics-throughput comparison; the reference scene has none)
  import re
  import shutil
  import tempfile

  xml = open(HUMANOID_XML).read()
  xml = re.sub(r'<sensor>.*?</sensor>', '', xml, flags=re.S)
  xml = re.sub(r'<camera[^/]*?/>', '', xml)
  base = _os.path.dirname(HUMANOID_XML)
  tmp = tempfile.mkdtemp(prefix='mjw_tpu_bench_')
  try:
    shutil.copytree(_os.path.join(base, 'common'),
                    _os.path.join(tmp, 'common'))
    path = _os.path.join(tmp, 'humanoid.xml')
    with open(path, 'w') as f:
      f.write(xml)
    return mujoco.MjModel.from_xml_path(path)
  finally:
    shutil.rmtree(tmp, ignore_errors=True)


def build(mjm, nworld: int, seed: int = 0, nconmax={1: 12, 3: 24},
          overrides=(), init_qpos=None, init_qvel=None,
          qpos_noise: float = 0.01):
  """Model + randomized batched Data.

  ``nconmax`` defaults to per-condim budgets {1: 12, 3: 24} (36 total
  slots): measured as the smallest ladder rung where NO world overflows
  over the 1000-step OU rollout (overflow_worlds=0), slightly above the
  reference humanoid's shared 24-slot pool (benchmarks/humanoid/
  __init__.py nconmax=24) because our slots are per-condim-class rather
  than shared.
  """
  # opt.cone is baked into the static EFC layout at put_model time —
  # apply it to the MuJoCo model up front; everything else goes through
  # override_model (which sweeps array fields without recompiling)
  overrides = list(overrides)
  for ov in list(overrides):
    key, val = ov.split('=')
    if key == 'opt.cone':
      mjm.opt.cone = int(io._ENUM_VALUES['cone'][val.lower()]
                         if not val.isdigit() else int(val))
      overrides.remove(ov)
    elif key == 'opt.integrator':
      mjm.opt.integrator = int(io._ENUM_VALUES['integrator'][val.lower()]
                               if not val.isdigit() else int(val))
      overrides.remove(ov)
    elif key == 'opt.enableflags':  # static: baked at put_model time
      mjm.opt.enableflags = int(val)
      overrides.remove(ov)
  m = io.put_model(mjm, nconmax=nconmax)
  if overrides:
    m = io.override_model(m, list(overrides))
  d = io.make_data(m, nworld=nworld)
  rng = np.random.default_rng(seed)
  qpos = np.asarray(jax.device_get(d.qpos))
  if init_qpos is not None:
    qpos = np.broadcast_to(np.asarray(init_qpos, np.float32),
                           qpos.shape).copy()
  if qpos_noise:
    qpos = qpos + qpos_noise * rng.standard_normal(qpos.shape).astype(
        np.float32)
  d = d.replace(qpos=jnp.asarray(qpos))
  if init_qvel is not None:
    qvel = np.broadcast_to(np.asarray(init_qvel, np.float32),
                           np.asarray(jax.device_get(d.qvel)).shape).copy()
    d = d.replace(qvel=jnp.asarray(qvel))
  return m, d


def rollout_fn(m: types.Model, nstep: int):
  """Jittable nstep-unrolled batched step (`lax.scan`; measured at parity
  with the host-dispatch loop — 0.99x at 8192 worlds, tools/dbg_scan.py)."""

  def unroll(d: types.Data) -> types.Data:
    def body(d, _):
      return fwd.step(m, d), ()

    d, _ = jax.lax.scan(body, d, None, length=nstep)
    return d

  return unroll


def run(mjm, nworld: int = 8192, nstep: int = 100, seed: int = 0,
        warmup_steps: int = 10, nconmax='default', overrides=(),
        replay=None):
  """Measure steps/s on the default backend. Returns a metrics dict.

  The rollout is a host loop of async-dispatched jitted steps (the XLA
  analog of the reference's graph-replay loop, testspeed.py:242);
  dispatch is ~20 µs/step and fully overlapped with device compute.

  ``replay``: optional NPZ ctrl-trajectory path (reference testspeed
  --replay, cli.py:56): the rollout applies OU noise *around* the
  recorded ctrl (cli.py:94-136) and starts from the recorded initial
  state.
  """
  import mujoco

  init_qpos = init_qvel = None
  traj = None
  if replay is not None:
    mjd = mujoco.MjData(mjm)
    mujoco.mj_resetData(mjm, mjd)
    traj = io.load_trajectory(replay, mjm, mjd).astype(np.float32)
    init_qpos, init_qvel = mjd.qpos.copy(), mjd.qvel.copy()
  # replay semantics (reference cli.py:94-136): worlds start from the
  # RECORDED state exactly and decorrelate through OU noise around the
  # replayed ctrl — qpos noise on free objects would sink them into
  # support surfaces (measured: 1 cm noise on the aloha pot explodes
  # the scene into a >128-contacts-per-world storm; the pure replay has
  # 4, matching the C oracle step-for-step)
  kw = dict(overrides=overrides, init_qpos=init_qpos, init_qvel=init_qvel,
            qpos_noise=0.0 if replay is not None else 0.01)
  if nconmax != 'default':
    kw['nconmax'] = nconmax
  m, d = build(mjm, nworld, seed, **kw)
  dt = float(jax.device_get(m.opt.timestep))

  # OU exploration noise on ctrl, as the reference's unroll applies around
  # the replay/keyframe ctrl (cli.py:94-136) — keeps the rollout dynamic
  nu = m.nu
  tau = 0.2
  traj_dev = jnp.asarray(traj) if traj is not None else None

  from mujoco_warp_tpu.pallas import fused
  use_fused = fused.supported(m, d)

  # replay runs mirror the reference's _ctrl_noise exactly (cli.py:95-136):
  # OU converging to the replayed ctrl at rate 0.1 s with std 0.01 of the
  # actuator half-range, clamped to ctrlrange (gaussian here vs the
  # reference's Halton uniform — same scale).  Non-replay scenes keep the
  # legacy hotter OU this round: every committed budget ladder was
  # measured against it.
  if traj is not None:
    lim = np.asarray(jax.device_get(m.actuator_ctrllimited)).astype(bool)
    crange = np.asarray(jax.device_get(m.actuator_ctrlrange), np.float32)
    halfrange = np.where(lim, 0.5 * (crange[:, 1] - crange[:, 0]), 1.0)
    r_decay = float(np.exp(-dt / 0.1))
    r_scale = 0.01 * float(np.sqrt(1.0 - r_decay * r_decay))
    hr = jnp.asarray(halfrange)
    lo = jnp.asarray(np.where(lim, crange[:, 0], -np.inf))
    hi = jnp.asarray(np.where(lim, crange[:, 1], np.inf))

    def ou(noise, key, base=None):
      key, sub = jax.random.split(key)
      eta = jax.random.normal(sub, noise.shape, noise.dtype)
      shp = (-1, 1) if noise.ndim == 2 and noise.shape[-1] != nu else (-1,)
      noise = noise * r_decay + r_scale * hr.reshape(shp) * eta
      ctrl = noise if base is None else base + noise
      ctrl = jnp.clip(ctrl, lo.reshape(shp), hi.reshape(shp))
      return noise, ctrl, key
  else:
    def ou(noise, key, base=None):
      key, sub = jax.random.split(key)
      eta = jax.random.normal(sub, noise.shape, noise.dtype)
      decay = jnp.exp(-dt / tau)
      noise = noise * decay + 0.2 * np.sqrt(dt) * eta
      ctrl = noise if base is None else base + noise
      return noise, ctrl, key

  if use_fused:
    # lanes-last rollout: layout conversion happens once, outside the loop
    d = fused.to_lane(m, d)
    resort = _os.environ.get('BENCH_SORT_WORLDS', '1') != '0'

    def step_fn(st, key, noise, sort, base):
      if sort:
        # inline fused.sort_worlds so the OU-noise carry rides the same
        # world permutation as the state it perturbs
        perm = jnp.argsort(st.solver_niter[0])
        st = jax.tree.map(lambda x: x.T[perm].T, st)
        if nu:
          noise = noise.T[perm].T
      if nu:
        b = base[:, None] if base is not None else None
        noise, ctrl, key = ou(noise, key, b)
        st = st._replace(ctrl=ctrl)
      return fused.step_lane(m, st), key, noise

    noise0 = jnp.zeros_like(d.ctrl)
  else:
    # world sorting pays off exactly when the tile-based Pallas solver
    # runs (tiles exit their while loops at the tile max trip count);
    # the jnp fallback solver is one batch-global loop, where sorting
    # buys nothing
    from mujoco_warp_tpu.pallas import solver as psolver
    resort = (psolver.supported(m, d) and
              _os.environ.get('BENCH_SORT_WORLDS', '1') != '0')
    W = d.qpos.shape[0]

    def sort_data(dd, noise):
      perm = jnp.argsort(dd.solver_niter)
      dd = jax.tree.map(
          lambda x: x[perm]
          if hasattr(x, 'shape') and x.ndim >= 1 and x.shape[0] == W
          else x, dd)
      if nu:
        noise = noise[perm]
      return dd, noise

    def step_fn(dd, key, noise, sort, base):
      if sort:
        dd, noise = sort_data(dd, noise)
      if nu:
        b = base[None] if base is not None else None
        noise, ctrl, key = ou(noise, key, b)
        dd = dd.replace(ctrl=ctrl)
      return fwd.step(m, dd), key, noise

    noise0 = jnp.zeros_like(d.ctrl)

  # sorting every step pays ~2 ms of lane permutation; iteration counts
  # are temporally coherent, so sorting every few steps keeps tiles
  # homogeneous at a fraction of the cost
  sort_every = int(_os.environ.get('BENCH_SORT_EVERY', 4)) if resort else 0

  step = jax.jit(step_fn, donate_argnums=(0, 2), static_argnums=3)
  key = jax.random.PRNGKey(seed)
  noise = noise0

  do_sort = lambda i: sort_every > 0 and i % sort_every == 0
  if traj_dev is not None:
    T = traj_dev.shape[0]
    base_i = lambda i: traj_dev[i % T]
  else:
    base_i = lambda i: None

  # global step counter: the replayed ctrl advances monotonically across
  # warmup and the timed loop (the reference unroll's replay semantics)
  gstep = 0
  t0 = time.perf_counter()
  d, key, noise = step(d, key, noise, do_sort(0), base_i(0))
  jax.block_until_ready(d)
  jit_duration = time.perf_counter() - t0
  gstep += 1
  if sort_every > 1:  # compile the no-sort variant too, outside the timing
    d, key, noise = step(d, key, noise, False, base_i(gstep))
    jax.block_until_ready(d)
    gstep += 1
  for _ in range(warmup_steps - 1):
    d, key, noise = step(d, key, noise, do_sort(gstep), base_i(gstep))
    gstep += 1
  d = jax.block_until_ready(d)

  t0 = time.perf_counter()
  for _ in range(nstep):
    d, key, noise = step(d, key, noise, do_sort(gstep), base_i(gstep))
    gstep += 1
  d = jax.block_until_ready(d)
  run_time = time.perf_counter() - t0

  steps = nworld * nstep
  steps_per_sec = steps / run_time
  qpos = np.asarray(jax.device_get(d.qpos))
  overflow = np.asarray(jax.device_get(d.overflow))
  if use_fused:
    qpos = qpos.T  # lanes-last -> world-major
  converged = int(np.sum(np.all(np.isfinite(qpos), axis=-1)))
  # capacity overflow (CONTACT/CONSTRAINT: a fixed buffer saturated and
  # results were truncated) is the integrity gate; solver-cap exhaustion
  # (SOLVER: a world latched niter == opt.iterations some step) is an
  # accuracy bucket reported separately — the reference's testspeed
  # treats solver_niter buckets as stats, not capacity errors
  # (testspeed.py:266-278), e.g. the cloth scene legitimately runs CG to
  # its XML iteration cap from a wrinkled start, exactly as the C does.
  cap_bits = int(types.OverflowType.CONTACT | types.OverflowType.CONSTRAINT)
  overflow_worlds = int(np.sum((overflow & cap_bits) != 0))
  solver_cap_worlds = int(np.sum(
      (overflow & int(types.OverflowType.SOLVER)) != 0))
  return {
      'jit_duration': jit_duration,
      'run_time': run_time,
      'steps_per_sec': steps_per_sec,
      'realtime_factor': steps_per_sec * dt,
      'ns_per_step': 1e9 * run_time / steps,
      'converged_worlds': converged,
      'overflow_worlds': overflow_worlds,
      'solver_cap_worlds': solver_cap_worlds,
      'nworld': nworld,
      'nstep': nstep,
      'solver_niter_mean': float(np.mean(jax.device_get(d.solver_niter))),
  }
