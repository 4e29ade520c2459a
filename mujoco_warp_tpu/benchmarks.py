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
import numpy as np

from mujoco_warp_tpu import io, types
from mujoco_warp_tpu.ops import forward as fwd

HUMANOID_XML = ('/opt/venv/lib/python3.12/site-packages/dm_control/suite/'
                'humanoid.xml')


def build(mjm, nworld: int, seed: int = 0):
  """Model + randomized batched Data."""
  m = io.put_model(mjm)
  d = io.make_data(m, nworld=nworld)
  rng = np.random.default_rng(seed)
  qpos = np.asarray(jax.device_get(d.qpos))
  qpos = qpos + 0.01 * rng.standard_normal(qpos.shape).astype(np.float32)
  d = d.replace(qpos=jnp.asarray(qpos))
  return m, d


def rollout_fn(m: types.Model, nstep: int):
  """Jittable nstep-unrolled batched step."""

  def unroll(d: types.Data) -> types.Data:
    def body(d, _):
      return fwd.step(m, d), ()

    d, _ = jax.lax.scan(body, d, None, length=nstep)
    return d

  return unroll


def run(mjm, nworld: int = 8192, nstep: int = 100, seed: int = 0,
        warmup_steps: int = 10):
  """Measure steps/s on the default backend. Returns a metrics dict."""
  m, d = build(mjm, nworld, seed)
  dt = float(jax.device_get(m.opt.timestep))

  unroll = jax.jit(rollout_fn(m, nstep), donate_argnums=0)
  warm = jax.jit(rollout_fn(m, warmup_steps), donate_argnums=0)

  t0 = time.perf_counter()
  d = jax.block_until_ready(warm(d))
  jit_duration = time.perf_counter() - t0

  t0 = time.perf_counter()
  d = jax.block_until_ready(unroll(d))
  run_time = time.perf_counter() - t0

  steps = nworld * nstep
  steps_per_sec = steps / run_time
  qpos = np.asarray(jax.device_get(d.qpos))
  converged = int(np.sum(np.all(np.isfinite(qpos), axis=-1)))
  return {
      'jit_duration': jit_duration,
      'run_time': run_time,
      'steps_per_sec': steps_per_sec,
      'realtime_factor': steps_per_sec * dt,
      'ns_per_step': 1e9 * run_time / steps,
      'converged_worlds': converged,
      'nworld': nworld,
      'nstep': nstep,
      'solver_niter_mean': float(np.mean(jax.device_get(d.solver_niter))),
  }
