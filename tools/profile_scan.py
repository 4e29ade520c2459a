"""Diagnose the lax.scan-vs-host-loop rollout gap (VERDICT r3 weak #6).

Times three rollout harnesses of the fused step at the same nworld/nstep:
  host   — jitted single step, host loop with donation (current harness)
  scan   — jax.lax.scan(step) inside one jit (the training-loop seam)
  unroll — python-unrolled steps inside one jit
"""

import os
import time

import jax
import jax.numpy as jnp

from mujoco_warp_tpu import benchmarks
from mujoco_warp_tpu.pallas import fused

NWORLD = int(os.environ.get('NWORLD', 1024))
NSTEP = int(os.environ.get('NSTEP', 50))
REPS = int(os.environ.get('REPS', 5))


def bench(name, fn, st):
  t0 = time.perf_counter()
  out = jax.block_until_ready(fn(st))
  compile_t = time.perf_counter() - t0
  t0 = time.perf_counter()
  for _ in range(REPS):
    out = jax.block_until_ready(fn(st))
  dt = (time.perf_counter() - t0) / REPS
  print(f'{name:10s} {dt*1e3/NSTEP:8.3f} ms/step  (compile {compile_t:.1f}s)',
        flush=True)
  return out


def main():
  mjm = benchmarks.load_humanoid_benchmark()
  m, d = benchmarks.build(mjm, NWORLD)
  st0 = fused.to_lane(m, d)

  step1 = jax.jit(lambda s: fused.step_lane(m, s))

  def host(st):
    for _ in range(NSTEP):
      st = step1(st)
    return st

  @jax.jit
  def scan(st):
    def body(s, _):
      return fused.step_lane(m, s), ()
    st, _ = jax.lax.scan(body, st, None, length=NSTEP)
    return st

  @jax.jit
  def unroll(st):
    for _ in range(NSTEP):
      st = fused.step_lane(m, st)
    return st

  bench('host', host, st0)
  bench('scan', scan, st0)
  bench('unroll', unroll, st0)


if __name__ == '__main__':
  main()
