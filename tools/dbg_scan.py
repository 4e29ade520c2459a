"""Repro: lax.scan(step_lane) vs host loop on the fused flagship path.

VERDICT r3 weak#6: scan + Pallas solver is ~14x slower than the host
loop.  This times both at a given NWORLD and prints per-step ms.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mujoco_warp_tpu import benchmarks
from mujoco_warp_tpu.pallas import fused

NWORLD = int(os.environ.get('NWORLD', 1024))
NSTEP = int(os.environ.get('NSTEP', 50))
REPS = int(os.environ.get('REPS', 5))


def main():
  mjm = benchmarks.load_humanoid_benchmark()
  m, d = benchmarks.build(mjm, NWORLD)
  st0 = fused.to_lane(m, d)

  step = jax.jit(lambda s: fused.step_lane(m, s), donate_argnums=0)

  def host_loop(s):
    for _ in range(NSTEP):
      s = step(s)
    return jax.block_until_ready(s)

  def scan_body(s, _):
    return fused.step_lane(m, s), ()

  scan_roll = jax.jit(
      lambda s: jax.lax.scan(scan_body, s, None, length=NSTEP)[0],
      donate_argnums=0)

  # warm both
  s = host_loop(st0)
  t0 = time.perf_counter()
  for _ in range(REPS):
    s = host_loop(s)
  t_host = (time.perf_counter() - t0) / (REPS * NSTEP)

  t0 = time.perf_counter()
  s2 = jax.block_until_ready(scan_roll(fused.to_lane(m, d)))
  t_jit = time.perf_counter() - t0
  t0 = time.perf_counter()
  for _ in range(REPS):
    s2 = jax.block_until_ready(scan_roll(s2))
  t_scan = (time.perf_counter() - t0) / (REPS * NSTEP)

  print(f'NWORLD={NWORLD} host {t_host*1e3:.3f} ms/step  '
        f'scan {t_scan*1e3:.3f} ms/step  ratio {t_scan/t_host:.2f}x  '
        f'(scan jit {t_jit:.1f}s)', flush=True)


if __name__ == '__main__':
  main()
