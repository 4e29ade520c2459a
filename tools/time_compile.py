"""Time the fused-step compile (flagship scene) at small W.

Compile cost is set by the static shapes (nv/nefc/ncand), not W, so a
256-world compile reproduces the 8192-world compile time without the
device memory.  Used to bisect Mosaic compile blowups.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from mujoco_warp_tpu import benchmarks
from mujoco_warp_tpu.pallas import fused

NWORLD = int(os.environ.get('NWORLD', 256))


def main():
  mjm = benchmarks.load_humanoid_benchmark()
  m, d = benchmarks.build(mjm, NWORLD)
  st = fused.to_lane(m, d)
  t0 = time.perf_counter()
  step = jax.jit(lambda s: fused.step_lane(m, s))
  lowered = step.lower(st)
  t1 = time.perf_counter()
  compiled = lowered.compile()
  t2 = time.perf_counter()
  print(f'trace+lower {t1 - t0:.1f}s  compile {t2 - t1:.1f}s', flush=True)
  out = jax.block_until_ready(step(st))
  t3 = time.perf_counter()
  print(f'first run {t3 - t2:.1f}s', flush=True)

  # steady state: OU-free rollout, donation-free (fine for timing)
  nstep = int(os.environ.get('NSTEP', 50))
  reps = int(os.environ.get('REPS', 3))
  for _ in range(10):
    st = step(st)
  jax.block_until_ready(st)
  best = 1e30
  for _ in range(reps):
    t0 = time.perf_counter()
    cur = st
    for _ in range(nstep):
      cur = step(cur)
    jax.block_until_ready(cur)
    best = min(best, (time.perf_counter() - t0) / nstep)
  print(f'steady {best * 1e3:.3f} ms/step  '
        f'({NWORLD / best:,.0f} steps/s)', flush=True)


if __name__ == '__main__':
  main()
