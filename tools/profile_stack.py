"""Stage attribution by composition differencing.

Times jitted prefixes of the fused step (K1; K1+compact; K1+compact+
middle; full step) so per-stage cost = adjacent difference, cancelling
the per-dispatch overhead that pollutes standalone timings.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mujoco_warp_tpu import benchmarks
from mujoco_warp_tpu.pallas import fused

NWORLD = int(os.environ.get('NWORLD', 8192))
REPS = int(os.environ.get('REPS', 20))


def timeit(name, fn, *args):
  fn_j = jax.jit(fn)
  out = jax.block_until_ready(fn_j(*args))
  t0 = time.perf_counter()
  for _ in range(REPS):
    out = fn_j(*args)
  jax.block_until_ready(out)
  dt = (time.perf_counter() - t0) / REPS
  print(f'{name:32s} {dt*1e3:9.3f} ms', flush=True)
  return out


def main():
  mjm = benchmarks.load_humanoid_benchmark()
  m, d = benchmarks.build(mjm, NWORLD)
  st = fused.to_lane(m, d)
  step = jax.jit(lambda s: fused.step_lane(m, s))
  for _ in range(20):
    st = step(st)
  st = jax.block_until_ready(st)
  dtype = st.qpos.dtype

  def p_k1(s):
    return fused._k1_call(m, s.qpos, s.qvel)

  def p_compact(s):
    k1 = fused._k1_call(m, s.qpos, s.qvel)
    con, ov = fused._compact_xla(m, *k1[4:], dtype)
    return con, ov, k1[:4]

  def p_middle(s):
    k1 = fused._k1_call(m, s.qpos, s.qvel)
    con, ov = fused._compact_xla(m, *k1[4:], dtype)
    qfs = fused._middle(m, k1[2], s.qpos, s.qvel, s.ctrl, dtype)
    return con, ov, qfs, k1[:2], k1[3]

  timeit('nothing (dispatch floor)', lambda s: s.qpos + 1.0, st)
  t1 = timeit('K1', p_k1, st)
  timeit('K1+compact', p_compact, st)
  timeit('K1+compact+middle', p_middle, st)
  timeit('full step', lambda s: fused.step_lane(m, s), st)


if __name__ == '__main__':
  main()
