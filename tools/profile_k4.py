"""Intra-step attribution for the fused flagship path.

Times K1 / compact / middle / K4 separately, then K4 under Newton and
linesearch iteration-count overrides to attribute the solve cost
(assembly vs per-iteration linesearch/H work).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import benchmarks, types
from mujoco_warp_tpu.pallas import fused

NWORLD = int(os.environ.get('NWORLD', 1024))
REPS = int(os.environ.get('REPS', 30))
CAPS = eval(os.environ.get('CAPS', '{1: 12, 3: 24}'))


def timeit(name, fn, *args):
  fn_j = jax.jit(fn)
  out = jax.block_until_ready(fn_j(*args))
  t0 = time.perf_counter()
  for _ in range(REPS):
    out = fn_j(*args)
  jax.block_until_ready(out)
  dt = (time.perf_counter() - t0) / REPS
  print(f'{name:40s} {dt*1e3:9.3f} ms', flush=True)
  return out


def main():
  mjm = benchmarks.load_humanoid_benchmark()
  m, d = benchmarks.build(mjm, NWORLD, nconmax=CAPS)
  print('caps', CAPS, 'nefc', m.nefc, 'ncon', m.ncon)
  st = fused.to_lane(m, d)
  # settle into a warmstarted steady state so iteration counts are
  # representative of the benchmark's rollout
  step = jax.jit(lambda s: fused.step_lane(m, s))
  for _ in range(20):
    st = step(st)
  st = jax.block_until_ready(st)
  dtype = st.qpos.dtype

  timeit('step_lane (whole step)', lambda s: fused.step_lane(m, s), st)
  timeit('sort_worlds', fused.sort_worlds, st)

  k1 = jax.jit(lambda q, v: fused._k1_call(m, q, v))(st.qpos, st.qvel)
  qM, qLD, bias, cdof = k1[:4]
  c_dist, c_pos, c_frame, stcom = k1[4:]
  timeit('K1', lambda q, v: fused._k1_call(m, q, v), st.qpos, st.qvel)
  con, _ = timeit('compact_xla',
                  lambda *a: fused._compact_xla(m, *a, dtype),
                  c_dist, c_pos, c_frame, stcom)
  qfs = timeit('middle (actuation+passive)',
               lambda *a: fused._middle(m, *a, dtype),
               bias, st.qpos, st.qvel, st.ctrl)

  sc = lambda x: jnp.asarray(x, dtype).reshape(1, 1)
  impratio_inv = 1.0 / max(float(jax.device_get(m.opt.impratio)), 1e-15)
  scalars = (sc(jax.device_get(m.opt.tolerance)),
             sc(jax.device_get(m.opt.ls_tolerance)),
             sc(jax.device_get(m.stat.meaninertia)),
             sc(jax.device_get(m.opt.timestep)), sc(impratio_inv))

  def k4_with(name, niters=None, nls=None, mm=None, damped=True):
    mm = mm or m
    it = int(jax.device_get(m.opt.iterations)) if niters is None else niters
    ls = (int(jax.device_get(m.opt.ls_iterations)) if nls is None else nls)
    mm = mm.replace(opt=mm.opt.replace(iterations=it, ls_iterations=ls))
    timeit(name,
           lambda *a: fused._k4_call(mm, damped, *a, con, scalars),
           qM, qLD, qfs, st.warmstart, st.qvel, st.qpos, cdof)

  k4_with('K4 full (defaults)')
  k4_with('K4 it=0 (assembly + init)', 0, 0)
  k4_with('K4 it=1 ls=1', 1, 1)
  k4_with('K4 it=2 ls=2', 2, 2)
  k4_with('K4 it=2 ls=4', 2, 4)
  k4_with('K4 it=4 ls=4', 4, 4)
  # no contact rows (limits only)
  mm = m.replace(opt=m.opt.replace(run_collision_detection=False))
  k4_with('K4 it=0 no-contacts', 0, 0, mm=mm)
  k4_with('K4 it=0 undamped', 0, 0, damped=False)
  k4_with('K4 full undamped', damped=False)
  print('opt.iterations', int(jax.device_get(m.opt.iterations)),
        'opt.ls_iterations', int(jax.device_get(m.opt.ls_iterations)),
        'niter_mean', float(jnp.mean(st.solver_niter)), flush=True)


if __name__ == '__main__':
  main()
