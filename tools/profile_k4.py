"""Intra-K4 attribution: time K4 under iteration-count overrides, plus
the lane-permutation (sort_worlds) cost."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import benchmarks, io, types
from mujoco_warp_tpu.pallas import fused

NWORLD = int(os.environ.get('NWORLD', 8192))
REPS = int(os.environ.get('REPS', 30))


def timeit(name, fn, *args):
  fn_j = jax.jit(fn)
  out = jax.block_until_ready(fn_j(*args))
  t0 = time.perf_counter()
  for _ in range(REPS):
    out = fn_j(*args)
  jax.block_until_ready(out)
  dt = (time.perf_counter() - t0) / REPS
  print(f'{name:36s} {dt*1e3:9.2f} ms', flush=True)
  return out


def main():
  mjm = benchmarks.load_humanoid_benchmark()
  m, d = benchmarks.build(mjm, NWORLD)
  st = fused.to_lane(m, d)
  dtype = st.qpos.dtype

  timeit('sort_worlds (take on lanes)', fused.sort_worlds, st)
  timeit('step_lane (whole step)', lambda s: fused.step_lane(m, s), st)

  damped = True
  k1_damped = True
  k1 = jax.jit(lambda q, v: fused._k1_call(
      m, q, v, factor_damped=k1_damped))(st.qpos, st.qvel)
  qM, qLD, bias, cdof = k1[:4]
  c_dist, c_pos, c_frame, stcom = k1[4:]
  con, _ = jax.jit(
      lambda *a: fused._compact_xla(m, *a, dtype))(c_dist, c_pos, c_frame,
                                                   stcom)

  sc = lambda x: jnp.asarray(x, dtype).reshape(1, 1)
  impratio_inv = 1.0 / max(float(jax.device_get(m.opt.impratio)), 1e-15)
  scalars = (sc(jax.device_get(m.opt.tolerance)),
             sc(jax.device_get(m.opt.ls_tolerance)),
             sc(jax.device_get(m.stat.meaninertia)),
             sc(jax.device_get(m.opt.timestep)), sc(impratio_inv))

  def k4_with(niters, nls, name, mm=None, dmp=damped, k1d=k1_damped):
    mm = mm or m
    mm = mm.replace(opt=mm.opt.replace(iterations=niters,
                                       ls_iterations=nls))
    timeit(name,
           lambda *a: fused._k4_call(mm, dmp, k1d, *a, con, scalars),
           qM, qLD, bias, st.warmstart, st.qvel, st.qpos, st.ctrl, cdof)

  if os.environ.get('K4_VARIANTS', '0') != '0':
    print('K1 timing:', flush=True)
    timeit('K1 (incl. damped factor)',
           lambda q, v: fused._k1_call(m, q, v, factor_damped=k1_damped),
           st.qpos, st.qvel)
    timeit('compact_xla', lambda *a: fused._compact_xla(m, *a, dtype),
           c_dist, c_pos, c_frame, stcom)
    k4_with(int(m.opt.iterations), int(m.opt.ls_iterations),
            'K4 full (it=default, ls=default)')
    k4_with(0, 0, 'K4 it=0 (assembly + solve init)')
    k4_with(1, 1, 'K4 it=1 ls=1 (assembly+1 solve)')
    k4_with(2, 4, 'K4 it=2 ls=4')
    # no contact rows (limits only)
    mm = m.replace(opt=m.opt.replace(run_collision_detection=False))
    k4_with(0, 0, 'K4 it=0 no-contacts', mm=mm)
    # no limits either: pure solve-init + integrate
    orig_lt = fused._limit_tables
    fused._limit_tables = lambda m_: []
    k4_with(0, 0, 'K4 it=0 no-con no-lim', mm=mm, k1d=False)
    fused._limit_tables = orig_lt


if __name__ == '__main__':
  main()
