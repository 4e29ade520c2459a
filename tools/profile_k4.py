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

  def sort_tr(s):
    perm = jnp.argsort(s.solver_niter[0])
    return jax.tree.map(lambda x: x.T[perm].T, s)

  def sort_mm(s):
    perm = jnp.argsort(s.solver_niter[0])
    W = perm.shape[0]
    P = (perm[None, :] == jnp.arange(W, dtype=jnp.int32)[:, None])
    Pf = P.astype(jnp.float32)

    def app(x):
      if x.dtype == jnp.int32:
        return jax.lax.dot(x.astype(jnp.float32), Pf,
                           precision=jax.lax.Precision.HIGHEST
                           ).astype(jnp.int32)
      return jax.lax.dot(x, Pf, precision=jax.lax.Precision.HIGHEST)

    return jax.tree.map(app, s)

  timeit('sort via transpose-gather', sort_tr, st)
  timeit('sort via one-hot matmul', sort_mm, st)

  k1 = jax.jit(lambda q, v: fused._k1_call(m, q, v))(st.qpos, st.qvel)
  qM, qLD, bias, cdof = k1[:4]
  c_dist, c_pos, c_frame, stcom = k1[4:]
  con, _ = jax.jit(
      lambda *a: fused._compact_xla(m, *a, dtype))(c_dist, c_pos, c_frame,
                                                   stcom)
  qfs = jax.jit(lambda *a: fused._middle(m, *a, dtype))(
      bias, st.qpos, st.qvel, st.ctrl)

  damped = True
  sc = lambda x: jnp.asarray(x, dtype).reshape(1, 1)
  impratio_inv = 1.0 / max(float(jax.device_get(m.opt.impratio)), 1e-15)
  scalars = (sc(jax.device_get(m.opt.tolerance)),
             sc(jax.device_get(m.opt.ls_tolerance)),
             sc(jax.device_get(m.stat.meaninertia)),
             sc(jax.device_get(m.opt.timestep)), sc(impratio_inv))

  def k4_with(niters, nls, name):
    mm = m.replace(opt=m.opt.replace(iterations=niters,
                                     ls_iterations=nls))
    timeit(name,
           lambda *a: fused._k4_call(mm, damped, *a, con, scalars),
           qM, qLD, qfs, st.warmstart, st.qvel, st.qpos, cdof)

  if os.environ.get('K4_VARIANTS', '0') != '0':
    print('K1 timing:', flush=True)
    timeit('K1', lambda q, v: fused._k1_call(m, q, v), st.qpos, st.qvel)
    timeit('compact_xla', lambda *a: fused._compact_xla(m, *a, dtype),
           c_dist, c_pos, c_frame, stcom)
    timeit('middle', lambda *a: fused._middle(m, *a, dtype),
           bias, st.qpos, st.qvel, st.ctrl)
    k4_with(int(m.opt.iterations), int(m.opt.ls_iterations),
            'K4 full (it=default, ls=default)')
    k4_with(0, 0, 'K4 it=0 (assembly + solve init)')
    k4_with(1, 1, 'K4 it=1 ls=1 (assembly+1 solve)')
    k4_with(2, 4, 'K4 it=2 ls=4')
    # no contact rows (limits only)
    mm = m.replace(opt=m.opt.replace(iterations=0, ls_iterations=0,
                                     run_collision_detection=False))
    timeit('K4 it=0 no-contacts',
           lambda *a: fused._k4_call(mm, damped, *a, con, scalars),
           qM, qLD, qfs, st.warmstart, st.qvel, st.qpos, cdof)
    mm = m.replace(opt=m.opt.replace(iterations=0, ls_iterations=0))
    timeit('K4 it=0 undamped',
           lambda *a: fused._k4_call(mm, False, *a, con, scalars),
           qM, qLD, qfs, st.warmstart, st.qvel, st.qpos, cdof)
    # no limits either: pure solve-init + integrate
    orig_lt = fused._limit_tables
    fused._limit_tables = lambda m_: []
    mm = m.replace(opt=m.opt.replace(iterations=0, ls_iterations=0,
                                     run_collision_detection=False))
    timeit('K4 it=0 no-con no-lim',
           lambda *a: fused._k4_call(mm, damped, *a, con, scalars),
           qM, qLD, qfs, st.warmstart, st.qvel, st.qpos, cdof)
    fused._limit_tables = orig_lt


if __name__ == '__main__':
  main()
