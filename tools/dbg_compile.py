"""Bisect Mosaic compile time of the fused kernels (K1 vs K4 vs full)."""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import benchmarks, types
from mujoco_warp_tpu.pallas import fused

NWORLD = int(os.environ.get('NWORLD', 1024))
WHICH = sys.argv[1] if len(sys.argv) > 1 else 'all'


def ctime(name, fn, *args):
  t0 = time.perf_counter()
  lowered = jax.jit(fn).lower(*args)
  t1 = time.perf_counter()
  compiled = lowered.compile()
  t2 = time.perf_counter()
  print(f'{name:12s} trace/lower {t1-t0:7.1f}s  compile {t2-t1:7.1f}s',
        flush=True)
  return compiled


def main():
  mjm = benchmarks.load_humanoid_benchmark()
  m, d = benchmarks.build(mjm, NWORLD)
  st = fused.to_lane(m, d)
  dtype = st.qpos.dtype

  if WHICH in ('k1', 'all'):
    ctime('K1', lambda q, v: fused._k1_call(m, q, v), st.qpos, st.qvel)
  if WHICH in ('k4', 'all', 'rest'):
    k1 = jax.jit(lambda q, v: fused._k1_call(m, q, v))(st.qpos, st.qvel)
    (qM, qLD, bias, cdof, c_dist, c_pos, c_frame, c_im, c_fri, c_sr, c_si,
     c_iw, c_m1, c_m2, c_com1, c_com2, overflow) = k1
    con = {'dist': c_dist, 'pos': c_pos, 'frame': c_frame, 'im': c_im,
           'friction': c_fri, 'solref': c_sr, 'solimp': c_si,
           'invweight': c_iw, 'mask1': c_m1, 'mask2': c_m2,
           'com1': c_com1, 'com2': c_com2}
    qfs = jax.jit(
        lambda b, q, v, c: fused._middle(m, b, q, v, c, dtype))(
            bias, st.qpos, st.qvel, st.ctrl)
    damping = fused._host(m.dof_damping, np.float32)
    damped = (not (m.opt.disableflags & (types.DisableBit.EULERDAMP |
                                         types.DisableBit.DAMPER)) and
              bool(np.any(damping > 0)))
    sc = lambda x: jnp.asarray(np.asarray(jax.device_get(x)),
                               dtype).reshape(1, 1)
    impratio_inv = 1.0 / max(float(jax.device_get(m.opt.impratio)), 1e-15)
    scalars = (sc(m.opt.tolerance), sc(m.opt.ls_tolerance),
               sc(m.stat.meaninertia), sc(m.opt.timestep),
               jnp.asarray(impratio_inv, dtype).reshape(1, 1))
    ctime('K4', lambda *a: fused._k4_call(m, damped, *a, con, scalars),
          qM, qLD, qfs, st.warmstart, st.qvel, st.qpos, cdof)
  if WHICH in ('full', 'all'):
    ctime('FULL', lambda s: fused.step_lane(m, s), st)


if __name__ == '__main__':
  main()
