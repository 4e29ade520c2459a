"""Time the Mosaic compile of K4 alone (flagship scene)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mujoco_warp_tpu import benchmarks
from mujoco_warp_tpu.pallas import fused

NWORLD = int(os.environ.get('NWORLD', 256))


def main():
  mjm = benchmarks.load_humanoid_benchmark()
  m, d = benchmarks.build(mjm, NWORLD)
  st = fused.to_lane(m, d)
  dtype = st.qpos.dtype

  k1 = jax.jit(lambda q, v: fused._k1_call(m, q, v))(st.qpos, st.qvel)
  qM, qLD, bias, cdof = k1[:4]
  con, _ = jax.jit(lambda *a: fused._compact_xla(m, *a, dtype))(*k1[4:])
  qfs = jax.jit(
      lambda *a: fused._middle(m, *a, dtype))(bias, st.qpos, st.qvel,
                                              st.ctrl)

  sc = lambda x: jnp.asarray(x, dtype).reshape(1, 1)
  impratio_inv = 1.0 / max(float(jax.device_get(m.opt.impratio)), 1e-15)
  scalars = (sc(jax.device_get(m.opt.tolerance)),
             sc(jax.device_get(m.opt.ls_tolerance)),
             sc(jax.device_get(m.stat.meaninertia)),
             sc(jax.device_get(m.opt.timestep)), sc(impratio_inv))

  t0 = time.perf_counter()
  f = jax.jit(lambda *a: fused._k4_call(m, True, *a, con, scalars))
  lowered = f.lower(qM, qLD, qfs, st.warmstart, st.qvel, st.qpos, cdof)
  t1 = time.perf_counter()
  lowered.compile()
  t2 = time.perf_counter()
  print(f'K4 trace/lower {t1-t0:.1f}s compile {t2-t1:.1f}s', flush=True)


if __name__ == '__main__':
  main()
