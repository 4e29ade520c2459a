"""Per-phase timing of the fused lanes-last pipeline at bench scale."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import benchmarks, io, types
from mujoco_warp_tpu.pallas import fused

NWORLD = int(os.environ.get('NWORLD', 8192))
REPS = 10


def timeit(name, fn, *args):
  fn_j = jax.jit(fn)
  out = jax.block_until_ready(fn_j(*args))
  t0 = time.perf_counter()
  for _ in range(REPS):
    out = jax.block_until_ready(fn_j(*args))
  dt = (time.perf_counter() - t0) / REPS
  print(f'{name:28s} {dt*1e3:9.2f} ms  ({dt/NWORLD*1e9:8.0f} ns/world)',
        flush=True)
  return out


def main():
  mjm = benchmarks.load_humanoid_benchmark()
  m, d = benchmarks.build(mjm, NWORLD)
  st = fused.to_lane(m, d)
  dtype = st.qpos.dtype

  k1 = timeit('K1 fk/com/narrow/mass', lambda q, v: fused._k1_call(m, q, v),
              st.qpos, st.qvel)

  mid = timeit('middle (act/passive/compact)',
               lambda k, q, v, c: fused._middle(m, k, q, v, c, dtype),
               k1, st.qpos, st.qvel, st.ctrl)
  qfs, con, overflow = mid

  damping = fused._host(m.dof_damping, np.float32)
  damped = (not (m.opt.disableflags & (types.DisableBit.EULERDAMP |
                                       types.DisableBit.DAMPER)) and
            bool(np.any(damping > 0)))
  sc = lambda x: jnp.asarray(x, dtype).reshape(1, 1)
  impratio_inv = 1.0 / max(float(jax.device_get(m.opt.impratio)), 1e-15)
  scalars = (sc(jax.device_get(m.opt.tolerance)),
             sc(jax.device_get(m.opt.ls_tolerance)),
             sc(jax.device_get(m.stat.meaninertia)),
             sc(jax.device_get(m.opt.timestep)), sc(impratio_inv))
  qM, qLD, bias, cdof, com = k1[:5]
  timeit('K4 assemble/solve/integrate',
         lambda *a: fused._k4_call(m, damped, *a, con, scalars),
         qM, qLD, qfs, st.warmstart, st.qvel, st.qpos, cdof)

  timeit('FULL fused step', lambda s: fused.step_lane(m, s), st)


if __name__ == '__main__':
  main()
