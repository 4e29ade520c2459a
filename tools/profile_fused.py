"""Per-phase timing of the fused lanes-last pipeline at bench scale."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import benchmarks, io, types
from mujoco_warp_tpu.pallas import fused

NWORLD = int(os.environ.get('NWORLD', 8192))
REPS = int(os.environ.get('REPS', 20))


def timeit(name, fn, *args):
  """Async-loop timing: the axon tunnel adds ~30 ms RTT per blocking
  call, so each phase is dispatched REPS times back-to-back and synced
  once; device execution serializes, amortizing the tunnel latency."""
  fn_j = jax.jit(fn)
  out = jax.block_until_ready(fn_j(*args))
  t0 = time.perf_counter()
  for _ in range(REPS):
    out = fn_j(*args)
  jax.block_until_ready(out)
  dt = (time.perf_counter() - t0) / REPS
  print(f'{name:32s} {dt*1e3:9.2f} ms  ({dt/NWORLD*1e9:8.0f} ns/world)',
        flush=True)
  return out


def main():
  mjm = benchmarks.load_humanoid_benchmark()
  m, d = benchmarks.build(mjm, NWORLD)
  st = fused.to_lane(m, d)
  dtype = st.qpos.dtype
  print(f'nv={m.nv} nq={m.nq} nbody={m.nbody} ncand={m.ncand} '
        f'ncon={m.ncon} nefc={m.nefc}', flush=True)

  k1 = timeit('K1 fk/com/narrow/mass', lambda q, v: fused._k1_call(m, q, v),
              st.qpos, st.qvel)
  qM, qLD, bias, cdof = k1[:4]
  c_dist, c_pos, c_frame, stcom = k1[4:]

  compact = fused._compact_xla if m.con_compact else fused._identity_con_xla
  con, overflow = timeit(
      'compact (XLA glue)',
      lambda *a: compact(m, *a, dtype), c_dist, c_pos, c_frame, stcom)

  qfs = timeit('middle (act/passive)',
               lambda b, q, v, c: fused._middle(m, b, q, v, c, dtype),
               bias, st.qpos, st.qvel, st.ctrl)

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
  timeit('K4 assemble/solve/integrate',
         lambda *a: fused._k4_call(m, damped, *a, con, scalars),
         qM, qLD, qfs, st.warmstart, st.qvel, st.qpos, cdof)

  timeit('FULL fused step', lambda s: fused.step_lane(m, s), st)


if __name__ == '__main__':
  main()
