"""Split the fused batched step cost: pre-solve pipeline vs Pallas solve.

Times each phase of ops/forward.step's batched fast path in isolation but
fused (lax.scan repetition), at bench scale.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import benchmarks, types
from mujoco_warp_tpu.ops import (collision_driver, constraint, forward as
                                 fwd, passive, sensor, smooth, solver)
from mujoco_warp_tpu.pallas import linalg as plinalg
from mujoco_warp_tpu.pallas import smooth as psmooth

NWORLD = int(os.environ.get('NWORLD', 8192))
REPS = 10


def timeit(name, fn, d):
  def scanned(d):
    def body(dd, _):
      return fn(dd), ()
    out, _ = jax.lax.scan(body, d, None, length=REPS)
    return out

  fn_j = jax.jit(scanned)
  out = jax.block_until_ready(fn_j(d))
  t0 = time.perf_counter()
  out = jax.block_until_ready(fn_j(d))
  dt = (time.perf_counter() - t0) / REPS
  print(f'{name:30s} {dt*1e3:9.2f} ms  ({dt/NWORLD*1e9:8.0f} ns/world)',
        flush=True)
  return out


def main():
  mjm = benchmarks.load_humanoid_benchmark()
  m, d = benchmarks.build(mjm, NWORLD)

  def pre(dd):
    dd = smooth.kinematics(m, dd)
    dd = smooth.com_pos(m, dd)
    dd = smooth.camlight(m, dd)
    dd = smooth.tendon(m, dd)
    return dd

  def mid(dd):
    dd = collision_driver.collision(m, dd)
    dd = constraint.make_constraint(m, dd)
    dd = smooth.transmission(m, dd)
    dd = sensor.sensor_pos(m, dd)
    dd = sensor.energy_pos(m, dd)
    actuator_velocity = dd.actuator_moment @ dd.qvel
    dd = dd.replace(actuator_velocity=actuator_velocity)
    dd = passive.passive(m, dd)
    dd = sensor.sensor_vel(m, dd)
    dd = sensor.energy_vel(m, dd)
    dd = fwd.fwd_actuation(m, dd)
    dd = fwd.fwd_smooth_force(m, dd)
    return dd

  def post(dd):
    dt = m.opt.timestep.astype(dd.qpos.dtype)
    qacc_int = plinalg.damped_solve_batched(m, dd.qM, m.dof_damping, dt,
                                            dd.qacc)
    return jax.vmap(lambda x, qi: fwd._advance(m, x, qi))(dd, qacc_int)

  d = timeit('pre (kin/compos/tendon)', lambda dd: jax.vmap(pre)(dd), d)
  d = timeit('mass_chain (pallas)', lambda dd: psmooth.mass_chain(m, dd), d)
  d = timeit('mid (col/efc/act/...)', lambda dd: jax.vmap(mid)(dd), d)
  d = timeit('qacc_smooth solve', lambda dd: dd.replace(
      qacc_smooth=plinalg.chol_solve_batched(m, dd.qLD, dd.qfrc_smooth)), d)
  d = timeit('solve_batched (pallas)', lambda dd: solver.solve_batched(m, dd),
             d)
  d = timeit('post (euler-damp/advance)', post, d)
  timeit('FULL step', lambda dd: fwd.step(m, dd), d)


if __name__ == '__main__':
  main()
