"""Coarse per-phase TPU timing of the batched general path.

Times the same 5 phases fwd.step executes (pre / mass_chain / mid /
solve / integrate) — few compiles, async-loop timing.  SCENE env selects
a benchmark registry entry.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from benchmarks import BENCHMARKS  # noqa: E402

from mujoco_warp_tpu import benchmarks as bh  # noqa: E402
from mujoco_warp_tpu.ops import (collision_driver, constraint,  # noqa: E402
                                 forward as fwd, island, passive, sensor,
                                 smooth, solver)
from mujoco_warp_tpu.pallas import linalg as plinalg  # noqa: E402
from mujoco_warp_tpu.pallas import smooth as psmooth  # noqa: E402
from mujoco_warp_tpu.pallas import solver as psolver  # noqa: E402

SCENE = os.environ.get('SCENE', 'three_humanoids')
NWORLD = int(os.environ.get('NWORLD', 8192))
REPS = int(os.environ.get('REPS', 10))


def timeit(name, fn, d):
  fn_j = jax.jit(fn)
  out = jax.block_until_ready(fn_j(d))
  t0 = time.perf_counter()
  for _ in range(REPS):
    out = fn_j(d)
  jax.block_until_ready(out)
  dt = (time.perf_counter() - t0) / REPS
  print(f'{name:30s} {dt*1e3:9.2f} ms  ({dt/NWORLD*1e9:8.0f} ns/world)',
        flush=True)
  return out


def main():
  path, _, _, overrides, nconmax = BENCHMARKS[SCENE]
  mjm = mujoco.MjModel.from_xml_path(path)
  m, d = bh.build(mjm, NWORLD, nconmax=nconmax, overrides=overrides)
  print(f'{SCENE}: nv={m.nv} nbody={m.nbody} ncand={m.ncand} '
        f'ncon={m.ncon} nefc={m.nefc} '
        f'mass_chain={psmooth.supported(m, d)} '
        f'psolver={psolver.supported(m, d)}', flush=True)

  def pre(dd):
    def one(x):
      x = smooth.kinematics(m, x)
      x = smooth.com_pos(m, x)
      x = smooth.camlight(m, x)
      x = smooth.tendon(m, x)
      return x
    return jax.vmap(one)(dd)

  def mid(dd):
    def one(x):
      if m.opt.run_collision_detection:
        x = collision_driver.collision(m, x)
      x = constraint.make_constraint(m, x)
      x = island.island(m, x)
      x = smooth.transmission(m, x)
      x = sensor.sensor_pos(m, x)
      x = sensor.energy_pos(m, x)
      av = x.actuator_moment @ x.qvel if m.nu else x.actuator_velocity
      x = x.replace(actuator_velocity=av)
      x = passive.passive(m, x)
      x = sensor.sensor_vel(m, x)
      x = sensor.energy_vel(m, x)
      x = fwd.fwd_actuation(m, x)
      x = fwd.fwd_smooth_force(m, x)
      return x
    return jax.vmap(one)(dd)

  def qaccs(dd):
    return dd.replace(qacc_smooth=plinalg.chol_solve_batched(
        m, dd.qLD, dd.qfrc_smooth))

  d = timeit('pre (kin/com/tendon)', pre, d)
  d = timeit('mass_chain (pallas)', lambda dd: psmooth.mass_chain(m, dd),
             d)
  d = timeit('mid (col/efc/act)', mid, d)
  d = timeit('qacc_smooth', qaccs, d)
  d = timeit('solve_batched', lambda dd: solver.solve_batched(m, dd), d)
  d = timeit('euler', lambda dd: jax.vmap(
      lambda x: fwd.euler(m, x))(dd), d)
  timeit('FULL step', lambda dd: fwd.step(m, dd), d)


if __name__ == '__main__':
  main()
