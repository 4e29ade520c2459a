"""Per-stage TPU timing via in-scan repetition (amortizes dispatch).

Counterpart of the reference's EventTracer tree (warp_util.py:25-119).
Each stage is wrapped in a 20-iteration lax.scan so the measurement is
device compute, not RPC dispatch.
"""

import time

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mujoco_warp_tpu import benchmarks, io
from mujoco_warp_tpu.ops import (collision_driver, constraint, forward as
                                 fwd, passive, sensor, smooth, solver)

NWORLD = 1024
REPS = 20


def timeit(name, fn, d):
  def scanned(d):
    def body(dd, _):
      return fn(dd), ()
    out, _ = jax.lax.scan(body, d, None, length=REPS)
    return out

  fn_j = jax.jit(scanned)
  out = jax.block_until_ready(fn_j(d))  # compile
  t0 = time.perf_counter()
  out = jax.block_until_ready(fn_j(d))
  dt = (time.perf_counter() - t0) / REPS
  print(f'{name:30s} {dt*1e3:9.2f} ms  ({dt/NWORLD*1e9:8.0f} ns/world)',
        flush=True)
  return out


def main():
  mjm = mujoco.MjModel.from_xml_path(benchmarks.HUMANOID_XML)
  m, d = benchmarks.build(mjm, NWORLD)
  v = lambda f: (lambda dd: jax.vmap(lambda x: f(m, x))(dd))

  d = timeit('kinematics', v(smooth.kinematics), d)
  d = timeit('com_pos', v(smooth.com_pos), d)
  d = timeit('crb', v(smooth.crb), d)
  d = timeit('com_vel', v(smooth.com_vel), d)
  d = timeit('factor_m', v(smooth.factor_m), d)
  d = timeit('collision', v(collision_driver.collision), d)
  d = timeit('make_constraint', v(constraint.make_constraint), d)
  d = timeit('transmission', v(smooth.transmission), d)
  d = timeit('fwd_velocity', v(fwd.fwd_velocity), d)
  d = timeit('fwd_actuation', v(fwd.fwd_actuation), d)
  d = timeit('fwd_acceleration', v(fwd.fwd_acceleration), d)
  d = timeit('solve', v(solver.solve), d)
  d = timeit('euler', v(fwd.euler), d)
  timeit('FULL step', lambda dd: fwd.step(m, dd), d)


if __name__ == '__main__':
  main()
