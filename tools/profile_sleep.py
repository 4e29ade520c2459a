"""Per-piece TPU timing of the sleep/island bookkeeping on clutter_arm.

Attributes the measured SLEEP-on overhead (results_r5: -17% vs off) to
its components: wake checks, island discovery, row masking, sleep state
machine — each jitted standalone over the settled state.
"""

import os
import sys
import time

import jax
import mujoco

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from benchmarks import BENCHMARKS  # noqa: E402

from mujoco_warp_tpu import benchmarks as bh  # noqa: E402
from mujoco_warp_tpu.ops import forward as fwd  # noqa: E402
from mujoco_warp_tpu.ops import island  # noqa: E402
from mujoco_warp_tpu.ops import sleep as sleep_ops  # noqa: E402

NWORLD = int(os.environ.get('NWORLD', 4096))
REPS = int(os.environ.get('REPS', 20))


def timeit(name, fn, d):
  fn_j = jax.jit(fn)
  out = jax.block_until_ready(fn_j(d))
  t0 = time.perf_counter()
  for _ in range(REPS):
    out = fn_j(d)
  jax.block_until_ready(out)
  dt = (time.perf_counter() - t0) / REPS
  print(f'{name:24s} {dt*1e3:9.3f} ms', flush=True)
  return out


def main():
  path, _, _, overrides, nconmax = BENCHMARKS['clutter_arm']
  mjm = mujoco.MjModel.from_xml_path(path)
  m, d = bh.build(mjm, NWORLD, nconmax=nconmax, overrides=overrides)
  print(f'nv={m.nv} ntree={m.ntree} nefc={m.nefc} ncand={m.ncand}')
  step = jax.jit(lambda dd: fwd.step(m, dd))
  # settle 150 steps so the clutter is asleep (the steady state the
  # benchmark measures)
  for _ in range(int(os.environ.get("SETTLE", 150))):
    d = step(d)
  d = jax.block_until_ready(d)
  import jax.numpy as jnp
  print('asleep trees:', int(jnp.sum(d.tree_asleep >= 0)), '/',
        NWORLD * m.ntree)
  v = lambda f: (lambda dd: jax.vmap(lambda x: f(m, x))(dd))
  timeit('FULL step', step, d)
  timeit('wake', v(sleep_ops.wake), d)
  timeit('wake_collision', v(sleep_ops.wake_collision), d)
  timeit('wake_equality', v(sleep_ops.wake_equality), d)
  timeit('mask_sleeping', v(sleep_ops.mask_sleeping), d)
  timeit('island', v(island.island), d)
  timeit('sleep', v(sleep_ops.sleep), d)


if __name__ == '__main__':
  main()
