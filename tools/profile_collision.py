"""TPU timing of collision sub-stages for a registry scene.

Splits collision() into narrowphase (dist/pos/frame over candidates) and
compaction (per-class top_k pack) to attribute the cost.
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
from mujoco_warp_tpu import types  # noqa: E402
from mujoco_warp_tpu.ops import collision_driver as cd  # noqa: E402
from mujoco_warp_tpu.ops import forward as fwd  # noqa: E402

SCENE = os.environ.get('SCENE', 'three_humanoids')
NWORLD = int(os.environ.get('NWORLD', 8192))
REPS = int(os.environ.get('REPS', 20))


def timeit(name, fn, *args):
  fn_j = jax.jit(fn)
  out = jax.block_until_ready(fn_j(*args))
  t0 = time.perf_counter()
  for _ in range(REPS):
    out = fn_j(*args)
  jax.block_until_ready(out)
  dt = (time.perf_counter() - t0) / REPS
  print(f'{name:32s} {dt*1e3:8.2f} ms', flush=True)
  return out


def main():
  path, _, _, overrides, nconmax = BENCHMARKS[SCENE]
  mjm = mujoco.MjModel.from_xml_path(path)
  kw = {} if nconmax is None else {'nconmax': nconmax}
  m, d = bh.build(mjm, NWORLD, overrides=overrides, **kw)
  # settle into a generic state
  step = jax.jit(lambda dd: fwd.step(m, dd))
  for _ in range(5):
    d = step(d)
  d = jax.block_until_ready(d)
  dtype = d.qpos.dtype

  def narrow(dd):
    return jax.vmap(lambda w: cd._narrowphase_candidates(m, w))(dd)

  dist, pos, frame = timeit('narrowphase_candidates', narrow, d)

  def compact(dist, dd):
    def one(dist_w):
      outs = []
      for dim, cap, ci, slot in m.con_classes:
        ci_j = jnp.asarray(ci)
        act = dist_w[ci_j] < m.cand_includemargin[ci_j]
        order, nact = cd._pack_nearest(act, dist_w[ci_j], cap)
        outs.append(order)
      return outs

    return jax.vmap(one)(dist)

  timeit('compaction (top_k packs)', compact, dist.astype(dtype), d)
  timeit('collision (full)',
         lambda dd: jax.vmap(lambda w: cd.collision(m, w))(dd), d)

  # per-group narrowphase attribution
  from mujoco_warp_tpu.ops import collision_primitive, collision_convex
  for gi, (t1, t2, idx, slot) in enumerate(m.pair_groups):
    fn = collision_primitive.COLLIDERS.get((t1, t2))
    tag = 'prim' if fn is not None else 'convex'
    if fn is None:
      fn = collision_convex.make_convex_collider(int(t1), int(t2))
    g1 = m.pair_geom1[idx]
    g2 = m.pair_geom2[idx]

    def grp(dd, fn=fn, g1=g1, g2=g2):
      return jax.vmap(lambda w: fn(m, w, g1, g2)[0])(dd)

    timeit(f'  g{gi} ({int(t1)},{int(t2)}) n={len(idx)} {tag}', grp, d)


if __name__ == '__main__':
  main()
