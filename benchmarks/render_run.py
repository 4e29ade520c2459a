"""Render throughput benchmark (reference: benchmarks/render/__init__.py).

Measures batched frames/s: every world renders its scene camera at
64x64 (the reference's render_width/height) while physics steps between
frames — the reference's `function: "render"` rollout shape.  Scenes:

  primitives — 7-geom primitive zoo (reference render class)
  mug        — mesh mug (exercises the skip-pointer ray BVH, ops/bvh.py)

Run:  python benchmarks/render_run.py [--nworld N] [--nstep N]
Emits one JSON line per scene.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
  sys.path.insert(0, _ROOT)

_REF_RENDER = '/root/reference/benchmarks/render'

SCENES = {
    'render_primitives': os.path.join(_REF_RENDER, 'primitives.xml'),
    'render_mug': '/root/reference/mujoco_warp/test_data/mug/mug.xml',
}


def run_one(name: str, path: str, nworld: int, nstep: int,
            res=(64, 64)):
  import jax
  import jax.numpy as jnp
  import mujoco
  import numpy as np

  from mujoco_warp_tpu import io
  from mujoco_warp_tpu.ops import forward as fwd
  from mujoco_warp_tpu.ops import render as render_ops

  mjm = mujoco.MjModel.from_xml_path(path)
  m = io.put_model(mjm)
  d = io.make_data(m, nworld=nworld)
  rng = np.random.default_rng(0)
  d = d.replace(qpos=d.qpos + 0.01 * jnp.asarray(
      rng.standard_normal(d.qpos.shape).astype(np.float32)))
  rc = render_ops.create_render_context(m, mjm, width=res[1], height=res[0])

  def frame(dd):
    dd = fwd.step(m, dd)
    out = jax.vmap(lambda w: render_ops.render(m, w, rc))(dd)
    return dd, render_ops.get_rgb(out)

  frame_j = jax.jit(frame, donate_argnums=0)
  t0 = time.perf_counter()
  d, rgb = frame_j(d)
  jax.block_until_ready(rgb)
  jit_s = time.perf_counter() - t0

  t0 = time.perf_counter()
  for _ in range(nstep):
    d, rgb = frame_j(d)
  jax.block_until_ready(rgb)
  dt = time.perf_counter() - t0

  frames = nworld * nstep
  rays = frames * res[0] * res[1]
  return {
      'benchmark': name,
      'frames_per_sec': frames / dt,
      'mrays_per_sec': rays / dt / 1e6,
      'jit_duration': jit_s,
      'run_time': dt,
      'nworld': nworld,
      'nstep': nstep,
      'width': res[1],
      'height': res[0],
  }


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument('--benchmark', action='append', default=None)
  p.add_argument('--nworld', type=int, default=512)
  p.add_argument('--nstep', type=int, default=20)
  p.add_argument('--output', default=None)
  args = p.parse_args(argv)
  out_f = open(args.output, 'a') if args.output else None
  for name in (args.benchmark or list(SCENES)):
    try:
      rec = run_one(name, SCENES[name], args.nworld, args.nstep)
    except Exception as e:
      rec = {'benchmark': name, 'error': f'{type(e).__name__}: {e}'}
    line = json.dumps(rec)
    print(line, flush=True)
    if out_f:
      out_f.write(line + '\n')
      out_f.flush()
  if out_f:
    out_f.close()


if __name__ == '__main__':
  main()
