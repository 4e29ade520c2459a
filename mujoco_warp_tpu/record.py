"""record: rollout → rendered gif/webp/npz (reference: record.py).

  python -m mujoco_warp_tpu.record <mjcf> --out out.gif [--camera 0]
      [--nstep 200] [--fps 50] [--width 128] [--height 128]
      [--channel rgb|depth|segmentation] [--nworld 1]
"""

from __future__ import annotations

import argparse


def main(argv=None):
  p = argparse.ArgumentParser(description='mjwarp-tpu-record')
  p.add_argument('mjcf')
  p.add_argument('--out', default='rollout.gif')
  p.add_argument('--camera', type=int, default=0)
  p.add_argument('--nstep', type=int, default=200)
  p.add_argument('--frame_skip', type=int, default=4)
  p.add_argument('--fps', type=int, default=50)
  p.add_argument('--width', type=int, default=128)
  p.add_argument('--height', type=int, default=128)
  p.add_argument('--channel', default='rgb',
                 choices=['rgb', 'depth', 'segmentation'])
  p.add_argument('--keyframe', type=int, default=None)
  args = p.parse_args(argv)

  import jax
  import mujoco
  import numpy as np

  from mujoco_warp_tpu import io
  from mujoco_warp_tpu.ops import forward as fwd, render

  mjm = mujoco.MjModel.from_xml_path(args.mjcf)
  mjd = mujoco.MjData(mjm)
  if args.keyframe is not None:
    mujoco.mj_resetDataKeyframe(mjm, mjd, args.keyframe)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  rc = render.create_render_context(
      m, mjm, cam_ids=[args.camera], width=args.width, height=args.height)

  step = jax.jit(lambda d: fwd.step(m, d))
  render_fn = jax.jit(
      lambda d: render.render(m, fwd.fwd_position(m, d), rc))

  frames = []
  for k in range(args.nstep):
    if k % args.frame_skip == 0:
      out = render_fn(d)
      if args.channel == 'rgb':
        frames.append(np.asarray(render.get_rgb(out)[0]))
      elif args.channel == 'depth':
        dep = np.asarray(out[1][0])  # planar depth, 0 = background
        dep = np.where(dep > 0, dep, dep.max())
        dep = (255 * (1 - dep / max(dep.max(), 1e-6))).astype(np.uint8)
        frames.append(np.stack([dep] * 3, -1))
      else:
        seg = np.asarray(out[2][0])
        rng = np.random.default_rng(0)
        palette = rng.integers(40, 255, (max(seg.max() + 2, 2), 3),
                               dtype=np.uint8)
        palette[0] = 0
        frames.append(palette[seg + 1])
    d = step(d)

  if args.out.endswith('.npz'):
    np.savez_compressed(args.out, frames=np.stack(frames))
  else:
    import imageio

    imageio.mimsave(args.out, frames, fps=args.fps, loop=0)
  print(f'wrote {len(frames)} frames to {args.out}')


if __name__ == '__main__':
  main()
