"""viewer: interactive simulation with the TPU engine (reference: viewer.py).

  python -m mujoco_warp_tpu.viewer <mjcf> [--engine tpu|c] [--nstep ...]

Uses MuJoCo's native passive viewer for display; physics steps run through
this engine with a per-step readback into the viewer's MjData (the same
sync pattern as reference viewer.py:76-102).  Requires a display; in
headless environments use `python -m mujoco_warp_tpu.record` instead.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
  p = argparse.ArgumentParser(description='mjwarp-tpu-viewer')
  p.add_argument('mjcf')
  p.add_argument('--engine', choices=['tpu', 'c'], default='tpu')
  p.add_argument('--keyframe', type=int, default=None)
  args = p.parse_args(argv)

  import jax
  import mujoco
  import mujoco.viewer

  from mujoco_warp_tpu import cli, io
  from mujoco_warp_tpu.ops import forward as fwd

  mjm, mjd = cli.load_model(args.mjcf, keyframe=args.keyframe)
  m, d = cli.init_structs(mjm, mjd)
  step = jax.jit(lambda dd: fwd.step(m, dd))

  with mujoco.viewer.launch_passive(mjm, mjd) as v:
    while v.is_running():
      t0 = time.time()
      if args.engine == 'c':
        mujoco.mj_step(mjm, mjd)
      else:
        # upload user edits (ctrl / perturbations), step on device, sync
        d = d.replace(
            ctrl=jax.numpy.asarray(mjd.ctrl, d.ctrl.dtype),
            qfrc_applied=jax.numpy.asarray(mjd.qfrc_applied,
                                           d.qpos.dtype),
            xfrc_applied=jax.numpy.asarray(mjd.xfrc_applied,
                                           d.qpos.dtype))
        d = step(d)
        io.get_data_into(mjd, mjm, jax.block_until_ready(d))
        mujoco.mj_forward(mjm, mjd)  # refresh viewer-side derived fields
      v.sync()
      leftover = float(mjm.opt.timestep) - (time.time() - t0)
      if leftover > 0:
        time.sleep(leftover)


if __name__ == '__main__':
  main()
