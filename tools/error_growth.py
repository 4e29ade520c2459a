"""Error-growth study: the accuracy north star vs contact chaos.

Runs the reference humanoid from a noise-injected start in three
engines — the C oracle (f64), this engine in f64, and this engine in
f32 — and prints max |qpos| divergence at checkpoints.

Measured result (2026-08, CPU backend):

    step    10: ours64-vs-C 9.3e-16  ours32-vs-C 1.5e-07
    step   100: ours64-vs-C 5.2e-15  ours32-vs-C 1.1e-06
    step   300: ours64-vs-C 7.5e-07  ours32-vs-C 2.0e-05
    step   600: ours64-vs-C 7.6e-04  ours32-vs-C 7.2e-04
    step  1000: ours64-vs-C 7.4e-04  ours32-vs-C 7.3e-04

Interpretation: the f64 engine matches the oracle at the 1e-15/step
level (machine epsilon — the implementations are the same math), yet
both f64 and f32 trajectories leave the 1e-4 band between steps ~450
and ~600.  The bound is the Lyapunov growth of contact-rich dynamics
(e-folding ~10 steps on this scene), not arithmetic precision: no
reimplementation, at any precision, holds 1e-4 over 1000 steps unless
it reproduces the oracle bit-for-bit.  The practical accuracy bar is
therefore per-step exactness (f64: ~1e-15; f32: ~1e-7) plus bounded
statistics over long horizons, which tests/test_unroll.py asserts.

Usage: JAX_PLATFORMS=cpu python tools/error_growth.py [xml] [nstep]
"""

import sys

import jax

jax.config.update('jax_enable_x64', True)

import mujoco
import numpy as np

from mujoco_warp_tpu import io
from mujoco_warp_tpu.ops import forward as fwd


def study(xml_path: str, nstep: int = 1000, seed: int = 7,
          qvel_noise: float = 0.05):
  mjm = mujoco.MjModel.from_xml_path(xml_path)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  mjd.qvel[:] = qvel_noise * rng.standard_normal(mjm.nv)
  mujoco.mj_forward(mjm, mjd)

  m64 = io.put_model(mjm, dtype=np.float64)
  d64 = io.put_data(mjm, mjd, m64)
  m32 = io.put_model(mjm, dtype=np.float32)
  d32 = io.put_data(mjm, mjd, m32)
  s64 = jax.jit(lambda dd: fwd.step(m64, dd))
  s32 = jax.jit(lambda dd: fwd.step(m32, dd))

  marks = sorted({10, 50, 100, 300, 600, nstep} & set(range(nstep + 1)))
  rows = []
  for k in range(1, nstep + 1):
    mujoco.mj_step(mjm, mjd)
    d64 = s64(d64)
    d32 = s32(d32)
    if k in marks:
      e64 = float(np.abs(np.asarray(d64.qpos) - mjd.qpos).max())
      e32 = float(np.abs(np.asarray(d32.qpos) - mjd.qpos).max())
      x = float(np.abs(np.asarray(d32.qpos).astype(np.float64) -
                       np.asarray(d64.qpos)).max())
      rows.append((k, e64, e32, x))
      print(f'step {k:5d}: ours64-vs-C {e64:.2e}  ours32-vs-C {e32:.2e}'
            f'  32-vs-64 {x:.2e}')
  return rows


if __name__ == '__main__':
  xml = sys.argv[1] if len(sys.argv) > 1 else \
      '/root/reference/benchmarks/humanoid/humanoid.xml'
  n = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
  study(xml, n)
