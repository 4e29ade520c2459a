"""Oracle tests for smooth (unconstrained) dynamics vs MuJoCo C.

Counterpart of reference mujoco_warp/_src/smooth_test.py: per-stage allclose
against mj_forward outputs on a joint-type-zoo model.
"""

import jax
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import models
from mujoco_warp_tpu.ops import smooth
from tests.oracle import assert_close, assert_quat_close


@pytest.fixture(scope='module')
def pendula():
  mjm, mjd, m, d = models.fixture(
      'pendula.xml', qpos_noise=0.2, qvel_noise=0.5, nstep=5)

  @jax.jit
  def run(d):
    d = smooth.kinematics(m, d)
    d = smooth.com_pos(m, d)
    d = smooth.crb(m, d)
    d = smooth.factor_m(m, d)
    d = smooth.com_vel(m, d)
    d = smooth.rne(m, d)
    return d

  return mjm, mjd, m, jax.block_until_ready(run(d))


def test_kinematics(pendula):
  mjm, mjd, m, d = pendula
  assert_close(d.xpos, mjd.xpos, 'xpos')
  assert_quat_close(d.xquat, mjd.xquat, 'xquat')
  assert_close(d.xmat, mjd.xmat.reshape(-1, 3, 3), 'xmat')
  assert_close(d.xipos, mjd.xipos, 'xipos')
  assert_close(d.ximat, mjd.ximat.reshape(-1, 3, 3), 'ximat')
  assert_close(d.xanchor, mjd.xanchor, 'xanchor')
  assert_close(d.xaxis, mjd.xaxis, 'xaxis')
  assert_close(d.geom_xpos, mjd.geom_xpos, 'geom_xpos')
  assert_close(d.geom_xmat, mjd.geom_xmat.reshape(-1, 3, 3), 'geom_xmat')


def test_com_pos(pendula):
  mjm, mjd, m, d = pendula
  assert_close(d.subtree_com, mjd.subtree_com, 'subtree_com')
  assert_close(d.cinert[:, :3, :3], np.array(
      [_cinert_full(mjd.cinert[i]) for i in range(mjm.nbody)])[:, :3, :3],
      'cinert_ang')
  assert_close(d.cdof, mjd.cdof, 'cdof')


def _cinert_full(ci10):
  """MuJoCo cinert packing (10,) -> 6x6 spatial inertia [ang; lin]."""
  ixx, iyy, izz, ixy, ixz, iyz = ci10[0:6]
  c = ci10[6:9]  # mass * com offset
  mass = ci10[9]
  I3 = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
  chat = np.array([
      [0, -c[2], c[1]],
      [c[2], 0, -c[0]],
      [-c[1], c[0], 0],
  ])
  out = np.zeros((6, 6))
  out[:3, :3] = I3
  out[:3, 3:] = chat
  out[3:, :3] = chat.T
  out[3:, 3:] = mass * np.eye(3)
  return out


def test_crb(pendula):
  mjm, mjd, m, d = pendula
  qM = np.zeros((mjm.nv, mjm.nv))
  mujoco.mj_fullM(mjm, mjd, qM)
  assert_close(d.qM, qM, 'qM')


def test_factor_solve(pendula):
  mjm, mjd, m, d = pendula
  rhs = np.linspace(-1.0, 1.0, mjm.nv)
  ours = np.asarray(smooth.solve_m(m, d, rhs.astype(np.float32)))
  ref = rhs.copy()
  mujoco.mj_solveM(mjm, mjd, ref.reshape(1, -1), rhs.reshape(1, -1))
  assert_close(ours, ref, 'solve_m')


def test_com_vel(pendula):
  mjm, mjd, m, d = pendula
  assert_close(d.cvel, mjd.cvel, 'cvel')
  assert_close(d.cdof_dot, mjd.cdof_dot, 'cdof_dot')


def test_rne(pendula):
  mjm, mjd, m, d = pendula
  assert_close(d.qfrc_bias, mjd.qfrc_bias, 'qfrc_bias')


def test_camlight():
  """Camera/light frames vs mj_forward (reference: smooth.py:985)."""
  import tempfile, os
  xml = """
<mujoco>
  <worldbody>
    <light pos="0 0 3" dir="0 0 -1" mode="targetbody" target="b2"/>
    <body name="b1" pos="0 0 1">
      <joint type="hinge" axis="0 1 0"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.4 0 0" contype="0" conaffinity="0"/>
      <camera name="c_fixed" pos="0.1 0.2 0.3" euler="20 30 10"/>
      <camera name="c_track" pos="0.5 0 0.5" mode="track"/>
      <camera name="c_trackcom" pos="0.5 0 0.8" mode="trackcom"/>
      <light pos="0.1 0 0.5" dir="0 0 -1"/>
      <body name="b2" pos="0.4 0 0">
        <joint type="ball"/>
        <geom type="sphere" size="0.05" contype="0" conaffinity="0"/>
        <camera name="c_target" pos="1 1 1" mode="targetbody" target="b1"/>
      </body>
    </body>
  </worldbody>
</mujoco>"""
  with tempfile.NamedTemporaryFile('w', suffix='.xml', delete=False) as f:
    f.write(xml)
    path = f.name
  mjm, mjd, m, d = models.fixture(path, qpos_noise=0.3, qvel_noise=0.2,
                                  nstep=3)
  os.unlink(path)
  from mujoco_warp_tpu.ops import smooth as sm
  run = jax.jit(lambda d: sm.camlight(m, sm.com_pos(m, sm.kinematics(m, d))))
  d = jax.block_until_ready(run(d))
  assert_close(d.cam_xpos, mjd.cam_xpos, 'cam_xpos')
  assert_close(d.cam_xmat, mjd.cam_xmat.reshape(-1, 3, 3), 'cam_xmat',
               atol=1e-3, rtol=1e-3)
  assert_close(d.light_xpos, mjd.light_xpos, 'light_xpos')
  assert_close(d.light_xdir, mjd.light_xdir, 'light_xdir', atol=1e-3,
               rtol=1e-3)
