"""Oracle tests for spatial tendons (wrap geometry) vs MuJoCo C."""

import os
import tempfile

import jax
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io, models
from mujoco_warp_tpu.ops import forward as fwd
from tests.oracle import assert_close

XML = """
<mujoco>
  <option timestep="0.005" jacobian="dense"/>
  <worldbody>
    <site name="origin" pos="0 0 1.2"/>
    <body name="upper" pos="0 0 1">
      <joint name="shoulder" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.35 0 0" contype="0" conaffinity="0"/>
      <geom name="pulley_sphere" type="sphere" size="0.06" pos="0.18 0 0.05" contype="0" conaffinity="0"/>
      <site name="elbow_site" pos="0.33 0 0.02"/>
      <site name="side" pos="0.18 0 0.14"/>
      <body name="fore" pos="0.35 0 0">
        <joint name="elbow" type="hinge" axis="0 1 0" damping="0.05"/>
        <geom name="wrapcyl" type="cylinder" size="0.03 0.08" quat="0.7071 0.7071 0 0" pos="0.0 0 0" contype="0" conaffinity="0"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0" contype="0" conaffinity="0"/>
        <site name="wrist" pos="0.28 0 0.02"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <spatial name="t_sphere" stiffness="15" damping="0.4">
      <site site="origin"/>
      <geom geom="pulley_sphere" sidesite="side"/>
      <site site="elbow_site"/>
    </spatial>
    <spatial name="t_cyl" stiffness="8" damping="0.2">
      <site site="elbow_site"/>
      <geom geom="wrapcyl"/>
      <site site="wrist"/>
    </spatial>
  </tendon>
  <actuator>
    <motor tendon="t_cyl" gear="1.0"/>
  </actuator>
</mujoco>"""


@pytest.fixture(scope='module')
def case():
  with tempfile.NamedTemporaryFile('w', suffix='.xml', delete=False) as f:
    f.write(XML)
    path = f.name
  out = models.fixture(path, qpos_noise=0.4, qvel_noise=0.3, nstep=3)
  os.unlink(path)
  return out


def test_tendon_geometry(case):
  mjm, mjd, m, d = case
  d = jax.block_until_ready(
      jax.jit(lambda d: fwd.fwd_position(m, d))(d))
  assert_close(d.ten_length, mjd.ten_length, 'ten_length', atol=1e-3,
               rtol=1e-3)
  # ten_J oracle by finite differences of ten_length (the bindings don't
  # expose the sparse index arrays for d.ten_J in this layout)
  eps = 1e-6
  ten_J_ref = np.zeros((mjm.ntendon, mjm.nv))
  mjd2 = mujoco.MjData(mjm)
  for v in range(mjm.nv):
    for sgn, col in ((1, 0), (-1, 1)):
      mjd2.qpos[:] = mjd.qpos
      mjd2.qpos[v] += sgn * eps  # hinge-only model: qpos dim == nv
      mujoco.mj_forward(mjm, mjd2)
      ten_J_ref[:, v] += sgn * mjd2.ten_length / (2 * eps)
  assert_close(d.ten_J, ten_J_ref, 'ten_J', atol=5e-3, rtol=5e-3)


def test_tendon_trajectory(case):
  mjm, mjd, m, d = case
  step = jax.jit(lambda d: fwd.step(m, d))
  for _ in range(100):
    mujoco.mj_step(mjm, mjd)
  for _ in range(100):
    d = step(d)
  d = jax.block_until_ready(d)
  assert_close(d.qpos, mjd.qpos, 'spatial-tendon qpos@100', atol=2e-3,
               rtol=2e-3)


def test_wrap_inside():
  """Sidesite inside the wrap geom triggers the inside-wrap solver
  (reference util_misc.py:203): tendon touches the circle from within.
  Oracle: mj_forward ten_length over a sweep of poses."""
  xml = """
<mujoco>
  <worldbody>
    <site name="a" pos="-0.5 0 0.22"/>
    <body pos="0 0 0">
      <geom name="wrap" type="cylinder" size="0.2 0.3" euler="90 0 0"
            contype="0" conaffinity="0"/>
      <site name="inside" pos="0 0 0.1"/>
    </body>
    <body pos="0.5 0 0">
      <joint name="h" type="slide" axis="0 0 1" range="-0.5 0.5"/>
      <geom type="sphere" size="0.05" mass="1"/>
      <site name="b" pos="0 0 0.22"/>
    </body>
  </worldbody>
  <tendon>
    <spatial name="t">
      <site site="a"/>
      <geom geom="wrap" sidesite="inside"/>
      <site site="b"/>
    </spatial>
  </tendon>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  fwd_pos = jax.jit(lambda dd: fwd.fwd_position(m, dd))
  checked = 0
  for q in np.linspace(-0.35, 0.35, 9):
    mujoco.mj_resetData(mjm, mjd)
    mjd.qpos[0] = q
    mujoco.mj_forward(mjm, mjd)
    d = io.put_data(mjm, mjd, m)
    d = fwd_pos(d)
    assert_close(d.ten_length, mjd.ten_length, f'ten_length q={q}',
                 atol=1e-4, rtol=1e-4)
    checked += 1
  assert checked == 9
