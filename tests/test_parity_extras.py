"""Parity holes closed in round 2: tendon armature/bias, ellipsoid fluid.

Reference: smooth.py:1165 (tendon_armature), smooth.py:2119 (tendon_bias),
passive.py:306 (_fluid_force ellipsoid branch).
"""

import jax
import mujoco
import numpy as np

from mujoco_warp_tpu import io
from mujoco_warp_tpu.ops import forward as fwd


def _forward_pair(xml, seed=0, qvel_scale=1.0):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mjd.qvel[:] = qvel_scale * np.random.default_rng(seed).standard_normal(
      mjm.nv)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  d = jax.jit(lambda dd: fwd.forward(m, dd))(d)
  return mjm, mjd, m, d


_TENDON_XML = '''<mujoco>
<worldbody>
  <body pos="0 0 1"><joint name="j0" type="hinge" axis="0 1 0"/>
    <geom size="0.05" pos="0.2 0 0" mass="1"/>
    <body pos="0.4 0 0"><joint name="j1" type="hinge" axis="0 1 0"/>
      <geom size="0.05" pos="0.2 0 0" mass="1"/>
      <site name="s1" pos="0.3 0 0"/></body></body>
  <site name="s0" pos="0 0 1.2"/>
</worldbody>
<tendon>
  <fixed name="tf" armature="0.15">
    <joint joint="j0" coef="1.0"/><joint joint="j1" coef="-0.6"/></fixed>
  <spatial name="ts" armature="0.08"><site site="s0"/><site site="s1"/>
  </spatial>
</tendon>
</mujoco>'''


def test_tendon_armature_mass_matrix():
  mjm, mjd, m, d = _forward_pair(_TENDON_XML, qvel_scale=0.5)
  M = np.zeros((mjm.nv, mjm.nv))
  mujoco.mj_fullM(mjm, mjd, M)
  np.testing.assert_allclose(np.asarray(d.qM), M, atol=1e-6)


def test_tendon_bias_force():
  mjm, mjd, m, d = _forward_pair(_TENDON_XML, qvel_scale=0.5)
  np.testing.assert_allclose(np.asarray(d.qfrc_bias), mjd.qfrc_bias,
                             atol=5e-6)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=5e-5)


_FLUID_XML = '''<mujoco>
<option density="1.2" viscosity="0.3" wind="0.5 0.2 0"/>
<worldbody>
  <body pos="0 0 1"><freejoint/>
    <geom type="ellipsoid" size="0.1 0.05 0.2" fluidshape="ellipsoid"
          mass="0.5"/></body>
  <body pos="1 0 1"><freejoint/>
    <geom type="capsule" size="0.05 0.2" mass="0.3"/></body>
  <body pos="2 0 1"><freejoint/>
    <geom type="box" size="0.1 0.15 0.05" mass="0.4"/></body>
</worldbody></mujoco>'''


def test_ellipsoid_and_box_fluid():
  mjm, mjd, m, d = _forward_pair(_FLUID_XML)
  np.testing.assert_allclose(np.asarray(d.qfrc_fluid), mjd.qfrc_fluid,
                             atol=5e-6)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-4,
                             rtol=1e-4)


def test_capsule_sphere_fluid_semiaxes():
  """Ellipsoid fluid on capsule/sphere geoms (semiaxes conversion)."""
  xml = '''<mujoco>
  <option density="2.0" viscosity="0.1"/>
  <worldbody>
    <body pos="0 0 1"><freejoint/>
      <geom type="capsule" size="0.05 0.2" fluidshape="ellipsoid"
            mass="0.3"/></body>
    <body pos="1 0 1"><freejoint/>
      <geom type="sphere" size="0.08" fluidshape="ellipsoid" mass="0.2"/>
    </body>
  </worldbody></mujoco>'''
  mjm, mjd, m, d = _forward_pair(xml)
  np.testing.assert_allclose(np.asarray(d.qfrc_fluid), mjd.qfrc_fluid,
                             atol=5e-6)
