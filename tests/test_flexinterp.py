"""Interpolated (nodal/trilinear) flexes vs the C oracle (reference:
flex_interp kinematics smooth.py:256, corotational cell elasticity
passive.py:822 `_flex_passive_interp`).

Trilinear flexes interpolate every vertex from 8 corner node particles
with static weights; elasticity is the corotational 24x24 cell
stiffness on the nodes; vertex contacts ride static node-weight
jacobians (translation only).
"""

import jax
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io
from mujoco_warp_tpu.ops import forward as fwd

_XML = """
<mujoco>
  <option solver="CG" timestep="0.001"/>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <flexcomp type="grid" count="4 4 4" spacing="0.05 0.05 0.05"
              pos="0 0 0.14" dim="3" mass="0.5" name="c" radius="0.01"
              dof="trilinear">
      <contact selfcollide="none" internal="false"/>
      <elasticity young="200" poisson="0.2" damping="0.3"/>
      <edge equality="{eq}"/>
    </flexcomp>
  </worldbody>
</mujoco>"""


def _setup(eq='false', qnoise=0.005, vnoise=0.05, seed=0):
  mjm = mujoco.MjModel.from_xml_string(_XML.format(eq=eq))
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  mjd.qpos[:] += qnoise * rng.standard_normal(mjm.nq)
  mjd.qvel[:] = vnoise * rng.standard_normal(mjm.nv)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  return mjm, mjd, m, d


def test_interp_kinematics_and_forces():
  """Vertex interpolation, corotational elasticity, and qacc match the
  oracle on a randomly deformed state."""
  mjm, mjd, m, d = _setup()
  assert len(m.flex_iv_ids) == 64 and mjm.nv == 24
  d = jax.jit(lambda dd: fwd.forward(m, dd))(d)
  np.testing.assert_allclose(np.asarray(d.flexvert_xpos),
                             mjd.flexvert_xpos, atol=1e-6)
  np.testing.assert_allclose(np.asarray(d.qfrc_passive), mjd.qfrc_passive,
                             atol=1e-5)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-4,
                             rtol=1e-4)


def test_interp_lands_on_floor():
  """The trilinear cube falls, its interpolated vertices contact the
  plane (node-weight contact jacobians), and the trajectory tracks the
  oracle through the landing."""
  mjm, mjd, m, d = _setup()
  step = jax.jit(lambda dd: fwd.step(m, dd))
  for _ in range(300):
    d = step(d)
    mujoco.mj_step(mjm, mjd)
  q = np.asarray(d.qpos)
  assert np.isfinite(q).all()
  np.testing.assert_allclose(q, mjd.qpos, atol=2e-3)
  # it actually contacted: the cube rests near the floor
  assert mjd.qpos[2::3].min() < -0.02


def test_interp_edge_equality():
  """Flex-edge equality rows distribute over node dofs via the static
  trilinear weights (the vertex-dof chain rule).  Edge equality and
  elasticity are mutually exclusive in MJCF, so this scene drops the
  elasticity block."""
  xml = _XML.format(eq='true').replace(
      '<elasticity young="200" poisson="0.2" damping="0.3"/>', '')
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(0)
  mjd.qpos[:] += 0.005 * rng.standard_normal(mjm.nq)
  mjd.qvel[:] = 0.05 * rng.standard_normal(mjm.nv)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  d = jax.jit(lambda dd: fwd.forward(m, dd))(d)
  assert int(np.asarray(d.nefc_active)) == mjd.nefc
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-3,
                             rtol=1e-3)


def test_interp_rejects_compaction():
  mjm = mujoco.MjModel.from_xml_string(_XML.format(eq='false'))
  with pytest.raises(NotImplementedError, match='compaction'):
    io.put_model(mjm, nconmax=4)
