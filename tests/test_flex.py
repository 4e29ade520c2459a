"""Flex (deformable/cloth) dynamics vs the C oracle.

Reference: mujoco_warp/_src/smooth.py:604 (flex kinematics),
passive.py:593/711 (elasticity/bending), constraint.py:878 (edge
equality), collision_flex.py (vertex collision) and flex_test.py.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io
from mujoco_warp_tpu.ops import forward as fwd


def _cloth_xml(extra='', edge='<edge equality="true"/>', pos='0 0 0.5',
               contact='<contact selfcollide="none" contype="0" conaffinity="0"/>'):
  return f'''
<mujoco>
  <worldbody>
    <geom type="plane" size="2 2 .1"/>
    <flexcomp type="grid" count="4 4 1" spacing="0.1 0.1 0.1" pos="{pos}"
              dim="2" mass="0.16" name="cloth" radius="0.01">
      {contact}
      {edge}
      {extra}
    </flexcomp>
  </worldbody>
</mujoco>'''


def _fixture(xml, nstep=0, qvel_noise=0.0, seed=0):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_resetData(mjm, mjd)
  if qvel_noise:
    rng = np.random.default_rng(seed)
    mjd.qvel[:] = qvel_noise * rng.standard_normal(mjm.nv)
  if nstep:
    mujoco.mj_step(mjm, mjd, nstep)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  return mjm, mjd, m, d


def test_flex_kinematics():
  mjm, mjd, m, d = _fixture(_cloth_xml(), qvel_noise=0.1)
  d = jax.jit(lambda dd: fwd.forward(m, dd))(d)
  np.testing.assert_allclose(np.asarray(d.flexvert_xpos),
                             mjd.flexvert_xpos, atol=1e-6)
  np.testing.assert_allclose(np.asarray(d.flexedge_length),
                             mjd.flexedge_length, atol=1e-6)


def test_edge_equality_qacc():
  mjm, mjd, m, d = _fixture(_cloth_xml(), qvel_noise=0.1)
  assert m.ne == mjm.nflexedge  # one row per edge
  d = jax.jit(lambda dd: fwd.forward(m, dd))(d)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc,
                             atol=5e-4, rtol=5e-4)


def test_elasticity_and_bending_forces():
  xml = _cloth_xml(
      extra='<elasticity young="1e4" poisson="0.3" thickness="0.01" '
            'elastic2d="both" damping="0.01"/>',
      edge='<edge equality="false"/>')
  mjm, mjd, m, d = _fixture(xml, qvel_noise=0.1)
  d = jax.jit(lambda dd: fwd.forward(m, dd))(d)
  scale = max(1.0, np.abs(mjd.qfrc_passive).max())
  err = np.max(np.abs(np.asarray(d.qfrc_passive) - mjd.qfrc_passive))
  assert err / scale < 5e-5, f'flex passive err {err:.2e}'
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc,
                             atol=5e-4, rtol=5e-3)


def test_cloth_drop_collision():
  """Cloth falls onto the plane: vertex contacts match the C oracle."""
  xml = _cloth_xml(pos='0 0 0.08',
                   contact='<contact selfcollide="none"/>')
  mjm, mjd, m, d = _fixture(xml, nstep=60)
  assert m.ncand == mjm.nflexvert  # plane-vertex candidates
  d = jax.jit(lambda dd: fwd.forward(m, dd))(d)
  act = np.asarray(d.contact.dist) < np.asarray(d.contact.includemargin)
  assert int(act.sum()) == mjd.ncon
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc,
                             atol=5e-4, rtol=5e-4)


def test_cloth_drop_trajectory():
  """50-step settling trajectory tracks the C oracle."""
  xml = _cloth_xml(pos='0 0 0.08',
                   contact='<contact selfcollide="none"/>')
  mjm, mjd, m, d = _fixture(xml)
  step = jax.jit(lambda dd: fwd.step(m, dd))
  for _ in range(50):
    d = step(d)
    mujoco.mj_step(mjm, mjd)
  err = np.max(np.abs(np.asarray(d.qpos) - mjd.qpos))
  assert err < 1e-4, f'cloth 50-step qpos err {err:.2e}'


def test_cloth_batched_step():
  """Batched cloth worlds step and stay finite (the capability claim)."""
  xml = _cloth_xml(pos='0 0 0.2', contact='<contact selfcollide="none"/>')
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  d = io.make_data(m, nworld=8)
  rng = np.random.default_rng(0)
  qvel = 0.1 * rng.standard_normal((8, m.nv)).astype(np.float32)
  d = d.replace(qvel=jnp.asarray(qvel))
  step = jax.jit(lambda dd: fwd.step(m, dd))
  for _ in range(20):
    d = step(d)
  assert np.all(np.isfinite(np.asarray(d.qpos)))
  # worlds diverge (different noise) but all stay on the plane side
  assert np.asarray(d.qpos).reshape(8, -1, 3)[..., 2].min() > -0.05
