"""Flex dim-1 (capsule chains) and dim-3 (tets): load, elasticity, and
landing parity with the C oracle (reference: collision_flex.py element
dispatch; elasticity passive.py flex metric).

Scope notes (documented divergences, shared with the reference):
  - flex internal collisions raise (the reference raises identically,
    reference io.py:478)
  - dim-3 self-collision is element-based in C; vertex-sphere
    self-collision cannot see tet-face proximity, so parity scenes use
    selfcollide="none"
"""

import jax
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io
from mujoco_warp_tpu.ops import forward as fwd

_ROPE = """<mujoco>
  <option solver="CG"/>
  <worldbody><geom type="plane" size="3 3 .1"/>
  <flexcomp type="grid" count="8 1 1" spacing="0.1 0.1 0.1" pos="0 0 0.3"
            dim="1" mass="0.2" name="r" radius="0.02">
    <edge equality="true"/>
  </flexcomp></worldbody></mujoco>"""

_TET = """<mujoco>
  <option solver="CG" timestep="0.001"/>
  <worldbody><geom type="plane" size="3 3 .1"/>
  <flexcomp type="grid" count="3 3 3" spacing="0.08 0.08 0.08"
            pos="0 0 0.15" dim="3" mass="1.0" name="t" radius="0.02">
    <elasticity young="200" poisson="0.2" damping="0.3"/>
    <contact internal="false" selfcollide="none"/>
    <edge equality="false"/>
  </flexcomp></worldbody></mujoco>"""


def _run(xml, nstep):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  step = jax.jit(lambda dd: fwd.step(m, dd))
  for _ in range(nstep):
    d = step(d)
    mujoco.mj_step(mjm, mjd)
  return mjm, mjd, m, d


def test_rope_dim1_lands():
  """A dim-1 rope falls, contacts the plane, and rests at the oracle
  trajectory (vertex-sphere contacts coincide with the C result)."""
  mjm, mjd, m, d = _run(_ROPE, 400)
  q = np.asarray(d.qpos)
  assert np.isfinite(q).all()
  np.testing.assert_allclose(q, mjd.qpos, atol=2e-3)
  # resting height = vertex radius (z dofs are displacements from 0.3)
  z_abs = 0.3 + q[2::3]
  assert np.allclose(z_abs, 0.02, atol=2e-3), z_abs


def test_tet_dim3_elastic_lands():
  """A dim-3 tet cube with Young/Poisson elasticity falls and deforms
  onto the plane, matching the oracle trajectory."""
  mjm, mjd, m, d = _run(_TET, 400)
  q = np.asarray(d.qpos)
  assert np.isfinite(q).all()
  np.testing.assert_allclose(q, mjd.qpos, atol=5e-3)
  assert q[2::3].min() < -0.05  # it actually fell and contacted


def test_dim3_elasticity_forces():
  """Element-metric elastic + damping passive forces match the oracle on
  a randomly deformed tet grid (flight phase, no contacts)."""
  xml = _TET.replace('pos="0 0 0.15"', 'pos="0 0 0.5"')
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(0)
  mjd.qpos[:] += 0.01 * rng.standard_normal(mjm.nq)
  mjd.qvel[:] = 0.05 * rng.standard_normal(mjm.nv)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  d = jax.jit(lambda dd: fwd.forward(m, dd))(d)
  np.testing.assert_allclose(np.asarray(d.qfrc_passive), mjd.qfrc_passive,
                             atol=2e-4)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=5e-3,
                             rtol=1e-3)


def test_internal_raises():
  """flex internal collisions raise, matching the reference
  (reference io.py:478)."""
  xml = _TET.replace('internal="false"', 'internal="true"')
  mjm = mujoco.MjModel.from_xml_string(xml)
  with pytest.raises(NotImplementedError, match='internal'):
    io.put_model(mjm)
