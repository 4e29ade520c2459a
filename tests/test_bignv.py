"""Big-nv representations: tree-blocked mass matrix (Model.m_blocked),
compact-chain constraint Jacobian (Model.efc_compact), and flex
self-collision — the pieces that make the reference's own cloth
benchmark scene (benchmarks/cloth/scene.xml: 900-vertex towel, 2706
DoF, CG solver) reachable (reference: per-tree M-block layout
io.py:191-241, sparse J constraint.py, flex self-collision
collision_flex.py:3705).
"""

import os

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io, types
from mujoco_warp_tpu.models import fixture
from mujoco_warp_tpu.ops import collision_driver, forward, smooth

_CLOTH_REF = '/root/reference/benchmarks/cloth/scene.xml'


def test_blocked_compact_equivalence():
  """Forced blocked-M + compact-J on the toy cloth reproduces the dense
  path exactly (same math, different representation)."""
  mjm, mjd, m, d = fixture('cloth.xml')
  assert not m.m_blocked and not m.efc_compact  # small scene: dense
  m2 = io.put_model(mjm, m_blocked=True, efc_compact=True)
  assert m2.m_blocked and m2.efc_compact
  assert m2.efc_K == 6  # 3-dof particle chains, plane has no dofs
  d2 = io.put_data(mjm, mjd, m2)
  s1 = jax.jit(lambda dd: forward.step(m, dd))
  s2 = jax.jit(lambda dd: forward.step(m2, dd))
  for _ in range(20):
    d = s1(d)
    d2 = s2(d2)
  np.testing.assert_allclose(np.asarray(d.qpos), np.asarray(d2.qpos),
                             atol=1e-6)
  np.testing.assert_allclose(np.asarray(d.qvel), np.asarray(d2.qvel),
                             atol=1e-5)


def test_blocked_m_matches_oracle_qm():
  """qM_blk blocks equal the oracle mass matrix's tree blocks."""
  mjm, mjd, m, d = fixture('cloth.xml')
  m2 = io.put_model(mjm, m_blocked=True)
  d2 = io.put_data(mjm, mjd, m2)
  d2 = jax.jit(lambda dd: smooth.crb(
      m2, smooth.com_pos(m2, smooth.kinematics(m2, dd))))(d2)
  Mdense = np.zeros((mjm.nv, mjm.nv))
  mujoco.mj_fullM(mjm, mjd, Mdense)
  for Mb, (w, rows, _) in zip(d2.qM_blk, m2.tree.block_classes):
    np.testing.assert_allclose(
        np.asarray(Mb), Mdense[rows[:, :, None], rows[:, None, :]],
        rtol=1e-5, atol=1e-7)


_SELF = """
<mujoco>
  <worldbody>
    <flexcomp type="grid" count="3 3 1" spacing="0.05 0.05 0.05"
              pos="0 0 1" dim="2" mass="0.1" name="c" radius="0.01">
      <contact selfcollide="{mode}"/>
      <edge equality="true"/>
    </flexcomp>
  </worldbody>
</mujoco>
"""


def test_flex_self_collision_pairs():
  """Same-flex vertex-vertex pairs exist iff selfcollide is enabled, and
  element-sharing neighbors are excluded."""
  mjm = mujoco.MjModel.from_xml_string(_SELF.format(mode='auto'))
  pairs = collision_driver.collision_pairs(mjm)
  both_flex = (pairs.pair_geom1 >= mjm.ngeom) & (pairs.pair_geom2 >=
                                                 mjm.ngeom)
  assert np.any(both_flex)
  # grid neighbors share an element -> excluded; far corners remain
  vids = set()
  for a, b in zip(pairs.pair_geom1[both_flex] - mjm.ngeom,
                  pairs.pair_geom2[both_flex] - mjm.ngeom):
    vids.add((int(a), int(b)))
  assert (0, 8) in vids or (8, 0) in vids  # opposite corners
  assert (0, 1) not in vids and (1, 0) not in vids  # edge neighbors

  mjm0 = mujoco.MjModel.from_xml_string(_SELF.format(mode='none'))
  pairs0 = collision_driver.collision_pairs(mjm0)
  both0 = (pairs0.pair_geom1 >= mjm0.ngeom) & (pairs0.pair_geom2 >=
                                               mjm0.ngeom)
  assert not np.any(both0)


def test_flex_self_collision_contact():
  """Two overlapping non-adjacent vertices produce an active contact."""
  mjm = mujoco.MjModel.from_xml_string(_SELF.format(mode='auto'))
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  col = jax.jit(lambda dd: collision_driver.collision(
      m, smooth.flex(m, smooth.kinematics(m, dd))))
  assert int(col(d).ncon_active) == 0  # flat grid: no self contacts
  # slide vertex 0 onto vertex 8 (opposite corner): dx=+0.1, dy=+0.1
  q = np.zeros(mjm.nq)
  q[0] = 0.095
  q[1] = 0.095
  d1 = d.replace(qpos=jnp.asarray(q, jnp.float32))
  d1 = col(d1)
  assert int(d1.ncon_active) >= 1
  con = d1.contact
  g1 = np.asarray(con.geom1)
  g2 = np.asarray(con.geom2)
  act = np.asarray(con.dist < con.includemargin)
  assert np.any(act & (g1 >= mjm.ngeom) & (g2 >= mjm.ngeom))


@pytest.mark.skipif(not os.path.exists(_CLOTH_REF),
                    reason='reference cloth assets not present')
def test_reference_cloth_scene():
  """The reference's own cloth benchmark scene (2706 DoF) auto-selects
  the blocked/compact representations and tracks the C oracle."""
  mjm = mujoco.MjModel.from_xml_path(_CLOTH_REF)
  m = io.put_model(mjm)
  assert m.m_blocked and m.efc_compact
  widths = sorted(w for w, _, _ in m.tree.block_classes)
  assert widths == [3, 6]  # 900 particles + free-root mannequin
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  d = io.put_data(mjm, mjd, m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(10):
    d = step(d)
    mujoco.mj_step(mjm, mjd)
  q = np.asarray(d.qpos, np.float64)
  assert np.all(np.isfinite(q))
  # towel in free fall + edge equality; mannequin resting on the plane
  assert np.max(np.abs(q[7:] - mjd.qpos[7:])) < 5e-4
  assert np.max(np.abs(q[:7] - mjd.qpos[:7])) < 5e-4
  assert int(d.overflow) == 0
