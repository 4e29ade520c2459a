"""Contact compaction: capped active-contact slots (runtime pruning).

Counterpart of the reference's capacity-knob behavior (io.py:1712
make_data(nconmax, njmax) + collision_core.py:214 write_contact slot
allocation + OverflowType accounting, types.py:149).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io, types
from mujoco_warp_tpu.models import load_mjm
from mujoco_warp_tpu.ops import forward as fwd


@pytest.fixture(scope='module')
def spheres():
  mjm = load_mjm('spheres.xml')
  mjd = mujoco.MjData(mjm)
  mujoco.mj_resetData(mjm, mjd)
  mujoco.mj_step(mjm, mjd, 50)  # settle: several resting contacts
  mujoco.mj_forward(mjm, mjd)
  return mjm, mjd


def _compacting_budget(mjm) -> int:
  """A budget that engages compaction: below the largest condim class
  (each class gets min(n_class, nconmax) slots) but above the scene's
  active-contact count."""
  m_full = io.put_model(mjm)
  cand_dim = np.asarray(m_full.con_dim)
  largest = max(np.sum(cand_dim == d) for d in set(cand_dim.tolist()))
  return max(8, int(largest) - 1)


def test_compacted_step_matches_lossless(spheres):
  mjm, mjd = spheres
  m_full = io.put_model(mjm)
  d_full = io.put_data(mjm, mjd, m_full)
  d_full = jax.jit(lambda dd: fwd.step(m_full, dd))(d_full)

  # generous budget: no overflow, physics must match the lossless path
  m_c = io.put_model(mjm, nconmax=_compacting_budget(mjm))
  assert m_c.con_compact and m_c.ncon < m_c.ncand
  d_c = io.put_data(mjm, mjd, m_c)
  d_c = jax.jit(lambda dd: fwd.step(m_c, dd))(d_c)
  assert int(d_c.overflow) == 0, 'budget too small for this scene state'

  np.testing.assert_allclose(d_c.qacc, d_full.qacc, rtol=1e-4, atol=1e-4)
  np.testing.assert_allclose(d_c.qpos, d_full.qpos, rtol=1e-5, atol=1e-6)
  assert int(d_c.ncon_active) == int(d_full.ncon_active)

  # active contact set matches: same candidate ids live (the lossless
  # model's slots are identity-mapped to candidates)
  act_full = set(np.nonzero(np.asarray(
      d_full.contact.dist < d_full.contact.includemargin))[0].tolist())
  live = np.asarray(d_c.contact.cand)
  valid = np.asarray(d_c.contact.dist < d_c.contact.includemargin)
  act_c = set(live[(live >= 0) & valid].tolist())
  assert act_c == act_full


def test_overflow_flag_and_truncation(spheres):
  mjm, mjd = spheres
  m1 = io.put_model(mjm, nconmax=1)
  d1 = io.put_data(mjm, mjd, m1)
  d1 = jax.jit(lambda dd: fwd.step(m1, dd))(d1)
  assert int(d1.overflow) & int(types.OverflowType.CONTACT)
  # capped slots only
  assert int(d1.ncon_active) <= m1.ncon
  assert np.all(np.isfinite(np.asarray(d1.qacc)))


def test_batched_compaction_per_world(spheres):
  mjm, mjd = spheres
  m_c = io.put_model(mjm, nconmax=_compacting_budget(mjm))
  d = io.put_data(mjm, mjd, m_c, nworld=4)
  # perturb worlds differently: different active sets per world
  qpos = np.array(d.qpos)  # writable host copy
  qpos[2][2] += 2.0  # lift a sphere in world 2 -> fewer contacts
  d = d.replace(qpos=jnp.asarray(qpos))
  d = jax.jit(lambda dd: fwd.step(m_c, dd))(d)
  n = np.asarray(d.ncon_active)
  assert n[2] < n[0]
  assert np.all(np.isfinite(np.asarray(d.qacc)))
