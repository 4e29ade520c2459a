"""Broadphase pruning: pruned-vs-dense parity + the aloha_pot
mesh-manipulation criterion (reference unroll_test.py:37-57).

The pruned pipeline (prefilter -> capped per-group narrowphase ->
deepest-first compaction, ops/collision_driver._collision_pruned) must
produce the same active contact set as the dense path whenever nothing
overflows, and must make mesh scenes (aloha_pot: 204 geoms, 134 meshes,
30k candidates) steppable with a bounded EFC system.
"""

import os

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io
from mujoco_warp_tpu.models import fixture
from mujoco_warp_tpu.ops import collision_driver, forward

_ALOHA = ('/root/reference/mujoco_warp/test_data/aloha_pot/scene.xml')


def _contact_set(m, d):
  """Set of (cand_id, rounded dist) for active contact slots."""
  dist = np.asarray(d.contact.dist)
  im = np.asarray(d.contact.includemargin)
  cand = np.asarray(d.contact.cand)
  act = dist < im
  return {(int(c), round(float(x), 6)) for c, x in
          zip(cand[act], dist[act])}


_SPREAD = """
<mujoco>
  <worldbody>
    <geom type="plane" size="20 20 .1"/>
    {bodies}
  </worldbody>
</mujoco>
"""


def _spread_scene():
  """8 free spheres, two of them touching, the rest far apart."""
  xs = [0.0, 0.25, 2.0, 4.0, 6.0, 8.0, 10.0, 12.0]
  bodies = '\n'.join(
      f'<body pos="{x} 0 0.15"><freejoint/>'
      f'<geom type="sphere" size="0.15"/></body>' for x in xs)
  return mujoco.MjModel.from_xml_string(_SPREAD.format(bodies=bodies))


def test_pruned_matches_dense():
  """Same actives through the pruned path as the dense compaction."""
  mjm = _spread_scene()
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m_dense = io.put_model(mjm, nconmax=16)
  assert not any(bc for bc, _ in m_dense.bp_groups)
  # force pruning: tiny per-group pair budget, generous class caps
  m_pruned = io.put_model(mjm, nconmax=16, bp_cap=6)
  if not any(bc for bc, _ in m_pruned.bp_groups):
    pytest.skip('scene too small for any pruned group')
  from mujoco_warp_tpu.ops import smooth
  d0 = io.put_data(mjm, mjd, m_dense)
  d1 = io.put_data(mjm, mjd, m_pruned)
  c0 = jax.jit(lambda d: collision_driver.collision(
      m_dense, smooth.kinematics(m_dense, d)))(d0)
  c1 = jax.jit(lambda d: collision_driver.collision(
      m_pruned, smooth.kinematics(m_pruned, d)))(d1)
  assert not int(c0.overflow) and not int(c1.overflow)
  assert _contact_set(m_dense, c0) == _contact_set(m_pruned, c1)
  assert int(c0.ncon_active) == int(c1.ncon_active)


def test_condim_homogeneous_groups():
  """Every pair group holds a single condim (pruned classes rely on it)."""
  mjm, _, m, _ = fixture('spheres.xml')
  for (t1, t2, idx, slot), (bc, dim) in zip(m.pair_groups, m.bp_groups):
    pair_dims = set()
    for i in idx:
      cands = np.nonzero(np.asarray(m.con_pair) == i)[0]
      pair_dims |= {int(np.asarray(m.con_dim)[c]) for c in cands}
    assert len(pair_dims) <= 1


@pytest.mark.skipif(not os.path.exists(_ALOHA),
                    reason='reference aloha_pot assets not present')
def test_aloha_pot_bounded_load():
  """aloha_pot loads with a bounded EFC system via auto capacity
  analysis (VERDICT r2: was ncand=30,658 / nefc=94,586 lossless)."""
  mjm = mujoco.MjModel.from_xml_path(_ALOHA)
  m = io.put_model(mjm)
  assert m.con_compact
  assert m.nefc < 1500, m.nefc
  assert any(bc for bc, _ in m.bp_groups)


@pytest.mark.skipif(not os.path.exists(_ALOHA),
                    reason='reference aloha_pot assets not present')
def test_aloha_lifts_pot():
  """Replay the lift_pot ctrl trajectory from keyframe lift_pot0: the
  pot ends up in the air, lid open above it (reference
  unroll_test.py:37-57 thresholds)."""
  mjm = mujoco.MjModel.from_xml_path(_ALOHA)

  # reference io.make_trajectory (io.py:3857): linear ctrl interpolation
  keys = [k for k in range(mjm.nkey)
          if mujoco.mj_id2name(mjm, mujoco.mjtObj.mjOBJ_KEY,
                               k).startswith('lift_pot')]
  ctrls, prev, tprev, t = [], np.zeros(mjm.nu), 0.0, 0.0
  for k in keys:
    ck, ct = mjm.key_ctrl[k], mjm.key_time[k]
    while t < ct:
      f = (t - tprev) / (ct - tprev)
      ctrls.append(prev * (1 - f) + ck * f)
      t += mjm.opt.timestep
    ctrls.append(ck)
    t += mjm.opt.timestep
    prev, tprev = ck, t
  traj = jnp.asarray(np.array(ctrls, np.float32))

  m = io.put_model(mjm)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_resetDataKeyframe(mjm, mjd, keys[0])
  mujoco.mj_forward(mjm, mjd)
  d = io.put_data(mjm, mjd, m)

  def body(d, ctrl):
    return forward.step(m, d.replace(ctrl=ctrl)), 0

  d, _ = jax.jit(lambda d: jax.lax.scan(body, d, traj))(d)
  pot = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_BODY,
                          'partnet_100015')
  lid = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_BODY,
                          'partnet_100015/link_0')
  assert float(d.xpos[pot, 2]) > 0.069
  assert float(d.xpos[lid, 2]) > 0.16
