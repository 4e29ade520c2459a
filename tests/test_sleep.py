"""Sleeping (mjENBL_SLEEP): tree sleep/wake state machine vs the C oracle.

Reference: mujoco_warp/_src/sleep.py (sleep:947, wake:721,
wake_collision:744) and sleep_test.py.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io, types
from mujoco_warp_tpu.ops import forward as fwd

_XML = """
<mujoco>
  <option>
    <flag sleep="enable"/>
  </option>
  <worldbody>
    <geom type="plane" size="5 5 .1"/>
    <body pos="0 0 0.3">
      <freejoint/>
      <geom type="sphere" size="0.1"/>
    </body>
    <body pos="1 0 0.4">
      <freejoint/>
      <geom type="box" size="0.1 0.1 0.1"/>
    </body>
    <body pos="0 1 2.0">
      <freejoint/>
      <geom type="sphere" size="0.1"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.fixture(scope='module')
def settled():
  mjm = mujoco.MjModel.from_xml_string(_XML)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_resetData(mjm, mjd)
  return mjm, mjd


def test_trees_fall_asleep(settled):
  mjm, mjd = settled
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  assert m.opt.enableflags & types.EnableBit.SLEEP

  step = jax.jit(lambda dd: fwd.step(m, dd))
  nstep = 1500
  for _ in range(nstep):
    d = step(d)

  mjd2 = mujoco.MjData(mjm)
  mujoco.mj_resetData(mjm, mjd2)
  for _ in range(nstep):
    mujoco.mj_step(mjm, mjd2)

  asleep_eng = np.asarray(d.tree_asleep) >= 0
  asleep_c = np.asarray(mjd2.tree_asleep) >= 0
  # every settled tree sleeps in both engines
  np.testing.assert_array_equal(asleep_eng, asleep_c)
  assert asleep_eng.all(), 'all trees should be asleep after settling'
  # sleeping trees have exactly zero velocity
  assert np.all(np.asarray(d.qvel) == 0.0)
  assert np.all(np.asarray(d.qacc) == 0.0)


def test_sleeping_tree_stays_frozen(settled):
  mjm, mjd = settled
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  step = jax.jit(lambda dd: fwd.step(m, dd))
  for _ in range(1500):
    d = step(d)
  assert (np.asarray(d.tree_asleep) >= 0).all()
  qpos0 = np.asarray(d.qpos).copy()
  for _ in range(50):
    d = step(d)
  np.testing.assert_array_equal(np.asarray(d.qpos), qpos0)


def test_applied_force_wakes_group(settled):
  mjm, mjd = settled
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  step = jax.jit(lambda dd: fwd.step(m, dd))
  for _ in range(1500):
    d = step(d)
  assert (np.asarray(d.tree_asleep) >= 0).all()

  # push tree 0's body upward
  xfrc = np.zeros((mjm.nbody, 6), np.float32)
  xfrc[1, 2] = 50.0
  d = d.replace(xfrc_applied=jnp.asarray(xfrc))
  d = step(d)
  asleep = np.asarray(d.tree_asleep)
  assert asleep[0] < 0, 'forced tree must wake'
  # the other trees stay asleep (separate islands)
  assert asleep[2] >= 0
  # and it actually moves again
  d = d.replace(xfrc_applied=jnp.asarray(xfrc))
  d = step(d)
  assert np.abs(np.asarray(d.qvel)[:6]).max() > 0


def test_put_get_roundtrip_sleep_state(settled):
  mjm, mjd = settled
  mjd2 = mujoco.MjData(mjm)
  mujoco.mj_resetData(mjm, mjd2)
  for _ in range(1500):
    mujoco.mj_step(mjm, mjd2)
  assert (np.asarray(mjd2.tree_asleep) >= 0).all()

  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd2, m)
  # labels: asleep markers preserved
  assert (np.asarray(d.tree_asleep) >= 0).all()
  mjd3 = mujoco.MjData(mjm)
  io.get_data_into(mjd3, mjm, d)
  # cycle encoding: every sleeping tree points into its own group
  out = np.asarray(mjd3.tree_asleep)
  assert (out >= 0).all()
  # self-cycles for unconstrained single trees
  for t in range(mjm.ntree):
    assert out[t] < mjm.ntree


def test_sleep_oracle_trajectory(settled):
  """Engine and C agree on the settled state (sleep freezes both)."""
  mjm, mjd = settled
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  step = jax.jit(lambda dd: fwd.step(m, dd))
  for _ in range(1500):
    d = step(d)
  mjd2 = mujoco.MjData(mjm)
  mujoco.mj_resetData(mjm, mjd2)
  for _ in range(1500):
    mujoco.mj_step(mjm, mjd2)
  # settled heights match closely (trajectories are contact-chaotic in
  # f32 vs f64, but the rest state is the same)
  z_eng = np.asarray(d.qpos).reshape(3, 7)[:, 2]
  z_c = np.asarray(mjd2.qpos).reshape(3, 7)[:, 2]
  np.testing.assert_allclose(z_eng, z_c, atol=5e-3)


def test_lazy_islands_match_eager(settled, monkeypatch):
  """Batched stepping with the batch-global lazy island skip reproduces
  the unconditional per-step labeler exactly (tree_asleep AND qpos).

  The skip fires on steps where no awake tree's quiescence counter can
  reach ready (ops/forward._island_lazy); this pins the claim that stale
  labels on those steps are behavior-identical.
  """
  from mujoco_warp_tpu.ops import island as island_ops

  mjm, mjd = settled
  m = io.put_model(mjm)

  def batched(n=4):
    d = io.make_data(m, nworld=n)
    # decorrelate worlds a little so sleep onset differs per world
    qv = np.zeros((n, mjm.nv), np.float32)
    qv[:, 0] = np.linspace(0.0, 0.05, n)
    return d.replace(qvel=jnp.asarray(qv))

  nstep = 900

  def rollout():
    d = batched()
    step = jax.jit(lambda dd: fwd.step(m, dd))
    for _ in range(nstep):
      d = step(d)
    return d

  d_lazy = rollout()
  assert np.all(np.asarray(d_lazy.tree_asleep) >= 0), \
      'fixture must settle to sleep within the rollout'

  eager = lambda mm, dd: jax.vmap(lambda x: island_ops.island(mm, x))(dd)
  monkeypatch.setattr(fwd, '_island_lazy', eager)
  d_eager = rollout()

  np.testing.assert_array_equal(np.asarray(d_lazy.tree_asleep),
                                np.asarray(d_eager.tree_asleep))
  np.testing.assert_array_equal(np.asarray(d_lazy.qpos),
                                np.asarray(d_eager.qpos))
