"""World-level sleep skipping (the sleeping payoff).

`forward._step_sleep_skip` packs worlds with any awake tree into W//4
slots and steps only those (reference: sleeping exists to cut work —
solve_compact solver.py:3790-4160).  These tests pin exact equivalence
with the plain batched path in the fully-asleep, mixed, and
over-capacity regimes.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mujoco_warp_tpu import io
from mujoco_warp_tpu.models import fixture
from mujoco_warp_tpu.ops import forward


def _settled_clutter(W=256, settle=400):
  mjm, _, _, _ = fixture('clutter.xml')
  mjm.opt.enableflags |= mujoco.mjtEnableBit.mjENBL_SLEEP
  m = io.put_model(mjm, nconmax={1: 24, 3: 48})
  d = io.make_data(m, nworld=W)
  qpos0 = np.tile(np.asarray(d.qpos[0]), (W, 1))
  rng = np.random.RandomState(0)
  d = d.replace(qpos=jnp.asarray(
      (qpos0 + rng.uniform(-1e-3, 1e-3, qpos0.shape)).astype(np.float32)))
  bstep = jax.jit(lambda d: forward._step_batched(m, d))
  for _ in range(settle):
    d = bstep(d)
  return m, jax.block_until_ready(d), rng


def test_sleep_skip_equivalence():
  m, d0, rng = _settled_clutter()
  W = d0.qpos.shape[0]
  asleep_frac = float(jnp.mean((d0.tree_asleep >= 0).astype(jnp.float32)))
  assert asleep_frac > 0.9, asleep_frac

  # wake a handful of worlds via applied forces (the only wake source
  # for a fully-asleep world — nothing moves, so no new contacts)
  qf = np.zeros(np.asarray(d0.qfrc_applied).shape, np.float32)
  wake_ids = rng.choice(W, 20, replace=False)
  qf[wake_ids, :6] = 2.0
  d0 = d0.replace(qfrc_applied=jnp.asarray(qf))

  step = jax.jit(lambda d: forward.step(m, d))  # dispatches to skip path
  bstep = jax.jit(lambda d: forward._step_batched(m, d))
  da = db = d0
  for _ in range(20):
    da, db = step(da), bstep(db)
  da, db = jax.block_until_ready((da, db))
  np.testing.assert_array_equal(np.asarray(da.tree_asleep),
                                np.asarray(db.tree_asleep))
  assert np.max(np.abs(np.asarray(da.qpos) - np.asarray(db.qpos))) < 1e-6
  assert np.max(np.abs(np.asarray(da.time) - np.asarray(db.time))) < 1e-5


def test_sleep_skip_overflow_fallback():
  """More awake worlds than the W//4 pack: lax.cond falls back to the
  full batched step — still exact."""
  m, d0, rng = _settled_clutter(W=256, settle=50)  # mostly still awake
  nawake = int(jnp.sum(jnp.any(d0.tree_asleep < 0, axis=-1)))
  assert nawake > 64, nawake  # over the 256//4 cap
  step = jax.jit(lambda d: forward.step(m, d))
  bstep = jax.jit(lambda d: forward._step_batched(m, d))
  da, db = step(d0), bstep(d0)
  da, db = jax.block_until_ready((da, db))
  assert np.max(np.abs(np.asarray(da.qpos) - np.asarray(db.qpos))) < 1e-6
