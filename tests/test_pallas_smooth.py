"""Pallas mass-chain megakernel vs the jnp smooth stages (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_warp_tpu import models
from mujoco_warp_tpu.ops import smooth
from mujoco_warp_tpu.pallas import smooth as psmooth
from tests.oracle import assert_close


@pytest.mark.parametrize('big', [False, True])
def test_mass_chain_vs_jnp(big, monkeypatch):
  if big:
    # force the vectorized-qM / XLA-Cholesky variant on a small scene
    monkeypatch.setattr(psmooth, '_big_tree', lambda m: True)
  mjm, mjd, m, d = models.fixture('spheres.xml', qvel_noise=0.5, nstep=20)
  W = psmooth.TILE_W
  db = jax.tree.map(lambda x: jnp.broadcast_to(x, (W,) + x.shape), d)
  rng = np.random.default_rng(1)
  db = db.replace(qvel=db.qvel + 0.05 * jnp.asarray(
      rng.standard_normal((W, mjm.nv)).astype(np.float32)))

  pre = jax.jit(jax.vmap(lambda x: smooth.com_pos(m, smooth.kinematics(
      m, x))))
  db = jax.block_until_ready(pre(db))

  ref = jax.jit(jax.vmap(lambda x: smooth.rne(m, smooth.com_vel(
      m, smooth.factor_m(m, smooth.crb(m, x))))))(db)
  out = jax.jit(lambda dd: psmooth.mass_chain(m, dd, interpret=True))(db)

  assert_close(out.qM, ref.qM, 'qM', atol=1e-4, rtol=1e-4)
  assert_close(out.cvel, ref.cvel, 'cvel', atol=1e-4, rtol=1e-4)
  assert_close(out.cdof_dot, ref.cdof_dot, 'cdof_dot', atol=1e-4,
               rtol=1e-4)
  assert_close(out.qfrc_bias, ref.qfrc_bias, 'qfrc_bias', atol=1e-3,
               rtol=1e-3)
  # factor: L Lᵀ must reproduce qM
  L = np.asarray(out.qLD)
  M2 = np.einsum('wik,wjk->wij', L, L)
  assert_close(M2, np.asarray(ref.qM), 'LLT', atol=1e-3, rtol=1e-3)
