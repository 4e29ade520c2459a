"""API-contract tests: pytree compatibility, put/get round trips.

Counterpart of reference io_jax_test.py:126-250 (the designed MJX
integration seam): Model/Data must stay jit-transparent pytrees — dynamic
leaves are jax Arrays, static aux data is hashable, vmap/jit compose, and
batched Data leaves lead with the world axis.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io, models, types


@pytest.fixture(scope='module')
def case():
  return models.fixture('constraints.xml', qpos_noise=0.1)


def test_model_is_pytree(case):
  mjm, mjd, m, d = case
  leaves, treedef = jax.tree.flatten(m)
  assert all(isinstance(l, jax.Array) for l in leaves), (
      'Model dynamic leaves must be jax Arrays')
  # aux data must be hashable (jit cache key)
  hash(treedef)
  m2 = jax.tree.unflatten(treedef, leaves)
  assert m2.nv == m.nv and m2.opt.solver == m.opt.solver


def test_data_is_pytree(case):
  mjm, mjd, m, d = case
  leaves, treedef = jax.tree.flatten(d)
  assert all(isinstance(l, jax.Array) for l in leaves)
  hash(treedef)


def test_jit_cache_stable(case):
  """Two put_model calls on the same mjm hit the same jit cache entry."""
  mjm, mjd, m, d = case
  m2 = io.put_model(mjm)
  calls = 0

  @jax.jit
  def f(m, d):
    nonlocal calls
    calls += 1
    return d.qpos * m.opt.timestep

  f(m, d)
  f(m2, d)  # identical static aux → no retrace
  assert calls == 1


def test_batched_leading_axis(case):
  mjm, mjd, m, d = case
  nworld = 3
  db = jax.tree.map(lambda x: jnp.broadcast_to(x, (nworld,) + x.shape), d)
  for leaf in jax.tree.leaves(db):
    assert leaf.shape[0] == nworld


def test_put_get_roundtrip(case):
  mjm, mjd, m, d = case
  mjd2 = mujoco.MjData(mjm)
  io.get_data_into(mjd2, mjm, d)
  np.testing.assert_allclose(mjd2.qpos, mjd.qpos, atol=1e-6)
  np.testing.assert_allclose(mjd2.qvel, mjd.qvel, atol=1e-6)
  np.testing.assert_allclose(mjd2.ctrl, mjd.ctrl, atol=1e-6)


def test_reset_mask(case):
  mjm, mjd, m, d = case
  nworld = 4
  db = jax.tree.map(lambda x: jnp.broadcast_to(x, (nworld,) + x.shape), d)
  db = db.replace(qpos=db.qpos + 0.5)
  mask = jnp.asarray([True, False, True, False])
  out = io.reset_data(m, db, reset_mask=mask)
  q0 = np.asarray(jax.device_get(m.qpos0))
  got = np.asarray(out.qpos)
  np.testing.assert_allclose(got[0], q0, atol=1e-6)
  np.testing.assert_allclose(got[1], np.asarray(db.qpos[1]), atol=1e-6)
