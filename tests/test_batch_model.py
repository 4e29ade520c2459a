"""Per-world batched model parameters (domain randomization).

Reference: (*, ...) leading-dim model fields with worldid % broadcast
(types.py:871-879, io.py:287-310, io_test.py batched-consistency tests).
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
def pendula():
  mjm = load_mjm('pendula.xml')
  return mjm


def _worlds(m, nworld):
  d = io.make_data(m, nworld=nworld)
  return d


def test_batched_gravity_matches_per_world_models(pendula):
  mjm = pendula
  m = io.put_model(mjm)
  nworld = 4
  grav = np.stack([[0, 0, -9.81], [0, 0, -1.0], [0, 0, 0.0],
                   [1.0, 0, -9.81]]).astype(np.float32)
  mb = io.batch_model(m, nworld, {'opt.gravity': grav})
  assert mb.batch_fields == ('opt.gravity',)
  d = _worlds(mb, nworld)
  d = jax.jit(lambda dd: fwd.step(mb, dd))(d)

  # oracle: separate single-world models with each gravity
  for w in range(nworld):
    mw = m.replace(opt=m.opt.replace(gravity=jnp.asarray(grav[w])))
    dw = io.make_data(mw)
    dw = jax.jit(lambda dd, _mw=mw: fwd.step(_mw, dd))(dw)
    np.testing.assert_allclose(np.asarray(d.qacc)[w], np.asarray(dw.qacc),
                               rtol=1e-5, atol=1e-6)


def test_batched_damping_divisor_broadcast(pendula):
  mjm = pendula
  m = io.put_model(mjm)
  nworld = 4
  damp = np.stack([np.full(m.nv, 0.1), np.full(m.nv, 5.0)]).astype(
      np.float32)  # B=2 tiles to 4 with % semantics
  mb = io.batch_model(m, nworld, {'dof_damping': damp})
  d = _worlds(mb, nworld)
  d = d.replace(qvel=jnp.ones_like(d.qvel))
  d = jax.jit(lambda dd: fwd.step(mb, dd))(d)
  qv = np.asarray(d.qvel)
  # worlds 0/2 share damping 0.1, worlds 1/3 share 5.0
  np.testing.assert_allclose(qv[0], qv[2], rtol=1e-6)
  np.testing.assert_allclose(qv[1], qv[3], rtol=1e-6)
  assert not np.allclose(qv[0], qv[1])


def test_batched_friction_flows_into_contacts():
  mjm = load_mjm('spheres.xml')
  mjd = mujoco.MjData(mjm)
  mujoco.mj_resetData(mjm, mjd)
  mujoco.mj_step(mjm, mjd, 50)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  nworld = 2
  fric = np.tile(np.asarray(jax.device_get(m.geom_friction))[None], (2, 1, 1))
  fric[1, :, 0] = 0.05  # low-friction world 1 (pyramidal D ~ 1/mu^2
  # overflows f32 for mu -> 0, as in the reference's f32 configuration)
  mb = io.batch_model(m, nworld, {'geom_friction': fric})
  assert 'cand_friction' in mb.batch_fields
  d = io.put_data(mjm, mjd, mb, nworld=nworld)
  qv = np.zeros((nworld, m.nv), np.float32)
  qv[:, 0] = 1.0  # slide a sphere
  d = d.replace(qvel=jnp.asarray(qv))
  d = jax.jit(lambda dd: fwd.step(mb, dd))(d)
  # the low-friction world decelerates less
  v0 = float(np.asarray(d.qvel)[0, 0])
  v1 = float(np.asarray(d.qvel)[1, 0])
  assert v1 > v0 + 1e-5, (v0, v1)


def test_bad_batch_shapes_raise(pendula):
  m = io.put_model(pendula)
  with pytest.raises(ValueError):
    io.batch_model(m, 4, {'opt.gravity': np.zeros((3, 2), np.float32)})
  with pytest.raises(ValueError):
    io.batch_model(m, 4, {'dof_damping': np.zeros((3, m.nv), np.float32)})
  with pytest.raises(NotImplementedError):
    io.batch_model(m, 4, {'geom_size': np.zeros((4, m.ngeom, 3),
                                                np.float32)})
