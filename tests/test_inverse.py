"""Oracle tests: inverse dynamics, state get/set, override_model, CG."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io, models
from mujoco_warp_tpu.ops import forward as fwd, inverse, support
from tests.oracle import assert_close


def test_inverse():
  mjm, mjd, m, d = models.fixture(
      'constraints.xml', qpos_noise=0.2, qvel_noise=0.4, nstep=3)
  mujoco.mj_inverse(mjm, mjd)
  run = jax.jit(lambda d: inverse.inverse(m, d))
  out = jax.block_until_ready(run(d))
  assert_close(out.qfrc_inverse, mjd.qfrc_inverse, 'qfrc_inverse',
               atol=5e-3, rtol=5e-3)


def test_state_roundtrip():
  mjm, mjd, m, d = models.fixture('constraints.xml', qpos_noise=0.2,
                                  qvel_noise=0.3, ctrl_noise=0.2)
  sig = support.STATE_INTEGRATION
  s = support.get_state(m, d, sig)
  assert s.shape[-1] == support.state_size(m, sig)
  # zero the data, restore, and check round trip
  blank = io.make_data(m)
  d2 = support.set_state(m, blank, s, sig)
  assert_close(d2.qpos, d.qpos, 'qpos roundtrip', atol=0, rtol=1e-6)
  assert_close(d2.qvel, d.qvel, 'qvel roundtrip', atol=0, rtol=1e-6)
  assert_close(d2.ctrl, d.ctrl, 'ctrl roundtrip', atol=0, rtol=1e-6)
  assert float(d2.time) == float(d.time)


def test_override_model():
  mjm, mjd, m, d = models.fixture('pendula.xml')
  m2 = io.override_model(m, ['opt.solver=cg', 'opt.iterations=30',
                             'opt.timestep=0.002'])
  assert m2.opt.solver == 1
  assert m2.opt.iterations == 30
  assert abs(float(m2.opt.timestep) - 0.002) < 1e-9
  # opt.cone is baked into the static EFC row layout at put_model time;
  # a post-hoc flip would run elliptic zone logic over pyramidal rows
  import pytest
  with pytest.raises(ValueError, match='cone'):
    io.override_model(m, ['opt.cone=elliptic'])


def test_cg_solver():
  """CG path matches mj_forward with solver=CG."""
  mjm, mjd, m, d = models.fixture(
      'spheres.xml', qvel_noise=0.3, nstep=20,
      overrides=('opt.solver=1', 'opt.iterations=150'))
  run = jax.jit(lambda d: fwd.forward(m, d))
  out = jax.block_until_ready(run(d))
  assert_close(out.qacc, mjd.qacc, 'cg qacc', atol=5e-2, rtol=5e-2)


def test_elliptic_cone():
  """Elliptic-cone Newton solve matches mj_forward (jnp fallback path)."""
  mjm, mjd, m, d = models.fixture(
      'spheres.xml', qvel_noise=0.3, nstep=25, overrides=('opt.cone=1',))
  run = jax.jit(lambda d: fwd.forward(m, d))
  out = jax.block_until_ready(run(d))
  assert_close(out.qacc, mjd.qacc, 'elliptic qacc', atol=5e-2, rtol=5e-2)
