"""Oracle tests for RK4 and implicitfast integrators vs mj_step."""

import jax
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import models
from mujoco_warp_tpu.ops import forward as fwd
from tests.oracle import assert_close


@pytest.mark.parametrize('integrator,tol', [
    ('rk4', 1e-3),
    ('implicitfast', 1e-3),
])
def test_trajectory(integrator, tol):
  code = {'rk4': 1, 'implicitfast': 3}[integrator]
  mjm, mjd, m, d = models.fixture(
      'pendula.xml', qpos_noise=0.1, qvel_noise=0.1, seed=7,
      overrides=(f'opt.integrator={code}',))
  step = jax.jit(lambda d: fwd.step(m, d))
  nsteps = 100
  for _ in range(nsteps):
    mujoco.mj_step(mjm, mjd)
  for _ in range(nsteps):
    d = step(d)
  d = jax.block_until_ready(d)
  assert_close(d.qpos, mjd.qpos, f'{integrator} qpos@{nsteps}', atol=tol,
               rtol=tol)
  assert_close(d.qvel, mjd.qvel, f'{integrator} qvel@{nsteps}',
               atol=10 * tol, rtol=10 * tol)


def test_implicitfast_actuated():
  mjm, mjd, m, d = models.fixture(
      'constraints.xml', qpos_noise=0.1, qvel_noise=0.2, ctrl_noise=0.3,
      seed=3, overrides=('opt.integrator=3',))
  step = jax.jit(lambda d: fwd.step(m, d))
  for _ in range(50):
    mujoco.mj_step(mjm, mjd)
  for _ in range(50):
    d = step(d)
  d = jax.block_until_ready(d)
  assert_close(d.qpos, mjd.qpos, 'implicitfast-act qpos@50', atol=5e-3,
               rtol=5e-3)


def test_implicit_full():
  """Full IMPLICIT integrator (RNE velocity derivative) vs mj_step."""
  mjm, mjd, m, d = models.fixture(
      'pendula.xml', qpos_noise=0.1, qvel_noise=0.3, seed=11,
      overrides=('opt.integrator=2',))
  step = jax.jit(lambda d: fwd.step(m, d))
  for _ in range(100):
    mujoco.mj_step(mjm, mjd)
  for _ in range(100):
    d = step(d)
  d = jax.block_until_ready(d)
  assert_close(d.qpos, mjd.qpos, 'implicit qpos@100', atol=1e-3,
               rtol=1e-3)
