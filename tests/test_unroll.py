"""Long-horizon trajectory regression (reference: unroll_test.py:37-57).

The 100-step window asserts tight oracle parity (1e-4, the BASELINE.md
north star); 1000-step contact-rich rollouts are chaotic in f32 vs the
f64 oracle, so, like the reference's unroll test, the long window asserts
the coarse physical outcome instead of bitwise state.
"""

import jax
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import benchmarks, io
from mujoco_warp_tpu.models import fixture
from mujoco_warp_tpu.ops import forward as fwd


def test_humanoid_100_step_oracle():
  mjm = benchmarks.load_humanoid_benchmark()
  m = io.put_model(mjm, nconmax=24)
  d = io.make_data(m)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_resetData(mjm, mjd)
  step = jax.jit(lambda dd: fwd.step(m, dd))
  for _ in range(100):
    d = step(d)
    mujoco.mj_step(mjm, mjd)
  err = np.max(np.abs(np.asarray(d.qpos) - mjd.qpos))
  assert err < 1e-4, f'100-step humanoid qpos err {err:.2e}'


def test_humanoid_1000_step_outcome():
  mjm = benchmarks.load_humanoid_benchmark()
  m = io.put_model(mjm, nconmax=24)
  d = io.make_data(m)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_resetData(mjm, mjd)
  step = jax.jit(lambda dd: fwd.step(m, dd))
  for _ in range(1000):
    d = step(d)
    mujoco.mj_step(mjm, mjd)
  qpos = np.asarray(d.qpos)
  assert np.all(np.isfinite(qpos))
  # same coarse outcome: the character's root settles at the same height
  assert abs(qpos[2] - mjd.qpos[2]) < 5e-2, (qpos[2], mjd.qpos[2])
  # and no runaway velocities
  assert np.abs(np.asarray(d.qvel)).max() < 10.0


@pytest.mark.parametrize('fname,tol', [('constraints.xml', 1e-4),
                                       ('pendula.xml', 5e-3)])
def test_1000_step_trajectories(fname, tol):
  mjm, mjd, m, d = fixture(fname, qvel_noise=0.1)
  step = jax.jit(lambda dd: fwd.step(m, dd))
  for _ in range(1000):
    d = step(d)
    mujoco.mj_step(mjm, mjd)
  err = np.max(np.abs(np.asarray(d.qpos) - mjd.qpos))
  assert err < tol, f'{fname} 1000-step qpos err {err:.2e}'
