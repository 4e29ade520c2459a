"""Per-step exactness bounds from the error-growth study
(tools/error_growth.py): the f64 engine matches the C oracle at machine
epsilon per step; f32 at its own epsilon.  Long-horizon trajectory
divergence is contact-chaos-bound (e-folding ~10 steps on the humanoid),
so the 1000-step criterion lives in statistics tests (test_unroll.py),
not pointwise trajectory comparison — see the study docstring for the
measured table."""

import contextlib

import jax
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io
from mujoco_warp_tpu.ops import forward as fwd

_HUMANOID = '/root/reference/benchmarks/humanoid/humanoid.xml'


@contextlib.contextmanager
def enable_x64():
  old = jax.config.jax_enable_x64
  jax.config.update('jax_enable_x64', True)
  try:
    yield
  finally:
    jax.config.update('jax_enable_x64', old)


@pytest.fixture(scope='module')
def traj():
  mjm = mujoco.MjModel.from_xml_path(_HUMANOID)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(7)
  mjd.qvel[:] = 0.05 * rng.standard_normal(mjm.nv)
  mujoco.mj_forward(mjm, mjd)
  with enable_x64():
    m64 = io.put_model(mjm, dtype=np.float64)
    d64 = io.put_data(mjm, mjd, m64)
    s64 = jax.jit(lambda dd: fwd.step(m64, dd))
    m32 = io.put_model(mjm, dtype=np.float32)
    d32 = io.put_data(mjm, mjd, m32)
    s32 = jax.jit(lambda dd: fwd.step(m32, dd))
    e64, e32 = {}, {}
    for k in range(1, 201):
      mujoco.mj_step(mjm, mjd)
      d64 = s64(d64)
      d32 = s32(d32)
      if k in (1, 100, 200):
        e64[k] = float(np.abs(np.asarray(d64.qpos) - mjd.qpos).max())
        e32[k] = float(np.abs(np.asarray(d32.qpos) - mjd.qpos).max())
  return e64, e32


def test_f64_is_per_step_exact(traj):
  """f64 engine == C oracle at the machine-epsilon level: the math is
  the same; only chaos separates long trajectories."""
  e64, _ = traj
  assert e64[1] < 1e-12, e64
  assert e64[100] < 1e-10, e64
  assert e64[200] < 1e-5, e64  # chaos onset, still ~20x under f32 there


def test_f32_noise_floor(traj):
  """f32 divergence from the oracle is at the f32-epsilon level before
  chaotic amplification (~1e-7/step, e-folding ~10 steps)."""
  _, e32 = traj
  assert e32[1] < 1e-6, e32
  assert e32[100] < 2e-5, e32
  assert e32[200] < 2e-4, e32


def test_put_data_does_not_alias_host_buffers():
  """Mutating the source MjData after put_data must not change the
  device arrays (f64 CPU zero-copy aliasing regression)."""
  mjm = mujoco.MjModel.from_xml_path(_HUMANOID)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  with enable_x64():
    m = io.put_model(mjm, dtype=np.float64)
    d = io.put_data(mjm, mjd, m)
    before = np.asarray(d.qvel).copy()
    mjd.qvel[:] = 123.0
    mujoco.mj_step(mjm, mjd)
    np.testing.assert_array_equal(np.asarray(d.qvel), before)
