"""Trajectory replay (reference: io.py:3883 load_trajectory)."""

import numpy as np
import mujoco
import pytest

from mujoco_warp_tpu import io
from mujoco_warp_tpu.models import load_mjm


def test_load_trajectory_zoh(tmp_path):
  mjm = load_mjm('constraints.xml')
  mjd = mujoco.MjData(mjm)
  nstep = 10
  rng = np.random.default_rng(0)
  ctrl = rng.standard_normal((nstep, mjm.nu))
  times = np.arange(nstep) * mjm.opt.timestep * 3  # decimation 3
  qpos0 = mjd.qpos.copy() + 0.01
  path = str(tmp_path / 'traj.npz')
  np.savez(path, ctrl=ctrl, times=times, qpos=qpos0[None],
           qvel=np.zeros((1, mjm.nv)))
  out = io.load_trajectory(path, mjm, mjd)
  assert out.shape == (nstep * 3, mjm.nu)
  np.testing.assert_array_equal(out[0], out[2])  # zero-order hold
  np.testing.assert_array_equal(out[0], ctrl[0])
  np.testing.assert_array_equal(out[3], ctrl[1])
  np.testing.assert_allclose(mjd.qpos, qpos0)  # initial state applied


def test_load_trajectory_shape_check(tmp_path):
  mjm = load_mjm('constraints.xml')
  mjd = mujoco.MjData(mjm)
  path = str(tmp_path / 'bad.npz')
  np.savez(path, ctrl=np.zeros((5, mjm.nu + 1)), times=np.arange(5.0))
  with pytest.raises(ValueError):
    io.load_trajectory(path, mjm, mjd)
