"""Transmission parity vs MuJoCo C: slider-crank, body (adhesion), ref offsets.

Reference coverage model: smooth_test.py transmission cases.
"""

import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io
from mujoco_warp_tpu import models
from mujoco_warp_tpu.ops import forward


def _dense_moment(mjm, mjd):
  mom = np.zeros((mjm.nu, mjm.nv))
  mujoco.mju_sparse2dense(mom, mjd.actuator_moment, mjd.moment_rownnz,
                          mjd.moment_rowadr, mjd.moment_colind)
  return mom


@pytest.mark.parametrize('nstep', [0, 30])
def test_transmission_parity(nstep):
  mjm, mjd, m, d = models.fixture('transmission.xml', qvel_noise=0.05,
                                  nstep=nstep)
  d = forward.fwd_position(m, d)
  np.testing.assert_allclose(np.asarray(d.actuator_length),
                             mjd.actuator_length, atol=5e-4)
  np.testing.assert_allclose(np.asarray(d.actuator_moment),
                             _dense_moment(mjm, mjd), atol=5e-4)


def test_adhesion_force_applied():
  mjm, mjd, m, d = models.fixture('transmission.xml')
  mjd.ctrl[:] = [0.0, 0.0, 1.0]
  mujoco.mj_forward(mjm, mjd)
  d = d.replace(ctrl=d.ctrl.at[:].set(np.asarray(mjd.ctrl)))
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.actuator_force),
                             mjd.actuator_force, atol=5e-3)
  np.testing.assert_allclose(np.asarray(d.qfrc_actuator),
                             mjd.qfrc_actuator, atol=5e-3)
