"""Oracle tests for the history (delay) subsystem vs MuJoCo C."""

import jax
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import models
from mujoco_warp_tpu.ops import forward as fwd
from tests.oracle import assert_close

XML = """
<mujoco>
  <option timestep="0.01"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j" type="hinge" axis="0 1 0" damping="0.5"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.4 0 0" contype="0" conaffinity="0"/>
      <site name="s" pos="0.4 0 0"/>
    </body>
  </worldbody>
  <actuator>
    <motor joint="j" gear="1.0" delay="0.05" nsample="8"/>
  </actuator>
  <sensor>
    <jointpos joint="j" delay="0.03" nsample="8"/>
  </sensor>
</mujoco>"""


def test_ctrl_and_sensor_delay():
  import tempfile, os
  with tempfile.NamedTemporaryFile('w', suffix='.xml', delete=False) as f:
    f.write(XML)
    path = f.name
  mjm, mjd, m, d = models.fixture(path)
  os.unlink(path)
  assert m.nhistory > 0
  step = jax.jit(lambda d: fwd.step(m, d))
  rng = np.random.default_rng(0)
  for k in range(30):
    ctrl = np.sin(0.7 * k) * 0.8
    mjd.ctrl[:] = ctrl
    d = d.replace(ctrl=d.ctrl.at[0].set(ctrl))
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  d = jax.block_until_ready(d)
  assert_close(d.qpos, mjd.qpos, 'delayed qpos@30', atol=2e-3, rtol=2e-3)
  assert_close(d.sensordata, mjd.sensordata, 'delayed sensordata',
               atol=2e-3, rtol=2e-3)
