"""Oracle tests for sensors + energy vs MuJoCo C.

Counterpart of reference mujoco_warp/_src/sensor_test.py: run forward(),
compare every sensordata entry against mjd.sensordata by sensor.
"""

import jax
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import models
from mujoco_warp_tpu.ops import forward as fwd
from tests.oracle import assert_close, assert_quat_close


@pytest.fixture(scope='module')
def case():
  mjm, mjd, m, d = models.fixture(
      'sensors.xml', qpos_noise=0.2, qvel_noise=0.4, ctrl_noise=0.3,
      nstep=30)
  run = jax.jit(lambda d: fwd.forward(m, d))
  d = jax.block_until_ready(run(d))
  return mjm, mjd, m, d


def test_sensordata(case):
  mjm, mjd, m, d = case
  ours = np.asarray(d.sensordata, np.float64)
  fails = []
  for s in range(mjm.nsensor):
    adr, dim = mjm.sensor_adr[s], mjm.sensor_dim[s]
    name = mujoco.mj_id2name(mjm, mujoco.mjtObj.mjOBJ_SENSOR, s) or f's{s}'
    stype = mujoco.mjtSensor(mjm.sensor_type[s]).name
    a = ours[adr:adr + dim]
    b = mjd.sensordata[adr:adr + dim]
    if stype in ('mjSENS_BALLQUAT', 'mjSENS_FRAMEQUAT'):
      err = min(np.abs(a - b).max(), np.abs(a + b).max())
    else:
      err = np.abs(a - b).max()
    tol = 5e-4 + 5e-3 * np.abs(b).max()
    if err > tol:
      fails.append(f'{name} ({stype}): err {err:.3e} ours={a} ref={b}')
  assert not fails, '\n'.join(fails)


def test_energy():
  mjm, mjd, m, d = models.fixture(
      'sensors.xml', qpos_noise=0.2, qvel_noise=0.4, nstep=10,
      overrides=('opt.enableflags=2',))  # mjENBL_ENERGY
  run = jax.jit(lambda d: fwd.forward(m, d))
  d = jax.block_until_ready(run(d))
  assert_close(d.energy[0], mjd.energy[0], 'potential', atol=1e-3,
               rtol=1e-3)
  assert_close(d.energy[1], mjd.energy[1], 'kinetic', atol=1e-3, rtol=1e-3)


def test_geomdist_sensors():
  import tempfile
  xml = """
<mujoco>
  <worldbody>
    <body pos="0 0 1"><joint type="slide" axis="1 0 0"/>
      <geom name="g1" type="sphere" size="0.1" contype="0" conaffinity="0"/></body>
    <body pos="0.5 0.05 1.02"><joint type="slide" axis="0 1 0"/>
      <geom name="g2" type="capsule" size="0.06 0.1" euler="30 0 0" contype="0" conaffinity="0"/></body>
  </worldbody>
  <sensor>
    <distance geom1="g1" geom2="g2" cutoff="2"/>
    <normal geom1="g1" geom2="g2" cutoff="2"/>
    <fromto geom1="g1" geom2="g2" cutoff="2"/>
  </sensor>
</mujoco>"""
  with tempfile.NamedTemporaryFile('w', suffix='.xml', delete=False) as f:
    f.write(xml)
    path = f.name
  mjm, mjd, m, d = models.fixture(path, qpos_noise=0.1)
  import os as _os
  _os.unlink(path)
  out = jax.jit(lambda d: fwd.forward(m, d))(d)
  ours = np.asarray(out.sensordata, np.float64)
  ref = mjd.sensordata
  assert abs(ours[0] - ref[0]) < 2e-3, f'dist {ours[0]} vs {ref[0]}'
  assert np.abs(ours[1:4] - ref[1:4]).max() < 5e-2, f'normal {ours[1:4]} vs {ref[1:4]}'
  assert np.abs(ours[4:10] - ref[4:10]).max() < 5e-3, f'fromto {ours[4:10]} vs {ref[4:10]}'


def test_sensors2_camproj_insidesite_tendonactfrc():
  mjm, mjd, m, d = models.fixture(
      'sensors2.xml', qpos_noise=0.1, qvel_noise=0.3, ctrl_noise=0.5,
      nstep=20)
  run = jax.jit(lambda d: fwd.forward(m, d))
  d = jax.block_until_ready(run(d))
  ours = np.asarray(d.sensordata, np.float64)
  fails = []
  for s in range(mjm.nsensor):
    adr, dim = mjm.sensor_adr[s], mjm.sensor_dim[s]
    name = mujoco.mj_id2name(mjm, mujoco.mjtObj.mjOBJ_SENSOR, s) or f's{s}'
    a, b = ours[adr:adr + dim], mjd.sensordata[adr:adr + dim]
    err = np.abs(a - b).max()
    if err > 5e-4 + 5e-3 * np.abs(b).max():
      fails.append(f'{name}: err {err:.3e} ours={a} ref={b}')
  assert not fails, '\n'.join(fails)


@pytest.mark.parametrize('nstep', [5, 40])
def test_contact_sensor(nstep):
  mjm, mjd, m, d = models.fixture('contact_sensor.xml', qvel_noise=0.1,
                                  nstep=nstep)
  run = jax.jit(lambda d: fwd.forward(m, d))
  d = jax.block_until_ready(run(d))
  ours = np.asarray(d.sensordata, np.float64)
  fails = []
  for s in range(mjm.nsensor):
    adr, dim = mjm.sensor_adr[s], mjm.sensor_dim[s]
    name = mujoco.mj_id2name(mjm, mujoco.mjtObj.mjOBJ_SENSOR, s) or f's{s}'
    a, b = ours[adr:adr + dim], mjd.sensordata[adr:adr + dim]
    err = np.abs(a - b).max()
    if err > 1e-3 + 1e-2 * np.abs(b).max():
      fails.append(f'{name}: err {err:.3e}\n  ours={a}\n  ref ={b}')
  assert not fails, '\n'.join(fails)


def test_geomdist_body_operands():
  import tempfile, os as _os
  xml = """
<mujoco>
  <worldbody>
    <body name="b1" pos="0 0 1"><joint type="slide" axis="1 0 0"/>
      <geom name="g1a" type="sphere" size="0.1" contype="0" conaffinity="0"/>
      <geom name="g1b" type="sphere" size="0.05" pos="0.2 0 0" contype="0" conaffinity="0"/></body>
    <body name="b2" pos="0.6 0.05 1.02"><joint type="slide" axis="0 1 0"/>
      <geom name="g2a" type="capsule" size="0.06 0.1" euler="30 0 0" contype="0" conaffinity="0"/>
      <geom name="g2b" type="box" size="0.05 0.05 0.05" pos="0 0.3 0" contype="0" conaffinity="0"/></body>
  </worldbody>
  <sensor>
    <distance body1="b1" body2="b2" cutoff="3"/>
    <distance body1="b1" geom2="g2b" cutoff="3"/>
    <normal body1="b1" body2="b2" cutoff="3"/>
  </sensor>
</mujoco>"""
  with tempfile.NamedTemporaryFile('w', suffix='.xml', delete=False) as f:
    f.write(xml)
    path = f.name
  mjm, mjd, m, d = models.fixture(path, qpos_noise=0.05)
  _os.unlink(path)
  out = jax.jit(lambda d: fwd.forward(m, d))(d)
  ours = np.asarray(out.sensordata, np.float64)
  ref = mjd.sensordata
  assert abs(ours[0] - ref[0]) < 2e-3, f'dist bb {ours[0]} vs {ref[0]}'
  assert abs(ours[1] - ref[1]) < 2e-3, f'dist bg {ours[1]} vs {ref[1]}'
  assert np.abs(ours[2:5] - ref[2:5]).max() < 5e-2, \
      f'normal {ours[2:5]} vs {ref[2:5]}'
