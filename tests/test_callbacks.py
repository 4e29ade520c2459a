"""User callback hooks (reference: types.py:956 Callback; invocation
sites forward.py:1358, passive.py:1413, sensor.py:959/1505/2761,
collision_driver.py:941).

Functional divergence (documented in types.Callback): hooks return the
updated Data instead of mutating in place, and run inside jit.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import io, types
from mujoco_warp_tpu.models import fixture
from mujoco_warp_tpu.ops import forward


def _put(mjm, cb):
  return io.put_model(mjm, callback=cb)


def test_control_callback():
  """A control hook is equivalent to setting ctrl by hand pre-step."""
  mjm, mjd, m0, d0 = fixture('pendula.xml', qvel_noise=0.1, nstep=3)

  def control(m, d):
    return d.replace(ctrl=jnp.sin(d.time) * jnp.ones_like(d.ctrl))

  m_cb = _put(mjm, types.Callback(control=control))
  d_cb = io.put_data(mjm, mjd, m_cb)
  out_cb = jax.jit(lambda d: forward.step(m_cb, d))(d_cb)

  d_manual = d0.replace(ctrl=jnp.sin(d0.time) * jnp.ones_like(d0.ctrl))
  out_manual = jax.jit(lambda d: forward.step(m0, d))(d_manual)
  np.testing.assert_allclose(np.asarray(out_cb.qpos),
                             np.asarray(out_manual.qpos), atol=1e-7)


def test_passive_callback():
  """The passive hook's extra force lands in qfrc_passive exactly."""
  mjm, mjd, m0, d0 = fixture('pendula.xml', qvel_noise=0.2, nstep=3)

  def passive(m, d):
    return d.replace(qfrc_passive=d.qfrc_passive - 0.5 * d.qvel)

  m_cb = _put(mjm, types.Callback(passive=passive))
  d_cb = io.put_data(mjm, mjd, m_cb)
  out_cb = jax.jit(lambda d: forward.forward(m_cb, d))(d_cb)
  out0 = jax.jit(lambda d: forward.forward(m0, d))(d0)
  np.testing.assert_allclose(
      np.asarray(out_cb.qfrc_passive),
      np.asarray(out0.qfrc_passive) - 0.5 * np.asarray(d0.qvel),
      atol=1e-7)


def test_act_gain_callback():
  """act_gain doubling actuator_force doubles qfrc_actuator."""
  mjm, mjd, m0, d0 = fixture('pendula.xml', ctrl_noise=0.5, nstep=2)

  def act_gain(m, d):
    return d.replace(actuator_force=2.0 * d.actuator_force)

  m_cb = _put(mjm, types.Callback(act_gain=act_gain))
  d_cb = io.put_data(mjm, mjd, m_cb)
  out_cb = jax.jit(lambda d: forward.forward(m_cb, d))(d_cb)
  out0 = jax.jit(lambda d: forward.forward(m0, d))(d0)
  np.testing.assert_allclose(np.asarray(out_cb.qfrc_actuator),
                             2.0 * np.asarray(out0.qfrc_actuator),
                             atol=1e-6)


def test_sensor_callback():
  """The sensor hook sees each stage and can write sensordata."""
  mjm, mjd, _, _ = fixture('sensors.xml', qvel_noise=0.05, nstep=2)
  stages_seen = []

  def sensor_cb(m, d, stage):
    stages_seen.append(int(stage))
    if stage == types.Stage.ACC:
      return d.replace(sensordata=d.sensordata.at[0].set(42.0))
    return d

  m_cb = _put(mjm, types.Callback(sensor=sensor_cb))
  d_cb = io.put_data(mjm, mjd, m_cb)
  out = jax.jit(lambda d: forward.forward(m_cb, d))(d_cb)
  assert float(out.sensordata[0]) == 42.0
  assert set(stages_seen) == {int(types.Stage.POS), int(types.Stage.VEL),
                              int(types.Stage.ACC)}


def test_contactfilter_callback():
  """Killing every contact via the filter matches contact-disabled qacc."""
  mjm, mjd, _, _ = fixture('spheres.xml', qvel_noise=0.1, nstep=5)

  def contactfilter(m, d):
    c = d.contact
    return d.replace(
        contact=c.replace(dist=jnp.full_like(c.dist, 1e10),
                          includemargin=jnp.zeros_like(c.includemargin)),
        ncon_active=jnp.zeros_like(d.ncon_active))

  m_cb = _put(mjm, types.Callback(contactfilter=contactfilter))
  d_cb = io.put_data(mjm, mjd, m_cb)
  out_cb = jax.jit(lambda d: forward.forward(m_cb, d))(d_cb)

  mjm.opt.disableflags |= int(types.DisableBit.CONTACT)
  m_nc = io.put_model(mjm)
  d_nc = io.put_data(mjm, mjd, m_nc)
  out_nc = jax.jit(lambda d: forward.forward(m_nc, d))(d_nc)
  np.testing.assert_allclose(np.asarray(out_cb.qacc),
                             np.asarray(out_nc.qacc), atol=5e-5)
