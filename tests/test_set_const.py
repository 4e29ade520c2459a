"""io.set_const vs MuJoCo's mj_setConst (the C oracle).

Scale masses / shift qpos0 on the host model, let mj_setConst recompute
the derived constants there, and check the device-side set_const
reproduces them from the same edited fields.
(reference: io.py:3645 set_const)
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mujoco_warp_tpu import io
from mujoco_warp_tpu.models import load_mjm


def _compare(mjm_edit, m_edit, tendons=False, actuators=False):
  mujoco.mj_setConst(mjm_edit, mujoco.MjData(mjm_edit))
  m_new = jax.jit(io.set_const)(m_edit)

  np.testing.assert_allclose(np.asarray(m_new.body_subtreemass),
                             mjm_edit.body_subtreemass, rtol=1e-5)
  np.testing.assert_allclose(np.asarray(m_new.dof_invweight0),
                             mjm_edit.dof_invweight0, rtol=2e-4)
  np.testing.assert_allclose(np.asarray(m_new.body_invweight0),
                             mjm_edit.body_invweight0, rtol=2e-4,
                             atol=1e-7)
  if tendons:
    np.testing.assert_allclose(np.asarray(m_new.tendon_length0),
                               mjm_edit.tendon_length0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_new.tendon_invweight0),
                               mjm_edit.tendon_invweight0, rtol=2e-4)
  if actuators:
    np.testing.assert_allclose(np.asarray(m_new.actuator_acc0),
                               mjm_edit.actuator_acc0, rtol=2e-4)
  return m_new


def test_set_const_mass_scaling():
  mjm = load_mjm('pendula.xml')
  mjm.body_mass[:] *= 1.7
  mjm.body_inertia[:] *= 1.7
  m = io.put_model(mjm)  # put_model copies the edited host fields
  # un-derive: put_model trusts mjm's derived fields, so re-derive from
  # a deliberately stale copy to prove set_const recomputes them
  stale = io.put_model(load_mjm('pendula.xml'))
  m_stale = stale.replace(body_mass=m.body_mass,
                          body_inertia=m.body_inertia)
  _compare(mjm, m_stale, actuators=mjm.nu > 0)


def test_set_const_qpos0_shift():
  mjm = load_mjm('pendula.xml')
  mjm.qpos0[:] += 0.05
  stale = io.put_model(load_mjm('pendula.xml'))
  m_stale = stale.replace(qpos0=jnp.asarray(mjm.qpos0.astype(np.float32)))
  _compare(mjm, m_stale, actuators=mjm.nu > 0)


def test_set_const_tendons():
  mjm = load_mjm('transmission.xml')
  if mjm.ntendon == 0:
    import pytest
    pytest.skip('no tendons in scene')
  mjm.body_mass[:] *= 1.3
  mjm.body_inertia[:] *= 1.3
  stale = io.put_model(load_mjm('transmission.xml'))
  m_stale = stale.replace(
      body_mass=jnp.asarray(mjm.body_mass.astype(np.float32)),
      body_inertia=jnp.asarray(mjm.body_inertia.astype(np.float32)))
  _compare(mjm, m_stale, tendons=True, actuators=mjm.nu > 0)


def test_set_const_connect_anchor():
  mjm = load_mjm('constraints.xml')
  has_conn = np.any(
      (mjm.eq_type == mujoco.mjtEq.mjEQ_CONNECT) &
      (mjm.eq_objtype == mujoco.mjtObj.mjOBJ_BODY))
  if not has_conn:
    import pytest
    pytest.skip('no body connect equality in scene')
  m = io.put_model(mjm)
  m_new = jax.jit(io.set_const)(m)
  # anchors recomputed at qpos0 must satisfy the constraint: residual 0
  eq = np.asarray(m.eq_type)
  for e in np.nonzero((eq == int(mujoco.mjtEq.mjEQ_CONNECT)) &
                      (np.asarray(m.eq_objtype)
                       == int(mujoco.mjtObj.mjOBJ_BODY)))[0]:
    mjd = mujoco.MjData(mjm)
    mujoco.mj_forward(mjm, mjd)
    o1, o2 = int(mjm.eq_obj1id[e]), int(mjm.eq_obj2id[e])
    dat = np.asarray(m_new.eq_data[e])
    p1 = mjd.xpos[o1] + mjd.xmat[o1].reshape(3, 3) @ dat[0:3]
    p2 = mjd.xpos[o2] + mjd.xmat[o2].reshape(3, 3) @ dat[3:6]
    np.testing.assert_allclose(p1, p2, atol=1e-5)
