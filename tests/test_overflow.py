"""Overflow accounting: every OverflowType bit is actually set by the
engine under the condition it names, and clear otherwise (reference:
types.py:149-172 OverflowType + testspeed.py:266-278 flag decode).

Bit semantics here (static-shape TPU analog of the reference's runtime
pools):
  CONTACT    — narrowphase slot compaction saturated (ref NARROWPHASE)
  CONSTRAINT — broadphase pair budget dropped a penetrating pair, so
               constraint rows were never assembled (ref BROADPHASE/NEFC)
  SOLVER     — a world exhausted opt.iterations without meeting any
               tolerance (ref observable: solver_niter buckets)
"""

import jax
import mujoco
import numpy as np

from mujoco_warp_tpu import io, types
from mujoco_warp_tpu.models import fixture
from mujoco_warp_tpu.ops import forward, smooth
from mujoco_warp_tpu.ops import collision_driver

_PILE = """
<mujoco>
  <worldbody>
    <geom type="plane" size="5 5 .1"/>
    {bodies}
  </worldbody>
</mujoco>
"""


def _pile_model(n=6):
  """n free spheres all resting on the plane (n plane contacts)."""
  bodies = '\n'.join(
      f'<body pos="{0.4 * i} 0 0.1"><freejoint/>'
      f'<geom type="sphere" size="0.12"/></body>' for i in range(n))
  return mujoco.MjModel.from_xml_string(_PILE.format(bodies=bodies))


def _settled(mjm, nstep=50):
  mjd = mujoco.MjData(mjm)
  for _ in range(nstep):
    mujoco.mj_step(mjm, mjd)
  return mjd


def test_contact_bit_on_slot_saturation():
  mjm = _pile_model(6)
  mjd = _settled(mjm)
  # budget of 2 condim-3 slots vs 6 resting plane contacts -> saturate
  m = io.put_model(mjm, nconmax={3: 2})
  d = io.put_data(mjm, mjd, m)
  d = jax.jit(lambda d: forward.forward(m, d))(d)
  assert int(d.overflow) & int(types.OverflowType.CONTACT)
  # generous budget -> clean
  m2 = io.put_model(mjm, nconmax={3: 16})
  d2 = io.put_data(mjm, mjd, m2)
  d2 = jax.jit(lambda d: forward.forward(m2, d))(d2)
  assert not (int(d2.overflow) & int(types.OverflowType.CONTACT))


def test_constraint_bit_on_broadphase_drop():
  mjm = _pile_model(6)
  mjd = _settled(mjm)
  # per-group pair budget of 2 vs 6 penetrating plane-sphere pairs:
  # the prefilter must drop penetrating pairs -> CONSTRAINT bit
  m = io.put_model(mjm, nconmax={3: 16}, bp_cap=2)
  assert any(bc for bc, _ in m.bp_groups)
  d = io.put_data(mjm, mjd, m)
  d = jax.jit(lambda d: collision_driver.collision(
      m, smooth.kinematics(m, d)))(d)
  assert int(d.overflow) & int(types.OverflowType.CONSTRAINT)
  # budget >= pairs -> clean
  m2 = io.put_model(mjm, nconmax={3: 16}, bp_cap=8)
  d2 = io.put_data(mjm, mjd, m2)
  d2 = jax.jit(lambda d: collision_driver.collision(
      m2, smooth.kinematics(m2, d)))(d2)
  assert not (int(d2.overflow) & int(types.OverflowType.CONSTRAINT))


def test_solver_bit_on_iteration_cap():
  mjm, mjd, m, d = fixture('spheres.xml', qvel_noise=0.2, nstep=3)
  # one Newton iteration cannot reach tolerance on a contact-rich state
  m1 = io.override_model(m, ['opt.iterations=1'])
  d1 = jax.jit(lambda d: forward.forward(m1, d))(d)
  assert int(d1.solver_niter) == 1
  assert int(d1.overflow) & int(types.OverflowType.SOLVER)
  # full budget converges -> no bit
  d2 = jax.jit(lambda d: forward.forward(m, d))(d)
  assert int(d2.solver_niter) < m.opt.iterations
  assert not (int(d2.overflow) & int(types.OverflowType.SOLVER))


def test_warn_overflow_custom_numeric():
  xml = _PILE.format(
      bodies='<body pos="0 0 0.1"><freejoint/>'
             '<geom type="sphere" size="0.12"/></body>')
  xml = xml.replace(
      '<worldbody>',
      '<custom><numeric name="warn_overflow" data="0"/>'
      '<numeric name="nconmax" data="4"/></custom><worldbody>')
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  assert m.opt.warn_overflow is False


def test_overflow_report_decode():
  from mujoco_warp_tpu import testspeed
  mjm = _pile_model(6)
  mjd = _settled(mjm)
  m = io.put_model(mjm, nconmax={3: 2})
  d = io.put_data(mjm, mjd, m, nworld=4)
  d = jax.jit(jax.vmap(lambda dd: forward.forward(m, dd)))(d)
  report = testspeed.overflow_report(m, d)
  assert report.get('CONTACT') == 4
