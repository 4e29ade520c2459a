"""Inverse dynamics: applied force from a desired acceleration.

TPU-native counterpart of reference mujoco_warp/_src/inverse.py
(`inverse`:148): position/velocity stages, constraint forces evaluated at
the given qacc (no solve needed — the dual update is closed-form given
qacc), then RNE:  qfrc_inverse = M·qacc + qfrc_bias − qfrc_passive −
qfrc_constraint.

With EnableBit.INVDISCRETE the given qacc is interpreted as a discrete
next-step velocity difference and converted to continuous acceleration
first (reference: inverse.py:79 `discrete_acc`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import types
from mujoco_warp_tpu.ops import forward as fwd
from mujoco_warp_tpu.ops import solver as jsolver
from mujoco_warp_tpu.ops import smooth


def _discrete_acc(m: types.Model, d: types.Data) -> jax.Array:
  """Convert discrete-time qacc to continuous (reference: inverse.py:79)."""
  dtype = d.qpos.dtype
  dt = m.opt.timestep.astype(dtype)
  integ = m.opt.integrator
  if integ == types.IntegratorType.RK4:
    raise NotImplementedError('INVDISCRETE not supported for RK4')
  if integ == types.IntegratorType.EULER:
    dsbl = m.opt.disableflags
    damped = not (dsbl & (types.DisableBit.EULERDAMP |
                          types.DisableBit.DAMPER))
    if damped and types.concrete_or(
        m.dof_damping, lambda a: bool(np.any(a > 0)), True):
      # qacc_continuous = M^-1 (M + dt·diag(damping)) qacc_discrete
      rhs = smooth.mul_m(m, d, d.qacc) + dt * m.dof_damping * d.qacc
      return smooth.solve_m(m, d, rhs)
    return d.qacc
  # implicit(fast): qacc_cont = M^-1 (M - dt·qDeriv) qacc_disc
  from mujoco_warp_tpu.ops import derivative
  qderiv = derivative.deriv_smooth_vel(m, d)
  rhs = (d.qM - dt * qderiv) @ d.qacc
  return smooth.solve_m(m, d, rhs)


def inverse(m: types.Model, d: types.Data) -> types.Data:
  """Inverse dynamics: fills d.qfrc_inverse (reference: inverse.py:148)."""
  d = fwd.fwd_position(m, d)
  d = fwd.fwd_velocity(m, d)

  qacc = d.qacc
  if m.opt.enableflags & types.EnableBit.INVDISCRETE:
    qacc = _discrete_acc(m, d.replace(qacc=qacc))

  # constraint forces at the given qacc (reference: inv_constraint:129)
  if m.nefc:
    st = jsolver._static_tables(m)
    dtype = d.qpos.dtype
    mu_scale = 1.0 / jnp.sqrt(jnp.maximum(m.opt.impratio.astype(dtype),
                                          1e-15))
    Jaref = jsolver._j_mul(m, d, qacc) - d.efc_aref
    force, _, _ = jsolver._update_constraint(m, d, st, Jaref, mu_scale)
    qfrc_constraint = jsolver._jt_mul(m, d, force)
    d = d.replace(efc_force=force, qfrc_constraint=qfrc_constraint)
  else:
    qfrc_constraint = jnp.zeros_like(d.qvel)
    d = d.replace(qfrc_constraint=qfrc_constraint)

  qfrc_inverse = (smooth.mul_m(m, d, qacc) + d.qfrc_bias - d.qfrc_passive -
                  qfrc_constraint)
  return d.replace(qfrc_inverse=qfrc_inverse)
