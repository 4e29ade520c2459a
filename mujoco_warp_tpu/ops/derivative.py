"""Analytic velocity derivatives for implicit integration.

TPU-native counterpart of reference mujoco_warp/_src/derivative.py
(`deriv_smooth_vel`:1117) and the implicit integrators
(forward.py:579 `implicit`).  IMPLICITFAST factor-solves
(M − dt·∂qfrc_smooth/∂qvel) in dense form — a batched Cholesky on the MXU
instead of the reference's per-tree sparse paths.

∂qfrc_smooth/∂qvel terms (reference: derivative.py deriv_smooth_vel):
  * joint damping: −diag(dof_damping)
  * tendon damping: −ten_Jᵀ diag(tendon_damping) ten_J
  * actuator velocity gains: momentᵀ diag(∂force/∂vel) moment with
    ∂force/∂vel = gainprm[2]·input + biasprm[2] for affine gain/bias
    (muscle FLV velocity derivative lands with the myo phase)

The full IMPLICIT integrator additionally needs the RNE velocity
derivative (reference: deriv_rne_vel:514, D-structure sparse LU); until
that lands it falls back to the implicitfast derivative set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import types

_MINVAL = 1e-15


def deriv_smooth_vel(m: types.Model, d: types.Data) -> jax.Array:
  """qDeriv = ∂qfrc_smooth/∂qvel, dense (nv, nv)."""
  dtype = d.qpos.dtype
  qderiv = -jnp.diag(m.dof_damping)

  if m.ntendon:
    qderiv = qderiv - d.ten_J.T @ (m.tendon_damping[:, None] * d.ten_J)

  if m.nu:
    gt = m.actuator_trntype  # unused; kept for parity clarity
    gain_v = jnp.where(jnp.asarray(m.actuator_gaintype == types.GainType.AFFINE),
                       m.actuator_gainprm[:, 2], 0.0)
    bias_v = jnp.where(jnp.asarray(m.actuator_biastype == types.BiasType.AFFINE),
                       m.actuator_biasprm[:, 2], 0.0)
    # input: ctrl or act (same as fwd_actuation); approximate with the
    # current actuator_force decomposition: dforce/dvel
    has_act = m.actuator_actadr >= 0
    act_last = np.where(has_act, m.actuator_actadr + m.actuator_actnum - 1,
                        0)
    if m.na:
      input_u = jnp.where(jnp.asarray(has_act), d.act[act_last], d.ctrl)
    else:
      input_u = d.ctrl
    if not (m.opt.disableflags & types.DisableBit.CLAMPCTRL):
      lim = jnp.asarray(m.actuator_ctrllimited.astype(bool))
      input_u = jnp.where(
          lim & ~jnp.asarray(has_act),
          jnp.clip(input_u, m.actuator_ctrlrange[:, 0],
                   m.actuator_ctrlrange[:, 1]), input_u)
    dfdv = gain_v * input_u + bias_v  # (nu,)
    qderiv = qderiv + d.actuator_moment.T @ (
        dfdv[:, None] * d.actuator_moment)

  return qderiv.astype(dtype)


def deriv_rne_vel(m: types.Model, d: types.Data) -> jax.Array:
  """−∂qfrc_bias/∂qvel for the full IMPLICIT integrator.

  The reference hand-derives this in 1.3k lines of D-structure sparse
  kernels (derivative.py:514 `deriv_rne_vel`); here the whole RNE pipeline
  is differentiable jnp, so the exact Jacobian is one `jax.jacfwd` through
  com_vel→rne — XLA fuses the nv forward tangent passes into batched
  matmuls, which is the TPU-native formulation of the same math.
  """
  from mujoco_warp_tpu.ops import smooth

  def bias_of_qvel(qvel):
    dd = d.replace(qvel=qvel)
    dd = smooth.com_vel(m, dd)
    dd = smooth.rne(m, dd)
    return dd.qfrc_bias

  return -jax.jacfwd(bias_of_qvel)(d.qvel)


def implicit(m: types.Model, d: types.Data) -> types.Data:
  """Implicit-in-velocity integration (reference: forward.py:579).

  Solves (M − dt·qDeriv) qacc' = M qacc, then advances (the qacc from the
  constraint solver satisfies M qacc = qfrc_smooth + qfrc_constraint).
  IMPLICITFAST uses the smooth-force derivative only; IMPLICIT adds the
  exact RNE (Coriolis) velocity derivative.
  """
  from mujoco_warp_tpu.ops import forward as fwd

  dtype = d.qpos.dtype
  dt = m.opt.timestep.astype(dtype)
  qderiv = deriv_smooth_vel(m, d)
  if m.opt.integrator == types.IntegratorType.IMPLICIT:
    qderiv = qderiv + deriv_rne_vel(m, d)
  A = d.qM - dt * qderiv
  rhs = d.qM @ d.qacc
  qacc = jnp.linalg.solve(A, rhs)
  return fwd._advance(m, d, qacc)
