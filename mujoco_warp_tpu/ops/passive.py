"""Passive forces: springs, dampers, gravity compensation, fluid forces.

TPU-native counterpart of reference mujoco_warp/_src/passive.py (`passive`
at passive.py:1182).  The reference launches per-joint/per-dof/per-body
scalar kernels; here every term is a vectorized jnp expression over the
whole model so XLA fuses the lot into a handful of elementwise kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import types
from mujoco_warp_tpu.ops import math

_JT = types.JointType


def _spring(m: types.Model, d: types.Data) -> jax.Array:
  """Joint spring torques: -k (qpos - qpos_spring) per joint type.

  Reference: passive.py joint-spring kernel (vectorized here: one static
  pass per joint type present in the model).
  """
  dtype = d.qpos.dtype
  qfrc = jnp.zeros((m.nv,), dtype)
  jtypes = m.jnt_type
  for jt in np.unique(jtypes):
    jids = np.nonzero(jtypes == jt)[0]
    k = m.jnt_stiffness[jids]
    qadr = m.jnt_qposadr[jids]
    dadr = m.jnt_dofadr[jids]
    if jt == _JT.FREE:
      # translational spring
      dif = d.qpos[qadr[:, None] + np.arange(3)] - \
          m.qpos_spring[qadr[:, None] + np.arange(3)]
      qfrc = qfrc.at[dadr[:, None] + np.arange(3)].add(-k[:, None] * dif)
      # rotational spring: quaternion difference
      q = d.qpos[qadr[:, None] + np.arange(3, 7)]
      qs = m.qpos_spring[qadr[:, None] + np.arange(3, 7)]
      rotdif = math.quat_sub(math.normalize_quat(q), math.normalize_quat(qs))
      qfrc = qfrc.at[dadr[:, None] + np.arange(3, 6)].add(
          -k[:, None] * rotdif)
    elif jt == _JT.BALL:
      q = d.qpos[qadr[:, None] + np.arange(4)]
      qs = m.qpos_spring[qadr[:, None] + np.arange(4)]
      rotdif = math.quat_sub(math.normalize_quat(q), math.normalize_quat(qs))
      qfrc = qfrc.at[dadr[:, None] + np.arange(3)].add(-k[:, None] * rotdif)
    else:  # SLIDE / HINGE
      dif = d.qpos[qadr] - m.qpos_spring[qadr]
      qfrc = qfrc.at[dadr].add(-k * dif)
  return qfrc


def _fluid(m: types.Model, d: types.Data) -> jax.Array:
  """Inertia-box fluid model: per-body viscous drag + buoyancy-free lift.

  Reference: passive.py:45-104 (mj_inertiaBoxFluidModel).  Applied when
  density or viscosity is nonzero.  Per-body wrench in the com-rooted frame,
  projected via the dof-subtree mask (a matmul).
  """
  dtype = d.qpos.dtype
  rho = m.opt.density
  beta = m.opt.viscosity
  wind = m.opt.wind

  # equivalent inertia box per body (from diagonal inertia + mass)
  mass = m.body_mass
  inert = m.body_inertia  # (nbody, 3) principal
  s = jnp.maximum(mass, 1e-12)
  box = jnp.sqrt(jnp.maximum(
      jnp.stack([
          inert[:, 1] + inert[:, 2] - inert[:, 0],
          inert[:, 0] + inert[:, 2] - inert[:, 1],
          inert[:, 0] + inert[:, 1] - inert[:, 2],
      ], axis=-1) / (2.0 * s[:, None]) * 6.0, 1e-12))  # full box side

  # body spatial velocity at body CoM, rotated to inertial (ximat) frame
  # cvel is about the subtree root's CoM; translate to body CoM
  offset = d.xipos - d.subtree_com[m.body_rootid]
  ang_w = d.cvel[:, :3]
  lin_w = d.cvel[:, 3:] - jnp.cross(offset, ang_w)
  lin_w = lin_w - wind[None, :].astype(dtype)
  # rotate into the body-inertia frame
  rot = jnp.swapaxes(d.ximat, -1, -2)  # world->local
  ang = jnp.einsum('bij,bj->bi', rot, ang_w)
  lin = jnp.einsum('bij,bj->bi', rot, lin_w)

  bx, by, bz = box[:, 0], box[:, 1], box[:, 2]
  # viscous resistance (mjc: force -= 3*beta*pi*diam*v; torque -= pi*beta*d^3*w)
  diam = (bx + by + bz) / 3.0
  frc_v = -3.0 * jnp.pi * beta * diam[:, None] * lin
  trq_v = -jnp.pi * beta * (diam ** 3)[:, None] * ang

  # quadratic drag (density): force_i = -0.5*rho*A_i*|v_i|*v_i with A the
  # face area orthogonal to axis i; torque analog per mj_passive
  area = jnp.stack([by * bz, bx * bz, bx * by], axis=-1)
  frc_d = -0.5 * rho * area * jnp.abs(lin) * lin
  mom = jnp.stack([
      bx * (by ** 4 + bz ** 4),
      by * (bx ** 4 + bz ** 4),
      bz * (bx ** 4 + by ** 4),
  ], axis=-1)
  trq_d = -rho * mom / 64.0 * jnp.abs(ang) * ang

  frc = frc_v + frc_d
  trq = trq_v + trq_d
  # rotate back to world
  frc_w = jnp.einsum('bij,bj->bi', d.ximat, frc)
  trq_w = jnp.einsum('bij,bj->bi', d.ximat, trq)

  # project: wrench at body CoM (world frame) -> generalized forces
  # torque about root CoM frame: t' = t + (xipos - root_com) x f
  cfrc = jnp.concatenate([trq_w + jnp.cross(offset, frc_w), frc_w], axis=-1)
  ds = jnp.asarray(m.tree.dof_subtree_mask, dtype)
  return jnp.sum((ds @ cfrc) * d.cdof, axis=-1)


def gravcomp(m: types.Model, d: types.Data) -> jax.Array:
  """Gravity-compensation forces (reference: passive.py gravcomp kernel).

  Per body with gravcomp > 0: anti-gravity force m*g*gravcomp at the body
  CoM, projected to generalized coordinates.
  """
  dtype = d.qpos.dtype
  gc = m.body_gravcomp * m.body_mass  # (nbody,)
  frc_w = -gc[:, None] * m.opt.gravity[None, :].astype(dtype)  # (nbody, 3)
  offset = d.xipos - d.subtree_com[m.body_rootid]
  cfrc = jnp.concatenate([jnp.cross(offset, frc_w), frc_w], axis=-1)
  ds = jnp.asarray(m.tree.dof_subtree_mask, dtype)
  return jnp.sum((ds @ cfrc) * d.cdof, axis=-1)


def passive(m: types.Model, d: types.Data) -> types.Data:
  """All passive forces (reference: passive.py:1182 `passive`)."""
  dtype = d.qpos.dtype
  dsbl = m.opt.disableflags

  if dsbl & types.DisableBit.SPRING:
    qfrc_spring = jnp.zeros((m.nv,), dtype)
  else:
    qfrc_spring = _spring(m, d)
    if m.ntendon:
      # tendon springs: -k (len - springlength) with deadband [lo, hi]
      k = m.tendon_stiffness
      lo = m.tendon_lengthspring[:, 0]
      hi = m.tendon_lengthspring[:, 1]
      dif = jnp.where(d.ten_length > hi, d.ten_length - hi,
                      jnp.where(d.ten_length < lo, d.ten_length - lo, 0.0))
      frc = -k * dif
      qfrc_spring = qfrc_spring + d.ten_J.T @ frc

  if dsbl & types.DisableBit.DAMPER:
    qfrc_damper = jnp.zeros((m.nv,), dtype)
  else:
    qfrc_damper = -m.dof_damping * d.qvel
    if m.ntendon:
      qfrc_damper = qfrc_damper + d.ten_J.T @ (
          -m.tendon_damping * d.ten_velocity)

  no_gravity = bool(dsbl & types.DisableBit.GRAVITY)
  has_gravcomp = types.concrete_or(
      m.body_gravcomp, lambda a: bool(np.any(a > 0)), True)
  if no_gravity or not has_gravcomp:
    qfrc_gravcomp = jnp.zeros((m.nv,), dtype)
  else:
    qfrc_gravcomp = gravcomp(m, d)

  # fluid forces only when density/viscosity/wind are set (static check)
  dens = types.concrete_or(m.opt.density, float, 1.0)
  visc = types.concrete_or(m.opt.viscosity, float, 1.0)
  if dens or visc:
    qfrc_fluid = _fluid(m, d)
  else:
    qfrc_fluid = jnp.zeros((m.nv,), dtype)

  # gravcomp applied via actuators (jnt_actgravcomp) is excluded from passive
  # (reference: forward.py fwd_actuation gravcomp path); mask those dofs.
  if has_gravcomp and np.any(m.jnt_actgravcomp):
    act_dofs = np.zeros(m.nv, bool)
    for j in np.nonzero(m.jnt_actgravcomp)[0]:
      w = _JT(int(m.jnt_type[j])).dof_width
      act_dofs[int(m.jnt_dofadr[j]):int(m.jnt_dofadr[j]) + w] = True
    keep = jnp.asarray(~act_dofs, dtype)
    qfrc_passive = qfrc_spring + qfrc_damper + qfrc_fluid + \
        qfrc_gravcomp * keep
  else:
    qfrc_passive = qfrc_spring + qfrc_damper + qfrc_fluid + qfrc_gravcomp

  return d.replace(
      qfrc_spring=qfrc_spring,
      qfrc_damper=qfrc_damper,
      qfrc_gravcomp=qfrc_gravcomp,
      qfrc_fluid=qfrc_fluid,
      qfrc_passive=qfrc_passive,
  )
