"""Constraint (EFC) assembly into a static-shape dense system.

TPU-native counterpart of reference mujoco_warp/_src/constraint.py
(`make_constraint`:4870).  Key divergence: the reference counts rows at
runtime with atomics into fixed-capacity buffers; here the row layout is
fully static (io.py `_efc_layout`) — every potential row exists every step
and inactive rows are zero-masked, which is the natural fixed-shape XLA
formulation.  Impedance/stiffness (KBI) semantics follow the reference's
`_efc_row` (constraint.py:83-152) exactly.

The Jacobian is dense ``(nefc, nv)`` so that solver products (J·v, JᵀDJ)
are MXU matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import types
from mujoco_warp_tpu.ops import math

_JT = types.JointType
_CT = types.ConstraintType

MJ_MINVAL = 1e-15
MJ_MINIMP = 0.0001
MJ_MAXIMP = 0.9999


def _kbi(m: types.Model, solref, solimp, pos_imp, dtype):
  """Stiffness k, damping b, impedance imp per row (reference: 111-142).

  All args broadcast; ``pos_imp`` is the scalar distance used for the
  impedance profile.
  """
  timeconst = solref[..., 0]
  dampratio = solref[..., 1]
  dmin = jnp.clip(solimp[..., 0], MJ_MINIMP, MJ_MAXIMP)
  dmax = jnp.clip(solimp[..., 1], MJ_MINIMP, MJ_MAXIMP)
  width = jnp.maximum(solimp[..., 2], MJ_MINVAL)
  mid = jnp.clip(solimp[..., 3], MJ_MINIMP, MJ_MAXIMP)
  power = jnp.maximum(solimp[..., 4], 1.0)

  if not (m.opt.disableflags & types.DisableBit.REFSAFE):
    timeconst = jnp.maximum(timeconst, 2.0 * m.opt.timestep.astype(dtype))

  dmax_sq = dmax * dmax
  k = 1.0 / jnp.maximum(
      dmax_sq * timeconst * timeconst * dampratio * dampratio, MJ_MINVAL)
  b = 2.0 / jnp.maximum(dmax * timeconst, MJ_MINVAL)
  k = jnp.where(solref[..., 0] <= 0, -solref[..., 0] / dmax_sq, k)
  b = jnp.where(solref[..., 1] <= 0, -solref[..., 1] / dmax, b)

  imp_x = jnp.abs(pos_imp) / width
  imp_a = (1.0 / mid ** (power - 1.0)) * imp_x ** power
  imp_b = 1.0 - (1.0 / (1.0 - mid) ** (power - 1.0)) * (1.0 - imp_x) ** power
  imp_y = jnp.where(imp_x < mid, imp_a, imp_b)
  imp = dmin + imp_y * (dmax - dmin)
  imp = jnp.clip(imp, dmin, dmax)
  imp = jnp.where(imp_x > 1.0, dmax, imp)
  return k, b, imp


def _row_values(m, pos_aref, pos_imp, invweight, solref, solimp, margin, vel,
                dtype):
  """D, aref, pos for a batch of rows (reference `_efc_row`:144-152)."""
  k, b, imp = _kbi(m, solref, solimp, pos_imp, dtype)
  D = 1.0 / jnp.maximum(invweight * (1.0 - imp) / imp, MJ_MINVAL)
  aref = -k * imp * pos_aref - b * vel
  pos = pos_aref + margin
  return D, aref, pos


def _jac(m: types.Model, d: types.Data, point, bodyid):
  """Batched point Jacobian.

  point: (n, 3) dynamic; bodyid: (n,) static numpy OR traced int array
  (traced ids arise from compacted contact slots, whose geom pairing is
  per-world).  Returns jacp, jacr of shape (n, nv, 3).
  Reference: support.py:498 `jac_dof` (one thread per dof there).
  """
  dtype = point.dtype
  n = len(bodyid) if isinstance(bodyid, np.ndarray) else bodyid.shape[0]
  if isinstance(bodyid, np.ndarray):  # constants fold at trace time
    mask = jnp.asarray(m.tree.body_dof_mask[bodyid], dtype)  # (n, nv)
    root = m.body_rootid[bodyid]
  else:
    mask = jnp.asarray(m.tree.body_dof_mask, dtype)[bodyid]
    root = jnp.asarray(m.body_rootid)[bodyid]
  offset = point - d.subtree_com[root]  # (n, 3)
  ang = d.cdof[:, :3]  # (nv, 3)
  lin = d.cdof[:, 3:]
  jacp = (lin[None] + jnp.cross(
      jnp.broadcast_to(ang[None], (n,) + ang.shape),
      offset[:, None, :])) * mask[..., None]
  jacr = ang[None] * mask[..., None]
  return jacp, jacr


def _cdof_dot_jac(m: types.Model, d: types.Data):
  """Per-dof cdof time-derivative for Jacobian-dot (support.py:641-650).

  For ball dofs and the rotational dofs of free joints the effective
  derivative is cvel(dof body) × cdof instead of cdof_dot.
  """
  quat_dof = np.zeros(m.nv, bool)
  for i in range(m.nv):
    j = int(m.dof_jntid[i])
    jt = int(m.jnt_type[j])
    if jt == _JT.BALL or (jt == _JT.FREE and i >= int(m.jnt_dofadr[j]) + 3):
      quat_dof[i] = True
  alt = math.motion_cross(d.cvel[m.dof_bodyid], d.cdof)
  return jnp.where(jnp.asarray(quat_dof)[:, None], alt, d.cdof_dot)


def _jac_dot(m: types.Model, d: types.Data, point, bodyid, cdof_dot):
  """Batched time-derivative of the point Jacobian (support.py:607-664)."""
  dtype = point.dtype
  if isinstance(bodyid, np.ndarray):
    mask = jnp.asarray(m.tree.body_dof_mask[bodyid], dtype)
    root = m.body_rootid[bodyid]
  else:
    mask = jnp.asarray(m.tree.body_dof_mask, dtype)[bodyid]
    root = jnp.asarray(m.body_rootid)[bodyid]
  offset = point - d.subtree_com[root]
  cvel = d.cvel[bodyid]  # (n, 6)
  pvel_lin = cvel[:, 3:] - jnp.cross(offset, cvel[:, :3])  # (n, 3)
  dd_ang = cdof_dot[:, :3]  # (nv, 3)
  dd_lin = cdof_dot[:, 3:]
  n = len(bodyid) if isinstance(bodyid, np.ndarray) else bodyid.shape[0]
  corr1 = jnp.cross(jnp.broadcast_to(dd_ang[None], (n,) + dd_ang.shape),
                    offset[:, None, :])
  corr2 = jnp.cross(jnp.broadcast_to(d.cdof[None, :, :3],
                                     (n, m.nv, 3)), pvel_lin[:, None, :])
  jacp_dot = (dd_lin[None] + corr1 + corr2) * mask[..., None]
  jacr_dot = dd_ang[None] * mask[..., None]
  return jacp_dot, jacr_dot


class _Rows:
  """Accumulator for constraint rows scattered into the static layout.

  With ``m.efc_compact`` the Jacobian is (nefc, efc_K) values plus
  (nefc, efc_K) dof indices (pad = nv) instead of dense (nefc, nv); only
  flex-edge equality and contact rows are emitted in that mode (io.py
  detection guarantees nothing else exists)."""

  def __init__(self, m: types.Model, dtype):
    self.compact = m.efc_compact
    if self.compact:
      self.J = jnp.zeros((m.nefc, m.efc_K), dtype)
      self.Jidx = jnp.asarray(
          np.full((m.nefc, m.efc_K), m.nv, np.int32))
    else:
      self.J = jnp.zeros((m.nefc, m.nv), dtype)
      self.Jidx = jnp.zeros((0, 0), jnp.int32)
    self.pos = jnp.zeros((m.nefc,), dtype)
    self.margin = jnp.zeros((m.nefc,), dtype)
    self.D = jnp.zeros((m.nefc,), dtype)
    self.aref = jnp.zeros((m.nefc,), dtype)
    self.frictionloss = jnp.zeros((m.nefc,), dtype)
    self.active = jnp.zeros((m.nefc,), bool)
    self._K = m.efc_K
    self._nv = m.nv

  def set(self, adr, J, pos, margin, D, aref, frictionloss, active):
    """adr: static numpy row indices; all values first-dim len(adr)."""
    assert not self.compact, 'dense row emit in compact EFC mode'
    # inactive rows are zeroed so they vanish from all solver products
    act_f = active.astype(J.dtype)[:, None]
    self.J = self.J.at[adr].set(J * act_f)
    self._set_scalars(adr, pos, margin, D, aref, frictionloss, active,
                      act_f[:, 0])

  def set_compact(self, adr, vals, idx, pos, margin, D, aref,
                  frictionloss, active):
    """vals (n, kk) row values on dof ids idx (n, kk), kk <= efc_K."""
    act_f = active.astype(vals.dtype)[:, None]
    kk = vals.shape[1]
    if kk < self._K:
      vals = jnp.concatenate(
          [vals, jnp.zeros((vals.shape[0], self._K - kk), vals.dtype)], -1)
      idx = jnp.concatenate(
          [idx, jnp.full((vals.shape[0], self._K - kk), self._nv,
                         jnp.int32)], -1) if isinstance(idx, jax.Array) \
          else np.concatenate(
              [idx, np.full((vals.shape[0], self._K - kk), self._nv,
                            np.int32)], -1)
    self.J = self.J.at[adr].set(vals * act_f)
    self.Jidx = self.Jidx.at[adr].set(idx)
    self._set_scalars(adr, pos, margin, D, aref, frictionloss, active,
                      act_f[:, 0])

  def _set_scalars(self, adr, pos, margin, D, aref, frictionloss, active,
                   act1):
    self.pos = self.pos.at[adr].set(pos * act1)
    self.margin = self.margin.at[adr].set(margin * act1)
    self.D = self.D.at[adr].set(D * act1)
    self.aref = self.aref.at[adr].set(aref * act1)
    if frictionloss is not None:
      self.frictionloss = self.frictionloss.at[adr].set(
          frictionloss * act1)
    self.active = self.active.at[adr].set(active)


def _equality_connect(m, d, rows, cdof_dot, dtype):
  """Connect equality rows (reference: constraint.py:156-496)."""
  lay = m.efc
  ids = lay.connect_id
  if not len(ids):
    return
  data = m.eq_data[ids]
  anchor1 = data[:, 0:3]
  anchor2 = data[:, 3:6]
  is_site = (m.eq_objtype[ids] == types.ObjType.SITE) & (m.nsite > 0)
  obj1 = m.eq_obj1id[ids]
  obj2 = m.eq_obj2id[ids]
  body1 = np.where(is_site, m.site_bodyid[np.minimum(obj1, max(m.nsite - 1, 0))]
                   if m.nsite else 0, obj1)
  body2 = np.where(is_site, m.site_bodyid[np.minimum(obj2, max(m.nsite - 1, 0))]
                   if m.nsite else 0, obj2)

  pos1b = d.xpos[body1] + jnp.einsum('nij,nj->ni', d.xmat[body1], anchor1)
  pos2b = d.xpos[body2] + jnp.einsum('nij,nj->ni', d.xmat[body2], anchor2)
  if m.nsite and np.any(is_site):
    sel = jnp.asarray(is_site)[:, None]
    pos1 = jnp.where(sel, d.site_xpos[np.minimum(obj1, m.nsite - 1)], pos1b)
    pos2 = jnp.where(sel, d.site_xpos[np.minimum(obj2, m.nsite - 1)], pos2b)
  else:
    pos1, pos2 = pos1b, pos2b

  jacp1, _ = _jac(m, d, pos1, body1)
  jacp2, _ = _jac(m, d, pos2, body2)
  jd = jacp1 - jacp2  # (n, nv, 3)
  jacd1, _ = _jac_dot(m, d, pos1, body1, cdof_dot)
  jacd2, _ = _jac_dot(m, d, pos2, body2, cdof_dot)
  jdot = jacd1 - jacd2

  cpos = pos1 - pos2  # (n, 3)
  Jqvel = jnp.einsum('nvi,v->ni', jd, d.qvel)
  Jdotv = jnp.einsum('nvi,v->ni', jdot, d.qvel)
  pos_imp = jnp.linalg.norm(cpos, axis=-1)
  invweight = m.body_invweight0[body1, 0] + m.body_invweight0[body2, 0]
  solref = m.eq_solref[ids]
  solimp = m.eq_solimp[ids]

  D, aref, posv = _row_values(
      m, cpos, pos_imp[:, None], invweight[:, None], solref[:, None, :],
      solimp[:, None, :], 0.0, Jqvel, dtype)
  D = jnp.broadcast_to(D, cpos.shape)
  aref = aref - Jdotv
  active = jnp.broadcast_to(d.eq_active[ids][:, None], cpos.shape)

  adr = (lay.connect_adr[:, None] + np.arange(3)).reshape(-1)
  rows.set(adr, jnp.swapaxes(jd, 1, 2).reshape(-1, m.nv),
           posv.reshape(-1), jnp.zeros_like(posv).reshape(-1),
           D.reshape(-1), aref.reshape(-1), None, active.reshape(-1))


def _equality_weld(m, d, rows, cdof_dot, dtype):
  """Weld equality rows (reference: constraint.py:965-1440)."""
  lay = m.efc
  ids = lay.weld_id
  if not len(ids):
    return
  data = m.eq_data[ids]
  anchor1 = data[:, 0:3]
  anchor2 = data[:, 3:6]
  relpose = data[:, 6:10]
  torquescale = data[:, 10]
  is_site = (m.eq_objtype[ids] == types.ObjType.SITE) & (m.nsite > 0)
  obj1 = m.eq_obj1id[ids]
  obj2 = m.eq_obj2id[ids]
  body1 = np.where(is_site, m.site_bodyid[np.minimum(obj1, max(m.nsite - 1, 0))]
                   if m.nsite else 0, obj1)
  body2 = np.where(is_site, m.site_bodyid[np.minimum(obj2, max(m.nsite - 1, 0))]
                   if m.nsite else 0, obj2)

  # positions: NOTE body1 carries anchor2 and vice versa (reference:1078-1079)
  pos1b = d.xpos[body1] + jnp.einsum('nij,nj->ni', d.xmat[body1], anchor2)
  pos2b = d.xpos[body2] + jnp.einsum('nij,nj->ni', d.xmat[body2], anchor1)
  quat_b = math.mul_quat(d.xquat[body1], relpose)
  quat1_b = math.quat_inv(d.xquat[body2])
  qfull1_b = d.xquat[body2]
  if m.nsite and np.any(is_site):
    s1 = np.minimum(obj1, m.nsite - 1)
    s2 = np.minimum(obj2, m.nsite - 1)
    sel = jnp.asarray(is_site)[:, None]
    pos1 = jnp.where(sel, d.site_xpos[s1], pos1b)
    pos2 = jnp.where(sel, d.site_xpos[s2], pos2b)
    sq1 = math.mul_quat(d.xquat[m.site_bodyid[s1]], m.site_quat[s1])
    sq2 = math.mul_quat(d.xquat[m.site_bodyid[s2]], m.site_quat[s2])
    quat = jnp.where(sel, sq1, quat_b)
    quat1 = jnp.where(sel, math.quat_inv(sq2), quat1_b)
    qfull1 = jnp.where(sel, sq2, qfull1_b)
  else:
    pos1, pos2, quat, quat1, qfull1 = pos1b, pos2b, quat_b, quat1_b, qfull1_b

  jacp1, jacr1 = _jac(m, d, pos1, body1)
  jacp2, jacr2 = _jac(m, d, pos2, body2)
  jacdifp = jacp1 - jacp2  # (n, nv, 3)
  jacd1, jacrd1 = _jac_dot(m, d, pos1, body1, cdof_dot)
  jacd2, jacrd2 = _jac_dot(m, d, pos2, body2, cdof_dot)
  jacdifp_dot = jacd1 - jacd2
  jacdifr_dot = jacrd1 - jacrd2

  # rotational rows through the quaternion map (reference:1196-1198)
  ts = torquescale[:, None, None]
  jacdifr = (jacr1 - jacr2) * ts  # (n, nv, 3)
  q1e = quat1[:, None, :]  # broadcast over dofs
  qe = quat[:, None, :]
  jacdifrq = math.mul_quat(math.quat_mul_axis(q1e, jacdifr), qe)
  jacdifr = 0.5 * jacdifrq[..., 1:4]  # (n, nv, 3)

  cpos = pos1 - pos2
  crotq = math.mul_quat(quat1, quat)
  crot = crotq[:, 1:4] * torquescale[:, None]

  Jqvelp = jnp.einsum('nvi,v->ni', jacdifp, d.qvel)
  Jqvelr = jnp.einsum('nvi,v->ni', jacdifr, d.qvel)
  Jdotv_p = jnp.einsum('nvi,v->ni', jacdifp_dot, d.qvel)
  Jdotv_r0 = jnp.einsum('nvi,v->ni', jacdifr_dot, d.qvel)

  # rotational Jdotv (reference:1088-1114, 1365-1379)
  omega1 = d.cvel[body1, :3]
  omega2 = d.cvel[body2, :3]
  domega_q = jnp.concatenate([jnp.zeros_like(omega1[:, :1]),
                              omega1 - omega2], axis=-1)
  omega1_q = jnp.concatenate([jnp.zeros_like(omega1[:, :1]), omega1], axis=-1)
  omega2_q = jnp.concatenate([jnp.zeros_like(omega2[:, :1]), omega2], axis=-1)
  qdot0_b = math.mul_quat(omega1_q, d.xquat[body1]) * 0.5
  qdot0r_b = math.mul_quat(qdot0_b, relpose)
  qdot1_b = math.mul_quat(omega2_q, qfull1_b) * 0.5
  if m.nsite and np.any(is_site):
    qdot0r_s = math.mul_quat(omega1_q, quat) * 0.5
    qdot1_s = math.mul_quat(omega2_q, qfull1) * 0.5
    qdot0r = jnp.where(sel, qdot0r_s, qdot0r_b)
    qdot1 = jnp.where(sel, qdot1_s, qdot1_b)
  else:
    qdot0r, qdot1 = qdot0r_b, qdot1_b
  negqdot1 = math.quat_inv(qdot1)
  negq1 = math.quat_inv(qfull1)

  djrdv_q = jnp.concatenate([jnp.zeros_like(Jdotv_r0[:, :1]), Jdotv_r0],
                            axis=-1)
  t1 = math.mul_quat(math.mul_quat(negqdot1, domega_q), quat)
  t2 = math.mul_quat(math.mul_quat(negq1, djrdv_q), quat)
  t3 = math.mul_quat(math.mul_quat(negq1, domega_q), qdot0r)
  Jdotv_r = (t1[:, 1:4] + t2[:, 1:4] + t3[:, 1:4]) * 0.5 * \
      torquescale[:, None]

  pos_imp = jnp.sqrt(jnp.sum(cpos * cpos, -1) + jnp.sum(crot * crot, -1))
  invweight_t = m.body_invweight0[body1, 0] + m.body_invweight0[body2, 0]
  invweight_r = m.body_invweight0[body1, 1] + m.body_invweight0[body2, 1]
  solref = m.eq_solref[ids]
  solimp = m.eq_solimp[ids]

  Dp, arefp, posp = _row_values(
      m, cpos, pos_imp[:, None], invweight_t[:, None], solref[:, None, :],
      solimp[:, None, :], 0.0, Jqvelp, dtype)
  Dp = jnp.broadcast_to(Dp, cpos.shape)
  arefp = arefp - Jdotv_p
  Dr, arefr, posr = _row_values(
      m, crot, pos_imp[:, None], invweight_r[:, None], solref[:, None, :],
      solimp[:, None, :], 0.0, Jqvelr, dtype)
  Dr = jnp.broadcast_to(Dr, crot.shape)
  arefr = arefr - Jdotv_r

  active = jnp.broadcast_to(d.eq_active[ids][:, None], (len(ids), 6))
  adr = (lay.weld_adr[:, None] + np.arange(6)).reshape(-1)
  J6 = jnp.concatenate(
      [jnp.swapaxes(jacdifp, 1, 2), jnp.swapaxes(jacdifr, 1, 2)], axis=1)
  rows.set(adr, J6.reshape(-1, m.nv),
           jnp.concatenate([posp, posr], -1).reshape(-1),
           jnp.zeros((len(ids) * 6,), dtype),
           jnp.concatenate([Dp, Dr], -1).reshape(-1),
           jnp.concatenate([arefp, arefr], -1).reshape(-1),
           None, active.reshape(-1))


def _equality_joint(m, d, rows, dtype):
  """Joint equality rows (reference: constraint.py:499-638)."""
  lay = m.efc
  ids = lay.joint_id
  if not len(ids):
    return
  data = m.eq_data[ids]
  j1 = m.eq_obj1id[ids]
  j2 = m.eq_obj2id[ids]
  qadr1 = m.jnt_qposadr[j1]
  dadr1 = m.jnt_dofadr[j1]
  has2 = j2 > -1
  j2c = np.maximum(j2, 0)
  qadr2 = m.jnt_qposadr[j2c]
  dadr2 = m.jnt_dofadr[j2c]

  dif = d.qpos[qadr2] - m.qpos0[qadr2]
  rhs = data[:, 0] + dif * (data[:, 1] + dif * (
      data[:, 2] + dif * (data[:, 3] + dif * data[:, 4])))
  deriv2 = data[:, 1] + dif * (2.0 * data[:, 2] + dif * (
      3.0 * data[:, 3] + dif * 4.0 * data[:, 4]))

  h2 = jnp.asarray(has2.astype(np.float32)).astype(dtype)
  pos = d.qpos[qadr1] - m.qpos0[qadr1] - jnp.where(
      jnp.asarray(has2), rhs, data[:, 0])
  Jqvel = d.qvel[dadr1] - d.qvel[dadr2] * deriv2 * h2
  invweight = m.dof_invweight0[dadr1] + m.dof_invweight0[dadr2] * h2

  n = len(ids)
  J = jnp.zeros((n, m.nv), dtype)
  J = J.at[np.arange(n), dadr1].set(1.0)
  J = J.at[np.arange(n), dadr2].add(jnp.where(jnp.asarray(has2), -deriv2, 0.0))

  D, aref, posv = _row_values(
      m, pos, pos, invweight, m.eq_solref[ids], m.eq_solimp[ids], 0.0,
      Jqvel, dtype)
  rows.set(lay.joint_adr, J, posv, jnp.zeros((n,), dtype), D, aref, None,
           d.eq_active[ids])


def _equality_tendon(m, d, rows, dtype):
  """Tendon equality rows (reference: constraint.py:641-828)."""
  lay = m.efc
  ids = lay.tendon_id
  if not len(ids):
    return
  data = m.eq_data[ids]
  t1 = m.eq_obj1id[ids]
  t2 = m.eq_obj2id[ids]
  has2 = t2 > -1
  t2c = np.maximum(t2, 0)

  dif = d.ten_length[t2c] - m.tendon_length0[t2c]
  rhs = data[:, 0] + dif * (data[:, 1] + dif * (
      data[:, 2] + dif * (data[:, 3] + dif * data[:, 4])))
  deriv2 = data[:, 1] + dif * (2.0 * data[:, 2] + dif * (
      3.0 * data[:, 3] + dif * 4.0 * data[:, 4]))

  h2 = jnp.asarray(has2.astype(np.float32)).astype(dtype)
  pos = d.ten_length[t1] - m.tendon_length0[t1] - jnp.where(
      jnp.asarray(has2), rhs, data[:, 0])
  J = d.ten_J[t1] - (deriv2 * h2)[:, None] * d.ten_J[t2c]
  Jqvel = J @ d.qvel
  invweight = m.tendon_invweight0[t1] + m.tendon_invweight0[t2c] * h2

  D, aref, posv = _row_values(
      m, pos, pos, invweight, m.eq_solref[ids], m.eq_solimp[ids], 0.0,
      Jqvel, dtype)
  rows.set(lay.tendon_adr, J, posv, jnp.zeros((len(ids),), dtype), D, aref,
           None, d.eq_active[ids])


def _equality_flex(m, d, rows, dtype):
  """Flex edge-length equality rows (reference: constraint.py:878
  `_equality_flex`): pos = len - len0, J = +-unit on the two particle
  vertices' slide dofs, invweight from flexedge_invweight0."""
  lay = m.efc
  ids = lay.flex_id
  if not len(ids):
    return
  nv = m.nv
  dof = np.asarray(m.flex_vert_dofadr)
  for eqid, adr0 in zip(ids, lay.flex_adr):
    fi = int(m.eq_obj1id[eqid])
    if int(m.flex_interp[fi]) != 0:
      continue  # C emits no edge-equality rows for interpolated flexes
    ebase = int(m.flex_edgeadr[fi])
    nfe = int(m.flex_edgenum[fi])
    e = np.asarray(m.flex_edge)[ebase:ebase + nfe] + int(m.flex_vertadr[fi])
    xv = d.flexvert_xpos
    u = xv[e[:, 1]] - xv[e[:, 0]]
    length = d.flexedge_length[ebase:ebase + nfe]
    uhat = u / jnp.maximum(length, 1e-12)[:, None]

    pos = length - m.flexedge_length0[ebase:ebase + nfe]
    vel = d.flexedge_velocity[ebase:ebase + nfe]
    invw = m.flexedge_invweight0[ebase:ebase + nfe]
    solref = jnp.broadcast_to(m.eq_solref[eqid][None], (nfe, types.NREF))
    solimp = jnp.broadcast_to(m.eq_solimp[eqid][None], (nfe, types.NIMP))
    D, aref, posv = _row_values(
        m, pos, jnp.abs(pos), invw, solref, solimp, 0.0, vel, dtype)
    active = jnp.broadcast_to(d.eq_active[eqid], (nfe,))
    adr = int(adr0) + np.arange(nfe)
    if m.efc_compact:
      # row r: -uhat on vert0's 3 slide dofs, +uhat on vert1's
      vals = jnp.concatenate([-uhat, uhat], axis=-1)  # (nfe, 6)
      idx = np.concatenate(
          [dof[e[:, 0]][:, None] + np.arange(3),
           dof[e[:, 1]][:, None] + np.arange(3)], axis=-1).astype(np.int32)
      rows.set_compact(adr, vals, idx, posv, jnp.zeros_like(posv), D,
                       aref, None, active)
      continue

    # J rows via static scatter: row r has -u on vert0 dofs, +u on vert1;
    # interpolated vertices distribute over their 8 node-dof columns with
    # the static trilinear weights (vertex-dof chain rule)
    rows_idx = np.arange(nfe)
    Wv, Dv = _vert_wdof(m)
    J = jnp.zeros((nfe, nv + 3), dtype)  # columns past nv: weight-0 pads
    for k in range(3):
      for side, sgn in ((0, -1.0), (1, 1.0)):
        wd = Wv[e[:, side]]  # (nfe, 8)
        dd = Dv[e[:, side]] + k  # (nfe, 8); pads stay at nv
        J = J.at[rows_idx[:, None], dd].add(sgn * uhat[:, k:k + 1] *
                                            jnp.asarray(wd, dtype))
    rows.set(adr, J[:, :nv], posv, jnp.zeros_like(posv), D, aref, None,
             active)


def _vert2iv(m):
  """(nflexvert,) static map: vertex id -> row in the flex_iv_* tables,
  -1 for particle vertices."""
  v2i = np.full(m.nflexvert, -1, np.int32)
  v2i[m.flex_iv_ids] = np.arange(len(m.flex_iv_ids), dtype=np.int32)
  return v2i


def _iv_jac_table(m):
  """(nivert, nv, 3) dense static translation jacobians of interpolated
  vertices: column dof(node_k)+a carries w_k on axis a."""
  ni = len(m.flex_iv_ids)
  tab = np.zeros((ni, m.nv, 3))
  for i in range(ni):
    for k in range(8):
      dof = int(m.flex_iv_dof[i, k])
      w = float(m.flex_iv_W[i, k])
      for a in range(3):
        tab[i, dof + a, a] += w
  return tab


def _patch_iv_jac(m, idx, side, jacp, jacr, dtype):
  """Replace contact-point jacobians of interpolated-vertex pseudo geoms
  (static slot positions) with their node-weight translation rows."""
  cp = np.asarray(m.con_pair)[idx]
  gs = np.asarray(m.pair_geom1 if side == 0 else m.pair_geom2)[cp]
  v2i = _vert2iv(m)
  isvert = gs >= m.ngeom
  vid = np.where(isvert, gs - m.ngeom, 0)
  sel = np.nonzero(isvert & (v2i[vid] >= 0))[0]
  if not len(sel):
    return jacp, jacr
  rows = v2i[vid[sel]]
  tab = _iv_jac_table(m)
  jacp = jacp.at[sel].set(jnp.asarray(tab[rows], dtype))
  jacr = jacr.at[sel].set(0.0)
  return jacp, jacr


def _static_contact_invw(m, idx):
  """(k,) static contact inverse weights: body invweight0 per side, or
  the trilinear blend sum(w_k^2 * node invweight0) for interpolated
  vertices (the effective inverse mass of the interpolation point)."""
  cp = np.asarray(m.con_pair)[idx]
  iw0 = np.asarray(jax.device_get(m.body_invweight0))[:, 0]
  gb = np.asarray(m.geom_bodyid)
  v2i = _vert2iv(m)
  out = np.zeros(len(idx))
  for side_geoms in (np.asarray(m.pair_geom1)[cp],
                     np.asarray(m.pair_geom2)[cp]):
    for p, g in enumerate(side_geoms):
      g = int(g)
      if g >= m.ngeom and v2i[g - m.ngeom] >= 0:
        i = v2i[g - m.ngeom]
        out[p] += float(np.sum(np.asarray(m.flex_iv_W[i]) ** 2 *
                               iw0[np.asarray(m.flex_iv_body[i])]))
      else:
        out[p] += iw0[gb[g]]
  return out


def _vert_wdof(m):
  """(nflexvert, 8) static weights + base dof columns for vertex motion.

  Particle vertices are 1-hot on their own slide dofs; interpolated
  (trilinear) vertices carry the 8 static node weights.  Pad entries
  point at dof nv with weight 0 (callers allocate nv+3-wide scratch and
  trim)."""
  nvert = m.nflexvert
  W = np.zeros((nvert, 8))
  D = np.full((nvert, 8), m.nv, np.int32)
  pd = np.asarray(m.flex_vert_dofadr)
  has = pd >= 0
  W[has, 0] = 1.0
  D[has, 0] = pd[has]
  if m.flex_iv_ids is not None:
    W[m.flex_iv_ids] = np.asarray(m.flex_iv_W)
    D[m.flex_iv_ids] = np.asarray(m.flex_iv_dof)
  return W, D


def _friction(m, d, rows, dtype):
  """DOF and tendon friction-loss rows (reference: 1766-1988)."""
  lay = m.efc
  dofs = lay.fri_dof_id
  if len(dofs):
    n = len(dofs)
    J = jnp.zeros((n, m.nv), dtype).at[np.arange(n), dofs].set(1.0)
    D, aref, posv = _row_values(
        m, jnp.zeros((n,), dtype), jnp.zeros((n,), dtype),
        m.dof_invweight0[dofs], m.dof_solref[dofs], m.dof_solimp[dofs],
        0.0, d.qvel[dofs], dtype)
    rows.set(lay.fri_dof_adr, J, posv, jnp.zeros((n,), dtype), D, aref,
             m.dof_frictionloss[dofs], jnp.ones((n,), bool))
  tens = lay.fri_ten_id
  if len(tens):
    n = len(tens)
    J = d.ten_J[tens]
    D, aref, posv = _row_values(
        m, jnp.zeros((n,), dtype), jnp.zeros((n,), dtype),
        m.tendon_invweight0[tens], m.tendon_solref_fri[tens],
        m.tendon_solimp_fri[tens], 0.0, d.ten_velocity[tens], dtype)
    rows.set(lay.fri_ten_adr, J, posv, jnp.zeros((n,), dtype), D, aref,
             m.tendon_frictionloss[tens], jnp.ones((n,), bool))


def _limit(m, d, rows, dtype):
  """Joint and tendon limit rows (reference: 1990-2374)."""
  lay = m.efc
  jids = lay.lim_jnt_id
  if len(jids):
    n = len(jids)
    jt = m.jnt_type[jids]
    qadr = m.jnt_qposadr[jids]
    dadr = m.jnt_dofadr[jids]
    margin = m.jnt_margin[jids]
    jrange = m.jnt_range[jids]

    # slide/hinge: nearer side of the range (reference:2040-2058)
    qp = d.qpos[qadr]
    dist_min = qp - jrange[:, 0]
    dist_max = jrange[:, 1] - qp
    pos_sh = jnp.minimum(dist_min, dist_max) - margin
    Jsign = jnp.where(dist_min < dist_max, 1.0, -1.0).astype(dtype)

    # ball: max range minus rotation angle (reference:2148-2209)
    is_ball = jt == _JT.BALL
    qb = jnp.stack([d.qpos[np.minimum(qadr + i, m.nq - 1)]
                    for i in range(4)], -1)
    qb = math.normalize_quat(qb)
    aa = math.quat_to_vel(qb)
    angle = jnp.linalg.norm(aa, axis=-1)
    axis = aa / jnp.maximum(angle, 1e-12)[:, None]
    pos_ball = jnp.maximum(jrange[:, 0], jrange[:, 1]) - angle - margin

    pos = jnp.where(jnp.asarray(is_ball), pos_ball, pos_sh)
    active = pos < 0

    J = jnp.zeros((n, m.nv), dtype)
    ball_mask = jnp.asarray(is_ball.astype(np.float32)).astype(dtype)
    J = J.at[np.arange(n), dadr].set(
        jnp.where(jnp.asarray(is_ball), -axis[:, 0], Jsign))
    for i in (1, 2):
      J = J.at[np.arange(n), np.minimum(dadr + i, m.nv - 1)].add(
          -axis[:, i] * ball_mask)
    Jqvel = J @ d.qvel

    D, aref, posv = _row_values(
        m, pos, pos, m.dof_invweight0[dadr], m.jnt_solref[jids],
        m.jnt_solimp[jids], margin, Jqvel, dtype)
    rows.set(lay.lim_jnt_adr, J, posv, margin, D, aref, None, active)

  tids = lay.lim_ten_id
  if len(tids):
    n = len(tids)
    margin = m.tendon_margin[tids]
    trange = m.tendon_range[tids]
    ln = d.ten_length[tids]
    dist_min = ln - trange[:, 0]
    dist_max = trange[:, 1] - ln
    pos = jnp.minimum(dist_min, dist_max) - margin
    active = pos < 0
    Jsign = jnp.where(dist_min < dist_max, 1.0, -1.0).astype(dtype)
    J = Jsign[:, None] * d.ten_J[tids]
    Jqvel = J @ d.qvel
    D, aref, posv = _row_values(
        m, pos, pos, m.tendon_invweight0[tids], m.tendon_solref_lim[tids],
        m.tendon_solimp_lim[tids], margin, Jqvel, dtype)
    rows.set(lay.lim_ten_adr, J, posv, margin, D, aref, None, active)


def _jac_chain(m, d, point, bodyid):
  """Chain-restricted point Jacobian for the compact EFC mode.

  Returns (jacp (k, chain_K, 3), jacr (k, chain_K, 3), idx (k, chain_K))
  — values only on the body's ancestor-chain dofs (everything else is
  structurally zero); padding ids equal nv and carry zero values (the
  padded cdof row is zero)."""
  chain = jnp.asarray(m.body_chain)
  rootid = jnp.asarray(m.body_rootid)
  cdof_pad = jnp.concatenate(
      [d.cdof, jnp.zeros((1, 6), d.cdof.dtype)], axis=0)
  ch = chain[bodyid]  # (k, Kb)
  cd = cdof_pad[ch]  # (k, Kb, 6)
  off = point[:, None, :] - d.subtree_com[rootid[bodyid]][:, None, :]
  jacp = cd[..., 3:] + jnp.cross(cd[..., :3], off)
  jacr = cd[..., :3]
  return jacp, jacr, ch


def _contact_compact(m, d, rows, dtype):
  """Contact rows in compact-chain form: same row values as `_contact`,
  but only on the two bodies' ancestor-chain dofs (pyramidal/frictionless
  cones; io detection excludes elliptic)."""
  con = d.contact
  assert m.opt.cone != types.ConeType.ELLIPTIC
  geom_bodyid = jnp.asarray(m.geom_bodyid)
  qvel_pad = jnp.concatenate([d.qvel, jnp.zeros((1,), dtype)])
  dims = np.asarray(con.dim)
  for dim in np.unique(dims):
    dim = int(dim)
    idx_ = np.nonzero(dims == dim)[0]
    k = len(idx_)
    body1 = geom_bodyid[con.geom1[idx_]]
    body2 = geom_bodyid[con.geom2[idx_]]
    pos = con.pos[idx_]
    frame = con.frame[idx_]
    dist = con.dist[idx_]
    margin = con.includemargin[idx_]
    cpos = dist - margin
    active = dist < margin

    jacp1, jacr1, ch1 = _jac_chain(m, d, pos, body1)
    jacp2, jacr2, ch2 = _jac_chain(m, d, pos, body2)
    jacp = jnp.concatenate([-jacp1, jacp2], axis=1)  # (k, 2Kb, 3)
    jacr = jnp.concatenate([-jacr1, jacr2], axis=1)
    idxK = jnp.concatenate([ch1, ch2], axis=1)  # (k, 2Kb)

    Jp = jnp.einsum('kij,kKj->kiK', frame, jacp)  # rows [n, t1, t2]
    Jr = jnp.einsum('kij,kKj->kiK', frame, jacr)

    invweight = m.body_invweight0[body1, 0] + m.body_invweight0[body2, 0]
    friction = con.friction[idx_]
    solref = con.solref[idx_]
    solimp = con.solimp[idx_]

    if dim == 1:
      Jrows = Jp[:, :1]  # (k, 1, 2Kb)
      nrow = 1
      iw = invweight[:, None]
      ref = solref[:, None, :]
      pos_aref = cpos[:, None]
    else:
      nrow = 2 * (dim - 1)
      dirs = [Jp[:, 1], Jp[:, 2], Jr[:, 0], Jr[:, 1], Jr[:, 2]]
      rows_l = []
      for o in range(nrow):
        fi = o // 2
        sign = 1.0 - 2.0 * float(o & 1)
        rows_l.append(Jp[:, 0] + sign * friction[:, fi][:, None] * dirs[fi])
      Jrows = jnp.stack(rows_l, axis=1)  # (k, nrow, 2Kb)
      fri0 = friction[:, 0]
      iw = invweight + fri0 * fri0 * invweight
      impratio_inv = 1.0 / jnp.maximum(m.opt.impratio.astype(dtype),
                                       MJ_MINVAL)
      iw = iw * 2.0 * fri0 * fri0 * impratio_inv
      iw = jnp.broadcast_to(iw[:, None], (k, nrow))
      ref = jnp.broadcast_to(solref[:, None, :], (k, nrow, types.NREF))
      pos_aref = jnp.broadcast_to(cpos[:, None], (k, nrow))

    Jqvel = jnp.einsum('krK,kK->kr', Jrows, qvel_pad[idxK])
    D, aref, posv = _row_values(
        m, pos_aref, cpos[:, None], iw, ref,
        jnp.broadcast_to(solimp[:, None, :], (k, nrow, types.NIMP)),
        margin[:, None], Jqvel, dtype)
    adr = (m.con_efc_address[idx_][:, None] + np.arange(nrow)).reshape(-1)
    act = jnp.broadcast_to(active[:, None], (k, nrow)).reshape(-1)
    rows.set_compact(
        adr, Jrows.reshape(-1, Jrows.shape[-1]),
        jnp.repeat(idxK, nrow, axis=0), posv.reshape(-1),
        jnp.broadcast_to(margin[:, None], (k, nrow)).reshape(-1),
        D.reshape(-1), aref.reshape(-1), None, act)


def _contact(m, d, rows, dtype):
  """Contact rows (reference: _efc_contact_jac_dense:3743 +
  _efc_contact_update:4189)."""
  if not m.ncon:
    return
  if m.efc_compact:
    return _contact_compact(m, d, rows, dtype)
  con = d.contact
  is_elliptic = m.opt.cone == types.ConeType.ELLIPTIC
  impratio_inv = 1.0 / jnp.maximum(m.opt.impratio.astype(dtype), MJ_MINVAL)

  # group contact slots by condim (static)
  dims = np.asarray(con.dim)
  geom_bodyid = jnp.asarray(m.geom_bodyid)
  for dim in np.unique(dims):
    dim = int(dim)
    idx = np.nonzero(dims == dim)[0]
    k = len(idx)
    # geom ids are per-world dynamic under contact compaction
    g1 = con.geom1[idx]
    g2 = con.geom2[idx]
    body1 = geom_bodyid[g1]
    body2 = geom_bodyid[g2]
    pos = con.pos[idx]
    frame = con.frame[idx]  # (k, 3, 3) rows
    dist = con.dist[idx]
    margin = con.includemargin[idx]
    cpos = dist - margin
    active = dist < margin

    invweight = m.body_invweight0[body1, 0] + m.body_invweight0[body2, 0]
    if m.flex_iv_ids is not None:
      # interpolated flex vertices have no body: their point jacobian is
      # the static trilinear weight pattern over node dofs (translation
      # only) and their inverse weight blends the node inverse masses.
      # Slot -> candidate identity holds (io rejects contact compaction
      # with interp flexes), so the patch sites are static.
      jacp1, jacr1 = _jac(m, d, pos, body1)
      jacp2, jacr2 = _jac(m, d, pos, body2)
      jacp1, jacr1 = _patch_iv_jac(m, idx, 0, jacp1, jacr1, dtype)
      jacp2, jacr2 = _patch_iv_jac(m, idx, 1, jacp2, jacr2, dtype)
      invweight = jnp.asarray(
          _static_contact_invw(m, idx), dtype)
      jacp = jacp2 - jacp1  # (k, nv, 3)
      jacr = jacr2 - jacr1
      Jp = jnp.einsum('kiv,kvj->kij', frame, jnp.swapaxes(jacp, 1, 2))
      Jr = jnp.einsum('kiv,kvj->kij', frame, jnp.swapaxes(jacr, 1, 2))
    else:
      # frame-projected jacobian WITHOUT the (k, nv, 3) intermediates:
      # frame_i · (lin_v + ang_v × off) = frame_i·lin_v + (off×frame_i)·ang_v
      # (scalar triple product), so each projected row is a (3k, 3) ×
      # (3, nv) matmul — batched onto the MXU under the world vmap, and
      # the four jacp/jacr temporaries (each ~(k, nv, 3) × nworld in HBM)
      # never materialize (they dominated make_constraint's cost at
      # three_humanoids: k=100, nv=81, 8192 worlds).
      ang = d.cdof[:, :3]  # (nv, 3)
      lin = d.cdof[:, 3:]
      bmask = jnp.asarray(m.tree.body_dof_mask, dtype)
      brootid = jnp.asarray(m.body_rootid)
      Fl = jnp.einsum('kij,vj->kiv', frame, lin)  # frame-projected lin
      Fa = jnp.einsum('kij,vj->kiv', frame, ang)  # frame-projected ang

      def proj(body):
        if isinstance(body, np.ndarray):  # fold at trace time
          mask = jnp.asarray(m.tree.body_dof_mask[body], dtype)
          root = m.body_rootid[body]
        else:
          mask = bmask[body]
          root = brootid[body]
        off = pos - d.subtree_com[root]  # (k, 3)
        w = jnp.cross(off[:, None, :], frame)  # (k, 3, 3) = off × rows
        Jp_b = (Fl + jnp.einsum('kij,vj->kiv', w, ang)) * mask[:, None, :]
        Jr_b = Fa * mask[:, None, :]
        return Jp_b, Jr_b

      Jp1, Jr1 = proj(body1)
      Jp2, Jr2 = proj(body2)
      Jp = Jp2 - Jp1
      Jr = Jr2 - Jr1
    # (k, 3, nv) each: rows [n, t1, t2]
    friction = con.friction[idx]
    solref = con.solref[idx]
    solreffriction = con.solreffriction[idx]
    solimp = con.solimp[idx]

    if dim == 1:
      Jrows = Jp[:, :1]  # (k, 1, nv)
      nrow = 1
      iw = invweight[:, None]
      ref = solref[:, None, :]
      pos_aref = cpos[:, None]
    elif not is_elliptic:
      nrow = 2 * (dim - 1)
      dirs = [Jp[:, 1], Jp[:, 2], Jr[:, 0], Jr[:, 1], Jr[:, 2]]
      rows_l = []
      for o in range(nrow):
        fi = o // 2  # friction dim index - 1
        sign = 1.0 - 2.0 * float(o & 1)
        rows_l.append(Jp[:, 0] + sign * friction[:, fi][:, None] * dirs[fi])
      Jrows = jnp.stack(rows_l, axis=1)  # (k, nrow, nv)
      fri0 = friction[:, 0]
      iw = invweight + fri0 * fri0 * invweight
      iw = iw * 2.0 * fri0 * fri0 * impratio_inv
      iw = jnp.broadcast_to(iw[:, None], (k, nrow))
      ref = jnp.broadcast_to(solref[:, None, :], (k, nrow, types.NREF))
      pos_aref = jnp.broadcast_to(cpos[:, None], (k, nrow))
    else:
      nrow = dim
      parts = [Jp[:, 0:1], Jp[:, 1:2], Jp[:, 2:3], Jr[:, 0:1], Jr[:, 1:2],
               Jr[:, 2:3]]
      Jrows = jnp.concatenate(parts[:dim], axis=1)
      # friction-row invweight scaling (reference:4268-4285)
      iw_n = invweight
      iw_f = invweight * impratio_inv
      iw_list = [iw_n, iw_f]
      for o in range(2, dim):
        fri0 = friction[:, 0]
        frii = friction[:, o - 1]
        iw_list.append(iw_f * fri0 * fri0 / jnp.maximum(frii * frii,
                                                        MJ_MINVAL))
      iw = jnp.stack(iw_list[:dim], axis=1)
      has_srf = (solreffriction[:, 0:1] != 0) | (solreffriction[:, 1:2] != 0)
      fref = jnp.where(has_srf, solreffriction, solref)
      ref = jnp.concatenate(
          [solref[:, None, :],
           jnp.broadcast_to(fref[:, None, :], (k, dim - 1, types.NREF))],
          axis=1)
      pos_aref = jnp.concatenate(
          [cpos[:, None], jnp.zeros((k, dim - 1), dtype)], axis=1)

    Jqvel = jnp.einsum('krv,v->kr', Jrows, d.qvel)
    D, aref, posv = _row_values(
        m, pos_aref, cpos[:, None], iw, ref,
        jnp.broadcast_to(solimp[:, None, :], (k, nrow, types.NIMP)),
        margin[:, None], Jqvel, dtype)
    adr = (m.con_efc_address[idx][:, None] + np.arange(nrow)).reshape(-1)
    act = jnp.broadcast_to(active[:, None], (k, nrow)).reshape(-1)
    rows.set(adr, Jrows.reshape(-1, m.nv), posv.reshape(-1),
             jnp.broadcast_to(margin[:, None], (k, nrow)).reshape(-1),
             D.reshape(-1), aref.reshape(-1), None, act)


def make_constraint(m: types.Model, d: types.Data) -> types.Data:
  """Assemble the EFC system (reference: constraint.py:4870)."""
  dtype = d.qpos.dtype
  rows = _Rows(m, dtype)
  dsbl = m.opt.disableflags

  if m.nefc == 0 or (dsbl & types.DisableBit.CONSTRAINT):
    return d.replace(
        efc_J=rows.J, efc_Jidx=rows.Jidx, efc_pos=rows.pos,
        efc_margin=rows.margin,
        efc_D=rows.D, efc_aref=rows.aref,
        efc_frictionloss=rows.frictionloss, efc_active=rows.active,
        ne_active=jnp.zeros((), jnp.int32),
        nf_active=jnp.zeros((), jnp.int32),
        nl_active=jnp.zeros((), jnp.int32),
        nefc_active=jnp.zeros((), jnp.int32))

  if m.neq and not (dsbl & types.DisableBit.EQUALITY):
    cdof_dot = _cdof_dot_jac(m, d)
    _equality_connect(m, d, rows, cdof_dot, dtype)
    _equality_weld(m, d, rows, cdof_dot, dtype)
    _equality_joint(m, d, rows, dtype)
    _equality_tendon(m, d, rows, dtype)
    _equality_flex(m, d, rows, dtype)
  if m.nf and not (dsbl & types.DisableBit.FRICTIONLOSS):
    _friction(m, d, rows, dtype)
  if m.nl and not (dsbl & types.DisableBit.LIMIT):
    _limit(m, d, rows, dtype)
  if not (dsbl & types.DisableBit.CONTACT):
    _contact(m, d, rows, dtype)

  act = rows.active
  i32 = lambda x: x.astype(jnp.int32)
  ne_active = i32(jnp.sum(act[:m.ne]))
  nf_active = i32(jnp.sum(act[m.ne:m.ne + m.nf]))
  nl_active = i32(jnp.sum(act[m.ne + m.nf:m.ne + m.nf + m.nl]))
  nefc_active = i32(jnp.sum(act))

  return d.replace(
      efc_J=rows.J, efc_Jidx=rows.Jidx, efc_pos=rows.pos,
      efc_margin=rows.margin,
      efc_D=rows.D, efc_aref=rows.aref,
      efc_frictionloss=rows.frictionloss, efc_active=act,
      ne_active=ne_active, nf_active=nf_active, nl_active=nl_active,
      nefc_active=nefc_active)
