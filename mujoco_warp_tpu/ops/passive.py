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


def _ellipsoid_bodies(m: types.Model) -> np.ndarray:
  """(nbody,) bool: body uses the ellipsoid fluid model (any geom with
  fluidcoef > 0; reference passive.py body_fluid_ellipsoid)."""
  out = np.zeros(m.nbody, bool)
  if m.geom_fluid is not None and len(m.geom_fluid):
    gf = np.asarray(m.geom_fluid)
    for g in np.nonzero(gf[:, 0] > 0)[0]:
      out[m.geom_bodyid[g]] = True
  return out


def _fluid_ellipsoid(m: types.Model, d: types.Data) -> jax.Array:
  """Ellipsoid fluid model (reference: passive.py:358-481, MuJoCo's
  mj_ellipsoidFluidModel): added mass, Magnus + Kutta lift, blunt/slender/
  angular drag per geom with fluidshape=ellipsoid."""
  dtype = d.qpos.dtype
  gf_np = np.asarray(m.geom_fluid)
  sel = np.nonzero(gf_np[:, 0] > 0)[0]
  if not len(sel):
    return jnp.zeros((m.nv,), dtype)
  rho = m.opt.density.astype(dtype)
  beta = m.opt.viscosity.astype(dtype)
  wind = m.opt.wind.astype(dtype)
  gf = jnp.asarray(gf_np[sel].astype(np.float32))
  b = m.geom_bodyid[sel]

  # semiaxes by geom type (static branching)
  gt = np.asarray(m.geom_type)[sel]
  sz = m.geom_size[sel]
  r = sz[:, 0]
  half = sz[:, 1]
  semi_rows = []
  for i, t in enumerate(gt):  # static per-geom type branching
    if t == types.GeomType.SPHERE:
      semi_rows.append(jnp.stack([r[i], r[i], r[i]]))
    elif t == types.GeomType.CAPSULE:
      semi_rows.append(jnp.stack([r[i], r[i], half[i] + r[i]]))
    elif t == types.GeomType.CYLINDER:
      semi_rows.append(jnp.stack([r[i], r[i], half[i]]))
    else:  # ellipsoid/box/mesh: size is the semiaxes
      semi_rows.append(sz[i])
  semi = jnp.stack(semi_rows)  # (n, 3)

  root_com = d.subtree_com[m.body_rootid[b]]
  ang = d.cvel[b, :3]
  lin_com = d.cvel[b, 3:] - jnp.cross(d.xipos[b] - root_com, ang)
  gpos = d.geom_xpos[sel]
  lin_point = lin_com + jnp.cross(ang, gpos - d.xipos[b])
  R = d.geom_xmat[sel]
  Rt = jnp.swapaxes(R, -1, -2)
  l_ang = jnp.einsum('nij,nj->ni', Rt, ang)
  l_lin = jnp.einsum('nij,nj->ni', Rt, lin_point - wind[None, :])

  frc = jnp.zeros_like(l_lin)
  trq = jnp.zeros_like(l_ang)

  # added-mass (density)
  vmass = gf[:, 6:9]
  vinert = gf[:, 9:12]
  vlm = rho * vmass * l_lin
  vam = rho * vinert * l_ang
  frc = frc + jnp.cross(vlm, l_ang)
  trq = trq + jnp.cross(vlm, l_lin) + jnp.cross(vam, l_ang)

  magnus_coef = gf[:, 5]
  kutta_coef = gf[:, 4]
  blunt = gf[:, 1]
  slender = gf[:, 2]
  ang_drag = gf[:, 3]

  s0, s1, s2 = semi[:, 0], semi[:, 1], semi[:, 2]
  volume = (4.0 / 3.0 * np.pi) * s0 * s1 * s2
  d_max = jnp.max(semi, axis=-1)
  d_min = jnp.min(semi, axis=-1)
  d_mid = s0 + s1 + s2 - d_max - d_min
  A_max = np.pi * d_max * d_mid
  lin_speed = jnp.linalg.norm(l_lin, axis=-1)

  frc = frc + jnp.cross(l_ang, l_lin) * (magnus_coef * rho * volume)[:, None]

  s12, s20, s01 = s1 * s2, s2 * s0, s0 * s1
  p2 = lambda x: x * x
  p4 = lambda x: p2(p2(x))
  proj_den = (p4(s12) * p2(l_lin[:, 0]) + p4(s20) * p2(l_lin[:, 1]) +
              p4(s01) * p2(l_lin[:, 2]))
  proj_num = (p2(s12 * l_lin[:, 0]) + p2(s20 * l_lin[:, 1]) +
              p2(s01 * l_lin[:, 2]))
  A_proj = np.pi * jnp.sqrt(proj_den / jnp.maximum(proj_num, 1e-15))
  cos_a = proj_num / jnp.maximum(lin_speed * proj_den, 1e-15)
  norm = jnp.stack([p2(s12) * l_lin[:, 0], p2(s20) * l_lin[:, 1],
                    p2(s01) * l_lin[:, 2]], axis=-1)
  kutta_circ = jnp.cross(norm, l_lin) * (kutta_coef * rho * cos_a *
                                         A_proj)[:, None]
  kutta_force = jnp.cross(kutta_circ, l_lin)
  kutta_force = jnp.where((lin_speed > 1e-15)[:, None], kutta_force, 0.0)
  frc = frc + kutta_force

  eq_D = (2.0 / 3.0) * (s0 + s1 + s2)
  lin_visc_f = 3.0 * np.pi * eq_D
  lin_visc_t = np.pi * eq_D ** 3
  mom_c = (8.0 / 15.0) * np.pi
  I_max = mom_c * d_mid * p4(d_max)
  II = jnp.stack([
      mom_c * s0 * p4(jnp.maximum(s1, s2)),
      mom_c * s1 * p4(jnp.maximum(s2, s0)),
      mom_c * s2 * p4(jnp.maximum(s0, s1))], axis=-1)
  mom_visc = l_ang * (ang_drag[:, None] * II +
                      slender[:, None] * (I_max[:, None] - II))
  drag_lin = beta * lin_visc_f + rho * lin_speed * (
      A_proj * blunt + slender * (A_max - A_proj))
  drag_ang = beta * lin_visc_t + rho * jnp.linalg.norm(mom_visc, axis=-1)
  trq = trq - drag_ang[:, None] * l_ang
  frc = frc - drag_lin[:, None] * l_lin

  coef = gf[:, 0]
  frc = frc * coef[:, None]
  trq = trq * coef[:, None]
  frc_w = jnp.einsum('nij,nj->ni', R, frc)
  trq_w = jnp.einsum('nij,nj->ni', R, trq)

  # wrench at geom position -> per-body wrench about the root CoM frame
  trq_root = trq_w + jnp.cross(gpos - root_com, frc_w)
  cfrc = jnp.zeros((m.nbody, 6), dtype)
  cfrc = cfrc.at[b].add(jnp.concatenate([trq_root, frc_w], axis=-1))
  ds = jnp.asarray(m.tree.dof_subtree_mask, dtype)
  return jnp.sum((ds @ cfrc) * d.cdof, axis=-1)


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
      ], axis=-1) / s[:, None] * 6.0, 1e-12))  # full box side
  # (reference passive.py:502: box_i = sqrt(6*(I_j+I_k-I_i)/mass))

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
  # bodies on the ellipsoid model skip the inertia-box forces
  keep = jnp.asarray(~_ellipsoid_bodies(m), dtype)[:, None]
  frc = frc * keep
  trq = trq * keep
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
    if m.nflex:
      dsbl_damper = bool(dsbl & types.DisableBit.DAMPER)
      qfrc_spring = qfrc_spring + flex_elasticity(m, d, dsbl_damper)
      fb_s, fb_d = flex_bending(m, d, dsbl_damper)
      qfrc_spring = qfrc_spring + fb_s
      _flex_bend_damper = fb_d
    else:
      _flex_bend_damper = None
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
    if m.nflex and _flex_bend_damper is not None:
      qfrc_damper = qfrc_damper + _flex_bend_damper
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
    if np.any(_ellipsoid_bodies(m)):
      qfrc_fluid = qfrc_fluid + _fluid_ellipsoid(m, d)
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

  d = d.replace(
      qfrc_spring=qfrc_spring,
      qfrc_damper=qfrc_damper,
      qfrc_gravcomp=qfrc_gravcomp,
      qfrc_fluid=qfrc_fluid,
      qfrc_passive=qfrc_passive,
  )
  if m.callback is not None and m.callback.passive:
    d = m.callback.passive(m, d)  # reference: passive.py:1413
  return d


# --------------------------------------------------------------------- flex

# element-local edge -> vertex-pair tables (reference: passive.py:640)
_FLEX_ELEM_EDGES = {
    1: np.array([[0, 1]]),
    2: np.array([[1, 2], [2, 0], [0, 1]]),
    3: np.array([[0, 1], [1, 2], [2, 0], [2, 3], [0, 3], [1, 3]]),
}


def _flex_vert_scatter(m, f_vert, dtype):
  """Scatter (nflexvert, 3) world forces onto dofs -> (nv,).

  Particle vertices add onto their own 3 slide dofs; interpolated
  (trilinear) vertices distribute with the static node weights
  (qfrc_node += w * f_vert — the transpose of the vertex kinematics).
  Particle rows with dof -1 scatter into a scratch row past nv.
  """
  dof = np.asarray(m.flex_vert_dofadr).copy()
  pad = dof < 0
  dof[pad] = m.nv  # scratch slot (trimmed below)
  qfrc = jnp.zeros((m.nv + 1,), dtype)
  idx = np.stack([dof, dof + 1, dof + 2], axis=-1)
  idx[pad] = m.nv
  qfrc = qfrc.at[idx.reshape(-1)].add(f_vert.reshape(-1))
  if m.flex_iv_ids is not None:
    W = jnp.asarray(m.flex_iv_W, dtype)  # (ni, 8)
    fv = f_vert[m.flex_iv_ids]  # (ni, 3)
    contrib = W[:, :, None] * fv[:, None, :]  # (ni, 8, 3)
    didx = np.stack([m.flex_iv_dof + a for a in range(3)],
                    axis=-1)  # (ni, 8, 3)
    qfrc = qfrc.at[didx.reshape(-1)].add(contrib.reshape(-1))
  return qfrc[:m.nv]


def _flex_vert_vel(m, d):
  """(nflexvert, 3) vertex velocities."""
  dof = np.asarray(m.flex_vert_dofadr)
  v = jnp.stack([d.qvel[np.maximum(dof, 0) + k] for k in range(3)],
                axis=-1)
  if m.flex_iv_ids is not None:
    W = jnp.asarray(m.flex_iv_W, d.qvel.dtype)
    node_v = jnp.stack([d.qvel[m.flex_iv_dof + a] for a in range(3)],
                       axis=-1)
    v = v.at[m.flex_iv_ids].set(jnp.einsum('nk,nki->ni', W, node_v))
  return v


def flex_elasticity(m: types.Model, d: types.Data, dsbl_damper: bool):
  """Element elasticity forces (reference: passive.py:593
  `_flex_elasticity`): quadratic energy in squared edge lengths with a
  per-element metric (the 21-coefficient upper triangle)."""
  dtype = d.qpos.dtype
  f_vert = jnp.zeros((m.nflexvert, 3), dtype)
  qfrc_interp = None
  if m.flex_inode_dof is not None:
    qfrc_interp = _flex_interp_elasticity(m, d, dsbl_damper, dtype)
  for fi in range(m.nflex):
    if int(m.flex_stiffnessadr[fi]) < 0 or int(m.flex_interp[fi]) != 0:
      continue
    dim = int(m.flex_dim[fi])
    nvert = dim + 1
    eedges = _FLEX_ELEM_EDGES[dim]
    nedge = len(eedges)
    nelem = int(m.flex_elemnum[fi])
    vbase = int(m.flex_vertadr[fi])
    ebase = int(m.flex_edgeadr[fi])
    elems = np.asarray(m.flex_elem)[
        int(m.flex_elemdataadr[fi]):][:nelem * nvert].reshape(nelem, nvert)
    elemedge = np.asarray(m.flex_elemedge)[
        int(m.flex_elemedgeadr[fi]):][:nelem * nedge].reshape(nelem, nedge)

    # per-element metric from the packed upper triangle (21 slots/elem)
    tri = np.zeros((nedge, nedge), np.int32)
    k = 0
    for a in range(nedge):
      for b in range(a, nedge):
        tri[a, b] = tri[b, a] = k
        k += 1
    sadr = int(m.flex_stiffnessadr[fi])
    stiff = m.flex_stiffness[sadr:sadr + nelem * 21].reshape(nelem, 21)
    metric = stiff[:, tri.reshape(-1)].reshape(nelem, nedge, nedge)

    l = d.flexedge_length[ebase + elemedge]  # (nelem, nedge)
    l0 = m.flexedge_length0[ebase + elemedge]
    vel = d.flexedge_velocity[ebase + elemedge]
    h = m.opt.timestep.astype(dtype)
    elong = l * l - l0 * l0
    if not dsbl_damper:
      kD = m.flex_damping[fi] / jnp.maximum(h, 1e-12)
      prev = l - vel * h
      elong = elong + (l * l - prev * prev) * kD

    t = jnp.einsum('ne,nef->nf', elong, metric)  # (nelem, nedge)
    xv = d.flexvert_xpos
    ga = xv[vbase + elems[:, eedges[:, 0]]]  # (nelem, nedge, 3)
    gb = xv[vbase + elems[:, eedges[:, 1]]]
    grad = ga - gb
    fa = -t[:, :, None] * grad  # force on vert a of each elem edge
    fb = t[:, :, None] * grad
    ia = (vbase + elems[:, eedges[:, 0]]).reshape(-1)
    ib = (vbase + elems[:, eedges[:, 1]]).reshape(-1)
    f_vert = f_vert.at[ia].add(fa.reshape(-1, 3))
    f_vert = f_vert.at[ib].add(fb.reshape(-1, 3))
  out = _flex_vert_scatter(m, f_vert, dtype)
  if qfrc_interp is not None:
    out = out + qfrc_interp
  return out


def _polar_quat(F, dtype):
  """Rotation of the polar decomposition of F (nif, 3, 3) as quats
  (w, x, y, z) — fixed-iteration masked version of the reference's
  mat33_to_quat_polar (support.py:68)."""
  from mujoco_warp_tpu.ops import math as jmath
  nif = F.shape[0]
  q0 = jnp.zeros((nif, 4), dtype).at[:, 0].set(1.0)

  def body(i, carry):
    q, done = carry
    rot = jmath.quat_to_mat(q)  # (nif, 3, 3)
    # columns of rot vs columns of F
    omega = jnp.zeros((nif, 3), dtype)
    denom = jnp.zeros((nif,), dtype)
    for c in range(3):
      rc = rot[:, :, c]
      fc = F[:, :, c]
      omega = omega + jnp.cross(rc, fc)
      denom = denom + jnp.sum(rc * fc, -1)
    omega = omega / (jnp.abs(denom) + 1e-10)[:, None]
    w = jnp.linalg.norm(omega, axis=-1)
    done = done | (w < 1e-6)
    axis = omega / jnp.maximum(w, 1e-12)[:, None]
    half = 0.5 * w
    qrot = jnp.concatenate(
        [jnp.cos(half)[:, None], axis * jnp.sin(half)[:, None]], axis=-1)
    qn = jmath.mul_quat(qrot, q)
    qn = qn / jnp.maximum(jnp.linalg.norm(qn, axis=-1, keepdims=True),
                          1e-12)
    q = jnp.where(done[:, None], q, qn)
    return q, done

  q, _ = jax.lax.fori_loop(0, 50, body,
                           (q0, jnp.zeros((nif,), bool)))
  return q


def _flex_interp_elasticity(m, d, dsbl_damper, dtype):
  """Corotational cell elasticity for interpolated (trilinear) flexes
  (reference: passive.py:822 `_flex_passive_interp`): per cell, rotate
  node positions/velocities into the corotational frame (polar
  decomposition of the deformation gradient at the cell center), apply
  the 24x24 cell stiffness, rotate forces back, scatter to node dofs."""
  from mujoco_warp_tpu.ops import math as jmath
  x = d.xpos[m.flex_inode_body]  # (nif, 8, 3)
  v = jnp.stack([d.qvel[m.flex_inode_dof + a] for a in range(3)],
                axis=-1)  # (nif, 8, 3)
  # deformation gradient at the cell center: F[r, c] = sum_k x_k[r]·G[k,c]
  G = np.zeros((8, 3))
  for k in range(8):
    li, lj, lk = (k >> 2) & 1, (k >> 1) & 1, k & 1
    G[k] = [(1.0 if li else -1.0) * 0.25,
            (1.0 if lj else -1.0) * 0.25,
            (1.0 if lk else -1.0) * 0.25]
  F = jnp.einsum('nkr,kc->nrc', x, jnp.asarray(G, dtype))
  q = _polar_quat(F, dtype)
  R = jmath.quat_to_mat(q)  # (nif, 3, 3) world <- corotational

  displ = jnp.einsum('nji,nkj->nki', R, x) - m.flex_inode0  # Rᵀx - x0
  frc_s = jnp.einsum('nij,nj->ni', m.flex_icell_K,
                     displ.reshape(-1, 24))
  f_nodes = jnp.einsum('nij,nkj->nki', R, frc_s.reshape(-1, 8, 3))
  if not dsbl_damper:
    vrot = jnp.einsum('nji,nkj->nki', R, v)
    frc_d = jnp.einsum('nij,nj->ni', m.flex_icell_K, vrot.reshape(-1, 24))
    f_nodes = f_nodes + (m.flex_idamping[:, None, None] *
                         jnp.einsum('nij,nkj->nki', R,
                                    frc_d.reshape(-1, 8, 3)))
  # scatter onto the node slide dofs
  qfrc = jnp.zeros((m.nv,), dtype)
  idx = np.stack([m.flex_inode_dof + a for a in range(3)], axis=-1)
  return qfrc.at[idx.reshape(-1)].add(f_nodes.reshape(-1))


def flex_bending(m: types.Model, d: types.Data, dsbl_damper: bool):
  """Cloth bending forces (reference: passive.py:711 `_flex_bending`):
  per edge-with-flap, a precomputed 4x4 quadratic form (16 coeffs) plus a
  nonlinear cross-product term (17th coeff).  Returns (spring, damper)
  generalized forces."""
  dtype = d.qpos.dtype
  fs_vert = jnp.zeros((m.nflexvert, 3), dtype)
  fd_vert = jnp.zeros((m.nflexvert, 3), dtype)
  any_damp = False
  for fi in range(m.nflex):
    badr = int(m.flex_bendingadr[fi])
    if badr < 0 or int(m.flex_dim[fi]) != 2:
      continue
    ebase = int(m.flex_edgeadr[fi])
    nfe = int(m.flex_edgenum[fi])
    vbase = int(m.flex_vertadr[fi])
    flap = np.asarray(m.flex_edgeflap)[ebase:ebase + nfe]
    edge = np.asarray(m.flex_edge)[ebase:ebase + nfe]
    sel = np.nonzero(flap[:, 1] >= 0)[0]
    if not len(sel):
      continue
    v = np.concatenate([edge[sel], flap[sel]], axis=-1) + vbase  # (ns, 4)
    coefs = m.flex_bending[badr:badr + nfe * 17].reshape(nfe, 17)[sel]
    A = coefs[:, :16].reshape(-1, 4, 4)
    c16 = coefs[:, 16]

    xs = d.flexvert_xpos[v]  # (ns, 4, 3)
    ed0 = xs[:, 1] - xs[:, 0]
    ed1 = xs[:, 2] - xs[:, 0]
    ed2 = xs[:, 3] - xs[:, 0]
    f1 = jnp.cross(ed1, ed2)
    f2 = jnp.cross(ed2, ed0)
    f3 = jnp.cross(ed0, ed1)
    f0 = -(f1 + f2 + f3)
    frc_nl = jnp.stack([f0, f1, f2, f3], axis=1)  # (ns, 4, 3)

    fs = -(jnp.einsum('nij,njx->nix', A, xs) + c16[:, None, None] * frc_nl)
    fs_vert = fs_vert.at[v.reshape(-1)].add(fs.reshape(-1, 3))

    damp = types.concrete_or(m.flex_damping,
                             lambda a: float(a[fi]) > 0.0, True)
    if not dsbl_damper and damp:
      any_damp = True
      vels = _flex_vert_vel(m, d)[v]  # (ns, 4, 3)
      fd = -jnp.einsum('nij,njx->nix', A, vels) *           m.flex_damping[fi]
      fd_vert = fd_vert.at[v.reshape(-1)].add(fd.reshape(-1, 3))
  qs = _flex_vert_scatter(m, fs_vert, dtype)
  qd = _flex_vert_scatter(m, fd_vert, dtype) if any_damp else       jnp.zeros((m.nv,), dtype)
  return qs, qd
