"""Smooth (unconstrained) dynamics: FK, CoM quantities, CRB, RNE, factor/solve.

TPU-native counterpart of reference mujoco_warp/_src/smooth.py.  Design notes:

* ``kinematics`` processes bodies level-by-level (static levels from
  ``put_model``), each level fully vectorized; joint handling is specialized
  at trace time by static joint-type tables (reference: smooth.py:448 runs
  one thread per tree branch instead).
* Everything downstream of FK is expressed as dense masked matrix products
  against static ancestor/subtree masks, so CoM positions, CRB composite
  inertias, the mass matrix, body velocities and the RNE bias force all map
  onto the MXU (reference: smooth.py:825/1080/1500/2259 are scalar warp
  kernels with per-body loops).
* The mass matrix is dense ``(nv, nv)`` and factorized with a batched dense
  Cholesky (reference: smooth.py:1341 mixes scalar/tile/sparse-LDL paths).

All functions take a single-world ``Data`` and are vmapped by the caller.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import types
from mujoco_warp_tpu.ops import math

_JT = types.JointType


def _levels_max_jntnum(m: types.Model, ids: np.ndarray) -> int:
  return int(m.body_jntnum[ids].max()) if ids.size else 0


def kinematics(m: types.Model, d: types.Data) -> types.Data:
  """Forward kinematics (reference: smooth.py:448 `kinematics`)."""
  dtype = d.qpos.dtype
  nb = m.nbody
  qpos = d.qpos

  xpos = jnp.zeros((nb, 3), dtype)
  xquat = jnp.zeros((nb, 4), dtype).at[:, 0].set(1.0)
  xanchor = jnp.zeros((m.njnt, 3), dtype)
  xaxis = jnp.zeros((m.njnt, 3), dtype)

  for ids in m.tree.body_levels:
    par = m.body_parentid[ids]
    pos = xpos[par] + math.rot_vec_quat(m.body_pos[ids], xquat[par])
    quat = math.mul_quat(xquat[par], m.body_quat[ids])

    for k in range(_levels_max_jntnum(m, ids)):
      sub = np.nonzero(m.body_jntnum[ids] > k)[0]
      jids_all = m.body_jntadr[ids[sub]] + k
      for jt in np.unique(m.jnt_type[jids_all]):
        sel = m.jnt_type[jids_all] == jt
        s2 = sub[sel]  # indices into this level's local arrays
        jj = jids_all[sel]  # joint ids
        qadr = m.jnt_qposadr[jj]
        if jt == _JT.FREE:
          p = qpos[qadr[:, None] + np.arange(3)]
          q = math.normalize_quat(qpos[qadr[:, None] + np.arange(3, 7)])
          pos = pos.at[s2].set(p)
          quat = quat.at[s2].set(q)
          xanchor = xanchor.at[jj].set(p)
          xaxis = xaxis.at[jj].set(
              jnp.broadcast_to(jnp.array([0, 0, 1], dtype), (len(jj), 3)))
        elif jt == _JT.BALL:
          anchor = pos[s2] + math.rot_vec_quat(m.jnt_pos[jj], quat[s2])
          axis = math.rot_vec_quat(m.jnt_axis[jj], quat[s2])
          qloc = math.normalize_quat(qpos[qadr[:, None] + np.arange(4)])
          qnew = math.mul_quat(quat[s2], qloc)
          pnew = anchor - math.rot_vec_quat(m.jnt_pos[jj], qnew)
          pos = pos.at[s2].set(pnew)
          quat = quat.at[s2].set(qnew)
          xanchor = xanchor.at[jj].set(anchor)
          xaxis = xaxis.at[jj].set(axis)
        elif jt == _JT.SLIDE:
          axis = math.rot_vec_quat(m.jnt_axis[jj], quat[s2])
          anchor = pos[s2] + math.rot_vec_quat(m.jnt_pos[jj], quat[s2])
          pnew = pos[s2] + axis * (qpos[qadr] - m.qpos0[qadr])[:, None]
          pos = pos.at[s2].set(pnew)
          xanchor = xanchor.at[jj].set(anchor)
          xaxis = xaxis.at[jj].set(axis)
        else:  # HINGE
          anchor = pos[s2] + math.rot_vec_quat(m.jnt_pos[jj], quat[s2])
          axis = math.rot_vec_quat(m.jnt_axis[jj], quat[s2])
          qloc = math.axis_angle_to_quat(
              m.jnt_axis[jj], qpos[qadr] - m.qpos0[qadr])
          qnew = math.mul_quat(quat[s2], qloc)
          pnew = anchor - math.rot_vec_quat(m.jnt_pos[jj], qnew)
          pos = pos.at[s2].set(pnew)
          quat = quat.at[s2].set(qnew)
          xanchor = xanchor.at[jj].set(anchor)
          xaxis = xaxis.at[jj].set(axis)

    quat = math.normalize_quat(quat)
    xpos = xpos.at[ids].set(pos)
    xquat = xquat.at[ids].set(quat)

  # mocap override
  if m.nmocap:
    mocap_bodies = np.nonzero(m.body_mocapid >= 0)[0]
    mid = m.body_mocapid[mocap_bodies]
    xpos = xpos.at[mocap_bodies].set(d.mocap_pos[mid])
    xquat = xquat.at[mocap_bodies].set(math.normalize_quat(d.mocap_quat[mid]))

  xmat = math.quat_to_mat(xquat)
  xipos = xpos + math.rot_vec_quat(m.body_ipos, xquat)
  ximat = math.quat_to_mat(math.mul_quat(xquat, m.body_iquat))

  # real geoms only: geom_bodyid is flex-extended (pseudo vertex spheres,
  # ids >= ngeom) but pose tables stay (ngeom,); the collision driver
  # appends vertex poses from flexvert_xpos at narrowphase time
  gb = m.geom_bodyid[:m.ngeom]
  geom_xpos = xpos[gb] + math.rot_vec_quat(m.geom_pos, xquat[gb])
  geom_xmat = math.quat_to_mat(math.mul_quat(xquat[gb], m.geom_quat))
  if m.nsite:
    sb = m.site_bodyid
    site_xpos = xpos[sb] + math.rot_vec_quat(m.site_pos, xquat[sb])
    site_xmat = math.quat_to_mat(math.mul_quat(xquat[sb], m.site_quat))
  else:
    site_xpos, site_xmat = d.site_xpos, d.site_xmat

  return d.replace(
      xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
      xanchor=xanchor, xaxis=xaxis, geom_xpos=geom_xpos, geom_xmat=geom_xmat,
      site_xpos=site_xpos, site_xmat=site_xmat)


def com_pos(m: types.Model, d: types.Data) -> types.Data:
  """Subtree CoM, spatial inertia, dof axes (reference: smooth.py:825).

  Subtree sums are one masked matmul against the static subtree mask.
  """
  mass = m.body_mass
  # subtree_com[i] = sum_{j in subtree(i)} mass_j * xipos_j / subtreemass_i
  wpos = mass[:, None] * d.xipos
  sub = jnp.asarray(m.tree.subtree_mask, d.qpos.dtype)
  subtree_com = sub @ wpos / jnp.maximum(m.body_subtreemass, 1e-12)[:, None]

  # spatial inertia of each body about its tree root's subtree CoM
  root_com = subtree_com[m.body_rootid]
  offset = d.xipos - root_com
  cinert = math.inert_matrix(m.body_inertia, mass, offset, d.ximat)

  # cdof: per-dof 6D motion axes in the com-rooted frame
  cdof = jnp.zeros((m.nv, 6), d.qpos.dtype)
  jtypes = m.jnt_type
  for jt in np.unique(jtypes):
    jids = np.nonzero(jtypes == jt)[0]
    dadr = m.jnt_dofadr[jids]
    bid = m.jnt_bodyid[jids]
    com = root_com[bid]
    if jt == _JT.FREE:
      eye3 = jnp.eye(3, dtype=d.qpos.dtype)
      # translation dofs: pure linear
      trans = jnp.concatenate(
          [jnp.zeros((len(jids), 3, 3), d.qpos.dtype),
           jnp.broadcast_to(eye3, (len(jids), 3, 3))], axis=-1)
      # rotation dofs: body-frame axes (xmat columns) through the body origin
      off = d.xpos[bid] - com  # (n, 3)
      axes = jnp.swapaxes(d.xmat[bid], -1, -2)  # (n, 3, 3) rows = axes
      lin = jnp.cross(off[:, None, :], axes)
      rot = jnp.concatenate([axes, lin], axis=-1)
      cdof = cdof.at[dadr[:, None] + np.arange(3)].set(trans)
      cdof = cdof.at[dadr[:, None] + np.arange(3, 6)].set(rot)
    elif jt == _JT.BALL:
      # axes are columns of xmat (body-frame axes in world coords)
      axes = jnp.swapaxes(d.xmat[bid], -1, -2)  # (n, 3, 3) rows = axes
      off = d.xanchor[jids] - com
      lin = jnp.cross(off[:, None, :], axes)
      rot = jnp.concatenate([axes, lin], axis=-1)
      cdof = cdof.at[dadr[:, None] + np.arange(3)].set(rot)
    elif jt == _JT.SLIDE:
      axis = d.xaxis[jids]
      v = jnp.concatenate([jnp.zeros_like(axis), axis], axis=-1)
      cdof = cdof.at[dadr].set(v)
    else:  # HINGE
      axis = d.xaxis[jids]
      off = d.xanchor[jids] - com
      lin = jnp.cross(off, axis)
      v = jnp.concatenate([axis, lin], axis=-1)
      cdof = cdof.at[dadr].set(v)

  return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def camlight(m: types.Model, d: types.Data) -> types.Data:
  """Camera and light frames (reference: smooth.py:985 `camlight`).

  Modes (mjtCamLight): FIXED=0 (body-attached), TRACK=1 (fixed world
  orientation, offset from body pos), TRACKCOM=2 (offset from subtree com),
  TARGETBODY=3 / TARGETBODYCOM=4 (aim at a body).
  """
  if not m.ncam and not m.nlight:
    return d
  dtype = d.qpos.dtype

  def frames(mode, bodyid, targetid, pos, quat_or_dir, poscom0, pos0,
             is_cam):
    b = bodyid
    xpos = d.xpos[b] + math.rot_vec_quat(pos, d.xquat[b])
    if is_cam:
      xmat = math.quat_to_mat(math.mul_quat(d.xquat[b], quat_or_dir))
    else:
      xdir = math.rot_vec_quat(quat_or_dir, d.xquat[b])

    track = mode == 1
    trackcom = mode == 2
    if np.any(track | trackcom):
      tp = d.xpos[b] + pos0
      tc = d.subtree_com[b] + poscom0
      sel = jnp.asarray(track)[:, None]
      selc = jnp.asarray(trackcom)[:, None]
      xpos = jnp.where(sel, tp, jnp.where(selc, tc, xpos))
      if is_cam:
        xmat = jnp.where(jnp.asarray(track | trackcom)[:, None, None],
                         m.cam_mat0, xmat)
      else:
        xdir = jnp.where(jnp.asarray(track | trackcom)[:, None],
                         m.light_dir0, xdir)

    target = (mode == 3) | (mode == 4)
    if np.any(target):
      tid = np.maximum(targetid, 0)
      tpos = jnp.where(jnp.asarray(mode == 4)[:, None],
                       d.subtree_com[tid], d.xpos[tid])
      if is_cam:
        # aim -z at target, z = normalize(xpos - target)
        z = xpos - tpos
        z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True),
                            1e-12)
        up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], dtype),
                              z.shape)
        x = jnp.cross(up, z)
        xn = jnp.linalg.norm(x, axis=-1, keepdims=True)
        x = jnp.where(xn > 1e-9, x / jnp.maximum(xn, 1e-12),
                      jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0],
                                                   dtype), z.shape))
        y = jnp.cross(z, x)
        tmat = jnp.stack([x, y, z], axis=-1)
        xmat = jnp.where(jnp.asarray(target)[:, None, None], tmat, xmat)
      else:
        dirv = tpos - xpos
        dirv = dirv / jnp.maximum(
            jnp.linalg.norm(dirv, axis=-1, keepdims=True), 1e-12)
        xdir = jnp.where(jnp.asarray(target)[:, None], dirv, xdir)
    return (xpos, xmat) if is_cam else (xpos, xdir)

  out = {}
  if m.ncam:
    cp, cmat = frames(m.cam_mode, m.cam_bodyid, m.cam_targetbodyid,
                      m.cam_pos, m.cam_quat, m.cam_poscom0, m.cam_pos0,
                      True)
    out.update(cam_xpos=cp, cam_xmat=cmat)
  if m.nlight:
    lp, ld = frames(m.light_mode, m.light_bodyid, m.light_targetbodyid,
                    m.light_pos, m.light_dir, m.light_poscom0,
                    m.light_pos0, False)
    out.update(light_xpos=lp, light_xdir=ld)
  return d.replace(**out)


def crb(m: types.Model, d: types.Data) -> types.Data:
  """Composite rigid body inertia → mass matrix (smooth.py:1080).

  crb[i] = Σ_{j ∈ subtree(i)} cinert[j] — a matmul against the subtree mask.
  M[i, j] = cdof_j · (crb[body_i] cdof_i) on ancestor pairs — dense matmul
  masked by the static ancestor mask, then symmetrized.  MXU-shaped.

  With ``m.m_blocked`` the mass matrix is built as per-tree blocks
  (``qM_blk``) instead of dense (nv, nv): the dense build is O(nv²) and
  its factor O(nv³), which detonates on particle systems (cloth: 900
  independent 3-dof trees → block work is O(ntree·w³)).  Reference
  analog: per-tree M-block layout io.py:191-241.
  """
  dtype = d.qpos.dtype
  sub = jnp.asarray(m.tree.subtree_mask, dtype)
  crb_ = (sub @ d.cinert.reshape(m.nbody, 36)).reshape(m.nbody, 6, 6)

  f = jnp.einsum('vij,vj->vi', crb_[m.dof_bodyid], d.cdof)
  if m.m_blocked:
    blks = []
    for w, rows, ancm in m.tree.block_classes:
      cd = d.cdof[rows]  # (t, w, 6)
      fc = f[rows]
      low = jnp.einsum('twi,tvi->twv', fc, cd) * jnp.asarray(ancm, dtype)
      eye = jnp.eye(w, dtype=bool)
      Mb = low + jnp.swapaxes(low, 1, 2) - jnp.where(eye, low, 0.0)
      Mb = Mb + jnp.eye(w, dtype=dtype) * m.dof_armature[rows][:, :, None]
      blks.append(Mb)
    return d.replace(crb=crb_, qM_blk=tuple(blks))
  mask = jnp.asarray(m.tree.ancestor_mask, dtype)  # [i,j]: j anc-or-self of i
  lower = (f @ d.cdof.T) * mask
  qM = lower + lower.T - jnp.diag(jnp.diag(lower))
  qM = qM + jnp.diag(m.dof_armature)
  return d.replace(crb=crb_, qM=qM)


def factor_m(m: types.Model, d: types.Data) -> types.Data:
  """Cholesky factorization of the mass matrix (reference: smooth.py:1341)."""
  if m.m_blocked:
    return d.replace(qLD_blk=tuple(
        jnp.linalg.cholesky(Mb) for Mb in d.qM_blk))
  qLD = jax.scipy.linalg.cholesky(d.qM, lower=True)
  return d.replace(qLD=qLD)


def solve_m(m: types.Model, d: types.Data, x: jax.Array) -> jax.Array:
  """Solve M y = x using the dense factor (reference: smooth.py:3212)."""
  if m.m_blocked:
    y = jnp.zeros((m.nv,), x.dtype)
    for Lb, (w, rows, _) in zip(d.qLD_blk, m.tree.block_classes):
      sol = jax.vmap(math.chol_solve)(Lb, x[rows])
      y = y.at[rows.reshape(-1)].set(sol.reshape(-1))
    return y
  return math.chol_solve(d.qLD, x)


def mul_m(m: types.Model, d: types.Data, x: jax.Array) -> jax.Array:
  """M @ x under either mass-matrix representation (support.py:218)."""
  if m.m_blocked:
    y = jnp.zeros((m.nv,), x.dtype)
    for Mb, (w, rows, _) in zip(d.qM_blk, m.tree.block_classes):
      y = y.at[rows.reshape(-1)].set(
          jnp.einsum('twv,tv->tw', Mb, x[rows]).reshape(-1))
    return y
  return d.qM @ x


def solve_m_damped(m: types.Model, d: types.Data, rhs: jax.Array,
                   dt) -> jax.Array:
  """Solve (M + dt·diag(damping)) y = rhs (Euler implicit damping).

  Dense callers factor inline (forward.euler); this is the blocked-mode
  entry — per-tree block factor of the damped blocks.
  """
  assert m.m_blocked
  y = jnp.zeros((m.nv,), rhs.dtype)
  for Mb, (w, rows, _) in zip(d.qM_blk, m.tree.block_classes):
    damp = m.dof_damping[rows]  # (t, w)
    Md = Mb + jnp.eye(w, dtype=Mb.dtype) * (dt * damp)[:, :, None]
    L = jnp.linalg.cholesky(Md)
    sol = jax.vmap(math.chol_solve)(L, rhs[rows])
    y = y.at[rows.reshape(-1)].set(sol.reshape(-1))
  return y


def dense_m(m: types.Model, d: types.Data) -> jax.Array:
  """Scatter qM_blk into a dense (nv, nv) matrix (cold paths only)."""
  if not m.m_blocked:
    return d.qM
  M = jnp.zeros((m.nv, m.nv), d.qpos.dtype)
  for Mb, (w, rows, _) in zip(d.qM_blk, m.tree.block_classes):
    M = M.at[rows[:, :, None], rows[:, None, :]].set(Mb)
  return M


def com_vel(m: types.Model, d: types.Data) -> types.Data:
  """Body velocities and cdof time-derivatives (reference: smooth.py:2259).

  cvel[b] = Σ_{dofs i ≤ b} cdof_i qvel_i  (masked matmul), and
  cdof_dot_i = (partial velocity before dof i) × cdof_i where the partial
  velocity uses the static ``cdofdot_mask`` (strict ancestors, plus the
  translational dofs of the same free joint for its rotational dofs).
  """
  dtype = d.qpos.dtype
  cdof_qvel = d.cdof * d.qvel[:, None]  # (nv, 6)
  bd = jnp.asarray(m.tree.body_dof_mask, dtype)  # (nbody, nv)
  cvel = bd @ cdof_qvel
  cm = jnp.asarray(m.tree.cdofdot_mask, dtype)  # (nv, nv)
  vel_before = cm @ cdof_qvel  # (nv, 6)
  cdof_dot = math.motion_cross(vel_before, d.cdof)
  return d.replace(cvel=cvel, cdof_dot=cdof_dot)


def rne(m: types.Model, d: types.Data) -> types.Data:
  """Recursive Newton-Euler bias force (reference: smooth.py:1500).

  With all quantities in a common frame, the forward recursion collapses to
  masked matmuls:
    cacc[b]  = -gravity + Σ_{dofs i ≤ b} cdof_dot_i qvel_i
    cfrc[b]  = cinert_b cacc_b + cvel_b ×* (cinert_b cvel_b)
    qfrc_bias_i = cdof_i · Σ_{b ∈ subtree(body_i)} cfrc_b
  """
  dtype = d.qpos.dtype
  bd = jnp.asarray(m.tree.body_dof_mask, dtype)
  cacc0 = jnp.concatenate(
      [jnp.zeros((3,), dtype), -m.opt.gravity.astype(dtype)])
  if m.opt.disableflags & types.DisableBit.GRAVITY:
    cacc0 = jnp.zeros((6,), dtype)
  cacc = cacc0[None, :] + bd @ (d.cdof_dot * d.qvel[:, None])
  cacc = cacc.at[0].set(jnp.zeros((6,), dtype))  # world body

  iv = jnp.einsum('bij,bj->bi', d.cinert, d.cvel)
  ia = jnp.einsum('bij,bj->bi', d.cinert, cacc)
  cfrc = ia + math.motion_cross_force(d.cvel, iv)

  ds = jnp.asarray(m.tree.dof_subtree_mask, dtype)  # (nv, nbody)
  fsum = ds @ cfrc  # (nv, 6)
  qfrc_bias = jnp.sum(fsum * d.cdof, axis=-1)
  return d.replace(qfrc_bias=qfrc_bias)


def rne_postconstraint(m: types.Model, d: types.Data) -> types.Data:
  """Post-constraint body accelerations and interaction forces.

  Counterpart of reference smooth.py:1742 (mj_rnePostConstraint): computes
  cacc (com-frame body acceleration incl. constraint forces), cfrc_ext
  (external wrenches: xfrc_applied + contact + connect/weld forces) and
  cfrc_int (internal force transmitted from the parent), all as masked
  matmuls over the static tree masks.
  """
  dtype = d.qpos.dtype
  nb = m.nbody

  # ---- cfrc_ext: applied Cartesian wrenches in the com-rooted frame
  # xfrc rows are (force, torque) at body CoM (world frame)
  force = d.xfrc_applied[:, :3]
  torque = d.xfrc_applied[:, 3:]
  offset = d.xipos - d.subtree_com[m.body_rootid]
  cfrc_ext = jnp.concatenate(
      [torque + jnp.cross(offset, force), force], axis=-1)

  # contact forces (world frame at contact pos) onto both geom bodies
  if m.ncon and not (m.opt.disableflags & types.DisableBit.CONTACT):
    con = d.contact
    forces = _contact_forces(m, d)  # (ncon, 6) [torque; force] world @ pos
    gb = jnp.asarray(m.geom_bodyid)
    b1 = gb[con.geom1]
    b2 = gb[con.geom2]
    rootid = jnp.asarray(m.body_rootid)
    active = (con.dist < con.includemargin)[:, None]
    # wrench acts +on body2 (J = jac2 - jac1), -on body1; translate to each
    # body's com-rooted frame origin
    for bodies, sign in ((b2, 1.0), (b1, -1.0)):
      off = con.pos - d.subtree_com[rootid[bodies]]
      ang = forces[:, :3] + jnp.cross(off, forces[:, 3:])
      w = sign * jnp.where(active,
                           jnp.concatenate([ang, forces[:, 3:]], -1), 0.0)
      cfrc_ext = cfrc_ext + jnp.zeros((nb, 6), dtype).at[bodies].add(w)
  # (connect/weld equality reaction forces omitted for now; negligible for
  #  force/torque sensors unless welds are present — tracked for parity)

  # ---- cacc: forward accumulation (masked matmul)
  cacc0 = jnp.concatenate(
      [jnp.zeros((3,), dtype), -m.opt.gravity.astype(dtype)])
  if m.opt.disableflags & types.DisableBit.GRAVITY:
    cacc0 = jnp.zeros((6,), dtype)
  bd = jnp.asarray(m.tree.body_dof_mask, dtype)
  cacc = cacc0[None, :] + bd @ (d.cdof_dot * d.qvel[:, None] +
                                d.cdof * d.qacc[:, None])
  cacc = cacc.at[0].set(jnp.zeros((6,), dtype))

  # ---- cfrc_int: backward accumulation over subtrees
  iv = jnp.einsum('bij,bj->bi', d.cinert, d.cvel)
  ia = jnp.einsum('bij,bj->bi', d.cinert, cacc)
  cfrc_body = ia + math.motion_cross_force(d.cvel, iv)
  sub = jnp.asarray(m.tree.subtree_mask, dtype)
  cfrc_int = sub @ (cfrc_body - cfrc_ext)
  cfrc_int = cfrc_int.at[0].set(jnp.zeros((6,), dtype))
  return d.replace(cacc=cacc, cfrc_int=cfrc_int, cfrc_ext=cfrc_ext)


def _contact_forces_local(m: types.Model, d: types.Data) -> jax.Array:
  """Contact-frame wrenches (force, torque) at each slot.

  Rows [fn, ft1, ft2, tn, tt1, tt2] per slot — counterpart of reference
  support.py:439 `contact_force` with to_world_frame=False.
  """
  dtype = d.qpos.dtype
  con = d.contact
  ncon = m.ncon
  out = jnp.zeros((ncon, 6), dtype)
  if not ncon:
    return out
  is_elliptic = m.opt.cone == types.ConeType.ELLIPTIC
  dims = np.asarray(con.dim)
  for dim in np.unique(dims):
    dim = int(dim)
    idx = np.nonzero(dims == dim)[0]
    adr = m.con_efc_address[idx]
    if dim == 1:
      fn = d.efc_force[adr]
      local = jnp.stack([fn] + [jnp.zeros_like(fn)] * 5, -1)
    elif is_elliptic:
      rows = jnp.stack([d.efc_force[adr + i] for i in range(dim)], -1)
      pad = [jnp.zeros_like(rows[:, 0])] * (6 - dim)
      local = jnp.concatenate([rows] + [p[:, None] for p in pad], -1)
    else:
      # pyramidal: normal = sum of all pyramid forces; tangent components
      # recovered as mu_i * (f+ - f-)
      nrow = 2 * (dim - 1)
      rows = jnp.stack([d.efc_force[adr + i] for i in range(nrow)], -1)
      fn = jnp.sum(rows, -1)
      fric = con.friction[idx]
      comps = [fn]
      for i in range(dim - 1):
        comps.append(fric[:, i] * (rows[:, 2 * i] - rows[:, 2 * i + 1]))
      comps += [jnp.zeros_like(fn)] * (6 - dim)
      local = jnp.stack(comps, -1)
    out = out.at[idx].set(local)
  return out


def _contact_forces(m: types.Model, d: types.Data) -> jax.Array:
  """World-frame contact wrenches (torque, force) at each contact point.

  Counterpart of reference support.py:439 `contact_force` for all slots.
  """
  dtype = d.qpos.dtype
  con = d.contact
  ncon = m.ncon
  out = jnp.zeros((ncon, 6), dtype)
  if not ncon:
    return out
  local = _contact_forces_local(m, d)
  # rotate (force in contact frame rows) to world: f_w = frame^T f_local
  frame = con.frame  # rows: n, t1, t2
  f_w = jnp.einsum('nij,ni->nj', frame, local[:, :3])
  t_w = jnp.einsum('nij,ni->nj', frame, local[:, 3:])
  return jnp.concatenate([t_w, f_w], -1)


_BIGW = 1e10


def _wrap_2d_circle(end, side, radius, dtype):
  """2D circle wrap (reference: util_misc.py:105 `wrap_circle`).

  end: (4,) two 2D points; side: (2,) or None.  Returns
  (wlen, pnt0 (2,), pnt1 (2,)) with wlen < 0 for no wrap.
  """
  end0 = end[0:2]
  end1 = end[2:4]
  sqlen0 = jnp.dot(end0, end0)
  sqlen1 = jnp.dot(end1, end1)
  sqrad = radius * radius
  no_wrap = (sqlen0 < sqrad) | (sqlen1 < sqrad) | (radius < 1e-15)

  dif = end1 - end0
  dd = jnp.dot(dif, dif)
  no_wrap |= dd < 1e-15
  a = jnp.clip(-jnp.dot(dif, end0) / jnp.maximum(dd, 1e-15), 0.0, 1.0)
  tmp = a * dif + end0
  if side is None:
    no_wrap |= jnp.dot(tmp, tmp) > sqrad
  else:
    no_wrap |= (jnp.dot(tmp, tmp) > sqrad) & (jnp.dot(side, tmp) >= 0.0)

  sqrt0 = jnp.sqrt(jnp.maximum(sqlen0 - sqrad, 0.0))
  sqrt1 = jnp.sqrt(jnp.maximum(sqlen1 - sqrad, 0.0))
  sl0 = jnp.maximum(sqlen0, 1e-15)
  sl1 = jnp.maximum(sqlen1, 1e-15)
  sol00 = jnp.stack([(end[0] * sqrad + radius * end[1] * sqrt0) / sl0,
                     (end[1] * sqrad - radius * end[0] * sqrt0) / sl0])
  sol01 = jnp.stack([(end[2] * sqrad - radius * end[3] * sqrt1) / sl1,
                     (end[3] * sqrad + radius * end[2] * sqrt1) / sl1])
  sol10 = jnp.stack([(end[0] * sqrad - radius * end[1] * sqrt0) / sl0,
                     (end[1] * sqrad + radius * end[0] * sqrt0) / sl0])
  sol11 = jnp.stack([(end[2] * sqrad + radius * end[3] * sqrt1) / sl1,
                     (end[3] * sqrad - radius * end[2] * sqrt1) / sl1])

  def seg_intersect(p1, p2, p3, p4):
    d1 = (p4[0] - p3[0]) * (p1[1] - p3[1]) - (p4[1] - p3[1]) * (p1[0] - p3[0])
    d2 = (p4[0] - p3[0]) * (p2[1] - p3[1]) - (p4[1] - p3[1]) * (p2[0] - p3[0])
    d3 = (p2[0] - p1[0]) * (p3[1] - p1[1]) - (p2[1] - p1[1]) * (p3[0] - p1[0])
    d4 = (p2[0] - p1[0]) * (p4[1] - p1[1]) - (p2[1] - p1[1]) * (p4[0] - p1[0])
    return (d1 * d2 < 0) & (d3 * d4 < 0)

  if side is None:
    t0 = sol00 - sol01
    good0 = -jnp.dot(t0, t0)
    t1 = sol10 - sol11
    good1 = -jnp.dot(t1, t1)
  else:
    t0 = sol00 + sol01
    t0 = t0 / jnp.maximum(jnp.linalg.norm(t0), 1e-15)
    good0 = jnp.dot(t0, side)
    t1 = sol10 + sol11
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-15)
    good1 = jnp.dot(t1, side)
  good0 = jnp.where(seg_intersect(end0, sol00, end1, sol01), -1e4, good0)
  good1 = jnp.where(seg_intersect(end0, sol10, end1, sol11), -1e4, good1)

  use0 = good0 > good1
  pnt0 = jnp.where(use0, sol00, sol10)
  pnt1 = jnp.where(use0, sol01, sol11)
  no_wrap |= seg_intersect(end0, pnt0, end1, pnt1)

  # arc length (reference: util_misc.py:78 `length_circle`)
  p0n = pnt0 / jnp.maximum(jnp.linalg.norm(pnt0), 1e-15)
  p1n = pnt1 / jnp.maximum(jnp.linalg.norm(pnt1), 1e-15)
  angle = jnp.arccos(jnp.clip(jnp.dot(p0n, p1n), -1.0, 1.0))
  cross = pnt0[1] * pnt1[0] - pnt0[0] * pnt1[1]
  flip = jnp.where(use0, cross < 0.0, cross > 0.0)
  angle = jnp.where(flip, 2.0 * jnp.pi - angle, angle)
  wlen = radius * angle
  return jnp.where(no_wrap, -1.0, wlen), pnt0, pnt1


def _wrap_2d_inside(end, radius, dtype, maxiter=20, zinit=1.0 - 1e-7,
                    tol=1e-6):
  """2D inside wrap (reference: util_misc.py:203 `wrap_inside`).

  The sidesite lies inside the wrapping circle, so the tendon is pushed
  against the circle from within and touches it at a single point (no
  arc, wlen = 0).  The touch point solves
  asin(A·z) + asin(B·z) − 2·asin(z) + G = 0 — here a fixed-iteration
  masked Newton (the reference's early exits become freezes).  Returns
  (wlen, pnt, pnt): wlen 0.0 on wrap, −1.0 on no wrap.
  """
  eps = 1e-15
  end0 = end[0:2]
  end1 = end[2:4]
  len0 = jnp.linalg.norm(end0)
  len1 = jnp.linalg.norm(end1)
  dif = end1 - end0
  dd = jnp.dot(dif, dif)

  no_wrap = ((len0 <= radius) | (len1 <= radius) | (radius < eps) |
             (len0 < eps) | (len1 < eps))
  a = -jnp.dot(dif, end0) / jnp.maximum(dd, eps)
  tmp = end0 + a * dif
  no_wrap |= ((dd > eps) & (a > 0.0) & (a < 1.0) &
              (jnp.linalg.norm(tmp) <= radius))

  # default point in case of numerical failure: scaled average
  pdef = 0.5 * (end0 + end1)
  pdef = pdef / jnp.maximum(jnp.linalg.norm(pdef), eps) * radius

  A = radius / jnp.maximum(len0, eps)
  B = radius / jnp.maximum(len1, eps)
  cosG = (len0 * len0 + len1 * len1 - dd) / \
      jnp.maximum(2.0 * len0 * len1, eps)
  no_wrap |= cosG < -1.0 + eps
  use_default = cosG > 1.0 - eps
  G = jnp.arccos(jnp.clip(cosG, -1.0, 1.0))

  def feval(z):
    return (jnp.arcsin(jnp.clip(A * z, -1.0, 1.0)) +
            jnp.arcsin(jnp.clip(B * z, -1.0, 1.0)) -
            2.0 * jnp.arcsin(jnp.clip(z, -1.0, 1.0)) + G)

  z0 = jnp.asarray(zinit, dtype)
  f0 = feval(z0)
  use_default |= f0 > 0.0  # init on the wrong side

  def newton(i, carry):
    z, f, fail, done = carry
    sq_z = z * z
    df = (A / jnp.maximum(jnp.sqrt(jnp.maximum(1.0 - sq_z * A * A, 0.0)),
                          eps) +
          B / jnp.maximum(jnp.sqrt(jnp.maximum(1.0 - sq_z * B * B, 0.0)),
                          eps) -
          2.0 / jnp.maximum(jnp.sqrt(jnp.maximum(1.0 - sq_z, 0.0)), eps))
    bad = df > -eps
    z1 = z - f / jnp.where(bad, -1.0, df)
    bad |= z1 > z
    conv = jnp.abs(f) <= tol
    zn = jnp.where(done | conv | bad, z, z1)
    fn = feval(zn)
    bad |= fn > tol
    fail = fail | (bad & ~done & ~conv)
    done = done | conv | bad
    return zn, fn, fail, done

  z, f, fail, done = jax.lax.fori_loop(
      0, maxiter, newton, (z0, f0, jnp.asarray(False), jnp.asarray(False)))
  use_default |= fail | (jnp.abs(f) > tol)

  # rotate from end0 or end1 depending on the winding sign
  cw = end[0] * end[3] - end[1] * end[2] > 0.0
  vec = jnp.where(cw, end0, end1)
  AB = jnp.where(cw, A, B)
  ang = jnp.arcsin(jnp.clip(z, -1.0, 1.0)) - \
      jnp.arcsin(jnp.clip(AB * z, -1.0, 1.0))
  vec = vec / jnp.maximum(jnp.linalg.norm(vec), eps)
  pnt = radius * jnp.stack(
      [jnp.cos(ang) * vec[0] - jnp.sin(ang) * vec[1],
       jnp.sin(ang) * vec[0] + jnp.cos(ang) * vec[1]])
  pnt = jnp.where(use_default, pdef, pnt)
  wlen = jnp.where(no_wrap, -1.0, 0.0)
  return wlen, pnt, pnt


def _wrap_geom(x0, x1, pos, mat, radius, is_sphere, side, dtype):
  """3D tendon wrap around a sphere/cylinder (util_misc.py:326 `wrap`).

  Returns (wlen, wpnt0, wpnt1); wlen < 0 means no wrap (straight segment).
  """
  matT = mat.T
  p0 = matT @ (x0 - pos)
  p1 = matT @ (x1 - pos)

  if is_sphere:
    axis0 = p0 / jnp.maximum(jnp.linalg.norm(p0), 1e-15)
    normal = jnp.cross(p0, p1)
    nrm = jnp.linalg.norm(normal)
    # degenerate (parallel): pick axis orthogonal to largest component
    k = jnp.argmax(jnp.abs(axis0))
    alt1 = jnp.ones((3,), dtype).at[k].set(0.0)
    altn = jnp.cross(axis0, alt1)
    altn = altn / jnp.maximum(jnp.linalg.norm(altn), 1e-15)
    normal = jnp.where(nrm < 1e-15, altn,
                       normal / jnp.maximum(nrm, 1e-15))
    axis1 = jnp.cross(normal, axis0)
    axis1 = axis1 / jnp.maximum(jnp.linalg.norm(axis1), 1e-15)
  else:
    axis0 = jnp.asarray([1.0, 0.0, 0.0], dtype)
    axis1 = jnp.asarray([0.0, 1.0, 0.0], dtype)

  end = jnp.stack([jnp.dot(p0, axis0), jnp.dot(p0, axis1),
                   jnp.dot(p1, axis0), jnp.dot(p1, axis1)])
  if side is not None:
    sidep = matT @ (side - pos)
    sp = jnp.stack([jnp.dot(sidep, axis0), jnp.dot(sidep, axis1)])
    sp = sp / jnp.maximum(jnp.linalg.norm(sp), 1e-15) * radius
    wlen, pnt0, pnt1 = _wrap_2d_circle(end, sp, radius, dtype)
    # sidesite inside the wrap geom: inside wrap (util_misc.py:421)
    inside = jnp.linalg.norm(sidep) < radius
    wlen_i, p0_i, p1_i = _wrap_2d_inside(end, radius, dtype)
    wlen = jnp.where(inside, wlen_i, wlen)
    pnt0 = jnp.where(inside, p0_i, pnt0)
    pnt1 = jnp.where(inside, p1_i, pnt1)
  else:
    wlen, pnt0, pnt1 = _wrap_2d_circle(end, None, radius, dtype)

  res0 = axis0 * pnt0[0] + axis1 * pnt0[1]
  res1 = axis0 * pnt1[0] + axis1 * pnt1[1]
  if not is_sphere:
    L0 = jnp.sqrt((p0[0] - res0[0]) ** 2 + (p0[1] - res0[1]) ** 2)
    L1 = jnp.sqrt((p1[0] - res1[0]) ** 2 + (p1[1] - res1[1]) ** 2)
    denom = jnp.maximum(L0 + wlen + L1, 1e-15)
    z0 = p0[2] + (p1[2] - p0[2]) * L0 / denom
    z1 = p0[2] + (p1[2] - p0[2]) * (L0 + wlen) / denom
    res0 = res0.at[2].set(z0)
    res1 = res1.at[2].set(z1)
    height = jnp.abs(z1 - z0)
    wlen = jnp.where(wlen >= 0,
                     jnp.sqrt(jnp.maximum(wlen * wlen + height * height,
                                          0.0)), wlen)
  wpnt0 = mat @ res0 + pos
  wpnt1 = mat @ res1 + pos
  return wlen, wpnt0, wpnt1


def _point_jacp(m, d, point, bodyid: int):
  """(nv, 3) translational Jacobian of a world point on a static body."""
  dtype = point.dtype
  mask = jnp.asarray(m.tree.body_dof_mask[bodyid], dtype)  # (nv,)
  offset = point - d.subtree_com[m.body_rootid[bodyid]]
  ang = d.cdof[:, :3]
  lin = d.cdof[:, 3:]
  return (lin + jnp.cross(ang, jnp.broadcast_to(offset, ang.shape))) * \
      mask[:, None]


def tendon(m: types.Model, d: types.Data) -> types.Data:
  """Tendon lengths and Jacobians (reference: smooth.py:4194 `tendon`).

  Fixed (joint-sum) tendons and spatial tendons with site paths, pulleys
  and sphere/cylinder wrap geoms (with optional sidesites).
  """
  if not m.ntendon:
    return d
  dtype = d.qpos.dtype
  _WT = types.WrapType
  ten_J = jnp.zeros((m.ntendon, m.nv), dtype)
  ten_length = jnp.zeros((m.ntendon,), dtype)

  for t in range(m.ntendon):
    adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
    wtypes = m.wrap_type[adr:adr + num]

    if np.all(wtypes == _WT.JOINT):  # fixed tendon
      jids = m.wrap_objid[adr:adr + num]
      coef = m.wrap_prm[adr:adr + num]
      qadr = m.jnt_qposadr[jids]
      dadr = m.jnt_dofadr[jids]
      ten_length = ten_length.at[t].set(jnp.sum(coef * d.qpos[qadr]))
      ten_J = ten_J.at[t, dadr].set(coef)
      continue

    # spatial tendon: walk the wrap list (static structure)
    length = jnp.zeros((), dtype)
    J = jnp.zeros((m.nv,), dtype)
    divisor = 1.0
    # points along the path: list of (pos (3,), bodyid, is_site)
    chain = []  # current branch's points

    def flush(chain, length, J, divisor):
      for (pa, ba), (pb, bb) in zip(chain[:-1], chain[1:]):
        seg = pb - pa
        ln = jnp.linalg.norm(seg)
        dirn = seg / jnp.maximum(ln, 1e-15)
        length = length + ln / divisor
        dJ = (_point_jacp(m, d, pb, bb) - _point_jacp(m, d, pa, ba))
        J = J + (dJ @ dirn) / divisor
      return length, J

    i = adr
    while i < adr + num:
      wt = int(m.wrap_type[i])
      oid = int(m.wrap_objid[i])
      if wt == _WT.SITE:
        chain.append((d.site_xpos[oid], int(m.site_bodyid[oid])))
        i += 1
      elif wt == _WT.PULLEY:
        length, J = flush(chain, length, J, divisor)
        chain = []
        divisor = float(np.asarray(jax.device_get(m.wrap_prm))[i])
        i += 1
      elif wt in (int(_WT.SPHERE), int(_WT.CYLINDER)):
        # wrap geom between previous and next site
        assert chain, 'wrap geom requires a preceding site'
        nxt = int(m.wrap_objid[i + 1])
        x0, b0 = chain[-1]
        x1 = d.site_xpos[nxt]
        b1 = int(m.site_bodyid[nxt])
        gb = int(m.geom_bodyid[oid])
        sideid = int(np.asarray(jax.device_get(m.wrap_prm))[i])
        side = d.site_xpos[sideid] if sideid >= 0 else None
        wlen, w0, w1 = _wrap_geom(
            x0, x1, d.geom_xpos[oid], d.geom_xmat[oid],
            float(jax.device_get(m.geom_size)[oid, 0]),
            wt == _WT.SPHERE, side, dtype)
        wrapped = wlen >= 0
        # with wrap: segments x0→w0, arc, w1→x1; without: straight x0→x1
        def seg(pa, pb, ba, bb):
          s = pb - pa
          ln = jnp.linalg.norm(s)
          dirn = s / jnp.maximum(ln, 1e-15)
          dJ = (_point_jacp(m, d, pb, bb) - _point_jacp(m, d, pa, ba))
          return ln, dJ @ dirn

        l_a, J_a = seg(x0, w0, b0, gb)
        l_b, J_b = seg(w1, x1, gb, b1)
        l_s, J_s = seg(x0, x1, b0, b1)
        length = length + jnp.where(
            wrapped, (l_a + jnp.maximum(wlen, 0.0) + l_b) / divisor,
            l_s / divisor)
        J = J + jnp.where(wrapped, (J_a + J_b) / divisor, J_s / divisor)
        # continue the chain from the next site (it is consumed here)
        chain = [(x1, b1)]
        i += 2
      else:
        raise NotImplementedError(f'wrap type {wt}')
    length, J = flush(chain, length, J, divisor)
    ten_length = ten_length.at[t].set(length)
    ten_J = ten_J.at[t].set(J)

  return d.replace(ten_length=ten_length, ten_J=ten_J)


def transmission(m: types.Model, d: types.Data) -> types.Data:
  """Actuator lengths and moment arms (reference: smooth.py:2888).

  Supports JOINT (all joint types), JOINTINPARENT, TENDON and SITE
  transmissions; static dispatch on trntype.
  """
  if not m.nu:
    return d
  dtype = d.qpos.dtype

  # fast path: every actuator drives a slide/hinge joint (the common RL
  # case, e.g. humanoid) — one gather + one static scatter, no unrolling
  trn = m.actuator_trntype
  if np.all(trn == types.TrnType.JOINT):
    jt = m.jnt_type[m.actuator_trnid[:, 0]]
    if np.all((jt == _JT.SLIDE) | (jt == _JT.HINGE)):
      qadr = m.jnt_qposadr[m.actuator_trnid[:, 0]]
      dadr = m.jnt_dofadr[m.actuator_trnid[:, 0]]
      gear0 = m.actuator_gear[:, 0]
      length = d.qpos[qadr] * gear0
      moment = jnp.zeros((m.nu, m.nv), dtype).at[
          np.arange(m.nu), dadr].set(gear0)
      return d.replace(actuator_length=length.astype(dtype),
                       actuator_moment=moment)

  length = jnp.zeros((m.nu,), dtype)
  moment = jnp.zeros((m.nu, m.nv), dtype)
  for u in range(m.nu):
    tt = trn[u]
    tid = int(m.actuator_trnid[u, 0])
    gear = m.actuator_gear[u]
    if tt in (types.TrnType.JOINT, types.TrnType.JOINTINPARENT):
      jt = int(m.jnt_type[tid])
      qadr = int(m.jnt_qposadr[tid])
      dadr = int(m.jnt_dofadr[tid])
      if jt in (_JT.SLIDE, _JT.HINGE):
        # raw qpos, not qpos - qpos0 (mj_transmission semantics)
        length = length.at[u].set(d.qpos[qadr] * gear[0])
        moment = moment.at[u, dadr].set(gear[0])
      elif jt == _JT.BALL:
        # quaternion joint: length = gear · axis-angle(qpos)
        q = math.normalize_quat(jax.lax.dynamic_slice(d.qpos, (qadr,), (4,)))
        axis_angle = math.quat_sub(q, jnp.array([1.0, 0, 0, 0], dtype))
        if tt == types.TrnType.JOINTINPARENT:
          axis_angle = math.rot_vec_quat(axis_angle, math.quat_inv(q))
          gearaxis = math.rot_vec_quat(gear[:3], math.quat_inv(q))
        else:
          gearaxis = gear[:3]
        length = length.at[u].set(jnp.dot(axis_angle, gear[:3]))
        moment = moment.at[u, dadr:dadr + 3].set(gearaxis)
      elif jt == _JT.FREE:
        length = length.at[u].set(0.0)
        dadrs = dadr + np.arange(6)
        if tt == types.TrnType.JOINT:
          moment = moment.at[u, dadrs[:3]].set(gear[:3])
          moment = moment.at[u, dadrs[3:]].set(gear[3:])
        else:  # JOINTINPARENT: rotate gear into world/parent frame
          q = math.normalize_quat(
              jax.lax.dynamic_slice(d.qpos, (qadr + 3,), (4,)))
          moment = moment.at[u, dadrs[:3]].set(
              math.rot_vec_quat(gear[:3], math.quat_inv(q)))
          moment = moment.at[u, dadrs[3:]].set(
              math.rot_vec_quat(gear[3:], math.quat_inv(q)))
    elif tt == types.TrnType.TENDON:
      length = length.at[u].set(d.ten_length[tid] * gear[0])
      moment = moment.at[u].set(d.ten_J[tid] * gear[0])
    elif tt == types.TrnType.SITE:
      # force/torque applied at a site along its frame, gear in site frame
      from mujoco_warp_tpu.ops import support  # local to avoid cycle
      refid = int(m.actuator_trnid[u, 1])
      jacp, jacr = support.jac_site(m, d, tid)
      frame = d.site_xmat[tid]
      if refid == -1:
        wrench_p = frame @ gear[:3]
        wrench_r = frame @ gear[3:]
        mom = jacp.T @ wrench_p + jacr.T @ wrench_r
        length = length.at[u].set(0.0)
        moment = moment.at[u].set(mom.astype(dtype))
      else:
        # site-to-site: length is distance between sites, moment via jacobians
        jacp2, _ = support.jac_site(m, d, refid)
        vec = d.site_xpos[tid] - d.site_xpos[refid]
        dist = math.safe_norm(vec)
        dirn = vec / jnp.maximum(dist, 1e-12)
        length = length.at[u].set(dist * gear[0])
        mom = (jacp - jacp2).T @ dirn * gear[0]
        moment = moment.at[u].set(mom.astype(dtype))
    elif tt == types.TrnType.SLIDERCRANK:
      # crank site trnid[0] driven by a rod from slider site trnid[1];
      # slider axis = slider frame z (reference: smooth.py:2395)
      from mujoco_warp_tpu.ops import support  # local to avoid cycle
      sid = int(m.actuator_trnid[u, 1])
      rod = m.actuator_cranklength[u]
      axis = d.site_xmat[sid][:, 2]
      vec = d.site_xpos[tid] - d.site_xpos[sid]
      av = jnp.dot(vec, axis)
      det = av * av + rod * rod - jnp.dot(vec, vec)
      ok = det > 0.0
      sdet = jnp.sqrt(jnp.maximum(det, 1e-12))
      L = jnp.where(ok, av - sdet, av)
      # chain rule: dL/dvec, dL/daxis
      scale = 1.0 - av / sdet
      dldv = jnp.where(ok, axis * scale + vec / sdet, axis)
      dlda = jnp.where(ok, vec * scale, vec)
      jacp_c, _ = support.jac_site(m, d, tid)
      jacp_s, jacr_s = support.jac_site(m, d, sid)
      jac = jacp_c - jacp_s                       # (3, nv)
      jacA = jnp.cross(jacr_s.T, axis).T          # per-dof jacr x axis
      mom = jac.T @ dldv + jacA.T @ dlda
      length = length.at[u].set(L * gear[0])
      moment = moment.at[u].set((mom * gear[0]).astype(dtype))
    elif tt == types.TrnType.BODY:
      # adhesion: mean contact-normal Jacobian over contacts touching the
      # body, negated; in-gap contacts contribute normal-projected
      # Jacobian differences (reference: smooth.py:2523/2730/2867).
      # Vectorized over contact slots; geom ids are per-world dynamic
      # under contact compaction.
      from mujoco_warp_tpu.ops import constraint as constraint_ops
      con = d.contact
      mom = jnp.zeros((m.nv,), dtype)
      ncon_f = jnp.zeros((), dtype)
      if m.ncon:
        nslot = m.ncon
        gb = jnp.asarray(m.geom_bodyid)
        b1 = gb[con.geom1]
        b2 = gb[con.geom2]
        touches = (b1 == tid) | (b2 == tid)
        safe_cand = jnp.maximum(con.cand, 0)
        marg = jnp.where(con.cand >= 0, m.cand_margin[safe_cand], 0.0)
        found = (touches & (con.dist < marg)).astype(dtype)
        active = (touches & (con.dist < con.includemargin)).astype(dtype)
        ncon_f = jnp.sum(found)
        # normal-row Jacobian per slot (pyramidal facets average back)
        jn = jnp.zeros((nslot, m.nv), dtype)
        dims_np = np.asarray(con.dim)
        for dim_c in np.unique(dims_np):
          dim_c = int(dim_c)
          idx = np.nonzero(dims_np == dim_c)[0]
          adr = np.asarray(con.efc_address)[idx]
          if dim_c == 1 or m.opt.cone == types.ConeType.ELLIPTIC:
            jn = jn.at[idx].set(d.efc_J[adr])
          else:
            npyr = dim_c - 1
            rows = d.efc_J[(adr[:, None] +
                            np.arange(2 * npyr)[None, :]).reshape(-1)]
            jn = jn.at[idx].set(
                jnp.sum(rows.reshape(len(idx), 2 * npyr, m.nv), axis=1) *
                (0.5 / npyr))
        # in-gap contribution (inactive efc rows are zeroed, so the
        # active term automatically vanishes there)
        jp1, _ = constraint_ops._jac(m, d, con.pos, b1)
        jp2, _ = constraint_ops._jac(m, d, con.pos, b2)
        jgap = jnp.einsum('ki,kvi->kv', con.frame[:, 0], jp2 - jp1)
        w = active[:, None] * jn + (found * (1.0 - active))[:, None] * jgap
        mom = jnp.sum(w, axis=0)
      has = ncon_f > 0
      mom = jnp.where(has, -mom / jnp.maximum(ncon_f, 1.0), 0.0)
      length = length.at[u].set(0.0)
      moment = moment.at[u].set(mom.astype(dtype))
  return d.replace(actuator_length=length, actuator_moment=moment)


def flex(m: types.Model, d: types.Data) -> types.Data:
  """Flex vertex kinematics + edge length/velocity (reference:
  smooth.py:604 `flex`).

  Particle flexes only (io validates): vertex position is its body's
  xpos, vertex velocity is its 3 slide-dof qvel slice.
  """
  if not m.nflex:
    return d
  vb = np.asarray(m.flex_vertbodyid)
  xv = d.xpos[np.maximum(vb, 0)]  # (nflexvert, 3)
  dof = np.asarray(m.flex_vert_dofadr)
  vvert = jnp.stack([d.qvel[np.maximum(dof, 0) + k] for k in range(3)],
                    axis=-1)
  if m.flex_iv_ids is not None:
    # interpolated (trilinear) vertices: weighted 8-node blends
    # (reference smooth.py:256); W/body/dof tables are static
    W = jnp.asarray(m.flex_iv_W, xv.dtype)  # (ni, 8)
    node_x = d.xpos[m.flex_iv_body]  # (ni, 8, 3)
    xv = xv.at[m.flex_iv_ids].set(jnp.einsum('nk,nki->ni', W, node_x))
    node_v = jnp.stack(
        [d.qvel[m.flex_iv_dof + a] for a in range(3)], axis=-1)  # (ni,8,3)
    vvert = vvert.at[m.flex_iv_ids].set(
        jnp.einsum('nk,nki->ni', W, node_v))
  e0 = np.asarray(m.flex_edge[:, 0])
  e1 = np.asarray(m.flex_edge[:, 1])
  u = xv[e1] - xv[e0]
  length = jnp.linalg.norm(u, axis=-1)
  uhat = u / jnp.maximum(length, 1e-12)[:, None]
  vel = jnp.sum(uhat * (vvert[e1] - vvert[e0]), axis=-1)
  return d.replace(flexvert_xpos=xv, flexedge_length=length,
                   flexedge_velocity=vel)


def _has_tendon_armature(m: types.Model) -> bool:
  if not m.ntendon:
    return False
  return types.concrete_or(m.tendon_armature,
                           lambda a: bool(np.any(a > 0)), True)


def tendon_armature(m: types.Model, d: types.Data) -> types.Data:
  """Add tendon armature to the mass matrix (reference: smooth.py:1165):
  M += ten_J^T diag(armature) ten_J."""
  if not _has_tendon_armature(m):
    return d
  if m.m_blocked:
    raise NotImplementedError(
        'tendon armature couples trees; the blocked mass matrix cannot '
        'hold it (put_model(m_blocked=False))')
  A = m.tendon_armature[:, None] * d.ten_J  # (ntendon, nv)
  return d.replace(qM=d.qM + d.ten_J.T @ A)


def _qpos_dot(m: types.Model, qpos, qvel):
  """Tangent of qpos under qvel (quaternion slots get 0.5*q*[0,w])."""
  dtype = qpos.dtype
  out = jnp.zeros((m.nq,), dtype)
  for j in range(m.njnt):
    jt = int(m.jnt_type[j])
    qadr = int(m.jnt_qposadr[j])
    dadr = int(m.jnt_dofadr[j])
    if jt == int(types.JointType.FREE):
      out = out.at[qadr:qadr + 3].set(qvel[dadr:dadr + 3])
      q = qpos[qadr + 3:qadr + 7]
      w = qvel[dadr + 3:dadr + 6]
      qd = 0.5 * math.mul_quat(q, jnp.concatenate(
          [jnp.zeros((1,), dtype), w]))
      out = out.at[qadr + 3:qadr + 7].set(qd)
    elif jt == int(types.JointType.BALL):
      q = qpos[qadr:qadr + 4]
      w = qvel[dadr:dadr + 3]
      qd = 0.5 * math.mul_quat(q, jnp.concatenate(
          [jnp.zeros((1,), dtype), w]))
      out = out.at[qadr:qadr + 4].set(qd)
    else:
      out = out.at[qadr].set(qvel[dadr])
  return out


def tendon_bias(m: types.Model, d: types.Data) -> types.Data:
  """Bias force from tendon armature (reference: smooth.py:2119):
  qfrc_bias += ten_J^T (armature * (d(ten_J)/dt . qvel)).

  The reference derives ten_Jdot analytically per wrap segment
  (_tendon_dot); here it is the JVP of the position pipeline that
  produces ten_J along the qpos tangent induced by qvel — the
  autodiff-native equivalent (same divergence as ops/derivative's RNE
  velocity derivative).
  """
  if not _has_tendon_armature(m):
    return d

  def ten_J_of(qpos):
    dd = d.replace(qpos=qpos)
    dd = kinematics(m, dd)
    dd = com_pos(m, dd)
    dd = tendon(m, dd)
    return dd.ten_J

  qdot = _qpos_dot(m, d.qpos, d.qvel)
  _, ten_Jdot = jax.jvp(ten_J_of, (d.qpos,), (qdot,))
  coef = m.tendon_armature * (ten_Jdot @ d.qvel)  # (ntendon,)
  return d.replace(qfrc_bias=d.qfrc_bias + d.ten_J.T @ coef)
