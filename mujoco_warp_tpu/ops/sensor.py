"""Sensors: position/velocity/acceleration stages + energy.

TPU-native counterpart of reference mujoco_warp/_src/sensor.py
(sensor_pos:810, sensor_vel:1432, sensor_acc:2507, energy_pos:2927,
energy_vel:2997).  The reference launches one thread per sensor with a
switch on type; here sensors are grouped by type at trace time (static
tables) and each group is computed vectorized, scattered into
``sensordata`` at static addresses.

Supported types (this phase): joint/tendon/actuator pos-vel-frc, ball
quat/angvel, limit pos/vel/frc, frame* (pos/quat/axes/vel/acc incl.
relative-to-ref frames), subtree com/linvel/angmom, imu (acc/gyro/velo/
magnetometer/force/torque/touch), clock, energies.  Ray-based
(rangefinder), camera, geom-distance and contact sensors land with their
subsystems.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import types
from mujoco_warp_tpu.ops import math, smooth, support

_ST = types.SensorType
_OT = types.ObjType


def _write(sensordata, adr, dim, values):
  """Scatter (n, dim) values to static addresses."""
  idx = (adr[:, None] + np.arange(dim)).reshape(-1)
  return sensordata.at[idx].set(values.reshape(-1))


def _obj_pos(m, d, objtype, objid):
  """World position of a body/xbody/geom/site/cam object batch (static)."""
  pos = jnp.zeros((len(objid), 3), d.qpos.dtype)
  for ot, arr in ((_OT.BODY, d.xipos), (_OT.XBODY, d.xpos),
                  (_OT.GEOM, d.geom_xpos), (_OT.SITE, d.site_xpos)):
    sel = objtype == ot
    if np.any(sel):
      pos = pos.at[np.nonzero(sel)[0]].set(arr[objid[sel]])
  return pos


def _obj_mat(m, d, objtype, objid):
  """World orientation of object batch."""
  mat = jnp.broadcast_to(jnp.eye(3, dtype=d.qpos.dtype),
                         (len(objid), 3, 3))
  for ot, arr in ((_OT.BODY, d.ximat), (_OT.XBODY, d.xmat),
                  (_OT.GEOM, d.geom_xmat), (_OT.SITE, d.site_xmat)):
    sel = objtype == ot
    if np.any(sel):
      mat = mat.at[np.nonzero(sel)[0]].set(arr[objid[sel]])
  return mat


def _inside_site(m, d, siteid: int, points):
  """(n,) bool: points inside the site's primitive volume.

  Reference: util_misc.py:676 `inside_geom`.
  """
  spos = d.site_xpos[siteid]
  smat = d.site_xmat[siteid]
  s = m.site_size[siteid]
  st = int(m.site_type[siteid])
  pl = (points - spos) @ smat  # rotate into local frame
  if st == types.GeomType.SPHERE:
    return jnp.sum(pl * pl, -1) < s[0] * s[0]
  if st == types.GeomType.CAPSULE:
    zd = pl[:, 2] - jnp.clip(pl[:, 2], -s[1], s[1])
    return pl[:, 0] ** 2 + pl[:, 1] ** 2 + zd * zd < s[0] * s[0]
  if st == types.GeomType.ELLIPSOID:
    ps = pl / s
    return jnp.sum(ps * ps, -1) < 1.0
  if st == types.GeomType.CYLINDER:
    return (jnp.abs(pl[:, 2]) < s[1]) & (
        pl[:, 0] ** 2 + pl[:, 1] ** 2 < s[0] * s[0])
  if st == types.GeomType.BOX:
    return jnp.all(jnp.abs(pl) < s, -1)
  if st == types.GeomType.PLANE:
    return pl[:, 2] < 0.0
  return jnp.zeros(points.shape[:-1], bool)


def _obj_body(m, objtype, objid):
  """Body id carrying each object (static numpy)."""
  body = np.zeros(len(objid), np.int32)
  body[objtype == _OT.BODY] = objid[objtype == _OT.BODY]
  body[objtype == _OT.XBODY] = objid[objtype == _OT.XBODY]
  sel = objtype == _OT.GEOM
  body[sel] = m.geom_bodyid[objid[sel]]
  sel = objtype == _OT.SITE
  body[sel] = m.site_bodyid[objid[sel]]
  return body


def _point_vel(m, d, point, body, flg_local=False, mat=None):
  """6D velocity (ang, lin) of a body-fixed world point.

  Counterpart of mj_objectVelocity: cvel translated to the point, with
  optional rotation into the object frame.
  """
  off = point - d.subtree_com[m.body_rootid[body]]
  cv = d.cvel[body]
  ang = cv[:, :3]
  lin = cv[:, 3:] - jnp.cross(off, ang)
  if flg_local:
    rt = jnp.swapaxes(mat, -1, -2)
    ang = jnp.einsum('nij,nj->ni', rt, ang)
    lin = jnp.einsum('nij,nj->ni', rt, lin)
  return ang, lin


def _point_acc(m, d, point, body):
  """6D acceleration of a body-fixed world point (mj_objectAcceleration
  without local rotation), including the centripetal term."""
  off = point - d.subtree_com[m.body_rootid[body]]
  ca = d.cacc[body]
  cv = d.cvel[body]
  ang_v = cv[:, :3]
  lin_v = cv[:, 3:] - jnp.cross(off, ang_v)
  ang = ca[:, :3]
  lin = ca[:, 3:] - jnp.cross(off, ang)
  # centripetal correction (mju_objectAcceleration: lin += ang_v x lin_v)
  lin = lin + jnp.cross(ang_v, lin_v)
  return ang, lin


def _groups(m, stage_types):
  """Static (type -> sensor-index array) map for this stage."""
  out = {}
  for t in stage_types:
    ids = np.nonzero(m.sensor_type == t)[0]
    if len(ids):
      out[t] = ids.astype(np.int64)
  return out


def _limit_row_for(m, kind, objid):
  """Static efc row address of a joint/tendon limit row, -1 if unlimited."""
  lay = m.efc
  rows = np.full(len(objid), -1, np.int64)
  src_id, src_adr = ((lay.lim_jnt_id, lay.lim_jnt_adr) if kind == 'jnt'
                     else (lay.lim_ten_id, lay.lim_ten_adr))
  for i, o in enumerate(objid):
    hit = np.nonzero(src_id == o)[0]
    if len(hit):
      rows[i] = src_adr[hit[0]]
  return rows


def sensor_pos(m: types.Model, d: types.Data) -> types.Data:
  """Position-stage sensors (reference: sensor.py:810)."""
  if not m.nsensor or (m.opt.disableflags & types.DisableBit.SENSOR):
    return d
  dtype = d.qpos.dtype
  sd = d.sensordata
  g = _groups(m, [
      _ST.MAGNETOMETER, _ST.JOINTPOS, _ST.TENDONPOS, _ST.ACTUATORPOS,
      _ST.BALLQUAT, _ST.JOINTLIMITPOS, _ST.TENDONLIMITPOS, _ST.FRAMEPOS,
      _ST.FRAMEQUAT, _ST.FRAMEXAXIS, _ST.FRAMEYAXIS, _ST.FRAMEZAXIS,
      _ST.SUBTREECOM, _ST.CLOCK, _ST.E_POTENTIAL, _ST.E_KINETIC,
      _ST.RANGEFINDER, _ST.GEOMDIST, _ST.GEOMNORMAL, _ST.GEOMFROMTO,
      _ST.CAMPROJECTION, _ST.INSIDESITE,
  ])

  for t, ids in g.items():
    adr = m.sensor_adr[ids]
    objid = m.sensor_objid[ids]
    objtype = m.sensor_objtype[ids]
    if t == _ST.JOINTPOS:
      sd = _write(sd, adr, 1, d.qpos[m.jnt_qposadr[objid]])
    elif t == _ST.TENDONPOS:
      sd = _write(sd, adr, 1, d.ten_length[objid])
    elif t == _ST.ACTUATORPOS:
      sd = _write(sd, adr, 1, d.actuator_length[objid])
    elif t == _ST.BALLQUAT:
      q = jnp.stack([d.qpos[m.jnt_qposadr[objid] + i] for i in range(4)],
                    -1)
      sd = _write(sd, adr, 4, math.normalize_quat(q))
    elif t == _ST.JOINTLIMITPOS:
      rows = _limit_row_for(m, 'jnt', objid)
      ok = rows >= 0
      vals = jnp.where(
          jnp.asarray(ok) & d.efc_active[np.maximum(rows, 0)],
          d.efc_pos[np.maximum(rows, 0)] - d.efc_margin[np.maximum(rows, 0)],
          0.0)
      sd = _write(sd, adr, 1, vals)
    elif t == _ST.TENDONLIMITPOS:
      rows = _limit_row_for(m, 'ten', objid)
      vals = jnp.where(
          jnp.asarray(rows >= 0) & d.efc_active[np.maximum(rows, 0)],
          d.efc_pos[np.maximum(rows, 0)] - d.efc_margin[np.maximum(rows, 0)],
          0.0)
      sd = _write(sd, adr, 1, vals)
    elif t == _ST.FRAMEPOS:
      pos = _obj_pos(m, d, objtype, objid)
      refid = m.sensor_refid[ids]
      if np.any(refid >= 0):
        reftype = m.sensor_reftype[ids]
        rid = np.maximum(refid, 0)
        refpos = _obj_pos(m, d, reftype, rid)
        refmat = _obj_mat(m, d, reftype, rid)
        rel = jnp.einsum('nij,ni->nj', refmat, pos - refpos)
        pos = jnp.where(jnp.asarray(refid >= 0)[:, None], rel, pos)
      sd = _write(sd, adr, 3, pos)
    elif t in (_ST.FRAMEXAXIS, _ST.FRAMEYAXIS, _ST.FRAMEZAXIS):
      col = {_ST.FRAMEXAXIS: 0, _ST.FRAMEYAXIS: 1, _ST.FRAMEZAXIS: 2}[t]
      mat = _obj_mat(m, d, objtype, objid)
      axis = mat[:, :, col]
      refid = m.sensor_refid[ids]
      if np.any(refid >= 0):
        reftype = m.sensor_reftype[ids]
        rid = np.maximum(refid, 0)
        refmat = _obj_mat(m, d, reftype, rid)
        rel = jnp.einsum('nij,ni->nj', refmat, axis)
        axis = jnp.where(jnp.asarray(refid >= 0)[:, None], rel, axis)
      sd = _write(sd, adr, 3, axis)
    elif t == _ST.FRAMEQUAT:
      # object quaternion: body/xbody use xquat; geom/site compose static
      # offsets with the body quaternion
      q = jnp.zeros((len(ids), 4), dtype).at[:, 0].set(1.0)
      for ot in np.unique(objtype):
        sel = np.nonzero(objtype == ot)[0]
        oid = objid[sel]
        if ot == _OT.BODY:
          qo = math.mul_quat(d.xquat[oid], m.body_iquat[oid])
        elif ot == _OT.XBODY:
          qo = d.xquat[oid]
        elif ot == _OT.GEOM:
          qo = math.mul_quat(d.xquat[m.geom_bodyid[oid]], m.geom_quat[oid])
        elif ot == _OT.SITE:
          qo = math.mul_quat(d.xquat[m.site_bodyid[oid]], m.site_quat[oid])
        else:
          continue
        q = q.at[sel].set(qo)
      refid = m.sensor_refid[ids]
      if np.any(refid >= 0):
        reftype = m.sensor_reftype[ids]
        rid = np.maximum(refid, 0)
        qr = jnp.zeros((len(ids), 4), dtype).at[:, 0].set(1.0)
        for ot in np.unique(reftype):
          sel = np.nonzero(reftype == ot)[0]
          oid = rid[sel]
          if ot == _OT.BODY:
            qo = math.mul_quat(d.xquat[oid], m.body_iquat[oid])
          elif ot == _OT.XBODY:
            qo = d.xquat[oid]
          elif ot == _OT.GEOM:
            qo = math.mul_quat(d.xquat[m.geom_bodyid[oid]],
                               m.geom_quat[oid])
          elif ot == _OT.SITE:
            qo = math.mul_quat(d.xquat[m.site_bodyid[oid]],
                               m.site_quat[oid])
          else:
            continue
          qr = qr.at[sel].set(qo)
        rel = math.mul_quat(math.quat_inv(qr), q)
        q = jnp.where(jnp.asarray(refid >= 0)[:, None], rel, q)
      sd = _write(sd, adr, 4, q)
    elif t == _ST.SUBTREECOM:
      sd = _write(sd, adr, 3, d.subtree_com[objid])
    elif t == _ST.MAGNETOMETER:
      mat = d.site_xmat[objid]
      b = m.opt.magnetic.astype(dtype)
      sd = _write(sd, adr, 3,
                  jnp.einsum('nji,j->ni', mat, b))
    elif t in (_ST.GEOMDIST, _ST.GEOMNORMAL, _ST.GEOMFROMTO):
      # signed distance between two geoms or bodies (mj_geomDistance
      # semantics); body operands take the min over all geom pairs
      from mujoco_warp_tpu.ops import collision_convex, collision_primitive

      def _operand_geoms(ot, oi):
        if ot == _OT.GEOM:
          return [oi]
        if ot in (_OT.BODY, _OT.XBODY):
          return [int(g) for g in np.nonzero(m.geom_bodyid == oi)[0]]
        raise NotImplementedError(f'geomdist operand objtype {ot}')

      def _pair_dist(g1, g2):
        t1, t2 = int(m.geom_type[g1]), int(m.geom_type[g2])
        swap = t1 > t2
        if swap:
          g1, g2, t1, t2 = g2, g1, t2, t1
        fn = collision_primitive.COLLIDERS.get((t1, t2))
        if fn is None:
          fn = collision_convex.make_convex_collider(t1, t2)
        dist_k, pos_k, n_k = fn(m, d, np.asarray([g1]), np.asarray([g2]))
        best = jnp.argmin(dist_k[:, 0])
        sgn = -1.0 if swap else 1.0
        return dist_k[best, 0], pos_k[best, 0], n_k[best, 0] * sgn

      vals = []
      for k, s in enumerate(ids):
        gs1 = _operand_geoms(int(m.sensor_objtype[s]),
                             int(m.sensor_objid[s]))
        gs2 = _operand_geoms(int(m.sensor_reftype[s]),
                             int(m.sensor_refid[s]))
        cands = [_pair_dist(a, b) for a in gs1 for b in gs2]
        dists = jnp.stack([c[0] for c in cands])
        poss = jnp.stack([c[1] for c in cands])
        nrms = jnp.stack([c[2] for c in cands])
        best = jnp.argmin(dists)
        raw = dists[best]
        cutoff = m.sensor_cutoff[s]
        dist = jnp.minimum(raw, cutoff)
        normal = nrms[best]
        pos = poss[best]
        if t == _ST.GEOMDIST:
          vals.append(dist[None])
        elif t == _ST.GEOMNORMAL:
          vals.append(jnp.where(raw < cutoff, normal,
                                jnp.zeros(3, dtype)))
        else:  # GEOMFROMTO: segment between surface points
          p_from = pos - 0.5 * dist * normal
          p_to = pos + 0.5 * dist * normal
          hit = raw < cutoff
          seg = jnp.where(hit, jnp.concatenate([p_from, p_to]),
                          jnp.zeros(6, dtype))
          vals.append(seg)
      dim = {_ST.GEOMDIST: 1, _ST.GEOMNORMAL: 3, _ST.GEOMFROMTO: 6}[t]
      sd = _write(sd, adr, dim, jnp.stack(vals))
    elif t == _ST.RANGEFINDER:
      from mujoco_warp_tpu.ops import ray as ray_ops
      pnt = d.site_xpos[objid]
      direc = d.site_xmat[objid][:, :, 2]  # site z-axis
      body = m.site_bodyid[objid]
      vals = jnp.zeros((len(ids),), dtype)
      for b in np.unique(body):
        sel = np.nonzero(body == b)[0]
        dist, _ = ray_ops.rays(m, d, pnt[sel], direc[sel],
                               bodyexclude=int(b))
        vals = vals.at[sel].set(dist)
      sd = _write(sd, adr, 1, vals)
    elif t == _ST.CAMPROJECTION:
      # pixel coordinates of a site in a camera image (reference:
      # sensor.py:562 `_cam_projection`)
      refid = m.sensor_refid[ids]  # camera
      target = d.site_xpos[objid]
      cpos = d.cam_xpos[refid]
      cmat = d.cam_xmat[refid]
      v = jnp.einsum('nij,ni->nj', cmat, target - cpos)
      res = m.cam_resolution[refid].astype(np.float64)  # static (n, 2)
      ss = m.cam_sensorsize[refid]  # (n, 2)
      intr = m.cam_intrinsic[refid]  # (n, 4)
      fovy = m.cam_fovy[refid]
      f_fovy = 0.5 / jnp.tan(fovy * jnp.pi / 360.0) * res[:, 1]
      use_intr = (ss[:, 0] != 0.0) & (ss[:, 1] != 0.0)
      fx = jnp.where(use_intr, intr[:, 0] / (ss[:, 0] + 1e-15) * res[:, 0],
                     f_fovy)
      fy = jnp.where(use_intr, intr[:, 1] / (ss[:, 1] + 1e-15) * res[:, 1],
                     f_fovy)
      denom = v[:, 2]
      denom = jnp.where(jnp.abs(denom) < 1e-15,
                        jnp.clip(denom, -1e-15, 1e-15), denom)
      px = -fx * v[:, 0] / denom + 0.5 * res[:, 0]
      py = fy * v[:, 1] / denom + 0.5 * res[:, 1]
      sd = _write(sd, adr, 2, jnp.stack([px, py], -1).astype(dtype))
    elif t == _ST.INSIDESITE:
      # 1.0 when the object position lies inside the (refid) site's
      # primitive volume (reference: sensor.py:719, util_misc.py:676)
      refid = m.sensor_refid[ids]
      pos = _obj_pos(m, d, objtype, objid)
      # BODY objects with ~zero mass but massive subtree use subtree_com
      bsel = (objtype == _OT.BODY) & (objid > 0)
      if np.any(bsel):
        light = (m.body_mass[objid] < 1e-15) & (
            m.body_subtreemass[objid] >= 1e-15)
        use_com = jnp.asarray(bsel)[:, None] & light[:, None]
        pos = jnp.where(use_com, d.subtree_com[objid], pos)
      inside = jnp.zeros((len(ids),), bool)
      for k in range(len(ids)):
        ins = _inside_site(m, d, int(refid[k]), pos[k][None])[0]
        inside = inside.at[k].set(ins)
      sd = _write(sd, adr, 1, inside.astype(dtype))
    elif t == _ST.CLOCK:
      sd = _write(sd, adr, 1,
                  jnp.broadcast_to(d.time[None], (len(ids), 1)))
    elif t == _ST.E_POTENTIAL:
      e = _energy_pos_value(m, d)
      sd = _write(sd, adr, 1, jnp.broadcast_to(e[None], (len(ids), 1)))
    elif t == _ST.E_KINETIC:
      e = _energy_vel_value(m, d)
      sd = _write(sd, adr, 1, jnp.broadcast_to(e[None], (len(ids), 1)))
  d = d.replace(sensordata=_apply_cutoff(m, sd, stage='pos'))
  if m.callback is not None and m.callback.sensor:
    d = m.callback.sensor(m, d, types.Stage.POS)  # ref: sensor.py:959
  return d


def sensor_vel(m: types.Model, d: types.Data) -> types.Data:
  """Velocity-stage sensors (reference: sensor.py:1432)."""
  if not m.nsensor or (m.opt.disableflags & types.DisableBit.SENSOR):
    return d
  dtype = d.qpos.dtype
  sd = d.sensordata
  g = _groups(m, [
      _ST.VELOCIMETER, _ST.GYRO, _ST.JOINTVEL, _ST.TENDONVEL,
      _ST.ACTUATORVEL, _ST.BALLANGVEL, _ST.JOINTLIMITVEL,
      _ST.TENDONLIMITVEL, _ST.FRAMELINVEL, _ST.FRAMEANGVEL,
      _ST.SUBTREELINVEL, _ST.SUBTREEANGMOM,
  ])
  if not g:
    return d

  subtree_vel = None
  if _ST.SUBTREELINVEL in g or _ST.SUBTREEANGMOM in g:
    subtree_vel = _subtree_vel(m, d)

  for t, ids in g.items():
    adr = m.sensor_adr[ids]
    objid = m.sensor_objid[ids]
    objtype = m.sensor_objtype[ids]
    if t == _ST.JOINTVEL:
      sd = _write(sd, adr, 1, d.qvel[m.jnt_dofadr[objid]])
    elif t == _ST.TENDONVEL:
      sd = _write(sd, adr, 1, d.ten_velocity[objid])
    elif t == _ST.ACTUATORVEL:
      sd = _write(sd, adr, 1, d.actuator_velocity[objid])
    elif t == _ST.BALLANGVEL:
      v = jnp.stack([d.qvel[m.jnt_dofadr[objid] + i] for i in range(3)],
                    -1)
      sd = _write(sd, adr, 3, v)
    elif t in (_ST.JOINTLIMITVEL, _ST.TENDONLIMITVEL):
      kind = 'jnt' if t == _ST.JOINTLIMITVEL else 'ten'
      rows = _limit_row_for(m, kind, objid)
      rr = np.maximum(rows, 0)
      vel = d.efc_J[rr] @ d.qvel
      vals = jnp.where(jnp.asarray(rows >= 0) & d.efc_active[rr], vel, 0.0)
      sd = _write(sd, adr, 1, vals)
    elif t == _ST.VELOCIMETER:
      body = m.site_bodyid[objid]
      _, lin = _point_vel(m, d, d.site_xpos[objid], body, flg_local=True,
                          mat=d.site_xmat[objid])
      sd = _write(sd, adr, 3, lin)
    elif t == _ST.GYRO:
      body = m.site_bodyid[objid]
      ang, _ = _point_vel(m, d, d.site_xpos[objid], body, flg_local=True,
                          mat=d.site_xmat[objid])
      sd = _write(sd, adr, 3, ang)
    elif t in (_ST.FRAMELINVEL, _ST.FRAMEANGVEL):
      body = _obj_body(m, objtype, objid)
      pos = _obj_pos(m, d, objtype, objid)
      ang, lin = _point_vel(m, d, pos, body)
      refid = m.sensor_refid[ids]
      val = lin if t == _ST.FRAMELINVEL else ang
      if np.any(refid >= 0):
        reftype = m.sensor_reftype[ids]
        rid = np.maximum(refid, 0)
        refbody = _obj_body(m, reftype, rid)
        refpos = _obj_pos(m, d, reftype, rid)
        refmat = _obj_mat(m, d, reftype, rid)
        rang, rlin = _point_vel(m, d, refpos, refbody)
        if t == _ST.FRAMELINVEL:
          # relative velocity of point in ref frame (mj_objectVelocity on
          # the relative transform)
          relv = lin - rlin - jnp.cross(rang, pos - refpos)
          relv = jnp.einsum('nij,ni->nj', refmat, relv)
          val = jnp.where(jnp.asarray(refid >= 0)[:, None], relv, val)
        else:
          rela = jnp.einsum('nij,ni->nj', refmat, ang - rang)
          val = jnp.where(jnp.asarray(refid >= 0)[:, None], rela, val)
      sd = _write(sd, adr, 3, val)
    elif t == _ST.SUBTREELINVEL:
      sd = _write(sd, adr, 3, subtree_vel[0][objid])
    elif t == _ST.SUBTREEANGMOM:
      sd = _write(sd, adr, 3, subtree_vel[1][objid])
  d = d.replace(sensordata=_apply_cutoff(m, sd, stage='vel'))
  if m.callback is not None and m.callback.sensor:
    d = m.callback.sensor(m, d, types.Stage.VEL)  # ref: sensor.py:1505
  return d


def _subtree_vel(m: types.Model, d: types.Data):
  """Subtree linear velocity and angular momentum (mj_subtreeVel)."""
  dtype = d.qpos.dtype
  mass = m.body_mass
  # body CoM linear velocity in world frame
  off = d.xipos - d.subtree_com[m.body_rootid]
  ang = d.cvel[:, :3]
  lin = d.cvel[:, 3:] - jnp.cross(off, ang)
  sub = jnp.asarray(m.tree.subtree_mask, dtype)
  mom = mass[:, None] * lin
  subtree_mass = jnp.maximum(sub @ mass, 1e-12)
  linvel = (sub @ mom) / subtree_mass[:, None]

  # angular momentum about subtree com
  # body spin momentum: I_world @ ang where I_world from ximat/inertia
  I3 = d.ximat @ (m.body_inertia[:, :, None] *
                  jnp.swapaxes(d.ximat, -1, -2))
  spin = jnp.einsum('bij,bj->bi', I3, ang)
  # orbital term: m * (xipos - subtree_com[root-of-subtree]) x (v - v_com)
  # computed per (subtree, body) pair via the mask
  com_s = d.subtree_com  # (nbody, 3) subtree com of each body
  rel_p = d.xipos[None, :, :] - com_s[:, None, :]  # (s, b, 3)
  rel_v = lin[None, :, :] - linvel[:, None, :]
  orb = jnp.cross(rel_p, rel_v) * mass[None, :, None]
  angmom = jnp.einsum('sb,sbi->si', sub, orb + spin[None, :, :])
  return linvel, angmom


def _contact_sensor(m: types.Model, d: types.Data, sd, ids):
  """Structured contact sensor (reference: sensor.py:1809/2331).

  Matching (geom/body/subtree operands) is static because the contact
  slot table is static; only the found mask, site containment, ordering
  criteria and field values are dynamic.  Per-sensor dataspec bits:
  found|force|torque|dist|pos|normal|tangent; reduce: 0 none, 1 mindist,
  2 maxforce, 3 netforce.
  """
  dtype = d.qpos.dtype
  con = d.contact
  if m.ncon == 0:
    for s in ids:
      adr_s, dim_s = int(m.sensor_adr[s]), int(m.sensor_dim[s])
      sd = sd.at[adr_s:adr_s + dim_s].set(0.0)
    return sd

  # full margin per slot (gathered: slot identity is per-world dynamic
  # under contact compaction)
  safe_cand = jnp.maximum(con.cand, 0)
  marg = jnp.where(con.cand >= 0, m.cand_margin[safe_cand], 0.0)
  wrench = smooth._contact_forces_local(m, d)  # (ncon, 6) contact frame
  gb = jnp.asarray(m.geom_bodyid)
  b1s = gb[con.geom1]
  b2s = gb[con.geom2]
  sub = m.tree.subtree_mask  # (nbody, nbody): sub[i, j] = j in subtree(i)

  def check(b, g, ot, oi):
    """(ncon,) bool: does slot operand (b, g) match sensor operand?"""
    if ot == 0 or ot == _OT.SITE:  # UNKNOWN matches all; SITE is dynamic
      return jnp.ones(b.shape, bool)
    if ot == _OT.GEOM:
      return g == oi
    if ot == _OT.BODY:
      return b == oi
    if ot == _OT.XBODY:
      return jnp.asarray(sub[oi])[b]
    return jnp.zeros(b.shape, bool)

  _FIELD_DIMS = (1, 3, 3, 1, 3, 3, 3)
  for s in ids:
    s = int(s)
    ot1, oi1 = int(m.sensor_objtype[s]), int(m.sensor_objid[s])
    ot2, oi2 = int(m.sensor_reftype[s]), int(m.sensor_refid[s])
    dataspec = int(m.sensor_intprm[s, 0])
    reduce = int(m.sensor_intprm[s, 1])
    adr_s, dim_s = int(m.sensor_adr[s]), int(m.sensor_dim[s])
    flags = [bool(dataspec & (1 << i)) for i in range(7)]
    size = sum(dm for f, dm in zip(flags, _FIELD_DIMS) if f)
    num = dim_s // size

    # dynamic matching over all slots (reference: sensor.py contact
    # matching; geom pairing is per-world under compaction)
    m11 = check(b1s, con.geom1, ot1, oi1)
    m12 = check(b2s, con.geom2, ot1, oi1)
    m21 = check(b1s, con.geom1, ot2, oi2)
    m22 = check(b2s, con.geom2, ot2, oi2)
    matched = (m11 | m12) & (m21 | m22)
    dir_f = jnp.ones((m.ncon,), dtype)
    if ot1 != 0 and ot2 != 0:
      regular = m11 & m22
      reverse = m12 & m21
      matched = matched & (regular | reverse)
      dir_f = jnp.where(reverse & ~regular, -1.0, 1.0).astype(dtype)
    elif ot1 != 0:
      dir_f = jnp.where(m11, 1.0, -1.0).astype(dtype)
    elif ot2 != 0:
      dir_f = jnp.where(m22, 1.0, -1.0).astype(dtype)

    sd = sd.at[adr_s:adr_s + dim_s].set(0.0)
    kk = np.arange(m.ncon)
    dirv = dir_f[:, None]
    found = matched & (con.dist < marg)
    if ot1 == _OT.SITE:
      found = found & _inside_site(m, d, oi1, con.pos)
    nmatch = jnp.sum(found.astype(dtype))
    w = wrench * dirv  # (ncon, 6) directed local wrench
    frame = con.frame

    if reduce == 3:  # netforce: force-weighted centroid wrench
      fmask = found.astype(dtype)[:, None]
      weight = jnp.linalg.norm(wrench[kk, :3], axis=-1,
                               keepdims=True) * fmask
      f_g = jnp.einsum('nij,ni->nj', frame, w[:, :3]) * fmask
      t_g = jnp.einsum('nij,ni->nj', frame, w[:, 3:]) * fmask
      net_pos = jnp.sum(weight * con.pos[kk], 0) / jnp.maximum(
          jnp.sum(weight), 1e-15)
      net_f = jnp.sum(f_g, 0)
      net_t = (jnp.sum(t_g + jnp.cross(con.pos[kk], f_g), 0) -
               jnp.cross(net_pos, net_f))
      vals = [nmatch[None], net_f, net_t, jnp.zeros((1,), dtype),
              net_pos, jnp.asarray([1.0, 0, 0], dtype),
              jnp.asarray([0.0, 1, 0], dtype)]
      row = jnp.concatenate([v for f, v in zip(flags, vals) if f])
      sd = sd.at[adr_s:adr_s + size].set(row.astype(dtype))
      continue

    # build per-candidate value rows (nc, size)
    cols = []
    if flags[0]:
      cols.append(jnp.broadcast_to(nmatch[None, None], (len(kk), 1)))
    if flags[1]:
      cols.append(jnp.stack([wrench[kk, 0], wrench[kk, 1], w[:, 2]], -1))
    if flags[2]:
      cols.append(jnp.stack([wrench[kk, 3], wrench[kk, 4], w[:, 5]], -1))
    if flags[3]:
      cols.append(con.dist[kk][:, None])
    if flags[4]:
      cols.append(con.pos[kk])
    if flags[5]:
      cols.append(frame[:, 0] * dirv)
    if flags[6]:
      cols.append(frame[:, 1] * dirv)
    V = jnp.concatenate(cols, -1)

    if reduce == 1:  # mindist
      crit = con.dist[kk]
    elif reduce == 2:  # maxforce
      crit = -jnp.sum(wrench[kk, :3] ** 2, -1)
    else:
      crit = jnp.arange(len(kk), dtype=dtype)
    crit = jnp.where(found, crit, jnp.inf)
    order = jnp.argsort(crit)

    take = min(num, len(kk))
    rows = V[order[:take]]
    valid = (jnp.arange(take, dtype=dtype) < nmatch)[:, None]
    rows = rows * valid.astype(dtype)
    sd = sd.at[adr_s:adr_s + take * size].set(
        rows.reshape(-1).astype(dtype))
  return sd


def _sensor_tactile(m: types.Model, d: types.Data, sd):
  """Tactile (taxel) sensors (reference: sensor.py:2181 _sensor_tactile).

  Per taxel vertex of the sensor mesh: channel 0 = max penetration depth
  of the taxel inside any geom in active contact with the sensor's
  parent weld (SDF query), channels 1/2 = summed |relative velocity|
  along the taxel tangents.  Candidate geoms are static (pair table);
  the active-contact gate is evaluated on device from the contact slots.
  """
  from mujoco_warp_tpu.ops import collision_sdf
  dtype = sd.dtype
  gb = jnp.asarray(m.geom_bodyid)  # flex-extended
  weldv = jnp.asarray(m.body_weldid)
  con = d.contact
  if m.ncon:
    cw1 = weldv[gb[con.geom1]]
    cw2 = weldv[gb[con.geom2]]
    con_active = con.dist < con.includemargin
  for (adr, gid, pweld, verts, frame, has_frame, cands, ctypes) in \
      m.tactile_specs:
    nvert = verts.shape[0]
    if not len(cands):
      continue
    xmat = d.geom_xmat[gid]
    xpos_t = d.geom_xpos[gid][None] + jnp.asarray(verts, dtype) @ xmat.T
    # C-oracle convention: the taxel tangent frame is mesh_quat-rotated
    # at model build and does NOT follow the body's world orientation
    # (see io._tactile_specs); frame is used as-is
    fr_w = jnp.asarray(frame, dtype)
    cvp = d.cvel[pweld]
    vel_s = cvp[3:][None] + jnp.cross(
        cvp[:3][None], xpos_t - d.subtree_com[m.body_rootid[pweld]][None])
    ch0 = jnp.zeros((nvert,), dtype)
    ch1 = jnp.zeros((nvert,), dtype)
    ch2 = jnp.zeros((nvert,), dtype)
    for c, ct in zip(cands, ctypes):
      c = int(c)
      # gate: candidate has an active contact against the parent weld
      if m.ncon:
        gate = jnp.any(con_active &
                       (((cw1 == pweld) & (con.geom2 == c)) |
                        ((cw2 == pweld) & (con.geom1 == c))))
      else:
        gate = jnp.asarray(True)
      lpos = jnp.einsum('ij,vi->vj', d.geom_xmat[c],
                        xpos_t - d.geom_xpos[c][None])
      fn = m.geom_sdf_fn[c] if len(m.geom_sdf_fn) > c else None
      if fn is not None:
        sdfv = fn(lpos, m.geom_size[c])
      else:
        sdfv = collision_sdf.sdf_primitive(ct, lpos, m.geom_size[c][None])
      depth = jnp.minimum(sdfv, 0.0)
      touching = (depth < 0.0) & gate
      bc = int(m.geom_bodyid[c])
      cvc = d.cvel[bc]
      vel_o = cvc[3:] + jnp.cross(
          cvc[:3], d.geom_xpos[c] - d.subtree_com[m.body_rootid[bc]])
      vrel = vel_s - vel_o[None]
      ch0 = jnp.maximum(ch0, jnp.where(touching, -depth, 0.0))
      if has_frame:
        ch1 = ch1 + jnp.where(
            touching, jnp.abs(jnp.sum(vrel * fr_w[:, 1], -1)), 0.0)
        ch2 = ch2 + jnp.where(
            touching, jnp.abs(jnp.sum(vrel * fr_w[:, 2], -1)), 0.0)
    sd = sd.at[adr:adr + nvert].set(ch0)
    sd = sd.at[adr + nvert:adr + 2 * nvert].set(ch1)
    sd = sd.at[adr + 2 * nvert:adr + 3 * nvert].set(ch2)
  return sd


def sensor_acc(m: types.Model, d: types.Data) -> types.Data:
  """Acceleration-stage sensors (reference: sensor.py:2507)."""
  if not m.nsensor or (m.opt.disableflags & types.DisableBit.SENSOR):
    return d
  dtype = d.qpos.dtype
  g = _groups(m, [
      _ST.TOUCH, _ST.ACCELEROMETER, _ST.FORCE, _ST.TORQUE,
      _ST.ACTUATORFRC, _ST.JOINTACTFRC, _ST.TENDONACTFRC,
      _ST.JOINTLIMITFRC, _ST.TENDONLIMITFRC, _ST.FRAMELINACC,
      _ST.FRAMEANGACC, _ST.CONTACT,
  ])
  if m.tactile_specs:
    d = d.replace(sensordata=_sensor_tactile(m, d, d.sensordata))
  if not g:
    return _finish_acc(m, d)
  d = smooth.rne_postconstraint(m, d)
  sd = d.sensordata

  for t, ids in g.items():
    adr = m.sensor_adr[ids]
    objid = m.sensor_objid[ids]
    objtype = m.sensor_objtype[ids]
    if t == _ST.ACTUATORFRC:
      sd = _write(sd, adr, 1, d.actuator_force[objid])
    elif t == _ST.JOINTACTFRC:
      sd = _write(sd, adr, 1, d.qfrc_actuator[m.jnt_dofadr[objid]])
    elif t == _ST.TENDONACTFRC:
      # sum of actuator_force over tendon-transmission actuators acting
      # on this tendon (reference: sensor.py:1598) — static match matrix
      is_ten = (m.actuator_trntype == types.TrnType.TENDON)
      match = (is_ten[None, :] &
               (m.actuator_trnid[None, :, 0] == objid[:, None]))
      vals = jnp.asarray(match, dtype) @ d.actuator_force
      sd = _write(sd, adr, 1, vals)
    elif t in (_ST.JOINTLIMITFRC, _ST.TENDONLIMITFRC):
      kind = 'jnt' if t == _ST.JOINTLIMITFRC else 'ten'
      rows = _limit_row_for(m, kind, objid)
      rr = np.maximum(rows, 0)
      vals = jnp.where(jnp.asarray(rows >= 0) & d.efc_active[rr],
                       d.efc_force[rr], 0.0)
      sd = _write(sd, adr, 1, vals)
    elif t == _ST.ACCELEROMETER:
      body = m.site_bodyid[objid]
      ang, lin = _point_acc(m, d, d.site_xpos[objid], body)
      rt = jnp.swapaxes(d.site_xmat[objid], -1, -2)
      sd = _write(sd, adr, 3, jnp.einsum('nij,nj->ni', rt, lin))
    elif t in (_ST.FRAMELINACC, _ST.FRAMEANGACC):
      body = _obj_body(m, objtype, objid)
      pos = _obj_pos(m, d, objtype, objid)
      ang, lin = _point_acc(m, d, pos, body)
      sd = _write(sd, adr, 3, lin if t == _ST.FRAMELINACC else ang)
    elif t in (_ST.FORCE, _ST.TORQUE):
      body = m.site_bodyid[objid]
      # cfrc_int at body, translated to site position, in site frame
      off = d.site_xpos[objid] - d.subtree_com[m.body_rootid[body]]
      cf = d.cfrc_int[body]
      trq = cf[:, :3] - jnp.cross(off, cf[:, 3:])
      frc = cf[:, 3:]
      rt = jnp.swapaxes(d.site_xmat[objid], -1, -2)
      val = frc if t == _ST.FORCE else trq
      sd = _write(sd, adr, 3, jnp.einsum('nij,nj->ni', rt, val))
    elif t == _ST.CONTACT:
      sd = _contact_sensor(m, d, sd, ids)
    elif t == _ST.TOUCH:
      # sum of normal contact forces on the site's body whose contact
      # point lies in the site zone; approximated by body match (zone test
      # refined later with site geometry).  The (site, contact) match
      # matrix is static → one masked matvec.
      body = jnp.asarray(m.site_bodyid[objid])
      forces = smooth._contact_forces(m, d)
      con = d.contact
      fn = jnp.linalg.norm(forces[:, 3:], axis=-1)
      active = (con.dist < con.includemargin).astype(dtype)
      gb = jnp.asarray(m.geom_bodyid)
      b1 = gb[con.geom1]
      b2 = gb[con.geom2]
      match = ((b1[None, :] == body[:, None]) |
               (b2[None, :] == body[:, None]))  # (nt, ncon) dynamic
      vals = jnp.sum(jnp.where(match, (fn * active)[None, :], 0.0), axis=1)
      sd = _write(sd, adr, 1, vals)
  d = d.replace(sensordata=_apply_cutoff(m, sd, stage='acc'))
  return _finish_acc(m, d)


def _finish_acc(m: types.Model, d: types.Data) -> types.Data:
  """Post-sensor-stage delay application (runs even with no acc sensors)."""
  if m.callback is not None and m.callback.sensor:
    d = m.callback.sensor(m, d, types.Stage.ACC)  # ref: sensor.py:2761
  if m.nhistory:
    from mujoco_warp_tpu.ops import history as history_ops
    d = history_ops.apply_sensor_delay(m, d)
  return d


def _apply_cutoff(m: types.Model, sd, stage):
  """Clamp sensordata by per-sensor cutoff (mjDATATYPE semantics)."""
  cut_host = np.asarray(jax.device_get(m.sensor_cutoff))
  if not np.any(cut_host > 0):
    return sd
  # build static per-element cutoff/datatype tables (host-side snapshot:
  # per-element jnp indexing would trace and break device_get)
  cut = np.zeros(m.nsensordata, np.float32)
  positive = np.zeros(m.nsensordata, bool)
  for s in range(m.nsensor):
    c = float(cut_host[s])
    a, dim = int(m.sensor_adr[s]), int(m.sensor_dim[s])
    cut[a:a + dim] = c
    positive[a:a + dim] = m.sensor_datatype[s] == 1  # mjDATATYPE_POSITIVE
  cutj = jnp.asarray(cut)
  has = cutj > 0
  lo = jnp.where(jnp.asarray(positive), 0.0, -cutj)
  return jnp.where(has, jnp.clip(sd, lo, cutj), sd)


def _energy_pos_value(m: types.Model, d: types.Data):
  """Potential energy: gravity + joint/tendon springs (sensor.py:2927)."""
  dtype = d.qpos.dtype
  e = jnp.zeros((), dtype)
  if not (m.opt.disableflags & types.DisableBit.GRAVITY):
    e = e - jnp.sum(m.body_mass[:, None] * d.xipos *
                    m.opt.gravity.astype(dtype)[None, :])
  if not (m.opt.disableflags & types.DisableBit.SPRING):
    # joint springs
    for jt in np.unique(m.jnt_type):
      jids = np.nonzero(m.jnt_type == jt)[0]
      k = m.jnt_stiffness[jids]
      qadr = m.jnt_qposadr[jids]
      if jt in (types.JointType.SLIDE, types.JointType.HINGE):
        dif = d.qpos[qadr] - m.qpos_spring[qadr]
        e = e + 0.5 * jnp.sum(k * dif * dif)
      elif jt == types.JointType.BALL:
        q = math.normalize_quat(
            jnp.stack([d.qpos[qadr + i] for i in range(4)], -1))
        qs = math.normalize_quat(
            jnp.stack([m.qpos_spring[qadr + i] for i in range(4)], -1))
        dif = math.quat_sub(q, qs)
        e = e + 0.5 * jnp.sum(k * jnp.sum(dif * dif, -1))
      else:  # FREE
        dp = jnp.stack([d.qpos[qadr + i] - m.qpos_spring[qadr + i]
                        for i in range(3)], -1)
        e = e + 0.5 * jnp.sum(k * jnp.sum(dp * dp, -1))
        q = math.normalize_quat(
            jnp.stack([d.qpos[qadr + 3 + i] for i in range(4)], -1))
        qs = math.normalize_quat(
            jnp.stack([m.qpos_spring[qadr + 3 + i] for i in range(4)], -1))
        dif = math.quat_sub(q, qs)
        e = e + 0.5 * jnp.sum(k * jnp.sum(dif * dif, -1))
    if m.ntendon:
      lo = m.tendon_lengthspring[:, 0]
      hi = m.tendon_lengthspring[:, 1]
      dif = jnp.where(d.ten_length > hi, d.ten_length - hi,
                      jnp.where(d.ten_length < lo, d.ten_length - lo, 0.0))
      e = e + 0.5 * jnp.sum(m.tendon_stiffness * dif * dif)
  return e


def _energy_vel_value(m: types.Model, d: types.Data):
  """Kinetic energy 0.5 vᵀMv (sensor.py:2997)."""
  from mujoco_warp_tpu.ops import smooth
  return 0.5 * jnp.dot(d.qvel, smooth.mul_m(m, d, d.qvel))


def energy_pos(m: types.Model, d: types.Data) -> types.Data:
  if not (m.opt.enableflags & types.EnableBit.ENERGY):
    return d
  return d.replace(energy=d.energy.at[0].set(_energy_pos_value(m, d)))


def energy_vel(m: types.Model, d: types.Data) -> types.Data:
  if not (m.opt.enableflags & types.EnableBit.ENERGY):
    return d
  return d.replace(energy=d.energy.at[1].set(_energy_vel_value(m, d)))
