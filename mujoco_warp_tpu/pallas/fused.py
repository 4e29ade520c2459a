"""Fused lanes-last whole-step pipeline (the flagship fast path).

The general engine path keeps ``Data`` world-major ``(nworld, ...)`` and
vmaps single-world stages; on TPU that layout starves the 128-wide vector
lanes (a (nworld, 3) array uses 3/128 lanes) and pays a transpose at every
Pallas-kernel boundary.  This module flips the *entire* batched step to
worlds-on-lanes ``(feature, nworld)`` form:

  K1 (Pallas): FK -> com_pos -> candidate narrowphase -> crb -> qM ->
      Cholesky -> com_vel -> RNE, one VMEM-resident kernel per 128-world
      tile (reference: smooth.py:448/825/1080/1341/1500,
      collision_driver.py:885).
  XLA glue (lanes-last): actuation + passive forces + per-condim-class
      contact compaction — a one-hot rank-match contraction over the
      candidate axis (the fixed-shape analog of the reference's atomic
      slot allocation, collision_core.py:214); it lives in XLA, not
      Mosaic, because the rank-3 contraction compiles in seconds under
      XLA vs >15 min under Mosaic.
  K4 (Pallas): constraint-row assembly (limits + contacts, exact KBI
      semantics, constraint.py:83-152/3743) -> Newton solve
      (pallas/solver.solve_core) -> Euler integrate (forward.py:276/388).

State flows between steps in lane form (``FusedState``), so a rollout
pays layout conversion once, not per step.  Models outside the supported
feature set fall back to the general path (ops/forward.step).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mujoco_warp_tpu import types
from mujoco_warp_tpu.pallas import smooth as psmooth
from mujoco_warp_tpu.pallas import solver as psolver
from mujoco_warp_tpu.pallas.solver import (TILE_W, _chol_solve_tile,
                                           _chol_tile)

_JT = types.JointType
_GT = types.GeomType
_MINVAL = 1e-15
_BIGW = 1e10
MJ_MINIMP = 0.0001
MJ_MAXIMP = 0.9999

# narrowphase pair types implemented in lane form (groups are
# (k contact points, collider fn) — see _narrowphase below)
_FUSED_COLLIDERS = {
    (_GT.PLANE, _GT.SPHERE),
    (_GT.PLANE, _GT.CAPSULE),
    (_GT.PLANE, _GT.BOX),
    (_GT.SPHERE, _GT.SPHERE),
    (_GT.SPHERE, _GT.CAPSULE),
    (_GT.SPHERE, _GT.BOX),
    (_GT.CAPSULE, _GT.CAPSULE),
    (_GT.CAPSULE, _GT.BOX),
}

# sensor types the fused rollout evaluates (world-major XLA glue after
# K4, reusing the general-path sensor stages — see _sensor_eval); types
# needing actuator/tendon state or efc-row introspection stay on the
# general path
_ST = types.SensorType
_FUSED_SENSOR_TYPES = {
    int(t) for t in (
        _ST.TOUCH, _ST.ACCELEROMETER, _ST.VELOCIMETER, _ST.GYRO,
        _ST.FORCE, _ST.TORQUE, _ST.MAGNETOMETER, _ST.JOINTPOS,
        _ST.JOINTVEL, _ST.FRAMEPOS, _ST.FRAMEQUAT, _ST.FRAMEXAXIS,
        _ST.FRAMEYAXIS, _ST.FRAMEZAXIS, _ST.FRAMELINVEL, _ST.FRAMEANGVEL,
        _ST.FRAMELINACC, _ST.FRAMEANGACC, _ST.SUBTREECOM,
        _ST.SUBTREELINVEL, _ST.SUBTREEANGMOM, _ST.CLOCK)
}


def _sensors_ok(m: types.Model) -> bool:
  if not m.nsensor:
    return True
  if not set(int(t) for t in m.sensor_type) <= _FUSED_SENSOR_TYPES:
    return False
  # camera-frame operands would need camlight in the glue
  ot = np.concatenate([np.asarray(m.sensor_objtype),
                       np.asarray(m.sensor_reftype)])
  return not np.any(ot == int(types.ObjType.CAMERA))


# ------------------------------------------------------------ lane helpers
# All per-body/per-joint values are 2D (rows, W); grouped narrowphase
# values are 3D (n, rows, W).  Constants enter as python floats so zero
# terms fold away at trace time.


def _rows(x, i, n=1):
  return x[i:i + n]


def _qmul(u, v):
  """(4, W) x (4, W) quaternion product."""
  u0, u1, u2, u3 = u[0:1], u[1:2], u[2:3], u[3:4]
  v0, v1, v2, v3 = v[0:1], v[1:2], v[2:3], v[3:4]
  return jnp.concatenate([
      u0 * v0 - u1 * v1 - u2 * v2 - u3 * v3,
      u0 * v1 + u1 * v0 + u2 * v3 - u3 * v2,
      u0 * v2 - u1 * v3 + u2 * v0 + u3 * v1,
      u0 * v3 + u1 * v2 - u2 * v1 + u3 * v0], axis=0)


def _qmul_const(u, c):
  """(4, W) quaternion times a static numpy quaternion (zeros fold)."""
  c = [float(x) for x in c]
  if c == [1.0, 0.0, 0.0, 0.0]:
    return u
  u0, u1, u2, u3 = u[0:1], u[1:2], u[2:3], u[3:4]

  def t(*terms):
    acc = None
    for coef, val in terms:
      if coef == 0.0:
        continue
      term = val * coef if coef != 1.0 else val
      acc = term if acc is None else acc + term
    return acc if acc is not None else jnp.zeros_like(u0)

  return jnp.concatenate([
      t((c[0], u0), (-c[1], u1), (-c[2], u2), (-c[3], u3)),
      t((c[1], u0), (c[0], u1), (c[3], u2), (-c[2], u3)),
      t((c[2], u0), (-c[3], u1), (c[0], u2), (c[1], u3)),
      t((c[3], u0), (c[2], u1), (-c[1], u2), (c[0], u3))], axis=0)


def _qnormalize(q):
  n = jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=0, keepdims=True), _MINVAL))
  return q / n


def _q2mat(q):
  """(4, W) quat -> (9, W) row-major rotation matrix."""
  w, x, y, z = q[0:1], q[1:2], q[2:3], q[3:4]
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  return jnp.concatenate([
      1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
      2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
      2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=0)


def _mat_vec_const(R, c):
  """(9, W) row-major matrix times static numpy vec -> (3, W)."""
  c = [float(x) for x in c]
  out = []
  for r in range(3):
    acc = None
    for k in range(3):
      if c[k] == 0.0:
        continue
      term = R[3 * r + k:3 * r + k + 1]
      term = term * c[k] if c[k] != 1.0 else term
      acc = term if acc is None else acc + term
    out.append(acc if acc is not None else jnp.zeros_like(R[0:1]))
  return jnp.concatenate(out, axis=0)


def _qrot_const(c, q):
  """Rotate static numpy vec c by quat (4, W) -> (3, W)."""
  if float(c[0]) == 0.0 and float(c[1]) == 0.0 and float(c[2]) == 0.0:
    return None  # caller treats as zero
  return _mat_vec_const(_q2mat(q), c)


def _add(a, b):
  if b is None:
    return a
  return a + b


def _cross(a, b):
  """(3, W) x (3, W)."""
  return jnp.concatenate([
      a[1:2] * b[2:3] - a[2:3] * b[1:2],
      a[2:3] * b[0:1] - a[0:1] * b[2:3],
      a[0:1] * b[1:2] - a[1:2] * b[0:1]], axis=0)


def _dot(a, b):
  return jnp.sum(a * b, axis=0, keepdims=True)


# 3D grouped forms (n, 3, W)
def _gdot(a, b):
  return jnp.sum(a * b, axis=1, keepdims=True)  # (n, 1, W)


def _gcross(a, b):
  return jnp.concatenate([
      a[:, 1:2] * b[:, 2:3] - a[:, 2:3] * b[:, 1:2],
      a[:, 2:3] * b[:, 0:1] - a[:, 0:1] * b[:, 2:3],
      a[:, 0:1] * b[:, 1:2] - a[:, 1:2] * b[:, 0:1]], axis=1)


def _gnorm(a):
  return jnp.sqrt(jnp.maximum(_gdot(a, a), _MINVAL))


def _make_frame_g(normal):
  """(n, 3, W) normal -> (n, 9, W) contact frame rows [n, t1, t2]."""
  a = normal / _gnorm(normal)
  # pick the reference axis least aligned with a (ops/math.orthogonals)
  cond = jnp.abs(a[:, 1:2]) < 0.9
  y0 = jnp.where(cond, 0.0, 0.0) * a[:, 0:1]
  y1 = jnp.where(cond, 1.0, 0.0) + 0.0 * a[:, 0:1]
  y2 = jnp.where(cond, 0.0, 1.0) + 0.0 * a[:, 0:1]
  y = jnp.concatenate([y0, y1, y2], axis=1)
  b = y - a * _gdot(a, y)
  b = b / _gnorm(b)
  c = _gcross(a, b)
  return jnp.concatenate([a, b, c], axis=1)


# --------------------------------------------------------------- supported


def supported(m: types.Model, d: types.Data) -> bool:
  """Strict feature gate for the fused path (fallback: ops/forward.step)."""
  if d.qpos.ndim != 2 or d.qpos.shape[0] % TILE_W != 0:
    return False
  if jax.default_backend() == 'cpu':
    return False
  return supported_features(m)


def supported_features(m: types.Model) -> bool:
  o = m.opt
  dsbl = o.disableflags
  if o.enableflags & types.EnableBit.SLEEP:
    return False
  if m.callback is not None:  # user hooks run in the general path only
    return False
  if m.nflex:
    return False
  # scale gate: the whole-step kernels unroll over bodies/candidates;
  # beyond this the Mosaic compile blows up (three_humanoids at
  # ncand=1614/nv=81 crashes the TPU compiler) — the general stage-split
  # path with the solver/mass-chain megakernels handles large scenes
  if m.nv > 64 or m.ncand > 512 or m.nbody > 32:
    return False
  # EULER rides the damped in-kernel factor; IMPLICITFAST is admitted
  # because for this gate's feature class the smooth-force velocity
  # derivative is exactly −diag(dof_damping) (no tendons, FIXED gain,
  # NONE bias ⇒ ∂qfrc_actuator/∂qvel = 0, derivative.py:32), so
  # (M − h·qDeriv) == (M + h·diag(damping)) — the same lane Cholesky K4
  # already builds for Euler's implicit damping (reference forward.py:579
  # vs :388: identical linear solve for this class).
  if o.integrator not in (types.IntegratorType.EULER,
                          types.IntegratorType.IMPLICITFAST):
    return False
  if o.solver != types.SolverType.NEWTON:
    return False
  if o.cone != types.ConeType.PYRAMIDAL:
    return False
  if dsbl & (types.DisableBit.CONSTRAINT | types.DisableBit.CONTACT |
             types.DisableBit.LIMIT | types.DisableBit.ACTUATION |
             types.DisableBit.SPRING | types.DisableBit.DAMPER |
             types.DisableBit.GRAVITY | types.DisableBit.WARMSTART |
             types.DisableBit.CLAMPCTRL):
    return False
  if m.ntendon or m.na or m.nhistory or m.nmocap:
    return False
  if m.neq:
    # JOINT equality between 1-dof hinge/slide joints rides K4's dense
    # eq rows (_eq_joint_tables); connect/weld need body xpos in-kernel
    # (pending), tendon/flex need their machinery — general path
    lay = m.efc
    if (len(lay.connect_id) or len(lay.weld_id) or len(lay.tendon_id) or
        len(lay.flex_id)):
      return False
    for eqid in lay.joint_id:
      for j in (int(m.eq_obj1id[eqid]), int(m.eq_obj2id[eqid])):
        if j >= 0 and int(m.jnt_type[j]) not in (int(_JT.HINGE),
                                                 int(_JT.SLIDE)):
          return False
  if not _sensors_ok(m):
    return False
  if m.nf:  # dof/tendon friction rows: not yet in the fused assembler
    return False
  # joints: free/hinge/slide (ball quats pending)
  if not set(int(t) for t in m.jnt_type) <= {int(_JT.FREE), int(_JT.HINGE),
                                             int(_JT.SLIDE)}:
    return False
  # limits only on hinge/slide
  if len(m.efc.lim_ten_id):
    return False
  for j in m.efc.lim_jnt_id:
    if int(m.jnt_type[j]) == int(_JT.BALL):
      return False
  # actuators: joint transmission, fixed gain, no bias/dynamics
  if m.nu:
    if not (np.all(m.actuator_trntype == types.TrnType.JOINT) and
            np.all(m.actuator_gaintype == types.GainType.FIXED) and
            np.all(m.actuator_biastype == types.BiasType.NONE) and
            np.all(m.actuator_dyntype == types.DynType.NONE)):
      return False
    if np.any(m.jnt_actgravcomp) or np.any(m.jnt_actfrclimited):
      return False
    # joint transmission on multi-dof joints needs the full gear map
    for u in range(m.nu):
      j = int(m.actuator_trnid[u, 0])
      if int(m.jnt_type[j]) not in (int(_JT.HINGE), int(_JT.SLIDE)):
        return False
  # passive: springs on hinge/slide only, no fluid/gravcomp
  stiff = np.asarray(jax.device_get(m.jnt_stiffness))
  for j in np.nonzero(stiff > 0)[0]:
    if int(m.jnt_type[j]) not in (int(_JT.HINGE), int(_JT.SLIDE)):
      return False
  if (float(jax.device_get(m.opt.density)) != 0.0 or
      float(jax.device_get(m.opt.viscosity)) != 0.0):
    return False
  if np.any(np.asarray(jax.device_get(m.body_gravcomp)) != 0):
    return False
  # collisions: lane-form colliders only; K4's contact assembly builds
  # frictionless (1) and pyramidal (3/4/6) rows incl. torsion/roll
  if m.opt.run_collision_detection:
    for (t1, t2, idx, slot) in m.pair_groups:
      if (int(t1), int(t2)) not in _FUSED_COLLIDERS:
        return False
    if m.ncand and not set(
        int(x) for x in np.asarray(m.con_dim)) <= {1, 3, 4, 6}:
      return False
  return True


# ------------------------------------------------- K1: position megakernel


def _narrowphase(m: types.Model, gx, gmat, sizes, dtype):
  """All candidate contacts, grouped lane form.

  gx/gmat: per-geom lists of (3, W)/(9, W); sizes: (ngeom*3, 1) kernel
  input (Pallas kernels cannot capture non-trivial constants).  Returns
  dist (ncand, W), pos (ncand*3, W), frame (ncand*9, W) in candidate-slot
  order (contact-point-major per group, matching io's con_pair layout).
  """

  dists, poss, frames = [], [], []
  for (t1, t2, idx, slot) in m.pair_groups:
    g1 = m.pair_geom1[idx]
    g2 = m.pair_geom2[idx]
    n = len(idx)
    P1 = jnp.stack([gx[int(g)] for g in g1], axis=0)  # (n, 3, W)
    P2 = jnp.stack([gx[int(g)] for g in g2], axis=0)
    key = (int(t1), int(t2))

    def col_z(glist):
      return jnp.stack(
          [jnp.concatenate([gmat[int(g)][2:3], gmat[int(g)][5:6],
                            gmat[int(g)][8:9]], axis=0) for g in glist],
          axis=0)  # (n, 3, W)

    W = gx[0].shape[-1]

    def szcol(glist, comp):  # per-geom size component -> (n, 1, W)
      # lane-broadcast each (1, 1) scalar before stacking: Mosaic cannot
      # broadcast sublanes and lanes in one op
      return jnp.stack(
          [jnp.broadcast_to(
              sizes[3 * int(g) + comp:3 * int(g) + comp + 1], (1, W))
           for g in glist], axis=0)

    if key == (_GT.PLANE, _GT.SPHERE):
      nrm = col_z(g1)
      r = szcol(g2, 0)
      h = _gdot(nrm, P2 - P1)
      dist = h - r
      pos = P2 - nrm * (r + 0.5 * dist)
      dists.append(dist)
      poss.append(pos)
      frames.append(_make_frame_g(nrm))
    elif key == (_GT.PLANE, _GT.CAPSULE):
      nrm = col_z(g1)
      axis = col_z(g2)
      r = szcol(g2, 0)
      half = szcol(g2, 1)
      seg = axis * half
      # frame tangent aligned with the capsule axis (reference:
      # collision_primitive_core.py:277-290); orientation is physical
      # under the pyramidal cone
      b = axis - nrm * _gdot(nrm, axis)
      bn = _gnorm(b)
      ny = jnp.abs(nrm[:, 1:2])
      fb = jnp.concatenate([
          jnp.zeros_like(ny),
          jnp.where(ny < 0.5, 1.0, 0.0),
          jnp.where(ny < 0.5, 0.0, 1.0)], axis=1)
      b = jnp.where(bn < 0.5, fb, b / bn)
      c = _gcross(nrm, b)
      frame = jnp.concatenate([nrm, b, c], axis=1)  # (n, 9, W)
      for sgn in (1.0, -1.0):
        cen = P2 + seg * sgn
        h = _gdot(nrm, cen - P1)
        dist = h - r
        pos = cen - nrm * (r + 0.5 * dist)
        dists.append(dist)
        poss.append(pos)
        frames.append(frame)
    elif key == (_GT.PLANE, _GT.BOX):
      # 4 deepest of the 8 box corners below the plane (the lane form of
      # collision_primitive.plane_box); selection is an index-tracked
      # 4-pass masked argmin so equal-height corners (flat resting) are
      # picked one at a time
      nrm = col_z(g1)
      mats = jnp.stack([gmat[int(g)] for g in g2], axis=0)  # (n, 9, W)
      sx, sy, sz = szcol(g2, 0), szcol(g2, 1), szcol(g2, 2)
      heights, corners = [], []
      for a in (-1.0, 1.0):
        for b in (-1.0, 1.0):
          for c in (-1.0, 1.0):
            lx, ly, lz = a * sx, b * sy, c * sz
            cw = P2 + jnp.concatenate([
                mats[:, 0:1] * lx + mats[:, 1:2] * ly + mats[:, 2:3] * lz,
                mats[:, 3:4] * lx + mats[:, 4:5] * ly + mats[:, 5:6] * lz,
                mats[:, 6:7] * lx + mats[:, 7:8] * ly + mats[:, 8:9] * lz,
            ], axis=1)
            heights.append(_gdot(nrm, cw - P1))
            corners.append(cw)
      frame = _make_frame_g(nrm)
      taken = [jnp.zeros_like(heights[0], bool) for _ in range(8)]
      for _pick in range(4):
        hmin = jnp.where(taken[0], _BIGW, heights[0])
        cmin = corners[0]
        idxm = jnp.zeros_like(hmin)
        for k in range(1, 8):
          hk = jnp.where(taken[k], _BIGW, heights[k])
          better = hk < hmin
          cmin = jnp.where(better, corners[k], cmin)
          idxm = jnp.where(better, float(k), idxm)
          hmin = jnp.where(better, hk, hmin)
        for k in range(8):
          taken[k] = taken[k] | (idxm == float(k))
        dists.append(hmin)
        poss.append(cmin - nrm * (0.5 * hmin))
        frames.append(frame)
    elif key == (_GT.SPHERE, _GT.BOX):
      # lane form of collision_primitive.sphere_box: clamp the sphere
      # center into the box (outside) or push to the nearest face (inside)
      r = szcol(g1, 0)
      mats = jnp.stack([gmat[int(g)] for g in g2], axis=0)
      dv = P1 - P2
      loc = jnp.concatenate([
          mats[:, 0:1] * dv[:, 0:1] + mats[:, 3:4] * dv[:, 1:2] +
          mats[:, 6:7] * dv[:, 2:3],
          mats[:, 1:2] * dv[:, 0:1] + mats[:, 4:5] * dv[:, 1:2] +
          mats[:, 7:8] * dv[:, 2:3],
          mats[:, 2:3] * dv[:, 0:1] + mats[:, 5:6] * dv[:, 1:2] +
          mats[:, 8:9] * dv[:, 2:3]], axis=1)
      size = jnp.concatenate([szcol(g2, 0), szcol(g2, 1), szcol(g2, 2)],
                             axis=1)
      cl = jnp.clip(loc, -size, size)
      inside = jnp.all(jnp.abs(loc) < size, axis=1, keepdims=True)
      fd = size - jnp.abs(loc)
      k01 = jnp.where(fd[:, 0:1] <= fd[:, 1:2], 0.0, 1.0)
      fd01 = jnp.minimum(fd[:, 0:1], fd[:, 1:2])
      kmin = jnp.where(fd01 <= fd[:, 2:3], k01, 2.0)
      sgn = jnp.sign(loc)
      sgn = jnp.where(sgn == 0, 1.0, sgn)
      pushed = jnp.concatenate([
          jnp.where(kmin == float(j), sgn[:, j:j + 1] * size[:, j:j + 1],
                    cl[:, j:j + 1]) for j in range(3)], axis=1)
      cll = jnp.where(inside, pushed, cl)
      cw = P2 + jnp.concatenate([
          mats[:, 0:1] * cll[:, 0:1] + mats[:, 1:2] * cll[:, 1:2] +
          mats[:, 2:3] * cll[:, 2:3],
          mats[:, 3:4] * cll[:, 0:1] + mats[:, 4:5] * cll[:, 1:2] +
          mats[:, 5:6] * cll[:, 2:3],
          mats[:, 6:7] * cll[:, 0:1] + mats[:, 7:8] * cll[:, 1:2] +
          mats[:, 8:9] * cll[:, 2:3]], axis=1)
      vec = cw - P1
      ln = _gnorm(vec)
      nrm = vec / ln
      dist = jnp.where(inside, -(ln + r), ln - r)
      nrm = jnp.where(inside, -nrm, nrm)
      dists.append(dist)
      poss.append(P1 + nrm * (r + 0.5 * dist))
      frames.append(_make_frame_g(nrm))
    elif key == (_GT.CAPSULE, _GT.BOX):
      # lane form of collision_primitive.capsule_box: sphere-box probes
      # at both endpoints + the segment point nearest the box center,
      # keep the 2 deepest (index-tracked selection)
      axis = col_z(g1)
      r = szcol(g1, 0)
      half = szcol(g1, 1)
      seg = axis * half
      mats = jnp.stack([gmat[int(g)] for g in g2], axis=0)
      size = jnp.concatenate([szcol(g2, 0), szcol(g2, 1), szcol(g2, 2)],
                             axis=1)

      def matT_mul(v):
        return jnp.concatenate([
            mats[:, 0:1] * v[:, 0:1] + mats[:, 3:4] * v[:, 1:2] +
            mats[:, 6:7] * v[:, 2:3],
            mats[:, 1:2] * v[:, 0:1] + mats[:, 4:5] * v[:, 1:2] +
            mats[:, 7:8] * v[:, 2:3],
            mats[:, 2:3] * v[:, 0:1] + mats[:, 5:6] * v[:, 1:2] +
            mats[:, 8:9] * v[:, 2:3]], axis=1)

      def mat_mul(v):
        return jnp.concatenate([
            mats[:, 0:1] * v[:, 0:1] + mats[:, 1:2] * v[:, 1:2] +
            mats[:, 2:3] * v[:, 2:3],
            mats[:, 3:4] * v[:, 0:1] + mats[:, 4:5] * v[:, 1:2] +
            mats[:, 5:6] * v[:, 2:3],
            mats[:, 6:7] * v[:, 0:1] + mats[:, 7:8] * v[:, 1:2] +
            mats[:, 8:9] * v[:, 2:3]], axis=1)

      e0, e1 = P1 - seg, P1 + seg
      mid = _closest_seg_point_g(e0, e1, P2)
      pd, pp, pn = [], [], []
      for center in (e0, e1, mid):
        rel = matT_mul(center - P2)
        cl = jnp.clip(rel, -size, size)
        closest = P2 + mat_mul(cl)
        vec = closest - center
        ln = _gnorm(vec)
        nrm = vec / ln
        di = ln - r
        pd.append(di)
        pp.append(center + nrm * (r + 0.5 * di))
        pn.append(nrm)
      taken = [jnp.zeros_like(pd[0], bool) for _ in range(3)]
      for _pick in range(2):
        dmin = jnp.where(taken[0], _BIGW, pd[0])
        pmin, nmin = pp[0], pn[0]
        idxm = jnp.zeros_like(dmin)
        for k in range(1, 3):
          dk = jnp.where(taken[k], _BIGW, pd[k])
          better = dk < dmin
          pmin = jnp.where(better, pp[k], pmin)
          nmin = jnp.where(better, pn[k], nmin)
          idxm = jnp.where(better, float(k), idxm)
          dmin = jnp.where(better, dk, dmin)
        for k in range(3):
          taken[k] = taken[k] | (idxm == float(k))
        dists.append(dmin)
        poss.append(pmin)
        frames.append(_make_frame_g(nmin))
    elif key == (_GT.SPHERE, _GT.SPHERE):
      r1 = szcol(g1, 0)
      r2 = szcol(g2, 0)
      dist, pos, nrm = _sphere_sphere_g(P1, r1, P2, r2)
      dists.append(dist)
      poss.append(pos)
      frames.append(_make_frame_g(nrm))
    elif key == (_GT.SPHERE, _GT.CAPSULE):
      r1 = szcol(g1, 0)
      axis = col_z(g2)
      r2 = szcol(g2, 0)
      half = szcol(g2, 1)
      seg = axis * half
      pt = _closest_seg_point_g(P2 - seg, P2 + seg, P1)
      dist, pos, nrm = _sphere_sphere_g(P1, r1, pt, r2)
      dists.append(dist)
      poss.append(pos)
      frames.append(_make_frame_g(nrm))
    elif key == (_GT.CAPSULE, _GT.CAPSULE):
      ax1 = col_z(g1) * szcol(g1, 1)
      ax2 = col_z(g2) * szcol(g2, 1)
      pa, pb = _closest_seg_seg_g(P1 - ax1, P1 + ax1, P2 - ax2, P2 + ax2)
      dist, pos, nrm = _sphere_sphere_g(
          pa, szcol(g1, 0), pb, szcol(g2, 0))
      dists.append(dist)
      poss.append(pos)
      frames.append(_make_frame_g(nrm))
    else:  # pragma: no cover — guarded by supported()
      raise NotImplementedError(key)

  W = dists[0].shape[-1]
  dist = jnp.concatenate([x.reshape(-1, W) for x in dists], axis=0)
  pos = jnp.concatenate([x.reshape(-1, W) for x in poss], axis=0)
  frame = jnp.concatenate([x.reshape(-1, W) for x in frames], axis=0)
  return dist, pos, frame


def _sphere_sphere_g(p1, r1, p2, r2):
  vec = p2 - p1
  ln = _gnorm(vec)
  n = vec / ln
  dist = ln - (r1 + r2)  # (n, 1, W)
  pos = p1 + n * (r1 + 0.5 * dist)
  return dist, pos, n


def _closest_seg_point_g(a, b, p):
  ab = b - a
  t = _gdot(p - a, ab) / jnp.maximum(_gdot(ab, ab), _MINVAL)
  t = jnp.clip(t, 0.0, 1.0)
  return a + ab * t


def _closest_seg_seg_g(a0, a1, b0, b1):
  da = a1 - a0
  db = b1 - b0
  r = a0 - b0
  A = _gdot(da, da)
  B = _gdot(da, db)
  C = _gdot(db, db)
  D = _gdot(da, r)
  E = _gdot(db, r)
  denom = A * C - B * B
  s = jnp.where(denom > 1e-12, (B * E - C * D) /
                jnp.maximum(denom, _MINVAL), 0.0)
  s = jnp.clip(s, 0.0, 1.0)
  t = jnp.clip((B * s + E) / jnp.maximum(C, _MINVAL), 0.0, 1.0)
  s2 = jnp.clip((B * t - D) / jnp.maximum(A, _MINVAL), 0.0, 1.0)
  return a0 + da * s2, b0 + db * t


def _fk(m: types.Model, qpos, dtype):
  """Lane-form FK: returns per-body xpos/xquat lists + per-joint
  xanchor/xaxis lists (reference: smooth.py:448)."""
  nb = m.nbody
  body_pos = np.asarray(jax.device_get(m.body_pos), np.float64)
  body_quat = np.asarray(jax.device_get(m.body_quat), np.float64)
  jnt_pos = np.asarray(jax.device_get(m.jnt_pos), np.float64)
  jnt_axis = np.asarray(jax.device_get(m.jnt_axis), np.float64)
  qpos0 = np.asarray(jax.device_get(m.qpos0), np.float64)

  W = qpos.shape[-1]
  z3 = jnp.zeros((3, W), dtype)
  id4 = jnp.concatenate([jnp.ones((1, W), dtype), jnp.zeros((3, W), dtype)],
                        axis=0)
  xpos = [z3] + [None] * (nb - 1)
  xquat = [id4] + [None] * (nb - 1)
  xanchor = [None] * m.njnt
  xaxis = [None] * m.njnt

  order = [int(b) for ids in m.tree.body_levels for b in ids]
  for b in order:
    p = int(m.body_parentid[b])
    pos = _add(xpos[p], _qrot_const(body_pos[b], xquat[p]))
    quat = _qmul_const(xquat[p], body_quat[b])
    for k in range(int(m.body_jntnum[b])):
      j = int(m.body_jntadr[b]) + k
      jt = int(m.jnt_type[j])
      qadr = int(m.jnt_qposadr[j])
      if jt == _JT.FREE:
        pos = qpos[qadr:qadr + 3]
        quat = _qnormalize(qpos[qadr + 3:qadr + 7])
        xanchor[j] = pos
        xaxis[j] = jnp.concatenate(
            [jnp.zeros((2, W), dtype), jnp.ones((1, W), dtype)], axis=0)
      elif jt == _JT.SLIDE:
        axis = _mat_vec_const(_q2mat(quat), jnt_axis[j])
        anchor = _add(pos, _qrot_const(jnt_pos[j], quat))
        disp = qpos[qadr:qadr + 1] - float(qpos0[qadr])
        pos = pos + axis * disp
        xanchor[j] = anchor
        xaxis[j] = axis
      else:  # HINGE
        Rq = _q2mat(quat)
        anchor = _add(pos, _qrot_const(jnt_pos[j], quat))
        axis = _mat_vec_const(Rq, jnt_axis[j])
        half = 0.5 * (qpos[qadr:qadr + 1] - float(qpos0[qadr]))
        s = jnp.sin(half)
        ax = jnt_axis[j]
        qloc = jnp.concatenate([
            jnp.cos(half), s * float(ax[0]), s * float(ax[1]),
            s * float(ax[2])], axis=0)
        quat = _qmul(quat, qloc)
        qp = _qrot_const(jnt_pos[j], quat)
        pos = anchor - qp if qp is not None else anchor
      # anchors for hinge computed above
      if jt == _JT.HINGE:
        xanchor[j] = anchor
        xaxis[j] = axis
    quat = _qnormalize(quat)
    xpos[b] = pos
    xquat[b] = quat
  return xpos, xquat, xanchor, xaxis


def _com_quantities(m: types.Model, xpos, xquat, xanchor, xaxis, dtype):
  """subtree_com, cinert (36, W) list, cdof (6, W) list
  (reference: smooth.py:825 com_pos)."""
  nb, nv = m.nbody, m.nv
  mass = np.asarray(jax.device_get(m.body_mass), np.float64)
  subtreemass = np.asarray(jax.device_get(m.body_subtreemass), np.float64)
  inertia = np.asarray(jax.device_get(m.body_inertia), np.float64)
  body_ipos = np.asarray(jax.device_get(m.body_ipos), np.float64)
  body_iquat = np.asarray(jax.device_get(m.body_iquat), np.float64)
  subtree = m.tree.subtree_mask
  W = xpos[0].shape[-1]

  xipos = [None] * nb
  ximat = [None] * nb
  for b in range(nb):
    xipos[b] = _add(xpos[b], _qrot_const(body_ipos[b], xquat[b]))
    ximat[b] = _q2mat(_qmul_const(xquat[b], body_iquat[b]))

  subtree_com = [None] * nb
  for b in range(nb):
    members = np.nonzero(subtree[b])[0]
    acc = None
    for j in members:
      j = int(j)
      if mass[j] == 0.0:
        continue
      term = xipos[j] * float(mass[j])
      acc = term if acc is None else acc + term
    if acc is None:
      acc = jnp.zeros((3, W), dtype)
    subtree_com[b] = acc * float(1.0 / max(subtreemass[b], 1e-12))

  rootid = m.body_rootid
  cinert = [None] * nb
  for b in range(nb):
    R = ximat[b]  # (9, W)
    c = xipos[b] - subtree_com[int(rootid[b])]  # (3, W)
    mss = float(mass[b])
    I = [float(x) for x in inertia[b]]
    # ic = R diag(I) R^T
    ic = [[None] * 3 for _ in range(3)]
    for a in range(3):
      for bb in range(a, 3):
        acc = None
        for k in range(3):
          if I[k] == 0.0:
            continue
          t = R[3 * a + k:3 * a + k + 1] * R[3 * bb + k:3 * bb + k + 1] \
              * I[k]
          acc = t if acc is None else acc + t
        if acc is None:
          acc = jnp.zeros((1, W), dtype)
        ic[a][bb] = acc
        ic[bb][a] = acc
    c0, c1, c2 = c[0:1], c[1:2], c[2:3]
    # m * (c_hat c_hat^T) = m * ((c.c) I - c c^T)
    cc = c0 * c0 + c1 * c1 + c2 * c2
    cvec = [c0, c1, c2]
    tl = [[ic[a][bb] + mss * ((cc if a == bb else 0.0) - cvec[a] * cvec[bb])
           if a == bb else ic[a][bb] - mss * cvec[a] * cvec[bb]
           for bb in range(3)] for a in range(3)]
    # m * c_hat
    zero = jnp.zeros((1, W), dtype)
    ch = [[zero, -mss * c2, mss * c1],
          [mss * c2, zero, -mss * c0],
          [-mss * c1, mss * c0, zero]]
    rows = []
    for a in range(3):
      rows.append(jnp.concatenate(tl[a] + ch[a], axis=0))  # (6, W)
    for a in range(3):
      br = [zero, zero, zero]
      br[a] = jnp.full((1, W), mss, dtype)
      # bl = m c_hat^T = -m c_hat
      blr = [-ch[a][0], -ch[a][1], -ch[a][2]]
      rows.append(jnp.concatenate(blr + br, axis=0))
    cinert[b] = jnp.concatenate(rows, axis=0)  # (36, W)

  cdof = [None] * nv
  for j in range(m.njnt):
    jt = int(m.jnt_type[j])
    b = int(m.jnt_bodyid[j])
    dadr = int(m.jnt_dofadr[j])
    com = subtree_com[int(rootid[b])]
    z = jnp.zeros((3, W), dtype)
    if jt == _JT.FREE:
      for a in range(3):
        ec = jnp.concatenate(
            [jnp.full((1, W), 1.0, dtype) if k == a else
             jnp.zeros((1, W), dtype) for k in range(3)], axis=0)
        cdof[dadr + a] = jnp.concatenate([z, ec], axis=0)
      Rb = _q2mat(xquat[b])
      off = xpos[b] - com
      for a in range(3):
        axis = jnp.concatenate(
            [Rb[a:a + 1], Rb[3 + a:4 + a], Rb[6 + a:7 + a]], axis=0)
        lin = _cross(off, axis)
        cdof[dadr + 3 + a] = jnp.concatenate([axis, lin], axis=0)
    elif jt == _JT.SLIDE:
      cdof[dadr] = jnp.concatenate([z, xaxis[j]], axis=0)
    else:  # HINGE
      off = xanchor[j] - com
      lin = _cross(off, xaxis[j])
      cdof[dadr] = jnp.concatenate([xaxis[j], lin], axis=0)
  return subtree_com, cinert, cdof


def _param_classes(m: types.Model):
  """Deduplicate per-candidate contact params into a small class table.

  Returns (pc ids (ncand,), values list of dicts).  Scenes share a handful
  of param sets, so compaction moves one small id instead of 11 fields.
  """
  fri = _host(m.cand_friction, np.float32)
  sr = _host(m.cand_solref, np.float32)
  si = _host(m.cand_solimp, np.float32)
  im = _host(m.cand_includemargin, np.float32)
  cp = m.con_pair
  iw0 = _host(m.body_invweight0, np.float32)
  b1 = m.geom_bodyid[m.pair_geom1[cp]]
  b2 = m.geom_bodyid[m.pair_geom2[cp]]
  iw = iw0[b1, 0] + iw0[b2, 0]
  rows = np.concatenate(
      [im[:, None], iw[:, None], fri[:, :5], sr, si], axis=1)  # (nc, 14)
  uniq, pc = np.unique(rows, axis=0, return_inverse=True)
  vals = [dict(im=float(u[0]), invw=float(u[1]),
               fri=tuple(float(x) for x in u[2:7]),
               sr=(float(u[7]), float(u[8])),
               si=tuple(float(x) for x in u[9:14])) for u in uniq]
  return pc.astype(np.int32), vals


def _compact_xla(m: types.Model, dist, cpos, cframe, stcom, dtype):
  """Per-condim-class actives-first compaction, XLA glue between K1/K4
  (collision_core.py:214 analog).

  Pure arithmetic — per-world selection is a one-hot contraction over the
  candidate axis (rank-match), never a gather: XLA lane-varying gathers
  measure ~30 ms at 8192 worlds.  Runs OUTSIDE the Pallas kernels: the
  same rank-3 contraction inside Mosaic takes >15 min to compile (XLA:
  seconds), and it is pure VPU work XLA fuses fine.

  dist (ncand, W), cpos (ncand*3, W), cframe (ncand*9, W), stcom
  (nbody*3, W) lanes-last.  Returns (con dict in compact-slot rows,
  overflow (1, W) int32).
  """
  nc, nv = m.ncand, m.nv
  W = dist.shape[-1]
  body_dof = m.tree.body_dof_mask  # (nb, nv) bool
  cp = m.con_pair
  bid1_np = m.geom_bodyid[m.pair_geom1[cp]]
  bid2_np = m.geom_bodyid[m.pair_geom2[cp]]
  rootid = m.body_rootid
  pc_np, pvals = _param_classes(m)
  im_np = _host(m.cand_includemargin, np.float32)

  pos3 = cpos.reshape(nc, 3, W)
  fr9 = cframe.reshape(nc, 9, W)
  keys = ('dist', 'pos', 'frame', 'im', 'friction', 'solref', 'solimp',
          'invweight', 'mask1', 'mask2', 'com1', 'com2')
  outs = {k: [] for k in keys}
  overflow = jnp.zeros((1, W), jnp.int32)

  for dim_c, cap, ci, _ in m.con_classes:
    ci = np.asarray(ci, np.int32)
    ncc = len(ci)
    distc = dist[ci]                                     # (ncc, W)
    act = distc < jnp.asarray(im_np[ci])[:, None]
    actf = act.astype(dtype)
    pref = jnp.cumsum(actf, axis=0)
    rank = pref - actf  # exclusive prefix = compact slot of each active
    srow = jax.lax.broadcasted_iota(jnp.int32, (cap, ncc, W), 0) \
        .astype(dtype)
    S = jnp.where((rank[None] == srow) & act[None], 1.0, 0.0)
    valid = jnp.sum(S, axis=1)  # (cap, W) 0/1

    # one contraction for every per-candidate field: S is HBM-resident
    # at (cap, ncc, W); a per-field contraction re-reads it ~16x, one
    # stacked einsum reads it once (measured 2.2 ms -> sub-ms glue)
    def bcast(vals):  # per-candidate numpy consts -> (1, ncc, W)
      return jnp.broadcast_to(
          jnp.asarray(np.asarray(vals, np.float32))[None, :, None],
          (1, ncc, W)).astype(dtype)

    F = jnp.concatenate([
        distc[None], pos3[ci].transpose(1, 0, 2), fr9[ci].transpose(1, 0, 2),
        bcast(bid1_np[ci]), bcast(bid2_np[ci]), bcast(pc_np[ci]),
    ], axis=0)  # (16, ncc, W)
    # multiply-reduce (VPU, exact f32): rows 13-15 are integer ids that
    # feed float == compares downstream, so the contraction must not go
    # through MXU bf16 passes
    C = jnp.sum(S[None] * F[:, None], axis=2)  # (16, cap, W)

    outs['dist'].append(C[0] + (1.0 - valid) * 1e10)
    outs['pos'].append(C[1:4].transpose(1, 0, 2).reshape(cap * 3, W))
    outs['frame'].append(C[4:13].transpose(1, 0, 2).reshape(cap * 9, W))
    b1c = C[13]  # (cap, W) float body ids
    b2c = C[14]
    pcc = C[15]

    # params from the param-class id (exact float compares on small ints)
    present_pc = sorted(set(int(x) for x in pc_np[ci]))

    def psel(getter):
      acc = None
      for u in present_pc:
        val = getter(pvals[u])
        if val == 0.0:
          continue
        term = (pcc == float(u)).astype(dtype) * val
        acc = term if acc is None else acc + term
      return acc if acc is not None else jnp.zeros((cap, W), dtype)

    outs['im'].append(psel(lambda p: p['im']) * valid)
    outs['invweight'].append(psel(lambda p: p['invw']))
    outs['friction'].append(jnp.stack(
        [psel(lambda p, i=i: p['fri'][i]) for i in range(5)],
        axis=1).reshape(cap * 5, W))
    outs['solref'].append(jnp.stack(
        [psel(lambda p, i=i: p['sr'][i]) for i in range(2)],
        axis=1).reshape(cap * 2, W))
    outs['solimp'].append(jnp.stack(
        [psel(lambda p, i=i: p['si'][i]) for i in range(5)],
        axis=1).reshape(cap * 5, W))

    # dof masks + root coms from compact body ids
    present = sorted(set(int(b) for b in bid1_np[ci]) |
                     set(int(b) for b in bid2_np[ci]))
    zero_cap = jnp.zeros((cap, W), dtype)
    for mask_key, com_key, bc in (('mask1', 'com1', b1c),
                                  ('mask2', 'com2', b2c)):
      ind = {b: (bc == float(b)).astype(dtype) for b in present}
      rows = []
      for v in range(nv):
        acc = None
        for b in present:
          if body_dof[b, v]:
            acc = ind[b] if acc is None else acc + ind[b]
        rows.append(zero_cap if acc is None else acc)
      outs[mask_key].append(
          jnp.stack(rows, axis=1).reshape(cap * nv, W))
      # com = subtree_com[root(body)]; group bodies sharing a root
      roots = sorted(set(int(rootid[b]) for b in present))
      com_rows = []
      for r in range(3):
        acc = None
        for rt in roots:
          sel = None
          for b in present:
            if int(rootid[b]) == rt:
              sel = ind[b] if sel is None else sel + ind[b]
          term = sel * stcom[3 * rt + r:3 * rt + r + 1]
          acc = term if acc is None else acc + term
        com_rows.append(acc)
      outs[com_key].append(
          jnp.stack(com_rows, axis=1).reshape(cap * 3, W))

    nact = pref[ncc - 1:ncc]
    overflow = overflow | jnp.where(
        nact > cap, jnp.int32(types.OverflowType.CONTACT), 0)

  con = {k: jnp.concatenate(v, axis=0) for k, v in outs.items()}
  return con, overflow


def _identity_con_xla(m: types.Model, dist, cpos, cframe, stcom, dtype):
  """No-compaction path: candidate order IS slot order; every per-slot
  param/mask/com is a host constant or a static row selection."""
  nc, nv = m.ncand, m.nv
  W = dist.shape[-1]
  cp = m.con_pair
  b1s = m.geom_bodyid[m.pair_geom1[cp]]
  b2s = m.geom_bodyid[m.pair_geom2[cp]]
  root1 = m.body_rootid[b1s]
  root2 = m.body_rootid[b2s]
  bd = m.tree.body_dof_mask

  def const(x):  # (rows,) numpy -> (rows, W) broadcast
    return jnp.broadcast_to(
        jnp.asarray(np.asarray(x, np.float32))[:, None], (len(x), W)
    ).astype(dtype)

  pc_np, pvals = _param_classes(m)
  fri = np.stack([pvals[u]['fri'] for u in pc_np])
  sr = np.stack([pvals[u]['sr'] for u in pc_np])
  si = np.stack([pvals[u]['si'] for u in pc_np])
  con = {
      'dist': dist, 'pos': cpos, 'frame': cframe,
      'im': const(_host(m.cand_includemargin, np.float32)),
      'friction': const(fri.reshape(-1)),
      'solref': const(sr.reshape(-1)),
      'solimp': const(si.reshape(-1)),
      'invweight': const([pvals[u]['invw'] for u in pc_np]),
      'mask1': const(bd[b1s].astype(np.float32).reshape(-1)),
      'mask2': const(bd[b2s].astype(np.float32).reshape(-1)),
      'com1': jnp.concatenate(
          [stcom[3 * int(r):3 * int(r) + 3] for r in root1], axis=0),
      'com2': jnp.concatenate(
          [stcom[3 * int(r):3 * int(r) + 3] for r in root2], axis=0),
  }
  return con, jnp.zeros((1, W), jnp.int32)


def _make_k1(m: types.Model, dtype, need_qLD=True):
  nb, nv, ngeom = m.nbody, m.nv, m.ngeom
  geom_pos = np.asarray(jax.device_get(m.geom_pos), np.float64)
  geom_quat = np.asarray(jax.device_get(m.geom_quat), np.float64)
  gb = m.geom_bodyid
  run_col = bool(m.opt.run_collision_detection) and m.ncand > 0

  def kernel(qpos_ref, qvel_ref, sizes_ref, arm_ref, grav_ref,
             *out_refs):
    out_refs = list(out_refs)
    qM_out = out_refs.pop(0)
    qLD_out = out_refs.pop(0) if need_qLD else None
    bias_out, cdof_out = out_refs.pop(0), out_refs.pop(0)
    if run_col:
      dist_out, cpos_out, cframe_out, stcom_out = out_refs
    qpos = qpos_ref[:]
    qvel = qvel_ref[:]
    sizes = sizes_ref[:]

    xpos, xquat, xanchor, xaxis = _fk(m, qpos, dtype)
    subtree_com, cinert, cdof = _com_quantities(
        m, xpos, xquat, xanchor, xaxis, dtype)

    if run_col:
      gx, gmat = [], []
      for g in range(ngeom):
        b = int(gb[g])
        gx.append(_add(xpos[b], _qrot_const(geom_pos[g], xquat[b])))
        gmat.append(_q2mat(_qmul_const(xquat[b], geom_quat[g])))
      dist, cpos, cframe = _narrowphase(m, gx, gmat, sizes, dtype)
      dist_out[:] = dist
      cpos_out[:] = cpos
      cframe_out[:] = cframe
      stcom_out[:] = jnp.concatenate(subtree_com, axis=0)

    qv = [qvel[i:i + 1] for i in range(nv)]
    qM, L, cvel, cdof_dot, bias = psmooth.mass_chain_core(
        m, dtype, cinert, cdof, qv, arm_ref[:], grav_ref[:],
        need_L=need_qLD)

    W = qpos.shape[-1]
    qM_out[:] = qM.reshape(nv * nv, W)
    if need_qLD:
      qLD_out[:] = L.reshape(nv * nv, W)
    bias_out[:] = bias
    cdof_out[:] = jnp.concatenate(cdof, axis=0)

  return kernel


def _k1_call(m: types.Model, qpos, qvel, interpret=False,
             need_qLD=True):
  dtype = qpos.dtype
  W = qpos.shape[-1]
  nb, nv = m.nbody, m.nv
  nc = m.ncand
  run_col = bool(m.opt.run_collision_detection) and nc > 0

  def bw(lead):
    return pl.BlockSpec((lead, TILE_W), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

  def bstat(r):
    return pl.BlockSpec((r, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)

  sizes = jnp.asarray(
      np.asarray(jax.device_get(m.geom_size),
                 np.float32).reshape(-1, 1)) if m.ngeom else \
      jnp.zeros((1, 1), dtype)
  arm = m.dof_armature.astype(dtype)[:, None]
  grav = m.opt.gravity.astype(dtype)[:, None]
  out_specs = [bw(nv * nv)]
  out_shape = [jax.ShapeDtypeStruct((nv * nv, W), dtype)]
  if need_qLD:
    out_specs.append(bw(nv * nv))
    out_shape.append(jax.ShapeDtypeStruct((nv * nv, W), dtype))
  out_specs += [bw(nv), bw(nv * 6)]
  out_shape += [
      jax.ShapeDtypeStruct((nv, W), dtype),
      jax.ShapeDtypeStruct((nv * 6, W), dtype),
  ]
  if run_col:
    out_specs += [bw(nc), bw(nc * 3), bw(nc * 9), bw(nb * 3)]
    out_shape += [
        jax.ShapeDtypeStruct((nc, W), dtype),
        jax.ShapeDtypeStruct((nc * 3, W), dtype),
        jax.ShapeDtypeStruct((nc * 9, W), dtype),
        jax.ShapeDtypeStruct((nb * 3, W), dtype),
    ]
  outs = pl.pallas_call(
      _make_k1(m, dtype, need_qLD=need_qLD),
      grid=(W // TILE_W,),
      in_specs=[bw(m.nq), bw(nv), bstat(max(m.ngeom * 3, 1)), bstat(nv),
                bstat(3)],
      out_specs=out_specs,
      out_shape=out_shape,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(qpos, qvel, sizes, arm, grav)
  return outs


# --------------------------------------------------- XLA glue (lanes-last)


def _host(x, dtype=np.float64):
  return np.asarray(jax.device_get(x), dtype)


def _middle(m: types.Model, bias, qpos, qvel, ctrl, dtype):
  """Actuation + passive forces, lanes-last elementwise (XLA fuses these)."""
  nv = m.nv
  W = qpos.shape[-1]

  # ---- actuation: joint transmission, fixed gain (forward.py:1153)
  qfrc_act = jnp.zeros((nv, W), dtype)
  if m.nu:
    lim = _host(m.actuator_ctrllimited, bool)
    rng = _host(m.actuator_ctrlrange, np.float32)
    ctrl_c = jnp.where(jnp.asarray(lim)[:, None],
                       jnp.clip(ctrl, jnp.asarray(rng[:, 0])[:, None],
                                jnp.asarray(rng[:, 1])[:, None]), ctrl)
    gain0 = _host(m.actuator_gainprm, np.float32)[:, 0]
    gear0 = _host(m.actuator_gear, np.float32)[:, 0]
    frclim = _host(m.actuator_forcelimited, bool)
    force = jnp.asarray(gain0)[:, None] * ctrl_c
    if frclim.any():
      frng = _host(m.actuator_forcerange, np.float32)
      force = jnp.where(jnp.asarray(frclim)[:, None],
                        jnp.clip(force, jnp.asarray(frng[:, 0])[:, None],
                                 jnp.asarray(frng[:, 1])[:, None]), force)
    dof_idx = m.jnt_dofadr[m.actuator_trnid[:, 0]]
    qfrc_act = qfrc_act.at[dof_idx].add(  # xla-glue
        jnp.asarray(gear0)[:, None] * force)

  # ---- passive springs/dampers (passive.py; hinge/slide only by gate)
  stiff = _host(m.jnt_stiffness, np.float32)
  qfrc_passive = -jnp.asarray(
      _host(m.dof_damping, np.float32))[:, None] * qvel
  sj = np.nonzero(stiff > 0)[0]
  if len(sj):
    qadr = m.jnt_qposadr[sj]
    dadr = m.jnt_dofadr[sj]
    qps = _host(m.qpos_spring, np.float32)[qadr]
    contrib = -jnp.asarray(stiff[sj])[:, None] * (
        qpos[qadr] - jnp.asarray(qps)[:, None])
    qfrc_passive = qfrc_passive.at[dadr].add(contrib)  # xla-glue

  return qfrc_passive - bias + qfrc_act


# ------------------------------------- K4: assembly + solve + integrate


def _kbi_lane(tc, dr, i0, i1, i2, i3, i4, pos_imp, h, refsafe):
  """Stiffness/damping/impedance per row (constraint.py:111-142 `_kbi`).

  Args may be python floats (limits) or (1, W) arrays (contacts); all math
  is jnp so both broadcast.  Returns (k, b, imp).
  """
  dmin = jnp.clip(i0, MJ_MINIMP, MJ_MAXIMP)
  dmax = jnp.clip(i1, MJ_MINIMP, MJ_MAXIMP)
  width = jnp.maximum(i2, _MINVAL)
  mid = jnp.clip(i3, MJ_MINIMP, MJ_MAXIMP)
  power = jnp.maximum(i4, 1.0)
  tc_eff = jnp.maximum(tc, 2.0 * h) if refsafe else tc
  dmax_sq = dmax * dmax
  k = 1.0 / jnp.maximum(dmax_sq * tc_eff * tc_eff * dr * dr, _MINVAL)
  b = 2.0 / jnp.maximum(dmax * tc_eff, _MINVAL)
  k = jnp.where(tc <= 0, -tc / dmax_sq, k)
  b = jnp.where(dr <= 0, -dr / dmax, b)

  imp_x = jnp.abs(pos_imp) / width
  imp_a = (1.0 / mid ** (power - 1.0)) * imp_x ** power
  imp_b = 1.0 - (1.0 / (1.0 - mid) ** (power - 1.0)) * (1.0 - imp_x) ** power
  imp_y = jnp.where(imp_x < mid, imp_a, imp_b)
  imp = dmin + imp_y * (dmax - dmin)
  imp = jnp.clip(imp, dmin, dmax)
  imp = jnp.where(imp_x > 1.0, dmax, imp)
  return k, b, imp


def _eq_joint_tables(m: types.Model):
  """Static per-row tables for JOINT equality rows (constraint.py:499).

  All quantities are model constants (the gate admits only 1-dof
  hinge/slide joint pairs); runtime eq_active toggling needs the general
  path — rows ride their eq_active0 default, matching the reference's
  initial state."""
  lay = m.efc
  out = []
  if not len(lay.joint_id):
    return out
  data = _host(m.eq_data)
  sr = _host(m.eq_solref)
  si = _host(m.eq_solimp)
  iw = _host(m.dof_invweight0)
  q0 = _host(m.qpos0)
  for eqid in lay.joint_id:
    eqid = int(eqid)
    if not bool(m.eq_active0[eqid]):
      continue
    j1 = int(m.eq_obj1id[eqid])
    j2 = int(m.eq_obj2id[eqid])
    out.append(dict(
        qadr1=int(m.jnt_qposadr[j1]), dadr1=int(m.jnt_dofadr[j1]),
        has2=j2 > -1,
        qadr2=int(m.jnt_qposadr[max(j2, 0)]),
        dadr2=int(m.jnt_dofadr[max(j2, 0)]),
        q01=float(q0[int(m.jnt_qposadr[j1])]),
        q02=float(q0[int(m.jnt_qposadr[max(j2, 0)])]),
        data=tuple(float(x) for x in data[eqid][:5]),
        solref=tuple(float(x) for x in sr[eqid]),
        solimp=tuple(float(x) for x in si[eqid]),
        invw=float(iw[int(m.jnt_dofadr[j1])]) +
        (float(iw[int(m.jnt_dofadr[max(j2, 0)])]) if j2 > -1 else 0.0)))
  return out


def _limit_tables(m: types.Model):
  jids = m.efc.lim_jnt_id
  out = []
  jr = _host(m.jnt_range)
  jm = _host(m.jnt_margin)
  sr = _host(m.jnt_solref)
  si = _host(m.jnt_solimp)
  iw = _host(m.dof_invweight0)
  for j in jids:
    j = int(j)
    dadr = int(m.jnt_dofadr[j])
    out.append(dict(
        qadr=int(m.jnt_qposadr[j]), dadr=dadr,
        lo=float(jr[j, 0]), hi=float(jr[j, 1]), margin=float(jm[j]),
        solref=tuple(float(x) for x in sr[j]),
        solimp=tuple(float(x) for x in si[j]),
        invw=float(iw[dadr])))
  return out


def _onehot_row(val, idx, nv, W, dtype):
  """(1, W) value scattered into row idx of an (nv, W) block."""
  parts = []
  if idx > 0:
    parts.append(jnp.zeros((idx, W), dtype))
  parts.append(val)
  if idx + 1 < nv:
    parts.append(jnp.zeros((nv - idx - 1, W), dtype))
  return jnp.concatenate(parts, axis=0)


def _k4_has_rows(m: types.Model) -> bool:
  """Static: does K4 assemble any constraint rows?  If so, it factors H
  itself and the K1 qLD output is dead (see _k1_call need_qLD)."""
  if len(m.efc.lim_jnt_id):
    return True
  if _eq_joint_tables(m):
    return True
  return bool(m.ncon and m.opt.run_collision_detection)


def _make_k4(m: types.Model, dtype, damped: bool):
  nv, nq, nefc, ncon = m.nv, m.nq, m.nefc, m.ncon
  limits = _limit_tables(m)
  eqs = _eq_joint_tables(m)
  has_rows = _k4_has_rows(m)
  refsafe = not (m.opt.disableflags & types.DisableBit.REFSAFE)
  con_dim = m.con_dim if ncon else np.zeros(0, np.int32)
  run_con = bool(ncon and m.opt.run_collision_detection)
  jnt_meta = [(int(m.jnt_type[j]), int(m.jnt_qposadr[j]),
               int(m.jnt_dofadr[j])) for j in range(m.njnt)]

  def kernel(*refs):
    refs = list(refs)
    qM_ref = refs.pop(0)
    qLD_ref = None if has_rows else refs.pop(0)
    (qfs_ref, ws_ref, qvel_ref, qpos_ref, cdof_ref, dist_ref, pos_ref,
     frame_ref, im_ref, fri_ref, solref_ref, solimp_ref, invw_ref,
     mask1_ref, mask2_ref, com1_ref, com2_ref, damp_ref, tol_ref,
     lstol_ref, mi_ref, h_ref, ir_ref, qpos_out, qvel_out, warm_out,
     qacc_out, niter_out, scr_ref) = refs
    W = qpos_ref.shape[-1]
    qM3 = qM_ref[:].reshape(nv, nv, W)
    L3 = (qLD_ref[:].reshape(nv, nv, W) if qLD_ref is not None
          else None)
    qfs = qfs_ref[:]
    qpos = qpos_ref[:]
    qvel = qvel_ref[:]
    h = h_ref[0, 0]
    zrow = jnp.zeros((1, W), dtype)

    def _launder(x, row):
      scr_ref[row:row + 1, :] = x
      return scr_ref[row:row + 1, :]

    J_rows, D_rows, aref_rows = [], [], []
    diag_rows = []  # one-hot limit rows: (dof, sign·active) — see
    # solve_core's ``diag``: they only touch H's diagonal and J·v on one
    # dof, so they skip the dense-row stack entirely

    # ---- JOINT equality rows (constraint.py:499-638): always-active
    # quadratic rows; J = e_{dof1} − poly'(q2)·e_{dof2} (dense: two
    # entries, one with a dynamic coefficient)
    eq_D_rows, eq_aref_rows = [], []
    for t in eqs:
      q1 = qpos[t['qadr1']:t['qadr1'] + 1]
      d0, d1_, d2_, d3_, d4_ = t['data']
      if t['has2']:
        dif = qpos[t['qadr2']:t['qadr2'] + 1] - t['q02']
        rhs = d0 + dif * (d1_ + dif * (d2_ + dif * (d3_ + dif * d4_)))
        deriv2 = d1_ + dif * (2.0 * d2_ + dif * (3.0 * d3_ +
                                                 dif * 4.0 * d4_))
        pos = q1 - t['q01'] - rhs
        vel = (qvel[t['dadr1']:t['dadr1'] + 1] -
               deriv2 * qvel[t['dadr2']:t['dadr2'] + 1])
        Jrow = (_onehot_row(jnp.ones((1, W), dtype), t['dadr1'], nv, W,
                            dtype) +
                _onehot_row(-deriv2, t['dadr2'], nv, W, dtype))
      else:
        pos = q1 - t['q01'] - d0
        vel = qvel[t['dadr1']:t['dadr1'] + 1]
        Jrow = _onehot_row(jnp.ones((1, W), dtype), t['dadr1'], nv, W,
                           dtype)
      k, b, imp = _kbi_lane(t['solref'][0], t['solref'][1],
                            t['solimp'][0], t['solimp'][1],
                            t['solimp'][2], t['solimp'][3],
                            t['solimp'][4], pos, h, refsafe)
      J_rows.append(Jrow)
      eq_D_rows.append(1.0 / jnp.maximum(t['invw'] * (1.0 - imp) / imp,
                                         _MINVAL))
      eq_aref_rows.append(-k * imp * pos - b * vel)

    # ---- joint limit rows (constraint.py:1990-2374, hinge/slide)
    for t in limits:
      q = qpos[t['qadr']:t['qadr'] + 1]
      dmin_ = q - t['lo']
      dmax_ = t['hi'] - q
      pos = jnp.minimum(dmin_, dmax_) - t['margin']
      active = (pos < 0.0).astype(dtype)
      sign = jnp.where(dmin_ < dmax_, 1.0, -1.0).astype(dtype)
      vel = sign * qvel[t['dadr']:t['dadr'] + 1]
      k, b, imp = _kbi_lane(t['solref'][0], t['solref'][1],
                            t['solimp'][0], t['solimp'][1], t['solimp'][2],
                            t['solimp'][3], t['solimp'][4], pos, h,
                            refsafe)
      D = 1.0 / jnp.maximum(t['invw'] * (1.0 - imp) / imp, _MINVAL)
      aref = -k * imp * pos - b * vel
      diag_rows.append((t['dadr'], sign * active))
      D_rows.append(D * active)
      aref_rows.append(aref * active)

    # packed row order for solve_core: [diag limits | dense eq | dense
    # contacts] — splice the equality D/aref after the limit rows
    D_rows += eq_D_rows
    aref_rows += eq_aref_rows

    # ---- contact rows (constraint.py:3743 dense contact Jacobian +
    # 4189 pyramidal update), per compact slot
    if run_con:
      cdof3 = cdof_ref[:].reshape(nv, 6, W)
      dist = dist_ref[:]
      cpos = pos_ref[:]
      frame = frame_ref[:]
      im = im_ref[:]
      fri = fri_ref[:]
      solref = solref_ref[:]
      solimp = solimp_ref[:]
      invw = invw_ref[:]
      mask1 = mask1_ref[:]
      mask2 = mask2_ref[:]
      com1 = com1_ref[:]
      com2 = com2_ref[:]
      ir = ir_ref[0, 0]
      ang = cdof3[:, 0:3, :]
      lin = cdof3[:, 3:6, :]
      ang_c = [ang[:, k, :] for k in range(3)]  # (nv, W) each
      lin_c = [lin[:, k, :] for k in range(3)]
      for s in range(ncon):
        dim = int(con_dim[s])
        d_s = dist[s:s + 1]
        im_s = im[s:s + 1]
        active = (d_s < im_s).astype(dtype)
        cp = d_s - im_s
        fr = frame[9 * s:9 * s + 9]
        p_s = cpos[3 * s:3 * s + 3]
        m1 = mask1[s * nv:(s + 1) * nv]
        m2 = mask2[s * nv:(s + 1) * nv]
        o1 = p_s - com1[3 * s:3 * s + 3]  # (3, W)
        o2 = p_s - com2[3 * s:3 * s + 3]
        dm = m2 - m1

        def axis_row(t):
          # J row for axis t via the triple product (jac·t with
          # jac = lin + ang×o): (ang×o)·t = ang·(o×t), so the row is
          # (m2−m1)(lin·t) + m2 ang·(o2×t) − m1 ang·(o1×t) — 9 (nv, W)
          # FMAs instead of building masked (nv, 3, W) jacobians
          lt = (lin_c[0] * t[0:1] + lin_c[1] * t[1:2] +
                lin_c[2] * t[2:3])
          u1 = _cross(o1, t)
          u2 = _cross(o2, t)
          au1 = (ang_c[0] * u1[0:1] + ang_c[1] * u1[1:2] +
                 ang_c[2] * u1[2:3])
          au2 = (ang_c[0] * u2[0:1] + ang_c[1] * u2[1:2] +
                 ang_c[2] * u2[2:3])
          return dm * lt + m2 * au2 - m1 * au1

        def rot_row(t):
          # rotational jacobian row: jacr = ang masked by (m2-m1); the
          # lever arm does not enter (constraint.py torsion/roll rows)
          return dm * (ang_c[0] * t[0:1] + ang_c[1] * t[1:2] +
                       ang_c[2] * t[2:3])

        Jn = axis_row(fr[0:3])
        veln = jnp.sum(Jn * qvel, axis=0, keepdims=True)
        if dim == 1:
          rows = [(Jn, veln)]
          iw = invw[s:s + 1]
        else:
          # pyramidal rows Jn ± fric_i * dir_i over dirs
          # [t1, t2, rot_n, rot_t1, rot_t2][:dim-1] (constraint.py:3743)
          dirs = [axis_row(fr[3:6]), axis_row(fr[6:9])]
          if dim >= 4:
            dirs.append(rot_row(fr[0:3]))
          if dim == 6:
            dirs.append(rot_row(fr[3:6]))
            dirs.append(rot_row(fr[6:9]))
          rows = []
          for fi, Jd in enumerate(dirs):
            f = fri[5 * s + fi:5 * s + fi + 1]
            veld = jnp.sum(Jd * qvel, axis=0, keepdims=True)
            rows.append((Jn + f * Jd, veln + f * veld))
            rows.append((Jn - f * Jd, veln - f * veld))
          f0 = fri[5 * s:5 * s + 1]
          iw0 = invw[s:s + 1]
          iw = (iw0 + f0 * f0 * iw0) * 2.0 * f0 * f0 * ir
        k, b, imp = _kbi_lane(
            solref[2 * s:2 * s + 1], solref[2 * s + 1:2 * s + 2],
            solimp[5 * s:5 * s + 1], solimp[5 * s + 1:5 * s + 2],
            solimp[5 * s + 2:5 * s + 3], solimp[5 * s + 3:5 * s + 4],
            solimp[5 * s + 4:5 * s + 5], cp, h, refsafe)
        D = active / jnp.maximum(iw * (1.0 - imp) / imp, _MINVAL)
        for r, vel in rows:
          J_rows.append(r * active)
          D_rows.append(D)
          aref_rows.append((-k * imp * cp - b * vel) * active)

    # ---- Newton solve (pallas/solver.solve_core)
    if J_rows or diag_rows:
      J = jnp.stack(J_rows, axis=0) if J_rows else None  # dense rows
      Dv = jnp.concatenate(D_rows, axis=0)
      aref = jnp.concatenate(aref_rows, axis=0)
      fl = jnp.zeros((len(D_rows), W), dtype)
      neqr = len(eq_D_rows)
      w_eq = None
      if neqr:  # packed rows [diag | eq | contacts]: mark eq positions
        nl_k = len(diag_rows)
        w_eq = jnp.concatenate(
            [jnp.zeros((nl_k, 1), dtype), jnp.ones((neqr, 1), dtype),
             jnp.zeros((len(D_rows) - nl_k - neqr, 1), dtype)], axis=0)
      qacc, _, niter = psolver.solve_core(
          m, dtype, J, Dv, aref, fl, qM3, qfs, ws_ref[:], w_eq, None,
          tol_ref[0, 0], lstol_ref[0, 0], mi_ref[0, 0], _launder,
          diag=diag_rows)
    else:
      qacc = _chol_solve_tile(L3, qfs, nv)
      niter = jnp.zeros((1, W), dtype)

    # ---- Euler integrate (forward.py:276/388)
    if damped:
      damp = damp_ref[:]  # (nv, 1); a captured jnp constant of this
      # shape is rejected by pallas ("captures constants"), so it rides
      # as a broadcast input like K1's armature
      eye = (jax.lax.broadcasted_iota(jnp.int32, (nv, nv), 0) ==
             jax.lax.broadcasted_iota(jnp.int32, (nv, nv), 1))
      Md = qM3 + eye.astype(dtype)[:, :, None] * (h * damp)[:, None, :]
      Ld = _chol_tile(Md, nv)
      rhs = jnp.sum(qM3 * qacc[None, :, :], axis=1)
      qacc_i = _chol_solve_tile(Ld, rhs, nv)
    else:
      qacc_i = qacc
    qvel_n = qvel + h * qacc_i

    qpos_rows = [None] * nq
    for (jt, qadr, dadr) in jnt_meta:
      if jt == _JT.FREE:
        for a in range(3):
          qpos_rows[qadr + a] = (qpos[qadr + a:qadr + a + 1] +
                                 h * qvel_n[dadr + a:dadr + a + 1])
        quat = _qnormalize(qpos[qadr + 3:qadr + 7])
        w = qvel_n[dadr + 3:dadr + 6]
        qn = _quat_integrate_lane(quat, w, h, dtype)
        for a in range(4):
          qpos_rows[qadr + 3 + a] = qn[a:a + 1]
      else:  # HINGE / SLIDE (1 dof)
        qpos_rows[qadr] = (qpos[qadr:qadr + 1] +
                           h * qvel_n[dadr:dadr + 1])
    qpos_out[:] = jnp.concatenate(qpos_rows, axis=0)
    qvel_out[:] = qvel_n
    warm_out[:] = qacc
    qacc_out[:] = qacc_i
    niter_out[:] = niter.astype(jnp.int32)

  return kernel


def _quat_integrate_lane(q, w, h, dtype):
  """mju_quatIntegrate in lane form: local-frame rotation by w*h."""
  angle = jnp.sqrt(jnp.maximum(jnp.sum(w * w, axis=0, keepdims=True),
                               0.0))
  ok = angle > 1e-9
  axis = w / jnp.maximum(angle, 1e-9)
  half = 0.5 * angle * h
  s = jnp.sin(half)
  qrot = jnp.concatenate([jnp.cos(half), axis * s], axis=0)
  qid = jnp.concatenate([jnp.ones((1, w.shape[-1]), dtype),
                         jnp.zeros((3, w.shape[-1]), dtype)], axis=0)
  qrot = jnp.where(ok, qrot, qid)
  return _qnormalize(_qmul(q, qrot))


def _k4_call(m: types.Model, damped, qM, qLD, qfs, ws, qvel, qpos, cdof,
             con, scalars, interpret=False):
  dtype = qpos.dtype
  W = qpos.shape[-1]
  nv, nq, ncon = m.nv, m.nq, max(m.ncon, 1)

  def bw(lead):
    return pl.BlockSpec((lead, TILE_W), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

  def bstat(r):
    return pl.BlockSpec((r, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)

  smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
  damp = m.dof_damping.astype(dtype)[:, None]

  if con:
    con_args = (con['dist'], con['pos'], con['frame'], con['im'],
                con['friction'], con['solref'], con['solimp'],
                con['invweight'], con['mask1'], con['mask2'], con['com1'],
                con['com2'])
  else:
    z = lambda k: jnp.zeros((k, W), dtype)
    con_args = (jnp.full((ncon, W), 1e10, dtype), z(3 * ncon),
                z(9 * ncon), z(ncon), z(5 * ncon), z(2 * ncon),
                z(5 * ncon), z(ncon), z(nv * ncon), z(nv * ncon),
                z(3 * ncon), z(3 * ncon))

  has_rows = _k4_has_rows(m)
  head_args = (qM,) if has_rows else (qM, qLD)
  head_specs = ([bw(nv * nv)] if has_rows
                else [bw(nv * nv), bw(nv * nv)])
  return pl.pallas_call(
      _make_k4(m, dtype, damped),
      grid=(W // TILE_W,),
      in_specs=head_specs +
      [bw(nv), bw(nv), bw(nv), bw(nq),
       bw(nv * 6), bw(ncon), bw(3 * ncon), bw(9 * ncon),
       bw(ncon), bw(5 * ncon), bw(2 * ncon), bw(5 * ncon),
       bw(ncon), bw(nv * ncon), bw(nv * ncon), bw(3 * ncon),
       bw(3 * ncon), bstat(nv), smem, smem, smem, smem, smem],
      out_specs=[bw(nq), bw(nv), bw(nv), bw(nv), bw(1)],
      out_shape=[
          jax.ShapeDtypeStruct((nq, W), dtype),
          jax.ShapeDtypeStruct((nv, W), dtype),
          jax.ShapeDtypeStruct((nv, W), dtype),
          jax.ShapeDtypeStruct((nv, W), dtype),
          jax.ShapeDtypeStruct((1, W), jnp.int32),
      ],
      scratch_shapes=[pltpu.VMEM((8, TILE_W), dtype)],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(*head_args, qfs, ws, qvel, qpos, cdof, *con_args, damp, *scalars)


# --------------------------------------------------------- step / rollout


class FusedState(NamedTuple):
  """Lanes-last rollout state: every array is (rows, nworld).

  ``world_id`` tracks world identity across lane permutations
  (sort_worlds); ``from_lane`` restores the caller's world order.
  """

  qpos: jax.Array  # (nq, W)
  qvel: jax.Array  # (nv, W)
  ctrl: jax.Array  # (nu, W)
  warmstart: jax.Array  # (nv, W)
  qacc: jax.Array  # (nv, W)
  time: jax.Array  # (1, W)
  solver_niter: jax.Array  # (1, W) int32
  overflow: jax.Array  # (1, W) int32
  world_id: jax.Array  # (1, W) int32


def to_lane(m: types.Model, d: types.Data) -> FusedState:
  t = lambda x: x.T
  W = d.qpos.shape[0]
  return FusedState(
      qpos=t(d.qpos), qvel=t(d.qvel),
      ctrl=t(d.ctrl) if m.nu else jnp.zeros((0, W), d.qpos.dtype),
      warmstart=t(d.qacc_warmstart), qacc=t(d.qacc),
      time=d.time.reshape(1, W) if d.time.ndim else
      jnp.broadcast_to(d.time, (1, W)),
      solver_niter=jnp.zeros((1, W), jnp.int32),
      overflow=d.overflow.reshape(1, W).astype(jnp.int32),
      world_id=jnp.arange(W, dtype=jnp.int32).reshape(1, W),
  )


def from_lane(m: types.Model, st: FusedState, d: types.Data) -> types.Data:
  # restore caller world order (identity unless sort_worlds ran)
  inv = jnp.argsort(st.world_id[0])
  g = lambda x: x.T[inv]
  return d.replace(
      qpos=g(st.qpos), qvel=g(st.qvel),
      ctrl=g(st.ctrl) if m.nu else d.ctrl,
      qacc_warmstart=g(st.warmstart), qacc=g(st.qacc),
      time=st.time[0, inv],
      solver_niter=st.solver_niter[0, inv],
      overflow=st.overflow[0, inv])


def sort_worlds(st: FusedState) -> FusedState:
  """Permute worlds across lanes by the previous step's solver_niter.

  The Newton/linesearch ``while_loop``s in the solve kernel run per
  128-lane tile at the tile's max trip count, so a tile's cost is set by
  its hardest world.  Iteration counts are temporally coherent, so
  sorting by last step's niter groups hard worlds into few tiles and
  lets quiet tiles exit in one trip (the reference's analog is the
  ``nsolving`` compaction of its conditional graph, solver.py:3491).
  World identity rides in ``world_id``; ``from_lane`` undoes the
  permutation for callers.
  """
  perm = jnp.argsort(st.solver_niter[0])
  # transpose -> leading-axis gather -> transpose beats a lane-axis
  # gather (row DMAs vs per-lane shuffles; measured 1.9 vs 2.5-4 ms at
  # 8192 worlds); callers amortize further by sorting every few steps
  return jax.tree.map(lambda x: x.T[perm].T, st)


def step_lane(m: types.Model, st: FusedState,
              interpret: bool = False) -> FusedState:
  """One physics step on lane-form state (the fused fast path)."""
  dtype = st.qpos.dtype
  need_qLD = not _k4_has_rows(m)
  k1 = list(_k1_call(m, st.qpos, st.qvel, interpret=interpret,
                     need_qLD=need_qLD))
  qM = k1.pop(0)
  qLD = k1.pop(0) if need_qLD else None
  bias, cdof = k1.pop(0), k1.pop(0)
  if m.ncand and m.opt.run_collision_detection:
    c_dist, c_pos, c_frame, stcom = k1
    compact = _compact_xla if m.con_compact else _identity_con_xla
    con, overflow = compact(m, c_dist, c_pos, c_frame, stcom, dtype)
  else:
    con = {}
    overflow = jnp.zeros((1, st.qpos.shape[-1]), jnp.int32)
  qfs = _middle(m, bias, st.qpos, st.qvel, st.ctrl, dtype)

  damping = _host(m.dof_damping, np.float32)
  if m.opt.integrator == types.IntegratorType.IMPLICITFAST:
    # implicitfast ignores EULERDAMP; within the fused gate's feature
    # class its (M − h·qDeriv) solve IS the damped factor (see
    # supported_features)
    damped = (not (m.opt.disableflags & types.DisableBit.DAMPER) and
              bool(np.any(damping > 0)))
  else:
    damped = (not (m.opt.disableflags & (types.DisableBit.EULERDAMP |
                                         types.DisableBit.DAMPER)) and
              bool(np.any(damping > 0)))
  sc = lambda x: x.astype(dtype).reshape(1, 1)
  impratio_inv = 1.0 / jnp.maximum(m.opt.impratio.astype(dtype), _MINVAL)
  scalars = (sc(m.opt.tolerance), sc(m.opt.ls_tolerance),
             sc(m.stat.meaninertia), sc(m.opt.timestep), sc(impratio_inv))
  qpos_n, qvel_n, warm, qacc_i, niter = _k4_call(
      m, damped, qM, qLD, qfs, st.warmstart, st.qvel, st.qpos, cdof, con,
      scalars, interpret=interpret)
  h = m.opt.timestep.astype(dtype)
  # SOLVER overflow: niter == opt.iterations means the Newton cap fired
  # before the kernel's tolerance predicate (conservative at the
  # boundary, same as pallas/solver.solve_batched)
  overflow = overflow | jnp.where(
      niter.astype(jnp.int32) >= jnp.int32(m.opt.iterations),
      jnp.int32(types.OverflowType.SOLVER), 0)
  return FusedState(
      qpos=qpos_n, qvel=qvel_n, ctrl=st.ctrl, warmstart=warm,
      qacc=qacc_i, time=st.time + h, solver_niter=niter,
      overflow=st.overflow | overflow, world_id=st.world_id)


def step(m: types.Model, d: types.Data,
         interpret: bool = False) -> types.Data:
  """Data-in/Data-out fused step (physics state fields only).

  Divergence from ops/forward.step, by design: derived fields (xpos,
  sensordata, efc_*, contact, ...) are not written back — the fused path
  keeps them internal to the kernels.  Use the general path when those
  are needed per step.
  """
  st = step_lane(m, to_lane(m, d), interpret=interpret)
  return from_lane(m, st, d)
