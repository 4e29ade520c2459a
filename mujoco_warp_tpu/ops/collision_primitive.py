"""Analytic primitive narrowphase colliders, vectorized over pair batches.

TPU-native counterpart of reference mujoco_warp/_src/collision_primitive.py
(+ _core.py): instead of one warp thread per candidate pair, each collider
here takes arrays of geom ids for every pair of its static type group and
computes all contacts with vectorized jnp ops.

Every collider returns ``(dist, pos, normal)`` with shapes
``(k, n)``, ``(k, n, 3)``, ``(k, n, 3)`` where ``k`` is the static number of
contact points this pair type can emit and ``n`` the number of pairs.
Normals point from geom1 into geom2 (MuJoCo convention).  Inactive contact
points carry a large positive ``dist``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import types
from mujoco_warp_tpu.ops import math

_BIG = 1e10

# static number of contact points per (geomtype1, geomtype2) pair
_GT = types.GeomType
PAIR_NCON = {
    (_GT.PLANE, _GT.SPHERE): 1,
    (_GT.PLANE, _GT.CAPSULE): 2,
    (_GT.PLANE, _GT.ELLIPSOID): 1,
    (_GT.PLANE, _GT.CYLINDER): 3,
    (_GT.PLANE, _GT.BOX): 4,
    (_GT.SPHERE, _GT.SPHERE): 1,
    (_GT.SPHERE, _GT.CAPSULE): 1,
    (_GT.SPHERE, _GT.BOX): 1,
    (_GT.SPHERE, _GT.ELLIPSOID): 1,
    (_GT.SPHERE, _GT.CYLINDER): 1,
    (_GT.CAPSULE, _GT.CAPSULE): 1,
    (_GT.CAPSULE, _GT.BOX): 2,
    # BOX-BOX intentionally absent: it falls through to the convex
    # MPR + EPA-polish path (collision_convex), whose MTV depth is ~40x
    # closer to the oracle than the corner-probe heuristic was
    # (box-box median depth err 17 mm -> sub-mm, tests/test_ccd_parity)
    (_GT.PLANE, _GT.MESH): 4,
}


def _geom(m, d, g):
  """Gather pose/size for a static list of geom ids."""
  return d.geom_xpos[g], d.geom_xmat[g], m.geom_size[g]


def plane_sphere(m, d, g1, g2):
  p_pos, p_mat, _ = _geom(m, d, g1)
  s_pos, _, s_size = _geom(m, d, g2)
  n = p_mat[:, :, 2]
  r = s_size[:, 0]
  h = jnp.sum(n * (s_pos - p_pos), axis=-1)
  dist = h - r
  pos = s_pos - n * (r + 0.5 * dist)[:, None]
  return dist[None], pos[None], n[None]


def _plane_sphere_point(n, p_pos, center, r):
  h = jnp.sum(n * (center - p_pos), axis=-1)
  dist = h - r
  pos = center - n * (r + 0.5 * dist)[:, None]
  return dist, pos


def plane_capsule(m, d, g1, g2):
  p_pos, p_mat, _ = _geom(m, d, g1)
  c_pos, c_mat, c_size = _geom(m, d, g2)
  n = p_mat[:, :, 2]
  axis = c_mat[:, :, 2]
  r, half = c_size[:, 0], c_size[:, 1]
  seg = axis * half[:, None]
  d1, p1 = _plane_sphere_point(n, p_pos, c_pos + seg, r)
  d2, p2 = _plane_sphere_point(n, p_pos, c_pos - seg, r)
  dist = jnp.stack([d1, d2])
  pos = jnp.stack([p1, p2])
  # contact frame tangent aligned with the capsule axis (reference:
  # collision_primitive_core.py:277-290) — with a pyramidal cone the
  # tangent orientation is physical, so this must match MuJoCo exactly
  b = axis - n * jnp.sum(n * axis, axis=-1, keepdims=True)
  b_norm = jnp.linalg.norm(b, axis=-1, keepdims=True)
  fallback = jnp.where(
      jnp.abs(n[:, 1:2]) < 0.5,
      jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape),
      jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape))
  b = jnp.where(b_norm < 0.5, fallback, b / jnp.maximum(b_norm, 1e-12))
  c = jnp.cross(n, b)
  frame = jnp.stack([n, b, c], axis=-2)  # (n, 3, 3)
  frames = jnp.stack([frame, frame])  # (2, n, 3, 3)
  return dist, pos, jnp.stack([n, n]), frames


def plane_ellipsoid(m, d, g1, g2):
  p_pos, p_mat, _ = _geom(m, d, g1)
  e_pos, e_mat, e_size = _geom(m, d, g2)
  n = p_mat[:, :, 2]
  # support point of the ellipsoid along -n
  nl = jnp.einsum('nij,ni->nj', e_mat, n)  # normal in ellipsoid frame
  v = -(e_size ** 2) * nl
  norm = jnp.sqrt(jnp.sum(nl * nl * e_size * e_size, axis=-1))
  v = v / jnp.maximum(norm, 1e-12)[:, None]
  sp = e_pos + jnp.einsum('nij,nj->ni', e_mat, v)
  dist = jnp.sum(n * (sp - p_pos), axis=-1)
  pos = sp - 0.5 * dist[:, None] * n
  return dist[None], pos[None], n[None]


def plane_cylinder(m, d, g1, g2):
  """Plane vs cylinder: two rim points + cap center (3 candidate contacts)."""
  p_pos, p_mat, _ = _geom(m, d, g1)
  c_pos, c_mat, c_size = _geom(m, d, g2)
  n = p_mat[:, :, 2]
  axis = c_mat[:, :, 2]
  r, half = c_size[:, 0], c_size[:, 1]
  # project axis on plane; pick the downhill radial direction
  a_n = jnp.sum(axis * n, axis=-1)
  # choose cap on the lower side
  sgn = -jnp.sign(jnp.where(jnp.abs(a_n) < 1e-12, 1.0, a_n))
  cap = c_pos + axis * (half * sgn)[:, None]
  radial = n - axis * a_n[:, None]
  rn = jnp.linalg.norm(radial, axis=-1)
  radial = jnp.where(
      (rn > 1e-8)[:, None], radial / jnp.maximum(rn, 1e-12)[:, None],
      math.orthogonals(axis)[0])
  # deepest rim point on the chosen cap
  rim = cap - radial * r[:, None]
  d0, p0 = _plane_sphere_point(n, p_pos, rim, jnp.zeros_like(r))
  # second rim point: orthogonal offsets for stability when near-flat
  t = jnp.cross(axis, radial)
  rim1 = cap - radial * (r * 0.5)[:, None] + t * (r * 0.866)[:, None]
  rim2 = cap - radial * (r * 0.5)[:, None] - t * (r * 0.866)[:, None]
  d1, p1 = _plane_sphere_point(n, p_pos, rim1, jnp.zeros_like(r))
  d2, p2 = _plane_sphere_point(n, p_pos, rim2, jnp.zeros_like(r))
  dist = jnp.stack([d0, d1, d2])
  pos = jnp.stack([p0, p1, p2])
  nrm = jnp.stack([n, n, n])
  return dist, pos, nrm


def plane_box(m, d, g1, g2):
  p_pos, p_mat, _ = _geom(m, d, g1)
  b_pos, b_mat, b_size = _geom(m, d, g2)
  n = p_mat[:, :, 2]
  # 8 corners in world frame
  signs = jnp.asarray(
      [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
      b_size.dtype)  # (8, 3)
  corners = b_pos[:, None, :] + jnp.einsum(
      'nij,kj->nki', b_mat, signs[None, :, :].squeeze(0)) * 0.0
  local = signs[None, :, :] * b_size[:, None, :]  # (n, 8, 3)
  corners = b_pos[:, None, :] + jnp.einsum('nij,nkj->nki', b_mat, local)
  hgt = jnp.sum(n[:, None, :] * (corners - p_pos[:, None, :]), axis=-1)
  # take the 4 lowest corners
  neg_h, idx = jax.lax.top_k(-hgt, 4)  # (n, 4)
  dist4 = -neg_h
  corner4 = jnp.take_along_axis(corners, idx[:, :, None], axis=1)
  pos4 = corner4 - 0.5 * dist4[:, :, None] * n[:, None, :]
  dist = dist4.T
  pos = jnp.swapaxes(pos4, 0, 1)
  nrm = jnp.broadcast_to(n[None], (4,) + n.shape)
  return dist, pos, nrm


def sphere_sphere(m, d, g1, g2):
  p1, _, s1 = _geom(m, d, g1)
  p2, _, s2 = _geom(m, d, g2)
  return _sphere_sphere_point(p1, s1[:, 0], p2, s2[:, 0])


def _sphere_sphere_point(p1, r1, p2, r2):
  vec = p2 - p1
  ln = math.safe_norm(vec)
  n = vec / jnp.maximum(ln, 1e-12)[:, None]
  dist = ln - r1 - r2
  pos = p1 + n * (r1 + 0.5 * dist)[:, None]
  return dist[None], pos[None], n[None]


def _closest_segment_point(a, b, p):
  ab = b - a
  t = jnp.sum((p - a) * ab, axis=-1) / jnp.maximum(
      jnp.sum(ab * ab, axis=-1), 1e-12)
  t = jnp.clip(t, 0.0, 1.0)
  return a + ab * t[:, None]


def sphere_capsule(m, d, g1, g2):
  s_pos, _, s_size = _geom(m, d, g1)
  c_pos, c_mat, c_size = _geom(m, d, g2)
  axis = c_mat[:, :, 2]
  seg = axis * c_size[:, 1:2]
  pt = _closest_segment_point(c_pos - seg, c_pos + seg, s_pos)
  return _sphere_sphere_point(s_pos, s_size[:, 0], pt, c_size[:, 0])


def sphere_cylinder(m, d, g1, g2):
  s_pos, _, s_size = _geom(m, d, g1)
  c_pos, c_mat, c_size = _geom(m, d, g2)
  r_cyl, half = c_size[:, 0], c_size[:, 1]
  # sphere center in cylinder frame
  rel = jnp.einsum('nij,ni->nj', c_mat, s_pos - c_pos)
  x, y, z = rel[:, 0], rel[:, 1], rel[:, 2]
  rad = jnp.sqrt(x * x + y * y + 1e-24)
  # closest point on the (solid) cylinder surface to center (outside case)
  cl_r = jnp.minimum(rad, r_cyl)
  cl_z = jnp.clip(z, -half, half)
  scale = cl_r / rad
  closest = jnp.stack([x * scale, y * scale, cl_z], axis=-1)
  inside = (rad < r_cyl) & (jnp.abs(z) < half)
  # inside: project to nearest face (side wall vs cap)
  d_side = r_cyl - rad
  d_cap = half - jnp.abs(z)
  side_pt = jnp.stack([x * r_cyl / rad, y * r_cyl / rad, z], axis=-1)
  cap_pt = jnp.stack([x, y, jnp.sign(z) * half], axis=-1)
  closest_in = jnp.where((d_side < d_cap)[:, None], side_pt, cap_pt)
  closest = jnp.where(inside[:, None], closest_in, closest)
  cw = c_pos + jnp.einsum('nij,nj->ni', c_mat, closest)
  dist0, pos, n = _sphere_sphere_point(
      s_pos, s_size[:, 0], cw, jnp.zeros_like(r_cyl))
  # flip normal when center is inside (contact normal from sphere into wall)
  return dist0, pos, n


def sphere_box(m, d, g1, g2):
  s_pos, _, s_size = _geom(m, d, g1)
  b_pos, b_mat, b_size = _geom(m, d, g2)
  r = s_size[:, 0]
  rel = jnp.einsum('nij,ni->nj', b_mat, s_pos - b_pos)
  clamped = jnp.clip(rel, -b_size, b_size)
  inside = jnp.all(jnp.abs(rel) < b_size, axis=-1)
  # inside: push to the nearest face
  face_dist = b_size - jnp.abs(rel)
  k = jnp.argmin(face_dist, axis=-1)
  sign = jnp.sign(jnp.take_along_axis(rel, k[:, None], -1))[:, 0]
  sign = jnp.where(sign == 0, 1.0, sign)
  face_val = sign * jnp.take_along_axis(b_size, k[:, None], -1)[:, 0]
  pushed = clamped.at[jnp.arange(rel.shape[0]), k].set(face_val)
  closest_local = jnp.where(inside[:, None], pushed, clamped)
  closest = b_pos + jnp.einsum('nij,nj->ni', b_mat, closest_local)
  vec = closest - s_pos
  ln = math.safe_norm(vec)
  n = vec / jnp.maximum(ln, 1e-12)[:, None]
  dist = jnp.where(inside, -(ln + jnp.abs(r)), ln - r)
  # inside: normal flips (points from sphere deeper into box)
  n = jnp.where(inside[:, None], -n, n)
  pos = s_pos + n * (r + 0.5 * dist)[:, None]
  return dist[None], pos[None], n[None]


def _closest_segment_segment(a0, a1, b0, b1):
  """Closest points between two segments, vectorized (standard algorithm)."""
  da = a1 - a0
  db = b1 - b0
  r = a0 - b0
  A = jnp.sum(da * da, -1)
  B = jnp.sum(da * db, -1)
  C = jnp.sum(db * db, -1)
  D = jnp.sum(da * r, -1)
  E = jnp.sum(db * r, -1)
  denom = A * C - B * B
  s = jnp.where(denom > 1e-12, (B * E - C * D) / jnp.maximum(denom, 1e-12), 0.0)
  s = jnp.clip(s, 0.0, 1.0)
  t = (B * s + E) / jnp.maximum(C, 1e-12)
  t = jnp.clip(t, 0.0, 1.0)
  s2 = (B * t - D) / jnp.maximum(A, 1e-12)
  s2 = jnp.clip(s2, 0.0, 1.0)
  pa = a0 + da * s2[:, None]
  pb = b0 + db * t[:, None]
  return pa, pb


def capsule_capsule(m, d, g1, g2):
  p1, m1, s1 = _geom(m, d, g1)
  p2, m2, s2 = _geom(m, d, g2)
  ax1 = m1[:, :, 2] * s1[:, 1:2]
  ax2 = m2[:, :, 2] * s2[:, 1:2]
  pa, pb = _closest_segment_segment(p1 - ax1, p1 + ax1, p2 - ax2, p2 + ax2)
  return _sphere_sphere_point(pa, s1[:, 0], pb, s2[:, 0])


def capsule_box(m, d, g1, g2):
  """Capsule vs box: sphere-box tests at segment ends and closest point.

  Emits 2 contacts (deepest two of three probes) — an approximation of
  mjc_CapsuleBox's clipping; refined in the convex-collision phase.
  """
  c_pos, c_mat, c_size = _geom(m, d, g1)
  b_pos, b_mat, b_size = _geom(m, d, g2)
  axis = c_mat[:, :, 2]
  seg = axis * c_size[:, 1:2]
  r = c_size[:, 0]

  def probe(center):
    rel = jnp.einsum('nij,ni->nj', b_mat, center - b_pos)
    clamped = jnp.clip(rel, -b_size, b_size)
    closest = b_pos + jnp.einsum('nij,nj->ni', b_mat, clamped)
    return closest

  e0, e1 = c_pos - seg, c_pos + seg
  # closest point on segment to box center as the third probe
  mid = _closest_segment_point(e0, e1, b_pos)
  cands = []
  for center in (e0, e1, mid):
    closest = probe(center)
    # sphere test at `center` against point `closest`
    vec = closest - center
    ln = math.safe_norm(vec)
    n = vec / jnp.maximum(ln, 1e-12)[:, None]
    dist = ln - r
    pos = center + n * (r + 0.5 * dist)[:, None]
    cands.append((dist, pos, n))
  dist = jnp.stack([c[0] for c in cands])  # (3, n)
  pos = jnp.stack([c[1] for c in cands])
  nrm = jnp.stack([c[2] for c in cands])
  # pick 2 deepest
  neg, idx = jax.lax.top_k(-dist.T, 2)  # (n, 2)
  dist2 = -neg.T
  pos2 = jnp.take_along_axis(pos, idx.T[:, :, None], axis=0)
  nrm2 = jnp.take_along_axis(nrm, idx.T[:, :, None], axis=0)
  return dist2, pos2, nrm2


def plane_mesh(m, d, g1, g2):
  """Plane vs convex mesh: deepest 4 vertices below the plane.

  Counterpart of the reference's plane-convex collider
  (collision_primitive_core); uses the mesh's static vertex table.
  """
  from mujoco_warp_tpu.ops import collision_convex
  verts, vmask = collision_convex.padded_mesh_verts(m, g2)
  return _plane_mesh_core(m, d, g1, g2, jnp.asarray(verts),
                          jnp.asarray(vmask))


def make_plane_mesh_group_collider(g1s, g2s):
  """plane_mesh bound to a static pair list, callable with traced local
  pair indices (broadphase-pruned narrowphase)."""
  from mujoco_warp_tpu.ops import collision_convex
  g1s = np.asarray(g1s, np.int32)
  g2s = np.asarray(g2s, np.int32)

  def collider(m, d, sel):
    uniq, loc = np.unique(g2s, return_inverse=True)
    verts, vmask = collision_convex.padded_mesh_verts(m, uniq)
    rows = jnp.asarray(loc.astype(np.int32))[sel]
    return _plane_mesh_core(m, d, jnp.asarray(g1s)[sel],
                            jnp.asarray(g2s)[sel],
                            jnp.asarray(verts)[rows],
                            jnp.asarray(vmask)[rows])

  return collider


def _plane_mesh_core(m, d, g1, g2, verts, vmask):
  p_pos, p_mat, _ = _geom(m, d, g1)
  m_pos, m_mat, _ = _geom(m, d, g2)
  n = p_mat[:, :, 2]
  vw = m_pos[:, None, :] + jnp.einsum('nij,nvj->nvi', m_mat, verts)
  hgt = jnp.sum(n[:, None, :] * (vw - p_pos[:, None, :]), axis=-1)
  hgt = jnp.where(jnp.asarray(vmask), hgt, _BIG)
  neg_h, idx = jax.lax.top_k(-hgt, 4)
  dist4 = -neg_h  # (n, 4)
  v4 = jnp.take_along_axis(vw, idx[:, :, None], axis=1)
  pos4 = v4 - 0.5 * dist4[:, :, None] * n[:, None, :]
  return dist4.T, jnp.swapaxes(pos4, 0, 1), jnp.broadcast_to(
      n[None], (4,) + n.shape)


# dispatch table keyed by (geomtype1, geomtype2); values are collider fns
COLLIDERS = {
    (_GT.PLANE, _GT.SPHERE): plane_sphere,
    (_GT.PLANE, _GT.CAPSULE): plane_capsule,
    (_GT.PLANE, _GT.ELLIPSOID): plane_ellipsoid,
    (_GT.PLANE, _GT.CYLINDER): plane_cylinder,
    (_GT.PLANE, _GT.BOX): plane_box,
    (_GT.SPHERE, _GT.SPHERE): sphere_sphere,
    (_GT.SPHERE, _GT.CAPSULE): sphere_capsule,
    (_GT.SPHERE, _GT.CYLINDER): sphere_cylinder,
    (_GT.SPHERE, _GT.BOX): sphere_box,
    (_GT.CAPSULE, _GT.CAPSULE): capsule_capsule,
    (_GT.CAPSULE, _GT.BOX): capsule_box,
    (_GT.PLANE, _GT.MESH): plane_mesh,
}
