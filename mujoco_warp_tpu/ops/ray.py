"""Ray casting against geoms: analytic intersections, batched.

TPU-native counterpart of reference mujoco_warp/_src/ray.py (`ray`:1180,
`rays`:1224): analytic ray-geom tests for plane/sphere/capsule/ellipsoid/
cylinder/box, vectorized over (nray, ngeom) pairs rather than one thread
per (ray, geom).  Mesh/hfield triangle soups above _BVH_MIN_TRIS ride the
skip-pointer BVH walk (ops/bvh.py); tiny soups stay dense.

Conventions follow mju_ray*: return the smallest t >= 0 along
``pnt + t·vec`` or -1 (here: +inf internally, -1 at the API edge), and
respect geom_group/flg_static filtering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import types

_GT = types.GeomType
_BVH_MIN_TRIS = 64
_INF = jnp.inf


def _to_local(pnt, vec, pos, mat):
  """Transform rays into geom-local frames. pnt/vec (R, 3); pos/mat per
  geom (G, 3)/(G, 3, 3) → (R, G, 3)."""
  rel = pnt[:, None, :] - pos[None, :, :]
  lp = jnp.einsum('gij,rgi->rgj', mat, rel)
  lv = jnp.einsum('gij,ri->rgj', mat, vec)
  return lp, lv


def _ray_plane(lp, lv, size):
  """z=0 plane with optional half-extent bounds (size[0], size[1])."""
  t = -lp[..., 2] / jnp.where(jnp.abs(lv[..., 2]) > 1e-15, lv[..., 2],
                              1e-15)
  px = lp[..., 0] + t * lv[..., 0]
  py = lp[..., 1] + t * lv[..., 1]
  ok = (t >= 0) & (jnp.abs(lv[..., 2]) > 1e-15)
  bounded_x = size[..., 0] <= 0
  bounded_y = size[..., 1] <= 0
  ok &= bounded_x | (jnp.abs(px) <= size[..., 0])
  ok &= bounded_y | (jnp.abs(py) <= size[..., 1])
  return jnp.where(ok, t, _INF)


def _quadratic(a, b, c):
  """Smallest non-negative root of a t² + 2b t + c = 0, else inf."""
  det = b * b - a * c
  ok = det >= 0
  sq = jnp.sqrt(jnp.maximum(det, 0.0))
  a_s = jnp.where(jnp.abs(a) > 1e-15, a, 1e-15)
  t0 = (-b - sq) / a_s
  t1 = (-b + sq) / a_s
  t = jnp.where(t0 >= 0, t0, jnp.where(t1 >= 0, t1, _INF))
  return jnp.where(ok, t, _INF)


def _ray_sphere(lp, lv, r):
  a = jnp.sum(lv * lv, -1)
  b = jnp.sum(lp * lv, -1)
  c = jnp.sum(lp * lp, -1) - r * r
  return _quadratic(a, b, c)


def _ray_capsule(lp, lv, r, half):
  # cylinder part
  a = lv[..., 0] ** 2 + lv[..., 1] ** 2
  b = lp[..., 0] * lv[..., 0] + lp[..., 1] * lv[..., 1]
  c = lp[..., 0] ** 2 + lp[..., 1] ** 2 - r * r
  t_cyl = _quadratic(a, b, c)
  z = lp[..., 2] + t_cyl * lv[..., 2]
  t_cyl = jnp.where(jnp.abs(z) <= half, t_cyl, _INF)
  # caps
  for sign in (1.0, -1.0):
    cap = lp - 0.0
    capc = jnp.stack([lp[..., 0], lp[..., 1], lp[..., 2] - sign * half],
                     -1)
    a2 = jnp.sum(lv * lv, -1)
    b2 = jnp.sum(capc * lv, -1)
    c2 = jnp.sum(capc * capc, -1) - r * r
    t_cap = _quadratic(a2, b2, c2)
    zc = lp[..., 2] + t_cap * lv[..., 2]
    valid = jnp.where(sign > 0, zc > half, zc < -half)
    t_cap = jnp.where(valid, t_cap, _INF)
    t_cyl = jnp.minimum(t_cyl, t_cap)
  return t_cyl


def _ray_ellipsoid(lp, lv, size):
  inv = 1.0 / jnp.maximum(size, 1e-15)
  p = lp * inv
  v = lv * inv
  return _quadratic(jnp.sum(v * v, -1), jnp.sum(p * v, -1),
                    jnp.sum(p * p, -1) - 1.0)


def _ray_cylinder(lp, lv, r, half):
  a = lv[..., 0] ** 2 + lv[..., 1] ** 2
  b = lp[..., 0] * lv[..., 0] + lp[..., 1] * lv[..., 1]
  c = lp[..., 0] ** 2 + lp[..., 1] ** 2 - r * r
  t_side = _quadratic(a, b, c)
  z = lp[..., 2] + t_side * lv[..., 2]
  t_side = jnp.where(jnp.abs(z) <= half, t_side, _INF)
  # caps (z = ±half disks)
  vz = jnp.where(jnp.abs(lv[..., 2]) > 1e-15, lv[..., 2], 1e-15)
  for sign in (1.0, -1.0):
    t_cap = (sign * half - lp[..., 2]) / vz
    x = lp[..., 0] + t_cap * lv[..., 0]
    y = lp[..., 1] + t_cap * lv[..., 1]
    ok = (t_cap >= 0) & (x * x + y * y <= r * r)
    t_side = jnp.minimum(t_side, jnp.where(ok, t_cap, _INF))
  return t_side


def _ray_box(lp, lv, size):
  t_best = jnp.full(lp.shape[:-1], _INF, lp.dtype)
  for axis in range(3):
    o1, o2 = (axis + 1) % 3, (axis + 2) % 3
    va = jnp.where(jnp.abs(lv[..., axis]) > 1e-15, lv[..., axis], 1e-15)
    for sign in (1.0, -1.0):
      t = (sign * size[..., axis] - lp[..., axis]) / va
      p1 = lp[..., o1] + t * lv[..., o1]
      p2 = lp[..., o2] + t * lv[..., o2]
      ok = ((t >= 0) & (jnp.abs(p1) <= size[..., o1]) &
            (jnp.abs(p2) <= size[..., o2]))
      t_best = jnp.minimum(t_best, jnp.where(ok, t, _INF))
  return t_best


def _ray_triangles(lp, lv, v0, v1, v2):
  """Möller–Trumbore over a static triangle soup; min hit t per ray.

  lp/lv (..., 3) local rays; v0/v1/v2 (T, 3).  The TPU replacement for
  the reference's per-triangle BVH walk (ray.py mesh/hfield): a dense
  (rays × triangles) intersection that XLA vectorizes.
  """
  e1 = v1 - v0
  e2 = v2 - v0
  h = jnp.cross(lv[..., None, :], e2)          # (..., T, 3)
  a = jnp.sum(e1 * h, -1)
  f = 1.0 / jnp.where(jnp.abs(a) > 1e-12, a, 1e-12)
  s = lp[..., None, :] - v0
  u = f * jnp.sum(s * h, -1)
  q = jnp.cross(s, e1)
  v = f * jnp.sum(lv[..., None, :] * q, -1)
  t = f * jnp.sum(e2 * q, -1)
  ok = ((jnp.abs(a) > 1e-12) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) &
        (u + v <= 1.0) & (t >= 0.0))
  return jnp.min(jnp.where(ok, t, _INF), axis=-1)


def _hfield_tris(m: types.Model, dataid: int, dtype):
  """Surface triangles of a heightfield for ray casting.

  Note: mj_ray splits cells along the (r,c)-(r+1,c+1) diagonal — the
  OPPOSITE of the collision prisms' split — and we mirror each exactly
  (verified against mj_ray).
  """
  nrow = int(m.hfield_nrow[dataid])
  ncol = int(m.hfield_ncol[dataid])
  adr = int(m.hfield_adr[dataid])
  size = m.hfield_size[dataid]
  z = m.hfield_data[adr:adr + nrow * ncol].reshape(nrow, ncol) * size[2]
  xs = jnp.linspace(-1.0, 1.0, ncol, dtype=dtype) * size[0]
  ys = jnp.linspace(-1.0, 1.0, nrow, dtype=dtype) * size[1]
  X, Y = jnp.meshgrid(xs, ys)  # (nrow, ncol)
  V = jnp.stack([X, Y, z.astype(dtype)], -1).reshape(-1, 3)
  idx = []
  for r in range(nrow - 1):
    for c in range(ncol - 1):
      i00 = r * ncol + c
      i01 = r * ncol + c + 1
      i10 = (r + 1) * ncol + c
      i11 = (r + 1) * ncol + c + 1
      idx.append((i00, i01, i11))
      idx.append((i00, i11, i10))
  idx = np.asarray(idx, np.int32)
  return V[idx[:, 0]], V[idx[:, 1]], V[idx[:, 2]]


def rays(m: types.Model, d: types.Data, pnt: jax.Array, vec: jax.Array,
         geomgroup=None, flg_static: bool = True,
         bodyexclude: int = -1):
  """Batched ray cast (reference: ray.py:1224 `rays`).

  pnt/vec: (R, 3).  Returns (dist (R,), geomid (R,)) with dist=-1 where no
  geom is hit (mju_ray convention).
  """
  dtype = d.qpos.dtype
  G = m.ngeom
  gt = m.geom_type
  t_all = jnp.full((pnt.shape[0], G), _INF, dtype)
  lp, lv = _to_local(pnt, vec, d.geom_xpos, d.geom_xmat)
  size = m.geom_size

  for g_type, fn in (
      (_GT.PLANE, lambda i: _ray_plane(lp[:, i], lv[:, i], size[i])),
      (_GT.SPHERE, lambda i: _ray_sphere(lp[:, i], lv[:, i], size[i, 0])),
      (_GT.CAPSULE, lambda i: _ray_capsule(lp[:, i], lv[:, i], size[i, 0],
                                           size[i, 1])),
      (_GT.ELLIPSOID, lambda i: _ray_ellipsoid(lp[:, i], lv[:, i],
                                               size[i])),
      (_GT.CYLINDER, lambda i: _ray_cylinder(lp[:, i], lv[:, i],
                                             size[i, 0], size[i, 1])),
      (_GT.BOX, lambda i: _ray_box(lp[:, i], lv[:, i], size[i])),
  ):
    ids = np.nonzero(gt == g_type)[0]
    if len(ids):
      t_all = t_all.at[:, ids].set(
          jnp.stack([fn(int(i)) for i in ids], axis=-1))

  # triangle-soup geoms: meshes and heightfields.  Above _BVH_MIN_TRIS
  # the dense (rays × triangles) sweep is replaced by the skip-pointer
  # BVH walk (ops/bvh.py — reference bvh.py:310 / ray.py:701-808 analog);
  # tiny soups stay dense (the walk's gather overhead beats ~64 tests).
  from mujoco_warp_tpu.ops import bvh as bvh_ops

  for i in np.nonzero(gt == _GT.MESH)[0]:
    i = int(i)
    did = int(m.geom_dataid[i])
    fadr, fnum = int(m.mesh_faceadr[did]), int(m.mesh_facenum[did])
    vadr = int(m.mesh_vertadr[did])
    faces = m.mesh_face[fadr:fadr + fnum]
    verts = m.mesh_vert[vadr:vadr + int(m.mesh_vertnum[did])]
    if fnum > _BVH_MIN_TRIS:
      tree = bvh_ops.build_mesh_bvh(verts, faces)
      t_all = t_all.at[:, i].set(
          bvh_ops.ray_mesh_bvh(lp[:, i], lv[:, i], tree))
    else:
      v0 = jnp.asarray(verts[faces[:, 0]], dtype)
      v1 = jnp.asarray(verts[faces[:, 1]], dtype)
      v2 = jnp.asarray(verts[faces[:, 2]], dtype)
      t_all = t_all.at[:, i].set(_ray_triangles(lp[:, i], lv[:, i],
                                                v0, v1, v2))
  for i in np.nonzero(gt == _GT.HFIELD)[0]:
    i = int(i)
    v0, v1, v2 = _hfield_tris(m, int(m.geom_dataid[i]), dtype)
    # hfield heights are Data-dtype pytree leaves; the host BVH build
    # needs concrete values (available when rays() is traced with a
    # concrete Model closure — the render/sensor jits close over m)
    concrete = not isinstance(v0, jax.core.Tracer)
    if v0.shape[0] > _BVH_MIN_TRIS and concrete:
      tree = bvh_ops.build_tri_bvh(np.asarray(jax.device_get(v0)),
                                   np.asarray(jax.device_get(v1)),
                                   np.asarray(jax.device_get(v2)))
      t_all = t_all.at[:, i].set(
          bvh_ops.ray_mesh_bvh(lp[:, i], lv[:, i], tree))
    else:
      t_all = t_all.at[:, i].set(_ray_triangles(lp[:, i], lv[:, i],
                                                v0, v1, v2))

  # filtering: static bodies, body exclusion, geom groups
  mask = np.ones(G, bool)
  if bodyexclude >= 0:
    mask &= m.geom_bodyid != bodyexclude
  if not flg_static:
    mask &= m.geom_bodyid != 0
  if geomgroup is not None:
    # mjtNum geomgroup[mjNGROUP]; model has no geom_group yet — accept all
    pass
  t_all = jnp.where(jnp.asarray(mask)[None, :], t_all, _INF)

  t = jnp.min(t_all, axis=-1)
  gid = jnp.argmin(t_all, axis=-1).astype(jnp.int32)
  hit = jnp.isfinite(t)
  return jnp.where(hit, t, -1.0), jnp.where(hit, gid, -1)


def ray(m: types.Model, d: types.Data, pnt, vec, **kw):
  """Single-ray convenience wrapper (reference: ray.py:1180)."""
  dist, gid = rays(m, d, pnt[None, :], vec[None, :], **kw)
  return dist[0], gid[0]
