"""Heightfield narrowphase: triangle-exact surface sampling.

TPU-native counterpart of reference collision_convex.py:164
(`ccd_hfield_kernel_builder`): the reference runs GJK/EPA against every
prism in a dynamically-sized subgrid per contact.  Here the height
surface is evaluated *exactly* (per-triangle planes, same diagonal split
as the reference's prism pairs) at a static set of sample points on the
moving geom — sphere center, capsule/cylinder axis points, box corners —
and each sample produces one contact against its triangle plane.  All
gathers are static-shape; no data-dependent loops.

Supported pairs: hfield vs sphere/capsule/ellipsoid/cylinder/box.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import types

_GT = types.GeomType
_BIG = 1e10

# contacts per (HFIELD, other) pair
HFIELD_NCON = {
    _GT.SPHERE: 1,
    _GT.ELLIPSOID: 1,
    _GT.CAPSULE: 3,
    _GT.CYLINDER: 3,
    _GT.BOX: 4,
    _GT.MESH: 4,
}


def _surface(m: types.Model, dataid: int, xy):
  """Triangle-exact height + outward normal at local (n, 2) points.

  Each grid cell is split along the (c+1, r)-(c, r+1) diagonal into the
  same two triangles as the reference's prism pairs
  (collision_convex.py:404-446).
  """
  nrow = int(m.hfield_nrow[dataid])
  ncol = int(m.hfield_ncol[dataid])
  adr = int(m.hfield_adr[dataid])
  size = m.hfield_size[dataid]
  data = m.hfield_data[adr:adr + nrow * ncol] * size[2]
  dtype = xy.dtype

  gx = (xy[:, 0] / size[0] + 1.0) * 0.5 * (ncol - 1)
  gy = (xy[:, 1] / size[1] + 1.0) * 0.5 * (nrow - 1)
  gx = jnp.clip(gx, 0.0, ncol - 1 - 1e-6)
  gy = jnp.clip(gy, 0.0, nrow - 1 - 1e-6)
  c = jnp.floor(gx).astype(jnp.int32)
  r = jnp.floor(gy).astype(jnp.int32)
  u = gx - c
  v = gy - r

  z00 = data[r * ncol + c]
  z01 = data[r * ncol + c + 1]          # +x
  z10 = data[(r + 1) * ncol + c]        # +y
  z11 = data[(r + 1) * ncol + c + 1]

  dx = 2.0 * size[0] / (ncol - 1)
  dy = 2.0 * size[1] / (nrow - 1)

  lower = (u + v) <= 1.0
  h_lo = z00 + u * (z01 - z00) + v * (z10 - z00)
  h_hi = z11 + (1.0 - u) * (z10 - z11) + (1.0 - v) * (z01 - z11)
  h = jnp.where(lower, h_lo, h_hi)

  sx = jnp.where(lower, (z01 - z00), (z11 - z10)) / dx
  sy = jnp.where(lower, (z10 - z00), (z11 - z01)) / dy
  nrm = jnp.stack([-sx, -sy, jnp.ones_like(sx)], -1)
  nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
  inside = (jnp.abs(xy[:, 0]) <= size[0]) & (jnp.abs(xy[:, 1]) <= size[1])
  return h.astype(dtype), nrm.astype(dtype), inside


def _point_contacts(m, dataid, pts, r_eff):
  """Contacts of sample points with effective radius against the surface.

  pts (k, 3) local hfield frame; r_eff (k,) support radius along the
  surface normal.  Returns dist/pos/normal (local frame).
  """
  h, nrm, inside = _surface(m, dataid, pts[:, :2])
  gap = nrm[:, 2] * (pts[:, 2] - h)  # point-to-plane along the normal
  dist = gap - r_eff
  dist = jnp.where(inside, dist, _BIG)
  pos = pts - nrm * (r_eff + 0.5 * dist)[:, None]
  return dist, pos, nrm


def make_hfield_collider(t2: int):
  """Collider with the driver's (m, d, g1, g2) signature.

  g1 are heightfield geoms.  Returns (k, n) contacts, k = HFIELD_NCON.
  """
  k = HFIELD_NCON[_GT(t2)]

  def collider(m: types.Model, d: types.Data, g1, g2):
    dtype = d.qpos.dtype
    n = len(g1)
    dists, poss, nrms = [], [], []
    for i in range(n):
      hf, ge = int(g1[i]), int(g2[i])
      dataid = int(m.geom_dataid[hf])
      hp = d.geom_xpos[hf]
      hm = d.geom_xmat[hf]
      p = hm.T @ (d.geom_xpos[ge] - hp)   # geom center, hfield frame
      R = hm.T @ d.geom_xmat[ge]          # geom rot, hfield frame
      s = m.geom_size[ge]

      if t2 == _GT.SPHERE:
        pts = p[None]
        r_eff = jnp.broadcast_to(s[0], (1,))
      elif t2 == _GT.CAPSULE:
        az = R[:, 2]
        pts = jnp.stack([p - s[1] * az, p, p + s[1] * az])
        r_eff = jnp.broadcast_to(s[0], (3,))
      elif t2 == _GT.CYLINDER:
        az = R[:, 2]
        pts = jnp.stack([p - s[1] * az, p, p + s[1] * az])
        # support radius along the local surface normal below each point
        _, nrm0, _ = _surface(m, dataid, pts[:, :2])
        ng = jnp.einsum('ij,nj->ni', R.T, nrm0)  # normal in geom frame
        r_eff = (s[0] * jnp.linalg.norm(ng[:, :2], axis=-1) +
                 s[1] * jnp.abs(ng[:, 2]))
        # endpoints carry no half-length support along the axis
        r_eff = r_eff.at[0].set(s[0] * jnp.linalg.norm(ng[0, :2]))
        r_eff = r_eff.at[2].set(s[0] * jnp.linalg.norm(ng[2, :2]))
      elif t2 == _GT.ELLIPSOID:
        _, nrm0, _ = _surface(m, dataid, p[None, :2])
        ng = R.T @ nrm0[0]
        r_eff = jnp.sqrt(jnp.sum((s * ng) ** 2))[None]
        pts = p[None]
      elif t2 == _GT.BOX:
        corners = np.array([[i_, j_, k_] for i_ in (-1, 1)
                            for j_ in (-1, 1) for k_ in (-1, 1)],
                           np.float32)
        pts = p[None] + jnp.einsum('ij,nj->ni', R,
                                   corners.astype(dtype) * s[None])
        r_eff = jnp.zeros((8,), dtype)
      elif t2 == _GT.MESH:
        mid = int(m.geom_dataid[ge])
        vadr = int(m.mesh_vertadr[mid])
        vnum = int(m.mesh_vertnum[mid])
        verts = jnp.asarray(m.mesh_vert[vadr:vadr + vnum], dtype)
        pts = p[None] + jnp.einsum('ij,nj->ni', R, verts)
        r_eff = jnp.zeros((vnum,), dtype)
      else:
        raise NotImplementedError(f'hfield vs {t2}')

      dist, pos, nrm = _point_contacts(m, dataid, pts, r_eff)
      if t2 in (_GT.BOX, _GT.MESH):  # keep the 4 deepest vertices
        order = jnp.argsort(dist)[:4]
        dist, pos, nrm = dist[order], pos[order], nrm[order]
      # back to world frame
      pos_w = hp[None] + pos @ hm.T
      nrm_w = nrm @ hm.T
      dists.append(dist.astype(dtype))
      poss.append(pos_w.astype(dtype))
      nrms.append(nrm_w.astype(dtype))

    dist = jnp.stack(dists, 1)     # (k, n)
    pos = jnp.stack(poss, 1)       # (k, n, 3)
    nrm = jnp.stack(nrms, 1)
    return dist, pos, nrm

  return collider
