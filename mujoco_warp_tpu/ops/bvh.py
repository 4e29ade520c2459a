"""Static skip-pointer BVH over mesh triangles for ray casting.

TPU-native counterpart of reference mujoco_warp/_src/bvh.py (build:310,
refit:35) + the BVH walk in ray.py:701-808.  The reference builds a
device-side LBVH and walks it with a per-thread stack; here the tree is
built ONCE on the host per mesh asset (mesh vertices are static in the
geom-local frame, so there is nothing to refit — rays transform into the
local frame instead, ray.py `_to_local`) and traversal is stackless:

* nodes are laid out in DFS order with a **skip pointer** — `i + 1`
  enters node i's subtree, `skip[i]` jumps past it.  Traversal is then a
  single `lax.while_loop` carrying `(i, best_t)` per ray, vmapped over
  rays; XLA runs the batch until the last ray exits.  No stack, no
  recursion, static shapes throughout.
* leaves hold up to LEAF_SIZE triangles tested with a masked unrolled
  Möller–Trumbore; interior hits advance, misses (or nodes whose entry
  t exceeds the ray's current best hit) skip the whole subtree.

This turns the renderer/rangefinder mesh cost from O(rays × triangles)
dense sweeps into O(rays × nodes-visited) — exact (no pruning error):
the skip walk visits every node whose AABB the ray enters closer than
its best hit.
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

LEAF_SIZE = 4
_INF = jnp.inf

# bounded host cache: mesh digest -> built numpy BVH (meshes are static
# model assets; rebuilds across put_model calls would waste host time)
_BVH_CACHE: dict = {}
_BVH_CACHE_MAX = 256


class MeshBVH:
  """Host-built numpy BVH (static; jnp-converted at trace time)."""

  __slots__ = ('node_min', 'node_max', 'skip', 'tri0', 'ntri',
               'v0', 'v1', 'v2', 'nnode')

  def __init__(self, node_min, node_max, skip, tri0, ntri, v0, v1, v2):
    self.node_min = node_min
    self.node_max = node_max
    self.skip = skip
    self.tri0 = tri0
    self.ntri = ntri
    self.v0 = v0
    self.v1 = v1
    self.v2 = v2
    self.nnode = len(skip)


def build_mesh_bvh(verts: np.ndarray, faces: np.ndarray) -> MeshBVH:
  """Median-split BVH over triangle centroids, DFS skip-pointer layout."""
  verts = np.asarray(verts, np.float64)
  faces = np.asarray(faces, np.int32)
  return build_tri_bvh(verts[faces[:, 0]], verts[faces[:, 1]],
                       verts[faces[:, 2]])


def build_tri_bvh(t0: np.ndarray, t1: np.ndarray,
                  t2: np.ndarray) -> MeshBVH:
  """BVH over an explicit triangle soup (mesh faces, hfield prisms)."""
  t0 = np.asarray(t0, np.float64)
  t1 = np.asarray(t1, np.float64)
  t2 = np.asarray(t2, np.float64)
  key = hashlib.sha1(
      t0.tobytes() + t1.tobytes() + t2.tobytes() +
      bytes([LEAF_SIZE])).digest()
  hit = _BVH_CACHE.get(key)
  if hit is not None:
    return hit
  lo = np.minimum(np.minimum(t0, t1), t2)
  hi = np.maximum(np.maximum(t0, t1), t2)
  cen = (lo + hi) * 0.5

  node_min, node_max, skip, tri0, ntri = [], [], [], [], []
  order = []  # triangle permutation in leaf order

  def emit(idx: np.ndarray) -> None:
    me = len(skip)
    node_min.append(lo[idx].min(0))
    node_max.append(hi[idx].max(0))
    skip.append(-1)  # patched after the subtree is laid out
    if len(idx) <= LEAF_SIZE:
      tri0.append(len(order))
      ntri.append(len(idx))
      order.extend(idx.tolist())
    else:
      tri0.append(0)
      ntri.append(0)
      c = cen[idx]
      axis = int(np.argmax(c.max(0) - c.min(0)))
      half = len(idx) // 2
      part = np.argpartition(c[:, axis], half)
      emit(idx[part[:half]])
      emit(idx[part[half:]])
    skip[me] = len(skip)

  import sys
  old = sys.getrecursionlimit()
  sys.setrecursionlimit(max(old, 64 + 2 * int(np.ceil(
      np.log2(max(len(t0), 2))) + 1) * 32))
  try:
    emit(np.arange(len(t0), dtype=np.int64))
  finally:
    sys.setrecursionlimit(old)

  order = np.asarray(order, np.int64)
  # pad the reordered triangle soup with one degenerate triangle so
  # masked leaf lanes have a safe gather target
  pad = np.zeros((1, 3), np.float32)
  bvh = MeshBVH(
      node_min=np.asarray(node_min, np.float32),
      node_max=np.asarray(node_max, np.float32),
      skip=np.asarray(skip, np.int32),
      tri0=np.asarray(tri0, np.int32),
      ntri=np.asarray(ntri, np.int32),
      v0=np.concatenate([t0[order].astype(np.float32), pad]),
      v1=np.concatenate([t1[order].astype(np.float32), pad]),
      v2=np.concatenate([t2[order].astype(np.float32), pad]),
  )
  if len(_BVH_CACHE) >= _BVH_CACHE_MAX:
    _BVH_CACHE.clear()
  _BVH_CACHE[key] = bvh
  return bvh


def _tri_t(lp, lv, a, b, c):
  """Möller–Trumbore smallest non-negative t for one triangle per ray."""
  e1 = b - a
  e2 = c - a
  h = jnp.cross(lv, e2)
  det = jnp.sum(e1 * h, -1)
  f = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
  s = lp - a
  u = f * jnp.sum(s * h, -1)
  q = jnp.cross(s, e1)
  v = f * jnp.sum(lv * q, -1)
  t = f * jnp.sum(e2 * q, -1)
  ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) &
        (u + v <= 1.0) & (t >= 0.0))
  return jnp.where(ok, t, _INF)


def ray_mesh_bvh(lp: jax.Array, lv: jax.Array, bvh: MeshBVH) -> jax.Array:
  """Min hit t per ray against the BVH'd triangle soup.

  lp/lv: (R, 3) rays in the mesh's geom-local frame.  Returns (R,) t
  (inf = miss).  Exact: every node whose slab interval intersects
  [0, best_t) is visited.
  """
  dtype = lp.dtype
  nmin = jnp.asarray(bvh.node_min, dtype)
  nmax = jnp.asarray(bvh.node_max, dtype)
  skip = jnp.asarray(bvh.skip)
  tri0 = jnp.asarray(bvh.tri0)
  ntri = jnp.asarray(bvh.ntri)
  v0 = jnp.asarray(bvh.v0, dtype)
  v1 = jnp.asarray(bvh.v1, dtype)
  v2 = jnp.asarray(bvh.v2, dtype)
  N = bvh.nnode
  T = v0.shape[0] - 1  # last entry is the degenerate pad triangle

  def one_ray(p, v):
    inv = 1.0 / jnp.where(jnp.abs(v) > 1e-15, v,
                          jnp.where(v >= 0, 1e-15, -1e-15))

    def cond(c):
      return c[0] < N

    def body(c):
      i, best = c
      t1 = (nmin[i] - p) * inv
      t2 = (nmax[i] - p) * inv
      tlo = jnp.max(jnp.minimum(t1, t2))
      thi = jnp.min(jnp.maximum(t1, t2))
      hit = (thi >= jnp.maximum(tlo, 0.0)) & (tlo < best)
      leaf = ntri[i] > 0
      t_leaf = best
      base = tri0[i]
      for k in range(LEAF_SIZE):
        idx = jnp.where(leaf & (k < ntri[i]), base + k, T)
        t_leaf = jnp.minimum(t_leaf, _tri_t(p, v, v0[idx], v1[idx],
                                            v2[idx]))
      best = jnp.where(hit & leaf, t_leaf, best)
      i = jnp.where(hit, i + 1, skip[i])
      return i, best

    _, best = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), jnp.asarray(_INF, dtype)))
    return best

  return jax.vmap(one_ray)(lp, lv)
