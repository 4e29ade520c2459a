"""Signed-distance-field narrowphase via projected gradient descent.

TPU-native counterpart of reference mujoco_warp/_src/collision_sdf.py
(`sdf_narrowphase`:1007, `gradient_descent`:697): contacts between two
shapes are found by minimizing max(sdf_A(x), sdf_B(x)) over points x.  The
reference runs per-(pair, initpoint) CUDA threads with data-dependent
iteration; here the descent is a fixed-iteration `fori_loop` vectorized
over (pairs × initpoints), gradients by analytic SDFs (finite-difference
fallback), and the best initpoint selected by masked argmin — the natural
fixed-shape XLA form.

Analytic SDFs for sphere/box/capsule/cylinder/ellipsoid/plane; user SDF
plugins register python callables in `SDF_REGISTRY` (the analog of the
reference's plugin mechanism, test_data/collision_sdf/utils.py).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import types

_GT = types.GeomType
_BIG = 1e10

# user SDF plugins: name -> sdf(local_point (…,3), size (3,)) -> (…,)
SDF_REGISTRY: Dict[str, Callable] = {}


def torus_sdf(radius1: float = 0.35, radius2: float = 0.15):
  """mujoco.sdf.torus analog: ring of major radius1/minor radius2 in the
  local x-y plane."""

  def fn(p, size):
    ring = jnp.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2 + 1e-18) - radius1
    return jnp.sqrt(ring ** 2 + p[..., 2] ** 2 + 1e-18) - radius2

  return fn


SDF_REGISTRY['mujoco.sdf.torus'] = torus_sdf()


def _snorm(v, axis=-1):
  # norm with non-NaN gradient at 0 (descent points cross axes/corners)
  return jnp.sqrt(jnp.sum(v * v, axis=axis) + 1e-18)


def sdf_primitive(gtype: int, p, size):
  """Analytic SDF of a primitive in its local frame. p (..., 3)."""
  if gtype == _GT.SPHERE:
    return _snorm(p) - size[..., 0]
  if gtype == _GT.PLANE:
    return p[..., 2]
  if gtype == _GT.CAPSULE:
    z = jnp.clip(p[..., 2], -size[..., 1], size[..., 1])
    q = p - jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z], -1)
    return _snorm(q) - size[..., 0]
  if gtype == _GT.CYLINDER:
    dr = _snorm(p[..., :2]) - size[..., 0]
    dz = jnp.abs(p[..., 2]) - size[..., 1]
    out = jnp.sqrt(jnp.maximum(dr, 0.0) ** 2 +
                   jnp.maximum(dz, 0.0) ** 2 + 1e-18)
    inside = jnp.minimum(jnp.maximum(dr, dz), 0.0)
    return out + inside
  if gtype == _GT.BOX:
    q = jnp.abs(p) - size
    out = _snorm(jnp.maximum(q, 0.0))
    # interior: MuJoCo's radial-field distance (mjc_distance box
    # convention, reference collision_sdf.py:164-172): the field points
    # along f = normalize(-size/a) and the distance is -min_i(-a_i/|f_i|)
    # — deeper than the max-face distance away from face centers, giving
    # center-seeking gradients (and matching the C tactile/SDF oracle)
    f = size / jnp.maximum(-q, 1e-12)
    f = f / _snorm(f)[..., None]
    d_in = -jnp.min(-q / jnp.maximum(f, 1e-12), axis=-1)
    inside = jnp.all(q < 0, axis=-1)
    return jnp.where(inside, d_in, out)
  if gtype == _GT.ELLIPSOID:
    # scaled-space approximation (exact near the surface)
    k0 = _snorm(p / jnp.maximum(size, 1e-12))
    k1 = _snorm(p / jnp.maximum(size * size, 1e-12))
    return k0 * (k0 - 1.0) / jnp.maximum(k1, 1e-12)
  raise NotImplementedError(f'SDF for geom type {gtype}')


def make_octree_sdf(mjm, meshid: int):
  """SDF of a mesh from its compiled octree (reference:
  collision_sdf.py:319 `find_oct` + :430 `sample_volume_sdf`).

  MuJoCo compiles meshes used as SDFs into an octree of trilinear SDF
  coefficients (oct_aabb/oct_child/oct_coeff).  The reference descends
  with a data-dependent while loop; here a fixed-depth masked descent
  (depth = octree max depth, a static model constant) — each level is a
  gather, so the query vectorizes over points and differentiates for
  the SDF-collision gradient descent.

  Returns ``fn(p, size)`` with the standard plugin-SDF signature.
  """
  import numpy as np
  root = int(mjm.mesh_octadr[meshid])
  n = int(mjm.mesh_octnum[meshid])
  if root < 0 or n <= 0:
    raise NotImplementedError(f'mesh {meshid} has no compiled octree')
  child_np = np.asarray(mjm.oct_child[root:root + n], np.int32)
  aabb_np = np.asarray(mjm.oct_aabb[root:root + n],
                       np.float32).reshape(n, 2, 3)
  coeff_np = np.asarray(mjm.oct_coeff[root:root + n], np.float32)
  depth = int(np.asarray(mjm.oct_depth[root:root + n]).max()) + 1
  child = jnp.asarray(child_np)
  aabb = jnp.asarray(aabb_np)
  coeff = jnp.asarray(coeff_np)
  is_leaf_np = jnp.asarray(np.all(child_np == -1, axis=-1))

  def fn(p, size):
    del size  # mesh SDFs ignore geom_size (baked into vertices)
    center, half = aabb[0, 0], aabb[0, 1]
    # box_project (reference collision_sdf.py:392): distance to the root
    # AABB plus a point clamped just inside it
    r = p - center
    q = jnp.abs(r) - half
    dist0 = jnp.sqrt(jnp.sum(jnp.maximum(q, 0.0) ** 2, -1) + 1e-18)
    dist0 = jnp.where(jnp.all(q <= 0.0, -1), 0.0, dist0)
    shift = jnp.where(q >= 0.0, (q + 1e-4) * jnp.sign(r), 0.0)
    point = p - shift

    node = jnp.zeros(p.shape[:-1], jnp.int32)
    # static unroll over octree levels (reverse-mode differentiable;
    # depth is a small model constant)
    pt = jax.lax.stop_gradient(point)
    for _ in range(depth):
      vmin = aabb[node, 0] - aabb[node, 1]
      vmax = aabb[node, 0] + aabb[node, 1]
      coord = (pt - vmin) / jnp.maximum(vmax - vmin, 1e-12)
      k = ((coord[..., 0] >= 0.5).astype(jnp.int32) +
           2 * (coord[..., 1] >= 0.5).astype(jnp.int32) +
           4 * (coord[..., 2] >= 0.5).astype(jnp.int32))
      nxt = jnp.take_along_axis(child[node], k[..., None], -1)[..., 0]
      stay = is_leaf_np[node] | (nxt == -1)
      node = jnp.where(stay, node, nxt)
    vmin = aabb[node, 0] - aabb[node, 1]
    vmax = aabb[node, 0] + aabb[node, 1]
    coord = jnp.clip((point - vmin) / jnp.maximum(vmax - vmin, 1e-12),
                     0.0, 1.0)
    cx, cy, cz = coord[..., 0:1], coord[..., 1:2], coord[..., 2:3]
    jbits = np.arange(8)
    wx = jnp.where(jnp.asarray(jbits & 1, bool), cx, 1.0 - cx)
    wy = jnp.where(jnp.asarray(jbits & 2, bool), cy, 1.0 - cy)
    wz = jnp.where(jnp.asarray(jbits & 4, bool), cz, 1.0 - cz)
    return dist0 + jnp.sum(wx * wy * wz * coeff[node], -1)

  return fn


def _world_sdf(gtype: int, pos, mat, size, x, fn=None):
  """SDF of a posed geom at world points x (..., 3); ``fn`` overrides
  the analytic primitive (plugin SDFs, geom type SDF)."""
  local = jnp.einsum('...ij,...i->...j', mat, x - pos)
  if fn is not None:
    return fn(local, size)
  return sdf_primitive(gtype, local, size)


def sdf_collide(t1: int, t2: int, pos1, mat1, size1, pos2, mat2, size2,
                iterations: int = 20, initpoints: int = 8,
                step: float = 0.05, fn1=None, fn2=None,
                ncon_out: int = 4):
  """Contact between two shapes by SDF descent.

  Returns (dist, pos, normal) for the deepest point found.  Batched over
  leading pair axis.
  """
  n = pos1.shape[0]
  dtype = pos1.dtype

  def objective(x):
    a = _world_sdf(t1, pos1, mat1, size1, x, fn1)
    b = _world_sdf(t2, pos2, mat2, size2, x, fn2)
    return jnp.maximum(a, b)

  grad_fn = jax.grad(lambda x: jnp.sum(objective(x)))

  # init points: a Halton cloud over the overlap region (reference
  # collision_sdf.py samples halton points in the intersection AABB).
  # Segment-of-centers inits sit on symmetry axes (a flat torus's
  # contact ring is 0.35 off-axis) and stall the max-SDF descent.
  def _halton(i, b):
    f, r = 1.0, 0.0
    while i > 0:
      f /= b
      r += f * (i % b)
      i //= b
    return r
  h = np.array([[_halton(i + 1, 2), _halton(i + 1, 3), _halton(i + 1, 5)]
                for i in range(initpoints)], np.float32) * 2.0 - 1.0
  ext1 = jnp.max(size1, axis=-1)
  ext2 = jnp.max(size2, axis=-1)
  ext = jnp.minimum(ext1, ext2)[:, None]  # (n, 1) overlap scale
  mid = 0.5 * (pos1 + pos2)
  x = (mid[:, None, :] +
       jnp.asarray(h)[None, :, :] * ext[:, :, None]).reshape(-1, 3)
  p1r = jnp.repeat(pos1, initpoints, 0)
  m1r = jnp.repeat(mat1, initpoints, 0)
  s1r = jnp.repeat(size1, initpoints, 0)
  p2r = jnp.repeat(pos2, initpoints, 0)
  m2r = jnp.repeat(mat2, initpoints, 0)
  s2r = jnp.repeat(size2, initpoints, 0)

  def obj(x):
    a = _world_sdf(t1, p1r, m1r, s1r, x, fn1)
    b = _world_sdf(t2, p2r, m2r, s2r, x, fn2)
    return jnp.maximum(a, b)

  g = jax.grad(lambda xx: jnp.sum(obj(xx)))

  def body(i, x):
    gr = g(x)
    gn = gr / jnp.maximum(jnp.linalg.norm(gr, axis=-1, keepdims=True),
                          1e-12)
    # backtracking-free small steps with decay
    lr = step * (0.8 ** (i // 4))
    return x - lr * gn

  x = jax.lax.fori_loop(0, iterations, body, x)
  val = obj(x).reshape(n, initpoints)
  x = x.reshape(n, initpoints, 3)

  # top-k mutually separated minima (a resting torus touches the plane in
  # a circle: one deepest point cannot support it; the reference gets
  # multiple contacts from its per-initpoint threads + contact merging)
  min_sep = 0.35 * jnp.minimum(
      jnp.max(size1, axis=-1), jnp.max(size2, axis=-1))  # (n,)
  picks_x, picks_v = [], []
  masked = val
  for _ in range(ncon_out):
    b = jnp.argmin(masked, axis=-1)
    xb = jnp.take_along_axis(x, b[:, None, None], 1)[:, 0]
    vb = jnp.take_along_axis(masked, b[:, None], 1)[:, 0]
    picks_x.append(xb)
    picks_v.append(vb)
    near = jnp.linalg.norm(x - xb[:, None, :], axis=-1) < min_sep[:, None]
    masked = jnp.where(near, _BIG, masked)
  xs = jnp.stack(picks_x, axis=0)  # (k, n, 3)
  vs = jnp.stack(picks_v, axis=0)  # (k, n)

  # contact normal: gradient of sdf_2 − sdf_1 direction (1 → 2)
  def normal_at(xb):
    g1v = jax.grad(lambda xx: jnp.sum(_world_sdf(t1, pos1, mat1, size1,
                                                 xx, fn1)))(xb)
    g2v = jax.grad(lambda xx: jnp.sum(_world_sdf(t2, pos2, mat2, size2,
                                                 xx, fn2)))(xb)
    nrm = g1v - g2v
    return nrm / jnp.maximum(
        jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)

  nrms = jnp.stack([normal_at(xs[k]) for k in range(ncon_out)], axis=0)
  # dist = sdfA + sdfB at the optimum: near the contact both fields are
  # ~linear, so the sum is the exact signed gap whether the point sits on
  # either surface or the kink (2*max over-reports by the kink residual);
  # exhausted picks (masked to _BIG) stay far and inactive
  def gap_at(xb):
    a = _world_sdf(t1, pos1, mat1, size1, xb, fn1)
    b = _world_sdf(t2, pos2, mat2, size2, xb, fn2)
    return a + b
  gaps = jnp.stack([gap_at(xs[k]) for k in range(ncon_out)], axis=0)
  gaps = jnp.where(vs >= _BIG / 4.0, _BIG, gaps)
  return gaps, xs, nrms


def make_sdf_collider(t1: int, t2: int, fn1=None, fn2=None):
  """Collider with the standard (m, d, g1, g2) signature (1 contact)."""

  def collider(m, d, g1, g2):
    dist, pos, nrm = sdf_collide(
        t1, t2, d.geom_xpos[g1], d.geom_xmat[g1], m.geom_size[g1],
        d.geom_xpos[g2], d.geom_xmat[g2], m.geom_size[g2],
        iterations=int(m.opt.sdf_iterations) * 2,
        initpoints=max(8, int(m.opt.sdf_initpoints) // 2),
        fn1=fn1, fn2=fn2)
    return dist, pos, nrm  # (4, n) / (4, n, 3)

  return collider


def make_sdf_group_collider(m, t1: int, t2: int, g1_ids, g2_ids):
  """Per-pair SDF dispatch for a pair group (plugin SDFs differ per
  geom; SDF scenes are small, so a host loop over pairs is fine)."""
  subs = []
  for a, b in zip(np.asarray(g1_ids), np.asarray(g2_ids)):
    fn1 = m.geom_sdf_fn[int(a)] if m.geom_sdf_fn else None
    fn2 = m.geom_sdf_fn[int(b)] if m.geom_sdf_fn else None
    subs.append(make_sdf_collider(t1, t2, fn1=fn1, fn2=fn2))

  def collider(mm, d, g1, g2):
    outs = [sub(mm, d, g1[i:i + 1], g2[i:i + 1])
            for i, sub in enumerate(subs)]
    dist = jnp.concatenate([o[0] for o in outs], axis=1)
    pos = jnp.concatenate([o[1] for o in outs], axis=1)
    nrm = jnp.concatenate([o[2] for o in outs], axis=1)
    return dist, pos, nrm  # (4, npairs, ...)

  return collider
