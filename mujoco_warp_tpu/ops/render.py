"""Ray-traced batch renderer: rgb / depth / segmentation per camera.

TPU-native counterpart of reference mujoco_warp/_src/render.py
(`_render_megakernel`:569) + render_util.py.  The reference launches one
CUDA thread per (world, ray) over a scene BVH; here each camera's pixel
grid is one batched ray-cast against all geoms (the analytic `ops/ray`
intersections — a dense (npixel, ngeom) sweep, which for primitive scenes
is the MXU/VPU-friendly formulation; BVH culling for large mesh scenes is
tracked for a later round), followed by vectorized Lambert/Phong shading
with optional hard shadows.  Worlds batch via vmap as everywhere else.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import types
from mujoco_warp_tpu.ops import ray as ray_ops
from mujoco_warp_tpu.utils.structs import field, pytree_dataclass

_GT = types.GeomType


@pytree_dataclass
class RenderContext:
  """Static render configuration (reference: types.py:2400).

  One resolution per context; heterogeneous per-camera resolutions can use
  multiple contexts (the reference packs them into one flat buffer).
  """

  cam_ids: np.ndarray = field(static=True, default=None)  # (ncam_r,)
  width: int = field(static=True, default=64)
  height: int = field(static=True, default=64)
  use_shadows: bool = field(static=True, default=False)
  # checker shading for planes (the standard ground-grid look);
  # cell edge in meters
  use_checker: bool = field(static=True, default=True)
  checker_size: float = field(static=True, default=0.5)
  # geom colors (ngeom, 4) rgba
  geom_rgba: types.Array = None
  # light config is read from Model (light_xpos/xdir via Data)


def create_render_context(m: types.Model, mjm, cam_ids=None,
                          width: int = 64, height: int = 64,
                          use_shadows: bool = False,
                          use_checker: bool = True,
                          checker_size: float = 0.5) -> RenderContext:
  """Build a RenderContext (reference: io.py:3936)."""
  if cam_ids is None:
    cam_ids = np.arange(m.ncam, dtype=np.int32)
  # material colors override geom rgba where assigned (reference applies
  # mat_rgba in its flat color buffer)
  rgba = np.asarray(mjm.geom_rgba, np.float32).copy()
  if mjm.nmat:
    matid = np.asarray(mjm.geom_matid).reshape(-1)
    has = matid >= 0
    rgba[has] = np.asarray(mjm.mat_rgba, np.float32)[matid[has]]
  return RenderContext(
      cam_ids=np.asarray(cam_ids, np.int32),
      width=width, height=height, use_shadows=use_shadows,
      use_checker=use_checker, checker_size=float(checker_size),
      geom_rgba=jnp.asarray(rgba))


def _camera_rays(m, d, camid: int, width: int, height: int):
  """Pixel ray origins/directions for one camera (perspective)."""
  dtype = d.qpos.dtype
  fovy = m.cam_fovy[camid] * jnp.pi / 180.0
  mat = d.cam_xmat[camid]  # columns: x right, y up, -z forward
  pos = d.cam_xpos[camid]
  aspect = width / height
  tan_y = jnp.tan(0.5 * fovy)
  tan_x = tan_y * aspect
  ys = (jnp.arange(height, dtype=dtype) + 0.5) / height * 2.0 - 1.0
  xs = (jnp.arange(width, dtype=dtype) + 0.5) / width * 2.0 - 1.0
  px, py = jnp.meshgrid(xs, -ys)  # image y down
  dirs_cam = jnp.stack(
      [px * tan_x, py * tan_y, -jnp.ones_like(px)], axis=-1)
  dirs = jnp.einsum('ij,hwj->hwi', mat, dirs_cam).reshape(-1, 3)
  dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
  origins = jnp.broadcast_to(pos, dirs.shape)
  return origins, dirs


def _surface_normal(m, d, pnt, gid_onehot):
  """Normal at hit points, blended by the (static-free) geom one-hot.

  pnt (R, 3); gid_onehot (R, ngeom).  Computes per-geom-type normals for
  all geoms and selects — O(R·ngeom) like the intersection sweep.
  """
  dtype = pnt.dtype
  G = m.ngeom
  rel = pnt[:, None, :] - d.geom_xpos[None, :, :]  # (R, G, 3)
  local = jnp.einsum('gij,rgi->rgj', d.geom_xmat, rel)
  size = m.geom_size  # (G, 3)
  gt = m.geom_type

  n_local = jnp.zeros_like(local)
  for g_type in np.unique(gt):
    ids = np.nonzero(gt == g_type)[0]
    li = local[:, ids]
    sz = size[ids]
    if g_type == _GT.PLANE:
      nl = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], dtype), li.shape)
    elif g_type == _GT.SPHERE:
      nl = li / jnp.maximum(jnp.linalg.norm(li, axis=-1, keepdims=True),
                            1e-12)
    elif g_type == _GT.CAPSULE:
      z = jnp.clip(li[..., 2:3], -sz[None, :, 1:2], sz[None, :, 1:2])
      v = li - jnp.concatenate([jnp.zeros_like(z), jnp.zeros_like(z), z],
                               -1)
      nl = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                           1e-12)
    elif g_type == _GT.ELLIPSOID:
      v = li / jnp.maximum(sz[None] ** 2, 1e-12)
      nl = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                           1e-12)
    elif g_type == _GT.CYLINDER:
      radial = jnp.concatenate(
          [li[..., :2], jnp.zeros_like(li[..., 2:3])], -1)
      radial = radial / jnp.maximum(
          jnp.linalg.norm(radial, axis=-1, keepdims=True), 1e-12)
      cap = jnp.concatenate(
          [jnp.zeros_like(li[..., :2]),
           jnp.sign(li[..., 2:3])], -1)
      on_cap = jnp.abs(li[..., 2:3]) > sz[None, :, 1:2] - 1e-5
      nl = jnp.where(on_cap, cap, radial)
    elif g_type == _GT.BOX:
      q = jnp.abs(li) / jnp.maximum(sz[None], 1e-12)
      k = jnp.argmax(q, axis=-1)
      nl = jax.nn.one_hot(k, 3, dtype=dtype) * jnp.sign(
          jnp.take_along_axis(li, k[..., None], -1))
    else:  # MESH etc.: fall back to direction from geom center
      nl = li / jnp.maximum(jnp.linalg.norm(li, axis=-1, keepdims=True),
                            1e-12)
    n_local = n_local.at[:, ids].set(nl)

  n_world = jnp.einsum('gij,rgj->rgi', d.geom_xmat, n_local)
  return jnp.einsum('rg,rgi->ri', gid_onehot, n_world)


def render(m: types.Model, d: types.Data, rc: RenderContext):
  """Render all context cameras for one world.

  Returns (rgb (ncam_r, H, W, 3), depth (ncam_r, H, W),
  seg (ncam_r, H, W) int32 geom ids, -1 for background).
  Reference: render.py:569 `_render_megakernel` + get_* extractors.
  """
  dtype = d.qpos.dtype
  H, W = rc.height, rc.width
  rgbs, depths, segs = [], [], []
  for camid in rc.cam_ids:
    camid = int(camid)
    origins, dirs = _camera_rays(m, d, camid, W, H)
    dist, gid = ray_ops.rays(m, d, origins, dirs)
    hit = dist >= 0
    pnt = origins + dist[:, None] * dirs

    onehot = jax.nn.one_hot(jnp.maximum(gid, 0), m.ngeom, dtype=dtype)
    onehot = onehot * hit[:, None].astype(dtype)
    normal = _surface_normal(m, d, pnt, onehot)

    base = jnp.einsum('rg,gc->rc', onehot, rc.geom_rgba[:, :3])

    # checker shading on planes: darken alternate cells of the local grid
    if rc.use_checker:
      for g in np.nonzero(m.geom_type == types.GeomType.PLANE)[0]:
        g = int(g)
        lp = (pnt - d.geom_xpos[g]) @ d.geom_xmat[g]
        cell = jnp.floor(lp[:, 0] / rc.checker_size) + jnp.floor(
            lp[:, 1] / rc.checker_size)
        fac = jnp.where(cell % 2.0 > 0.5, 0.55, 1.0)
        w = onehot[:, g]
        base = base * (1.0 + w * (fac - 1.0))[:, None]

    # lighting: headlight + model lights (Lambert)
    view = -dirs
    intensity = 0.45 + 0.55 * jnp.abs(jnp.sum(normal * view, -1))
    if m.nlight:
      for li in range(m.nlight):
        ldir = d.light_xdir[li]
        lam = jnp.maximum(-jnp.sum(normal * ldir[None, :], -1), 0.0)
        if rc.use_shadows:
          # hard shadow: cast toward the light, any hit blocks
          sorig = pnt + normal * 1e-3
          sdist, _ = ray_ops.rays(m, d, sorig, -jnp.broadcast_to(
              ldir, sorig.shape))
          lam = jnp.where(sdist >= 0, 0.0, lam)
        intensity = intensity + 0.4 * lam
    rgb = jnp.clip(base * jnp.clip(intensity, 0.0, 1.6)[:, None], 0.0,
                   1.0)
    rgb = jnp.where(hit[:, None], rgb, 0.0)

    rgbs.append(rgb.reshape(H, W, 3))
    depths.append(jnp.where(hit, dist, jnp.inf).reshape(H, W))
    segs.append(jnp.where(hit, gid, -1).reshape(H, W).astype(jnp.int32))
  return (jnp.stack(rgbs), jnp.stack(depths), jnp.stack(segs))


def get_rgb(out) -> jax.Array:
  """uint8 rgb from a render() result (reference: render_util.py:177)."""
  return (out[0] * 255).astype(jnp.uint8)


def get_depth(out) -> jax.Array:
  return out[1]


def get_segmentation(out) -> jax.Array:
  return out[2]
