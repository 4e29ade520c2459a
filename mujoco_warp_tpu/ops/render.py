"""Ray-traced batch renderer: rgb / depth / segmentation per camera.

TPU-native counterpart of reference mujoco_warp/_src/render.py
(`_render_megakernel`:569) + render_util.py.  The reference launches one
CUDA thread per (world, ray) over a scene BVH; here ALL cameras' pixel
rays are packed into one flat batch (static per-camera offsets — the
analog of the reference's heterogeneous-resolution flat buffers,
render.py:640-656) and cast against all geoms in one vectorized sweep
(`ops/ray`), followed by vectorized shading.  Worlds batch via vmap.

Feature parity with the reference megakernel:
  - perspective (fovy or sensorsize/intrinsic frustum, render_util.py:67
    `compute_ray`), orthographic cameras (fovy = vertical extent)
  - per-camera heterogeneous resolutions in one packed pass
  - planar depth (distance projected on the optical axis, render.py:745)
  - 2d textures on planes (OBJECT_PLANE texgen, render.py:85-90),
    skybox cube-strip sampling for background rays (render.py:111)
  - full light model (render.py:405 `compute_lighting`): directional /
    spot (cutoff + exponent) / point lights, distance attenuation,
    per-light ambient/diffuse/specular, shadow rays with the 0.3
    ambient-fallback visibility, Blinn-Phong specular
    (mat_specular/shininess), material emission, headlight
  - segmentation (geom ids)

Divergence (documented): mesh texture coordinates need per-face hit
attribution from the ray caster and are tracked for a later round; the
reference's BVH traversal is replaced by the dense vectorized sweep
(`ops/ray` docstring discusses the trade).
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

# reference render.py:47-57
_MAX_SHININESS = 128.0
_NO_LIGHT_AMBIENT_FALLBACK = 0.3
_DEFAULT_MAT_SPECULAR = 0.5
_DEFAULT_MAT_SHININESS_EXP = 0.5 * _MAX_SHININESS


@pytree_dataclass
class RenderContext:
  """Static render configuration (reference: types.py:2400 RenderContext).

  Heterogeneous per-camera resolutions are supported: rays pack into one
  flat buffer with static offsets (the reference's rgb_adr/depth_adr
  layout).
  """

  cam_ids: np.ndarray = field(static=True, default=None)  # (ncam_r,)
  cam_res: Tuple = field(static=True, default=())  # ((W, H), ...) per cam
  cam_ortho: np.ndarray = field(static=True, default=None)  # (ncam_r,) bool
  cam_sensorsize: np.ndarray = field(static=True, default=None)  # (ncam_r,2)
  cam_intrinsic: np.ndarray = field(static=True, default=None)  # (ncam_r,4)
  znear: float = field(static=True, default=0.01)
  use_shadows: bool = field(static=True, default=False)
  use_textures: bool = field(static=True, default=True)
  # static per-geom texture index into ``textures`` (-1 = untextured)
  geom_texid: np.ndarray = field(static=True, default=None)  # (ngeom,)
  skybox_texid: int = field(static=True, default=-1)
  light_type: np.ndarray = field(static=True, default=None)  # (nlight,)
  light_castshadow: np.ndarray = field(static=True, default=None)
  headlight_active: bool = field(static=True, default=True)

  # ---- leaves
  geom_rgba: types.Array = None  # (ngeom, 4) material-resolved colors
  geom_texrepeat: types.Array = None  # (ngeom, 2)
  geom_specular: types.Array = None  # (ngeom,)
  geom_shininess: types.Array = None  # (ngeom,) already scaled by 128
  geom_emission: types.Array = None  # (ngeom,)
  textures: Tuple = ()  # tuple of (H, W, 3) float arrays
  light_active: types.Array = None  # (nlight,)
  light_attenuation: types.Array = None  # (nlight, 3)
  light_cutoff: types.Array = None  # (nlight,) radians
  light_exponent: types.Array = None  # (nlight,)
  light_ambient: types.Array = None  # (nlight, 3)
  light_diffuse: types.Array = None  # (nlight, 3)
  light_specular: types.Array = None  # (nlight, 3)
  headlight_ambient: types.Array = None  # (3,)
  headlight_diffuse: types.Array = None  # (3,)
  headlight_specular: types.Array = None  # (3,)


def _decode_textures(mjm):
  """Decode mjm.tex_data into per-texture (H, W, 3) float arrays."""
  texs = []
  for t in range(mjm.ntex):
    adr = int(mjm.tex_adr[t])
    h, w = int(mjm.tex_height[t]), int(mjm.tex_width[t])
    c = int(mjm.tex_nchannel[t])
    raw = np.asarray(mjm.tex_data[adr:adr + h * w * c], np.float32)
    img = raw.reshape(h, w, c) / 255.0
    if c == 1:
      img = np.repeat(img, 3, axis=-1)
    texs.append(jnp.asarray(img[..., :3]))
  return tuple(texs)


def create_render_context(m: types.Model, mjm, cam_ids=None,
                          width=64, height=64,
                          use_shadows: bool = False,
                          use_textures: bool = True) -> RenderContext:
  """Build a RenderContext (reference: io.py:3936 put_render_context).

  ``width``/``height`` may be ints (all cameras) or sequences per camera
  (heterogeneous resolutions).
  """
  if cam_ids is None:
    cam_ids = np.arange(m.ncam, dtype=np.int32)
  cam_ids = np.asarray(cam_ids, np.int32)
  n = len(cam_ids)
  ws = [width] * n if np.isscalar(width) else list(width)
  hs = [height] * n if np.isscalar(height) else list(height)
  cam_res = tuple((int(w), int(h)) for w, h in zip(ws, hs))

  # material colors override geom rgba where assigned
  rgba = np.asarray(mjm.geom_rgba, np.float32).copy()
  ngeom = mjm.ngeom
  matid = np.asarray(mjm.geom_matid).reshape(-1)[:ngeom]
  has = matid >= 0
  spec = np.full(ngeom, _DEFAULT_MAT_SPECULAR, np.float32)
  shin = np.full(ngeom, _DEFAULT_MAT_SHININESS_EXP, np.float32)
  emis = np.zeros(ngeom, np.float32)
  texid = np.full(ngeom, -1, np.int32)
  texrep = np.ones((ngeom, 2), np.float32)
  if mjm.nmat:
    rgba[has] = np.asarray(mjm.mat_rgba, np.float32)[matid[has]]
    spec[has] = np.asarray(mjm.mat_specular, np.float32)[matid[has]]
    shin[has] = np.asarray(
        mjm.mat_shininess, np.float32)[matid[has]] * _MAX_SHININESS
    emis[has] = np.asarray(mjm.mat_emission, np.float32)[matid[has]]
    # RGB texture role (reference render.py:769 mat_texid[..., 1])
    mtex = np.asarray(mjm.mat_texid).reshape(mjm.nmat, -1)
    role = 1 if mtex.shape[1] > 1 else 0
    texid[has] = mtex[matid[has], role]
    texrep[has] = np.asarray(mjm.mat_texrepeat, np.float32)[matid[has]]

  textures = _decode_textures(mjm) if use_textures else ()
  skybox = -1
  if use_textures and mjm.ntex:
    import mujoco
    sky = np.nonzero(np.asarray(mjm.tex_type) ==
                     int(mujoco.mjtTexture.mjTEXTURE_SKYBOX))[0]
    if len(sky):
      skybox = int(sky[0])

  import mujoco
  znear = float(mjm.vis.map.znear) * float(mjm.stat.extent)
  # cam_projection: 0 = perspective, 1 = orthographic (mjtCamProjection)
  ortho = (np.asarray(mjm.cam_projection).reshape(-1)[cam_ids] == 1) \
      if m.ncam else np.zeros(0, bool)
  nl = mjm.nlight
  hl = mjm.vis.headlight
  return RenderContext(
      cam_ids=cam_ids, cam_res=cam_res, cam_ortho=ortho,
      cam_sensorsize=np.asarray(mjm.cam_sensorsize,
                                np.float64).reshape(-1, 2)[cam_ids]
      if m.ncam else np.zeros((0, 2)),
      cam_intrinsic=np.asarray(mjm.cam_intrinsic,
                               np.float64).reshape(-1, 4)[cam_ids]
      if m.ncam else np.zeros((0, 4)),
      znear=znear, use_shadows=use_shadows,
      use_textures=use_textures and bool(mjm.ntex),
      geom_texid=texid, skybox_texid=skybox,
      light_type=np.asarray(mjm.light_type, np.int32).reshape(-1)[:nl],
      light_castshadow=np.asarray(mjm.light_castshadow, bool)[:nl],
      headlight_active=bool(hl.active),
      geom_rgba=jnp.asarray(rgba),
      geom_texrepeat=jnp.asarray(texrep),
      geom_specular=jnp.asarray(spec),
      geom_shininess=jnp.asarray(shin),
      geom_emission=jnp.asarray(emis),
      textures=textures,
      light_active=jnp.asarray(np.asarray(mjm.light_active,
                                          np.float32).reshape(-1)[:nl]),
      light_attenuation=jnp.asarray(np.asarray(mjm.light_attenuation,
                                               np.float32)),
      light_cutoff=jnp.asarray(np.deg2rad(
          np.asarray(mjm.light_cutoff, np.float32))),
      light_exponent=jnp.asarray(np.asarray(mjm.light_exponent,
                                            np.float32)),
      light_ambient=jnp.asarray(np.asarray(mjm.light_ambient, np.float32)),
      light_diffuse=jnp.asarray(np.asarray(mjm.light_diffuse, np.float32)),
      light_specular=jnp.asarray(np.asarray(mjm.light_specular,
                                            np.float32)),
      headlight_ambient=jnp.asarray(np.asarray(hl.ambient, np.float32)),
      headlight_diffuse=jnp.asarray(np.asarray(hl.diffuse, np.float32)),
      headlight_specular=jnp.asarray(np.asarray(hl.specular, np.float32)),
  )


def _camera_rays(m, d, rc: RenderContext, i: int):
  """Packed pixel rays for context camera i.

  Returns (origins (R, 3), dirs (R, 3), dirz (R,)) with dirz the local
  -z component of the unit ray (planar-depth factor, render.py:745).
  Reference: render_util.py:67 `compute_ray`.
  """
  dtype = d.qpos.dtype
  camid = int(rc.cam_ids[i])
  W, H = rc.cam_res[i]
  mat = d.cam_xmat[camid]  # columns: x right, y up, -z forward
  pos = d.cam_xpos[camid]
  us = (jnp.arange(W, dtype=dtype) + 0.5) / W
  vs = (jnp.arange(H, dtype=dtype) + 0.5) / H
  uu, vv = jnp.meshgrid(us, vs)  # (H, W), v down the image

  if rc.cam_ortho[i]:
    # fovy = vertical extent in meters for orthographic cameras
    half_h = 0.5 * m.cam_fovy[camid]
    half_w = half_h * (W / H)
    x = (2.0 * uu - 1.0) * half_w
    y = (1.0 - 2.0 * vv) * half_h
    dirs = jnp.broadcast_to(-mat[:, 2], (H * W, 3))
    origins = (pos[None] + x.reshape(-1, 1) * mat[:, 0][None] +
               y.reshape(-1, 1) * mat[:, 1][None])
    dirz = jnp.ones((H * W,), dtype)
    return origins, dirs, dirz

  znear = rc.znear
  sw, sh = rc.cam_sensorsize[i]
  if sh != 0.0:
    # intrinsics frustum (render_util.py:91-110)
    fx, fy, cx, cy = rc.cam_intrinsic[i]
    target_aspect = W / H
    sensor_aspect = sw / sh
    if target_aspect > sensor_aspect:
      sh = sw / target_aspect
    elif target_aspect < sensor_aspect:
      sw = sh * target_aspect
    left = -znear / fx * (sw * 0.5 - cx)
    right = znear / fx * (sw * 0.5 + cx)
    top = znear / fy * (sh * 0.5 - cy)
    bottom = -znear / fy * (sh * 0.5 + cy)
    x = left + (right - left) * uu
    y = top + (bottom - top) * vv
  else:
    fovy = m.cam_fovy[camid] * jnp.pi / 180.0
    half_h = znear * jnp.tan(0.5 * fovy)
    half_w = half_h * (W / H)
    x = (2.0 * uu - 1.0) * half_w
    y = (1.0 - 2.0 * vv) * half_h
  dirs_cam = jnp.stack(
      [x, y, -znear * jnp.ones_like(x)], axis=-1).reshape(-1, 3)
  nrm = jnp.linalg.norm(dirs_cam, axis=-1, keepdims=True)
  dirs_cam = dirs_cam / nrm
  dirs = jnp.einsum('ij,rj->ri', mat, dirs_cam)
  origins = jnp.broadcast_to(pos, dirs.shape)
  return origins, dirs, -dirs_cam[:, 2]


def _surface_normal(m, d, pnt, gid_onehot):
  """Normal at hit points, blended by the (static-free) geom one-hot.

  pnt (R, 3); gid_onehot (R, ngeom).  Computes per-geom-type normals for
  all geoms and selects — O(R·ngeom) like the intersection sweep.
  """
  dtype = pnt.dtype
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


def _sample_tex(tex, u, v):
  """Nearest-texel sample with wrap; u/v (R,) in [0, 1)."""
  h, w = tex.shape[0], tex.shape[1]
  xi = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
  yi = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
  return tex[yi, xi]


def _plane_texture(m, d, rc, pnt, onehot, base):
  """OBJECT_PLANE texgen (reference render.py:85-90): s = 0.5·rep_x·x −
  0.5, t = −0.5·rep_y·y − 0.5 on plane-local hit coordinates."""
  tex_geoms = [g for g in np.nonzero(m.geom_type == _GT.PLANE)[0]
               if rc.geom_texid[g] >= 0]
  for g in tex_geoms:
    g = int(g)
    tex = rc.textures[int(rc.geom_texid[g])]
    lp = jnp.einsum('ij,ri->rj', d.geom_xmat[g], pnt - d.geom_xpos[g])
    rep = rc.geom_texrepeat[g]
    u = 0.5 * lp[:, 0] * rep[0] - 0.5
    v = -0.5 * lp[:, 1] * rep[1] - 0.5
    u = u - jnp.floor(u)
    v = v - jnp.floor(v)
    tc = _sample_tex(tex, u, v)
    w = onehot[:, g:g + 1]
    base = base * (1.0 - w) + base * tc * w
  return base


def _sample_skybox(rc, dirs):
  """Cube-strip skybox sample (reference render.py:111 `sample_skybox`):
  world direction → GL cube face via the 90°-about-X remap; faces are
  stacked vertically +X,−X,+Y,−Y,+Z,−Z."""
  tex = rc.textures[rc.skybox_texid]
  rx, ry, rz = dirs[:, 0], dirs[:, 2], -dirs[:, 1]
  arx, ary, arz = jnp.abs(rx), jnp.abs(ry), jnp.abs(rz)
  is_x = (arx >= ary) & (arx >= arz)
  is_y = ~is_x & (ary >= arz)
  is_z = ~is_x & ~is_y
  ma = jnp.where(is_x, arx, jnp.where(is_y, ary, arz))
  face = jnp.where(
      is_x, jnp.where(rx > 0, 0, 1),
      jnp.where(is_y, jnp.where(ry > 0, 2, 3),
                jnp.where(rz > 0, 4, 5)))
  sc = jnp.where(is_x, jnp.where(rx > 0, -rz, rz),
                 jnp.where(is_y, rx, jnp.where(rz > 0, rx, -rx)))
  tc = jnp.where(is_x, -ry,
                 jnp.where(is_y, jnp.where(ry > 0, rz, -rz), -ry))
  ma = jnp.maximum(ma, 1e-12)
  s = (sc / ma + 1.0) * 0.5
  t = (tc / ma + 1.0) * 0.5
  h = tex.shape[0]
  nface = 6 if h % 6 == 0 and h // 6 == tex.shape[1] else 1
  if nface == 6:
    fw = h // 6
    t = jnp.clip(t, 0.5 / fw, 1.0 - 0.5 / fw)
    v = (face.astype(s.dtype) + t) / 6.0
  else:
    v = t
  return _sample_tex(tex, s, v)


def _light_contrib(m, d, rc, normal, pnt, view, base, spec, shin,
                   ltype, castshadow, lpos, ldir, atten3, cutoff, lexp,
                   ldiff, lspec):
  """One light's diffuse+specular at all hit points (reference
  render.py:405 `compute_lighting`).  ltype/castshadow are static."""
  dtype = pnt.dtype
  if ltype == 1:  # directional
    L = jnp.broadcast_to(-ldir, pnt.shape)
    dist_l = jnp.full(pnt.shape[:1], 1e8, dtype)
    atten = jnp.ones(pnt.shape[:1], dtype)
  else:
    L = lpos[None] - pnt
    dist_l = jnp.linalg.norm(L, axis=-1)
    L = L / jnp.maximum(dist_l, 1e-12)[:, None]
    af = jnp.stack([jnp.ones_like(dist_l), dist_l, dist_l * dist_l], -1)
    den = af @ atten3
    atten = jnp.where(den > 1e-12, 1.0 / jnp.maximum(den, 1e-12), 1.0)
    if ltype == 0:  # spot: cutoff cone + exponent falloff
      cos_t = -jnp.sum(L * ldir[None], -1)
      atten = jnp.where(cos_t >= jnp.cos(cutoff),
                        atten * jnp.maximum(cos_t, 0.0) ** lexp, 0.0)

  ndotl = jnp.maximum(jnp.sum(normal * L, -1), 0.0)
  visible = jnp.ones_like(ndotl)
  if rc.use_shadows and castshadow:
    sorig = pnt + normal * 1e-4
    sdist, _ = ray_ops.rays(m, d, sorig, L)
    blocked = (sdist >= 0) & (sdist < dist_l - 1e-3)
    visible = jnp.where(blocked, _NO_LIGHT_AMBIENT_FALLBACK, 1.0)

  weight = (atten * visible * ndotl)[:, None]
  out = base * ldiff[None] * weight
  # Blinn-Phong specular
  Hv = L + view
  Hv = Hv / jnp.maximum(jnp.linalg.norm(Hv, axis=-1, keepdims=True),
                        1e-12)
  ndoth = jnp.maximum(jnp.sum(normal * Hv, -1), 0.0)
  sw = (atten * visible * spec * ndoth ** jnp.maximum(shin, 1e-6))
  sw = jnp.where(ndotl > 0, sw, 0.0)
  out = out + lspec[None] * sw[:, None]
  return jnp.where(ndotl[:, None] > 0, out, 0.0)


def render(m: types.Model, d: types.Data, rc: RenderContext):
  """Render all context cameras for one world in one packed ray pass.

  Returns (rgb, depth, seg).  With homogeneous camera resolutions these
  stack to (ncam_r, H, W, ...) arrays (depth is planar, 0 at background;
  seg holds geom ids, -1 background); with heterogeneous resolutions
  each is a tuple of per-camera arrays.
  Reference: render.py:569 `_render_megakernel`.
  """
  dtype = d.qpos.dtype
  n = len(rc.cam_ids)

  packs = [_camera_rays(m, d, rc, i) for i in range(n)]
  origins = jnp.concatenate([p[0] for p in packs])
  dirs = jnp.concatenate([p[1] for p in packs])
  dirz = jnp.concatenate([p[2] for p in packs])
  # per-ray camera forward (headlight direction, reference render.py:878)
  cam_fwd = jnp.concatenate([
      jnp.broadcast_to(-d.cam_xmat[int(rc.cam_ids[i])][:, 2],
                       (rc.cam_res[i][0] * rc.cam_res[i][1], 3))
      for i in range(n)])

  dist, gid = ray_ops.rays(m, d, origins, dirs)
  hit = dist >= 0
  pnt = origins + dist[:, None] * dirs

  onehot = jax.nn.one_hot(jnp.maximum(gid, 0), m.ngeom, dtype=dtype)
  onehot = onehot * hit[:, None].astype(dtype)
  normal = _surface_normal(m, d, pnt, onehot)
  # shade the face the ray sees
  flip = jnp.sum(normal * dirs, -1) > 0
  normal = jnp.where(flip[:, None], -normal, normal)

  base = jnp.einsum('rg,gc->rc', onehot, rc.geom_rgba[:, :3])
  if rc.use_textures and rc.textures:
    base = _plane_texture(m, d, rc, pnt, onehot, base)
  spec = jnp.einsum('rg,g->r', onehot, rc.geom_specular)
  shin = jnp.einsum('rg,g->r', onehot, rc.geom_shininess)
  emis = jnp.einsum('rg,g->r', onehot, rc.geom_emission)

  result = base * emis[:, None]
  nlight = 0 if rc.light_type is None else len(rc.light_type)
  if rc.headlight_active:
    result = result + base * rc.headlight_ambient[None]
  elif nlight == 0:
    result = result + base * _NO_LIGHT_AMBIENT_FALLBACK

  view = -dirs
  for li in range(nlight):
    amb = rc.light_ambient[li] * rc.light_active[li]
    result = result + base * amb[None]
    contrib = _light_contrib(
        m, d, rc, normal, pnt, view, base, spec, shin,
        int(rc.light_type[li]), bool(rc.light_castshadow[li]),
        d.light_xpos[li], d.light_xdir[li],
        rc.light_attenuation[li], rc.light_cutoff[li],
        rc.light_exponent[li], rc.light_diffuse[li],
        rc.light_specular[li])
    result = result + contrib * rc.light_active[li]

  if rc.headlight_active:
    # headlight = shadowless directional light along the per-camera view
    # axis (reference render.py:877-923)
    hl = _light_contrib(
        m, d, rc, normal, pnt, view, base, spec, shin,
        1, False, jnp.zeros(3, dtype), cam_fwd,
        jnp.asarray([1.0, 0.0, 0.0], dtype), 0.0, 0.0,
        rc.headlight_diffuse, rc.headlight_specular)
    result = result + hl

  rgb = jnp.clip(result, 0.0, 1.0)
  if rc.use_textures and rc.skybox_texid >= 0:
    sky = _sample_skybox(rc, dirs)
    rgb = jnp.where(hit[:, None], rgb, sky)
  else:
    rgb = jnp.where(hit[:, None], rgb, 0.0)

  # planar depth (reference render.py:745): distance projected onto the
  # optical axis; 0 at background
  depth = jnp.where(hit, dist * dirz, 0.0)
  seg = jnp.where(hit, gid, -1).astype(jnp.int32)

  # split the packed buffers back into per-camera images
  rgbs, depths, segs = [], [], []
  off = 0
  for i in range(n):
    W, H = rc.cam_res[i]
    k = W * H
    rgbs.append(rgb[off:off + k].reshape(H, W, 3))
    depths.append(depth[off:off + k].reshape(H, W))
    segs.append(seg[off:off + k].reshape(H, W))
    off += k
  if len(set(rc.cam_res)) <= 1:
    return (jnp.stack(rgbs), jnp.stack(depths), jnp.stack(segs))
  return (tuple(rgbs), tuple(depths), tuple(segs))


def get_rgb(out) -> jax.Array:
  """uint8 rgb from a render() result (reference: render_util.py:177)."""
  if isinstance(out[0], tuple):
    return tuple((o * 255).astype(jnp.uint8) for o in out[0])
  return (out[0] * 255).astype(jnp.uint8)


def get_depth(out) -> jax.Array:
  return out[1]


def get_segmentation(out) -> jax.Array:
  return out[2]
