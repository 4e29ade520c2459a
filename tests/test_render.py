"""Renderer tests: depth vs mj_ray + OpenGL oracles, textures, ortho,
intrinsics, skybox, heterogeneous resolutions, batching."""

import os
import tempfile

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io, models
from mujoco_warp_tpu.ops import forward as fwd, render

XML = """
<mujoco>
  <worldbody>
    <light pos="0 0 3" dir="0 0 -1"/>
    <geom name="floor" type="plane" size="5 5 0.1" rgba="0.6 0.6 0.6 1"/>
    <body pos="0 0 0.3">
      <freejoint/>
      <geom type="sphere" size="0.25" rgba="0.9 0.2 0.2 1"/>
    </body>
    <body pos="0.8 0 0.2" euler="0 0 25">
      <freejoint/>
      <geom type="box" size="0.2 0.15 0.2" rgba="0.2 0.4 0.9 1"/>
    </body>
    <camera name="main" pos="1.5 -1.8 1.4" xyaxes="0.8 0.6 0 -0.25 0.33 0.9"/>
  </worldbody>
</mujoco>"""


def _setup(xml, **rc_kw):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  d = jax.jit(lambda dd: fwd.fwd_position(m, dd))(d)
  rc = render.create_render_context(m, mjm, **rc_kw)
  out = jax.jit(lambda dd: render.render(m, dd, rc))(d)
  return mjm, mjd, m, d, rc, jax.block_until_ready(out)


@pytest.fixture(scope='module')
def case():
  return _setup(XML, width=48, height=36)


def test_depth_vs_mj_ray(case):
  mjm, mjd, m, d, rc, out = case
  depth = np.asarray(out[1][0])
  seg = np.asarray(out[2][0])
  W, H = rc.cam_res[0]
  fovy = np.deg2rad(mjm.cam_fovy[0])
  mat = np.asarray(mjd.cam_xmat[0]).reshape(3, 3)
  pos = np.asarray(mjd.cam_xpos[0])
  tan_y = np.tan(0.5 * fovy)
  tan_x = tan_y * W / H
  geomid = np.zeros(1, np.int32)
  checked = 0
  for (py, px) in [(8, 10), (18, 24), (30, 40), (20, 8), (33, 24)]:
    x = (px + 0.5) / W * 2 - 1
    y = -((py + 0.5) / H * 2 - 1)
    dir_cam = np.array([x * tan_x, y * tan_y, -1.0])
    cosz = 1.0 / np.linalg.norm(dir_cam)  # planar-depth factor
    dir_w = mat @ dir_cam
    dir_w /= np.linalg.norm(dir_w)
    ref = mujoco.mj_ray(mjm, mjd, pos, dir_w, None, 1, -1, geomid)
    ours = depth[py, px]
    if ref < 0:
      assert ours == 0.0, f'pixel {py},{px}: bg depth must be 0'
    else:
      assert abs(ours - ref * cosz) < 2e-3, (
          f'pixel {py},{px}: depth {ours} vs mj_ray {ref * cosz}')
      assert seg[py, px] == geomid[0]
      checked += 1
  assert checked >= 3


def test_rgb_and_batching(case):
  mjm, mjd, m, d, rc, out = case
  rgb = np.asarray(render.get_rgb(out))
  assert rgb.shape == (1, 36, 48, 3) and rgb.dtype == np.uint8
  assert rgb.max() > 30, 'image should not be black'
  # batched render via vmap
  db = jax.tree.map(lambda x: jnp.broadcast_to(x, (3,) + x.shape), d)
  outs = jax.jit(jax.vmap(lambda dd: render.render(m, dd, rc)))(db)
  assert outs[0].shape == (3, 1, 36, 48, 3)
  np.testing.assert_allclose(np.asarray(outs[0][0]), np.asarray(out[0]),
                             atol=1e-5)


def _egl_available():
  try:
    os.environ['MUJOCO_GL'] = 'egl'
    mjm = mujoco.MjModel.from_xml_string(
        '<mujoco><worldbody><geom type="plane" size="1 1 .1"/>'
        '</worldbody></mujoco>')
    r = mujoco.Renderer(mjm, 16, 16)
    r.close()
    return True
  except Exception:
    return False


@pytest.mark.skipif(not _egl_available(), reason='no EGL')
def test_depth_seg_vs_opengl_oracle(case):
  """Planar depth and segmentation match MuJoCo's OpenGL renderer —
  geometry-exact oracles (the reference's render_test analog)."""
  mjm, mjd, m, d, rc, out = case
  r = mujoco.Renderer(mjm, 36, 48)
  r.enable_depth_rendering()
  r.update_scene(mjd, 'main')
  ref_depth = r.render()
  r.disable_depth_rendering()
  r.enable_segmentation_rendering()
  r.update_scene(mjd, 'main')
  ref_seg = r.render()[..., 0]  # objid channel
  r.close()

  depth = np.asarray(out[1][0])
  seg = np.asarray(out[2][0])
  # compare on pixels both consider foreground and away from silhouette
  # edges (rasterizer vs ray tracer disagree on edge pixels)
  far = ref_depth.max()
  fg = (ref_depth < far * 0.99) & (depth > 0)
  import scipy.ndimage as ndi
  interior = ndi.binary_erosion(fg, iterations=1)
  assert interior.sum() > 200
  err = np.abs(depth - ref_depth)[interior]
  assert np.median(err) < 5e-3, f'median depth err {np.median(err)}'
  # segmentation: OpenGL objid for geoms equals geom id
  match = (seg[interior] == ref_seg[interior])
  assert match.mean() > 0.98, f'seg match {match.mean()}'


_TEX_XML = """
<mujoco>
  <asset>
    <texture name="grid" type="2d" builtin="checker" rgb1="1 0 0"
             rgb2="0 0 1" width="64" height="64"/>
    <material name="grid" texture="grid" texrepeat="4 4"/>
    <texture name="sky" type="skybox" builtin="gradient"
             rgb1="0.2 0.4 0.9" rgb2="0 0 0" width="32" height="192"/>
  </asset>
  <worldbody>
    <light pos="0 0 3" dir="0 0 -1"/>
    <geom name="floor" type="plane" size="3 3 .1" material="grid"/>
    <camera name="c" pos="0 -3 1.2" xyaxes="1 0 0 0 0.25 0.97"/>
  </worldbody>
</mujoco>"""


def test_plane_texture_checker():
  """Checker texture on the plane produces both colors at the texgen
  spatial frequency; background samples the skybox."""
  mjm, mjd, m, d, rc, out = _setup(_TEX_XML, width=64, height=64)
  assert rc.use_textures and rc.skybox_texid >= 0
  rgb = np.asarray(out[0][0])
  seg = np.asarray(out[2][0])
  floor = rgb[seg == 0]
  # red cells and blue cells both visible
  reddish = (floor[:, 0] > 1.5 * np.maximum(floor[:, 2], 1e-3)).mean()
  bluish = (floor[:, 2] > 1.5 * np.maximum(floor[:, 0], 1e-3)).mean()
  assert reddish > 0.2 and bluish > 0.2, (reddish, bluish)
  # skybox: background pixels are not black
  bg = rgb[seg == -1]
  assert len(bg) > 10 and bg.max() > 0.05


def test_texgen_cell_size():
  """OBJECT_PLANE texgen: u = 0.5·texrepeat·x − 0.5 → cell edge =
  1/(0.5·texrepeat·ncell_per_tex) in meters along +x from the plane
  center.  Verified against the C oracle formula by sampling a row."""
  mjm, mjd, m, d, rc, out = _setup(_TEX_XML, width=64, height=64)
  # checker 64x64 builtin = 2x2 cells per repeat; repeat=4 → u period
  # 0.5*4*x = 2x → full texture every 0.5 m → color flips every 0.25 m
  rgb = np.asarray(out[0][0])
  seg = np.asarray(out[2][0])
  depth = np.asarray(out[1][0])
  # reconstruct world x at the center row's plane hits via mj_ray
  W, H = rc.cam_res[0]
  mat = np.asarray(mjd.cam_xmat[0]).reshape(3, 3)
  pos = np.asarray(mjd.cam_xpos[0])
  fovy = np.deg2rad(mjm.cam_fovy[0])
  tan_y = np.tan(0.5 * fovy)
  flips = 0
  prev = None
  py = 50  # near-bottom row, hits the plane close to the camera
  for px in range(W):
    if seg[py, px] != 0:
      continue
    x = (px + 0.5) / W * 2 - 1
    y = -((py + 0.5) / H * 2 - 1)
    dc = np.array([x * tan_y * W / H, y * tan_y, -1.0])
    dw = mat @ dc
    dw /= np.linalg.norm(dw)
    t = -pos[2] / dw[2]
    wx = pos[0] + t * dw[0]
    col = 'r' if rgb[py, px, 0] > rgb[py, px, 2] else 'b'
    if prev is not None and col != prev[1]:
      flips += 1
      # flip must happen near a multiple of 0.25 m
      mid = 0.5 * (wx + prev[0])
      offset = abs(mid / 0.25 - round(mid / 0.25))
      assert offset < 0.35, f'flip at x={mid}'
    prev = (wx, col)
  assert flips >= 3


def test_orthographic_camera():
  xml = """
<mujoco>
  <worldbody>
    <light pos="0 0 3" dir="0 0 -1"/>
    <geom name="floor" type="plane" size="4 4 .1"/>
    <body pos="0 0 1"><geom name="ball" type="sphere" size="0.5"/></body>
    <camera name="c" pos="0 0 5" projection="orthographic" fovy="4"/>
  </worldbody>
</mujoco>"""
  mjm, mjd, m, d, rc, out = _setup(xml, width=64, height=64)
  assert rc.cam_ortho[0]
  seg = np.asarray(out[2][0])
  depth = np.asarray(out[1][0])
  ball = seg == 1
  # ortho: a 1m-diameter ball in a 4m-tall frame covers ~pi/4 * (16/64)^2
  frac = ball.mean()
  assert abs(frac - np.pi * 0.25 * 0.25 ** 2) < 0.01, frac
  # ortho depth at ball top = 5 - 1.5
  assert abs(depth[ball].min() - 3.5) < 0.02
  # floor depth is constant 5.0 everywhere (parallel rays)
  floor = seg == 0
  assert np.allclose(depth[floor], 5.0, atol=1e-3)


def test_intrinsics_camera():
  """Cameras with sensorsize/focal produce the C-frustum rays: verify
  with mj_ray depth on off-center pixels (principal point shifts)."""
  xml = """
<mujoco>
  <worldbody>
    <light pos="0 0 3" dir="0 0 -1"/>
    <geom name="floor" type="plane" size="5 5 .1"/>
    <body pos="0 0 0.4"><geom type="sphere" size="0.35"/></body>
    <camera name="c" pos="0.5 -2 1.5" xyaxes="1 0 0 0 0.6 0.8"
            focal="0.008 0.008" principal="0.001 0"
            sensorsize="0.01 0.008" resolution="64 48"/>
  </worldbody>
</mujoco>"""
  mjm, mjd, m, d, rc, out = _setup(xml, width=64, height=48)
  depth = np.asarray(out[1][0])
  seg = np.asarray(out[2][0])
  # re-derive frustum on the host (render_util.py:91-110 semantics)
  znear = float(mjm.vis.map.znear) * float(mjm.stat.extent)
  fx, fy, cx, cy = np.asarray(mjm.cam_intrinsic).reshape(-1)[:4]
  sw, sh = np.asarray(mjm.cam_sensorsize).reshape(-1)[:2]
  W, H = 64, 48
  ta, sa = W / H, sw / sh
  if ta > sa:
    sh = sw / ta
  elif ta < sa:
    sw = sh * ta
  left = -znear / fx * (sw * 0.5 - cx)
  right = znear / fx * (sw * 0.5 + cx)
  top = znear / fy * (sh * 0.5 - cy)
  bottom = -znear / fy * (sh * 0.5 + cy)
  mat = np.asarray(mjd.cam_xmat[0]).reshape(3, 3)
  pos = np.asarray(mjd.cam_xpos[0])
  geomid = np.zeros(1, np.int32)
  checked = 0
  for (py, px) in [(24, 32), (40, 10), (10, 55), (30, 20)]:
    u, v = (px + 0.5) / W, (py + 0.5) / H
    dc = np.array([left + (right - left) * u, top + (bottom - top) * v,
                   -znear])
    cosz = znear / np.linalg.norm(dc)
    dw = mat @ dc
    dw /= np.linalg.norm(dw)
    ref = mujoco.mj_ray(mjm, mjd, pos, dw, None, 1, -1, geomid)
    if ref < 0:
      assert depth[py, px] == 0.0
    else:
      assert abs(depth[py, px] - ref * cosz) < 2e-3
      assert seg[py, px] == geomid[0]
      checked += 1
  assert checked >= 2


def test_heterogeneous_resolutions():
  """Multiple cameras with different resolutions render in one packed
  pass and return per-camera images."""
  xml = """
<mujoco>
  <worldbody>
    <light pos="0 0 3" dir="0 0 -1"/>
    <geom name="floor" type="plane" size="5 5 .1"/>
    <body pos="0 0 0.4"><geom type="sphere" size="0.35"/></body>
    <camera name="a" pos="0 -2 1.5" xyaxes="1 0 0 0 0.6 0.8"/>
    <camera name="b" pos="2 0 1.5" xyaxes="0 1 0 -0.6 0 0.8"/>
  </worldbody>
</mujoco>"""
  mjm, mjd, m, d, rc, out = _setup(
      xml, width=[48, 24], height=[32, 20])
  rgbs, depths, segs = out
  assert isinstance(rgbs, tuple) and len(rgbs) == 2
  assert rgbs[0].shape == (32, 48, 3) and rgbs[1].shape == (20, 24, 3)
  for k in range(2):
    assert np.any(np.asarray(segs[k]) == 1), f'cam {k} must see the ball'


def test_spot_and_point_lights():
  """Spot cutoff masks the lit disc; point-light attenuation dims with
  distance."""
  xml = """
<mujoco>
  <visual><headlight active="0"/></visual>
  <worldbody>
    <light pos="0 0 2" dir="0 0 -1" cutoff="20" exponent="1"
           diffuse="1 1 1"/>
    <geom name="floor" type="plane" size="6 6 .1" rgba="1 1 1 1"/>
    <camera name="c" pos="0 0 6" xyaxes="1 0 0 0 1 0"/>
  </worldbody>
</mujoco>"""
  mjm, mjd, m, d, rc, out = _setup(xml, width=64, height=64)
  rgb = np.asarray(out[0][0])
  lum = rgb.mean(-1)
  # the spot (cutoff 20 deg from z=2) lights a disc of radius
  # 2*tan(20deg) ~ 0.73 m; center bright, corners dark
  c = lum[32, 32]
  corner = lum[2, 2]
  assert c > 0.25, c
  assert corner < 0.35 * c, (c, corner)


def test_material_emission():
  xml = """
<mujoco>
  <visual><headlight active="0"/></visual>
  <asset><material name="glow" emission="1" rgba="0 1 0 1"/></asset>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 .1" rgba="0.5 0.5 0.5 1"/>
    <body pos="0 0 1"><geom type="sphere" size=".4" material="glow"/></body>
    <camera name="c" pos="0 -3 1" xyaxes="1 0 0 0 0 1"/>
  </worldbody>
</mujoco>"""
  mjm, mjd, m, d, rc, out = _setup(xml, width=48, height=48)
  rgb = np.asarray(out[0][0])
  seg = np.asarray(out[2][0])
  ball = rgb[seg == 1]
  assert len(ball) > 20
  # emission=1, no lights: the ball renders at its full material color
  assert ball[:, 1].min() > 0.9
  assert ball[:, 0].max() < 0.1
