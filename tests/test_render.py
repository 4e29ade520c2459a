"""Renderer tests: depth vs mj_ray oracle, segmentation sanity, batching."""

import os
import tempfile

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import models
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


@pytest.fixture(scope='module')
def case():
  with tempfile.NamedTemporaryFile('w', suffix='.xml', delete=False) as f:
    f.write(XML)
    path = f.name
  mjm, mjd, m, d = models.fixture(path)
  os.unlink(path)
  rc = render.create_render_context(m, mjm, width=48, height=36)
  d = jax.jit(lambda d: fwd.fwd_position(m, d))(d)
  out = jax.jit(lambda d: render.render(m, d, rc))(d)
  return mjm, mjd, m, d, rc, jax.block_until_ready(out)


def test_depth_vs_mj_ray(case):
  mjm, mjd, m, d, rc, out = case
  depth = np.asarray(out[1][0])
  seg = np.asarray(out[2][0])
  # re-derive a few pixel rays on the host and compare depth with mj_ray
  H, W = rc.height, rc.width
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
    dir_w = mat @ dir_cam
    dir_w /= np.linalg.norm(dir_w)
    ref = mujoco.mj_ray(mjm, mjd, pos, dir_w, None, 1, -1, geomid)
    ours = depth[py, px]
    if ref < 0:
      assert not np.isfinite(ours), f'pixel {py},{px}: bg mismatch'
    else:
      assert abs(ours - ref) < 2e-3, (
          f'pixel {py},{px}: depth {ours} vs mj_ray {ref}')
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


def test_plane_checker():
  """Plane pixels show the checker grid (two distinct shades)."""
  import jax
  import mujoco
  import numpy as np
  from mujoco_warp_tpu import io
  from mujoco_warp_tpu.ops import forward as fwd, render

  xml = """
  <mujoco>
    <worldbody>
      <geom name="floor" type="plane" size="3 3 .1" rgba="0.8 0.8 0.8 1"/>
      <camera name="c" pos="0 -2 2" xyaxes="1 0 0 0 0.7 0.7"/>
    </worldbody>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  d = jax.jit(lambda d: fwd.fwd_position(m, d))(d)
  rc = render.create_render_context(m, mjm, width=48, height=48)
  out = jax.jit(lambda d: render.render(m, d, rc))(d)
  rgb = np.asarray(render.get_rgb(out))[0]
  seg = np.asarray(render.get_segmentation(out))[0]
  floor = rgb[seg == 0][:, 0].astype(np.int32)
  assert len(floor) > 100
  # bimodal shades: spread between bright and dark cells
  assert floor.max() - floor.min() > 40, \
      f'no checker contrast: {floor.min()}..{floor.max()}'
