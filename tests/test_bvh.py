"""Skip-pointer BVH ray casting: exactness vs the dense sweep + C oracle.

The BVH walk (ops/bvh.py) replaces the dense (rays × triangles)
Möller–Trumbore for meshes/hfields above _BVH_MIN_TRIS (reference analog:
bvh.py:310 build + ray.py:701-808 walk).  It must be EXACT — pruning only
skips subtrees whose AABB the ray misses or enters beyond its best hit.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mujoco_warp_tpu import io
from mujoco_warp_tpu.ops import bvh as bvh_ops
from mujoco_warp_tpu.ops import ray as ray_ops
from mujoco_warp_tpu.ops.ray import _ray_triangles


def test_bvh_matches_dense_random_soup():
  rng = np.random.default_rng(0)
  T = 500
  c = rng.uniform(-1, 1, (T, 3))
  t0 = c + 0.1 * rng.standard_normal((T, 3))
  t1 = c + 0.1 * rng.standard_normal((T, 3))
  t2 = c + 0.1 * rng.standard_normal((T, 3))
  tree = bvh_ops.build_tri_bvh(t0, t1, t2)

  R = 512
  p = rng.uniform(-2, 2, (R, 3)).astype(np.float32)
  v = rng.standard_normal((R, 3)).astype(np.float32)
  v /= np.linalg.norm(v, axis=-1, keepdims=True)

  t_bvh = np.asarray(jax.jit(
      lambda p, v: bvh_ops.ray_mesh_bvh(p, v, tree))(
          jnp.asarray(p), jnp.asarray(v)))
  t_dense = np.asarray(_ray_triangles(
      jnp.asarray(p), jnp.asarray(v), jnp.asarray(t0, jnp.float32),
      jnp.asarray(t1, jnp.float32), jnp.asarray(t2, jnp.float32)))
  hit = np.isfinite(t_dense)
  assert np.array_equal(np.isfinite(t_bvh), hit), 'hit sets differ'
  np.testing.assert_allclose(t_bvh[hit], t_dense[hit], atol=1e-5)


def _uv_sphere_xml(nlat=12, nlon=16, r=0.3):
  """Mesh sphere with nlat*nlon*2 ≈ 384 triangles (> _BVH_MIN_TRIS)."""
  vs = []
  for i in range(nlat + 1):
    th = np.pi * i / nlat
    for j in range(nlon):
      ph = 2 * np.pi * j / nlon
      vs.append((r * np.sin(th) * np.cos(ph),
                 r * np.sin(th) * np.sin(ph), r * np.cos(th)))
  vtxt = '  '.join(f'{x:.5f} {y:.5f} {z:.5f}' for x, y, z in vs)
  return f"""
<mujoco>
  <asset><mesh name="ball" vertex="{vtxt}"/></asset>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <body pos="0 0 0.6">
      <freejoint/>
      <geom type="mesh" mesh="ball"/>
    </body>
  </worldbody>
</mujoco>"""


def test_rays_mesh_bvh_vs_mujoco():
  """rays() on a >64-face mesh (BVH path) matches mj_ray."""
  mjm = mujoco.MjModel.from_xml_string(_uv_sphere_xml())
  did = mjm.geom_dataid[1]
  assert mjm.mesh_facenum[did] > ray_ops._BVH_MIN_TRIS, (
      'fixture must exceed the BVH threshold')
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  from mujoco_warp_tpu.ops import forward as fwd
  d = jax.jit(lambda d: fwd.fwd_position(m, d))(d)  # fill geom_xpos/xmat

  rng = np.random.default_rng(1)
  R = 128
  pnt = np.array([[2.0, 0.0, 0.6]] * R)
  # aim well inside the r=0.3 ball: silhouette-grazing rays legitimately
  # disagree between the f32 engine and the f64 oracle
  tgt = rng.uniform(-0.12, 0.12, (R, 3)) + np.array([0.0, 0.0, 0.6])
  vec = tgt - pnt
  vec /= np.linalg.norm(vec, axis=-1, keepdims=True)

  dist, gid = jax.jit(lambda d, p, v: ray_ops.rays(m, d, p, v))(
      d, jnp.asarray(pnt, jnp.float32), jnp.asarray(vec, jnp.float32))
  dist, gid = np.asarray(dist), np.asarray(gid)

  geomid = np.zeros(1, np.int32)
  for i in range(R):
    want = mujoco.mj_ray(mjm, mjd, pnt[i], vec[i], None, 1, -1, geomid)
    if want < 0:
      assert dist[i] < 0, f'ray {i}: engine hit, oracle missed'
    else:
      assert abs(dist[i] - want) < 5e-4, (i, dist[i], want)
      assert gid[i] == geomid[0], (i, gid[i], geomid[0])
