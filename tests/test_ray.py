"""Oracle tests for ray casting vs mj_ray (reference: ray_test.py)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import models
from mujoco_warp_tpu.ops import forward as fwd, ray as ray_ops


RAY_XML = 'spheres.xml'


def test_rays_vs_mujoco():
  mjm, mjd, m, d = models.fixture(RAY_XML, qvel_noise=0.2, nstep=10)
  d = jax.jit(lambda d: fwd.fwd_position(m, d))(d)

  rng = np.random.default_rng(0)
  npnt = 64
  pnts = np.stack([
      rng.uniform(-1.5, 2.0, npnt),
      rng.uniform(-1.0, 1.5, npnt),
      rng.uniform(0.5, 2.0, npnt),
  ], axis=-1)
  vecs = rng.standard_normal((npnt, 3))
  vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)

  dist, gid = jax.jit(lambda d, p, v: ray_ops.rays(m, d, p, v))(
      d, jnp.asarray(pnts, jnp.float32), jnp.asarray(vecs, jnp.float32))
  dist = np.asarray(dist)
  gid = np.asarray(gid)

  geomid = np.zeros(1, np.int32)
  nbad = 0
  for i in range(npnt):
    ref = mujoco.mj_ray(mjm, mjd, pnts[i], vecs[i], None, 1, -1, geomid)
    if ref < 0:
      ok = dist[i] < 0
    else:
      ok = abs(dist[i] - ref) < 5e-3 and gid[i] == geomid[0]
    if not ok:
      nbad += 1
  assert nbad <= 1, f'{nbad}/{npnt} rays mismatch'


def test_rays_mesh_hfield():
  """Triangle-soup rays (mesh + heightfield) vs mj_ray."""
  from mujoco_warp_tpu import io
  xml = """
  <mujoco>
    <asset>
      <hfield name="hf" nrow="6" ncol="6" size="1 1 0.4 0.1"
              elevation="0 0 0 0 0 0  0 .2 .3 .3 .2 0  0 .3 1 1 .3 0
                         0 .3 1 1 .3 0  0 .2 .3 .3 .2 0  0 0 0 0 0 0"/>
      <mesh name="tet" vertex="0 0 0  0.3 0 0  0 0.3 0  0 0 0.3"/>
    </asset>
    <worldbody>
      <geom type="hfield" hfield="hf" pos="0 0 0"/>
      <body pos="1.5 0 0.5">
        <freejoint/>
        <geom type="mesh" mesh="tet"/>
      </body>
    </worldbody>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  d = jax.jit(lambda d: fwd.fwd_position(m, d))(d)

  rng = np.random.default_rng(3)
  npnt = 64
  pnts = np.stack([
      rng.uniform(-1.5, 2.2, npnt),
      rng.uniform(-1.2, 1.2, npnt),
      rng.uniform(1.0, 2.0, npnt),
  ], axis=-1)
  vecs = rng.standard_normal((npnt, 3))
  vecs[:, 2] -= 0.8  # bias downward so terrain gets hit
  vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)

  dist, gid = jax.jit(lambda d, p, v: ray_ops.rays(m, d, p, v))(
      d, jnp.asarray(pnts, jnp.float32), jnp.asarray(vecs, jnp.float32))
  dist = np.asarray(dist)
  gid = np.asarray(gid)

  geomid = np.zeros(1, np.int32)
  nbad = 0
  nhit = 0
  for i in range(npnt):
    ref = mujoco.mj_ray(mjm, mjd, pnts[i], vecs[i], None, 1, -1, geomid)
    if ref < 0:
      ok = dist[i] < 0
    else:
      nhit += 1
      ok = gid[i] == geomid[0] and abs(dist[i] - ref) < 5e-3
    nbad += not ok
  assert nhit > 10, 'test geometry not exercised'
  assert nbad == 0, f'{nbad}/{npnt} rays disagree with mj_ray'
