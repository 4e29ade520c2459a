"""Tests for the generic convex (MPR) narrowphase.

The C oracle uses GJK/EPA (nativeccd); MPR agrees on penetration depth
and normal for convex primitives to looser tolerance, so contacts are
compared geometrically and dynamics at trajectory level.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import models
from mujoco_warp_tpu.ops import collision_convex, forward as fwd
from tests.oracle import assert_close

XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="4 4 0.1"/>
    <body pos="0 0 0.4">
      <freejoint/>
      <geom type="cylinder" size="0.08 0.12"/>
    </body>
    <body pos="0.05 0.02 0.75" euler="30 20 0">
      <freejoint/>
      <geom type="capsule" size="0.05 0.1"/>
    </body>
    <body pos="0.5 0 0.3">
      <freejoint/>
      <geom type="ellipsoid" size="0.1 0.07 0.05"/>
    </body>
    <body pos="0.55 0.04 0.6">
      <freejoint/>
      <geom type="ellipsoid" size="0.06 0.06 0.09"/>
    </body>
  </worldbody>
</mujoco>"""


def test_mpr_sphere_sphere_exact():
  """MPR on two spheres must match the analytic answer."""
  pos1 = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
  pos2 = jnp.asarray([[0.25, 0.0, 0.0]], jnp.float32)
  eye = jnp.eye(3, dtype=jnp.float32)[None]
  s1 = jnp.asarray([[0.2, 0, 0]], jnp.float32)
  s2 = jnp.asarray([[0.1, 0, 0]], jnp.float32)
  hit, depth, normal, point = collision_convex.mpr(
      int(collision_convex._GT.SPHERE), int(collision_convex._GT.SPHERE),
      pos1, eye, s1, pos2, eye, s2, jnp.zeros((1, 1), jnp.float32))
  assert bool(hit[0])
  assert abs(float(depth[0]) - 0.05) < 2e-3
  np.testing.assert_allclose(np.asarray(normal[0]), [1, 0, 0], atol=2e-2)
  assert abs(float(point[0, 0]) - 0.175) < 5e-3


def test_mpr_box_box_depth():
  eye = jnp.eye(3, dtype=jnp.float32)[None]
  pos1 = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
  pos2 = jnp.asarray([[0.0, 0.0, 0.18]], jnp.float32)
  s = jnp.asarray([[0.1, 0.1, 0.1]], jnp.float32)
  hit, depth, normal, point = collision_convex.mpr(
      int(collision_convex._GT.BOX), int(collision_convex._GT.BOX),
      pos1, eye, s, pos2, eye, s, jnp.zeros((1, 1), jnp.float32))
  assert bool(hit[0])
  assert abs(float(depth[0]) - 0.02) < 3e-3
  np.testing.assert_allclose(np.asarray(normal[0]), [0, 0, 1], atol=5e-2)


def test_convex_contacts_vs_mujoco():
  with tempfile.NamedTemporaryFile('w', suffix='.xml', delete=False) as f:
    f.write(XML)
    path = f.name
  mjm, mjd, m, d = models.fixture(path, qvel_noise=0.3, nstep=60)
  os.unlink(path)
  d = jax.block_until_ready(jax.jit(lambda d: fwd.fwd_position(m, d))(d))
  dist = np.asarray(d.contact.dist)
  inc = np.asarray(d.contact.includemargin)
  g1, g2 = d.contact.geom1, d.contact.geom2
  # every penetrating C contact (non-plane pairs too) has a matching slot
  miss = 0
  for i in range(mjd.ncon):
    c = mjd.contact
    if c.dist[i] > -1e-5:
      continue
    pair = (min(c.geom1[i], c.geom2[i]), max(c.geom1[i], c.geom2[i]))
    slots = [j for j in range(len(g1))
             if (min(g1[j], g2[j]), max(g1[j], g2[j])) == pair
             and dist[j] < inc[j]]
    if not slots:
      miss += 1
      continue
    best = min(abs(dist[j] - c.dist[i]) for j in slots)
    if best > 3e-3:
      miss += 1
  assert miss == 0, f'{miss} C contacts unmatched'


def test_convex_trajectory():
  """Cylinder/capsule/ellipsoid stack settles like MuJoCo (coarse)."""
  with tempfile.NamedTemporaryFile('w', suffix='.xml', delete=False) as f:
    f.write(XML)
    path = f.name
  mjm, mjd, m, d = models.fixture(path)
  os.unlink(path)
  step = jax.jit(lambda d: fwd.step(m, d))
  for _ in range(400):
    mujoco.mj_step(mjm, mjd)
  for _ in range(400):
    d = step(d)
  d = jax.block_until_ready(d)
  qpos = np.asarray(d.qpos)
  assert np.all(np.isfinite(qpos)), 'NaN in convex trajectory'
  # all bodies should have settled near or above the floor, same as C
  zs_ours = qpos[2::7]
  zs_ref = mjd.qpos[2::7]
  assert np.all(zs_ours > -0.05)
  np.testing.assert_allclose(zs_ours, zs_ref, atol=0.08)


def test_mesh_mesh_manifold_stability():
  """4-point manifolds keep a mesh cube resting flat on a mesh slab.

  Counterpart of reference multicontact (collision_gjk.py): a single
  contact point cannot support a resting face; the manifold must find
  the face corners.
  """
  import jax
  import mujoco
  import numpy as np
  from mujoco_warp_tpu import io
  from mujoco_warp_tpu.ops import forward as fwd

  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <asset>
      <mesh name="slab" vertex="-1 -1 -0.1  1 -1 -0.1  1 1 -0.1  -1 1 -0.1
                                -1 -1 0.1   1 -1 0.1   1 1 0.1   -1 1 0.1"/>
      <mesh name="cube" vertex="-0.1 -0.1 -0.1  0.1 -0.1 -0.1
                                 0.1 0.1 -0.1  -0.1 0.1 -0.1
                                -0.1 -0.1 0.1   0.1 -0.1 0.1
                                 0.1 0.1 0.1   -0.1 0.1 0.1"/>
    </asset>
    <worldbody>
      <geom type="mesh" mesh="slab" pos="0 0 0"/>
      <body pos="0 0 0.22">
        <freejoint/>
        <geom type="mesh" mesh="cube"/>
      </body>
    </worldbody>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)

  # manifold sanity at first touch: 4 penetrating contacts at the corners
  d0 = d.replace(qpos=d.qpos.at[2].set(0.198))
  d0 = jax.jit(lambda d: fwd.fwd_position(m, d))(d0)
  con = d0.contact
  active = np.asarray(con.dist) < np.asarray(con.includemargin)
  assert active.sum() == 4
  pts = np.asarray(con.pos)[active]
  assert np.ptp(pts[:, 0]) > 0.15 and np.ptp(pts[:, 1]) > 0.15, \
      f'manifold did not spread to the corners: {pts}'

  # stability: drop and settle; cube must stay upright at rest height
  step = jax.jit(lambda d: fwd.step(m, d))
  for _ in range(500):
    d = step(d)
  qpos = np.asarray(d.qpos)
  assert abs(qpos[2] - 0.2) < 0.01, f'rest height {qpos[2]}'
  # quaternion stays near identity (no tipping)
  assert abs(qpos[3]) > 0.99, f'cube tipped: quat {qpos[3:7]}'
  qvel = np.asarray(d.qvel)
  assert np.abs(qvel).max() < 0.05, f'still moving: {qvel}'


def test_hull_decimation_support_error():
  """Capped support-vertex tables stay support-accurate.

  `padded_mesh_verts` replaces raw mesh vertices with a <=MAXHULLVERT
  support-relevant hull subset (the TPU memory/bandwidth analog of
  MuJoCo's `maxhullvert` compile option).  The support function of the
  subset must match the full hull's within a small fraction of the mesh
  radius over a dense direction sample.
  """
  from mujoco_warp_tpu.ops import collision_convex as cc

  rng = np.random.default_rng(0)
  # dense ellipsoidal point cloud: 2000 verts, radii (0.3, 0.2, 0.1)
  u = rng.standard_normal((2000, 3))
  u /= np.linalg.norm(u, axis=1, keepdims=True)
  verts = (u * np.array([0.3, 0.2, 0.1])).astype(np.float32)

  sub = cc._support_verts(verts, 64)
  assert len(sub) <= 64

  d = rng.standard_normal((4096, 3))
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  full = (d @ verts.T).max(axis=1)
  dec = (d @ sub.T).max(axis=1)
  err = np.max(full - dec)
  # a uniformly-curved ellipsoid is the worst case for vertex
  # decimation: 64 verts give chordal error ~ r*theta^2/2 with
  # theta ~ sqrt(4pi/64), i.e. ~0.015 at r=0.3 — the bound checks the
  # greedy selection sits at that geometric floor (flat-faced
  # manipulation meshes decimate near-exactly)
  assert err < 0.016, f'support error {err}'
