"""SDF narrowphase sanity: descent finds known penetrations.

Counterpart of reference test strategy for collision_sdf (SURVEY §4):
analytic ground truth for primitive pairs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_warp_tpu import types
from mujoco_warp_tpu.ops import collision_sdf

_GT = types.GeomType


def _pose(pos):
  return (jnp.asarray([pos], jnp.float32),
          jnp.eye(3, dtype=jnp.float32)[None])


def test_sphere_sphere_penetration():
  p1, m1 = _pose([0.0, 0.0, 0.0])
  p2, m2 = _pose([0.15, 0.0, 0.0])
  s1 = jnp.asarray([[0.1, 0.0, 0.0]], jnp.float32)
  s2 = jnp.asarray([[0.1, 0.0, 0.0]], jnp.float32)
  dist, pos, nrm = collision_sdf.sdf_collide(
      _GT.SPHERE, _GT.SPHERE, p1, m1, s1, p2, m2, s2,
      iterations=40, initpoints=8)
  # gap = 0.15 - 0.2 = -0.05
  np.testing.assert_allclose(float(dist[0, 0]), -0.05, atol=5e-3)
  # normal points from geom1 toward geom2 (+x)
  np.testing.assert_allclose(np.asarray(nrm[0, 0]), [1.0, 0.0, 0.0],
                             atol=5e-2)
  # contact point on the axis between centers
  np.testing.assert_allclose(float(pos[0, 0, 1]), 0.0, atol=5e-3)
  np.testing.assert_allclose(float(pos[0, 0, 2]), 0.0, atol=5e-3)


def test_sphere_box_penetration():
  p1, m1 = _pose([0.0, 0.0, 0.25])   # sphere above
  p2, m2 = _pose([0.0, 0.0, 0.0])    # box
  s1 = jnp.asarray([[0.1, 0.0, 0.0]], jnp.float32)
  s2 = jnp.asarray([[0.2, 0.2, 0.2]], jnp.float32)
  dist, pos, nrm = collision_sdf.sdf_collide(
      _GT.SPHERE, _GT.BOX, p1, m1, s1, p2, m2, s2,
      iterations=40, initpoints=8)
  # sphere bottom at z=0.15, box top at z=0.2 -> gap = -0.05
  np.testing.assert_allclose(float(dist[0, 0]), -0.05, atol=8e-3)
  assert abs(float(nrm[0, 0, 2])) > 0.9


def test_capsule_cylinder_separated():
  p1, m1 = _pose([0.0, 0.0, 1.0])
  p2, m2 = _pose([0.0, 0.0, 0.0])
  s1 = jnp.asarray([[0.1, 0.2, 0.0]], jnp.float32)
  s2 = jnp.asarray([[0.15, 0.2, 0.0]], jnp.float32)
  dist, _, _ = collision_sdf.sdf_collide(
      _GT.CAPSULE, _GT.CYLINDER, p1, m1, s1, p2, m2, s2,
      iterations=40, initpoints=8)
  # capsule bottom z=0.7, cylinder top z=0.2 -> gap = +0.5
  assert float(dist[0, 0]) > 0.2


def test_ellipsoid_sdf_surface():
  size = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
  on = jnp.asarray([0.1, 0.0, 0.0], jnp.float32)
  v = collision_sdf.sdf_primitive(_GT.ELLIPSOID, on, size)
  np.testing.assert_allclose(float(v), 0.0, atol=1e-5)
  inside = collision_sdf.sdf_primitive(
      _GT.ELLIPSOID, jnp.zeros(3, jnp.float32) + 1e-3, size)
  assert float(inside) < 0


def test_sdf_dispatch_torus_drop():
  import jax
  """SDF geoms ride the driver dispatch: a plugin torus drops onto the
  plane and rests at the oracle height (reference: collision_sdf.py:1007
  sdf_narrowphase wired into collision_driver dispatch)."""
  import mujoco
  from mujoco_warp_tpu import io
  from mujoco_warp_tpu.ops import forward as fwd

  xml = """<mujoco>
  <extension><plugin plugin="mujoco.sdf.torus"><instance name="t"/></plugin>
  </extension>
  <asset><mesh name="tm"><plugin instance="t"/></mesh></asset>
  <worldbody><geom type="plane" size="2 2 .1"/>
  <body pos="0 0 .5"><freejoint/>
    <geom type="sdf" mesh="tm"><plugin instance="t"/></geom></body>
  </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm, sdf_plugins={'t': 'mujoco.sdf.torus'})
  assert m.ncon == 4
  d = io.put_data(mjm, mjd, m)
  step = jax.jit(lambda dd: fwd.step(m, dd))
  for _ in range(400):
    d = step(d)
    mujoco.mj_step(mjm, mjd)
  z = float(np.asarray(d.qpos)[2])
  assert abs(z - mjd.qpos[2]) < 5e-3, (z, mjd.qpos[2])
  assert np.all(np.isfinite(np.asarray(d.qpos)))


_MBOX_SDF_XML = """
<mujoco>
  <asset><mesh name="mbox" vertex="
    -0.1 -0.08 -0.06  0.1 -0.08 -0.06  0.1 0.08 -0.06  -0.1 0.08 -0.06
    -0.1 -0.08 0.06  0.1 -0.08 0.06  0.1 0.08 0.06  -0.1 0.08 0.06"/>
  </asset>
  <worldbody>{body}</worldbody>
</mujoco>"""


def test_mesh_octree_sdf_values():
  """The compiled-octree SDF (reference collision_sdf.py:319 find_oct)
  matches the analytic box SDF in the mesh's compiled frame, with
  finite autodiff gradients (the SDF-collision descent needs them)."""
  import mujoco
  mjm = mujoco.MjModel.from_xml_string(_MBOX_SDF_XML.format(
      body='<body><geom type="sdf" mesh="mbox"/></body>'))
  fn = collision_sdf.make_octree_sdf(mjm, 0)
  rng = np.random.default_rng(0)
  p = rng.uniform(-0.15, 0.15, (2048, 3)).astype(np.float32)
  vals = np.asarray(jax.jit(lambda pp: fn(pp, None))(jnp.asarray(p)))
  # compiled mesh frame reorients the box to (0.06, 0.08, 0.1)
  vadr, vn = int(mjm.mesh_vertadr[0]), int(mjm.mesh_vertnum[0])
  size = np.abs(mjm.mesh_vert[vadr:vadr + vn]).max(0)
  q = np.abs(p) - size
  exact = np.linalg.norm(np.maximum(q, 0), axis=-1) + \
      np.minimum(q.max(-1), 0)
  err = np.abs(vals - exact)
  assert err.mean() < 2e-3, err.mean()
  assert np.percentile(err, 95) < 6e-3
  g = jax.jit(jax.vmap(jax.grad(lambda pp: fn(pp, None))))(
      jnp.asarray(p[:128]))
  assert np.isfinite(np.asarray(g)).all()


def test_mesh_sdf_geom_drop():
  """A sphere dropped on a plugin-less SDF geom (mesh octree) rests at
  the C oracle height."""
  import mujoco
  from mujoco_warp_tpu import io
  from mujoco_warp_tpu.ops import forward as fwd
  body = ('<geom type="plane" size="2 2 .1"/>'
          '<body pos="0 0 0.0601"><geom type="sdf" mesh="mbox"/></body>'
          '<body pos="0.0 0 0.3"><freejoint/>'
          '<geom type="sphere" size="0.05" mass="0.1"/></body>')
  mjm = mujoco.MjModel.from_xml_string(_MBOX_SDF_XML.format(body=body))
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  step = jax.jit(lambda dd: fwd.step(m, dd))
  for _ in range(400):
    d = step(d)
    mujoco.mj_step(mjm, mjd)
  z = float(np.asarray(d.qpos)[2])
  assert np.all(np.isfinite(np.asarray(d.qpos)))
  assert abs(z - mjd.qpos[2]) < 1e-2, (z, mjd.qpos[2])
