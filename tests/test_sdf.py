"""SDF narrowphase sanity: descent finds known penetrations.

Counterpart of reference test strategy for collision_sdf (SURVEY §4):
analytic ground truth for primitive pairs.
"""

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
