"""Heightfield narrowphase vs MuJoCo C oracle.

Flat terrain (plane-equivalent: exact parity expected) and a ramp.
"""

import jax
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io
from mujoco_warp_tpu.ops import forward as fwd

_XML = """
<mujoco>
  <option timestep="0.002"/>
  <asset>
    <hfield name="terrain" nrow="11" ncol="11" size="2 2 {zscale} 0.1"
            elevation="{elev}"/>
  </asset>
  <worldbody>
    <geom name="hf" type="hfield" hfield="terrain"/>
    <body pos="0.1 0.05 {z0}">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.1"/>
    </body>
    <body pos="-0.4 0.2 {z1}">
      <freejoint/>
      <geom name="cap" type="capsule" size="0.05 0.15" euler="0 90 0"/>
    </body>
    <body pos="0.5 -0.5 {z2}">
      <freejoint/>
      <geom name="bx" type="box" size="0.08 0.08 0.08"/>
    </body>
  </worldbody>
</mujoco>
"""


def _elev_flat():
  return ' '.join(['0.5'] * 121)


def _elev_ramp():
  # height rises along +x
  rows = []
  for r in range(11):
    for c in range(11):
      rows.append(f'{c / 10.0:.3f}')
  return ' '.join(rows)


def _build(elev, zscale=0.4, z0=0.28, z1=0.24, z2=0.26):
  xml = _XML.format(elev=elev, zscale=zscale, z0=z0, z1=z1, z2=z2)
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  return mjm, mjd, m, d


def test_hfield_flat_parity():
  # flat elevation 0.5 * zscale 0.4 = surface at z = 0.2
  mjm, mjd, m, d = _build(_elev_flat())
  d = jax.jit(lambda d: fwd.forward(m, d))(d)
  assert int(d.ncon_active) == mjd.ncon
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=5e-3,
                             rtol=1e-3)
  np.testing.assert_allclose(np.asarray(d.qfrc_constraint),
                             mjd.qfrc_constraint, atol=5e-3, rtol=1e-3)


def test_hfield_ramp_settles():
  # drop bodies on a ramp; both engines settle to similar heights
  mjm, mjd, m, d = _build(_elev_ramp(), z0=0.5, z1=0.5, z2=0.55)
  step = jax.jit(lambda d: fwd.step(m, d))
  for _ in range(400):
    mujoco.mj_step(mjm, mjd)
  for _ in range(400):
    d = step(d)
  ours = np.asarray(d.qpos).reshape(3, 7)
  ref = mjd.qpos.reshape(3, 7)
  # resting heights within a centimeter; x drift of the same sign/order
  np.testing.assert_allclose(ours[:, 2], ref[:, 2], atol=0.015)


def test_hfield_surface_normal():
  from mujoco_warp_tpu.ops import collision_hfield
  mjm, mjd, m, d = _build(_elev_ramp())
  import jax.numpy as jnp
  xy = jnp.asarray([[0.0, 0.0], [1.0, 0.5], [-1.5, -1.0]], jnp.float32)
  h, nrm, inside = collision_hfield._surface(m, 0, xy)
  # ramp: z = 0.4 * (x + 2) / 4  -> dz/dx = 0.1; slope normal
  expected = np.array([-0.1, 0.0, 1.0])
  expected = expected / np.linalg.norm(expected)
  for i in range(3):
    x = float(xy[i, 0])
    np.testing.assert_allclose(float(h[i]), 0.4 * (x + 2.0) / 4.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(nrm[i]), expected, atol=1e-5)
  assert bool(jnp.all(inside))
