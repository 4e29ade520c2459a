"""Mesh collision tests: plane-mesh analytic + mesh-primitive MPR."""

import os
import tempfile

import jax
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import models
from mujoco_warp_tpu.ops import forward as fwd
from tests.oracle import assert_close

XML = """
<mujoco>
  <option timestep="0.002"/>
  <asset>
    <mesh name="tetra" vertex="0.08 0 0  -0.04 0.07 0  -0.04 -0.07 0  0 0 0.1"/>
    <mesh name="wedge" vertex="0.1 0.05 0  -0.1 0.05 0  0.1 -0.05 0  -0.1 -0.05 0  0.1 0 0.08  -0.1 0 0.08"/>
  </asset>
  <worldbody>
    <geom type="plane" size="3 3 0.1"/>
    <body pos="0 0 0.3">
      <freejoint/>
      <geom type="mesh" mesh="tetra"/>
    </body>
    <body pos="0.4 0 0.4" euler="0 15 30">
      <freejoint/>
      <geom type="mesh" mesh="wedge"/>
    </body>
    <body pos="0.02 0.01 0.7">
      <freejoint/>
      <geom type="sphere" size="0.06"/>
    </body>
  </worldbody>
</mujoco>"""


def test_mesh_settle():
  """Tetra + wedge meshes fall on the plane, sphere lands on them."""
  with tempfile.NamedTemporaryFile('w', suffix='.xml', delete=False) as f:
    f.write(XML)
    path = f.name
  mjm, mjd, m, d = models.fixture(path)
  os.unlink(path)
  step = jax.jit(lambda d: fwd.step(m, d))
  for _ in range(500):
    mujoco.mj_step(mjm, mjd)
  for _ in range(500):
    d = step(d)
  d = jax.block_until_ready(d)
  qpos = np.asarray(d.qpos)
  assert np.all(np.isfinite(qpos))
  zs_ours = qpos[2::7]
  zs_ref = mjd.qpos[2::7]
  # settled above the floor and near the C solution
  assert np.all(zs_ours > -0.02)
  np.testing.assert_allclose(zs_ours, zs_ref, atol=0.08)
