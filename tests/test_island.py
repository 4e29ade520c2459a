"""Island discovery vs MuJoCo C (dof_island/efc_island/nisland).

Counterpart of reference island_test.py: labels must form the same
partition with MuJoCo's numbering (ranked by smallest member tree).
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
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <body pos="0 0 0.08">
      <freejoint/>
      <geom size="0.1"/>
    </body>
    <body pos="1 0 0.08">
      <freejoint/>
      <geom size="0.1"/>
    </body>
    <body pos="0.12 0 0.25">
      <freejoint/>
      <geom size="0.1"/>
    </body>
    <body pos="5 5 3">
      <freejoint/>
      <geom size="0.1"/>
    </body>
    <body pos="2 0 0.5">
      <joint type="hinge" axis="0 1 0" limited="true" range="-0.5 0.5"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0"/>
    </body>
  </worldbody>
</mujoco>
"""


def _build(qpos_noise=0.0, nstep=0):
  mjm = mujoco.MjModel.from_xml_string(_XML)
  mjd = mujoco.MjData(mjm)
  if qpos_noise:
    rng = np.random.default_rng(1)
    mjd.qpos[:] += qpos_noise * rng.standard_normal(mjm.nq)
  if nstep:
    mujoco.mj_step(mjm, mjd, nstep)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  return mjm, mjd, m, d


@pytest.mark.parametrize('nstep', [0, 50])
def test_island_labels(nstep):
  # spheres 1+3 stacked (one island incl. floor contacts), sphere 2 its
  # own island, sphere 4 in flight (unconstrained), hinge at the limit
  mjm, mjd, m, d = _build(nstep=nstep)
  # islands are computed in-pipeline only under sleeping (matching the
  # reference, forward.py:675); invoke the labeler directly here
  from mujoco_warp_tpu.ops import island as island_ops
  d = jax.jit(lambda d: island_ops.island(m, fwd.forward(m, d)))(d)
  assert int(d.nisland) == mjd.nisland
  np.testing.assert_array_equal(np.asarray(d.dof_island), mjd.dof_island)
  # efc rows: compare labels on our active rows against the oracle rows
  # via (type-independent) multiset of (island -> row count)
  ours = np.asarray(d.efc_island)
  active = np.asarray(d.efc_active)
  ref_counts = np.bincount(mjd.efc_island[mjd.efc_island >= 0],
                           minlength=mjd.nisland)
  our_counts = np.bincount(ours[(ours >= 0) & active],
                           minlength=int(d.nisland))
  np.testing.assert_array_equal(our_counts, ref_counts)
