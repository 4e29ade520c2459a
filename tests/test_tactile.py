"""Tactile (taxel) sensor oracle parity (reference: sensor.py:2181
`_sensor_tactile`; C oracle: mjSENS_TACTILE, mujoco >= 3.10).

Channel 0 = per-taxel max penetration depth into contacting geoms (SDF
query, MuJoCo's radial-field interior for boxes), channels 1/2 = summed
|relative velocity| along the taxel tangents.
"""

import jax
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io, types
from mujoco_warp_tpu.ops import forward

_XML = """
<mujoco>
  <asset>
    <mesh name="smesh" builtin="wedge" params="9 9 45 45 0" scale=".3 .3 .3"/>
  </asset>
  <worldbody>
    <body name="sb" pos="0 0 0.45">
      <freejoint/>
      <geom name="sg" type="sphere" size=".3" mass="1"/>
      <geom name="tax" type="mesh" mesh="smesh" contype="0" conaffinity="0"
            mass="0"/>
    </body>
    <body pos="0 0 0" euler="0 0 25">
      <geom name="other" type="{gtype}" size="{gsize}"/>
    </body>
  </worldbody>
  <sensor><tactile geom="tax" mesh="smesh"/></sensor>
</mujoco>"""


def _compare(gtype, gsize, qpos7=None, qvel=None):
  mjm = mujoco.MjModel.from_xml_string(_XML.format(gtype=gtype, gsize=gsize))
  mjd = mujoco.MjData(mjm)
  if qpos7 is not None:
    mjd.qpos[:7] = qpos7
  if qvel is not None:
    mjd.qvel[:] = qvel
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  d = jax.jit(lambda dd: forward.forward(m, dd))(d)
  return np.asarray(d.sensordata), mjd.sensordata.copy(), mjm


@pytest.mark.parametrize('gtype,gsize', [
    ('box', '.7 .7 .3'),
    ('sphere', '.4'),
    ('capsule', '.25 .4'),
    ('cylinder', '.5 .28'),
])
def test_tactile_oracle(gtype, gsize):
  """Depth + tangential-velocity channels match the C oracle exactly on
  a resting, sliding, and tilted sensor body."""
  rng = np.random.default_rng(3)
  poses = [
      (None, None),
      (None, np.asarray([0.3, -0.1, 0.0, 0.0, 0.0, 0.1])),
      (np.asarray([0.02, -0.03, 0.42, 0.98, 0.1, 0.15, 0.0]),
       np.asarray([0.1, 0.2, -0.05, 0.3, 0.0, -0.2])),
  ]
  for qpos7, qvel in poses:
    if qpos7 is not None:
      qpos7 = qpos7.copy()
      qpos7[3:] /= np.linalg.norm(qpos7[3:])
    ours, ref, _ = _compare(gtype, gsize, qpos7, qvel)
    np.testing.assert_allclose(ours, ref, atol=5e-5,
                               err_msg=f'{gtype} pose={qpos7}')
    assert np.count_nonzero(ref) > 0  # the scene must actually touch


def test_tactile_no_contact_is_zero():
  """Separated bodies produce all-zero taxel channels."""
  ours, ref, _ = _compare('box', '.7 .7 .3',
                          np.asarray([0.0, 0.0, 3.0, 1, 0, 0, 0]), None)
  assert not np.any(ours)
  assert not np.any(ref)


def test_tactile_specs_static():
  """The static spec carries the taxel table and the candidate geoms."""
  mjm = mujoco.MjModel.from_xml_string(
      _XML.format(gtype='box', gsize='.7 .7 .3'))
  m = io.put_model(mjm)
  assert len(m.tactile_specs) == 1
  adr, gid, pweld, verts, frame, has_frame, cands, ctypes = \
      m.tactile_specs[0]
  assert verts.shape == (81, 3) and frame.shape == (81, 3, 3)
  assert has_frame
  assert list(ctypes) == [int(types.GeomType.BOX)]
  # taxel geom itself (contype 0) is not a candidate
  assert int(mjm.geom('tax').id) not in list(cands)
