"""Adversarial convex-CCD parity: MPR vs the C oracle over random poses.

VERDICT round-1 item 8: quantify the fixed-iteration MPR substitute's
divergence from the reference GJK/EPA (collision_gjk_test.py:1063 is the
reference's version of this suite) across shallow AND deep overlaps.
"""

import jax
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io
from mujoco_warp_tpu.ops import forward as fwd

_MESH_BOX = """
<mesh name="mbox" vertex="
  -0.1 -0.08 -0.06   0.1 -0.08 -0.06   0.1 0.08 -0.06  -0.1 0.08 -0.06
  -0.1 -0.08  0.06   0.1 -0.08  0.06   0.1 0.08  0.06  -0.1 0.08  0.06"/>
"""


def _scene(geom_b):
  return f"""
<mujoco>
  <asset>{_MESH_BOX}</asset>
  <worldbody>
    <body><freejoint/><geom type="mesh" mesh="mbox" mass="1"/></body>
    <body pos="0 0 1"><freejoint/>{geom_b}</body>
  </worldbody>
</mujoco>"""


def _random_pose(rng, depth_scale):
  """Second body pose near the first with controlled overlap depth."""
  axis = rng.standard_normal(3)
  axis /= np.linalg.norm(axis)
  dist = 0.12 + 0.1 * rng.random() - depth_scale
  q = rng.standard_normal(4)
  q /= np.linalg.norm(q)
  return axis * dist, q


def _compare(xml, nposes, depth_scale, seed=0):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  rng = np.random.default_rng(seed)
  fwd_j = jax.jit(lambda dd: fwd.forward(m, dd))
  derr, nerr, checked = [], [], 0
  for _ in range(nposes):
    pos, q = _random_pose(rng, depth_scale)
    mujoco.mj_resetData(mjm, mjd)
    mjd.qpos[7:10] = pos
    mjd.qpos[10:14] = q
    mujoco.mj_forward(mjm, mjd)
    d = io.put_data(mjm, mjd, m)
    d = fwd_j(d)
    if mjd.ncon == 0:
      continue
    checked += 1
    # oracle's deepest contact vs engine's deepest active slot
    oc = min(range(mjd.ncon), key=lambda i: mjd.contact.dist[i])
    odist = mjd.contact.dist[oc]
    onrm = mjd.contact.frame[oc][:3]
    dist = np.asarray(d.contact.dist)
    inc = np.asarray(d.contact.includemargin)
    act = dist < inc
    if not act.any():
      derr.append(abs(odist))  # missed contact entirely
      nerr.append(2.0)
      continue
    s = int(np.argmin(np.where(act, dist, 1e9)))
    derr.append(abs(float(dist[s]) - odist))
    nrm = np.asarray(d.contact.frame)[s][0]  # frame rows: [n, t1, t2]
    # the engine's canonical pair order (smaller TYPE first) can flip
    # geom1/geom2 vs the oracle's id order; the frame flips with it —
    # physics is invariant, so compare orientation up to the ordering
    g1 = np.asarray(d.contact.geom1)[s]
    og1 = mjd.contact.geom1[oc]
    sign = 1.0 if g1 == og1 else -1.0
    nerr.append(float(np.linalg.norm(sign * nrm - onrm)))
  return np.asarray(derr), np.asarray(nerr), checked


CASES = [
    ('mesh-sphere', '<geom type="sphere" size="0.07" mass="1"/>'),
    ('mesh-capsule', '<geom type="capsule" size="0.04 0.08" mass="1"/>'),
    ('mesh-box', '<geom type="box" size="0.06 0.05 0.07" mass="1"/>'),
    ('mesh-mesh', '<geom type="mesh" mesh="mbox" mass="1"/>'),
]


@pytest.mark.parametrize('name,geom', CASES)
def test_shallow_overlap(name, geom):
  """Shallow contacts (the solver-relevant regime): depth err < 5 mm,
  normals within ~25 degrees on 50 random poses."""
  derr, nerr, checked = _compare(_scene(geom), 50, depth_scale=0.02)
  assert checked >= 10, f'{name}: only {checked} contacting poses'
  print(f'{name} shallow: n={checked} depth err mean '
        f'{derr.mean():.4f} max {derr.max():.4f}; normal err mean '
        f'{nerr.mean():.3f} max {nerr.max():.3f}')
  # post EPA-analog polish (collision_convex.mpr phase 3): sub-mm depth
  # parity with the C oracle's GJK/EPA
  assert derr.mean() < 1e-3, f'{name} mean depth err {derr.mean()}'
  assert np.median(derr) < 2e-4, f'{name} median depth err {np.median(derr)}'
  assert np.median(nerr) < 0.05, f'{name} median normal err {np.median(nerr)}'


@pytest.mark.parametrize('name,geom', CASES[:3])
def test_deep_overlap_recovery(name, geom):
  """Deep overlaps (EPA regime in the reference): the engine must still
  report penetration (dist < 0) with a usable normal — quantified, not
  exact (MPR's recovery differs from EPA by design)."""
  mjm = mujoco.MjModel.from_xml_string(_scene(geom))
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  rng = np.random.default_rng(1)
  fwd_j = jax.jit(lambda dd: fwd.forward(m, dd))
  found, total = 0, 0
  for _ in range(30):
    pos, q = _random_pose(rng, depth_scale=0.08)  # deep
    mujoco.mj_resetData(mjm, mjd)
    mjd.qpos[7:10] = pos
    mjd.qpos[10:14] = q
    mujoco.mj_forward(mjm, mjd)
    if mjd.ncon == 0 or mjd.contact.dist[:mjd.ncon].min() > -0.02:
      continue
    total += 1
    d = fwd_j(io.put_data(mjm, mjd, m))
    dist = np.asarray(d.contact.dist)
    act = dist < np.asarray(d.contact.includemargin)
    if act.any() and float(dist[act].min()) < 0:
      found += 1
  assert total >= 5, f'{name}: only {total} deep poses'
  # MPR + polish recovers penetration on every deep overlap
  assert found == total, f'{name}: {found}/{total} deep recoveries'


# ---- per-pair-type table: every convex primitive pair through the MPR
# path (reference collision_gjk_test.py:1063 per-pair tables)

_PRIM = {
    'sphere': '<geom type="sphere" size="0.08" mass="1"/>',
    'capsule': '<geom type="capsule" size="0.05 0.07" mass="1"/>',
    'ellipsoid': '<geom type="ellipsoid" size="0.09 0.07 0.05" mass="1"/>',
    'cylinder': '<geom type="cylinder" size="0.07 0.06" mass="1"/>',
    'box': '<geom type="box" size="0.08 0.06 0.05" mass="1"/>',
}


def _pair_scene(ga, gb):
  return f"""
<mujoco>
  <worldbody>
    <body><freejoint/>{ga}</body>
    <body pos="0 0 1"><freejoint/>{gb}</body>
  </worldbody>
</mujoco>"""


_PAIRS = [
    ('sphere', 'box'),
    ('box', 'box'), ('box', 'capsule'), ('box', 'cylinder'),
    ('box', 'ellipsoid'), ('capsule', 'cylinder'),
    ('capsule', 'ellipsoid'), ('cylinder', 'cylinder'),
    ('cylinder', 'ellipsoid'), ('ellipsoid', 'ellipsoid'),
    ('ellipsoid', 'sphere'), ('cylinder', 'sphere'),
]


# analytic (non-MPR) pairs keep a documented looser bound: the
# capsule-box endpoint-sphere and sphere-cylinder closed forms trade a
# few mm of depth on deep corner poses for 2-point manifolds / O(1) cost
_ANALYTIC_MEDIAN = {('box', 'capsule'): 8e-3, ('cylinder', 'sphere'): 5e-4}
_ANALYTIC_MEAN = {('box', 'capsule'): 2e-2, ('cylinder', 'sphere'): 8e-3}


@pytest.mark.parametrize('na,nb', _PAIRS)
def test_pair_type_table(na, nb):
  """Overlap depth parity per convex primitive pair."""
  xml = _pair_scene(_PRIM[na], _PRIM[nb])
  derr, nerr, checked = _compare(xml, 40, depth_scale=0.06, seed=2)
  assert checked >= 8, f'{na}-{nb}: only {checked} contacting poses'
  print(f'{na}-{nb}: n={checked} depth err mean {derr.mean():.5f} '
        f'median {np.median(derr):.5f}')
  med = _ANALYTIC_MEDIAN.get((na, nb), 5e-4)
  mean = _ANALYTIC_MEAN.get((na, nb), 3e-3)
  assert np.median(derr) < med, f'{na}-{nb} median {np.median(derr)}'
  assert derr.mean() < mean, f'{na}-{nb} mean {derr.mean()}'
