"""Oracle tests for constraint assembly vs MuJoCo C (mjd.efc_*).

Counterpart of reference mujoco_warp/_src/constraint_test.py.  Our row
layout is static (inactive rows zeroed) while MuJoCo instantiates only
active rows, so rows are matched by (efc_type, efc_id) and compared in
within-group order.
"""

import jax
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu.ops import forward as fwd
from mujoco_warp_tpu import models
from tests.oracle import assert_close


def _match_rows(mjd, ours_type, ours_id, ours_active):
  """Map each active C efc row -> our static row index."""
  mapping = []
  used = set()
  for i in range(mjd.nefc):
    t, eid = int(mjd.efc_type[i]), int(mjd.efc_id[i])
    cands = np.nonzero((ours_type == t) & (ours_id == eid) & ours_active)[0]
    cands = [c for c in cands if c not in used]
    assert cands, f'no matching static row for C efc row {i} (type {t} id {eid})'
    mapping.append(cands[0])
    used.add(cands[0])
  return np.asarray(mapping, np.int64)


@pytest.fixture(scope='module')
def constraints():
  mjm, mjd, m, d = models.fixture(
      'constraints.xml', qpos_noise=0.3, qvel_noise=0.5, ctrl_noise=0.3,
      nstep=3)
  run = jax.jit(lambda d: fwd.fwd_position(m, d))
  d = jax.block_until_ready(run(d))
  return mjm, mjd, m, d


def test_efc_rows(constraints):
  mjm, mjd, m, d = constraints
  active = np.asarray(d.efc_active)
  rowmap = _match_rows(mjd, m.efc.efc_type, m.efc.efc_id, active)

  efc_J_ref = np.asarray(mjd.efc_J).reshape(mjd.nefc, mjm.nv)
  assert_close(np.asarray(d.efc_J)[rowmap], efc_J_ref, 'efc_J')
  assert_close(np.asarray(d.efc_pos)[rowmap], mjd.efc_pos, 'efc_pos')
  assert_close(np.asarray(d.efc_margin)[rowmap], mjd.efc_margin,
               'efc_margin')
  assert_close(np.asarray(d.efc_D)[rowmap], mjd.efc_D, 'efc_D',
               rtol=1e-3)
  assert_close(np.asarray(d.efc_aref)[rowmap], mjd.efc_aref, 'efc_aref',
               rtol=1e-3)
  assert_close(np.asarray(d.efc_frictionloss)[rowmap],
               mjd.efc_frictionloss, 'efc_frictionloss')
  # all C rows accounted for and no spurious extra active rows beyond
  # limits that C drops (we keep limit rows active only when pos<0, same
  # as C), so counts must match exactly
  assert int(np.sum(active)) == mjd.nefc, (
      f'active rows {int(np.sum(active))} != C nefc {mjd.nefc}')


def test_counts(constraints):
  mjm, mjd, m, d = constraints
  assert int(d.ne_active) == mjd.ne
  assert int(d.nf_active) == mjd.nf
  assert int(d.nl_active) == mjd.nl
