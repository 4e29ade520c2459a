"""Tree sleeping: quiescent kinematic trees stop simulating.

TPU-native counterpart of reference mujoco_warp/_src/sleep.py (sleep:947,
wake:721, wake_collision:744, wake_equality:793) and MuJoCo C's
mjENBL_SLEEP machinery.

Encoding divergence (documented in types.Data.tree_asleep): the reference
stores sleeping islands as cycle linked-lists (next-tree pointers,
sleep.py:889 _build_cycles) so that waking one tree can walk its cycle;
here a sleeping tree stores the *smallest tree id of its sleep group* as a
label, so group wakes are a vectorized label compare instead of a pointer
walk.  Awake trees use the same negative-counter semantics as the
reference (K_AWAKE = fully awake, incremented toward -1 = ready-to-sleep
after MJ_MINAWAKE quiescent steps).

All functions take a single-world Data (callers vmap them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import types

K_AWAKE = types.K_AWAKE
_NEVER = 1  # mjtSleepPolicy.mjSLEEP_AUTO_NEVER


def enabled(m: types.Model) -> bool:
  return bool(m.opt.enableflags & types.EnableBit.SLEEP) and m.ntree > 0


def _tree_masks(m: types.Model):
  """Static (ntree, nv) and (ntree, nbody) membership masks."""
  ntree = m.ntree
  tdof = np.asarray(m.dof_treeid)
  tbody = np.asarray(m.body_treeid)
  dof_mask = np.zeros((ntree, m.nv), bool)
  ok = tdof >= 0
  dof_mask[tdof[ok], np.arange(m.nv)[ok]] = True
  body_mask = np.zeros((ntree, m.nbody), bool)
  okb = tbody >= 0
  body_mask[tbody[okb], np.arange(m.nbody)[okb]] = True
  return dof_mask, body_mask


def _cannot_sleep(m: types.Model, d: types.Data, tol):
  """(ntree,) bool: tree fails the quiescence test (reference
  sleep.py:273 _tree_can_sleep, negated)."""
  dof_mask, body_mask = _tree_masks(m)
  dof_mask = jnp.asarray(dof_mask)
  body_mask = jnp.asarray(body_mask)
  wlen = jnp.asarray(np.asarray(m.dof_length, np.float32))
  v = jnp.abs(wlen * d.qvel)
  viol_v = jnp.where(tol > 0.0, v >= tol, d.qvel != 0.0)
  viol_f = d.qfrc_applied != 0.0
  viol_x = jnp.any(d.xfrc_applied != 0.0, axis=-1)
  bad = (jnp.any(dof_mask & (viol_v | viol_f)[None, :], axis=1) |
         jnp.any(body_mask & viol_x[None, :], axis=1))
  never = jnp.asarray(np.asarray(m.tree_sleep_policy) == _NEVER)
  return bad | never


def sleep(m: types.Model, d: types.Data) -> types.Data:
  """End-of-step sleep pass (reference sleep.py:947).

  1. quiescent awake trees count down toward ready (-1);
  2. constraint islands sleep only when every member tree is ready/asleep;
  3. sleeping trees zero qvel/qacc and take their group label.
  """
  ntree = m.ntree
  asleep = d.tree_asleep
  tol = m.opt.sleep_tolerance.astype(d.qpos.dtype)
  cannot = _cannot_sleep(m, d, tol)

  awake = asleep < 0
  counted = jnp.where(cannot, K_AWAKE, jnp.minimum(asleep + 1, -1))
  a1 = jnp.where(awake, counted, asleep)

  # island agreement: all member trees ready (>= -1) or already asleep
  ti = d.tree_island
  ids = jnp.arange(ntree, dtype=jnp.int32)
  constrained = ti >= 0
  same = (ti[:, None] == ti[None, :]) & constrained[:, None] & \
      constrained[None, :]
  ready = a1 >= -1
  island_ok = ~jnp.any(same & ~ready[None, :], axis=1)
  min_id = jnp.min(jnp.where(same, ids[None, :], ntree), axis=1)

  goes = jnp.where(constrained, island_ok & ready, ready)
  label = jnp.where(constrained, min_id, ids).astype(jnp.int32)
  new_asleep = jnp.where(goes, label, a1).astype(jnp.int32)

  # zero velocities/accelerations of sleeping trees' dofs
  tdof = np.asarray(m.dof_treeid)
  dof_sleeping = jnp.where(
      jnp.asarray(tdof >= 0),
      new_asleep[jnp.asarray(np.maximum(tdof, 0))] >= 0, False)
  qvel = jnp.where(dof_sleeping, 0.0, d.qvel)
  qacc = jnp.where(dof_sleeping, 0.0, d.qacc)
  return d.replace(tree_asleep=new_asleep, qvel=qvel, qacc=qacc)


def _wake_groups(asleep, hit):
  """Wake every tree sharing a sleep label with a hit tree."""
  sleeping = asleep >= 0
  hit = hit & sleeping
  same = (asleep[:, None] == asleep[None, :]) & sleeping[:, None] & \
      sleeping[None, :]
  wake_mask = jnp.any(same & hit[None, :], axis=1)
  return jnp.where(wake_mask, jnp.int32(K_AWAKE), asleep)


def sleep_candidate(m: types.Model, d: types.Data):
  """() bool: some awake tree could pass sleep()'s ready test this step.

  Islands feed only the island-agreement test inside sleep(), and that
  test can only change the outcome for an awake tree whose quiescence
  counter reaches -1 this step (asleep >= -2 before counting, and the
  tree passes the quiescence check).  Already-sleeping trees are frozen:
  their contact rows — and therefore their island labels — are unchanged
  from the step they fell asleep, so skipping the labeler reproduces the
  fresh labels exactly.  A sleeping tree touched by an awake one is woken
  by wake_collision/wake_equality BEFORE sleep() runs, resetting its
  counter to K_AWAKE (< -2) — never a candidate in the same step.
  """
  tol = m.opt.sleep_tolerance.astype(d.qpos.dtype)
  cannot = _cannot_sleep(m, d, tol)
  a = d.tree_asleep
  return jnp.any((a < 0) & (a >= -2) & ~cannot)


def wake(m: types.Model, d: types.Data) -> types.Data:
  """Start-of-step wake pass (reference sleep.py:721): sleeping trees with
  applied forces (or externally injected velocity) wake with their group."""
  asleep = d.tree_asleep
  cannot = _cannot_sleep(m, d, jnp.zeros((), d.qpos.dtype))
  return d.replace(tree_asleep=_wake_groups(asleep, cannot))


def wake_collision(m: types.Model, d: types.Data) -> types.Data:
  """Contacts between an awake and a sleeping tree wake the sleeping group
  (reference sleep.py:744)."""
  if d.contact is None or m.ncon == 0:
    return d
  asleep = d.tree_asleep
  con = d.contact
  tree_of_geom = np.asarray(m.body_treeid)[np.asarray(m.geom_bodyid)]
  if m.con_compact:
    cand = con.cand  # (ncon,) dynamic candidate ids, -1 invalid
    cp = m.con_pair
    t1_tab = jnp.asarray(tree_of_geom[m.pair_geom1[cp]].astype(np.int32))
    t2_tab = jnp.asarray(tree_of_geom[m.pair_geom2[cp]].astype(np.int32))
    valid = cand >= 0
    ci = jnp.maximum(cand, 0)
    t1 = jnp.where(valid, t1_tab[ci], -1)
    t2 = jnp.where(valid, t2_tab[ci], -1)
  else:
    cp = m.con_pair
    t1 = jnp.asarray(tree_of_geom[m.pair_geom1[cp]].astype(np.int32))
    t2 = jnp.asarray(tree_of_geom[m.pair_geom2[cp]].astype(np.int32))
  active = con.dist < con.includemargin

  def side_hits(ta, tb):
    # tb sleeping, ta awake (or ta static/world: contacts with static
    # geoms do not wake — matches reference: static trees are never
    # "awake"), so wake tb only when ta is a tree and awake
    a_awake = jnp.where(ta >= 0, asleep[jnp.maximum(ta, 0)] < 0, False)
    b_sleep = jnp.where(tb >= 0, asleep[jnp.maximum(tb, 0)] >= 0, False)
    sel = active & a_awake & b_sleep
    onehot = (jnp.maximum(tb, 0)[:, None] ==
              jnp.arange(m.ntree)[None, :]) & sel[:, None]
    return jnp.any(onehot, axis=0)

  hit = side_hits(t1, t2) | side_hits(t2, t1)
  return d.replace(tree_asleep=_wake_groups(asleep, hit))


def wake_equality(m: types.Model, d: types.Data) -> types.Data:
  """Active equality constraints between an awake and a sleeping tree wake
  the sleeping group (reference sleep.py:793)."""
  if m.neq == 0:
    return d
  asleep = d.tree_asleep
  tbody = np.asarray(m.body_treeid)
  # per-equality coupled trees (host, static)
  t1s, t2s = [], []
  for e in range(m.neq):
    et = int(m.eq_type[e])
    o1, o2 = int(m.eq_obj1id[e]), int(m.eq_obj2id[e])
    if et in (int(types.EqType.CONNECT), int(types.EqType.WELD)):
      t1s.append(int(tbody[o1]))
      t2s.append(int(tbody[o2]))
    elif et == int(types.EqType.JOINT):
      t1s.append(int(tbody[m.jnt_bodyid[o1]]))
      t2s.append(int(tbody[m.jnt_bodyid[o2]]) if o2 >= 0 else -1)
    else:  # TENDON or other: conservative — skip (handled by wake_tendon)
      t1s.append(-1)
      t2s.append(-1)
  t1 = jnp.asarray(np.asarray(t1s, np.int32))
  t2 = jnp.asarray(np.asarray(t2s, np.int32))
  active = d.eq_active

  def side_hits(ta, tb):
    a_awake = jnp.where(ta >= 0, asleep[jnp.maximum(ta, 0)] < 0, True)
    b_sleep = jnp.where(tb >= 0, asleep[jnp.maximum(tb, 0)] >= 0, False)
    sel = active & a_awake & b_sleep
    onehot = (jnp.maximum(tb, 0)[:, None] ==
              jnp.arange(m.ntree)[None, :]) & sel[:, None]
    return jnp.any(onehot, axis=0)

  hit = side_hits(t1, t2) | side_hits(t2, t1)
  return d.replace(tree_asleep=_wake_groups(asleep, hit))


def mask_sleeping(m: types.Model, d: types.Data) -> types.Data:
  """Deactivate constraint rows that touch only sleeping trees.

  The reference skips collision/constraints for sleeping pairs outright
  (collision_driver.py:906 incremental pass, solver compaction); with
  static row layout the equivalent is masking: rows whose Jacobian support
  lies entirely in sleeping dofs get D=0 (the solver then assigns zero
  force), and sleeping dofs report zero qacc after the solve.
  """
  tdof = np.asarray(m.dof_treeid)
  dof_awake = jnp.where(jnp.asarray(tdof >= 0),
                        d.tree_asleep[jnp.asarray(np.maximum(tdof, 0))] < 0,
                        True)
  row_alive = jnp.any((d.efc_J != 0.0) & dof_awake[None, :], axis=1)
  # rows with no support at all (inactive padding) keep their D=0 anyway
  return d.replace(
      efc_D=jnp.where(row_alive, d.efc_D, 0.0),
      efc_active=d.efc_active & row_alive,
  )


def dof_awake_mask(m: types.Model, d: types.Data):
  """(nv,) bool: dof belongs to an awake tree (world dofs: awake)."""
  tdof = np.asarray(m.dof_treeid)
  return jnp.where(jnp.asarray(tdof >= 0),
                   d.tree_asleep[jnp.asarray(np.maximum(tdof, 0))] < 0,
                   True)
