"""Collision driver: static candidate table + vectorized narrowphase.

TPU-native counterpart of reference mujoco_warp/_src/collision_driver.py.
Key divergence (deliberate, documented): the reference runs a runtime
broadphase (nxn/SAP, collision_driver.py:789/567) that appends candidate
pairs through atomics, then narrowphase kernels allocate contact slots from
a shared cross-world pool (collision_core.py:214).  On TPU we precompute the
filtered pair list once on the host (same contype/conaffinity/parent/exclude
filtering as mj_collideGeoms), give every pair a static contact-slot range,
and run all pair narrowphases every step, masked by distance.  A bounding-
sphere early-out is folded in by clamping far pairs' results (XLA fuses it).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mujoco_warp_tpu import types
from mujoco_warp_tpu.ops import collision_primitive, math

_GT = types.GeomType
_BIG = 1e10


@dataclasses.dataclass
class CollisionPairs:
  """Static candidate-pair tables (host precompute output)."""

  pair_geom1: np.ndarray  # (npair,) geom ids, collider-canonical order
  pair_geom2: np.ndarray  # (npair,)
  con_dim: np.ndarray  # (npair,) condim per pair
  pair_explicit: np.ndarray  # (npair,) explicit <pair> id or -1
  con_pair: np.ndarray  # (ncon,) slot -> pair index
  groups: Tuple  # ((t1, t2, pair_idx_array, slot_start), ...)
  pair_margin: np.ndarray  # explicit pair tables (npair_explicit rows)
  pair_gap: np.ndarray
  pair_friction: np.ndarray
  pair_solref: np.ndarray
  pair_solreffriction: np.ndarray
  pair_solimp: np.ndarray


def collision_pairs(mjm: mujoco.MjModel) -> CollisionPairs:
  """Build the static filtered candidate pair table.

  Mirrors mj_collideGeoms filtering (reference: collision_driver.py:99-281
  BroadphaseFilter + io.py nxn precompute): contype/conaffinity bitmasks,
  same-weld-body exclusion, weld-parent filtering, <exclude> signatures,
  plus explicit <pair> elements appended with their own parameters.
  """
  excluded = set()
  for sig in mjm.exclude_signature:
    excluded.add((int(sig) >> 16, int(sig) & 0xFFFF))

  # flex vertices join the table as pseudo sphere geoms with ids
  # ngeom + vertid (the TPU-native replacement for the reference's
  # separate flex broadphase/narrowphase, collision_flex.py:2898/3705:
  # vertex spheres ride the same static pair machinery; mjContact's
  # flex/vert tagging maps to the pseudo geom id).  Self-collision
  # (flex_selfcollide != none) adds vertex-vertex sphere pairs within
  # the same flex, excluding element-sharing neighbors (whose spacing
  # the edge-equality rows already pin); the broadphase prefilter prunes
  # the O(nvert²) table to the per-class pair budget at runtime.
  # Divergence (documented): the reference collides elements
  # (triangles/tets, collision_flex.py:3705); vertex spheres of the
  # flex radius approximate that surface.
  nreal = mjm.ngeom
  nfv = int(mjm.nflexvert) if mjm.nflex else 0
  if nfv:
    fid = np.zeros(nfv, np.int32)
    for f in range(mjm.nflex):
      fid[mjm.flex_vertadr[f]:mjm.flex_vertadr[f] +
          mjm.flex_vertnum[f]] = f
    # element-sharing vertex pairs (local ids per flex -> global)
    adjacent = set()
    for f in range(mjm.nflex):
      dfx = int(mjm.flex_dim[f])
      base = int(mjm.flex_vertadr[f])
      for e in range(int(mjm.flex_elemnum[f])):
        adr = int(mjm.flex_elemdataadr[f]) + e * (dfx + 1)
        vs = [int(v) + base
              for v in mjm.flex_elem[adr:adr + dfx + 1]]
        for i in range(len(vs)):
          for j in range(i + 1, len(vs)):
            adjacent.add((min(vs[i], vs[j]), max(vs[i], vs[j])))
    selfcollide = mjm.flex_selfcollide
    ge_type = np.concatenate([
        mjm.geom_type, np.full(nfv, int(_GT.SPHERE), mjm.geom_type.dtype)])
    ge_body = np.concatenate([mjm.geom_bodyid, mjm.flex_vertbodyid])
    ge_contype = np.concatenate([mjm.geom_contype, mjm.flex_contype[fid]])
    ge_conaff = np.concatenate(
        [mjm.geom_conaffinity, mjm.flex_conaffinity[fid]])
    ge_condim = np.concatenate([mjm.geom_condim, mjm.flex_condim[fid]])
    ge_priority = np.concatenate(
        [mjm.geom_priority, mjm.flex_priority[fid]])
  else:
    ge_type = mjm.geom_type
    ge_body = mjm.geom_bodyid
    ge_contype = mjm.geom_contype
    ge_conaff = mjm.geom_conaffinity
    ge_condim = mjm.geom_condim
    ge_priority = mjm.geom_priority
  n_all = nreal + nfv

  g1s, g2s, expl = [], [], []
  for a in range(n_all):
    for b in range(a + 1, n_all):
      if a >= nreal and b >= nreal:
        va, vb = a - nreal, b - nreal
        if fid[va] == fid[vb]:
          if not selfcollide[fid[va]]:
            continue
          if (va, vb) in adjacent:
            continue
        # different flexes fall through to standard filtering
      ba, bb = ge_body[a], ge_body[b]
      # interpolated flex vertices have no body (vertbodyid -1): the
      # body-based same-body/weld/parent/exclude filters don't apply
      bodiless = ba < 0 or bb < 0
      if not bodiless:
        if ba == bb:
          continue
        wa, wb = mjm.body_weldid[ba], mjm.body_weldid[bb]
        if wa == wb:
          continue
      if (int(ge_contype[a]) & int(ge_conaff[b])) == 0 and \
         (int(ge_contype[b]) & int(ge_conaff[a])) == 0:
        continue
      if not bodiless and not (
          mjm.opt.disableflags & mujoco.mjtDisableBit.mjDSBL_FILTERPARENT):
        # parent filtering applies only between two non-world weld bodies
        # (mj_collideGeoms semantics: `weld1 && weld2 && ...`)
        wpa = mjm.body_weldid[mjm.body_parentid[wa]]
        wpb = mjm.body_weldid[mjm.body_parentid[wb]]
        if wa != 0 and wb != 0 and (wa == wpb or wb == wpa):
          continue
      if not bodiless and (
          (min(ba, bb), max(ba, bb)) in excluded or
          (max(ba, bb), min(ba, bb)) in excluded):
        continue
      g1s.append(a)
      g2s.append(b)
      expl.append(-1)

  # explicit <pair> elements (override filtering entirely)
  for p in range(mjm.npair):
    g1s.append(int(mjm.pair_geom1[p]))
    g2s.append(int(mjm.pair_geom2[p]))
    expl.append(p)

  # canonical ordering: geom with the smaller type first (collider convention)
  g1c, g2c = [], []
  for a, b in zip(g1s, g2s):
    if ge_type[a] <= ge_type[b]:
      g1c.append(a)
      g2c.append(b)
    else:
      g1c.append(b)
      g2c.append(a)

  # validate support and group by type pair; pairs without an analytic
  # collider fall back to the generic convex (MPR) path
  from mujoco_warp_tpu.ops import collision_convex, collision_hfield
  keys = []
  for a, b in zip(g1c, g2c):
    key = (int(ge_type[a]), int(ge_type[b]))
    if key not in collision_primitive.PAIR_NCON:
      is_hf = (key[0] == types.GeomType.HFIELD and
               key[1] in collision_hfield.HFIELD_NCON)
      is_sdf = types.GeomType.SDF in key  # SDF descent narrowphase
      if not is_hf and not is_sdf and not (
          key[0] in collision_convex.CONVEX_TYPES and
          key[1] in collision_convex.CONVEX_TYPES):
        raise NotImplementedError(
            f'collision pair {(_GT(key[0]).name, _GT(key[1]).name)} '
            'is not supported yet')
    keys.append(key)

  # condim per pair (priority rules, mj_collideGeoms semantics)
  con_dim = np.zeros(len(g1c), np.int32)
  for i, (a, b) in enumerate(zip(g1c, g2c)):
    if expl[i] >= 0:
      con_dim[i] = mjm.pair_dim[expl[i]]
    else:
      p1, p2 = ge_priority[a], ge_priority[b]
      if p1 > p2:
        con_dim[i] = ge_condim[a]
      elif p2 > p1:
        con_dim[i] = ge_condim[b]
      else:
        con_dim[i] = max(ge_condim[a], ge_condim[b])

  # sort pairs grouped by (type pair, condim) so contact slots are
  # contiguous per group AND every group is condim-homogeneous — the
  # broadphase-pruned compaction classes then keep static slot ranges
  order = sorted(range(len(g1c)), key=lambda i: (keys[i], int(con_dim[i])))
  g1 = np.asarray([g1c[i] for i in order], np.int32).reshape(-1)
  g2 = np.asarray([g2c[i] for i in order], np.int32).reshape(-1)
  con_dim = con_dim[order] if len(order) else con_dim
  pair_explicit = np.asarray([expl[i] for i in order], np.int32).reshape(-1)
  keys = [keys[i] for i in order]

  groups = []
  con_pair = []
  slot = 0
  i = 0
  while i < len(keys):
    j = i
    while j < len(keys) and keys[j] == keys[i] and con_dim[j] == con_dim[i]:
      j += 1
    if keys[i][0] == types.GeomType.HFIELD:
      k = collision_hfield.HFIELD_NCON[types.GeomType(keys[i][1])]
    elif types.GeomType.SDF in keys[i]:
      k = 4  # SDF descent: 4 separated minima
    elif keys[i] in collision_primitive.PAIR_NCON:
      k = collision_primitive.PAIR_NCON[keys[i]]
    else:  # convex MPR: 4-point manifold for flat-flat pairs
      k = collision_convex.convex_ncon(*keys[i])
    idx = np.arange(i, j, dtype=np.int32)
    groups.append((keys[i][0], keys[i][1], idx, slot))
    # slot layout per group: contact-point-major (k, npairs) flattened
    for ci in range(k):
      con_pair.extend(range(i, j))
    slot += k * (j - i)
    i = j

  return CollisionPairs(
      pair_geom1=g1,
      pair_geom2=g2,
      con_dim=con_dim,
      pair_explicit=pair_explicit,
      con_pair=np.asarray(con_pair, np.int32).reshape(-1),
      groups=tuple(groups),
      pair_margin=np.asarray(mjm.pair_margin, np.float64).reshape(-1),
      pair_gap=np.asarray(mjm.pair_gap, np.float64).reshape(-1),
      pair_friction=np.asarray(mjm.pair_friction, np.float64).reshape(-1, 5),
      pair_solref=np.asarray(mjm.pair_solref, np.float64).reshape(-1, types.NREF),
      pair_solreffriction=np.asarray(
          mjm.pair_solreffriction, np.float64).reshape(-1, types.NREF),
      pair_solimp=np.asarray(mjm.pair_solimp, np.float64).reshape(-1, types.NIMP),
  )


def _mix_params(m: types.Model, g1: np.ndarray, g2: np.ndarray,
                explicit: np.ndarray, dtype, host: bool = False):
  """Contact parameter mixing (reference: collision_core.py:317-473).

  solmix-weighted solref/solimp, priority override, max margin/gap,
  per-component max friction; explicit <pair> rows take their own params.

  ``host=True`` computes in pure numpy from device_get copies —
  put_model's one-time hoist; eager jnp here dispatches ~50 XLA programs
  over the candidate table (tens of seconds for 30k-candidate mesh
  scenes on a tunneled device).  ``host=False`` stays jnp-traceable for
  batch_model's vmap over per-world params.
  """
  if host:
    xp = np
    F = lambda a: np.asarray(jax.device_get(a))
  else:
    xp = jnp
    F = lambda a: a

  p1 = m.geom_priority[g1]
  p2 = m.geom_priority[g2]
  use1 = (p1 > p2).astype(dtype)[:, None]
  use2 = (p2 > p1).astype(dtype)[:, None]
  eq = 1.0 - use1 - use2
  use1_j = xp.asarray(use1)
  use2_j = xp.asarray(use2)
  eq_j = xp.asarray(eq)

  s1 = F(m.geom_solmix)[g1]
  s2 = F(m.geom_solmix)[g2]
  mix = s1 / xp.maximum(s1 + s2, 1e-12)
  mix = xp.where((s1 < 1e-12) & (s2 < 1e-12), 0.5, mix)
  mix = xp.where((s1 < 1e-12) & (s2 >= 1e-12), 0.0, mix)
  mix = xp.where((s1 >= 1e-12) & (s2 < 1e-12), 1.0, mix)
  mix = (eq_j[:, 0] * mix + use1_j[:, 0] * 1.0 + use2_j[:, 0] * 0.0)[:, None]

  sr1, sr2 = F(m.geom_solref)[g1], F(m.geom_solref)[g2]
  standard = (sr1[:, [0]] > 0) & (sr2[:, [0]] > 0)
  solref = xp.where(standard, mix * sr1 + (1 - mix) * sr2,
                    xp.minimum(sr1, sr2))
  solimp = mix * F(m.geom_solimp)[g1] + (1 - mix) * F(m.geom_solimp)[g2]

  margin = xp.maximum(F(m.geom_margin)[g1], F(m.geom_margin)[g2])
  gap = xp.maximum(F(m.geom_gap)[g1], F(m.geom_gap)[g2])

  f1, f2 = F(m.geom_friction)[g1], F(m.geom_friction)[g2]
  fmax = xp.maximum(f1, f2)
  fr3 = eq_j * fmax + use1_j * f1 + use2_j * f2
  friction = xp.stack(
      [fr3[:, 0], fr3[:, 0], fr3[:, 1], fr3[:, 2], fr3[:, 2]], axis=-1)

  solreffriction = xp.zeros_like(solref)

  # explicit pair overrides (static mask)
  has_expl = np.any(explicit >= 0)
  if has_expl:
    e = np.maximum(explicit, 0)
    is_e = xp.asarray((explicit >= 0).astype(dtype))[:, None]
    solref = xp.where(is_e > 0, F(m.pair_solref)[e], solref)
    solreffriction = xp.where(is_e > 0, F(m.pair_solreffriction)[e],
                              solreffriction)
    solimp = xp.where(is_e > 0, F(m.pair_solimp)[e], solimp)
    margin = xp.where(is_e[:, 0] > 0, F(m.pair_margin)[e], margin)
    gap = xp.where(is_e[:, 0] > 0, F(m.pair_gap)[e], gap)
    friction = xp.where(is_e > 0, F(m.pair_friction)[e], friction)

  # global contact override (EnableBit.OVERRIDE)
  if m.opt.enableflags & types.EnableBit.OVERRIDE:
    o = m.opt
    margin = xp.full_like(margin, F(o.o_margin) if host else o.o_margin)
    solref = xp.broadcast_to(F(o.o_solref) if host else o.o_solref,
                             solref.shape)
    solimp = xp.broadcast_to(F(o.o_solimp) if host else o.o_solimp,
                             solimp.shape)
    friction = xp.broadcast_to(F(o.o_friction) if host else o.o_friction,
                               friction.shape)

  return solref, solreffriction, solimp, margin, gap, friction


def group_ncon(t1, t2) -> int:
  """Static contact points per pair for a (t1, t2) collider group."""
  from mujoco_warp_tpu.ops import collision_convex, collision_hfield
  key = (int(t1), int(t2))
  if key[0] == types.GeomType.HFIELD:
    return collision_hfield.HFIELD_NCON[types.GeomType(key[1])]
  if types.GeomType.SDF in key:
    return 4
  if key in collision_primitive.PAIR_NCON:
    return collision_primitive.PAIR_NCON[key]
  return collision_convex.convex_ncon(*key)


def _group_sel_collider(m: types.Model, t1, t2, idx):
  """Collider taking TRACED local pair indices, or None if the group's
  narrowphase needs static ids (hfield prisms, SDF plugin closures)."""
  from mujoco_warp_tpu.ops import collision_convex
  key = (int(t1), int(t2))
  if key[0] == types.GeomType.HFIELD or types.GeomType.SDF in key:
    return None
  g1s = m.pair_geom1[idx]
  g2s = m.pair_geom2[idx]
  if key == (int(types.GeomType.PLANE), int(types.GeomType.MESH)):
    return collision_primitive.make_plane_mesh_group_collider(g1s, g2s)
  fn = collision_primitive.COLLIDERS.get((t1, t2))
  if fn is not None:
    j1 = jnp.asarray(g1s)
    j2 = jnp.asarray(g2s)
    return lambda m_, d_, sel: fn(m_, d_, j1[sel], j2[sel])
  return collision_convex.make_convex_group_collider(key[0], key[1], g1s,
                                                     g2s)


def _world_aabb(m: types.Model, d: types.Data):
  """World-axis-aligned bounding boxes per geom: (center, half extents).

  Rotating the model-frame AABB (mjModel.geom_aabb) gives a bound that is
  dramatically tighter than bounding spheres for flat/elongated geoms —
  the reference's runtime AABB filter (collision_driver.py:137-186
  aabb_filter) plays the same role."""
  ab = m.geom_aabb
  c = d.geom_xpos + jnp.einsum('gij,gj->gi', d.geom_xmat, ab[:, :3])
  h = jnp.einsum('gij,gj->gi', jnp.abs(d.geom_xmat), ab[:, 3:])
  return c, h


def _bp_pair_dist(m: types.Model, d: types.Data, t1, g1s, g2s):
  """Conservative pair distance for the broadphase prefilter: the max of
  the bounding-sphere gap and the per-axis AABB separation (both are
  lower bounds on surface distance; their max is the tighter filter).
  Planes use the signed halfspace distance minus the AABB's support
  radius along the normal.

  The device-side counterpart of the reference's runtime broadphase
  (collision_driver.py:567 sap_broadphase / 789 nxn with plane/sphere/
  AABB/OBB filters 99-281): instead of sort-and-sweep into atomic append
  queues, every static candidate pair gets a ~20-flop distance bound and
  actives are packed into the group's capped narrowphase slots."""
  g1 = jnp.asarray(g1s)
  g2 = jnp.asarray(g2s)
  p1 = d.geom_xpos[g1]
  p2 = d.geom_xpos[g2]
  rb = m.geom_rbound
  c, h = _world_aabb(m, d)
  if int(t1) == int(types.GeomType.PLANE):
    n = d.geom_xmat[g1][:, :, 2]
    r2 = jnp.sum(jnp.abs(n) * h[g2], axis=-1)
    return jnp.sum(n * (c[g2] - p1), axis=-1) - r2
  sphere_bd = jnp.sqrt(jnp.maximum(
      jnp.sum((p2 - p1) ** 2, axis=-1), 1e-12)) - rb[g1] - rb[g2]
  aabb_bd = jnp.max(jnp.abs(c[g1] - c[g2]) - h[g1] - h[g2], axis=-1)
  return jnp.maximum(sphere_bd, aabb_bd)


def _pack_actives(act, cap):
  """Stable pack of active indices into ``cap`` slots (no sort).

  act (n,) bool -> (sel (cap,) int32 local indices, nact ())."""
  n = act.shape[0]
  pos = jnp.cumsum(act.astype(jnp.int32)) - 1
  dest = jnp.where(act, pos, cap)
  sel = jnp.zeros((cap,), jnp.int32).at[dest].set(
      jnp.arange(n, dtype=jnp.int32), mode='drop')
  return sel, jnp.sum(act.astype(jnp.int32))


def _pack_nearest(act, key, cap):
  """Pack the ``cap`` smallest-key actives (deepest contacts win).

  Under saturation, dropping by candidate order loses whichever
  contacts happen to sort last (e.g. gripper-object contacts behind a
  table's rest contacts); keeping the deepest mirrors what matters
  physically.  act (n,) bool, key (n,) float -> (sel (cap,), nact)."""
  k = jnp.where(act, key, _BIG)
  _, sel = jax.lax.top_k(-k, cap)
  return sel.astype(jnp.int32), jnp.sum(act.astype(jnp.int32))


def _narrowphase_pruned(m: types.Model, d: types.Data, dtype):
  """Two-stage narrowphase: prefilter + capped per-group pair budgets.

  Groups with ``bp_cap > 0`` run their collider only on the packed
  active pairs (k, bp_cap); others run dense.  Returns pruned-slot
  arrays (dist, pos, frame, cand ids, valid) plus per-group
  (condim, base, count) ranges in pruned-slot space and the overflow
  flag for dropped pairs.
  """
  if m.nflexvert:
    eye = jnp.broadcast_to(jnp.eye(3, dtype=d.geom_xmat.dtype),
                           (m.nflexvert, 3, 3))
    d = d.replace(
        geom_xpos=jnp.concatenate([d.geom_xpos, d.flexvert_xpos], axis=0),
        geom_xmat=jnp.concatenate([d.geom_xmat, eye], axis=0))
  from mujoco_warp_tpu.ops import collision_convex, collision_hfield
  dist_l, pos_l, frame_l, cand_l, valid_l = [], [], [], [], []
  ranges = []
  over = jnp.zeros((), bool)
  base = 0
  im_cand = m.cand_includemargin
  for gi, (t1, t2, idx, slot) in enumerate(m.pair_groups):
    n = len(idx)
    k = group_ncon(t1, t2)
    bcap, dim = m.bp_groups[gi]
    if bcap and bcap < n:
      fn = _group_sel_collider(m, t1, t2, idx)
      bd = _bp_pair_dist(m, d, t1, m.pair_geom1[idx], m.pair_geom2[idx])
      im_pair = im_cand[jnp.asarray(slot + np.arange(n, dtype=np.int32))]
      bact = bd < im_pair
      sel, nact = _pack_nearest(bact, bd, bcap)
      vpair = bact[sel]
      # overflow accounting: a dropped pair (farther than every kept
      # one) can only produce a contact with dist < im if its BOUND is
      # < im; for margin-0 pairs that means bound < 0 (penetrating
      # bounding volumes).  Counting margin-band near-pairs here would
      # flag resting mesh piles every step (bounding spheres overlap far
      # more than surfaces do)
      npen = jnp.sum((bd < jnp.minimum(im_pair, 0.0)).astype(jnp.int32))
      over = over | (npen > bcap)
      out = fn(m, d, sel)
      dist, pos, normal = out[:3]
      if len(out) == 4:
        frame = out[3]
      else:
        frame = math.make_frame(normal.reshape(-1, 3)).reshape(k, bcap, 3,
                                                               3)
      dist = jnp.where(vpair[None], dist.astype(dtype), _BIG)
      cand = (slot + jnp.arange(k, dtype=jnp.int32)[:, None] * n +
              sel[None])  # (k, bcap)
      dist_l.append(dist.reshape(-1))
      pos_l.append(pos.reshape(-1, 3))
      frame_l.append(frame.reshape(-1, 3, 3))
      cand_l.append(cand.reshape(-1))
      valid_l.append(jnp.broadcast_to(vpair[None], (k, bcap)).reshape(-1))
      count = k * bcap
    else:
      fn = collision_primitive.COLLIDERS.get((t1, t2))
      if fn is None:
        if t1 == types.GeomType.HFIELD:
          fn = collision_hfield.make_hfield_collider(int(t2))
        elif types.GeomType.SDF in (t1, t2):
          from mujoco_warp_tpu.ops import collision_sdf
          fn = collision_sdf.make_sdf_group_collider(
              m, int(t1), int(t2), m.pair_geom1[idx], m.pair_geom2[idx])
        else:
          fn = collision_convex.make_convex_collider(int(t1), int(t2))
      out = fn(m, d, m.pair_geom1[idx], m.pair_geom2[idx])
      dist, pos, normal = out[:3]
      if len(out) == 4:
        frame = out[3]
      else:
        frame = math.make_frame(normal.reshape(-1, 3)).reshape(
            k, n, 3, 3)
      dist_l.append(dist.astype(dtype).reshape(-1))
      pos_l.append(pos.reshape(-1, 3))
      frame_l.append(frame.reshape(-1, 3, 3))
      cand_l.append(jnp.asarray(slot + np.arange(k * n, dtype=np.int32)))
      valid_l.append(jnp.ones((k * n,), bool))
      count = k * n
    ranges.append((dim, base, count))
    base += count
  return (jnp.concatenate(dist_l), jnp.concatenate(pos_l, axis=0),
          jnp.concatenate(frame_l, axis=0), jnp.concatenate(cand_l),
          jnp.concatenate(valid_l), tuple(ranges), over)


def _narrowphase_candidates(m: types.Model, d: types.Data):
  """dist/pos/frame over every candidate slot (static pair table)."""
  if m.nflexvert:
    # flex vertex pseudo geoms: extend the runtime pose tables (identity
    # orientation; position = vertex position)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=d.geom_xmat.dtype),
                           (m.nflexvert, 3, 3))
    d = d.replace(
        geom_xpos=jnp.concatenate([d.geom_xpos, d.flexvert_xpos], axis=0),
        geom_xmat=jnp.concatenate([d.geom_xmat, eye], axis=0))
  dist_slots = []
  pos_slots = []
  frame_slots = []
  from mujoco_warp_tpu.ops import collision_convex, collision_hfield
  for (t1, t2, idx, slot) in m.pair_groups:
    fn = collision_primitive.COLLIDERS.get((t1, t2))
    if fn is None:
      if t1 == types.GeomType.HFIELD:
        fn = collision_hfield.make_hfield_collider(int(t2))
      elif types.GeomType.SDF in (t1, t2):
        from mujoco_warp_tpu.ops import collision_sdf
        fn = collision_sdf.make_sdf_group_collider(
            m, int(t1), int(t2), m.pair_geom1[idx], m.pair_geom2[idx])
      else:
        fn = collision_convex.make_convex_collider(int(t1), int(t2))
    g1 = m.pair_geom1[idx]
    g2 = m.pair_geom2[idx]
    out = fn(m, d, g1, g2)  # (k, n), (k, n, 3), (k, n, 3)[, (k, n, 3, 3)]
    dist, pos, normal = out[:3]
    k = dist.shape[0]
    if len(out) == 4:  # collider supplies the full contact frame
      frame = out[3]
    else:
      frame = math.make_frame(normal.reshape(-1, 3)).reshape(
          k, len(idx), 3, 3)
    dist_slots.append(dist.reshape(-1))
    pos_slots.append(pos.reshape(-1, 3))
    frame_slots.append(frame.reshape(-1, 3, 3))

  return (jnp.concatenate(dist_slots), jnp.concatenate(pos_slots, axis=0),
          jnp.concatenate(frame_slots, axis=0))


def collision(m: types.Model, d: types.Data) -> types.Data:
  """Run narrowphase over all candidate pairs (reference: driver.py:885).

  With ``m.con_compact``, active candidates are packed per condim class
  into capped contact slots — the fixed-shape replacement for the
  reference's atomic slot allocation (collision_core.py:214 write_contact)
  and the VERDICT-mandated runtime pruning of the static pair table.
  Overflowing contacts are dropped and flagged in ``d.overflow``.
  """
  if m.ncon == 0 or (m.opt.disableflags & types.DisableBit.CONTACT):
    return d
  dtype = d.qpos.dtype

  if (m.con_compact and m.bp_groups and
      any(bc for bc, _ in m.bp_groups)):
    return _filter_cb(m, _collision_pruned(m, d, dtype))

  dist, pos, frame = _narrowphase_candidates(m, d)
  dist = dist.astype(dtype)
  # mixed params (incl. the static EnableBit.OVERRIDE branch) are model
  # constants precomputed in put_model; override_model refreshes them
  im_cand = m.cand_includemargin
  friction_c = m.cand_friction
  solref_c = m.cand_solref
  solimp_c = m.cand_solimp
  solreffriction_c = m.cand_solreffriction

  if not m.con_compact:
    contact = d.contact.replace(
        dist=dist,
        pos=pos.astype(dtype),
        frame=frame.astype(dtype),
        includemargin=im_cand,
        friction=friction_c,
        solref=solref_c,
        solreffriction=solreffriction_c,
        solimp=solimp_c,
    )
    ncon_active = jnp.sum((dist < im_cand).astype(jnp.int32))
    return _filter_cb(m, d.replace(contact=contact,
                                   ncon_active=ncon_active))

  # ---- compaction: per condim class, deepest-first pack into cap slots
  # (top_k, not argsort: a full sort of (ncand,) keys per world measured
  # 122 ms at three_humanoids @8192; top_k(cap) is a partial selection,
  # and under saturation keeping the deepest contacts is the physically
  # right drop policy — same as the broadphase-pruned path)
  sel_list, valid_list = [], []
  ncon_active = jnp.zeros((), jnp.int32)
  over = jnp.zeros((), bool)
  for dim, cap, ci, slot in m.con_classes:
    ci_j = jnp.asarray(ci)
    act = dist[ci_j] < im_cand[ci_j]
    order, nact = _pack_nearest(act, dist[ci_j], cap)
    sel_list.append(ci_j[order])
    valid_list.append(act[order])
    ncon_active = ncon_active + jnp.minimum(nact, cap)
    over = over | (nact > cap)

  sel = jnp.concatenate(sel_list)  # (ncon,) candidate ids
  valid = jnp.concatenate(valid_list)
  vf = valid.astype(dtype)
  cp = jnp.asarray(m.con_pair)
  g1t = jnp.asarray(m.pair_geom1)
  g2t = jnp.asarray(m.pair_geom2)

  contact = d.contact.replace(
      dist=jnp.where(valid, dist[sel], 1e10),
      pos=pos[sel].astype(dtype),
      frame=frame[sel].astype(dtype),
      includemargin=im_cand[sel] * vf,
      friction=friction_c[sel],
      solref=solref_c[sel],
      solreffriction=solreffriction_c[sel],
      solimp=solimp_c[sel],
      geom1=g1t[cp[sel]],
      geom2=g2t[cp[sel]],
      cand=jnp.where(valid, sel, -1),
  )
  overflow = d.overflow | jnp.where(over, types.OverflowType.CONTACT, 0)
  return _filter_cb(m, d.replace(contact=contact, ncon_active=ncon_active,
                                 overflow=overflow.astype(jnp.int32)))


def _filter_cb(m: types.Model, d: types.Data) -> types.Data:
  """User contactfilter hook (reference: collision_driver.py:941)."""
  if m.callback is not None and m.callback.contactfilter:
    d = m.callback.contactfilter(m, d)
  return d


def _collision_pruned(m: types.Model, d: types.Data, dtype) -> types.Data:
  """Broadphase-pruned collision: prefilter -> capped narrowphase ->
  per-condim compaction, all via stable cumsum packs (no sorts).

  This is what makes mesh-manipulation scenes reachable: narrowphase
  cost scales with the per-group pair budgets (``m.bp_groups``), not the
  static candidate count (reference: sap_broadphase
  collision_driver.py:567 + nconmax capacity analysis io.py:1316).
  """
  (dist_p, pos_p, frame_p, cand_p, valid_p, ranges,
   bp_over) = _narrowphase_pruned(m, d, dtype)
  im_cand = m.cand_includemargin
  act = valid_p & (dist_p < im_cand[cand_p])
  sel_list, valid_list = [], []
  over = jnp.zeros((), bool)
  ncon_active = jnp.zeros((), jnp.int32)
  for dim, cap, _, _ in m.con_classes:
    ids = np.concatenate(
        [np.arange(b, b + c, dtype=np.int32)
         for (dm, b, c) in ranges if dm == dim] or
        [np.zeros(0, np.int32)])
    ids_j = jnp.asarray(ids)
    a = act[ids_j]
    ncap = min(cap, len(ids))  # tight bp_cap can leave < cap slots
    lsel, nact = _pack_nearest(a, dist_p[ids_j], ncap)
    sel_c = ids_j[lsel]
    val_c = a[lsel]
    if ncap < cap:
      sel_c = jnp.concatenate(
          [sel_c, jnp.zeros((cap - ncap,), jnp.int32)])
      val_c = jnp.concatenate([val_c, jnp.zeros((cap - ncap,), bool)])
    sel_list.append(sel_c)
    valid_list.append(val_c)
    ncon_active = ncon_active + jnp.minimum(nact, cap)
    over = over | (nact > cap)

  sel = jnp.concatenate(sel_list)  # (ncon,) pruned-slot ids
  valid = jnp.concatenate(valid_list)
  vf = valid.astype(dtype)
  cand = cand_p[sel]  # (ncon,) original candidate ids
  cp = jnp.asarray(m.con_pair)
  g1t = jnp.asarray(m.pair_geom1)
  g2t = jnp.asarray(m.pair_geom2)

  contact = d.contact.replace(
      dist=jnp.where(valid, dist_p[sel], 1e10),
      pos=pos_p[sel].astype(dtype),
      frame=frame_p[sel].astype(dtype),
      includemargin=im_cand[cand] * vf,
      friction=m.cand_friction[cand],
      solref=m.cand_solref[cand],
      solreffriction=m.cand_solreffriction[cand],
      solimp=m.cand_solimp[cand],
      geom1=g1t[cp[cand]],
      geom2=g2t[cp[cand]],
      cand=jnp.where(valid, cand, -1),
  )
  # CONTACT: narrowphase slot compaction saturated (reference
  # NARROWPHASE).  CONSTRAINT: the broadphase pair budget dropped a
  # penetrating pair before narrowphase, so constraint rows that should
  # exist were never assembled (reference BROADPHASE/NEFC analog).
  overflow = (d.overflow |
              jnp.where(over, types.OverflowType.CONTACT, 0) |
              jnp.where(bp_over, types.OverflowType.CONSTRAINT, 0))
  return d.replace(contact=contact, ncon_active=ncon_active,
                   overflow=overflow.astype(jnp.int32))
