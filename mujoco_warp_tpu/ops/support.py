"""Support ops: Jacobians, M·v, Cartesian force accumulation, state get/set.

TPU-native counterpart of reference mujoco_warp/_src/support.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import types
from mujoco_warp_tpu.ops import math


def jac(m: types.Model, d: types.Data, point: jax.Array, bodyid: int):
  """Body-point Jacobian (reference: support.py:576 `jac`).

  Returns (jacp, jacr) of shape (3, nv)/(3, nv): columns are per-dof
  translational/rotational sensitivities of a world-frame point attached to
  ``bodyid``.  The dof-ancestor mask is static, so this is a masked outer
  product — no tree walk.
  """
  dtype = d.qpos.dtype
  mask = jnp.asarray(m.tree.body_dof_mask[bodyid], dtype)  # (nv,)
  offset = point - d.subtree_com[m.body_rootid[bodyid]]
  ang = d.cdof[:, :3]  # (nv, 3)
  lin = d.cdof[:, 3:]
  jacp = (lin + jnp.cross(ang, jnp.broadcast_to(offset, ang.shape))) * mask[:, None]
  jacr = ang * mask[:, None]
  return jacp.T, jacr.T


def jac_site(m: types.Model, d: types.Data, siteid: int):
  """Jacobian of a site (static site id)."""
  return jac(m, d, d.site_xpos[siteid], int(m.site_bodyid[siteid]))


def mul_m(m: types.Model, d: types.Data, vec: jax.Array) -> jax.Array:
  """M @ vec under either mass representation (reference: support.py:218
  `mul_m`)."""
  from mujoco_warp_tpu.ops import smooth
  return smooth.mul_m(m, d, vec)


def xfrc_accumulate(m: types.Model, d: types.Data) -> jax.Array:
  """Project Cartesian applied forces to generalized forces.

  Reference: support.py:304 `xfrc_accumulate`.  xfrc_applied rows are
  (force(3), torque(3)) in the world frame applied at the body CoM.
  """
  dtype = d.qpos.dtype
  # torque about each tree-root CoM frame: n = (xipos - com_root) x f + t
  force = d.xfrc_applied[:, :3]
  torque = d.xfrc_applied[:, 3:]
  offset = d.xipos - d.subtree_com[m.body_rootid]
  cfrc = jnp.concatenate([torque + jnp.cross(offset, force), force], axis=-1)
  # qfrc_i = cdof_i . sum_{b in subtree(body_i)} cfrc_b
  ds = jnp.asarray(m.tree.dof_subtree_mask, dtype)
  return jnp.sum((ds @ cfrc) * d.cdof, axis=-1)


def apply_ft(m: types.Model, d: types.Data, force: jax.Array,
             torque: jax.Array, point: jax.Array, bodyid: int) -> jax.Array:
  """Generalized force from a wrench at a world point on a body."""
  jacp, jacr = jac(m, d, point, bodyid)
  return jacp.T @ force + jacr.T @ torque


class State(int):
  """mjtState component bitflags (reference: types.py:708-751)."""


STATE_TIME = 1 << 0
STATE_QPOS = 1 << 1
STATE_QVEL = 1 << 2
STATE_ACT = 1 << 3
STATE_WARMSTART = 1 << 4
STATE_CTRL = 1 << 5
STATE_QFRC_APPLIED = 1 << 6
STATE_XFRC_APPLIED = 1 << 7
STATE_EQ_ACTIVE = 1 << 8
STATE_MOCAP_POS = 1 << 9
STATE_MOCAP_QUAT = 1 << 10
STATE_FULLPHYSICS = (STATE_TIME | STATE_QPOS | STATE_QVEL | STATE_ACT |
                     STATE_WARMSTART)
STATE_USER = (STATE_CTRL | STATE_QFRC_APPLIED | STATE_XFRC_APPLIED |
              STATE_EQ_ACTIVE | STATE_MOCAP_POS | STATE_MOCAP_QUAT)
STATE_INTEGRATION = STATE_FULLPHYSICS | STATE_USER

_STATE_FIELDS = (
    (STATE_TIME, 'time'), (STATE_QPOS, 'qpos'), (STATE_QVEL, 'qvel'),
    (STATE_ACT, 'act'), (STATE_WARMSTART, 'qacc_warmstart'),
    (STATE_CTRL, 'ctrl'), (STATE_QFRC_APPLIED, 'qfrc_applied'),
    (STATE_XFRC_APPLIED, 'xfrc_applied'), (STATE_EQ_ACTIVE, 'eq_active'),
    (STATE_MOCAP_POS, 'mocap_pos'), (STATE_MOCAP_QUAT, 'mocap_quat'),
)


def state_size(m: types.Model, sig: int) -> int:
  """Flattened size of the state signature (mj_stateSize analog)."""
  d0 = {'time': 1, 'qpos': m.nq, 'qvel': m.nv, 'act': m.na,
        'qacc_warmstart': m.nv, 'ctrl': m.nu, 'qfrc_applied': m.nv,
        'xfrc_applied': 6 * m.nbody, 'eq_active': m.neq,
        'mocap_pos': 3 * m.nmocap, 'mocap_quat': 4 * m.nmocap}
  return sum(d0[name] for bit, name in _STATE_FIELDS if sig & bit)


def get_state(m: types.Model, d: types.Data, sig: int) -> jax.Array:
  """Concatenate state components into a flat vector.

  Reference: support.py:667 `get_state` (State bitflag signature).
  Works on single-world or batched Data (leading world axis preserved).
  """
  batched = d.qpos.ndim == 2
  parts = []
  for bit, name in _STATE_FIELDS:
    if sig & bit:
      v = getattr(d, name)
      if name == 'time':
        v = v[..., None] if batched else v[None]
      v = v.astype(d.qpos.dtype)
      parts.append(v.reshape(v.shape[0], -1) if batched else v.reshape(-1))
  return jnp.concatenate(parts, axis=-1)


def set_state(m: types.Model, d: types.Data, state: jax.Array,
              sig: int) -> types.Data:
  """Scatter a flat state vector back into Data (support.py:822)."""
  batched = d.qpos.ndim == 2
  adr = 0
  upd = {}
  for bit, name in _STATE_FIELDS:
    if not sig & bit:
      continue
    cur = getattr(d, name)
    n = int(np.prod(cur.shape[1:] if batched else cur.shape)) if \
        name != 'time' else 1
    chunk = state[..., adr:adr + n]
    adr += n
    if name == 'time':
      val = chunk[..., 0]
    else:
      val = chunk.reshape(cur.shape).astype(cur.dtype)
    if name == 'eq_active':
      val = val.astype(bool) if name == 'eq_active' else val
    upd[name] = val
  return d.replace(**upd)
