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
  """Dense M @ vec (reference: support.py:218 `mul_m`)."""
  return d.qM @ vec


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
