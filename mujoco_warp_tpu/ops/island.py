"""Constraint islands: connected components of constraint-coupled trees.

TPU-native counterpart of reference mujoco_warp/_src/island.py (tree-edge
discovery + union-find + per-island ordering).  The reference builds an
edge list with atomics and runs serial union-find per world; here the
incidence of active constraint rows on kinematic trees is one masked
matmul (B = |J|·T > 0), the tree-tree coupling is BᵀB on the MXU, and
components come from ``ntree`` rounds of min-label propagation — all
static shapes, fully batchable with vmap.

Island numbering matches MuJoCo: islands are ranked by their smallest
member tree id (ascending), unconstrained trees get -1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import types


def island(m: types.Model, d: types.Data) -> types.Data:
  """Label trees/dofs/constraint rows with island ids."""
  ntree, nv, nefc = m.ntree, m.nv, m.nefc
  if ntree == 0 or nefc == 0 or nv == 0:
    return d
  dtype = d.qpos.dtype

  # static (nv, ntree) tree indicator
  ind = np.zeros((nv, ntree), np.float32)
  ind[np.arange(nv), m.dof_treeid] = 1.0
  ind = jnp.asarray(ind, dtype)

  # incidence of rows on trees; inactive rows have all-zero J
  B = (jnp.abs(d.efc_J) @ ind) > 0.0  # (nefc, ntree)
  Bf = B.astype(dtype)
  A = (Bf.T @ Bf) > 0.0  # (ntree, ntree) coupled-through-a-row
  constrained = jnp.any(B, axis=0)  # (ntree,)

  # min-label propagation to components
  tree_ids = jnp.arange(ntree, dtype=jnp.int32)
  labels0 = jnp.where(constrained, tree_ids, ntree)

  def body(_, labels):
    nbr = jnp.where(A, labels[None, :], ntree)  # (ntree, ntree)
    return jnp.minimum(labels, jnp.min(nbr, axis=1))

  labels = jax.lax.fori_loop(0, max(ntree - 1, 1), body, labels0)

  # rank components by smallest member tree id (MuJoCo numbering)
  is_rep = constrained & (labels == tree_ids)
  rank = jnp.cumsum(is_rep.astype(jnp.int32)) - 1  # (ntree,)
  lbl = jnp.clip(labels, 0, ntree - 1)
  tree_island = jnp.where(constrained, rank[lbl], -1).astype(jnp.int32)

  dof_island = tree_island[np.asarray(m.dof_treeid)]
  row_tree = jnp.argmax(B, axis=1)  # first touched tree per row
  efc_island = jnp.where(jnp.any(B, axis=1), tree_island[row_tree],
                         -1).astype(jnp.int32)
  nisland = jnp.sum(is_rep.astype(jnp.int32))

  return d.replace(nisland=nisland, tree_island=tree_island,
                   dof_island=dof_island, efc_island=efc_island)
