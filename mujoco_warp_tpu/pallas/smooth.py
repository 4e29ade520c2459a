"""Pallas world-tile megakernel for the mass-matrix chain.

Fuses crb → mass matrix → Cholesky factor → com_vel → rne (reference:
smooth.py:1080/1341/2259/1500) into one VMEM-resident kernel per 128-world
tile, with worlds on the vector lanes — the same design as the solver
megakernel (`pallas/solver.py`).  The XLA path runs these as ~10 ms of
launch-bound stages per 1024 worlds; fused they are a few hundred µs.

Inputs come from the (XLA) kinematics/com_pos stages transposed
world-last; static tree masks ride along as f32 inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mujoco_warp_tpu import types
from mujoco_warp_tpu.pallas.solver import TILE_W, _chol_tile

_MINVAL = 1e-15
_VMEM_BUDGET = 96 * 1024 * 1024


def supported(m: types.Model, d: types.Data) -> bool:
  from mujoco_warp_tpu.ops import smooth as osmooth
  if osmooth._has_tendon_armature(m):
    return False
  # compile-scale gate (see pallas/solver.supported): static-sparsity
  # unrolls grow ~nbody^2; large trees crash the Mosaic compile
  if m.nbody > 32 or m.nv > 64:
    return False
  if d.qpos.ndim != 2 or d.qpos.shape[0] % TILE_W != 0:
    return False
  if jax.default_backend() == 'cpu':
    return False
  vmem = 4 * TILE_W * (m.nbody * 36 * 3 + m.nv * 6 * 4 +
                       3 * m.nv * m.nv + m.nbody * 12 + 8 * m.nv)
  return vmem < _VMEM_BUDGET


def mass_chain_core(m: types.Model, dtype, ci, cdof, qv, armature,
                    gravity):
  """crb → qM → Cholesky → com_vel → rne on one world tile, lanes-last.

  Pure function over VMEM values shared by the standalone mass-chain
  kernel and the fused whole-step kernel (pallas/fused.py).
  ci: list of (36, W) per body; cdof: list of (6, W) per dof; qv: list of
  (1, W) per dof; armature (nv, 1); gravity (3, 1) or (3, W).
  Returns (qM (nv,nv,W), L (nv,nv,W), cvel list (6,W), cdof_dot list,
  bias (nv, W)).
  """
  nb, nv = m.nbody, m.nv
  dof_bodyid = tuple(int(x) for x in m.dof_bodyid)
  subtree = m.tree.subtree_mask.astype(np.float32)  # (nb, nb)
  ancestor = m.tree.ancestor_mask.astype(np.float32)  # (nv, nv)
  body_dof = m.tree.body_dof_mask.astype(np.float32)  # (nb, nv)
  dof_subtree = m.tree.dof_subtree_mask.astype(np.float32)  # (nv, nb)
  cdofdot_m = m.tree.cdofdot_mask.astype(np.float32)  # (nv, nv)
  no_gravity = bool(m.opt.disableflags & types.DisableBit.GRAVITY)

  # static-sparsity index lists (the kernel unrolls only real tree edges,
  # the analog of the reference's per-branch kernels)
  sub_nz = [np.nonzero(subtree[b])[0] for b in range(nb)]
  bd_nz = [np.nonzero(body_dof[b])[0] for b in range(nb)]
  ds_nz = [np.nonzero(dof_subtree[i])[0] for i in range(nv)]
  cm_nz = [np.nonzero(cdofdot_m[i])[0] for i in range(nv)]

  W = qv[0].shape[-1]
  if True:

    def cross3(a, b):  # (3, W) each
      return jnp.concatenate([
          a[1:2] * b[2:3] - a[2:3] * b[1:2],
          a[2:3] * b[0:1] - a[0:1] * b[2:3],
          a[0:1] * b[1:2] - a[1:2] * b[0:1]], axis=0)

    def mat6vec(flat36, v6):  # (36, W), (6, W) -> (6, W)
      return jnp.concatenate([
          jnp.sum(flat36[6 * r:6 * r + 6] * v6, axis=0, keepdims=True)
          for r in range(6)], axis=0)

    # ---- crb: subtree sums over actual members only
    crbs = [None] * nb
    for b in range(nb):
      acc = ci[sub_nz[b][0]]
      for j in sub_nz[b][1:]:
        acc = acc + ci[j]
      crbs[b] = acc  # (36, W)

    # ---- mass matrix rows over actual ancestor pairs
    f = [mat6vec(crbs[dof_bodyid[i]], cdof[i]) for i in range(nv)]
    zrow = jnp.zeros((1, W), dtype)
    qM_rows = []
    for i in range(nv):
      cols = []
      for j in range(nv):
        if ancestor[i, j] or ancestor[j, i]:
          jj, ii = (j, i) if ancestor[i, j] else (i, j)
          cols.append(jnp.sum(cdof[jj] * f[ii], axis=0, keepdims=True))
        else:
          cols.append(zrow)
      qM_rows.append(jnp.concatenate(cols, axis=0))  # (nv, W)
    qM = jnp.stack(qM_rows, axis=0)  # (nv, nv, W)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (nv, nv), 0) ==
           jax.lax.broadcasted_iota(jnp.int32, (nv, nv), 1))
    eye_f = eye.astype(dtype)
    qM = qM + eye_f[:, :, None] * armature[:, None, :]
    L = _chol_tile(qM, nv)

    # ---- com_vel over actual dof lists
    cdof_qvel = [cdof[i] * qv[i] for i in range(nv)]
    cvel = [None] * nb
    for b in range(nb):
      if len(bd_nz[b]) == 0:
        cvel[b] = jnp.zeros((6, W), dtype)
      else:
        acc = cdof_qvel[bd_nz[b][0]]
        for i in bd_nz[b][1:]:
          acc = acc + cdof_qvel[i]
        cvel[b] = acc

    cdof_dot = [None] * nv
    for i in range(nv):
      if len(cm_nz[i]) == 0:
        vb = jnp.zeros((6, W), dtype)
      else:
        vb = cdof_qvel[cm_nz[i][0]]
        for j in cm_nz[i][1:]:
          vb = vb + cdof_qvel[j]
      va, vl = vb[:3], vb[3:]
      ua, ul = cdof[i][:3], cdof[i][3:]
      cdof_dot[i] = jnp.concatenate(
          [cross3(va, ua), cross3(vl, ua) + cross3(va, ul)], axis=0)

    # ---- rne
    if no_gravity:
      cacc0 = jnp.zeros((6, W), dtype)
    else:
      g = gravity * jnp.ones((3, W), dtype)
      cacc0 = jnp.concatenate([jnp.zeros((3, W), dtype), -g], axis=0)
    cfrc = [None] * nb
    for b in range(nb):
      if b == 0:
        cacc_b = jnp.zeros((6, W), dtype)
      else:
        cacc_b = cacc0
        for i in bd_nz[b]:
          cacc_b = cacc_b + cdof_dot[i] * qv[i]
      iv = mat6vec(ci[b], cvel[b])
      ia = mat6vec(ci[b], cacc_b)
      va, vl = cvel[b][:3], cvel[b][3:]
      fa, fl = iv[:3], iv[3:]
      vxf = jnp.concatenate(
          [cross3(va, fa) + cross3(vl, fl), cross3(va, fl)], axis=0)
      cfrc[b] = ia + vxf

    bias = []
    for i in range(nv):
      acc = cfrc[ds_nz[i][0]]
      for b in ds_nz[i][1:]:
        acc = acc + cfrc[b]
      bias.append(jnp.sum(acc * cdof[i], axis=0, keepdims=True))
    bias = jnp.concatenate(bias, axis=0)
  return qM, L, cvel, cdof_dot, bias


def _make_kernel(m: types.Model, dtype):
  nb, nv = m.nbody, m.nv

  def kernel(cinert_ref, cdof_ref, qvel_ref, armature_ref, gravity_ref,
             qM_out, qLD_out, cvel_out, cdofdot_out, bias_out):
    # all values stay 2D (rows, W): Mosaic cannot shape-cast the sublane
    # dim across ranks, so 6x6/6-blocks are addressed by static slices and
    # per-tree sums unroll over the static sparsity lists (the analog of
    # the reference's per-branch kernels)
    ci2 = cinert_ref[:]         # (nb*36, W)
    cdof2 = cdof_ref[:]         # (nv*6, W)
    qvel = qvel_ref[:]          # (nv, W)
    W = qvel.shape[-1]
    ci = [ci2[36 * b:36 * (b + 1)] for b in range(nb)]     # (36, W) each
    cdof = [cdof2[6 * i:6 * (i + 1)] for i in range(nv)]   # (6, W) each
    qv = [qvel[i:i + 1] for i in range(nv)]                # (1, W) each
    qM, L, cvel, cdof_dot, bias = mass_chain_core(
        m, dtype, ci, cdof, qv, armature_ref[:], gravity_ref[:])
    qM_out[:] = qM.reshape(nv * nv, W)
    qLD_out[:] = L.reshape(nv * nv, W)
    cvel_out[:] = jnp.concatenate(cvel, axis=0)
    cdofdot_out[:] = jnp.concatenate(cdof_dot, axis=0)
    bias_out[:] = bias

  return kernel


def mass_chain(m: types.Model, d: types.Data,
               interpret: bool = False) -> types.Data:
  """Batched crb+factor+com_vel+rne via the fused kernel.

  Expects batched Data with kinematics/com_pos already applied.
  """
  dtype = d.qpos.dtype
  W = d.qpos.shape[0]
  nb, nv = m.nbody, m.nv

  cinert = jnp.moveaxis(d.cinert.reshape(W, nb * 36), 0, -1)
  cdof = jnp.moveaxis(d.cdof.reshape(W, nv * 6), 0, -1)
  qvel = d.qvel.T

  def bw(lead):
    return pl.BlockSpec((lead, TILE_W), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

  def bstat(r, c):
    return pl.BlockSpec((r, c), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)

  kernel = _make_kernel(m, dtype)
  qM, qLD, cvel, cdof_dot, bias = pl.pallas_call(
      kernel,
      grid=(W // TILE_W,),
      in_specs=[
          bw(nb * 36), bw(nv * 6), bw(nv),
          bstat(nv, 1), bstat(3, 1),
      ],
      out_specs=[bw(nv * nv), bw(nv * nv), bw(nb * 6), bw(nv * 6),
                 bw(nv)],
      out_shape=[
          jax.ShapeDtypeStruct((nv * nv, W), dtype),
          jax.ShapeDtypeStruct((nv * nv, W), dtype),
          jax.ShapeDtypeStruct((nb * 6, W), dtype),
          jax.ShapeDtypeStruct((nv * 6, W), dtype),
          jax.ShapeDtypeStruct((nv, W), dtype),
      ],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(cinert, cdof, qvel,
    m.dof_armature.astype(dtype)[:, None],
    m.opt.gravity.astype(dtype)[:, None])

  return d.replace(
      qM=jnp.moveaxis(qM, -1, 0).reshape(W, nv, nv),
      qLD=jnp.moveaxis(qLD, -1, 0).reshape(W, nv, nv),
      cvel=jnp.moveaxis(cvel, -1, 0).reshape(W, nb, 6),
      cdof_dot=jnp.moveaxis(cdof_dot, -1, 0).reshape(W, nv, 6),
      qfrc_bias=bias.T)
