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
  if m.m_blocked:  # blocked mass matrix has no dense qM/qLD to produce
    return False
  if d.qpos.ndim != 2 or d.qpos.shape[0] % TILE_W != 0:
    return False
  if jax.default_backend() == 'cpu':
    return False
  vmem = 4 * TILE_W * (m.nbody * 36 * 3 + m.nv * 6 * 4 +
                       3 * m.nv * m.nv + m.nbody * 12 + 8 * m.nv)
  return vmem < _VMEM_BUDGET


def mass_chain_core(m: types.Model, dtype, ci, cdof, qv, armature,
                    gravity, ancm=None, need_L=True):
  """crb → qM → Cholesky → com_vel → rne on one world tile, lanes-last.

  Pure function over VMEM values shared by the standalone mass-chain
  kernel and the fused whole-step kernel (pallas/fused.py).
  ci: list of (36, W) per body; cdof: list of (6, W) per dof; qv: list of
  (1, W) per dof; armature (nv, 1); gravity (3, 1) or (3, W).
  Returns (qM (nv,nv,W), L (nv,nv,W), cvel list (6,W), cdof_dot list,
  bias (nv, W)).

  ``ancm`` (nv, nv) selects the vectorized qM build for large trees: the
  per-ancestor-pair unroll emits O(nv^2) vector ops (the Mosaic compile
  bomb at three_humanoids' nv=81); with ancm the whole matrix is 12
  (nv, nv, W) FMAs masked by the ancestor relation (1.0 → cdof[j]·f[i],
  2.0 → cdof[i]·f[j], 0 → structural zero).  Kernels must feed ancm as an
  input (Pallas rejects captured (nv, nv) constants).
  """
  nb, nv = m.nbody, m.nv
  dof_bodyid = tuple(int(x) for x in m.dof_bodyid)
  ancestor = m.tree.ancestor_mask.astype(np.float32)  # (nv, nv)
  body_dof = m.tree.body_dof_mask.astype(np.float32)  # (nb, nv)
  cdofdot_m = m.tree.cdofdot_mask.astype(np.float32)  # (nv, nv)
  no_gravity = bool(m.opt.disableflags & types.DisableBit.GRAVITY)
  parent = tuple(int(x) for x in m.body_parentid)
  # bottom-up body order: deepest level first, so a body's subtree sum is
  # complete before it is folded into its parent (O(nbody) adds vs the
  # O(nbody * depth) per-subtree unroll)
  topo = [int(b) for lvl in m.tree.body_levels for b in lvl]

  # static-sparsity index lists (the kernel unrolls only real tree edges,
  # the analog of the reference's per-branch kernels)
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

    # ---- crb: bottom-up subtree accumulation
    crbs = list(ci)
    for b in reversed(topo):
      p = parent[b]
      crbs[p] = crbs[p] + crbs[b]

    # ---- mass matrix
    f = [mat6vec(crbs[dof_bodyid[i]], cdof[i]) for i in range(nv)]
    if ancm is not None:
      F = jnp.stack(f, axis=0)      # (nv, 6, W)
      CD = jnp.stack(cdof, axis=0)  # (nv, 6, W)
      G1 = None  # G1[i, j] = cdof[j]·f[i]
      G2 = None  # G2[i, j] = cdof[i]·f[j]
      for k in range(6):
        t1 = F[:, k, :][:, None, :] * CD[:, k, :][None, :, :]
        t2 = CD[:, k, :][:, None, :] * F[:, k, :][None, :, :]
        G1 = t1 if G1 is None else G1 + t1
        G2 = t2 if G2 is None else G2 + t2
      sel = ancm[:, :, None]
      qM = jnp.where(sel == 1.0, G1, 0.0) + jnp.where(sel == 2.0, G2, 0.0)
    else:
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
    # large trees skip the in-kernel unrolled Cholesky (compile scale);
    # the caller factors qM with XLA's batched MXU Cholesky instead.
    # need_L=False skips it outright: when the model statically has
    # constraint rows, the fused K4 factors H itself and the damped
    # integrator builds its own (M + h·damp) factor — the O(nv³) factor
    # and its (nv², W) HBM round trip are dead work
    L = _chol_tile(qM, nv) if (ancm is None and need_L) else None

    # ---- com_vel: top-down accumulation (cvel[b] = cvel[parent] + own)
    cdof_qvel = [cdof[i] * qv[i] for i in range(nv)]
    own_dofs = [np.nonzero(np.asarray(dof_bodyid) == b)[0]
                for b in range(nb)]
    cvel = [None] * nb
    cvel[0] = jnp.zeros((6, W), dtype)
    for b in topo:
      acc = cvel[parent[b]]
      for i in own_dofs[b]:
        acc = acc + cdof_qvel[int(i)]
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
    # cacc: top-down accumulation (cacc[b] = cacc[parent] + own dofs)
    cacc = [None] * nb
    cacc[0] = cacc0
    cfrc = [None] * nb
    cfrc[0] = jnp.zeros((6, W), dtype)
    for b in topo:
      acc = cacc[parent[b]]
      for i in own_dofs[b]:
        acc = acc + cdof_dot[int(i)] * qv[int(i)]
      cacc[b] = acc
      iv = mat6vec(ci[b], cvel[b])
      ia = mat6vec(ci[b], acc)
      va, vl = cvel[b][:3], cvel[b][3:]
      fa, fl = iv[:3], iv[3:]
      vxf = jnp.concatenate(
          [cross3(va, fa) + cross3(vl, fl), cross3(va, fl)], axis=0)
      cfrc[b] = ia + vxf

    # bias: bottom-up cfrc subtree totals, then one dot per dof
    cfrc_tot = list(cfrc)
    for b in reversed(topo):
      p = parent[b]
      cfrc_tot[p] = cfrc_tot[p] + cfrc_tot[b]
    bias = jnp.concatenate([
        jnp.sum(cfrc_tot[dof_bodyid[i]] * cdof[i], axis=0, keepdims=True)
        for i in range(nv)], axis=0)
  return qM, L, cvel, cdof_dot, bias


def _big_tree(m: types.Model) -> bool:
  """Vectorized-qM / XLA-Cholesky variant beyond the unroll scale."""
  return m.nv > 48 or m.nbody > 32


def _ancm_table(m: types.Model) -> np.ndarray:
  """(nv, nv) qM build selector: 1 → cdof[j]·f[i] (j ancestor of i),
  2 → cdof[i]·f[j], 0 → structural zero."""
  anc = m.tree.ancestor_mask
  sel = np.zeros(anc.shape, np.float32)
  sel[anc] = 1.0
  sel[anc.T & ~anc] = 2.0
  return sel


def _make_kernel(m: types.Model, dtype):
  nb, nv = m.nbody, m.nv
  big = _big_tree(m)

  def kernel(cinert_ref, cdof_ref, qvel_ref, armature_ref, gravity_ref,
             *rest):
    if big:
      ancm_ref = rest[0]
      qM_out, cvel_out, cdofdot_out, bias_out = rest[1:]
    else:
      qM_out, qLD_out, cvel_out, cdofdot_out, bias_out = rest
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
        m, dtype, ci, cdof, qv, armature_ref[:], gravity_ref[:],
        ancm=ancm_ref[:] if big else None)
    qM_out[:] = qM.reshape(nv * nv, W)
    if not big:
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
  big = _big_tree(m)
  in_specs = [bw(nb * 36), bw(nv * 6), bw(nv), bstat(nv, 1), bstat(3, 1)]
  inputs = [cinert, cdof, qvel,
            m.dof_armature.astype(dtype)[:, None],
            m.opt.gravity.astype(dtype)[:, None]]
  out_specs = [bw(nv * nv), bw(nv * nv), bw(nb * 6), bw(nv * 6), bw(nv)]
  out_shape = [
      jax.ShapeDtypeStruct((nv * nv, W), dtype),
      jax.ShapeDtypeStruct((nv * nv, W), dtype),
      jax.ShapeDtypeStruct((nb * 6, W), dtype),
      jax.ShapeDtypeStruct((nv * 6, W), dtype),
      jax.ShapeDtypeStruct((nv, W), dtype),
  ]
  if big:
    in_specs.append(bstat(nv, nv))
    inputs.append(jnp.asarray(_ancm_table(m), dtype))
    del out_specs[1], out_shape[1]  # qLD comes from XLA below
  outs = pl.pallas_call(
      kernel,
      grid=(W // TILE_W,),
      in_specs=in_specs,
      out_specs=out_specs,
      out_shape=out_shape,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(*inputs)
  if big:
    qM, cvel, cdof_dot, bias = outs
    qM_w = jnp.moveaxis(qM, -1, 0).reshape(W, nv, nv)
    # factor with the lane-parallel loop-form Cholesky — the in-kernel
    # unrolled factorization is a compile bomb at this nv, and XLA's
    # batched Cholesky measures ~78 ms at (8192, 81, 81) on v5e
    from mujoco_warp_tpu.pallas import linalg as plinalg
    qLD_w = plinalg.chol_batched(m, qM_w, jitter=1e-12,
                                 interpret=interpret)
  else:
    qM, qLD, cvel, cdof_dot, bias = outs
    qM_w = jnp.moveaxis(qM, -1, 0).reshape(W, nv, nv)
    qLD_w = jnp.moveaxis(qLD, -1, 0).reshape(W, nv, nv)

  return d.replace(
      qM=qM_w,
      qLD=qLD_w,
      cvel=jnp.moveaxis(cvel, -1, 0).reshape(W, nb, 6),
      cdof_dot=jnp.moveaxis(cdof_dot, -1, 0).reshape(W, nv, 6),
      qfrc_bias=bias.T)
