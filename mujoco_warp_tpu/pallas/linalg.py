"""Batched small-matrix linear algebra on world-lane tiles.

Lane-parallel Cholesky factor/solve for the per-step dense systems
outside the Newton kernel: `factor_m` / qacc_smooth = M⁻¹ qfrc_smooth
(reference: smooth.py:1341 `factor_m`, smooth.py:3212 `solve_m`) and the
Euler implicit-damping solve (M + h·diag(damping))⁻¹ (M qacc)
(reference: forward.py:388 `euler`).

Why not XLA: batched `lax.linalg.cholesky` at (8192, 81, 81) measures
~78 ms on v5e (serial panel loop with dynamic slicing per batch tile)
and batched TriangularSolve exceeds the scoped-vmem limit outright
(InvertDiagBlocksLowerTriangular wants 17.45M of 16M at 81×81×8192).
Worlds-on-lanes Pallas kernels do the same factor in ~1-2 ms: every
vector op is 128 real worlds wide.

Two kernel regimes, same arithmetic (see pallas/solver.py):
- nv ≤ 48: fully unrolled `_chol_tile`/`_chol_solve_tile` column ops.
- nv > 48: fori_loop forms over VMEM scratch (`_chol_big`), keeping the
  Mosaic instruction count O(loop body) at any nv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mujoco_warp_tpu import types
from mujoco_warp_tpu.pallas.solver import (TILE_W, _chol_big,
                                           _chol_solve_big,
                                           _chol_solve_tile, _chol_tile)

_VMEM_BUDGET = 96 * 1024 * 1024
_UNROLL_NV = 48


def _big(nv: int) -> bool:
  return nv > _UNROLL_NV


def supported(m: types.Model, d: types.Data) -> bool:
  if m.m_blocked:  # no dense qM/qLD exists under the blocked mass matrix
    return False
  if d.qpos.ndim != 2 or d.qpos.shape[0] % TILE_W != 0:
    return False
  if jax.default_backend() == 'cpu':
    return False
  # worst kernel holds ~4 (nv, nv, W) buffers (in + out + 2 scratch)
  return 4 * TILE_W * (4 * m.nv * m.nv + 6 * m.nv) < _VMEM_BUDGET


def _bw(lead):
  return pl.BlockSpec((lead, TILE_W), lambda i: (0, i),
                      memory_space=pltpu.VMEM)


def _stack_T(Lval, nv):
  """(nv, nv, W) transpose of the leading two axes via an unrolled stack
  (Mosaic has no value-level transpose across the sublane dim)."""
  return jnp.stack([Lval[j] for j in range(nv)], axis=1)


def chol_batched(m: types.Model, A, jitter: float = 0.0,
                 interpret: bool = False):
  """L with L Lᵀ = A for batched SPD A (W, nv, nv) → (W, nv, nv).

  The system size comes from A's trailing dims (== m.nv for the full
  mass/Hessian systems; smaller for tree-blocked sub-systems)."""
  nv = A.shape[-1]
  dtype = A.dtype
  W = A.shape[0]
  At = jnp.moveaxis(A.reshape(W, nv * nv), 0, -1)
  big = _big(nv)

  def kernel(A_ref, L_out, *scr):
    Wt = A_ref.shape[-1]
    Av = A_ref[:].reshape(nv, nv, Wt)
    if jitter:
      eye = (jax.lax.broadcasted_iota(jnp.int32, (nv, nv), 0) ==
             jax.lax.broadcasted_iota(jnp.int32, (nv, nv), 1))
      Av = Av + eye.astype(dtype)[:, :, None] * jitter
    if big:
      H_scr, LT_scr = scr
      H_scr[:] = Av
      _chol_big(H_scr, LT_scr, nv, dtype)
      L = _stack_T(LT_scr[:], nv)  # LT[j] = column j → L rows
    else:
      L = _chol_tile(Av, nv)
    L_out[:] = L.reshape(nv * nv, Wt)

  scratch = ([pltpu.VMEM((nv, nv, TILE_W), dtype) for _ in range(2)]
             if big else [])
  L = pl.pallas_call(
      kernel,
      grid=(W // TILE_W,),
      in_specs=[_bw(nv * nv)],
      out_specs=_bw(nv * nv),
      out_shape=jax.ShapeDtypeStruct((nv * nv, W), dtype),
      scratch_shapes=scratch,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=_VMEM_BUDGET),
      interpret=interpret,
  )(At)
  return jnp.moveaxis(L, -1, 0).reshape(W, nv, nv)


def chol_solve_batched(m: types.Model, qLD, rhs,
                       interpret: bool = False):
  """x = (L Lᵀ)⁻¹ rhs for batched (W, nv, nv) factor + (W, nv) rhs."""
  nv = qLD.shape[-1]
  dtype = rhs.dtype
  W = rhs.shape[0]
  L = jnp.moveaxis(qLD.reshape(W, nv * nv), 0, -1)
  b = rhs.T
  big = _big(nv)

  def kernel(L_ref, b_ref, x_out, *scr):
    Lt = L_ref[:].reshape(nv, nv, b_ref.shape[-1])
    if big:
      LT_scr, LR_scr = scr
      LR_scr[:] = Lt                 # LR[i] = row i of L
      LT_scr[:] = _stack_T(Lt, nv)   # LT[j] = column j of L
      x_out[:] = _chol_solve_big(LT_scr, LR_scr, b_ref[:], nv)
    else:
      x_out[:] = _chol_solve_tile(Lt, b_ref[:], nv)

  scratch = ([pltpu.VMEM((nv, nv, TILE_W), dtype) for _ in range(2)]
             if big else [])
  x = pl.pallas_call(
      kernel,
      grid=(W // TILE_W,),
      in_specs=[_bw(nv * nv), _bw(nv)],
      out_specs=_bw(nv),
      out_shape=jax.ShapeDtypeStruct((nv, W), dtype),
      scratch_shapes=scratch,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=_VMEM_BUDGET),
      interpret=interpret,
  )(L, b)
  return x.T


def damped_solve_batched(m: types.Model, qM, damping, dt, qacc,
                         interpret: bool = False):
  """(M + dt·diag(damping))⁻¹ (M qacc) for batched inputs."""
  nv = m.nv
  dtype = qacc.dtype
  W = qacc.shape[0]
  Mt = jnp.moveaxis(qM.reshape(W, nv * nv), 0, -1)
  a = qacc.T
  dmp = (dt * damping).astype(dtype)[:, None]  # (nv, 1)
  big = _big(nv)

  def kernel(M_ref, a_ref, dmp_ref, x_out, *scr):
    Wt = a_ref.shape[-1]
    M = M_ref[:].reshape(nv, nv, Wt)
    acc = a_ref[:]
    dmpv = dmp_ref[:]
    rhs = jnp.sum(M * acc[None, :, :], axis=1)  # M qacc
    eye = (jax.lax.broadcasted_iota(jnp.int32, (nv, nv), 0) ==
           jax.lax.broadcasted_iota(jnp.int32, (nv, nv), 1))
    eye_f = eye.astype(dtype)
    A = M + eye_f[:, :, None] * dmpv[:, None, :]
    if big:
      H_scr, LT_scr, LR_scr = scr
      H_scr[:] = A
      _chol_big(H_scr, LT_scr, nv, dtype)
      LR_scr[:] = _stack_T(LT_scr[:], nv)
      # _chol_solve_big wants LT[j]=col j, LR[i]=row i; after _chol_big
      # LT holds columns, so rows are its stack-transpose
      x_out[:] = _chol_solve_big(LT_scr, LR_scr, rhs, nv)
    else:
      L = _chol_tile(A, nv)
      x_out[:] = _chol_solve_tile(L, rhs, nv)

  scratch = ([pltpu.VMEM((nv, nv, TILE_W), dtype) for _ in range(3)]
             if big else [])
  x = pl.pallas_call(
      kernel,
      grid=(W // TILE_W,),
      in_specs=[_bw(nv * nv), _bw(nv),
                pl.BlockSpec((nv, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)],
      out_specs=_bw(nv),
      out_shape=jax.ShapeDtypeStruct((nv, W), dtype),
      scratch_shapes=scratch,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=_VMEM_BUDGET),
      interpret=interpret,
  )(Mt, a, dmp)
  return x.T
