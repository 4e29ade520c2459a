"""Small world-tile linear-algebra kernels.

Lane-parallel triangular/Cholesky solves for the per-step dense systems
outside the Newton kernel: qacc_smooth = M⁻¹ qfrc_smooth (reference:
smooth.py:3212 `solve_m`) and the Euler implicit-damping solve
(M + h·diag(damping))⁻¹ (M qacc) (reference: forward.py:388 `euler`).
XLA's batched triangular solves at (W, 27, 27) are launch/layout bound;
these run as one VMEM pass per 128-world tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mujoco_warp_tpu import types
from mujoco_warp_tpu.pallas.solver import (TILE_W, _chol_solve_tile,
                                           _chol_tile)

_VMEM_BUDGET = 96 * 1024 * 1024


def supported(m: types.Model, d: types.Data) -> bool:
  if d.qpos.ndim != 2 or d.qpos.shape[0] % TILE_W != 0:
    return False
  if jax.default_backend() == 'cpu':
    return False
  if m.nv > 64:  # compile-scale gate (see pallas/solver.supported)
    return False
  return 4 * TILE_W * (3 * m.nv * m.nv + 6 * m.nv) < _VMEM_BUDGET


def chol_solve_batched(m: types.Model, qLD, rhs):
  """x = (L Lᵀ)⁻¹ rhs for batched (W, nv, nv) factor + (W, nv) rhs."""
  nv = m.nv
  dtype = rhs.dtype
  W = rhs.shape[0]
  L = jnp.moveaxis(qLD.reshape(W, nv * nv), 0, -1)
  b = rhs.T

  def kernel(L_ref, b_ref, x_out):
    Lt = L_ref[:].reshape(nv, nv, b_ref.shape[-1])
    x_out[:] = _chol_solve_tile(Lt, b_ref[:], nv)

  bw = lambda lead: pl.BlockSpec((lead, TILE_W), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
  x = pl.pallas_call(
      kernel,
      grid=(W // TILE_W,),
      in_specs=[bw(nv * nv), bw(nv)],
      out_specs=bw(nv),
      out_shape=jax.ShapeDtypeStruct((nv, W), dtype),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=64 * 1024 * 1024),
  )(L, b)
  return x.T


def damped_solve_batched(m: types.Model, qM, damping, dt, qacc):
  """(M + dt·diag(damping))⁻¹ (M qacc) for batched inputs."""
  nv = m.nv
  dtype = qacc.dtype
  W = qacc.shape[0]
  Mt = jnp.moveaxis(qM.reshape(W, nv * nv), 0, -1)
  a = qacc.T
  dmp = (dt * damping).astype(dtype)[:, None]  # (nv, 1)

  def kernel(M_ref, a_ref, dmp_ref, x_out):
    Wt = a_ref.shape[-1]
    M = M_ref[:].reshape(nv, nv, Wt)
    acc = a_ref[:]
    dmpv = dmp_ref[:]
    rhs = jnp.sum(M * acc[None, :, :], axis=1)  # M qacc
    eye = (jax.lax.broadcasted_iota(jnp.int32, (nv, nv), 0) ==
           jax.lax.broadcasted_iota(jnp.int32, (nv, nv), 1))
    eye_f = eye.astype(dtype)
    A = M + eye_f[:, :, None] * dmpv[:, None, :]
    L = _chol_tile(A, nv)
    x_out[:] = _chol_solve_tile(L, rhs, nv)

  bw = lambda lead: pl.BlockSpec((lead, TILE_W), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
  x = pl.pallas_call(
      kernel,
      grid=(W // TILE_W,),
      in_specs=[bw(nv * nv), bw(nv),
                pl.BlockSpec((nv, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)],
      out_specs=bw(nv),
      out_shape=jax.ShapeDtypeStruct((nv, W), dtype),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=64 * 1024 * 1024),
  )(Mt, a, dmp)
  return x.T
