"""Attribute _compact_xla time: S contraction vs params/masks/coms."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import benchmarks, types
from mujoco_warp_tpu.pallas import fused

NWORLD = int(os.environ.get('NWORLD', 8192))
REPS = int(os.environ.get('REPS', 30))


def timeit(name, fn, *args):
  fn_j = jax.jit(fn)
  out = jax.block_until_ready(fn_j(*args))
  t0 = time.perf_counter()
  for _ in range(REPS):
    out = fn_j(*args)
  jax.block_until_ready(out)
  dt = (time.perf_counter() - t0) / REPS
  print(f'{name:40s} {dt*1e3:9.2f} ms', flush=True)
  return out


def main():
  mjm = benchmarks.load_humanoid_benchmark()
  m, d = benchmarks.build(mjm, NWORLD)
  st = fused.to_lane(m, d)
  dtype = st.qpos.dtype
  k1 = jax.jit(lambda q, v: fused._k1_call(m, q, v, factor_damped=True))(
      st.qpos, st.qvel)
  c_dist, c_pos, c_frame, stcom = k1[4:]

  timeit('compact_xla full', lambda *a: fused._compact_xla(m, *a, dtype),
         c_dist, c_pos, c_frame, stcom)

  im_np = fused._host(m.cand_includemargin, np.float32)
  nc = m.ncand

  def contraction_only(dist, cpos, cframe):
    W = dist.shape[-1]
    pos3 = cpos.reshape(nc, 3, W)
    fr9 = cframe.reshape(nc, 9, W)
    outs = []
    for dim_c, cap, ci, _ in m.con_classes:
      ci = np.asarray(ci, np.int32)
      ncc = len(ci)
      distc = dist[ci]
      act = distc < jnp.asarray(im_np[ci])[:, None]
      actf = act.astype(dtype)
      pref = jnp.cumsum(actf, axis=0)
      rank = pref - actf
      srow = jax.lax.broadcasted_iota(jnp.int32, (cap, ncc, W), 0) \
          .astype(dtype)
      S = jnp.where((rank[None] == srow) & act[None], 1.0, 0.0)
      F = jnp.concatenate([
          distc[None], pos3[ci].transpose(1, 0, 2),
          fr9[ci].transpose(1, 0, 2),
      ], axis=0)  # (13, ncc, W)
      C = jnp.sum(S[None] * F[:, None], axis=2)
      outs.append(C)
    return outs

  timeit('S contraction only (13 fields)', contraction_only,
         c_dist, c_pos, c_frame)

  def contraction_3(dist, cpos, cframe):
    W = dist.shape[-1]
    pos3 = cpos.reshape(nc, 3, W)
    outs = []
    for dim_c, cap, ci, _ in m.con_classes:
      ci = np.asarray(ci, np.int32)
      ncc = len(ci)
      distc = dist[ci]
      act = distc < jnp.asarray(im_np[ci])[:, None]
      actf = act.astype(dtype)
      pref = jnp.cumsum(actf, axis=0)
      rank = pref - actf
      srow = jax.lax.broadcasted_iota(jnp.int32, (cap, ncc, W), 0) \
          .astype(dtype)
      S = jnp.where((rank[None] == srow) & act[None], 1.0, 0.0)
      F = jnp.concatenate([distc[None], pos3[ci].transpose(1, 0, 2)],
                          axis=0)
      C = jnp.sum(S[None] * F[:, None], axis=2)
      outs.append(C)
    return outs

  timeit('S contraction only (4 fields)', contraction_3,
         c_dist, c_pos, c_frame)

  def rank_only(dist):
    outs = []
    for dim_c, cap, ci, _ in m.con_classes:
      ci = np.asarray(ci, np.int32)
      distc = dist[ci]
      act = distc < jnp.asarray(im_np[ci])[:, None]
      actf = act.astype(dtype)
      pref = jnp.cumsum(actf, axis=0)
      outs.append(pref - actf)
    return outs

  timeit('rank (cumsum) only', rank_only, c_dist)


if __name__ == '__main__':
  main()
