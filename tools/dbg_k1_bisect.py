"""Compile-time bisect of K1's stages (FK / com / narrowphase / compact /
mass chain) as standalone pallas kernels."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mujoco_warp_tpu import benchmarks
from mujoco_warp_tpu.pallas import fused
from mujoco_warp_tpu.pallas import smooth as psmooth
from mujoco_warp_tpu.pallas.solver import TILE_W

NWORLD = 1024
STAGE = sys.argv[1] if len(sys.argv) > 1 else 'fk'


def ctime(name, fn, *args):
  t0 = time.perf_counter()
  c = jax.jit(fn).lower(*args).compile()
  t1 = time.perf_counter()
  print(f'{name:10s} lower+compile {t1-t0:7.1f}s', flush=True)
  return c


def main():
  mjm = benchmarks.load_humanoid_benchmark()
  m, d = benchmarks.build(mjm, NWORLD)
  st = fused.to_lane(m, d)
  dtype = st.qpos.dtype
  W = NWORLD
  nb, nv, ngeom = m.nbody, m.nv, m.ngeom
  geom_pos = np.asarray(jax.device_get(m.geom_pos), np.float64)
  geom_quat = np.asarray(jax.device_get(m.geom_quat), np.float64)
  gb = m.geom_bodyid

  def bw(lead):
    return pl.BlockSpec((lead, TILE_W), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

  def bstat(r):
    return pl.BlockSpec((r, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)

  def bstatw(r):
    return pl.BlockSpec((r, TILE_W), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)

  sizes = jnp.asarray(np.asarray(jax.device_get(m.geom_size),
                                 np.float32).reshape(-1, 1))
  arm = m.dof_armature.astype(dtype)[:, None]
  grav = m.opt.gravity.astype(dtype)[:, None]

  def kernel(qpos_ref, qvel_ref, sizes_ref, arm_ref, grav_ref, out_ref):
    qpos = qpos_ref[:]
    qvel = qvel_ref[:]
    szs = sizes_ref[:]
    acc = jnp.zeros((1, qpos.shape[-1]), dtype)

    xpos, xquat, xanchor, xaxis = fused._fk(m, qpos, dtype)
    if STAGE == 'fk':
      for b in range(nb):
        acc = acc + jnp.sum(xpos[b], 0, keepdims=True) \
            + jnp.sum(xquat[b], 0, keepdims=True)
      out_ref[:] = acc
      return

    subtree_com, cinert, cdof = fused._com_quantities(
        m, xpos, xquat, xanchor, xaxis, dtype)
    if STAGE == 'com':
      for b in range(nb):
        acc = acc + jnp.sum(cinert[b], 0, keepdims=True)
      for i in range(nv):
        acc = acc + jnp.sum(cdof[i], 0, keepdims=True)
      out_ref[:] = acc
      return

    if STAGE == 'narrow':
      gx, gmat = [], []
      for g in range(ngeom):
        b = int(gb[g])
        gx.append(fused._add(xpos[b],
                             fused._qrot_const(geom_pos[g], xquat[b])))
        gmat.append(fused._q2mat(fused._qmul_const(xquat[b],
                                                   geom_quat[g])))
      dist, cpos, cframe = fused._narrowphase(m, gx, gmat, szs, dtype)
      out_ref[:] = (jnp.sum(dist, 0, keepdims=True) +
                    jnp.sum(cpos, 0, keepdims=True) +
                    jnp.sum(cframe, 0, keepdims=True))
      return

    if STAGE == 'mass':
      qv = [qvel[i:i + 1] for i in range(nv)]
      qM, L, cvel, cdof_dot, bias = psmooth.mass_chain_core(
          m, dtype, cinert, cdof, qv, arm_ref[:], grav_ref[:])
      out_ref[:] = (jnp.sum(qM.reshape(nv * nv, -1), 0, keepdims=True) +
                    jnp.sum(L.reshape(nv * nv, -1), 0, keepdims=True) +
                    jnp.sum(bias, 0, keepdims=True))
      return

  def call(qpos, qvel):
    return pl.pallas_call(
        kernel,
        grid=(W // TILE_W,),
        in_specs=[bw(m.nq), bw(nv), bstat(ngeom * 3), bstat(nv), bstat(3)],
        out_specs=[bw(1)],
        out_shape=[jax.ShapeDtypeStruct((1, W), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qpos, qvel, sizes, arm, grav)

  ctime(STAGE, call, st.qpos, st.qvel)


if __name__ == '__main__':
  main()
