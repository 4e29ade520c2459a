"""TPU timing of the hybrid (jnp+Pallas-Cholesky) Newton solve internals.

Times one _linesearch, one _update_constraint, one _gradient (H build +
Cholesky), and the full solve, on a settled state of a registry scene.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from benchmarks import BENCHMARKS  # noqa: E402

from mujoco_warp_tpu import benchmarks as bh  # noqa: E402
from mujoco_warp_tpu import types  # noqa: E402
from mujoco_warp_tpu.ops import forward as fwd  # noqa: E402
from mujoco_warp_tpu.ops import smooth, solver as sv  # noqa: E402

SCENE = os.environ.get('SCENE', 'three_humanoids')
NWORLD = int(os.environ.get('NWORLD', 8192))
REPS = int(os.environ.get('REPS', 20))


def timeit(name, fn, *args):
  fn_j = jax.jit(fn)
  out = jax.block_until_ready(fn_j(*args))
  t0 = time.perf_counter()
  for _ in range(REPS):
    out = fn_j(*args)
  jax.block_until_ready(out)
  dt = (time.perf_counter() - t0) / REPS
  print(f'{name:34s} {dt*1e3:8.2f} ms', flush=True)
  return out


def main():
  path, _, _, overrides, nconmax = BENCHMARKS[SCENE]
  mjm = mujoco.MjModel.from_xml_path(path)
  kw = {} if nconmax is None else {'nconmax': nconmax}
  m, d = bh.build(mjm, NWORLD, overrides=overrides, **kw)
  step = jax.jit(lambda dd: fwd.step(m, dd))
  for _ in range(5):
    d = step(d)
  d = jax.block_until_ready(d)
  print(f'{SCENE}: nv={m.nv} nefc={m.nefc} '
        f'niter_mean={float(jnp.mean(d.solver_niter)):.1f} '
        f'niter_max={int(jnp.max(d.solver_niter))}')

  dtype = d.qpos.dtype
  st = sv._static_tables(m)
  mu_scale = 1.0

  def prep(dd):
    qacc = dd.qacc_warmstart
    Jaref = sv._j_mul(m, dd, qacc) - dd.efc_aref
    Ma = smooth.mul_m(m, dd, qacc)
    return qacc, Jaref, Ma

  qacc, Jaref, Ma = jax.jit(jax.vmap(prep))(d)

  def upd(dd, Jaref):
    return sv._update_constraint(m, dd, st, Jaref, mu_scale)

  force, state, _ = timeit('update_constraint', jax.vmap(upd), d, Jaref)

  def grad_fn(dd, Ma, force, state, Jaref):
    return sv._gradient(m, dd, st, Ma, force, state, Jaref, mu_scale)

  grad, Mgrad, _ = timeit('gradient (H + chol)', jax.vmap(grad_fn),
                          d, Ma, force, state, Jaref)

  def hbuild(dd, force, state):
    Dq = dd.efc_D * (state == 2)
    return dd.qM + (dd.efc_J.T * Dq) @ dd.efc_J

  H = timeit('  H build only', jax.vmap(hbuild), d, force, state)

  def chol_only(H, grad):
    return sv._make_chol_solve(m)(H, grad)

  timeit('  chol factor+solve only', jax.vmap(chol_only), H, grad)

  def ls(dd, qacc, Ma, Jaref, search):
    return sv._linesearch(m, dd, st, qacc, Ma, Jaref, search, mu_scale)[0]

  timeit('linesearch (full bracket)', jax.vmap(ls), d, qacc, Ma, Jaref,
         -Mgrad)

  def jv_only(dd, search):
    return sv._j_mul(m, dd, search)

  timeit('  jv = J @ search only', jax.vmap(jv_only), d, -Mgrad)

  timeit('solve_batched (full)', lambda dd: sv.solve_batched(m, dd), d)


if __name__ == '__main__':
  main()
