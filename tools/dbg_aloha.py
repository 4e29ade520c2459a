"""Diagnose aloha_pot overflow: which accounting fires, at what counts.

Loads the reference aloha_pot scene with the lift replay's initial state,
runs the position stages + collision for a few steps, and prints per
condim class active-contact counts vs caps, and per broadphase group
penetrating-bound counts vs budgets.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('MWTPU_FORCE_CPU'):
  import jax
  jax.config.update('jax_platforms', 'cpu')

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mujoco_warp_tpu import io, types
from mujoco_warp_tpu.ops import collision_driver, forward as fwd

SCENE = '/root/reference/mujoco_warp/test_data/aloha_pot/scene.xml'
NPZ = '/root/reference/benchmarks/aloha/lift_pot.npz'
NSTEP = int(os.environ.get('NSTEP', 20))
NCONMAX = eval(os.environ.get('NCONMAX', '{1: 8, 3: 24}'))


def main():
  mjm = mujoco.MjModel.from_xml_path(SCENE)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_resetData(mjm, mjd)
  traj = io.load_trajectory(NPZ, mjm, mjd).astype(np.float32)
  m = io.put_model(mjm, nconmax=NCONMAX)
  d = io.make_data(m, nworld=1)
  d = d.replace(qpos=jnp.asarray(mjd.qpos, jnp.float32)[None],
                qvel=jnp.asarray(mjd.qvel, jnp.float32)[None])

  print('con_classes (dim, cap, n_cand):',
        [(dim, cap, len(ci)) for dim, cap, ci, _ in m.con_classes])
  print('bp_groups (cap, dim) per pair_group (t1,t2,n):')
  for gi, (t1, t2, idx, slot) in enumerate(m.pair_groups):
    bc, bd = m.bp_groups[gi]
    print(f'  g{gi}: types=({int(t1)},{int(t2)}) n={len(idx)} '
          f'bp_cap={bc} dim={bd}')

  step = jax.jit(lambda dd, c: fwd.step(m, dd.replace(
      ctrl=jnp.broadcast_to(c, dd.ctrl.shape))))

  def diag(dd):
    d0 = jax.vmap(lambda x: x)(dd)  # no-op
    # recompute the pruned narrowphase on world 0 for accounting
    dw = jax.tree.map(
        lambda x: x[0] if hasattr(x, 'shape') and x.ndim >= 1 and
        x.shape[0] == dd.qpos.shape[0] else x, dd)
    im_cand = m.cand_includemargin
    for gi, (t1, t2, idx, slot) in enumerate(m.pair_groups):
      bc, _ = m.bp_groups[gi]
      n = len(idx)
      if not bc or bc >= n:
        continue
      bd_ = collision_driver._bp_pair_dist(
          m, dw, t1, m.pair_geom1[idx], m.pair_geom2[idx])
      im_pair = im_cand[jnp.asarray(slot + np.arange(n, dtype=np.int32))]
      bact = int(jnp.sum(bd_ < im_pair))
      npen = int(jnp.sum(bd_ < jnp.minimum(im_pair, 0.0)))
      print(f'  g{gi} n={n}: bact={bact} npen={npen} bp_cap={bc} '
            f'{"OVER" if npen > bc else ""}')
    print('  ncon_active:', int(dd.ncon_active[0]) if dd.ncon_active.ndim
          else int(dd.ncon_active))

  for i in range(NSTEP):
    d = step(d, jnp.asarray(traj[i % len(traj)]))
  d = jax.block_until_ready(d)
  print(f'after {NSTEP} steps: overflow={int(d.overflow[0])} '
        f'niter={int(d.solver_niter[0])}')
  diag(jax.device_get(d))


if __name__ == '__main__':
  main()
