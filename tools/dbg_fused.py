"""Debug driver: fused lanes-last path vs general path (CPU interpret)."""

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import benchmarks, io
from mujoco_warp_tpu.ops import forward as fwd
from mujoco_warp_tpu.pallas import fused

W = 128


def main():
  mjm = benchmarks.load_humanoid_benchmark()
  m = io.put_model(mjm, nconmax=24)
  assert fused.supported_features(m), 'humanoid must be fused-supported'
  d = io.make_data(m, nworld=W)
  rng = np.random.default_rng(0)
  qpos = np.array(d.qpos) + 0.02 * rng.standard_normal(
      d.qpos.shape).astype(np.float32)
  qvel = 0.1 * rng.standard_normal(d.qvel.shape).astype(np.float32)
  ctrl = 0.2 * rng.standard_normal((W, m.nu)).astype(np.float32)
  d = d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
                ctrl=jnp.asarray(ctrl))

  # ---- K1 vs general position stages
  st = fused.to_lane(m, d)
  k1 = fused._k1_call(m, st.qpos, st.qvel, interpret=True)
  qM, qLD, bias, cdof = k1[:4]

  from mujoco_warp_tpu.ops import collision_driver, smooth
  def pos_stage(dd):
    dd = smooth.kinematics(m, dd)
    dd = smooth.com_pos(m, dd)
    dd = smooth.crb(m, dd)
    dd = smooth.com_vel(m, dd)
    dd = smooth.factor_m(m, dd)
    dd = smooth.rne(m, dd)
    return dd
  dref = jax.jit(jax.vmap(pos_stage))(d)

  def cmp(name, lane, ref, tol=2e-5):
    lane = np.asarray(lane)
    ref = np.moveaxis(np.asarray(ref).reshape(W, -1), 0, -1)
    err = np.max(np.abs(lane - ref)) / max(1.0, np.max(np.abs(ref)))
    print(f'{name:12s} err={err:.2e}', 'OK' if err < tol else 'FAIL')
    return err < tol

  ok = True
  ok &= cmp('qM', qM, dref.qM)
  ok &= cmp('bias', bias, dref.qfrc_bias)
  ok &= cmp('cdof', cdof, dref.cdof)

  # compacted contacts vs the general compaction path
  dd0 = io.make_data(m, nworld=W)
  dd0 = dd0.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
  dd0 = jax.jit(jax.vmap(lambda x: collision_driver.collision(
      m, smooth.com_pos(m, smooth.kinematics(m, x)))))(dd0)
  compact = (fused._compact_xla if m.con_compact
             else fused._identity_con_xla)
  con, _over = compact(m, k1[4], k1[5], k1[6], k1[7], k1[4].dtype)
  ok &= cmp('slot dist', con['dist'], dd0.contact.dist, tol=1e-4)

  # ---- full fused step vs general step
  d_gen = jax.jit(lambda dd: fwd.step(m, dd))(d)
  st_f = fused.step_lane(m, st, interpret=True)
  ok &= cmp('qacc', st_f.qacc, d_gen.qacc, tol=3e-3)
  ok &= cmp('qvel', st_f.qvel, d_gen.qvel, tol=3e-3)
  ok &= cmp('qpos', st_f.qpos, d_gen.qpos, tol=1e-5)
  print('niter fused', np.asarray(st_f.solver_niter)[0, :5],
        'general', np.asarray(d_gen.solver_niter)[:5])
  print('ALL OK' if ok else 'FAILURES PRESENT')


if __name__ == '__main__':
  main()
