"""Pallas solver megakernel vs the jnp reference solver (interpret mode).

The analog of the reference's `--verify_cuda`/interpret test strategy
(SURVEY §5.2): the Pallas kernel runs in interpreter mode on CPU and must
agree with the reference-equivalent jnp Newton solver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_warp_tpu import models
from mujoco_warp_tpu.ops import forward as fwd, solver
from mujoco_warp_tpu.pallas import solver as psolver
from tests.oracle import assert_close


@pytest.mark.parametrize('fname,kw', [
    ('spheres.xml', dict(qvel_noise=0.5, nstep=20)),
    ('constraints.xml', dict(qpos_noise=0.3, qvel_noise=0.5, nstep=3)),
    # elliptic cones: condim 1/3/4/6 zoo -> multiple per-condim elliptic
    # groups (cone blocks in H + cone linesearch segments)
    ('spheres.xml', dict(qvel_noise=0.5, nstep=20,
                         overrides=('opt.cone=1',))),
    # elliptic alongside equality/limit/friction head rows
    ('constraints.xml', dict(qpos_noise=0.3, qvel_noise=0.5, nstep=3,
                             overrides=('opt.cone=1',))),
])
def test_pallas_vs_jnp(fname, kw):
  mjm, mjd, m, d = models.fixture(fname, **kw)
  W = psolver.TILE_W
  db = jax.tree.map(lambda x: jnp.broadcast_to(x, (W,) + x.shape), d)
  rng = np.random.default_rng(0)
  db = db.replace(
      qvel=db.qvel + 0.02 * jnp.asarray(
          rng.standard_normal((W, mjm.nv)).astype(np.float32)))

  pre = jax.jit(jax.vmap(lambda x: fwd.fwd_acceleration(m, fwd.fwd_actuation(
      m, fwd.fwd_velocity(m, fwd.fwd_position(m, x))))))
  db = jax.block_until_ready(pre(db))

  ref = jax.jit(jax.vmap(lambda x: solver.solve(m, x)))(db)
  out = jax.jit(lambda dd: psolver.solve_batched(m, dd, interpret=True))(db)

  assert_close(out.qacc, ref.qacc, 'qacc', atol=5e-3, rtol=5e-3)
  assert_close(out.qfrc_constraint, ref.qfrc_constraint,
               'qfrc_constraint', atol=5e-2, rtol=5e-2)


def test_pallas_big_path(monkeypatch):
  """Loop-form (fori over scratch) kernels vs the jnp solver.

  The big path normally engages beyond nefc*nv ~ 12k (compile scale);
  forcing the threshold down exercises the same code on a small scene in
  interpret mode."""
  monkeypatch.setattr(psolver, '_UNROLL_LIMIT', 1)
  mjm, mjd, m, d = models.fixture('spheres.xml', qvel_noise=0.5, nstep=20)
  assert psolver._use_big(m)
  W = psolver.TILE_W
  db = jax.tree.map(lambda x: jnp.broadcast_to(x, (W,) + x.shape), d)
  rng = np.random.default_rng(0)
  db = db.replace(
      qvel=db.qvel + 0.02 * jnp.asarray(
          rng.standard_normal((W, mjm.nv)).astype(np.float32)))

  pre = jax.jit(jax.vmap(lambda x: fwd.fwd_acceleration(m, fwd.fwd_actuation(
      m, fwd.fwd_velocity(m, fwd.fwd_position(m, x))))))
  db = jax.block_until_ready(pre(db))

  ref = jax.jit(jax.vmap(lambda x: solver.solve(m, x)))(db)
  out = jax.jit(lambda dd: psolver.solve_batched(m, dd, interpret=True))(db)

  assert_close(out.qacc, ref.qacc, 'qacc', atol=5e-3, rtol=5e-3)
  assert_close(out.qfrc_constraint, ref.qfrc_constraint,
               'qfrc_constraint', atol=5e-2, rtol=5e-2)


def test_fused_gate_accepts_condim46():
  """condim 4/6 scenes ride the fused path (K4 builds torsion/roll
  pyramid rows; end-to-end parity in tests/test_fused.py)."""
  import mujoco
  from mujoco_warp_tpu import io
  from mujoco_warp_tpu.pallas import fused
  xml = '''<mujoco><worldbody>
  <geom type="plane" size="2 2 .1" condim="6"/>
  <body pos="0 0 0.2"><freejoint/>
    <geom type="sphere" size="0.1" condim="6" mass="0.2"/></body>
  </worldbody></mujoco>'''
  m = io.put_model(mujoco.MjModel.from_xml_string(xml))
  assert fused.supported_features(m)
