"""Multi-device sharding tests: 8-device mesh step == single-device step.

The reference has no multi-GPU support (SURVEY §2 distribution row); the
TPU build scales worlds over a `jax.sharding.Mesh`. These tests validate
on the 8 virtual CPU devices (conftest) that (a) the sharded batched step
produces the same trajectory as the unsharded one, (b) output sharding is
preserved (no accidental gather to one device), and (c) the metric
reduction collective works.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mujoco_warp_tpu import io, models
from mujoco_warp_tpu.ops import forward as fwd


@pytest.fixture(scope='module')
def case():
  mjm, mjd, m, d1 = models.fixture('constraints.xml', qpos_noise=0.2,
                                   qvel_noise=0.3, nstep=2)
  nworld = 16
  d = io.make_data(m, nworld=nworld)
  rng = np.random.default_rng(3)
  qpos = np.tile(np.asarray(d1.qpos), (nworld, 1))
  qpos = qpos + 0.05 * rng.standard_normal(qpos.shape).astype(np.float32)
  d = d.replace(qpos=jnp.asarray(qpos))
  return m, d


def test_sharded_step_matches_single_device(case):
  m, d = case
  assert len(jax.devices()) >= 8, 'conftest must force 8 host devices'
  mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=('world',))
  world_sharding = NamedSharding(mesh, P('world'))

  step = jax.jit(lambda dd: fwd.step(m, dd))

  # unsharded reference trajectory (all worlds on device 0)
  d_ref = d
  for _ in range(3):
    d_ref = step(d_ref)
  d_ref = jax.block_until_ready(d_ref)

  # sharded trajectory
  d_sh = jax.tree.map(lambda x: jax.device_put(x, world_sharding), d)
  for _ in range(3):
    d_sh = step(d_sh)
  d_sh = jax.block_until_ready(d_sh)

  # fp32 reduction order differs at shard boundaries; bound the drift
  # tightly but not bitwise over the 3 chaotic contact steps
  np.testing.assert_allclose(np.asarray(d_sh.qpos), np.asarray(d_ref.qpos),
                             atol=1e-5, rtol=1e-4)
  np.testing.assert_allclose(np.asarray(d_sh.qvel), np.asarray(d_ref.qvel),
                             atol=1e-5, rtol=1e-4)
  # worlds must stay sharded over the mesh after the step
  assert d_sh.qpos.sharding.is_equivalent_to(world_sharding,
                                             d_sh.qpos.ndim), (
      f'output lost world sharding: {d_sh.qpos.sharding}')


def test_sharded_metric_reduction(case):
  m, d = case
  mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=('world',))
  world_sharding = NamedSharding(mesh, P('world'))
  d = jax.tree.map(lambda x: jax.device_put(x, world_sharding), d)

  @jax.jit
  def step_and_reduce(dd):
    dd = fwd.step(m, dd)
    finite = jnp.all(jnp.isfinite(dd.qpos), axis=-1)
    return dd, jnp.sum(finite.astype(jnp.int32)), jnp.max(dd.solver_niter)

  with mesh:
    d_out, converged, max_niter = step_and_reduce(d)
  jax.block_until_ready(d_out)
  assert int(converged) == d_out.qpos.shape[0]
  assert int(max_niter) >= 0


def test_graft_dryrun_entrypoint():
  """The driver-invoked dryrun must pass in-process on this 8-dev host."""
  import __graft_entry__ as g
  g.dryrun_multichip(8)
