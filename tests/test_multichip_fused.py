"""Multi-device sharding of the fused lanes-last path.

The FusedState layout is (rows, nworld) — worlds ride the 128-wide
vector lanes.  Scaling out means sharding that lane axis over a device
mesh: each device owns a contiguous block of whole 128-lane tiles and
runs the identical Pallas pipeline on its local shard with no
cross-device communication (worlds are independent; the reference has
no multi-GPU analog, SURVEY §2 distribution row).  `shard_map` is the
right seam: `pl.pallas_call`'s grid is `(W_local // TILE_W,)`, so the
per-device shard must be a whole number of tiles.

Runs on the 8 virtual CPU devices (conftest) in Pallas interpret mode —
the same strategy as tests/test_fused.py.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mujoco_warp_tpu import io
from mujoco_warp_tpu.pallas import fused
from mujoco_warp_tpu.pallas.solver import TILE_W

_XML = """
<mujoco>
  <option timestep="0.004"/>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <body pos="0 0 0.15">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="0.3"/>
    </body>
    <body pos="0.25 0 0.3" euler="0 30 0">
      <freejoint/>
      <geom type="capsule" size="0.04 0.09" mass="0.15"/>
    </body>
  </worldbody>
</mujoco>"""

NDEV = 8


@pytest.fixture(scope='module')
def case():
  mjm = mujoco.MjModel.from_xml_string(_XML)
  m = io.put_model(mjm)
  assert fused.supported_features(m), 'scene must pass the fused gate'
  nworld = NDEV * TILE_W  # one 128-lane tile per device
  d = io.make_data(m, nworld=nworld)
  rng = np.random.default_rng(7)
  d = d.replace(
      qpos=d.qpos + 0.01 * jnp.asarray(
          rng.standard_normal(d.qpos.shape).astype(np.float32)),
      qvel=0.1 * jnp.asarray(
          rng.standard_normal(d.qvel.shape).astype(np.float32)))
  return m, fused.to_lane(m, d)


def test_fused_step_lane_sharded_matches_unsharded(case):
  m, st0 = case
  assert len(jax.devices()) >= NDEV, 'conftest must force 8 host devices'
  mesh = Mesh(np.asarray(jax.devices()[:NDEV]), axis_names=('world',))
  lane = P(None, 'world')  # every FusedState array is (rows, nworld)
  spec = jax.tree.map(lambda _: lane, st0)

  def local_step(st):
    # per-device body: full fused pipeline on the local lane shard
    return fused.step_lane(m, st, interpret=True)

  # check_vma=False: pallas_call out_shapes carry no vma metadata
  sharded_step = jax.jit(shard_map(local_step, mesh=mesh, in_specs=(spec,),
                                   out_specs=spec, check_vma=False))

  ref = st0
  for _ in range(2):
    ref = fused.step_lane(m, ref, interpret=True)
  ref = jax.block_until_ready(ref)

  st = jax.tree.map(
      lambda x: jax.device_put(x, NamedSharding(mesh, lane)), st0)
  for _ in range(2):
    st = sharded_step(st)
  st = jax.block_until_ready(st)

  # identical tile boundaries (128 lanes/device) -> identical arithmetic
  np.testing.assert_array_equal(np.asarray(st.qpos), np.asarray(ref.qpos))
  np.testing.assert_array_equal(np.asarray(st.qvel), np.asarray(ref.qvel))
  np.testing.assert_array_equal(np.asarray(st.solver_niter),
                                np.asarray(ref.solver_niter))
  # outputs must stay lane-sharded over the mesh (no gather to one device)
  want = NamedSharding(mesh, lane)
  assert st.qpos.sharding.is_equivalent_to(want, st.qpos.ndim), (
      f'output lost lane sharding: {st.qpos.sharding}')


def test_fused_sharded_rollout_with_reduction(case):
  """jit(scan(step_lane)) + psum-style convergence metric over the mesh —
  the shape a distributed RL training loop consumes."""
  m, st0 = case
  mesh = Mesh(np.asarray(jax.devices()[:NDEV]), axis_names=('world',))
  lane = P(None, 'world')
  spec = jax.tree.map(lambda _: lane, st0)

  def local_roll(st):
    def body(s, _):
      return fused.step_lane(m, s, interpret=True), ()

    st, _ = jax.lax.scan(body, st, None, length=2)
    ok = (st.overflow[0] == 0).astype(jnp.int32)
    n_ok = jax.lax.psum(jnp.sum(ok), 'world')
    return st, n_ok

  roll = jax.jit(shard_map(local_roll, mesh=mesh, in_specs=(spec,),
                           out_specs=(spec, P()), check_vma=False))
  st = jax.tree.map(
      lambda x: jax.device_put(x, NamedSharding(mesh, lane)), st0)
  st, n_ok = roll(st)
  jax.block_until_ready(st)
  assert int(n_ok) == NDEV * TILE_W
