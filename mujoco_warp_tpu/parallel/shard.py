"""Multi-chip world sharding: mesh + data-parallel step utilities.

TPU-native counterpart of the reference's (absent) distribution story
(SURVEY.md §2 parallelism inventory, §5.8): physics worlds are
embarrassingly parallel, so scale-out is pure data parallelism — the
batched ``Data`` shards on its leading world axis over a 1-D
``jax.sharding.Mesh``, the ``Model`` replicates, and the jitted step
emits zero collectives; only benchmark metric reductions (converged
count, max solver iterations) ride ICI via psum/pmax.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mujoco_warp_tpu import types


def make_world_mesh(devices: Optional[Sequence] = None,
                    n_devices: Optional[int] = None) -> Mesh:
  """1-D device mesh over the ``world`` axis."""
  if devices is None:
    devices = jax.devices()
    if n_devices is not None:
      devices = devices[:n_devices]
  return Mesh(np.asarray(devices), axis_names=('world',))


def world_sharding(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P('world'))


def shard_data(d: types.Data, mesh: Mesh) -> types.Data:
  """Place a batched Data with its leading world axis sharded over the
  mesh.  nworld must divide the device count evenly (static shapes)."""
  ws = world_sharding(mesh)
  return jax.tree.map(lambda x: jax.device_put(x, ws), d)


def sharded_step_fn(m: types.Model, with_metrics: bool = True):
  """Jitted data-parallel step over a sharded Data.

  Returns ``step(d) -> d`` (or ``(d, (converged, max_niter))`` with
  metrics).  The physics emits no collectives — worlds never communicate;
  metric reductions are the only cross-shard ops.
  """
  from mujoco_warp_tpu.ops import forward as fwd

  def step(d: types.Data):
    d = fwd.step(m, d)
    if not with_metrics:
      return d
    finite = jnp.all(jnp.isfinite(d.qpos), axis=-1)
    converged = jnp.sum(finite.astype(jnp.int32))
    max_niter = jnp.max(d.solver_niter)
    return d, (converged, max_niter)

  return jax.jit(step)
