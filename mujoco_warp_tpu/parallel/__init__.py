"""Multi-chip parallelism utilities (world-axis data parallelism)."""

from mujoco_warp_tpu.parallel.shard import (make_world_mesh, shard_data,
                                            sharded_step_fn,
                                            world_sharding)

__all__ = ['make_world_mesh', 'shard_data', 'sharded_step_fn',
           'world_sharding']
