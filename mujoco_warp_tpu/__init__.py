"""mujoco_warp_tpu: a TPU-native batched MuJoCo physics engine.

Same capabilities as google-deepmind/mujoco_warp, re-designed TPU-first:
JAX/XLA compute with static shapes, vmap world-batching, mesh sharding for
scale-out, and Pallas kernels on the hot paths.
"""

from mujoco_warp_tpu import types
from mujoco_warp_tpu.ops.forward import (
    euler,
    forward,
    fwd_acceleration,
    fwd_actuation,
    fwd_position,
    fwd_velocity,
    rungekutta4,
    step,
    step1,
    step2,
)
from mujoco_warp_tpu.io import (
    get_data_into,
    make_data,
    put_data,
    put_model,
    reset_data,
)
from mujoco_warp_tpu.types import (
    BiasType,
    ConeType,
    Contact,
    Data,
    DisableBit,
    DynType,
    EnableBit,
    EqType,
    GainType,
    GeomType,
    IntegratorType,
    JointType,
    Model,
    Option,
    SensorType,
    SolverType,
    Statistic,
    TrnType,
)

__version__ = '0.1.0'
