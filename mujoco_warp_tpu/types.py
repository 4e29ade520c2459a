"""Core data model: enums, Option, Model, Data, Contact.

TPU-native counterpart of the reference's data model
(reference: mujoco_warp/_src/types.py:119-2553).  Differences by design:

* ``Model``/``Data`` are JAX pytrees (frozen dataclasses).  Arrays that feed
  compute are ``jax.Array`` leaves; sizes, index tables and type tables are
  static aux data (numpy) driving trace-time specialization — the analog of
  the reference's host-side precompute in ``put_model`` (io.py:287).
* ``Data`` describes ONE world.  Batching over ``nworld`` is ``jax.vmap`` at
  the public API layer, and scale-out is `nworld`-axis sharding over a device
  mesh (reference instead launches every kernel with ``dim=(nworld, ...)``).
* All shapes are static.  Contacts live in a fixed per-world candidate buffer
  derived from the model's filtered geom-pair list, masked by distance —
  replacing the reference's cross-world atomic slot allocator
  (collision_core.py:214) which would need atomics TPUs don't have.
* Matrices are dense and padded (mass matrix ``(nv, nv)``, Jacobians
  ``(nefc, nv)``) so factorizations and products map onto the MXU.

Enum values mirror MuJoCo's public C enums (verified against mujoco 3.10).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Optional, Tuple

import jax
import numpy as np

from mujoco_warp_tpu.utils.structs import field, pytree_dataclass

# Convenience alias: engine arrays are jax Arrays; static tables are numpy.
Array = jax.Array


class DisableBit(enum.IntFlag):
  """mjtDisableBit — disable default feature bitflags."""

  CONSTRAINT = 1 << 0
  EQUALITY = 1 << 1
  FRICTIONLOSS = 1 << 2
  LIMIT = 1 << 3
  CONTACT = 1 << 4
  SPRING = 1 << 5
  DAMPER = 1 << 6
  GRAVITY = 1 << 7
  CLAMPCTRL = 1 << 8
  WARMSTART = 1 << 9
  FILTERPARENT = 1 << 10
  ACTUATION = 1 << 11
  REFSAFE = 1 << 12
  SENSOR = 1 << 13
  MIDPHASE = 1 << 14
  EULERDAMP = 1 << 15
  AUTORESET = 1 << 16
  NATIVECCD = 1 << 17
  ISLAND = 1 << 18
  MULTICCD = 1 << 19


class EnableBit(enum.IntFlag):
  """mjtEnableBit — enable optional feature bitflags."""

  OVERRIDE = 1 << 0
  ENERGY = 1 << 1
  FWDINV = 1 << 2
  INVDISCRETE = 1 << 3
  SLEEP = 1 << 4
  DIAGEXACT = 1 << 5


class JointType(enum.IntEnum):
  FREE = 0
  BALL = 1
  SLIDE = 2
  HINGE = 3

  @property
  def dof_width(self) -> int:
    return {0: 6, 1: 3, 2: 1, 3: 1}[self.value]

  @property
  def qpos_width(self) -> int:
    return {0: 7, 1: 4, 2: 1, 3: 1}[self.value]


class GeomType(enum.IntEnum):
  PLANE = 0
  HFIELD = 1
  SPHERE = 2
  CAPSULE = 3
  ELLIPSOID = 4
  CYLINDER = 5
  BOX = 6
  MESH = 7
  SDF = 8


class TrnType(enum.IntEnum):
  JOINT = 0
  JOINTINPARENT = 1
  SLIDERCRANK = 2
  TENDON = 3
  SITE = 4
  BODY = 5


class DynType(enum.IntEnum):
  NONE = 0
  INTEGRATOR = 1
  FILTER = 2
  FILTEREXACT = 3
  MUSCLE = 4
  DCMOTOR = 5
  USER = 6


class GainType(enum.IntEnum):
  FIXED = 0
  AFFINE = 1
  MUSCLE = 2
  DCMOTOR = 3
  USER = 4


class BiasType(enum.IntEnum):
  NONE = 0
  AFFINE = 1
  MUSCLE = 2
  DCMOTOR = 3
  USER = 4


class EqType(enum.IntEnum):
  CONNECT = 0
  WELD = 1
  JOINT = 2
  TENDON = 3
  FLEX = 4
  FLEXVERT = 5
  FLEXSTRAIN = 6
  DISTANCE = 7


class WrapType(enum.IntEnum):
  NONE = 0
  JOINT = 1
  PULLEY = 2
  SITE = 3
  SPHERE = 4
  CYLINDER = 5


class SolverType(enum.IntEnum):
  PGS = 0  # unsupported (as in reference)
  CG = 1
  NEWTON = 2


class IntegratorType(enum.IntEnum):
  EULER = 0
  RK4 = 1
  IMPLICIT = 2
  IMPLICITFAST = 3


class ConeType(enum.IntEnum):
  PYRAMIDAL = 0
  ELLIPTIC = 1


class BroadphaseType(enum.IntEnum):
  """Broadphase algorithm selection (reference: types.py BroadphaseType)."""

  NXN = 0
  SAP = 1


class Stage(enum.IntEnum):
  """Sensor pipeline stage passed to the user sensor callback
  (reference: types.py Stage)."""

  POS = 0
  VEL = 1
  ACC = 2


@dataclasses.dataclass(frozen=True)
class Callback:
  """User hooks for custom physics behavior (reference: types.py:956).

  Functional divergence from the reference (whose hooks mutate Data in
  place): every hook takes ``(m, d)`` — the sensor hook ``(m, d, stage)``
  — and RETURNS the updated single-world Data; hooks run inside jit, so
  they must be JAX-traceable.  Hook -> field written:

    passive        Data.qfrc_passive
    control        Data.ctrl
    act_dyn        Data.act_dot
    act_gain       Data.actuator_force
    act_bias       Data.actuator_force
    sensor         Data.sensordata
    contactfilter  Data.contact
  """

  passive: Any = None
  control: Any = None
  act_dyn: Any = None
  act_gain: Any = None
  act_bias: Any = None
  sensor: Any = None
  contactfilter: Any = None


class ObjType(enum.IntEnum):
  UNKNOWN = 0
  BODY = 1
  XBODY = 2
  JOINT = 3
  GEOM = 5
  SITE = 6
  CAMERA = 7


class SensorType(enum.IntEnum):
  TOUCH = 0
  ACCELEROMETER = 1
  VELOCIMETER = 2
  GYRO = 3
  FORCE = 4
  TORQUE = 5
  MAGNETOMETER = 6
  RANGEFINDER = 7
  CAMPROJECTION = 8
  JOINTPOS = 9
  JOINTVEL = 10
  TENDONPOS = 11
  TENDONVEL = 12
  ACTUATORPOS = 13
  ACTUATORVEL = 14
  ACTUATORFRC = 15
  JOINTACTFRC = 16
  TENDONACTFRC = 17
  BALLQUAT = 18
  BALLANGVEL = 19
  JOINTLIMITPOS = 20
  JOINTLIMITVEL = 21
  JOINTLIMITFRC = 22
  TENDONLIMITPOS = 23
  TENDONLIMITVEL = 24
  TENDONLIMITFRC = 25
  FRAMEPOS = 26
  FRAMEQUAT = 27
  FRAMEXAXIS = 28
  FRAMEYAXIS = 29
  FRAMEZAXIS = 30
  FRAMELINVEL = 31
  FRAMEANGVEL = 32
  FRAMELINACC = 33
  FRAMEANGACC = 34
  SUBTREECOM = 35
  SUBTREELINVEL = 36
  SUBTREEANGMOM = 37
  INSIDESITE = 38
  GEOMDIST = 39
  GEOMNORMAL = 40
  GEOMFROMTO = 41
  CONTACT = 42
  E_POTENTIAL = 43
  E_KINETIC = 44
  CLOCK = 45
  TACTILE = 46


class OverflowType(enum.IntFlag):
  """Per-world overflow accounting (reference: types.py:149-172).

  On TPU shapes are static, so "overflow" means a fixed-capacity buffer
  saturated and results were truncated/masked rather than corrupted.
  """

  CONTACT = 1 << 0
  CONSTRAINT = 1 << 1
  SOLVER = 1 << 2


# Treat MuJoCo solref/solimp semantics: standard (timeconst, dampratio) or
# direct (negative) parametrization.
NREF = 2
NIMP = 5
# sleeping (reference types.py:29): minimum quiescent steps before sleeping.
# Value mirrors mujoco.mjMINAWAKE (types.py stays mujoco-import-free).
MJ_MINAWAKE = 10
K_AWAKE = -(1 + MJ_MINAWAKE)  # tree_asleep value for a fully awake tree


@pytree_dataclass
class Option:
  """Physics options (reference: mujoco_warp/_src/types.py:833-898).

  Scalar knobs that feed kernels stay as arrays so they can be swept without
  recompiling; anything that changes program structure is static.
  """

  timestep: Array  # ()
  impratio: Array  # ()
  tolerance: Array  # ()
  ls_tolerance: Array  # ()
  gravity: Array  # (3,)
  wind: Array  # (3,)
  magnetic: Array  # (3,)
  density: Array  # ()
  viscosity: Array  # ()
  sleep_tolerance: Array  # () velocity threshold for tree sleep
  # contact override (EnableBit.OVERRIDE)
  o_margin: Array  # ()
  o_solref: Array  # (NREF,)
  o_solimp: Array  # (NIMP,)
  o_friction: Array  # (5,)
  # static (change → recompile)
  integrator: int = field(static=True, default=IntegratorType.EULER)
  cone: int = field(static=True, default=ConeType.PYRAMIDAL)
  solver: int = field(static=True, default=SolverType.NEWTON)
  iterations: int = field(static=True, default=100)
  ls_iterations: int = field(static=True, default=50)
  disableflags: int = field(static=True, default=0)
  enableflags: int = field(static=True, default=0)
  broadphase: int = field(static=True, default=BroadphaseType.NXN)
  # run collision detection every step (reference: run_collision_detection)
  run_collision_detection: bool = field(static=True, default=True)
  # warn on per-world overflow bits at readback (reference: warn_overflow,
  # types.py:869; set from <custom><numeric name="warn_overflow">)
  warn_overflow: bool = field(static=True, default=True)
  ccd_iterations: int = field(static=True, default=50)
  sdf_iterations: int = field(static=True, default=10)
  sdf_initpoints: int = field(static=True, default=40)


@pytree_dataclass
class Statistic:
  """Model statistics (reference: types.py:919)."""

  meaninertia: Array  # ()


@pytree_dataclass
class Contact:
  """Fixed-capacity per-world contact buffer (reference: types.py:1951).

  ``ncon`` slots are grouped by condim class (static).  Without compaction
  (``Model.nconmax`` unset) slots correspond 1:1 to the model's candidate
  list (collision pair table).  With compaction, active candidates are
  packed per class into ``cap`` slots each step (the TPU replacement for
  the reference's atomic slot allocation, collision_core.py:214).  A slot
  is live iff ``dist < includemargin``; dead slots carry a large positive
  ``dist`` so constraint rows mask out cleanly.
  """

  dist: Array  # (ncon,)
  pos: Array  # (ncon, 3)
  frame: Array  # (ncon, 3, 3) rows: normal, tangent1, tangent2
  includemargin: Array  # (ncon,)
  friction: Array  # (ncon, 5)
  solref: Array  # (ncon, NREF)
  solreffriction: Array  # (ncon, NREF)
  solimp: Array  # (ncon, NIMP)
  # dynamic per-slot identity: geom pair and candidate id (compaction makes
  # these per-world; -1 cand marks an empty slot)
  geom1: Array = None  # (ncon,) int32
  geom2: Array = None  # (ncon,) int32
  cand: Array = None  # (ncon,) int32 candidate slot id, -1 empty
  # static per-slot metadata (condim class layout)
  dim: np.ndarray = field(static=True, default=None)  # (ncon,) condim
  # efc row address of each contact's first constraint row (static layout)
  efc_address: np.ndarray = field(static=True, default=None)  # (ncon,)


@pytree_dataclass
class TreeInfo:
  """Static kinematic-tree traversal structure.

  Computed once in ``put_model`` — the analog of the reference's
  ``body_tree`` levels (io.py) that make FK level-parallel.
  """

  # tuple over depth levels; each entry is an int array of body ids
  body_levels: Tuple[np.ndarray, ...] = field(static=True, default=())
  # bodies in reverse topological order grouped by level (for backward pass)
  body_levels_rev: Tuple[np.ndarray, ...] = field(static=True, default=())
  # (nv, nv) bool: mask[i, j] = dof j is dof i or an ancestor of dof i
  ancestor_mask: np.ndarray = field(static=True, default=None)
  # (nbody, nbody) bool: subtree_mask[i, j] = body j is in subtree of body i
  subtree_mask: np.ndarray = field(static=True, default=None)
  # (nbody, nv) bool: dof j actuates body i (j on i's ancestor chain)
  body_dof_mask: np.ndarray = field(static=True, default=None)
  # (nv, nbody) bool: body j is in the subtree of dof i's body
  dof_subtree_mask: np.ndarray = field(static=True, default=None)
  # (nv, nv) bool: dofs whose velocity precedes dof i (for cdof_dot)
  cdofdot_mask: np.ndarray = field(static=True, default=None)
  # tree-blocked mass-matrix classes (the TPU analog of the reference's
  # per-tree M-block layout, io.py:191-241): tuple of
  # (width, dofadr (ntree_w, width) int32, anc (ntree_w, width, width) bool)
  # — one entry per distinct tree width; only populated when
  # Model.m_blocked (many small independent trees, e.g. flex particles)
  block_classes: Tuple[Any, ...] = field(static=True, default=())


@pytree_dataclass
class EfcLayout:
  """Static constraint-row layout (replaces the reference's runtime nefc
  counting with atomics, constraint.py:4870).

  Row order matches MuJoCo C: equality (by eq id) | dof friction | tendon
  friction | joint limits | tendon limits | contacts.  All fields are static
  numpy id/address tables; every row exists every step and inactive rows are
  masked to zero.
  """

  # equality constraints grouped by type: (ids into eq_*, first row address)
  connect_id: np.ndarray = field(static=True, default=None)
  connect_adr: np.ndarray = field(static=True, default=None)
  weld_id: np.ndarray = field(static=True, default=None)
  weld_adr: np.ndarray = field(static=True, default=None)
  joint_id: np.ndarray = field(static=True, default=None)
  joint_adr: np.ndarray = field(static=True, default=None)
  tendon_id: np.ndarray = field(static=True, default=None)
  tendon_adr: np.ndarray = field(static=True, default=None)
  # flex edge equality: (eq ids of type FLEX, first row address per eq)
  flex_id: np.ndarray = field(static=True, default=None)
  flex_adr: np.ndarray = field(static=True, default=None)
  # friction loss rows
  fri_dof_id: np.ndarray = field(static=True, default=None)
  fri_dof_adr: np.ndarray = field(static=True, default=None)
  fri_ten_id: np.ndarray = field(static=True, default=None)
  fri_ten_adr: np.ndarray = field(static=True, default=None)
  # limit rows
  lim_jnt_id: np.ndarray = field(static=True, default=None)
  lim_jnt_adr: np.ndarray = field(static=True, default=None)
  lim_ten_id: np.ndarray = field(static=True, default=None)
  lim_ten_adr: np.ndarray = field(static=True, default=None)
  # per-row static type/id tables (ConstraintType analog; contacts included)
  efc_type: np.ndarray = field(static=True, default=None)  # (nefc,)
  efc_id: np.ndarray = field(static=True, default=None)  # (nefc,)


class ConstraintType(enum.IntEnum):
  """mjtConstraint — constraint row types (reference: types.py)."""

  EQUALITY = 0
  FRICTION_DOF = 1
  FRICTION_TENDON = 2
  LIMIT_JOINT = 3
  LIMIT_TENDON = 4
  CONTACT_FRICTIONLESS = 5
  CONTACT_PYRAMIDAL = 6
  CONTACT_ELLIPTIC = 7


@pytree_dataclass
class Model:
  """Device-resident model (reference: mujoco_warp/_src/types.py:979).

  Static index/type tables are numpy (trace-time constants); physical
  parameters are jax arrays.  Fields follow MuJoCo naming so the reference's
  users find everything where they expect it.
  """

  # ------------------------------------------------------------------ sizes
  nq: int = field(static=True, default=0)
  nv: int = field(static=True, default=0)
  nu: int = field(static=True, default=0)
  na: int = field(static=True, default=0)
  nbody: int = field(static=True, default=0)
  njnt: int = field(static=True, default=0)
  ngeom: int = field(static=True, default=0)
  nsite: int = field(static=True, default=0)
  ncam: int = field(static=True, default=0)
  nlight: int = field(static=True, default=0)
  nmocap: int = field(static=True, default=0)
  neq: int = field(static=True, default=0)
  ntendon: int = field(static=True, default=0)
  nwrap: int = field(static=True, default=0)
  nsensor: int = field(static=True, default=0)
  nsensordata: int = field(static=True, default=0)
  nhistory: int = field(static=True, default=0)
  # constraint-row layout (static): counts of equality/friction/limit rows
  ne: int = field(static=True, default=0)
  nf: int = field(static=True, default=0)
  nl: int = field(static=True, default=0)
  nefc: int = field(static=True, default=0)  # total rows incl. contacts
  ncon: int = field(static=True, default=0)  # contact slots in Data
  ncand: int = field(static=True, default=0)  # candidate contact slots
  # compaction classes: ((dim, cap, cand_idx, slot_start), ...) — per condim
  # class, `cap` compact slots packed from the `cand_idx` candidate slots
  # (reference capacity knob analog: io.py:1316 `_default_nconmax`)
  con_classes: Tuple[Any, ...] = field(static=True, default=())
  con_compact: bool = field(static=True, default=False)
  # tree-blocked mass matrix: M/LD live in Data.qM_blk/qLD_blk per-tree
  # blocks instead of dense (nv, nv) — the TPU-native representation for
  # particle systems (cloth: 900 independent 3-dof trees) where the dense
  # O(nv^2) build + O(nv^3) factor would dominate (reference: per-tree
  # M-block layout io.py:191-241 + scalar Cholesky smooth.py:1341)
  m_blocked: bool = field(static=True, default=False)
  # compact-chain constraint Jacobian: efc_J is (nefc, efc_K) values with
  # per-row dof indices in Data.efc_Jidx instead of dense (nefc, nv) — for
  # big-nv scenes where every row touches few dofs (flex edges: 6, vertex
  # contacts: <= 2 chains).  CG-only (Newton needs the dense H).
  # Reference analog: CSR sparse J (constraint.py jacobian=sparse)
  efc_compact: bool = field(static=True, default=False)
  efc_K: int = field(static=True, default=0)
  # (nbody, chain_K) int32 ancestor-chain dof ids per body, padded with nv
  body_chain: np.ndarray = field(static=True, default=None)
  chain_K: int = field(static=True, default=0)

  opt: Option = None
  stat: Statistic = None
  tree: TreeInfo = None
  efc: EfcLayout = None

  # ------------------------------------------------------------------ qpos
  qpos0: Array = None  # (nq,)
  qpos_spring: Array = None  # (nq,)

  # ------------------------------------------------------------------ body
  body_parentid: np.ndarray = field(static=True, default=None)
  body_rootid: np.ndarray = field(static=True, default=None)
  ntree: int = field(static=True, default=0)
  body_weldid: np.ndarray = field(static=True, default=None)
  body_mocapid: np.ndarray = field(static=True, default=None)
  body_jntadr: np.ndarray = field(static=True, default=None)
  body_jntnum: np.ndarray = field(static=True, default=None)
  body_dofadr: np.ndarray = field(static=True, default=None)
  body_dofnum: np.ndarray = field(static=True, default=None)
  body_geomadr: np.ndarray = field(static=True, default=None)
  body_geomnum: np.ndarray = field(static=True, default=None)
  body_treeid: np.ndarray = field(static=True, default=None)
  tree_sleep_policy: np.ndarray = field(static=True, default=None)
  # names of per-world batched fields (io.batch_model); ('opt.gravity', ...)
  batch_fields: Tuple[str, ...] = field(static=True, default=())

  # ------------------------------------------------------------------ flex
  # deformables (reference types.py flex fields; v1 scope: particle
  # flexes — every vertex is a centered body with 3 world-aligned slide
  # dofs, which is what flexcomp grids compile to)
  nflex: int = field(static=True, default=0)
  nflexvert: int = field(static=True, default=0)
  nflexedge: int = field(static=True, default=0)
  nflexelem: int = field(static=True, default=0)
  flex_dim: np.ndarray = field(static=True, default=None)
  flex_interp: np.ndarray = field(static=True, default=None)
  flex_vertadr: np.ndarray = field(static=True, default=None)
  flex_vertnum: np.ndarray = field(static=True, default=None)
  flex_edgeadr: np.ndarray = field(static=True, default=None)
  flex_edgenum: np.ndarray = field(static=True, default=None)
  flex_vertbodyid: np.ndarray = field(static=True, default=None)
  flex_edge: np.ndarray = field(static=True, default=None)
  flex_edgeflap: np.ndarray = field(static=True, default=None)
  flex_elem: np.ndarray = field(static=True, default=None)
  flex_elemadr: np.ndarray = field(static=True, default=None)
  flex_elemnum: np.ndarray = field(static=True, default=None)
  flex_elemdataadr: np.ndarray = field(static=True, default=None)
  flex_elemedge: np.ndarray = field(static=True, default=None)
  flex_elemedgeadr: np.ndarray = field(static=True, default=None)
  flex_stiffnessadr: np.ndarray = field(static=True, default=None)
  flex_bendingadr: np.ndarray = field(static=True, default=None)
  flex_edgeequality: np.ndarray = field(static=True, default=None)
  # per-vertex dof address of the 3 slide dofs (particle fast path);
  # -1 for interpolated (trilinear) vertices
  flex_vert_dofadr: np.ndarray = field(static=True, default=None)
  # interpolated (nodal/trilinear) flex vertices (reference: flex_interp
  # + eval_basis_trilinear smooth.py:256): static tables mapping each
  # interpolated vertex to its flex's 8 corner node bodies
  flex_iv_ids: np.ndarray = field(static=True, default=None)  # (nivert,)
  flex_iv_W: np.ndarray = field(static=True, default=None)  # (nivert, 8)
  flex_iv_body: np.ndarray = field(static=True, default=None)  # (nivert, 8)
  flex_iv_dof: np.ndarray = field(static=True, default=None)  # (nivert, 8)
  # per-interp-flex corotational cell elasticity (reference:
  # passive.py:822 `_flex_passive_interp`): 8 node bodies/dofs, rest
  # node positions, the 24x24 cell stiffness, damping
  flex_inode_dof: np.ndarray = field(static=True, default=None)  # (nif, 8)
  flex_inode_body: np.ndarray = field(static=True, default=None)  # (nif, 8)
  flex_inode0: Array = None  # (nif, 8, 3)
  flex_icell_K: Array = None  # (nif, 24, 24)
  flex_idamping: Array = None  # (nif,)
  flex_stiffness: Array = None  # (nflexelem*21,)
  flex_bending: Array = None  # (nflexedge*17,)
  flex_damping: Array = None  # (nflex,)
  flexedge_length0: Array = None  # (nflexedge,)
  flexedge_invweight0: Array = None  # (nflexedge,)
  body_pos: Array = None  # (nbody, 3)
  body_quat: Array = None  # (nbody, 4)
  body_ipos: Array = None  # (nbody, 3)
  body_iquat: Array = None  # (nbody, 4)
  body_mass: Array = None  # (nbody,)
  body_subtreemass: Array = None  # (nbody,)
  body_inertia: Array = None  # (nbody, 3)
  body_invweight0: Array = None  # (nbody, 2)
  body_gravcomp: Array = None  # (nbody,)

  # ------------------------------------------------------------------ joint
  jnt_type: np.ndarray = field(static=True, default=None)
  jnt_qposadr: np.ndarray = field(static=True, default=None)
  jnt_dofadr: np.ndarray = field(static=True, default=None)
  jnt_bodyid: np.ndarray = field(static=True, default=None)
  jnt_limited: np.ndarray = field(static=True, default=None)
  jnt_actfrclimited: np.ndarray = field(static=True, default=None)
  jnt_actgravcomp: np.ndarray = field(static=True, default=None)
  jnt_solref: Array = None  # (njnt, NREF)
  jnt_solimp: Array = None  # (njnt, NIMP)
  jnt_pos: Array = None  # (njnt, 3)
  jnt_axis: Array = None  # (njnt, 3)
  jnt_stiffness: Array = None  # (njnt,)
  jnt_range: Array = None  # (njnt, 2)
  jnt_actfrcrange: Array = None  # (njnt, 2)
  jnt_margin: Array = None  # (njnt,)

  # ------------------------------------------------------------------ dof
  dof_bodyid: np.ndarray = field(static=True, default=None)
  dof_jntid: np.ndarray = field(static=True, default=None)
  dof_parentid: np.ndarray = field(static=True, default=None)
  dof_treeid: np.ndarray = field(static=True, default=None)
  dof_length: np.ndarray = field(static=True, default=None)
  dof_solref: Array = None  # (nv, NREF)
  dof_solimp: Array = None  # (nv, NIMP)
  dof_frictionloss: Array = None  # (nv,)
  dof_armature: Array = None  # (nv,)
  dof_damping: Array = None  # (nv,)
  dof_invweight0: Array = None  # (nv,)

  # ------------------------------------------------------------------ geom
  geom_type: np.ndarray = field(static=True, default=None)
  geom_contype: np.ndarray = field(static=True, default=None)
  geom_conaffinity: np.ndarray = field(static=True, default=None)
  geom_condim: np.ndarray = field(static=True, default=None)
  geom_bodyid: np.ndarray = field(static=True, default=None)
  geom_dataid: np.ndarray = field(static=True, default=None)
  geom_fluid: np.ndarray = field(static=True, default=None)  # (ngeom, 12)
  # per-geom SDF callable for geom type SDF (plugin SDFs), else None
  geom_sdf_fn: Tuple = field(static=True, default=())
  # tactile (taxel) sensors: one static spec per TACTILE sensor —
  # (sensordata adr, taxel geom id, parent weld body id,
  #  verts (nvert, 3), frame (nvert, 3, 3) rows [n, t1, t2],
  #  has_frame, cand geom ids (ncand,), cand geom types (ncand,))
  # (reference: taxel_vertadr/taxel_sensorid types.py:1897 +
  # sensor.py:2181 _sensor_tactile)
  tactile_specs: Tuple = field(static=True, default=())
  geom_priority: np.ndarray = field(static=True, default=None)
  geom_solmix: Array = None  # (ngeom,)
  geom_solref: Array = None  # (ngeom, NREF)
  geom_solimp: Array = None  # (ngeom, NIMP)
  geom_size: Array = None  # (ngeom, 3)
  geom_rbound: Array = None  # (ngeom,)
  geom_aabb: Array = None  # (ngeom, 6) local center+half — broadphase bound
  geom_pos: Array = None  # (ngeom, 3)
  geom_quat: Array = None  # (ngeom, 4)
  geom_friction: Array = None  # (ngeom, 3)
  geom_margin: Array = None  # (ngeom,)
  geom_gap: Array = None  # (ngeom,)

  # ------------------------------------------------------------------ site
  site_bodyid: np.ndarray = field(static=True, default=None)
  site_type: np.ndarray = field(static=True, default=None)  # (nsite,)
  site_pos: Array = None  # (nsite, 3)
  site_quat: Array = None  # (nsite, 4)
  site_size: Array = None  # (nsite, 3)

  # ---------------------------------------------------------- camera / light
  cam_mode: np.ndarray = field(static=True, default=None)
  cam_bodyid: np.ndarray = field(static=True, default=None)
  cam_targetbodyid: np.ndarray = field(static=True, default=None)
  cam_pos: Array = None  # (ncam, 3)
  cam_quat: Array = None  # (ncam, 4)
  cam_poscom0: Array = None  # (ncam, 3)
  cam_pos0: Array = None  # (ncam, 3)
  cam_mat0: Array = None  # (ncam, 3, 3)
  cam_fovy: Array = None  # (ncam,)
  cam_intrinsic: Array = None  # (ncam, 4)
  cam_sensorsize: Array = None  # (ncam, 2)
  cam_resolution: np.ndarray = field(static=True, default=None)
  light_mode: np.ndarray = field(static=True, default=None)
  light_bodyid: np.ndarray = field(static=True, default=None)
  light_targetbodyid: np.ndarray = field(static=True, default=None)
  light_directional: np.ndarray = field(static=True, default=None)
  light_pos: Array = None  # (nlight, 3)
  light_dir: Array = None  # (nlight, 3)
  light_poscom0: Array = None  # (nlight, 3)
  light_pos0: Array = None  # (nlight, 3)
  light_dir0: Array = None  # (nlight, 3)

  # ------------------------------------------------------------------ equality
  eq_type: np.ndarray = field(static=True, default=None)
  eq_obj1id: np.ndarray = field(static=True, default=None)
  eq_obj2id: np.ndarray = field(static=True, default=None)
  eq_objtype: np.ndarray = field(static=True, default=None)
  eq_active0: np.ndarray = field(static=True, default=None)
  eq_solref: Array = None  # (neq, NREF)
  eq_solimp: Array = None  # (neq, NIMP)
  eq_data: Array = None  # (neq, 11)

  # ------------------------------------------------------------------ tendon
  tendon_adr: np.ndarray = field(static=True, default=None)
  tendon_num: np.ndarray = field(static=True, default=None)
  tendon_limited: np.ndarray = field(static=True, default=None)
  tendon_actfrclimited: np.ndarray = field(static=True, default=None)
  tendon_solref_lim: Array = None  # (ntendon, NREF)
  tendon_solimp_lim: Array = None  # (ntendon, NIMP)
  tendon_solref_fri: Array = None  # (ntendon, NREF)
  tendon_solimp_fri: Array = None  # (ntendon, NIMP)
  tendon_range: Array = None  # (ntendon, 2)
  tendon_actfrcrange: Array = None  # (ntendon, 2)
  tendon_margin: Array = None  # (ntendon,)
  tendon_stiffness: Array = None  # (ntendon,)
  tendon_damping: Array = None  # (ntendon,)
  tendon_armature: Array = None  # (ntendon,)
  tendon_frictionloss: Array = None  # (ntendon,)
  tendon_lengthspring: Array = None  # (ntendon, 2)
  tendon_length0: Array = None  # (ntendon,)
  tendon_invweight0: Array = None  # (ntendon,)
  wrap_objid: np.ndarray = field(static=True, default=None)
  wrap_prm: Array = None  # (nwrap,)
  wrap_type: np.ndarray = field(static=True, default=None)

  # ------------------------------------------------------------------ actuator
  actuator_trntype: np.ndarray = field(static=True, default=None)
  actuator_dyntype: np.ndarray = field(static=True, default=None)
  actuator_gaintype: np.ndarray = field(static=True, default=None)
  actuator_biastype: np.ndarray = field(static=True, default=None)
  actuator_trnid: np.ndarray = field(static=True, default=None)
  actuator_actadr: np.ndarray = field(static=True, default=None)
  actuator_actnum: np.ndarray = field(static=True, default=None)
  actuator_ctrllimited: np.ndarray = field(static=True, default=None)
  actuator_forcelimited: np.ndarray = field(static=True, default=None)
  actuator_actlimited: np.ndarray = field(static=True, default=None)
  actuator_actearly: np.ndarray = field(static=True, default=None)
  actuator_dynprm: Array = None  # (nu, 10)
  actuator_gainprm: Array = None  # (nu, 10)
  actuator_biasprm: Array = None  # (nu, 10)
  actuator_ctrlrange: Array = None  # (nu, 2)
  actuator_forcerange: Array = None  # (nu, 2)
  actuator_actrange: Array = None  # (nu, 2)
  actuator_gear: Array = None  # (nu, 6)
  actuator_cranklength: Array = None  # (nu,)
  actuator_acc0: Array = None  # (nu,)
  actuator_lengthrange: Array = None  # (nu, 2)
  actuator_length0: Array = None  # (nu,)

  # ------------------------------------------------------------------ sensor
  sensor_type: np.ndarray = field(static=True, default=None)
  sensor_datatype: np.ndarray = field(static=True, default=None)
  sensor_needstage: np.ndarray = field(static=True, default=None)
  sensor_objtype: np.ndarray = field(static=True, default=None)
  sensor_objid: np.ndarray = field(static=True, default=None)
  sensor_reftype: np.ndarray = field(static=True, default=None)
  sensor_refid: np.ndarray = field(static=True, default=None)
  sensor_dim: np.ndarray = field(static=True, default=None)
  sensor_adr: np.ndarray = field(static=True, default=None)
  sensor_intprm: np.ndarray = field(static=True, default=None)
  sensor_cutoff: Array = None  # (nsensor,)
  # history (delay) metadata — static: (nsample, interp) per channel
  actuator_history: np.ndarray = field(static=True, default=None)
  actuator_historyadr: np.ndarray = field(static=True, default=None)
  actuator_delay: np.ndarray = field(static=True, default=None)
  sensor_history: np.ndarray = field(static=True, default=None)
  sensor_historyadr: np.ndarray = field(static=True, default=None)
  sensor_delay: np.ndarray = field(static=True, default=None)
  sensor_interval: np.ndarray = field(static=True, default=None)

  # ------------------------------------------------------------------ mesh
  mesh_vert: np.ndarray = field(static=True, default=None)  # (nmeshvert, 3)
  mesh_vertadr: np.ndarray = field(static=True, default=None)
  mesh_vertnum: np.ndarray = field(static=True, default=None)
  mesh_face: np.ndarray = field(static=True, default=None)  # (nmeshface, 3)
  mesh_faceadr: np.ndarray = field(static=True, default=None)
  mesh_facenum: np.ndarray = field(static=True, default=None)

  # ----------------------------------------------------------- heightfield
  hfield_adr: np.ndarray = field(static=True, default=None)  # (nhfield,)
  hfield_nrow: np.ndarray = field(static=True, default=None)  # (nhfield,)
  hfield_ncol: np.ndarray = field(static=True, default=None)  # (nhfield,)
  hfield_size: Array = None  # (nhfield, 4) x y ztop zbottom
  hfield_data: Array = None  # (nhfielddata,) normalized heights [0, 1]

  # ------------------------------------------------------- collision tables
  # static candidate geom pairs after contype/conaffinity + parent filtering
  # (reference: io.py nxn pair precompute; collision_driver.py:47)
  pair_geom1: np.ndarray = field(static=True, default=None)  # (npair,)
  pair_geom2: np.ndarray = field(static=True, default=None)  # (npair,)
  # per candidate-contact slot: candidate pair index (slots expand pairs by
  # max contacts per pair type)
  con_pair: np.ndarray = field(static=True, default=None)  # (ncand,)
  # efc row address of each contact slot's first row (static layout)
  con_efc_address: np.ndarray = field(static=True, default=None)  # (ncon,)
  # condim per contact slot (static: slots are grouped by condim class)
  con_dim: np.ndarray = field(static=True, default=None)  # (ncon,)
  # mixed contact params per candidate slot, precomputed at put_model
  # (reference computes these per step in write_contact,
  # collision_core.py:317-473; they are state-independent so the TPU build
  # hoists them to model constants)
  cand_friction: Array = None  # (ncand, 5)
  cand_solref: Array = None  # (ncand, NREF)
  cand_solreffriction: Array = None  # (ncand, NREF)
  cand_solimp: Array = None  # (ncand, NIMP)
  cand_includemargin: Array = None  # (ncand,)
  cand_margin: Array = None  # (ncand,) full margin (incl. gap)
  # narrowphase dispatch groups: tuple of
  # (geomtype1, geomtype2, pair_index_array, contact_slot_start)
  pair_groups: Tuple[Any, ...] = field(static=True, default=())
  # broadphase pruning metadata, aligned with pair_groups: (bp_cap,
  # condim) per group — bp_cap > 0 caps the group's narrowphase at that
  # many prefilter-packed pairs (reference: sap_broadphase + nconmax
  # capacity analysis, collision_driver.py:567 / io.py:1316)
  bp_groups: Tuple[Any, ...] = field(static=True, default=())
  # user hooks (reference: types.py:956 Callback); static — changing
  # callbacks retraces, as with the reference's graph capture
  callback: Any = field(static=True, default=None)
  # per candidate pair: explicit <pair> id (into pair_* override tables) or -1
  pair_explicit: np.ndarray = field(static=True, default=None)

  # explicit <pair> overrides (npair_explicit entries appended to tables)
  pair_dim: np.ndarray = field(static=True, default=None)
  pair_margin: Array = None
  pair_gap: Array = None
  pair_friction: Array = None
  pair_solref: Array = None
  pair_solreffriction: Array = None
  pair_solimp: Array = None


@pytree_dataclass
class Data:
  """Single-world dynamic state (reference: mujoco_warp/_src/types.py:2050).

  The public API batches this with a leading ``nworld`` axis via vmap.
  """

  # ------------------------------------------------------------- input state
  time: Array = None  # ()
  qpos: Array = None  # (nq,)
  qvel: Array = None  # (nv,)
  act: Array = None  # (na,)
  ctrl: Array = None  # (nu,)
  qfrc_applied: Array = None  # (nv,)
  xfrc_applied: Array = None  # (nbody, 6) [torque last: (force, torque)]
  eq_active: Array = None  # (neq,) bool
  mocap_pos: Array = None  # (nmocap, 3)
  mocap_quat: Array = None  # (nmocap, 4)

  # --------------------------------------------------------------- position
  xpos: Array = None  # (nbody, 3)
  xquat: Array = None  # (nbody, 4)
  xmat: Array = None  # (nbody, 3, 3)
  xipos: Array = None  # (nbody, 3)
  ximat: Array = None  # (nbody, 3, 3)
  xanchor: Array = None  # (njnt, 3)
  xaxis: Array = None  # (njnt, 3)
  geom_xpos: Array = None  # (ngeom, 3)
  geom_xmat: Array = None  # (ngeom, 3, 3)
  site_xpos: Array = None  # (nsite, 3)
  site_xmat: Array = None  # (nsite, 3, 3)
  cam_xpos: Array = None  # (ncam, 3)
  cam_xmat: Array = None  # (ncam, 3, 3)
  light_xpos: Array = None  # (nlight, 3)
  light_xdir: Array = None  # (nlight, 3)
  subtree_com: Array = None  # (nbody, 3)
  cinert: Array = None  # (nbody, 6, 6) spatial inertia in com-rooted frame
  cdof: Array = None  # (nv, 6)
  crb: Array = None  # (nbody, 6, 6) composite rigid body inertia
  qM: Array = None  # (nv, nv) dense mass matrix ((0, 0) when m_blocked)
  qLD: Array = None  # (nv, nv) dense Cholesky factor (lower)
  # tree-blocked mass matrix (Model.m_blocked): one (ntree_w, w, w) array
  # per width class in TreeInfo.block_classes order; empty in dense mode
  qM_blk: Tuple[Array, ...] = ()
  qLD_blk: Tuple[Array, ...] = ()
  ten_length: Array = None  # (ntendon,)
  ten_J: Array = None  # (ntendon, nv)
  actuator_length: Array = None  # (nu,)
  actuator_moment: Array = None  # (nu, nv)

  # --------------------------------------------------------------- velocity
  cvel: Array = None  # (nbody, 6)
  cdof_dot: Array = None  # (nv, 6)
  actuator_velocity: Array = None  # (nu,)
  ten_velocity: Array = None  # (ntendon,)
  qfrc_bias: Array = None  # (nv,)
  qfrc_spring: Array = None  # (nv,)
  qfrc_damper: Array = None  # (nv,)
  qfrc_gravcomp: Array = None  # (nv,)
  qfrc_fluid: Array = None  # (nv,)
  qfrc_passive: Array = None  # (nv,)

  # ------------------------------------------------------------- actuation
  act_dot: Array = None  # (na,)
  actuator_force: Array = None  # (nu,)
  qfrc_actuator: Array = None  # (nv,)

  # ----------------------------------------------------------- acceleration
  qfrc_smooth: Array = None  # (nv,)
  qacc_smooth: Array = None  # (nv,)
  qfrc_inverse: Array = None  # (nv,)
  qfrc_constraint: Array = None  # (nv,)
  qacc: Array = None  # (nv,)
  qacc_warmstart: Array = None  # (nv,)

  # ------------------------------------------------------------- constraint
  contact: Contact = None
  efc_J: Array = None  # (nefc, nv); (nefc, efc_K) values when efc_compact
  efc_Jidx: Array = None  # (nefc, efc_K) int32 dof ids (pad = nv); (0, 0)
  # in dense mode
  efc_pos: Array = None  # (nefc,)
  efc_margin: Array = None  # (nefc,)
  efc_frictionloss: Array = None  # (nefc,)
  efc_D: Array = None  # (nefc,)
  efc_aref: Array = None  # (nefc,)
  efc_force: Array = None  # (nefc,)
  efc_active: Array = None  # (nefc,) bool: row participates this step
  ne_active: Array = None  # () int32 (counts for metrics/sensors)
  nf_active: Array = None  # ()
  nl_active: Array = None  # ()
  ncon_active: Array = None  # ()
  nefc_active: Array = None  # ()

  # ---------------------------------------------------------------- sleeping
  # tree_asleep semantics (divergence from the reference's cycle
  # linked-list, sleep.py:889 _build_cycles): negative = awake counter
  # (K_AWAKE = fully awake, incremented toward -1 = ready-to-sleep while
  # the tree stays quiescent); >= 0 = asleep, value = smallest tree id of
  # the island it fell asleep with (the group label; waking any member
  # wakes the whole label group — equivalent observable behavior to the
  # reference's wake-the-cycle, but vectorizes as a label compare).
  tree_asleep: Array = None  # (ntree,) int32

  # ----------------------------------------------------------------- islands
  nisland: Array = None  # () int32
  tree_island: Array = None  # (ntree,) int32, -1 = unconstrained
  dof_island: Array = None  # (nv,) int32
  efc_island: Array = None  # (nefc,) int32

  # -------------------------------------------------- post-constraint (RNE)
  cacc: Array = None  # (nbody, 6) com-frame acceleration
  cfrc_int: Array = None  # (nbody, 6) force from parent
  cfrc_ext: Array = None  # (nbody, 6) external wrenches

  # ------------------------------------------------------------------- flex
  flexvert_xpos: Array = None  # (nflexvert, 3)
  flexedge_length: Array = None  # (nflexedge,)
  flexedge_velocity: Array = None  # (nflexedge,)

  # ---------------------------------------------------------------- history
  history: Array = None  # (nhistory,) circular delay buffers

  # ------------------------------------------------------------ diagnostics
  solver_niter: Array = None  # () int32
  overflow: Array = None  # () int32 OverflowType bits
  energy: Array = None  # (2,) potential, kinetic
  sensordata: Array = None  # (nsensordata,)


def nworld(d: Data) -> Optional[int]:
  """Batch size of a batched Data, or None if single-world."""
  return d.qpos.shape[0] if d.qpos.ndim == 2 else None


def get_model_field(m: "Model", name: str):
  """Fetch a (possibly dotted ``opt.x``) Model field by name."""
  if name.startswith('opt.'):
    return getattr(m.opt, name[4:])
  return getattr(m, name)


def set_model_fields(m: "Model", updates: dict) -> "Model":
  """Replace (possibly dotted ``opt.x``) Model fields."""
  opt_up = {k[4:]: v for k, v in updates.items() if k.startswith('opt.')}
  top = {k: v for k, v in updates.items() if not k.startswith('opt.')}
  if opt_up:
    top['opt'] = m.opt.replace(**opt_up)
  return m.replace(**top)


def concrete_or(x, fn, default):
  """Evaluate ``fn(host_value_of_x)`` when ``x`` is concrete; under a
  tracer (per-world batched model fields, see ``io.batch_model``) fall
  back to ``default`` — callers pick the conservative branch that stays
  correct for every parameter value (e.g. "compute the damping solve")."""
  if isinstance(x, jax.core.Tracer):
    return default
  return fn(np.asarray(jax.device_get(x)))
