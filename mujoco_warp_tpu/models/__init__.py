"""Test/benchmark model zoo and the oracle-test fixture.

Counterpart of reference test_data/__init__.py `fixture` (lines 28-119):
load an MJCF, generate a generic state with noise + mj_step, run the MuJoCo C
oracle forward, and build device Model/Data from the same state.
All MJCF files here are authored for this project.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import mujoco
import numpy as np

from mujoco_warp_tpu import io, types

_DIR = os.path.dirname(__file__)


def load_mjm(fname: str) -> mujoco.MjModel:
  path = fname if os.path.isabs(fname) else os.path.join(_DIR, fname)
  return mujoco.MjModel.from_xml_path(path)


def fixture(
    fname: str,
    keyframe: Optional[int] = None,
    qpos_noise: float = 0.0,
    qvel_noise: float = 0.0,
    ctrl_noise: float = 0.0,
    nstep: int = 0,
    seed: int = 42,
    overrides: Tuple[str, ...] = (),
) -> Tuple[mujoco.MjModel, mujoco.MjData, types.Model, types.Data]:
  """Load MJCF, randomize, settle with mj_step, run mj_forward; build m/d."""
  mjm = load_mjm(fname)
  for ov in overrides:
    key, val = ov.split('=')
    obj = mjm
    parts = key.split('.')
    for p in parts[:-1]:
      obj = getattr(obj, p)
    cur = getattr(obj, parts[-1])
    if isinstance(cur, np.ndarray):
      cur[:] = float(val)
    else:
      setattr(obj, parts[-1], type(cur)(float(val)))
  mjd = mujoco.MjData(mjm)
  if keyframe is not None:
    mujoco.mj_resetDataKeyframe(mjm, mjd, keyframe)
  rng = np.random.default_rng(seed)
  if qpos_noise:
    mjd.qpos[:] += qpos_noise * rng.standard_normal(mjm.nq)
  if qvel_noise:
    mjd.qvel[:] += qvel_noise * rng.standard_normal(mjm.nv)
  if ctrl_noise and mjm.nu:
    mjd.ctrl[:] = ctrl_noise * rng.standard_normal(mjm.nu)
  if nstep:
    mujoco.mj_step(mjm, mjd, nstep)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.put_data(mjm, mjd, m)
  return mjm, mjd, m, d
