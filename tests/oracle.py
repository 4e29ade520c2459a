"""Shared helpers for oracle differential tests against MuJoCo C."""

from __future__ import annotations

import numpy as np

# same accuracy bar as the reference suite (forward_test.py:36-42)
TOL = 5e-4


def assert_close(ours, ref, name: str, atol: float = TOL, rtol: float = TOL):
  ours = np.asarray(ours, np.float64)
  ref = np.asarray(ref, np.float64).reshape(ours.shape)
  err = np.abs(ours - ref)
  bound = atol + rtol * np.abs(ref)
  bad = err > bound
  assert not bad.any(), (
      f'{name}: {bad.sum()}/{bad.size} mismatched, max err '
      f'{err.max():.3e} at {np.unravel_index(err.argmax(), err.shape)}; '
      f'ours={ours.flat[err.argmax()]:.6f} ref={ref.flat[err.argmax()]:.6f}')


def assert_quat_close(ours, ref, name: str, atol: float = TOL):
  """Quaternions match up to sign."""
  ours = np.asarray(ours, np.float64)
  ref = np.asarray(ref, np.float64).reshape(ours.shape)
  err = np.minimum(
      np.abs(ours - ref).max(axis=-1), np.abs(ours + ref).max(axis=-1))
  assert err.max() < atol, f'{name}: max quat err {err.max():.3e}'
