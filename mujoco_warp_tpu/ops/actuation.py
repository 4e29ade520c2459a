"""Actuator support math: muscle FLV curves and activation dynamics.

TPU-native counterpart of reference mujoco_warp/_src/util_misc.py:455-603
(muscle_gain/bias/dynamics).  Vectorized over actuator batches; semantics
follow MuJoCo's documented muscle model (Millard et al. 2013 timescales).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MINVAL = 1e-15


def muscle_gain_length(length, lmin, lmax):
  """Normalized bump-shaped length-gain curve (util_misc.py:455-476)."""
  a = 0.5 * (lmin + 1.0)
  b = 0.5 * (1.0 + lmax)
  x1 = (length - lmin) / jnp.maximum(a - lmin, _MINVAL)
  x2 = (1.0 - length) / jnp.maximum(1.0 - a, _MINVAL)
  x3 = (length - 1.0) / jnp.maximum(b - 1.0, _MINVAL)
  x4 = (lmax - length) / jnp.maximum(lmax - b, _MINVAL)
  out = jnp.where(
      length <= a, 0.5 * x1 * x1,
      jnp.where(length <= 1.0, 1.0 - 0.5 * x2 * x2,
                jnp.where(length <= b, 1.0 - 0.5 * x3 * x3, 0.5 * x4 * x4)))
  return jnp.where((lmin > length) | (length > lmax), 0.0, out)


def _norm_len(length, lengthrange, prm):
  rng0, rng1 = prm[..., 0], prm[..., 1]
  L0 = (lengthrange[..., 1] - lengthrange[..., 0]) / jnp.maximum(
      rng1 - rng0, _MINVAL)
  L = rng0 + (length - lengthrange[..., 0]) / jnp.maximum(L0, _MINVAL)
  return L, L0


def _force_scale(prm, acc0):
  force = prm[..., 2]
  scale = prm[..., 3]
  return jnp.where(force < 0.0, scale / jnp.maximum(acc0, _MINVAL), force)


def muscle_gain(length, vel, lengthrange, acc0, prm):
  """Active muscle force (negative pull), util_misc.py:478-517."""
  force = _force_scale(prm, acc0)
  lmin, lmax = prm[..., 4], prm[..., 5]
  vmax, fvmax = prm[..., 6], prm[..., 8]
  L, L0 = _norm_len(length, lengthrange, prm)
  V = vel / jnp.maximum(L0 * vmax, _MINVAL)
  FL = muscle_gain_length(L, lmin, lmax)
  y = fvmax - 1.0
  FV = jnp.where(
      V <= -1.0, 0.0,
      jnp.where(V <= 0.0, (V + 1.0) ** 2,
                jnp.where(V <= y,
                          fvmax - (y - V) ** 2 / jnp.maximum(y, _MINVAL),
                          fvmax)))
  return -force * FL * FV


def muscle_bias(length, lengthrange, acc0, prm):
  """Passive muscle force, util_misc.py:520-553."""
  force = _force_scale(prm, acc0)
  lmax = prm[..., 5]
  fpmax = prm[..., 7]
  L, _ = _norm_len(length, lengthrange, prm)
  b = 0.5 * (1.0 + lmax)
  x_mid = (L - 1.0) / jnp.maximum(b - 1.0, _MINVAL)
  x_hi = (L - b) / jnp.maximum(b - 1.0, _MINVAL)
  return jnp.where(
      L <= 1.0, 0.0,
      jnp.where(L <= b, -force * fpmax * 0.5 * x_mid * x_mid,
                -force * fpmax * (0.5 + x_hi)))


def _sigmoid(x):
  """Quintic smoothstep on [0, 1] (util_misc.py:556-567)."""
  xc = jnp.clip(x, 0.0, 1.0)
  return xc * xc * xc * (3.0 * xc * (2.0 * xc - 5.0) + 10.0)


def muscle_dynamics(ctrl, act, prm):
  """Activation filter rate (util_misc.py:584-603)."""
  ctrlclamp = jnp.clip(ctrl, 0.0, 1.0)
  actclamp = jnp.clip(act, 0.0, 1.0)
  tau_act = prm[..., 0] * (0.5 + 1.5 * actclamp)
  tau_deact = prm[..., 1] / (0.5 + 1.5 * actclamp)
  smooth_width = prm[..., 2]
  dctrl = ctrlclamp - act
  tau_hard = jnp.where(dctrl > 0.0, tau_act, tau_deact)
  tau_smooth = tau_deact + (tau_act - tau_deact) * _sigmoid(
      dctrl / jnp.maximum(smooth_width, _MINVAL) + 0.5)
  tau = jnp.where(smooth_width < _MINVAL, tau_hard, tau_smooth)
  return dctrl / jnp.maximum(tau, _MINVAL)
