"""Constraint solver: Newton (primal) and CG over the dual-cone cost.

TPU-native counterpart of reference mujoco_warp/_src/solver.py (`solve`:3715).
Semantics mirror the reference exactly — constraint states/forces
(_eval_constraint:404), iterative 3-alpha bracketed linesearch
(_linesearch_iterative_kernel:823), Newton H = M + JᵀD_active J (+ elliptic
cone curvature, _update_gradient_JTCJ_dense:2420), per-world convergence
(_solve_done:3491) — but the mechanics are XLA-native:

* one world per function; the caller vmaps over worlds and jits.  The
  per-world ``done`` mask lives inside a ``lax.while_loop`` carry; under
  vmap XLA runs the loop until every world in the batch is done, with
  converged worlds frozen by the mask (this replaces the reference's
  conditional CUDA graph `wp.capture_while` on ``nsolving``).
* all row bookkeeping is static: row types come from the static EfC layout,
  so constraint-state logic is branch-free masked arithmetic.
* the Newton Hessian is dense ``(nv, nv)`` and factorized with XLA's batched
  Cholesky (MXU); J products are matmuls.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import types
from mujoco_warp_tpu.ops import math
from mujoco_warp_tpu.ops import smooth

_CT = types.ConstraintType
_MINVAL = 1e-15


def _j_mul(m: types.Model, d: types.Data, x: jax.Array) -> jax.Array:
  """J @ x under either Jacobian representation (dense or compact-chain:
  per-row dof gathers, Model.efc_compact)."""
  if m.efc_compact:
    xp = jnp.concatenate([x, jnp.zeros((1,), x.dtype)])
    return jnp.sum(d.efc_J * xp[d.efc_Jidx], axis=-1)
  return d.efc_J @ x


def _jt_mul(m: types.Model, d: types.Data, f: jax.Array) -> jax.Array:
  """Jᵀ @ f under either Jacobian representation (scatter-add on the
  compact path; duplicate dof indices across chain halves accumulate)."""
  if m.efc_compact:
    out = jnp.zeros((m.nv + 1,), f.dtype)
    out = out.at[d.efc_Jidx.reshape(-1)].add(
        (d.efc_J * f[:, None]).reshape(-1))
    return out[:m.nv]
  return d.efc_J.T @ f


class _Static(NamedTuple):
  """Static (trace-time) row classification tables."""

  is_eq: np.ndarray  # (nefc,)
  is_fri: np.ndarray
  is_quadlike: np.ndarray  # limits + frictionless + pyramidal contacts
  is_elliptic: np.ndarray
  # elliptic contact gather tables, (nec, maxdim); addresses padded with 0
  ell_adr: np.ndarray
  ell_mask: np.ndarray  # (nec, maxdim) bool: row exists
  ell_dim: np.ndarray  # (nec,)
  ell_con: np.ndarray  # (nec,) contact slot ids


def _static_tables(m: types.Model) -> _Static:
  t = m.efc.efc_type
  is_eq = t == _CT.EQUALITY
  is_fri = (t == _CT.FRICTION_DOF) | (t == _CT.FRICTION_TENDON)
  is_quadlike = ((t == _CT.LIMIT_JOINT) | (t == _CT.LIMIT_TENDON) |
                 (t == _CT.CONTACT_FRICTIONLESS) |
                 (t == _CT.CONTACT_PYRAMIDAL))
  is_elliptic = t == _CT.CONTACT_ELLIPTIC

  ell_cons = []
  if m.ncon and m.opt.cone == types.ConeType.ELLIPTIC:
    for i in range(m.ncon):
      if int(m.con_dim[i]) > 1:
        ell_cons.append(i)
  if ell_cons:
    dims = np.asarray([int(m.con_dim[i]) for i in ell_cons])
    maxdim = int(dims.max())
    adr = np.zeros((len(ell_cons), maxdim), np.int32)
    mask = np.zeros((len(ell_cons), maxdim), bool)
    for r, i in enumerate(ell_cons):
      for j in range(dims[r]):
        adr[r, j] = m.con_efc_address[i] + j
        mask[r, j] = True
    st = _Static(is_eq, is_fri, is_quadlike, is_elliptic, adr, mask, dims,
                 np.asarray(ell_cons, np.int32))
  else:
    st = _Static(is_eq, is_fri, is_quadlike, is_elliptic,
                 np.zeros((0, 1), np.int32), np.zeros((0, 1), bool),
                 np.zeros((0,), np.int32), np.zeros((0,), np.int32))
  return st


# constraint states (reference: types.ConstraintState)
_SATISFIED = 0
_QUADRATIC = 1
_LINEARNEG = 2
_LINEARPOS = 3
_CONE = 4


def _safe_div(a, b):
  return a / jnp.where(jnp.abs(b) > _MINVAL, b, jnp.where(b >= 0, _MINVAL,
                                                          -_MINVAL))


def _update_constraint(m, d, st: _Static, Jaref, mu_scale):
  """Forces + states per row (reference: _eval_constraint:404-465).

  Returns (efc_force, efc_state, quad_mask) where quad_mask marks rows in
  the quadratic zone (contributing D to the Newton Hessian).
  """
  D = d.efc_D
  fl = d.efc_frictionloss
  dtype = Jaref.dtype

  # default (limits, frictionless/pyramidal contacts): active iff Jaref < 0
  act = Jaref < 0.0
  force = jnp.where(act, -D * Jaref, 0.0)
  state = jnp.where(act, _QUADRATIC, _SATISFIED)

  # equality: always quadratic
  eq = jnp.asarray(st.is_eq)
  force = jnp.where(eq, -D * Jaref, force)
  state = jnp.where(eq, _QUADRATIC, state)

  # friction loss: piecewise linear-quadratic-linear
  fri = jnp.asarray(st.is_fri)
  rf = _safe_div(fl, D)
  f_fri = jnp.where(Jaref <= -rf, fl,
                    jnp.where(Jaref >= rf, -fl, -D * Jaref))
  s_fri = jnp.where(Jaref <= -rf, _LINEARNEG,
                    jnp.where(Jaref >= rf, _LINEARPOS, _QUADRATIC))
  force = jnp.where(fri, f_fri, force)
  state = jnp.where(fri, s_fri, state)

  # elliptic cone contacts (per contact slot)
  if len(st.ell_con):
    fric = d.contact.friction[st.ell_con]  # (nec, 5)
    mu = fric[:, 0] * mu_scale
    jar = Jaref[st.ell_adr]  # (nec, maxdim)
    Dc = D[st.ell_adr]
    maskj = jnp.asarray(st.ell_mask[:, 1:], dtype)
    fr_j = jnp.concatenate(
        [fric[:, :st.ell_adr.shape[1] - 1]], axis=-1)  # (nec, maxdim-1)
    u = jar[:, 1:] * fr_j * maskj
    TT = jnp.sum(u * u, -1)
    T = jnp.sqrt(jnp.maximum(TT, 0.0))
    N = jar[:, 0] * mu
    top = (N >= mu * T) | ((TT <= 0.0) & (N >= 0.0))
    bottom = ((mu * N + T <= 0.0) | ((TT <= 0.0) & (N < 0.0))) & ~top
    middle = ~top & ~bottom

    dm = _safe_div(Dc[:, 0], mu * mu * (1.0 + mu * mu))
    nmt = N - mu * T
    f_normal = -dm * nmt * mu
    f_tan = -_safe_div(f_normal, T)[:, None] * u * fr_j  # (nec, maxdim-1)

    f_quad = -Dc * jar  # bottom zone: all rows quadratic
    f_cone = jnp.concatenate([f_normal[:, None], f_tan], axis=-1)
    f_con = jnp.where(top[:, None], 0.0,
                      jnp.where(bottom[:, None], f_quad, f_cone))
    s_con = jnp.where(top[:, None], _SATISFIED,
                      jnp.where(bottom[:, None], _QUADRATIC, _CONE))
    mfull = jnp.asarray(st.ell_mask)
    force = force.at[st.ell_adr].set(
        jnp.where(mfull, f_con, force[st.ell_adr]))
    state = state.at[st.ell_adr].set(
        jnp.where(mfull, s_con, state[st.ell_adr]))

  quad_mask = (state == _QUADRATIC).astype(dtype)
  return force, state, quad_mask


def _cone_hessian(m, d, st: _Static, Jaref, state, mu_scale):
  """Elliptic middle-zone cone curvature (reference: 2398-2518)."""
  if not len(st.ell_con):
    return jnp.zeros((m.nv, m.nv), Jaref.dtype)
  dtype = Jaref.dtype
  fric = d.contact.friction[st.ell_con]
  mu = fric[:, 0] * mu_scale
  jar = Jaref[st.ell_adr]
  Dc = d.efc_D[st.ell_adr]
  J = d.efc_J[st.ell_adr]  # (nec, maxdim, nv)
  maskj = jnp.asarray(st.ell_mask[:, 1:], dtype)
  fr_j = fric[:, :st.ell_adr.shape[1] - 1]
  u = jar[:, 1:] * fr_j * maskj  # (nec, md-1)
  tt = jnp.sum(u * u, -1)
  t = jnp.maximum(jnp.sqrt(jnp.maximum(tt, 0.0)), _MINVAL)
  n = jar[:, 0] * mu
  dm = _safe_div(Dc[:, 0], mu * mu * (1.0 + mu * mu))
  is_cone = (state[st.ell_adr[:, 0]] == _CONE).astype(dtype) * \
      (dm != 0.0).astype(dtype)

  z0 = mu[:, None] * J[:, 0]  # (nec, nv)
  zj = (fr_j * maskj)[..., None] * J[:, 1:]  # (nec, md-1, nv)
  p = jnp.einsum('cj,cjv->cv', u, zj)  # projections
  ttt = jnp.maximum(t * t * t, _MINVAL)
  mu_t = _safe_div(mu, t)
  mu_n_ttt = mu * _safe_div(n, ttt)
  tdiag = mu * mu - n * mu_t

  w = (dm * is_cone)[:, None, None]
  H = w * (
      jnp.einsum('cv,cw->cvw', z0, z0)
      - mu_t[:, None, None] * (jnp.einsum('cv,cw->cvw', z0, p) +
                               jnp.einsum('cv,cw->cvw', p, z0))
      + mu_n_ttt[:, None, None] * jnp.einsum('cv,cw->cvw', p, p)
      + tdiag[:, None, None] * jnp.einsum('cjv,cjw->cvw', zj, zj))
  return jnp.sum(H, axis=0)


def _eval_delta(m, d, st, Jaref, jv, quad_gauss, ell, alpha):
  """(Δcost(α), φ'(α), φ''(α)) summed over rows + smooth term.

  Mirrors _compute_efc_eval_pt_{pyramidal,elliptic} (reference:469-561).
  """
  D = d.efc_D
  fl = d.efc_frictionloss
  dtype = Jaref.dtype
  x = Jaref + alpha * jv
  jvD = jv * D
  grad0 = jvD * Jaref
  hess = jv * jvD

  # equality rows: pure quadratic, shifted
  c_eq = alpha * (grad0 + 0.5 * alpha * hess)
  g_eq = grad0 + alpha * hess
  h_eq = hess

  # limit / frictionless / pyramidal rows
  quad0 = 0.5 * D * Jaref * Jaref
  cost0 = jnp.where(Jaref < 0.0, quad0, 0.0)
  offset = quad0 - cost0
  c_ql = jnp.where(x < 0.0, c_eq + offset, -cost0)
  g_ql = jnp.where(x < 0.0, g_eq, 0.0)
  h_ql = jnp.where(x < 0.0, hess, 0.0)

  # friction rows: piecewise, shifted by cost at alpha=0
  rf = _safe_div(fl, D)
  def fri_pt(xx):
    mid = (-rf < xx) & (xx < rf)
    c = jnp.where(mid, 0.5 * D * xx * xx,
                  jnp.where(xx <= -rf, fl * (-0.5 * rf - xx),
                            fl * (-0.5 * rf + xx)))
    g = jnp.where(mid, jvD * xx, jnp.where(xx <= -rf, -fl * jv, fl * jv))
    h = jnp.where(mid, hess, 0.0)
    return c, g, h
  cf, gf, hf = fri_pt(x)
  cf0, _, _ = fri_pt(Jaref)
  c_fr, g_fr, h_fr = cf - cf0, gf, hf

  w_eq = jnp.asarray(st.is_eq, dtype)
  w_ql = jnp.asarray(st.is_quadlike, dtype)
  w_fr = jnp.asarray(st.is_fri, dtype)
  cost = jnp.sum(w_eq * c_eq + w_ql * c_ql + w_fr * c_fr)
  grad = jnp.sum(w_eq * g_eq + w_ql * g_ql + w_fr * g_fr)
  hessian = jnp.sum(w_eq * h_eq + w_ql * h_ql + w_fr * h_fr)

  # elliptic contacts (reference: _eval_elliptic_shifted:344-401)
  if len(st.ell_con):
    (mu, quad, u0, v0, uu, uv, vv, dm, cost0e, T0, r0, state0) = ell
    N = u0 + alpha * v0
    Tsqr_delta = alpha * (2.0 * uv + alpha * vv)
    Tsqr = uu + Tsqr_delta
    T = jnp.sqrt(jnp.maximum(Tsqr, 0.0))

    in_quad_zone = jnp.where(
        Tsqr <= 0.0, N < 0.0, mu * N + T <= 0.0)
    in_top = (Tsqr > 0.0) & (N >= mu * T)
    in_mid = (Tsqr > 0.0) & ~in_top & ~in_quad_zone

    # quadratic-zone eval (shifted per state0)
    aq2 = alpha * quad[:, 2]
    c_q = alpha * (aq2 + quad[:, 1])
    boundary = mu * N + T
    gap = 0.5 * dm * boundary * boundary
    c_q = c_q + jnp.where(
        state0 == _CONE, 0.5 * dm * (mu * u0 + T0) ** 2,
        jnp.where(state0 == _SATISFIED,
                  0.5 * dm * (1.0 + mu * mu) * (N * N + jnp.maximum(Tsqr,
                                                                    0.0)),
                  0.0))
    g_q = 2.0 * aq2 + quad[:, 1]
    h_q = 2.0 * quad[:, 2]

    # middle-zone (cone) eval
    T_safe = jnp.maximum(T, _MINVAL)
    T_inv = 1.0 / T_safe
    T1 = (uv + alpha * vv) * T_inv
    T2 = (vv - T1 * T1) * T_inv
    r = N - mu * T
    r1 = v0 - mu * T1
    T_delta = Tsqr_delta / jnp.maximum(T + T0, _MINVAL)
    r_delta = alpha * v0 - mu * T_delta
    c_m = jnp.where(
        state0 == _CONE, 0.5 * dm * r_delta * (2.0 * r0 + r_delta),
        jnp.where(state0 == _QUADRATIC,
                  alpha * (aq2 + quad[:, 1]) - gap,
                  0.5 * dm * r * r))
    g_m = dm * r * r1
    h_m = dm * (r1 * r1 + r * (-mu * T2))

    c_e = jnp.where(in_quad_zone, c_q, jnp.where(in_mid, c_m, -cost0e))
    g_e = jnp.where(in_quad_zone, g_q, jnp.where(in_mid, g_m, 0.0))
    h_e = jnp.where(in_quad_zone, h_q, jnp.where(in_mid, h_m, 0.0))
    cost = cost + jnp.sum(c_e)
    grad = grad + jnp.sum(g_e)
    hessian = hessian + jnp.sum(h_e)

  # smooth (gauss) term: qg = (0, g1, g2); cost const cancels in deltas
  g1, g2 = quad_gauss
  cost = cost + alpha * alpha * g2 + alpha * g1
  grad = grad + 2.0 * alpha * g2 + g1
  hessian = hessian + 2.0 * g2
  return jnp.stack([cost, grad, hessian])


def _elliptic_ls_coeffs(m, d, st, Jaref, jv, mu_scale):
  """Per-elliptic-contact linesearch coefficients (reference:942-994)."""
  if not len(st.ell_con):
    return None
  dtype = Jaref.dtype
  fric = d.contact.friction[st.ell_con]
  mu = fric[:, 0] * mu_scale
  jar = Jaref[st.ell_adr]
  jvc = jv[st.ell_adr]
  Dc = d.efc_D[st.ell_adr]
  maskf = jnp.asarray(st.ell_mask, dtype)

  # quad: sum over all rows of the contact
  DJ = Dc * jar * maskf
  quad = jnp.stack([
      jnp.sum(0.5 * jar * DJ, -1),
      jnp.sum(jvc * DJ, -1),
      jnp.sum(0.5 * jvc * Dc * jvc * maskf, -1),
  ], axis=-1)  # (nec, 3)

  maskj = maskf[:, 1:]
  fr_j = fric[:, :st.ell_adr.shape[1] - 1]
  u = jar[:, 1:] * fr_j * maskj
  v = jvc[:, 1:] * fr_j * maskj
  u0 = jar[:, 0] * mu
  v0 = jvc[:, 0] * mu
  uu = jnp.sum(u * u, -1)
  uv = jnp.sum(u * v, -1)
  vv = jnp.sum(v * v, -1)
  dm = _safe_div(Dc[:, 0], mu * mu * (1.0 + mu * mu))

  # reference point at alpha=0 (_eval_elliptic_reference:274-297)
  T0r = jnp.sqrt(jnp.maximum(uu, 0.0))
  no_t = uu <= 0.0
  satisfied = jnp.where(no_t, u0 >= 0.0, u0 >= mu * T0r)
  quad_zone = jnp.where(no_t, u0 < 0.0, mu * u0 + T0r <= 0.0)
  r0 = u0 - mu * T0r
  cost0 = jnp.where(satisfied, 0.0,
                    jnp.where(quad_zone, quad[:, 0], 0.5 * dm * r0 * r0))
  state0 = jnp.where(satisfied, _SATISFIED,
                     jnp.where(quad_zone, _QUADRATIC, _CONE))
  return (mu, quad, u0, v0, uu, uv, vv, dm, cost0, T0r,
          jnp.where(state0 == _CONE, r0, 0.0), state0)


def _eval_p0(m, d, st, Jaref, jv, quad_gauss, ell):
  """(·, φ'(0), φ''(0)) — alpha-zero variants (reference:565-635)."""
  D = d.efc_D
  fl = d.efc_frictionloss
  dtype = Jaref.dtype
  jvD = jv * D
  grad0 = jvD * Jaref
  hess = jv * jvD

  g_eq, h_eq = grad0, hess
  act = Jaref < 0.0
  g_ql = jnp.where(act, grad0, 0.0)
  h_ql = jnp.where(act, hess, 0.0)
  rf = _safe_div(fl, D)
  mid = (-rf < Jaref) & (Jaref < rf)
  g_fr = jnp.where(mid, grad0, jnp.where(Jaref <= -rf, -fl * jv, fl * jv))
  h_fr = jnp.where(mid, hess, 0.0)

  w_eq = jnp.asarray(st.is_eq, dtype)
  w_ql = jnp.asarray(st.is_quadlike, dtype)
  w_fr = jnp.asarray(st.is_fri, dtype)
  grad = jnp.sum(w_eq * g_eq + w_ql * g_ql + w_fr * g_fr)
  hessian = jnp.sum(w_eq * h_eq + w_ql * h_ql + w_fr * h_fr)

  if len(st.ell_con):
    (mu, quad, u0, v0, uu, uv, vv, dm, cost0e, T0, r0, state0) = ell
    # quadratic zone at 0: standard quad derivative
    g_q, h_q = quad[:, 1], 2.0 * quad[:, 2]
    # cone zone at 0 (reference: _eval_elliptic_alpha_zero:301-312)
    T0s = jnp.maximum(T0, _MINVAL)
    T0_inv = 1.0 / T0s
    T1 = uv * T0_inv
    T2 = (vv - T1 * T1) * T0_inv
    r1 = v0 - mu * T1
    g_m = dm * r0 * r1
    h_m = dm * (r1 * r1 - mu * r0 * T2)
    g_e = jnp.where(state0 == _QUADRATIC, g_q,
                    jnp.where(state0 == _CONE, g_m, 0.0))
    h_e = jnp.where(state0 == _QUADRATIC, h_q,
                    jnp.where(state0 == _CONE, h_m, 0.0))
    grad = grad + jnp.sum(g_e)
    hessian = hessian + jnp.sum(h_e)

  g1, g2 = quad_gauss
  return jnp.stack([jnp.zeros((), dtype), grad + g1, hessian + 2.0 * g2])


def _in_bracket(x, y):
  """reference:119-121."""
  return ((x[1] < y[1]) & (y[1] < 0.0)) | ((x[1] > y[1]) & (y[1] > 0.0))


def _linesearch(m, d, st, qacc, Ma, Jaref, search, mu_scale):
  """Iterative 3-alpha bracketed linesearch (reference:823-1318).

  Returns (alpha, improvement).
  """
  dtype = qacc.dtype
  jv = _j_mul(m, d, search)
  mv = smooth.mul_m(m, d, search)
  g1 = jnp.dot(search, Ma - d.qfrc_smooth)
  g2 = 0.5 * jnp.dot(search, mv)
  quad_gauss = (g1, g2)
  ell = _elliptic_ls_coeffs(m, d, st, Jaref, jv, mu_scale)

  snorm = jnp.sqrt(jnp.maximum(jnp.dot(search, search), 0.0))
  scale = m.stat.meaninertia.astype(dtype) * float(m.nv)
  gtol = jnp.maximum(
      m.opt.tolerance.astype(dtype) * m.opt.ls_tolerance.astype(dtype) *
      snorm * scale, 1e-6)

  ev = lambda a: _eval_delta(m, d, st, Jaref, jv, quad_gauss, ell, a)
  p0 = _eval_p0(m, d, st, Jaref, jv, quad_gauss, ell)
  p0_delta = p0.at[0].set(0.0)

  lo_alpha_in = -_safe_div(p0[1], p0[2])
  lo_in = ev(lo_alpha_in)
  initial_converged = (jnp.abs(lo_in[1]) < gtol) & (lo_in[0] < 0.0)

  lo_less = lo_in[1] < p0[1]
  lo0 = jnp.where(lo_less, lo_in, p0_delta)
  lo_alpha0 = jnp.where(lo_less, lo_alpha_in, 0.0)
  hi0 = jnp.where(lo_less, p0_delta, lo_in)
  hi_alpha0 = jnp.where(lo_less, 0.0, lo_alpha_in)

  def body(carry):
    lo, lo_alpha, hi, hi_alpha, alpha, improvement, it, ls_done = carry
    lo_next_alpha = lo_alpha - _safe_div(lo[1], lo[2])
    hi_next_alpha = hi_alpha - _safe_div(hi[1], hi[2])
    mid_alpha = 0.5 * (lo_alpha + hi_alpha)
    lo_next = ev(lo_next_alpha)
    hi_next = ev(hi_next_alpha)
    midv = ev(mid_alpha)

    swap_ll = _in_bracket(lo, lo_next)
    lo1 = jnp.where(swap_ll, lo_next, lo)
    lo_a1 = jnp.where(swap_ll, lo_next_alpha, lo_alpha)
    swap_lm = _in_bracket(lo1, midv)
    lo2 = jnp.where(swap_lm, midv, lo1)
    lo_a2 = jnp.where(swap_lm, mid_alpha, lo_a1)
    swap_lh = _in_bracket(lo2, hi_next)
    lo3 = jnp.where(swap_lh, hi_next, lo2)
    lo_a3 = jnp.where(swap_lh, hi_next_alpha, lo_a2)
    swap_lo = swap_ll | swap_lm | swap_lh

    swap_hh = _in_bracket(hi, hi_next)
    hi1 = jnp.where(swap_hh, hi_next, hi)
    hi_a1 = jnp.where(swap_hh, hi_next_alpha, hi_alpha)
    swap_hm = _in_bracket(hi1, midv)
    hi2 = jnp.where(swap_hm, midv, hi1)
    hi_a2 = jnp.where(swap_hm, mid_alpha, hi_a1)
    swap_hl = _in_bracket(hi2, lo_next)
    hi3 = jnp.where(swap_hl, lo_next, hi2)
    hi_a3 = jnp.where(swap_hl, lo_next_alpha, hi_a2)
    swap_hi = swap_hh | swap_hm | swap_hl

    done_now = ((~swap_lo & ~swap_hi) |
                ((lo3[0] < 0.0) & (lo3[1] < 0.0) & (lo3[1] > -gtol)) |
                ((hi3[0] < 0.0) & (hi3[1] > 0.0) & (hi3[1] < gtol)))

    improved = (lo3[0] < 0.0) | (hi3[0] < 0.0)
    lo_better = lo3[0] < hi3[0]
    best_alpha = jnp.where(lo_better, lo_a3, hi_a3)
    best_delta = jnp.where(lo_better, lo3[0], hi3[0])
    alpha1 = jnp.where(improved, best_alpha, alpha)
    improvement1 = jnp.where(improved, -best_delta, improvement)
    return (lo3, lo_a3, hi3, hi_a3, alpha1, improvement1, it + 1,
            ls_done | done_now)

  def cond(carry):
    _, _, _, _, _, _, it, ls_done = carry
    return (~ls_done) & (it < m.opt.ls_iterations)

  init = (lo0, lo_alpha0, hi0, hi_alpha0, jnp.zeros((), dtype),
          jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
          jnp.zeros((), bool))
  out = jax.lax.while_loop(cond, body, init)
  alpha_loop, improvement_loop = out[4], out[5]

  alpha = jnp.where(initial_converged, lo_alpha_in, alpha_loop)
  improvement = jnp.where(initial_converged, -lo_in[0], improvement_loop)
  return alpha, improvement, jv, mv


class _SolveCarry(NamedTuple):
  qacc: jax.Array
  Ma: jax.Array
  Jaref: jax.Array
  force: jax.Array
  state: jax.Array
  search: jax.Array
  grad: jax.Array
  Mgrad: jax.Array
  prev_grad: jax.Array
  prev_Mgrad: jax.Array
  improvement: jax.Array
  niter: jax.Array
  done: jax.Array
  conv: jax.Array  # latched: world met a tolerance (vs. hit the cap)


def _make_chol_solve(m):
  """H, grad -> H⁻¹grad with a vmap rule that swaps in the lane-parallel
  Pallas factor/solve for the whole batch.

  XLA's batched Cholesky costs ~78 ms at (8192, 81, 81) on v5e and its
  batched TriangularSolve exceeds the scoped-vmem limit; under vmap this
  is the jnp Newton path's whole bottleneck (everything else — the H
  einsum, J contractions — batches onto the MXU for free)."""

  @jax.custom_batching.custom_vmap
  def cs(H, g):
    L = jax.scipy.linalg.cholesky(
        H + jnp.eye(H.shape[-1], dtype=H.dtype) * _MINVAL, lower=True)
    if H.ndim == 3:  # tree-blocked (T, w, w): vmap over blocks
      return jax.vmap(math.chol_solve)(L, g)
    return math.chol_solve(L, g)

  @cs.def_vmap
  def _cs_vmap(axis_size, in_batched, H, g):
    from mujoco_warp_tpu.pallas import linalg as plinalg
    nv = H.shape[-1]
    # tree-blocked form arrives as (world, T, w, w): fold the block axis
    # into the batch — T·world lane-parallel w-sized solves
    blocked = H.ndim == 4
    T = H.shape[1] if blocked else 1
    if blocked:
      H = H.reshape(axis_size * T, nv, nv)
      g = g.reshape(axis_size * T, nv)
    lane_ok = (jax.default_backend() != 'cpu' and
               (axis_size * T) % plinalg.TILE_W == 0 and
               4 * plinalg.TILE_W * (4 * nv * nv + 6 * nv)
               < plinalg._VMEM_BUDGET)
    if lane_ok:
      L = plinalg.chol_batched(m, H, jitter=_MINVAL)
      out = plinalg.chol_solve_batched(m, L, g)
    else:
      L = jax.scipy.linalg.cholesky(
          H + jnp.eye(nv, dtype=H.dtype)[None] * _MINVAL, lower=True)
      out = jax.vmap(math.chol_solve)(L, g)
    if blocked:
      out = out.reshape(axis_size, T, nv)
    return out, True

  return cs


def _tree_spans(m: types.Model):
  """Static per-tree contiguous dof spans [(start, ndof), ...] in dof
  order, or None when tree-blocking does not apply.

  Disjoint kinematic trees have a block-diagonal mass matrix, and EFC
  rows whose bodies live in one tree touch only that tree's dof columns
  — so for multi-tree scenes the Newton Hessian is (nearly) tree-block-
  diagonal.  Solving blocks instead of the full (nv, nv) system cuts the
  H build by ~T× and the Cholesky by ~T²× (the TPU-static analog of the
  reference's island-partitioned `solve_compact`, solver.py:4066: trees
  are the compile-time island superset).

  Gate (env MWTPU_TREE_BLOCK_H): 'auto' (default) requires that no
  static candidate pair, equality, or tendon couples two trees — then
  blockdiag(H) == H identically.  'on' opts in regardless: cross-tree
  rows keep exact gradients/linesearch but their H coupling is dropped
  (block-preconditioned Newton — same optimum, more iterations while
  the bodies actually touch).  'off' disables.  The gate applies ONLY to
  the constraint Hessian; mass-matrix-only solves (`_tree_spans_raw`)
  are block-exact unconditionally."""
  import os
  mode = os.environ.get('MWTPU_TREE_BLOCK_H', 'auto')
  if mode == 'off':
    return None
  if mode != 'on':
    bt = np.asarray(m.body_treeid)
    gb = np.asarray(m.geom_bodyid)
    if m.ncand:
      b1 = gb[np.asarray(m.pair_geom1)]
      b2 = gb[np.asarray(m.pair_geom2)]
      if np.any((bt[b1] != bt[b2]) & (b1 != 0) & (b2 != 0)):
        return None  # cross-tree contacts possible: dense H only
    if m.neq or m.ntendon:
      return None  # equality/tendon rows may couple trees: stay dense
  return _tree_spans_raw(m)


def _tree_spans_raw(m: types.Model):
  """Ungated spans: valid for mass-matrix-only block solves (M and
  M + h·diag(damping) are exactly tree-block-diagonal — disjoint trees
  share no mass coupling)."""
  if m.ntree <= 1 or m.nv == 0:
    return None
  treeid = np.asarray(m.body_treeid)[np.asarray(m.dof_bodyid)]
  spans = []
  for t in range(m.ntree):
    idx = np.nonzero(treeid == t)[0]
    if idx.size == 0:
      continue
    if idx[-1] - idx[0] + 1 != idx.size:
      return None  # non-contiguous tree dofs: keep the dense form
    spans.append((int(idx[0]), int(idx.size)))
  spans.sort()
  if sum(n for _, n in spans) != m.nv or len(spans) <= 1:
    return None
  return spans


def blocked_chol_solve(m, spans, block_of, rhs):
  """x = blockdiag(B_t)⁻¹ rhs for static tree spans.

  ``block_of(s, n)`` returns the (n, n) SPD diagonal block for the span
  starting at dof s; blocks pad to the widest tree with identity rows
  (solve returns 0 there) and stack on a leading axis that the chol
  vmap rule folds into the world batch (lane-parallel w-sized solves)."""
  dtype = rhs.dtype
  wmax = max(n for _, n in spans)
  Bs, gs = [], []
  for s, n in spans:
    B = block_of(s, n)
    g = rhs[s:s + n]
    if n < wmax:
      B = jnp.concatenate([B, jnp.zeros((n, wmax - n), dtype)], axis=1)
      pad = jnp.concatenate(
          [jnp.zeros((wmax - n, n), dtype),
           jnp.eye(wmax - n, dtype=dtype)], axis=1)
      B = jnp.concatenate([B, pad], axis=0)
      g = jnp.concatenate([g, jnp.zeros((wmax - n,), dtype)])
    Bs.append(B)
    gs.append(g)
  xb = _make_chol_solve(m)(jnp.stack(Bs), jnp.stack(gs))
  return jnp.concatenate([xb[t, :n] for t, (_, n) in enumerate(spans)])


def _blocked_mgrad(m, d, spans, Dq, grad):
  """Mgrad via the tree-block-diagonal Hessian.

  H_bd = blockdiag(H): every EFC row keeps its within-tree JᵀDJ
  contributions; only cross-tree coupling blocks (rows whose contact
  joins two trees) are dropped.  H_bd is SPD, the gradient stays exact,
  and the exact linesearch still runs — so Newton converges to the same
  optimum; when no cross-tree row is active (the common case: each
  body touches the static world) the iterates are identical to the
  dense form."""

  def block_of(s, n):
    Jb = d.efc_J[:, s:s + n]
    return d.qM[s:s + n, s:s + n] + (Jb.T * Dq) @ Jb

  return blocked_chol_solve(m, spans, block_of, grad)


def _gradient(m, d, st, Ma, force, state, Jaref, mu_scale):
  """grad/Mgrad (reference: _update_gradient:3100)."""
  qfrc_constraint = _jt_mul(m, d, force)
  grad = Ma - d.qfrc_smooth - qfrc_constraint
  if m.opt.solver == types.SolverType.NEWTON:
    assert not (m.efc_compact or m.m_blocked), (
        'Newton needs the dense H; compact/blocked modes are CG-only')
    Dq = d.efc_D * (state == _QUADRATIC)
    spans = (_tree_spans(m)
             if m.opt.cone != types.ConeType.ELLIPTIC else None)
    if spans is not None:
      Mgrad = _blocked_mgrad(m, d, spans, Dq, grad)
    else:
      H = d.qM + (d.efc_J.T * Dq) @ d.efc_J
      if m.opt.cone == types.ConeType.ELLIPTIC:
        H = H + _cone_hessian(m, d, st, Jaref, state, mu_scale)
      Mgrad = _make_chol_solve(m)(H, grad)
  else:
    Mgrad = smooth.solve_m(m, d, grad)
  return grad, Mgrad, qfrc_constraint


def solve_batched(m: types.Model, d: types.Data) -> types.Data:
  """Batched solve: Pallas world-tile megakernel when applicable.

  The Pallas path keeps each 128-world tile's whole Newton solve in VMEM
  with worlds on the vector lanes (the TPU analog of the reference's
  one-CUDA-thread-per-world parallelism); it covers the Newton solver with
  pyramidal/frictionless cones.  Everything else falls back to the
  reference-equivalent jnp path under vmap.
  """
  from mujoco_warp_tpu.pallas import solver as psolver

  if psolver.supported(m, d):
    return psolver.solve_batched(m, d)
  return jax.vmap(lambda dd: solve(m, dd))(d)


def solve(m: types.Model, d: types.Data) -> types.Data:
  """Solve for constrained qacc (reference: solver.py:3715 `solve`).

  Single-world; vmapped by the caller.
  """
  dtype = d.qpos.dtype
  if m.nefc == 0 or (m.opt.disableflags & types.DisableBit.CONSTRAINT):
    return d.replace(
        qacc=d.qacc_smooth,
        qacc_warmstart=d.qacc_smooth,
        qfrc_constraint=jnp.zeros((m.nv,), dtype),
        solver_niter=jnp.zeros((), jnp.int32))

  st = _static_tables(m)
  mu_scale = (1.0 / jnp.sqrt(jnp.maximum(m.opt.impratio.astype(dtype),
                                         _MINVAL)))

  if m.opt.disableflags & types.DisableBit.WARMSTART:
    qacc = d.qacc_smooth
  else:
    qacc = d.qacc_warmstart

  Jaref = _j_mul(m, d, qacc) - d.efc_aref
  Ma = smooth.mul_m(m, d, qacc)
  force, state, _ = _update_constraint(m, d, st, Jaref, mu_scale)
  grad, Mgrad, _ = _gradient(m, d, st, Ma, force, state, Jaref, mu_scale)
  search = -Mgrad

  tol = m.opt.tolerance.astype(dtype)
  meaninertia = m.stat.meaninertia.astype(dtype)
  rescale = 1.0 / (meaninertia * float(m.nv))

  def body(c: _SolveCarry) -> _SolveCarry:
    alpha, improvement, jv, mv = _linesearch(
        m, d, st, c.qacc, c.Ma, c.Jaref, c.search, mu_scale)
    qacc = c.qacc + alpha * c.search
    Ma = c.Ma + alpha * mv
    Jaref = c.Jaref + alpha * jv
    force, state, _ = _update_constraint(m, d, st, Jaref, mu_scale)
    grad, Mgrad, _ = _gradient(m, d, st, Ma, force, state, Jaref, mu_scale)

    if m.opt.solver == types.SolverType.CG:
      beta_num = jnp.dot(grad, Mgrad - c.prev_Mgrad)
      beta_den = jnp.maximum(jnp.dot(c.prev_grad, c.prev_Mgrad), _MINVAL)
      beta = jnp.maximum(0.0, beta_num / beta_den)
      search = -Mgrad + beta * c.search
      model_improvement = jnp.full((), jnp.inf, dtype)
    else:
      search = -Mgrad
      model_improvement = rescale * 0.5 * jnp.dot(grad, Mgrad)

    niter = c.niter + 1
    grad_norm = rescale * jnp.sqrt(jnp.maximum(jnp.dot(grad, grad), 0.0))
    impr = rescale * improvement
    converged = ((impr < tol) | (grad_norm < tol) |
                 (model_improvement < tol))
    done = converged | (niter >= m.opt.iterations)

    # frozen worlds keep their carry (vmap-of-while semantics)
    keep = lambda new, old: jnp.where(c.done, old, new)
    return _SolveCarry(
        qacc=keep(qacc, c.qacc), Ma=keep(Ma, c.Ma),
        Jaref=keep(Jaref, c.Jaref), force=keep(force, c.force),
        state=keep(state, c.state), search=keep(search, c.search),
        grad=keep(grad, c.grad), Mgrad=keep(Mgrad, c.Mgrad),
        prev_grad=keep(grad, c.prev_grad),
        prev_Mgrad=keep(Mgrad, c.prev_Mgrad),
        improvement=keep(impr, c.improvement),
        niter=keep(niter, c.niter), done=c.done | done,
        conv=c.conv | (~c.done & converged))

  carry = _SolveCarry(
      qacc=qacc, Ma=Ma, Jaref=Jaref, force=force, state=state,
      search=search, grad=grad, Mgrad=Mgrad, prev_grad=grad,
      prev_Mgrad=Mgrad, improvement=jnp.full((), jnp.inf, dtype),
      niter=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool),
      conv=jnp.zeros((), bool))

  carry = jax.lax.while_loop(lambda c: ~c.done, body, carry)

  qfrc_constraint = _jt_mul(m, d, carry.force)
  # overflow accounting (reference OverflowType + solver_niter buckets,
  # testspeed.py:266-278): a world that exhausted opt.iterations without
  # meeting any tolerance gets the SOLVER bit
  overflow = d.overflow | jnp.where(
      ~carry.conv, jnp.int32(types.OverflowType.SOLVER), 0)
  return d.replace(
      qacc=carry.qacc,
      qacc_warmstart=carry.qacc,
      qfrc_constraint=qfrc_constraint,
      efc_force=carry.force,
      overflow=overflow.astype(jnp.int32),
      solver_niter=carry.niter)
