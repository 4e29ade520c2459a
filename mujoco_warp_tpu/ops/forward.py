"""Step orchestration: forward dynamics pipeline + integrators + public API.

TPU-native counterpart of reference mujoco_warp/_src/forward.py
(`step`:1369, `forward`:1342).  The reference launches a fixed sequence of
kernels and graph-captures the whole step; here every stage is a pure
function on a single-world ``Data`` pytree, the public API vmaps over an
optional leading ``nworld`` axis, and the caller jits (`jax.jit(step)` is
the graph capture).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import types
from mujoco_warp_tpu.ops import actuation as act_ops
from mujoco_warp_tpu.ops import collision_driver, constraint, history
from mujoco_warp_tpu.ops import island
from mujoco_warp_tpu.ops import math, passive, sensor, smooth, solver
from mujoco_warp_tpu.ops import sleep as sleep_ops
from mujoco_warp_tpu.ops import support

_DT = types.DynType
_GT = types.GainType
_BT = types.BiasType
_MINVAL = 1e-15


def _batched(fn):
  """Public-API wrapper: vmap over a leading nworld axis when present."""

  @functools.wraps(fn)
  def wrapper(m: types.Model, d: types.Data, *args, **kwargs):
    if d.qpos.ndim == 2:
      return jax.vmap(lambda dd: fn(m, dd, *args, **kwargs))(d)
    return fn(m, d, *args, **kwargs)

  return wrapper


# --------------------------------------------------------------------- stages


def fwd_position(m: types.Model, d: types.Data,
                 factorize: bool = True,
                 eager_islands: bool = True) -> types.Data:
  """Position-dependent computations (reference: forward.py:636)."""
  d = smooth.kinematics(m, d)
  d = smooth.com_pos(m, d)
  d = smooth.camlight(m, d)
  if m.nflex:
    d = smooth.flex(m, d)
  d = smooth.tendon(m, d)
  d = smooth.crb(m, d)
  d = smooth.tendon_armature(m, d)
  # cvel/cdof_dot feed the equality-constraint Jacobian-dot terms, so they
  # are computed here (MuJoCo C >= 3.2 ordering; the C oracle's efc_aref
  # depends on current-state cvel at make_constraint time)
  d = smooth.com_vel(m, d)
  if factorize:
    d = smooth.factor_m(m, d)
  if m.opt.run_collision_detection:
    d = collision_driver.collision(m, d)
    if sleep_ops.enabled(m):
      d = sleep_ops.wake_collision(m, d)
  d = constraint.make_constraint(m, d)
  if sleep_ops.enabled(m):
    d = sleep_ops.wake_equality(m, d)
    d = sleep_ops.mask_sleeping(m, d)
    # islands feed sleep's island-agreement test; without sleeping no
    # pipeline stage consumes the labels (43 ms/step at 8192 worlds) —
    # ops/island.island remains callable directly.  Batched callers pass
    # eager_islands=False and run _island_lazy after their vmap instead.
    if eager_islands:
      d = island.island(m, d)
  d = smooth.transmission(m, d)
  return d


def fwd_velocity(m: types.Model, d: types.Data) -> types.Data:
  """Velocity-dependent computations (reference: forward.py:733)."""
  actuator_velocity = d.actuator_moment @ d.qvel if m.nu else \
      d.actuator_velocity
  ten_velocity = d.ten_J @ d.qvel if m.ntendon else d.ten_velocity
  d = d.replace(actuator_velocity=actuator_velocity,
                ten_velocity=ten_velocity)
  d = passive.passive(m, d)
  d = smooth.rne(m, d)
  d = smooth.tendon_bias(m, d)
  return d


def _next_act(m, act, act_dot, dt, scale, limit: bool, velocity=None):
  """Integrate activations (reference: forward.py:135-218 `_next_activation`).

  act/act_dot are (na,); per-actuator dyntype handled with static masks.
  ``scale`` scales act_dot (RK stages); ``limit`` applies actrange clamps.
  ``velocity`` (nu,) is needed when DC motors with bristle states exist.
  """
  if not m.na:
    return act
  dtype = act.dtype
  # per-act-slot actuator id table (static)
  slot_u = np.full(m.na, -1, np.int64)
  for u in range(m.nu):
    adr, num = int(m.actuator_actadr[u]), int(m.actuator_actnum[u])
    if adr >= 0:
      slot_u[adr:adr + num] = u
  valid = slot_u >= 0
  uc = np.maximum(slot_u, 0)
  dyn = m.actuator_dyntype[uc]
  tau = jnp.maximum(m.actuator_dynprm[uc, 0], _MINVAL)

  # FILTEREXACT: exact exponential filter; others: explicit Euler
  exact = jnp.asarray(dyn == _DT.FILTEREXACT)
  step_exact = act_dot * scale * tau * (1.0 - jnp.exp(-dt / tau))
  step_euler = act_dot * scale * dt
  new = act + jnp.where(exact, step_exact, step_euler)

  if limit and np.any(m.actuator_actlimited):
    lim = jnp.asarray((m.actuator_actlimited[uc] & valid))
    rng = m.actuator_actrange[uc]
    new = jnp.where(lim, jnp.clip(new, rng[:, 0], rng[:, 1]), new)

  # DC motor slots: exact exponential for current/bristle, clamped Euler
  # for integral, plain Euler for slew/temperature (reference:
  # forward.py:167-207); actrange clamps do not apply to these slots
  for u in np.nonzero(m.actuator_dyntype == _DT.DCMOTOR)[0]:
    u = int(u)
    dynp_h = np.asarray(m.actuator_dynprm, np.float64)[u]
    gp_h = np.asarray(m.actuator_gainprm, np.float64)[u]
    dynp = m.actuator_dynprm[u]
    bp = m.actuator_biasprm[u]
    adr0 = int(m.actuator_actadr[u])
    off = 0
    sl = {}
    for name, on in (('slew', dynp_h[7] > 0), ('int', gp_h[5] > 0),
                     ('temp', dynp_h[2] > 0), ('brist', dynp_h[5] > 0),
                     ('cur', dynp_h[0] > 0)):
      sl[name] = off if on else -1
      off += int(on)
    for name, j in sl.items():
      if j < 0:
        continue
      a0 = act[adr0 + j]
      adot = act_dot[adr0 + j] * scale
      if name == 'cur':
        te = jnp.maximum(dynp[0], _MINVAL)
        val = a0 + adot * te * (1.0 - jnp.exp(-dt / te))
      elif name == 'brist':
        vel = velocity[u] if velocity is not None else jnp.zeros((),
                                                                 dtype)
        g = _lugre_stribeck(vel, bp[3], bp[4], bp[5])
        a = -dynp[5] * jnp.abs(vel) / jnp.maximum(g, _MINVAL)
        exp_ah = jnp.exp(a * dt)
        int_h = jnp.where(jnp.abs(a) > _MINVAL, (exp_ah - 1.0) / a, dt)
        val = exp_ah * a0 + int_h * vel
      elif name == 'int':
        val = a0 + adot * dt
        if dynp_h[8] > 0:
          val = jnp.clip(val, -dynp[8], dynp[8])
      else:  # slew / temp
        val = a0 + adot * dt
      new = new.at[adr0 + j].set(val)
  return new


def _lugre_stribeck(vel, F_C, F_S, v_S):
  ratio = vel / jnp.maximum(v_S, _MINVAL)
  return F_C + (F_S - F_C) * jnp.exp(-ratio * ratio)


def _dcmotor_voltage(u_ctrl, length, velocity, x_I, gp, gp_h, dtype):
  """PID/direct input voltage (reference: util_misc.py:650).

  ``gp_h`` is a host (numpy) snapshot of gainprm for static branching.
  """
  input_mode = int(gp_h[8])
  if input_mode == 1:  # position mode
    v = gp[4] * (u_ctrl - length) + gp[5] * x_I - gp[6] * velocity
  elif input_mode > 1:  # velocity mode
    v = gp[4] * (u_ctrl - velocity) + gp[5] * (x_I - length)
  else:
    v = u_ctrl
  if gp_h[7] > 0.0:
    v = jnp.clip(v, -gp[7], gp[7])
  return v


def _dcmotor_force(m, d, u, u_ctrl, act_dot, length, velocity, dtype):
  """One DC-motor actuator: slot act_dots + force.

  Reference: forward.py:815 (act_dot), :930/:981 (actearly ctrl_act +
  gain), :1021 (cogging + LuGre forces).  The slot layout is static
  (host param inspection); state updates write into ``act_dot``.
  """
  # host snapshots taken from the whole (concrete, closure-captured)
  # arrays — indexing first would create tracers under jit
  dynp_h = np.asarray(m.actuator_dynprm, np.float64)[u]
  gp_h = np.asarray(m.actuator_gainprm, np.float64)[u]
  dynp = m.actuator_dynprm[u]
  gp = m.actuator_gainprm[u]
  bp = m.actuator_biasprm[u]
  input_mode = int(gp_h[8])

  # static slot layout
  s_slew = s_int = s_temp = s_brist = s_cur = -1
  n = 0
  if dynp_h[7] > 0:
    s_slew, n = n, n + 1
  if gp_h[5] > 0:
    s_int, n = n, n + 1
  if dynp_h[2] > 0:
    s_temp, n = n, n + 1
  if dynp_h[5] > 0:
    s_brist, n = n, n + 1
  if dynp_h[0] > 0:
    s_cur, n = n, n + 1

  adr0 = int(m.actuator_actadr[u])
  lasta = adr0 + n - 1
  h = m.opt.timestep.astype(dtype)
  R = gp[0]
  K = gp[1]

  # slew rate: effective control follows a rate-limited previous input
  if s_slew >= 0:
    u_prev = d.act[adr0 + s_slew]
    slew = dynp[7] * h
    u_eff = jnp.clip(u_ctrl, u_prev - slew, u_prev + slew)
    act_dot = act_dot.at[adr0 + s_slew].set((u_eff - u_prev) / h)
    u_ctrl = u_eff

  # integral state with anti-windup
  x_I = jnp.zeros((), dtype)
  if s_int >= 0:
    x_I = d.act[adr0 + s_int]
    adot = u_ctrl - length if input_mode == 1 else u_ctrl
    if dynp_h[8] > 0:
      adot = jnp.where(x_I >= dynp[8], jnp.minimum(adot, 0.0), adot)
      adot = jnp.where(x_I <= -dynp[8], jnp.maximum(adot, 0.0), adot)
    act_dot = act_dot.at[adr0 + s_int].set(adot)

  V = _dcmotor_voltage(u_ctrl, length, velocity, x_I, gp, gp_h, dtype)

  # temperature: winding resistance grows with T; T follows Joule heating
  if s_temp >= 0:
    T = d.act[adr0 + s_temp]
    R_eff = R * (1.0 + gp[2] * (T + dynp[4] - gp[3]))
    if s_cur >= 0:
      cur = d.act[lasta]
    else:
      cur = (V - K * velocity) / R_eff
    act_dot = act_dot.at[adr0 + s_temp].set(
        (R_eff * cur * cur - T / dynp[2]) / dynp[3])
    R = R_eff

  # bristle (LuGre) state
  z_dot = None
  if s_brist >= 0:
    z = d.act[adr0 + s_brist]
    g = _lugre_stribeck(velocity, bp[3], bp[4], bp[5])
    a = -dynp[5] * jnp.abs(velocity) / jnp.maximum(g, _MINVAL)
    z_dot = a * z + velocity
    act_dot = act_dot.at[adr0 + s_brist].set(z_dot)

  # electrical current with optional di/dt limit
  if s_cur >= 0:
    te = jnp.maximum(dynp[0], _MINVAL)
    adot = (V / R - (K / R) * velocity - d.act[lasta]) / te
    if dynp_h[1] > 0:
      adot = jnp.clip(adot, -dynp[1], dynp[1])
    act_dot = act_dot.at[lasta].set(adot)

  # ---- gain & effective input (actearly is mandatory for DC motors)
  te_pos = dynp_h[0] > 0.0
  if te_pos:
    gain = K
    # advance the last slot one step (exact exponential for current)
    act = d.act[lasta]
    adot_last = act_dot[lasta]
    off = n - 1
    if off == s_cur:
      te = jnp.maximum(dynp[0], _MINVAL)
      ctrl_act = act + adot_last * te * (1.0 - jnp.exp(-h / te))
    elif off == s_brist:
      g = _lugre_stribeck(velocity, bp[3], bp[4], bp[5])
      a = -dynp[5] * jnp.abs(velocity) / jnp.maximum(g, _MINVAL)
      exp_ah = jnp.exp(a * h)
      int_h = jnp.where(jnp.abs(a) > _MINVAL, (exp_ah - 1.0) / a, h)
      ctrl_act = exp_ah * act + int_h * velocity
    elif off == s_int:
      ctrl_act = act + adot_last * h
      if dynp_h[8] > 0:
        ctrl_act = jnp.clip(ctrl_act, -dynp[8], dynp[8])
    else:
      ctrl_act = act + adot_last * h
    if m.actuator_actlimited[u]:
      ctrl_act = jnp.clip(ctrl_act, m.actuator_actrange[u, 0],
                          m.actuator_actrange[u, 1])
  else:
    gain = K / jnp.maximum(R, _MINVAL)
    if input_mode > 0:
      ctrl_act = _dcmotor_voltage(u_ctrl, length, velocity, x_I, gp,
                                  gp_h, dtype)
    else:
      ctrl_act = u_ctrl

  bias = jnp.zeros((), dtype)
  if int(m.actuator_biastype[u]) == _BT.DCMOTOR and not te_pos:
    bias = -gain * K * velocity  # back-EMF

  f = gain * ctrl_act + bias
  if m.actuator_forcelimited[u]:
    f = jnp.clip(f, m.actuator_forcerange[u, 0],
                 m.actuator_forcerange[u, 1])

  # mechanical forces outside the current/force limits
  if int(m.actuator_biastype[u]) == _BT.DCMOTOR:
    bp_h = np.asarray(m.actuator_biasprm, np.float64)[u]
    if bp_h[0] != 0.0:  # cogging torque
      f = f + bp[0] * jnp.sin(bp[1] * length + bp[2])
    if s_brist >= 0:  # LuGre friction
      f = f - dynp[5] * d.act[adr0 + s_brist] - dynp[6] * z_dot

  return f.astype(dtype), act_dot


def fwd_actuation(m: types.Model, d: types.Data) -> types.Data:
  """Actuator dynamics and forces (reference: forward.py:1153)."""
  dtype = d.qpos.dtype
  if not m.nu or (m.opt.disableflags & types.DisableBit.ACTUATION):
    return d.replace(
        act_dot=jnp.zeros((m.na,), dtype),
        actuator_force=jnp.zeros((m.nu,), dtype),
        qfrc_actuator=jnp.zeros((m.nv,), dtype))

  ctrl = history.read_ctrl_delayed(m, d)
  if not (m.opt.disableflags & types.DisableBit.CLAMPCTRL):
    lim = jnp.asarray(m.actuator_ctrllimited.astype(bool))
    ctrl = jnp.where(lim,
                     jnp.clip(ctrl, m.actuator_ctrlrange[:, 0],
                              m.actuator_ctrlrange[:, 1]), ctrl)

  # ---- act_dot (per dyntype; reference: forward.py:800-912)
  act_dot = jnp.zeros((m.na,), dtype)
  has_act = m.actuator_actadr >= 0
  act_last = np.where(has_act,
                      m.actuator_actadr + m.actuator_actnum - 1, 0)
  if m.na:
    act_u = d.act[act_last]  # (nu,) last activation per actuator
    dyn = m.actuator_dyntype
    dynprm = m.actuator_dynprm
    ad = jnp.zeros((m.nu,), dtype)
    ad = jnp.where(jnp.asarray(dyn == _DT.INTEGRATOR), ctrl, ad)
    filt = (dyn == _DT.FILTER) | (dyn == _DT.FILTEREXACT)
    ad = jnp.where(jnp.asarray(filt),
                   (ctrl - act_u) / jnp.maximum(dynprm[:, 0], _MINVAL), ad)
    ad = jnp.where(jnp.asarray(dyn == _DT.MUSCLE),
                   act_ops.muscle_dynamics(ctrl, act_u, dynprm), ad)
    act_dot = act_dot.at[act_last].set(
        jnp.where(jnp.asarray(has_act), ad, act_dot[act_last]))

  # ---- input: ctrl or activation (with actearly)
  if m.na:
    input_u = jnp.where(jnp.asarray(has_act), act_u, ctrl)
    if np.any(m.actuator_actearly):
      dt = m.opt.timestep.astype(dtype)
      early_val = act_u + ad * dt
      if np.any(m.actuator_actlimited):
        limm = jnp.asarray(m.actuator_actlimited.astype(bool))
        early_val = jnp.where(
            limm, jnp.clip(early_val, m.actuator_actrange[:, 0],
                           m.actuator_actrange[:, 1]), early_val)
      input_u = jnp.where(jnp.asarray(m.actuator_actearly.astype(bool)),
                          early_val, input_u)
  else:
    input_u = ctrl

  # ---- gain / bias
  length = d.actuator_length
  velocity = d.actuator_velocity
  gt = m.actuator_gaintype
  gp = m.actuator_gainprm
  gain = jnp.zeros((m.nu,), dtype)
  gain = jnp.where(jnp.asarray(gt == _GT.FIXED), gp[:, 0], gain)
  gain = jnp.where(jnp.asarray(gt == _GT.AFFINE),
                   gp[:, 0] + gp[:, 1] * length + gp[:, 2] * velocity, gain)
  if np.any(gt == _GT.MUSCLE):
    gain = jnp.where(
        jnp.asarray(gt == _GT.MUSCLE),
        act_ops.muscle_gain(length, velocity, m.actuator_lengthrange,
                            m.actuator_acc0, gp), gain)

  bt = m.actuator_biastype
  bp = m.actuator_biasprm
  bias = jnp.zeros((m.nu,), dtype)
  bias = jnp.where(jnp.asarray(bt == _BT.AFFINE),
                   bp[:, 0] + bp[:, 1] * length + bp[:, 2] * velocity, bias)
  if np.any(bt == _BT.MUSCLE):
    bias = jnp.where(
        jnp.asarray(bt == _BT.MUSCLE),
        act_ops.muscle_bias(length, m.actuator_lengthrange,
                            m.actuator_acc0, bp), bias)

  force = gain * input_u + bias
  if np.any(m.actuator_forcelimited):
    lim = jnp.asarray(m.actuator_forcelimited.astype(bool))
    force = jnp.where(lim,
                      jnp.clip(force, m.actuator_forcerange[:, 0],
                               m.actuator_forcerange[:, 1]), force)

  # ---- DC motor actuators (reference: forward.py:815/981/1021,
  # util_misc.py:604).  Slot layout (slew/integral/temperature/bristle/
  # current) is static per actuator; each motor is patched individually.
  dc_ids = np.nonzero(m.actuator_dyntype == _DT.DCMOTOR)[0]
  for u in dc_ids:
    u = int(u)
    f_u, act_dot = _dcmotor_force(m, d, u, ctrl[u], act_dot, length[u],
                                  velocity[u], dtype)
    force = force.at[u].set(f_u)

  # tendon total actuator-force clamp (reference: forward.py:1057-1098)
  if m.ntendon and np.any(m.tendon_actfrclimited):
    is_ten = m.actuator_trntype == types.TrnType.TENDON
    tid = np.where(is_ten, m.actuator_trnid[:, 0], 0)
    ten_frc = jnp.zeros((m.ntendon,), dtype).at[tid].add(
        jnp.where(jnp.asarray(is_ten), force, 0.0))
    rng = m.tendon_actfrcrange
    limT = jnp.asarray(m.tendon_actfrclimited.astype(bool))
    scale_lo = jnp.where((ten_frc < rng[:, 0]) & limT,
                         rng[:, 0] / jnp.where(ten_frc != 0, ten_frc, 1.0),
                         1.0)
    scale_hi = jnp.where((ten_frc > rng[:, 1]) & limT,
                         rng[:, 1] / jnp.where(ten_frc != 0, ten_frc, 1.0),
                         1.0)
    scale = scale_lo * scale_hi
    force = jnp.where(jnp.asarray(is_ten), force * scale[tid], force)

  if m.callback is not None:
    act_dot, force = _apply_act_callbacks(m, d, act_dot, force)

  qfrc = d.actuator_moment.T @ force

  # gravcomp via actuators + per-joint actuator-force clamps (ref:1100-1135)
  gravity_on = not (m.opt.disableflags & types.DisableBit.GRAVITY)
  jnt_of_dof = m.dof_jntid
  if gravity_on and np.any(m.jnt_actgravcomp):
    gc_dofs = jnp.asarray(m.jnt_actgravcomp[jnt_of_dof].astype(bool))
    qfrc = qfrc + jnp.where(gc_dofs, d.qfrc_gravcomp, 0.0)
  if np.any(m.jnt_actfrclimited):
    lim = jnp.asarray(m.jnt_actfrclimited[jnt_of_dof].astype(bool))
    rng = m.jnt_actfrcrange[jnt_of_dof]
    qfrc = jnp.where(lim, jnp.clip(qfrc, rng[:, 0], rng[:, 1]), qfrc)

  return d.replace(act_dot=act_dot, actuator_force=force,
                   qfrc_actuator=qfrc)


def _apply_act_callbacks(m, d, act_dot, force):
  """act_dyn/act_gain/act_bias user hooks (reference: forward.py:1200)."""
  cb = m.callback
  if cb.act_dyn:
    act_dot = cb.act_dyn(m, d.replace(act_dot=act_dot)).act_dot
  if cb.act_gain or cb.act_bias:
    dtmp = d.replace(actuator_force=force)
    if cb.act_gain:
      dtmp = cb.act_gain(m, dtmp)
    if cb.act_bias:
      dtmp = cb.act_bias(m, dtmp)
    force = dtmp.actuator_force
  return act_dot, force


def fwd_smooth_force(m: types.Model, d: types.Data) -> types.Data:
  """qfrc_smooth = passive − bias + actuator + applied forces."""
  qfrc_applied = d.qfrc_applied + support.xfrc_accumulate(m, d)
  qfrc_smooth = (d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator +
                 qfrc_applied)
  return d.replace(qfrc_smooth=qfrc_smooth)


def fwd_acceleration(m: types.Model, d: types.Data) -> types.Data:
  """Smooth (unconstrained) acceleration (reference: forward.py:1291)."""
  d = fwd_smooth_force(m, d)
  qacc_smooth = smooth.solve_m(m, d, d.qfrc_smooth)
  return d.replace(qacc_smooth=qacc_smooth)


# ------------------------------------------------------------------ integrate


def _next_position(m, qpos, qvel, dt):
  """qpos ∘= exp(dt·qvel) per joint type (reference: forward.py:60-120)."""
  dtype = qpos.dtype
  out = qpos
  for jt in np.unique(m.jnt_type):
    jids = np.nonzero(m.jnt_type == jt)[0]
    qadr = m.jnt_qposadr[jids]
    dadr = m.jnt_dofadr[jids]
    if jt == types.JointType.FREE:
      pos = qpos[qadr[:, None] + np.arange(3)]
      vel = qvel[dadr[:, None] + np.arange(3)]
      out = out.at[qadr[:, None] + np.arange(3)].set(pos + dt * vel)
      quat = math.normalize_quat(qpos[qadr[:, None] + np.arange(3, 7)])
      ang = qvel[dadr[:, None] + np.arange(3, 6)]
      out = out.at[qadr[:, None] + np.arange(3, 7)].set(
          math.quat_integrate(quat, ang, dt))
    elif jt == types.JointType.BALL:
      quat = math.normalize_quat(qpos[qadr[:, None] + np.arange(4)])
      ang = qvel[dadr[:, None] + np.arange(3)]
      out = out.at[qadr[:, None] + np.arange(4)].set(
          math.quat_integrate(quat, ang, dt))
    else:
      out = out.at[qadr].set(qpos[qadr] + dt * qvel[dadr])
  return out


def _advance(m: types.Model, d: types.Data, qacc,
             qvel=None) -> types.Data:
  """Integrate state by one timestep (reference: forward.py:276)."""
  dtype = d.qpos.dtype
  dt = m.opt.timestep.astype(dtype)
  act = _next_act(m, d.act, d.act_dot, dt, 1.0, True,
                  velocity=d.actuator_velocity)
  qvel_new = d.qvel + dt * qacc
  qvel_for_pos = qvel_new if qvel is None else qvel
  qpos = _next_position(m, d.qpos, qvel_for_pos, dt)
  d = history.insert_ctrl_history(m, d)
  return d.replace(
      act=act, qvel=qvel_new, qpos=qpos,
      time=d.time + dt,
      qacc_warmstart=d.qacc)


def euler(m: types.Model, d: types.Data) -> types.Data:
  """Semi-implicit Euler w/ implicit joint damping (reference: 388)."""
  dsbl = m.opt.disableflags
  damped = not (dsbl & (types.DisableBit.EULERDAMP | types.DisableBit.DAMPER))
  if damped and types.concrete_or(
      m.dof_damping, lambda a: bool(np.any(a > 0)), True):
    dtype = d.qpos.dtype
    dt = m.opt.timestep.astype(dtype)
    rhs = smooth.mul_m(m, d, d.qacc)
    if m.m_blocked:
      qacc = smooth.solve_m_damped(m, d, rhs, dt)
    else:
      # (M + h·diag(damping)) is EXACTLY tree-block-diagonal (disjoint
      # kinematic trees share no mass coupling), so multi-tree scenes
      # factor T small blocks instead of one (nv, nv) system; either way
      # the solve rides the lane-parallel Pallas Cholesky via the
      # custom-vmap rule (XLA's batched Cholesky at (8192, 81, 81) is
      # ~78 ms — this stage measured 90 ms of the three_humanoids step
      # before, ~12 ms after).
      damp = dt * m.dof_damping
      spans = solver._tree_spans_raw(m)  # mass solve: block-exact always
      if spans is not None:
        qacc = solver.blocked_chol_solve(
            m, spans,
            lambda s, n: d.qM[s:s + n, s:s + n] + jnp.diag(damp[s:s + n]),
            rhs)
      else:
        M = d.qM + jnp.diag(damp)
        qacc = solver._make_chol_solve(m)(M, rhs)
    return _advance(m, d, qacc)
  return _advance(m, d, d.qacc)


def rungekutta4(m: types.Model, d: types.Data) -> types.Data:
  """Explicit RK4 (reference: forward.py:524)."""
  dtype = d.qpos.dtype
  dt = m.opt.timestep.astype(dtype)
  A = [0.5, 0.5, 1.0]
  B = [1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0]

  qpos_t0, qvel_t0, act_t0 = d.qpos, d.qvel, d.act
  qvel_rk = B[0] * d.qvel
  qacc_rk = B[0] * d.qacc
  act_dot_rk = B[0] * d.act_dot

  dd = d
  for i in range(3):
    qpos_i = _next_position(m, qpos_t0, dd.qvel, A[i] * dt)
    qvel_i = qvel_t0 + A[i] * dt * dd.qacc
    act_i = _next_act(m, act_t0, dd.act_dot, dt, A[i], False,
                      velocity=dd.actuator_velocity)
    dd = dd.replace(qpos=qpos_i, qvel=qvel_i, act=act_i)
    dd = _forward(m, dd)
    qvel_rk = qvel_rk + B[i + 1] * dd.qvel
    qacc_rk = qacc_rk + B[i + 1] * dd.qacc
    act_dot_rk = act_dot_rk + B[i + 1] * dd.act_dot

  # restore the t0 state, then advance by the averaged derivatives:
  # qvel += dt·qacc_rk while qpos integrates with qvel_rk (reference:551-557)
  d = d.replace(qpos=qpos_t0, qvel=qvel_t0, act=act_t0,
                act_dot=act_dot_rk, qacc=dd.qacc)
  return _advance(m, d, qacc_rk, qvel=qvel_rk)


# ------------------------------------------------------------------- pipeline


def _forward(m: types.Model, d: types.Data) -> types.Data:
  """Forward dynamics pipeline (reference: forward.py:1342)."""
  if sleep_ops.enabled(m):
    d = sleep_ops.wake(m, d)
  d = fwd_position(m, d)
  d = sensor.sensor_pos(m, d)
  d = sensor.energy_pos(m, d)
  d = fwd_velocity(m, d)
  d = sensor.sensor_vel(m, d)
  d = sensor.energy_vel(m, d)
  if (m.callback is not None and m.callback.control and
      not (m.opt.disableflags & types.DisableBit.ACTUATION)):
    d = m.callback.control(m, d)  # reference: forward.py:1358
  d = fwd_actuation(m, d)
  d = fwd_acceleration(m, d)
  d = solver.solve(m, d)
  d = sensor.sensor_acc(m, d)
  return d


def _step(m: types.Model, d: types.Data) -> types.Data:
  """One physics step (reference: forward.py:1369)."""
  d = _forward(m, d)
  if sleep_ops.enabled(m):
    awake = sleep_ops.dof_awake_mask(m, d)
    d = d.replace(qacc=jnp.where(awake, d.qacc, 0.0))
  integ = m.opt.integrator
  if integ == types.IntegratorType.EULER:
    d = euler(m, d)
  elif integ == types.IntegratorType.RK4:
    d = rungekutta4(m, d)
  elif integ in (types.IntegratorType.IMPLICIT,
                 types.IntegratorType.IMPLICITFAST):
    from mujoco_warp_tpu.ops import derivative
    d = derivative.implicit(m, d)
  else:
    raise NotImplementedError(f'integrator {integ}')
  if sleep_ops.enabled(m):
    d = sleep_ops.sleep(m, d)
  return d


def step(m: types.Model, d: types.Data) -> types.Data:
  """One physics step; batched Data takes the stage-split fast path so the
  mass-matrix chain and the Newton solve run as Pallas world-tile
  megakernels."""
  if m.batch_fields:
    # per-world batched model params (io.batch_model): vmap the step over
    # the batched leaves; unbatched fields stay concrete in the closure
    # (reference: (*, ...) fields w/ worldid % broadcast, types.py:871)
    if d.qpos.ndim != 2:
      raise ValueError('a model with batch_fields needs batched Data')
    names = m.batch_fields
    vals = tuple(types.get_model_field(m, n) for n in names)
    for n, v in zip(names, vals):
      if v.shape[0] != d.qpos.shape[0]:
        raise ValueError(
            f'batched field {n} has batch {v.shape[0]} != '
            f'nworld {d.qpos.shape[0]}')
    m0 = m.replace(batch_fields=())

    def one(dd, *vs):
      return _step(types.set_model_fields(m0, dict(zip(names, vs))), dd)

    return jax.vmap(one)(d, *vals)
  if d.qpos.ndim != 2:
    return _step(m, d)
  if sleep_ops.enabled(m) and d.qpos.shape[0] >= 256:
    return _step_sleep_skip(m, d)
  return _step_batched(m, d)


def _island_lazy(m: types.Model, d: types.Data) -> types.Data:
  """Batch-global lazy island labeling (d batched over worlds).

  Islands feed only sleep()'s island-agreement test, which can change an
  outcome only on steps where some awake tree's quiescence counter
  reaches ready (see sleep_ops.sleep_candidate for why sleeping trees'
  stale labels are exact).  Skipping the labeler when no world has a
  candidate removes the dominant sleep-bookkeeping cost at steady state
  (tools/profile_sleep.py: 41.7 of ~72 ms/step at clutter_arm @4096).
  """
  cand = jax.vmap(lambda dd: sleep_ops.sleep_candidate(m, dd))(d)
  return jax.lax.cond(
      jnp.any(cand),
      lambda dd: jax.vmap(lambda x: island.island(m, x))(dd),
      lambda dd: dd, d)


def _step_batched(m: types.Model, d: types.Data,
                  run_wake: bool = True) -> types.Data:
  """Stage-split batched step (Pallas megakernels where supported)."""
  from mujoco_warp_tpu.pallas import smooth as psmooth

  use_mass_chain = psmooth.supported(m, d)

  def pre(dd):
    if run_wake and sleep_ops.enabled(m):
      dd = sleep_ops.wake(m, dd)
    if use_mass_chain:
      # position stages up to the fused crb/factor/com_vel/rne kernel
      dd = smooth.kinematics(m, dd)
      dd = smooth.com_pos(m, dd)
      dd = smooth.camlight(m, dd)
      if m.nflex:
        dd = smooth.flex(m, dd)
      dd = smooth.tendon(m, dd)
      return dd
    dd = fwd_position(m, dd, eager_islands=False)
    dd = sensor.sensor_pos(m, dd)
    dd = sensor.energy_pos(m, dd)
    dd = fwd_velocity(m, dd)
    dd = sensor.sensor_vel(m, dd)
    dd = sensor.energy_vel(m, dd)
    dd = fwd_actuation(m, dd)
    dd = fwd_acceleration(m, dd)
    return dd

  def mid(dd):
    # stages after the mass chain (constraint assembly uses cvel/cdof_dot)
    if m.opt.run_collision_detection:
      dd = collision_driver.collision(m, dd)
      if sleep_ops.enabled(m):
        dd = sleep_ops.wake_collision(m, dd)
    dd = constraint.make_constraint(m, dd)
    if sleep_ops.enabled(m):
      dd = sleep_ops.wake_equality(m, dd)
      dd = sleep_ops.mask_sleeping(m, dd)
      # islands run lazily after the vmap (batch-global skip): they feed
      # sleep's island-agreement test only, and that test needs fresh
      # labels only on steps where some awake tree is ready to sleep
      # (see _island_lazy; was 42 ms/step at clutter_arm @4096 when
      # computed unconditionally)
    dd = smooth.transmission(m, dd)
    dd = sensor.sensor_pos(m, dd)
    dd = sensor.energy_pos(m, dd)
    # fwd_velocity minus com_vel/rne (already fused in the mass chain)
    actuator_velocity = dd.actuator_moment @ dd.qvel if m.nu else \
        dd.actuator_velocity
    ten_velocity = dd.ten_J @ dd.qvel if m.ntendon else dd.ten_velocity
    dd = dd.replace(actuator_velocity=actuator_velocity,
                    ten_velocity=ten_velocity)
    dd = passive.passive(m, dd)
    dd = sensor.sensor_vel(m, dd)
    dd = sensor.energy_vel(m, dd)
    if (m.callback is not None and m.callback.control and
        not (m.opt.disableflags & types.DisableBit.ACTUATION)):
      dd = m.callback.control(m, dd)
    dd = fwd_actuation(m, dd)
    dd = fwd_smooth_force(m, dd)
    return dd

  def post(dd):
    dd = sensor.sensor_acc(m, dd)
    integ = m.opt.integrator
    if integ == types.IntegratorType.EULER:
      return euler(m, dd)
    elif integ == types.IntegratorType.RK4:
      return rungekutta4(m, dd)
    elif integ in (types.IntegratorType.IMPLICIT,
                   types.IntegratorType.IMPLICITFAST):
      from mujoco_warp_tpu.ops import derivative
      return derivative.implicit(m, dd)
    raise NotImplementedError(f'integrator {integ}')

  from mujoco_warp_tpu.pallas import linalg as plinalg

  d = jax.vmap(pre)(d)
  if not use_mass_chain and sleep_ops.enabled(m):
    d = _island_lazy(m, d)
  if use_mass_chain:
    d = psmooth.mass_chain(m, d)
    d = jax.vmap(mid)(d)
    if sleep_ops.enabled(m):
      d = _island_lazy(m, d)
    # qacc_smooth via the lane-parallel triangular solve
    if plinalg.supported(m, d):
      d = d.replace(qacc_smooth=plinalg.chol_solve_batched(
          m, d.qLD, d.qfrc_smooth))
    else:
      d = d.replace(qacc_smooth=jax.vmap(
          lambda dd: smooth.solve_m(m, dd, dd.qfrc_smooth))(d))
  d = solver.solve_batched(m, d)
  if sleep_ops.enabled(m):
    d = jax.vmap(lambda dd: dd.replace(
        qacc=jnp.where(sleep_ops.dof_awake_mask(m, dd), dd.qacc, 0.0)))(d)

  # integrate: batched Euler-damp solve when applicable
  dsbl = m.opt.disableflags
  damped = (m.opt.integrator == types.IntegratorType.EULER and
            not (dsbl & (types.DisableBit.EULERDAMP |
                         types.DisableBit.DAMPER)) and
            types.concrete_or(m.dof_damping,
                              lambda a: bool(np.any(a > 0)), True))
  if damped and plinalg.supported(m, d):
    d = jax.vmap(lambda dd: sensor.sensor_acc(m, dd))(d)
    dt = m.opt.timestep.astype(d.qpos.dtype)
    qacc_int = plinalg.damped_solve_batched(m, d.qM, m.dof_damping, dt,
                                            d.qacc)
    d = jax.vmap(lambda dd, qi: _advance(m, dd, qi))(d, qacc_int)
  else:
    d = jax.vmap(post)(d)
  if sleep_ops.enabled(m):
    d = jax.vmap(lambda dd: sleep_ops.sleep(m, dd))(d)
  return d


def _step_sleep_skip(m: types.Model, d: types.Data) -> types.Data:
  """Batched step that SKIPS fully-asleep worlds (the sleeping payoff).

  The reference's sleeping exists to cut work (solve_compact,
  solver.py:3790-4160, incremental collision forward.py:652-666); the
  TPU-native equivalent is world-level compaction: after the wake pass,
  worlds with at least one awake tree are packed into ``W // 4`` slots
  (leading-axis gather — fast on TPU) and only those run the pipeline;
  fully-asleep worlds pay nothing but the wake check and a time advance.
  A fully-asleep world has no internal wake source (nothing moves, so no
  new contacts), only user forces — exactly what the wake pass checks.
  If more than W//4 worlds are awake, lax.cond falls back to the full
  batched step (both branches share one compiled program).
  """
  W = d.qpos.shape[0]
  cap = W // 4
  d = jax.vmap(lambda dd: sleep_ops.wake(m, dd))(d)
  awake_w = jnp.any(d.tree_asleep < 0, axis=-1)  # (W,) any awake tree
  nawake = jnp.sum(awake_w.astype(jnp.int32))

  def packed(d):
    pos = jnp.cumsum(awake_w.astype(jnp.int32)) - 1
    dest = jnp.where(awake_w, pos, cap)
    ids = jnp.full((W,), W, jnp.int32).at[dest].set(
        jnp.arange(W, dtype=jnp.int32), mode='drop')[:cap]
    valid = jnp.arange(cap, dtype=jnp.int32) < nawake
    gat = jnp.minimum(ids, W - 1)
    dsub = jax.tree.map(lambda x: x[gat], d)
    dsub = _step_batched(m, dsub, run_wake=False)

    def put(x, xs):
      vshape = (cap,) + (1,) * (xs.ndim - 1)
      upd = jnp.where(valid.reshape(vshape), xs, x[gat])
      return x.at[ids].set(upd, mode='drop')

    return jax.tree.map(put, d, dsub)

  d2 = jax.lax.cond(nawake <= cap, packed,
                    lambda d: _step_batched(m, d, run_wake=False), d)
  # every world's clock advances (stepped worlds already got exactly +h)
  h = m.opt.timestep.astype(d.time.dtype)
  return d2.replace(time=d.time + h)


@_batched
def forward(m: types.Model, d: types.Data) -> types.Data:
  return _forward(m, d)


@_batched
def step1(m: types.Model, d: types.Data) -> types.Data:
  """Position+velocity stages (reference: forward.py:1384)."""
  d = fwd_position(m, d)
  d = fwd_velocity(m, d)
  return d


@_batched
def step2(m: types.Model, d: types.Data) -> types.Data:
  """Actuation through integration (reference: forward.py:1403)."""
  d = fwd_actuation(m, d)
  d = fwd_acceleration(m, d)
  d = solver.solve(m, d)
  integ = m.opt.integrator
  if integ == types.IntegratorType.EULER:
    return euler(m, d)
  elif integ == types.IntegratorType.RK4:
    return rungekutta4(m, d)
  raise NotImplementedError(f'integrator {integ}')
