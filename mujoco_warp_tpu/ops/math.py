"""Quaternion and spatial (6D) algebra.

TPU-native counterpart of reference mujoco_warp/_src/math.py — but written
for batched ``jnp`` arrays (all functions broadcast over leading dims) rather
than per-thread scalar kernels.  Spatial vectors follow MuJoCo's convention:
``[angular(3); linear(3)]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


# ----------------------------------------------------------------- quaternion


def mul_quat(u: jax.Array, v: jax.Array) -> jax.Array:
  """Hamilton product of quaternions (w, x, y, z); broadcasts."""
  w = u[..., 0] * v[..., 0] - u[..., 1] * v[..., 1] - u[..., 2] * v[..., 2] - u[..., 3] * v[..., 3]
  x = u[..., 0] * v[..., 1] + u[..., 1] * v[..., 0] + u[..., 2] * v[..., 3] - u[..., 3] * v[..., 2]
  y = u[..., 0] * v[..., 2] - u[..., 1] * v[..., 3] + u[..., 2] * v[..., 0] + u[..., 3] * v[..., 1]
  z = u[..., 0] * v[..., 3] + u[..., 1] * v[..., 2] - u[..., 2] * v[..., 1] + u[..., 3] * v[..., 0]
  return jnp.stack([w, x, y, z], axis=-1)


def rot_vec_quat(vec: jax.Array, quat: jax.Array) -> jax.Array:
  """Rotate vec by quat: q * [0, v] * q⁻¹ (fast form)."""
  w = quat[..., :1]
  u = quat[..., 1:]
  c = jnp.cross(u, vec)
  return vec + 2.0 * (w * c + jnp.cross(u, c))


def quat_inv(quat: jax.Array) -> jax.Array:
  return quat * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=quat.dtype)


def normalize_quat(quat: jax.Array) -> jax.Array:
  norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
  return quat / jnp.maximum(norm, _EPS)


def quat_to_mat(quat: jax.Array) -> jax.Array:
  """Quaternion (w,x,y,z) → rotation matrix (..., 3, 3)."""
  w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
  xx, yy, zz = x * x, y * y, z * z
  wx, wy, wz = w * x, w * y, w * z
  xy, xz, yz = x * y, x * z, y * z
  m = jnp.stack(
      [
          1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
          2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
          2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
      ],
      axis=-1,
  )
  return m.reshape(quat.shape[:-1] + (3, 3))


def mat_to_quat(mat: jax.Array) -> jax.Array:
  """Rotation matrix (..., 3, 3) → quaternion (w,x,y,z), branch-free."""
  m00, m01, m02 = mat[..., 0, 0], mat[..., 0, 1], mat[..., 0, 2]
  m10, m11, m12 = mat[..., 1, 0], mat[..., 1, 1], mat[..., 1, 2]
  m20, m21, m22 = mat[..., 2, 0], mat[..., 2, 1], mat[..., 2, 2]
  trace = m00 + m11 + m22

  def case_w():
    s = jnp.sqrt(jnp.maximum(trace + 1.0, _EPS)) * 2
    return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], -1)

  def case_x():
    s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2
    return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], -1)

  def case_y():
    s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, _EPS)) * 2
    return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], -1)

  def case_z():
    s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, _EPS)) * 2
    return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], -1)

  qw, qx, qy, qz = case_w(), case_x(), case_y(), case_z()
  # select the numerically best branch
  cond_w = trace > 0
  cond_x = (m00 > m11) & (m00 > m22)
  cond_y = m11 > m22
  q = jnp.where(
      cond_w[..., None], qw,
      jnp.where(cond_x[..., None], qx, jnp.where(cond_y[..., None], qy, qz)),
  )
  return normalize_quat(q)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
  """Unit axis + angle → quaternion; broadcasts angle over axis batch."""
  s = jnp.sin(angle * 0.5)
  return jnp.concatenate(
      [jnp.cos(angle * 0.5)[..., None], axis * s[..., None]], axis=-1
  )


def quat_integrate(quat: jax.Array, vel: jax.Array, dt) -> jax.Array:
  """Integrate quaternion on the manifold by angular velocity * dt.

  Matches mju_quatIntegrate: rotation in the *local* frame.
  """
  angle = jnp.linalg.norm(vel, axis=-1)
  scaled = angle * dt
  # safe normalize axis
  axis = vel / jnp.maximum(angle, _EPS)[..., None]
  q_rot = axis_angle_to_quat(axis, scaled)
  q_rot = jnp.where((angle > _EPS)[..., None], q_rot,
                    jnp.array([1.0, 0, 0, 0], dtype=quat.dtype))
  return normalize_quat(mul_quat(quat, q_rot))


def quat_to_vel(quat: jax.Array) -> jax.Array:
  """Quaternion → rotation-vector (axis·angle), matching mju_quat2Vel."""
  axis = quat[..., 1:]
  sin_a_2 = jnp.linalg.norm(axis, axis=-1)
  speed = 2.0 * jnp.arctan2(sin_a_2, quat[..., 0])
  # map angle to [-pi, pi]
  speed = jnp.where(speed > jnp.pi, speed - 2.0 * jnp.pi, speed)
  scale = jnp.where(sin_a_2 > _EPS, speed / jnp.maximum(sin_a_2, _EPS), 2.0)
  return axis * scale[..., None]


def quat_mul_axis(quat: jax.Array, axis: jax.Array) -> jax.Array:
  """Quaternion times a pure-vector quaternion (0, axis)."""
  w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
  ax, ay, az = axis[..., 0], axis[..., 1], axis[..., 2]
  return jnp.stack([
      -x * ax - y * ay - z * az,
      w * ax + y * az - z * ay,
      w * ay + z * ax - x * az,
      w * az + x * ay - y * ax,
  ], axis=-1)


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
  """Velocity-space difference of quaternions: 3D vector v s.t. qb ∘ exp(v) = qa.

  Matches mju_subQuat.
  """
  q = mul_quat(quat_inv(qb), qa)
  # normalize sign so w >= 0 (shortest arc)
  q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
  sin_half = jnp.linalg.norm(q[..., 1:], axis=-1)
  cos_half = q[..., 0]
  angle = 2.0 * jnp.arctan2(sin_half, cos_half)
  axis = q[..., 1:] / jnp.maximum(sin_half, _EPS)[..., None]
  return jnp.where((sin_half > _EPS)[..., None], axis * angle[..., None],
                   jnp.zeros_like(q[..., 1:]))


# -------------------------------------------------------------------- spatial


def skew(v: jax.Array) -> jax.Array:
  """Cross-product matrix (..., 3, 3)."""
  x, y, z = v[..., 0], v[..., 1], v[..., 2]
  zero = jnp.zeros_like(x)
  m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
  return m.reshape(v.shape[:-1] + (3, 3))


def motion_cross(v: jax.Array, u: jax.Array) -> jax.Array:
  """Spatial motion cross product v × u for motion vectors [ang; lin]."""
  va, vl = v[..., :3], v[..., 3:]
  ua, ul = u[..., :3], u[..., 3:]
  ang = jnp.cross(va, ua)
  lin = jnp.cross(vl, ua) + jnp.cross(va, ul)
  return jnp.concatenate([ang, lin], axis=-1)


def motion_cross_force(v: jax.Array, f: jax.Array) -> jax.Array:
  """Spatial force cross product v ×* f for force vectors [torque? ang; lin]."""
  va, vl = v[..., :3], v[..., 3:]
  fa, fl = f[..., :3], f[..., 3:]
  ang = jnp.cross(va, fa) + jnp.cross(vl, fl)
  lin = jnp.cross(va, fl)
  return jnp.concatenate([ang, lin], axis=-1)


def inert_matrix(inertia_diag: jax.Array, mass: jax.Array, com: jax.Array,
                 rot: jax.Array) -> jax.Array:
  """Spatial inertia 6x6 about a frame origin offset by ``com`` from the CoM.

  Args:
    inertia_diag: (..., 3) principal inertia at CoM.
    mass: (...,) body mass.
    com: (..., 3) CoM position relative to the frame origin.
    rot: (..., 3, 3) rotation from principal-inertia frame to target frame.

  Returns (..., 6, 6) with [ang; lin] convention:
      [[ I_c + m ĉ ĉᵀ,  m ĉ ],
       [ m ĉᵀ,          m 1 ]]
  """
  ic = rot @ (inertia_diag[..., None] * jnp.swapaxes(rot, -1, -2))
  c_hat = skew(com)
  m = mass[..., None, None]
  tl = ic + m * (c_hat @ jnp.swapaxes(c_hat, -1, -2))
  tr = m * c_hat
  bl = m * jnp.swapaxes(c_hat, -1, -2)
  br = m * jnp.broadcast_to(jnp.eye(3, dtype=inertia_diag.dtype), c_hat.shape)
  top = jnp.concatenate([tl, tr], axis=-1)
  bot = jnp.concatenate([bl, br], axis=-1)
  return jnp.concatenate([top, bot], axis=-2)


def transform_motion(vec: jax.Array, offset: jax.Array) -> jax.Array:
  """Translate a spatial motion vector's frame origin by +offset.

  new_lin = lin - offset × ang  (angular unchanged).
  """
  ang, lin = vec[..., :3], vec[..., 3:]
  return jnp.concatenate([ang, lin - jnp.cross(offset, ang)], axis=-1)


def transform_force(vec: jax.Array, offset: jax.Array) -> jax.Array:
  """Translate a spatial force vector's frame origin by +offset.

  new_ang = ang - offset × lin  (linear unchanged).
  """
  ang, lin = vec[..., :3], vec[..., 3:]
  return jnp.concatenate([ang - jnp.cross(offset, lin), lin], axis=-1)


def normalize_with_norm(v: jax.Array, axis: int = -1):
  norm = jnp.linalg.norm(v, axis=axis, keepdims=True)
  return v / jnp.maximum(norm, _EPS), jnp.squeeze(norm, axis=axis)


def safe_norm(v: jax.Array, axis: int = -1) -> jax.Array:
  return jnp.sqrt(jnp.sum(v * v, axis=axis) + _EPS * _EPS)


def orthogonals(a: jax.Array):
  """Two unit vectors orthogonal to unit vector a (matches make_frame intent)."""
  # pick the axis least aligned with a
  y = jnp.where(jnp.abs(a[..., 1:2]) < 0.9,
                jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], a.dtype), a.shape),
                jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], a.dtype), a.shape))
  b = y - a * jnp.sum(a * y, axis=-1, keepdims=True)
  b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), _EPS)
  c = jnp.cross(a, b)
  return b, c


def make_frame(a: jax.Array) -> jax.Array:
  """Build a 3x3 frame whose first row is unit(a) (contact frame rows)."""
  a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), _EPS)
  b, c = orthogonals(a)
  return jnp.stack([a, b, c], axis=-2)


def chol_solve(L, b):
  """Solve L L^T x = b for a single world (L (nv, nv) lower, b (nv,)).

  For nv <= 64 this is lax triangular_solve; beyond that XLA's blocked
  TriangularSolve custom call exceeds the TPU's scoped-vmem limit under
  an 8192-world vmap (InvertDiagBlocksLowerTriangular at 81x81 wants
  17.45M of 16M), so large systems use explicit column substitution —
  2*nv sequential rank-1 updates that batch cleanly over worlds.
  """
  nv = L.shape[-1]
  if nv <= 64:
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

  def fwd(i, carry):
    r, y = carry
    yi = r[i] / L[i, i]
    return r - L[:, i] * yi, y.at[i].set(yi)

  _, y = jax.lax.fori_loop(0, nv, fwd, (b, jnp.zeros_like(b)))

  def bwd(k, carry):
    r, x = carry
    i = nv - 1 - k
    xi = r[i] / L[i, i]
    return r - L[i, :] * xi, x.at[i].set(xi)

  _, x = jax.lax.fori_loop(0, nv, bwd, (y, jnp.zeros_like(y)))
  return x
