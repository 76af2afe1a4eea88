"""3D rotation / rigid-transform math as pure JAX functions.

Quaternions use the ``wxyz`` (scalar-first) convention throughout. All
functions are shape-polymorphic over leading batch dimensions and are safe
under ``jit``/``vmap``/``grad``.

This replaces the reference's reliance on PyBullet's quaternion helpers
(e.g. ``getQuaternionFromEuler`` / ``getEulerFromQuaternion`` used in
QuadrupedalRobots/ETGRL/deployment/robots/minitaur.py:520-560) with
TPU-friendly closed forms.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity() -> jnp.ndarray:
    """Identity rotation quaternion (w, x, y, z)."""
    return jnp.array([1.0, 0.0, 0.0, 0.0])


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b (both wxyz)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )

def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion q: R(q) @ v.

    Uses the 2-cross-product formula (cheaper than forming the matrix when
    rotating a single vector).
    """
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by the inverse of q: R(q)^T @ v."""
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion → 3×3 rotation matrix (acts on column vectors)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """3×3 rotation matrix → quaternion (wxyz), branch-free (Shepperd).

    Computes all four candidate quaternions and selects the numerically
    best one with ``where`` so it vectorizes on TPU.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def _stack(w, x, y, z):
        return jnp.stack([w, x, y, z], axis=-1)

    # Four candidates, each valid when its pivot is the largest.
    qw = _stack(1.0 + tr, m21 - m12, m02 - m20, m10 - m01)
    qx = _stack(m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20)
    qy = _stack(m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21)
    qz = _stack(m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22)

    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                        1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    return quat_normalize(q)


def quat_from_euler(rpy: jnp.ndarray) -> jnp.ndarray:
    """XYZ-intrinsic (roll, pitch, yaw) Euler angles → quaternion.

    Matches PyBullet's ``getQuaternionFromEuler`` convention.
    """
    r, p, y = rpy[..., 0] * 0.5, rpy[..., 1] * 0.5, rpy[..., 2] * 0.5
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def quat_to_euler(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion → (roll, pitch, yaw), matching PyBullet's Euler convention."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray,
                   dt: float) -> jnp.ndarray:
    """Integrate orientation by angular velocity (world frame) over dt.

    Uses the exponential map (exact for constant ω), which stays normalized
    far better than first-order q̇ = ½ ω⊗q integration at large time steps.
    """
    angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    half = 0.5 * angle * dt
    # sinc-safe axis scaling: sin(half)/angle * omega
    small = angle < 1e-8
    k = jnp.where(small, 0.5 * dt, jnp.sin(half) / jnp.where(small, 1.0, angle))
    dq = jnp.concatenate([jnp.cos(half), k * omega_world], axis=-1)
    return quat_normalize(quat_mul(dq, q))


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Vector → skew-symmetric cross-product matrix [v]×."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zeros = jnp.zeros_like(x)
    m = jnp.stack(
        [zeros, -z, y,
         z, zeros, -x,
         -y, x, zeros], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def rot_x(theta: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    m = jnp.stack([o, z, z, z, c, -s, z, s, c], axis=-1)
    return m.reshape(theta.shape + (3, 3))


def rot_y(theta: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    m = jnp.stack([c, z, s, z, o, z, -s, z, c], axis=-1)
    return m.reshape(theta.shape + (3, 3))


def rot_z(theta: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    m = jnp.stack([c, -s, z, s, c, z, z, z, o], axis=-1)
    return m.reshape(theta.shape + (3, 3))
