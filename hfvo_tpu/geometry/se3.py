"""SO(3)/SE(3) utilities, batched and jit-friendly.

Replaces the reference's Eigen/g2o `SE3Quat` + `Converter` plumbing
(reference: src/Converter.cc, Thirdparty/g2o/g2o/types/se3quat.h) with pure
`jnp` functions. Poses are 4x4 row-major float32 matrices `T` mapping points
from the source frame to the target frame (`X_tgt = T @ X_src`); the tracking
code uses `T_cw` (world -> camera) like the reference.

All functions broadcast over leading batch dimensions.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of w (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sincos_coeffs(theta2: jnp.ndarray):
    """(a, b, c) = (sin t/t, (1-cos t)/t^2, (t - sin t)/t^3) with NaN-safe
    gradients at t=0 (the untaken `where` branch must not divide by zero)."""
    big = theta2 > _EPS
    t2_safe = jnp.where(big, theta2, 1.0)
    t_safe = jnp.sqrt(t2_safe)
    a = jnp.where(big, jnp.sin(t_safe) / t_safe, 1.0 - theta2 / 6.0)
    b = jnp.where(big, (1.0 - jnp.cos(t_safe)) / t2_safe, 0.5 - theta2 / 24.0)
    c = jnp.where(
        big,
        (t_safe - jnp.sin(t_safe)) / (t2_safe * t_safe),
        1.0 / 6.0 - theta2 / 120.0,
    )
    return a, b, c


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle (..., 3) -> rotation matrix (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, _ = _sincos_coeffs(theta2)
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * WW


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Goes through the quaternion (Shepperd extraction, stable for all angles
    including near pi): w = 2 * atan2(|q_v|, q_w) * q_v / |q_v|.
    """
    q = quat_from_mat(R)  # (x, y, z, w), canonical q_w >= 0
    qv = q[..., :3]
    qw = q[..., 3]
    n = jnp.linalg.norm(qv, axis=-1)
    angle = 2.0 * jnp.arctan2(n, qw)
    # For small angles q ~ [w/2, 1]: w = 2*qv is the exact series limit.
    scale = jnp.where(n > 1e-7, angle / jnp.where(n > 1e-7, n, 1.0), 2.0)
    return qv * scale[..., None]


def _so3_V(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian V of SO(3) such that exp_se3 translation = V @ rho."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, b, c = _sincos_coeffs(theta2)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * (W @ W)


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """Twist (..., 6) [rho, w] (translation first) -> (..., 4, 4)."""
    rho, w = xi[..., :3], xi[..., 3:]
    R = exp_so3(w)
    t = jnp.einsum("...ij,...j->...i", _so3_V(w), rho)
    return rt_to_mat(R, t)


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> twist (..., 6) [rho, w]."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    w = log_so3(R)
    V = _so3_V(w)
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([rho, w], axis=-1)


def rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def inv(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid transform (..., 4, 4)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform(T: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., 3)."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], X) + T[..., :3, 3]


def rotate(T_or_R: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply the rotation part of a pose (or a bare R) to direction vectors."""
    R = T_or_R[..., :3, :3]
    return jnp.einsum("...ij,...j->...i", R, v)


def orthonormalize(R: jnp.ndarray) -> jnp.ndarray:
    """Project (..., 3, 3) onto SO(3) via SVD (reference: Tracking.cc:1334-1339)."""
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    return (U * D[..., None, :]) @ Vt


def quat_from_mat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), TUM trajectory order.

    Branch-free Shepperd-style selection of the most stable of the four forms.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate (unnormalized) quaternions.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    # Pick by largest diagonal-ish magnitude.
    scores = jnp.stack(
        [tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1
    )
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4) in (w,x,y,z)
    q_wxyz = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, axis=-1), axis=-2)[
        ..., 0, :
    ]
    q_wxyz = q_wxyz / jnp.linalg.norm(q_wxyz, axis=-1, keepdims=True)
    # Canonical sign: w >= 0.
    q_wxyz = q_wxyz * jnp.where(q_wxyz[..., :1] < 0, -1.0, 1.0)
    return jnp.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]], axis=-1)


def mat_from_quat(q_xyzw: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (x, y, z, w) -> rotation matrix (..., 3, 3)."""
    q = q_xyzw / jnp.linalg.norm(q_xyzw, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def identity(batch_shape=(), dtype=jnp.float32) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), tuple(batch_shape) + (4, 4))
