"""Residuals + analytic Jacobians for the hybrid-feature edge taxonomy.

The reference builds g2o graphs from many edge types (reference:
src/Optimizer.cc, include/g2oMSC.h, include/EdgeLine.h, g2oAddition/).
Here every edge type is a pure function producing batched residuals `r`,
Jacobians `J` w.r.t. a *left-multiplied* se(3) twist on `T_cw`
(`T <- exp([rho, w]) @ T`), and per-edge chi2 = r^T Omega r.

Twist order is [rho (trans), w (rot)] matching geometry.se3.exp_se3.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Intrinsics


def transform_jacobian(X_c: jnp.ndarray) -> jnp.ndarray:
    """d X_c / d twist for left-perturbation: (..., 3, 6) = [I | -hat(X_c)]."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X_c.dtype), X_c.shape[:-1] + (3, 3))
    return jnp.concatenate([eye, -se3.hat(X_c)], axis=-1)


def proj_jacobian(intr: Intrinsics, X_c: jnp.ndarray) -> jnp.ndarray:
    """d(u, v) / d X_c: (..., 2, 3)."""
    x, y, z = X_c[..., 0], X_c[..., 1], X_c[..., 2]
    iz = 1.0 / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([intr.fx * iz, zero, -intr.fx * x * iz2], axis=-1)
    row_v = jnp.stack([zero, intr.fy * iz, -intr.fy * y * iz2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def point_stereo_residual(
    T_cw: jnp.ndarray,
    X_w: jnp.ndarray,
    obs_uvr: jnp.ndarray,
    intr: Intrinsics,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stereo (u, v, u_r) reprojection residual for N points under one pose.

    Mirrors g2o's `EdgeStereoSE3ProjectXYZOnlyPose` used by the reference's
    `PoseOptimization` (reference: src/Optimizer.cc:590-1478). Mono edges are
    expressed by zeroing the third component's weight at the call site.

    Returns (r (N, 3), J (N, 3, 6), z (N,) camera depth for validity gating).
    """
    X_c = se3.transform(T_cw, X_w)
    x, y, z = X_c[..., 0], X_c[..., 1], X_c[..., 2]
    iz = 1.0 / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = intr.fx * x * iz + intr.cx
    v = intr.fy * y * iz + intr.cy
    ur = u - intr.bf * iz
    r = jnp.stack([u, v, ur], axis=-1) - obs_uvr

    Juv = proj_jacobian(intr, X_c)  # (N, 2, 3)
    # d u_r / d X_c = d u / d X_c + bf/z^2 * d z / d X_c(=e_z)
    iz2 = iz * iz
    dur = Juv[..., 0, :] + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), intr.bf * iz2], axis=-1
    )
    Jproj = jnp.concatenate([Juv, dur[..., None, :]], axis=-2)  # (N, 3, 3)
    J = Jproj @ transform_jacobian(X_c)  # (N, 3, 6)
    return r, J, z


def line_endpoint_residual(
    T_cw: jnp.ndarray,
    X_w: jnp.ndarray,
    line_2d: jnp.ndarray,
    intr: Intrinsics,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Point-to-infinite-2D-line distance for projected 3D line endpoints.

    The reference's line reprojection edges measure `l . proj(T X)` where
    `l = (a, b, c)` is the normalized 2D observed line (reference:
    include/EdgeLine.h:53 `EdgeLineProjectXYZ`, include/g2oMSC.h:561
    `DistPt2Line2DMultiFrame`). `line_2d` rows are (a, b, c) with a^2+b^2=1.

    Returns (r (N, 1), J (N, 1, 6), z (N,)).
    """
    X_c = se3.transform(T_cw, X_w)
    z = X_c[..., 2]
    iz = 1.0 / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = intr.fx * X_c[..., 0] * iz + intr.cx
    v = intr.fy * X_c[..., 1] * iz + intr.cy
    a, b, c = line_2d[..., 0], line_2d[..., 1], line_2d[..., 2]
    r = (a * u + b * v + c)[..., None]
    Juv = proj_jacobian(intr, X_c)  # (N, 2, 3)
    dl = a[..., None] * Juv[..., 0, :] + b[..., None] * Juv[..., 1, :]  # (N, 3)
    J = (dl[..., None, :] @ transform_jacobian(X_c))  # (N, 1, 6)
    return r, J, z


def plane_residual(
    T_cw: jnp.ndarray,
    pi_w: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Observed-plane vs map-plane residual in the camera frame.

    The reference parameterizes planes minimally as (azimuth, elevation,
    distance) and measures `ominus(pi_obs, T^-T pi_w)` (reference:
    g2oAddition/Plane3D.h:84-113, EdgePlane.h). Here the map plane
    `pi_w = (n_w, d_w)` (unit normal) is transformed to camera frame as
    `n_c = R n_w`, `d_c = d_w - n_c . ( -R^T t applied... )` — concretely
    `pi_c = T_cw^{-T} pi_w`, and the residual is computed at the call site
    against the observed plane in minimal coordinates. This helper returns
    the transformed plane and its Jacobian wrt the twist.

    Returns (pi_c (N, 4) with unit normal, J_pi (N, 4, 6)).
    """
    R = T_cw[..., :3, :3]
    t = T_cw[..., :3, 3]
    n_w = pi_w[..., :3]
    d_w = pi_w[..., 3]
    n_c = jnp.einsum("...ij,...nj->...ni", R, n_w)
    # For pi = (n, d) with plane eq n.X + d = 0: pi_c = (R n_w, d_w - t . R n_w)
    d_c = d_w - jnp.einsum("...i,...ni->...n", t, n_c)
    pi_c = jnp.concatenate([n_c, d_c[..., None]], axis=-1)
    # Left-perturbation derivative: n_c' = (I + hat(w)) n_c -> dn/dw = -hat(n_c)
    # d_c' = d_c - rho . n_c  (translation perturbs t by rho)
    N = n_c.shape[-2]
    zeros33 = jnp.zeros(n_c.shape[:-1] + (3, 3), dtype=n_c.dtype)
    dn = jnp.concatenate([zeros33, -se3.hat(n_c)], axis=-1)  # (N, 3, 6)
    dd = jnp.concatenate(
        [-n_c, jnp.zeros_like(n_c)], axis=-1
    )[..., None, :]  # (N, 1, 6)
    J = jnp.concatenate([dn, dd], axis=-2)  # (N, 4, 6)
    return pi_c, J


def plane_edge_terms(
    T_cw: jnp.ndarray,
    pi_w: jnp.ndarray,  # (N, 4) map planes (world, unit normal)
    pi_obs: jnp.ndarray,  # (N, 4) observed planes (camera frame)
    kind: jnp.ndarray,  # (N,) 0=full (az,el,d), 1=parallel, 2=vertical
):
    """Residuals + Jacobians for the plane edge taxonomy.

    kind 0: full association — angle residual |n_obs x n_pred| (the sin of
    the normal angle, replacing the reference's azimuth/elevation split of
    `Plane3D::ominus`, g2oAddition/Plane3D.h:99-113: az/el Jacobians are
    singular when the normal aligns with the optical axis, i.e. exactly the
    camera-facing walls this system lives on) + distance residual
    d_obs - d_pred. kind 1: parallel constraint |n_obs x n_pred|
    (EdgeParallelPlane). kind 2: vertical constraint n_obs . n_pred
    (EdgeVerticalPlane). Returns (r (N, 3), J (N, 3, 6), comp (N, 3)
    active-component mask); weight layout is (angle, unused, distance).
    """
    pi_c, J_pi = plane_residual(T_cw, pi_w)  # (N, 4), (N, 4, 6)
    n = pi_c[..., :3]
    Jn = J_pi[..., :3, :]  # (N, 3, 6)
    Jd = J_pi[..., 3, :]  # (N, 6)

    # Shared angle residual: |n_obs x n_pred|.
    n_obs = pi_obs[..., :3]
    cx = jnp.cross(n_obs, n)
    r_par = jnp.linalg.norm(cx, axis=-1)
    hat_obs = se3.hat(n_obs)
    dr_dn = jnp.einsum("ni,nij->nj", cx, hat_obs) / jnp.maximum(r_par, 1e-9)[..., None]
    J_par = jnp.einsum("ni,nij->nj", dr_dn, Jn)

    # Distance residual (kind 0 only).
    r_d = pi_obs[..., 3] - pi_c[..., 3]
    J_d = -Jd

    # Vertical: n_obs . n_pred.
    r_vert = jnp.sum(n_obs * n, axis=-1)
    J_vert = jnp.einsum("ni,nij->nj", n_obs, Jn)

    is_full = kind == 0
    is_par = kind == 1
    r0 = jnp.where(is_par | is_full, r_par, r_vert)
    J0 = jnp.where((is_par | is_full)[..., None], J_par, J_vert)
    zeros = jnp.zeros_like(r0)
    r = jnp.stack([r0, zeros, jnp.where(is_full, r_d, 0.0)], axis=-1)
    J = jnp.stack(
        [J0, jnp.zeros_like(J0), jnp.where(is_full[..., None], J_d, 0.0)], axis=-2
    )
    comp = jnp.stack(
        [jnp.ones_like(r0), zeros, is_full.astype(r0.dtype)], axis=-1
    )
    return r, J, comp


def plane_minimal_error(pi_obs: jnp.ndarray, pi_pred: jnp.ndarray) -> jnp.ndarray:
    """3-DoF plane error (d_azimuth, d_elevation, d_distance).

    Matches the reference's `Plane3D::ominus` structure
    (g2oAddition/Plane3D.h:99-113) without the point-cloud distance term.
    """
    def azel(pi):
        n = pi[..., :3]
        return jnp.stack(
            [jnp.arctan2(n[..., 1], n[..., 0]),
             jnp.arctan2(n[..., 2], jnp.linalg.norm(n[..., :2], axis=-1))],
            axis=-1,
        )

    dae = azel(pi_obs) - azel(pi_pred)
    # wrap azimuth difference
    dae = jnp.where(dae > jnp.pi, dae - 2 * jnp.pi, dae)
    dae = jnp.where(dae < -jnp.pi, dae + 2 * jnp.pi, dae)
    dd = (pi_obs[..., 3] - pi_pred[..., 3])[..., None]
    return jnp.concatenate([dae, dd], axis=-1)


# ---------------------------------------------------------------------------
# Lane-major ("_t") variants: edge axis INNERMOST.
#
# The (N, 3, 6) Jacobian tensors above tile their (3, 6) minor dims into
# 4x128 TPU blocks — 18 real elements in 512 slots — so every elementwise
# consumer (each LM iteration's H/g assembly) wasted ~28x memory and lanes
# (measured ~0.09 ms per batch-8 LM iteration, ~1.3 ms/step). The variants
# below keep per-component Jacobian rows as (..., 6, N) with edges on lanes;
# H then assembles as (6, kN) @ (kN, 6) contractions at full lane width.
# Same math, bit-for-bit residuals.
# ---------------------------------------------------------------------------


def _cross_rows(X_c, a0, a1, a2):
    """Components of X_c x a for a row-triple given as (N,) components —
    a @ (-hat(X_c)) == X_c x a, the rotation block of a projected row."""
    x, y, z = X_c[..., 0], X_c[..., 1], X_c[..., 2]
    return (y * a2 - z * a1, z * a0 - x * a2, x * a1 - y * a0)


def point_stereo_terms_t(
    T_cw: jnp.ndarray,
    X_w: jnp.ndarray,
    obs_uvr: jnp.ndarray,
    intr: Intrinsics,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Lane-major stereo point terms: (r (3, N), Jt (3, 6, N), z (N)).

    Identical math to point_stereo_residual (row k of J is
    [a_k | X_c x a_k] for a_k = d r_k / d X_c)."""
    X_c = se3.transform(T_cw, X_w)
    x, y, z = X_c[..., 0], X_c[..., 1], X_c[..., 2]
    iz = 1.0 / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    iz2 = iz * iz
    u = intr.fx * x * iz + intr.cx
    v = intr.fy * y * iz + intr.cy
    ur = u - intr.bf * iz
    r = jnp.stack(
        [u - obs_uvr[..., 0], v - obs_uvr[..., 1], ur - obs_uvr[..., 2]],
        axis=0,
    )
    zero = jnp.zeros_like(x)
    rows = []
    for a0, a1, a2 in (
        (intr.fx * iz, zero, -intr.fx * x * iz2),
        (zero, intr.fy * iz, -intr.fy * y * iz2),
        (intr.fx * iz, zero, (intr.bf - intr.fx * x) * iz2),
    ):
        c0, c1, c2 = _cross_rows(X_c, a0, a1, a2)
        rows.append(jnp.stack([a0, a1, a2, c0, c1, c2], axis=0))
    return r, jnp.stack(rows, axis=0), z


def line_terms_t(
    T_cw: jnp.ndarray,
    X_w: jnp.ndarray,
    line_2d: jnp.ndarray,
    intr: Intrinsics,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Lane-major line-endpoint terms: (r (N,), Jt (6, N), z (N))."""
    X_c = se3.transform(T_cw, X_w)
    x, y, z = X_c[..., 0], X_c[..., 1], X_c[..., 2]
    iz = 1.0 / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    iz2 = iz * iz
    u = intr.fx * x * iz + intr.cx
    v = intr.fy * y * iz + intr.cy
    a, b, c = line_2d[..., 0], line_2d[..., 1], line_2d[..., 2]
    r = a * u + b * v + c
    dl0 = a * intr.fx * iz
    dl1 = b * intr.fy * iz
    dl2 = -(a * intr.fx * x + b * intr.fy * y) * iz2
    c0, c1, c2 = _cross_rows(X_c, dl0, dl1, dl2)
    return r, jnp.stack([dl0, dl1, dl2, c0, c1, c2], axis=0), z


def point3d_terms_t(
    T_cw: jnp.ndarray, X_w: jnp.ndarray, X_c_obs: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lane-major metric-3D alignment terms: (r (3, N), Jt (3, 6, N));
    J = [I | -hat(X_c)] rowwise."""
    X_c = se3.transform(T_cw, X_w)
    x, y, z = X_c[..., 0], X_c[..., 1], X_c[..., 2]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r = jnp.swapaxes(X_c - X_c_obs, -1, -2)
    Jt = jnp.stack(
        [
            jnp.stack([one, zero, zero, zero, z, -y], axis=0),
            jnp.stack([zero, one, zero, -z, zero, x], axis=0),
            jnp.stack([zero, zero, one, y, -x, zero], axis=0),
        ],
        axis=0,
    )
    return r, Jt


def dir_terms_t(
    T_cw: jnp.ndarray, d_w: jnp.ndarray, d_c_in: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lane-major direction-chord terms (sign-folded): (r (3, V),
    Jt (3, 6, V)); rotation block -hat(v) rowwise, translation zero."""
    v = d_w @ T_cw[:3, :3].T
    s = jnp.sign(jnp.sum(v * d_c_in, axis=-1, keepdims=True))
    d_c = d_c_in * jnp.where(s == 0, 1.0, s)
    r = jnp.swapaxes(v - d_c, -1, -2)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    Jt = jnp.stack(
        [
            jnp.stack([zero, zero, zero, zero, z, -y], axis=0),
            jnp.stack([zero, zero, zero, -z, zero, x], axis=0),
            jnp.stack([zero, zero, zero, y, -x, zero], axis=0),
        ],
        axis=0,
    )
    return r, Jt


def plane_edge_terms_t(
    T_cw: jnp.ndarray,
    pi_w: jnp.ndarray,
    pi_obs: jnp.ndarray,
    kind: jnp.ndarray,
):
    """Lane-major plane edge taxonomy: (r (3, N), Jt (3, 6, N),
    comp (3, N)). Same residuals as plane_edge_terms; Jacobian rows are
    [0 | n_c x dr_dn] (angle), [n_c | 0] (distance, full only),
    [0 | n_c x n_obs] (vertical)."""
    R = T_cw[..., :3, :3]
    t = T_cw[..., :3, 3]
    n_w = pi_w[..., :3]
    n_c = n_w @ jnp.swapaxes(R, -1, -2)
    d_c = pi_w[..., 3] - n_c @ t
    n_obs = pi_obs[..., :3]

    cx = jnp.cross(n_obs, n_c)
    r_par = jnp.linalg.norm(cx, axis=-1)
    dr_dn = jnp.cross(cx, n_obs) / jnp.maximum(r_par, 1e-9)[..., None]
    rot_par = jnp.cross(n_c, dr_dn)  # (N, 3)
    rot_vert = jnp.cross(n_c, n_obs)
    r_d = pi_obs[..., 3] - d_c
    r_vert = jnp.sum(n_obs * n_c, axis=-1)

    is_full = kind == 0
    is_par = kind == 1
    pf = is_par | is_full
    r0 = jnp.where(pf, r_par, r_vert)
    rot0 = jnp.where(pf[..., None], rot_par, rot_vert)
    zero = jnp.zeros_like(r0)
    r = jnp.stack([r0, zero, jnp.where(is_full, r_d, 0.0)], axis=0)
    fullf = is_full.astype(r0.dtype)
    row0 = jnp.stack(
        [zero, zero, zero, rot0[..., 0], rot0[..., 1], rot0[..., 2]], axis=0
    )
    row2 = jnp.stack(
        [
            n_c[..., 0] * fullf, n_c[..., 1] * fullf, n_c[..., 2] * fullf,
            zero, zero, zero,
        ],
        axis=0,
    )
    Jt = jnp.stack([row0, jnp.zeros_like(row0), row2], axis=0)
    comp = jnp.stack([jnp.ones_like(r0), zero, fullf], axis=0)
    return r, Jt, comp
