"""Pinhole camera model: projection, unprojection, radial-tangential distortion.

Replaces the reference's scattered `fx/fy/cx/cy` + `cv::undistortPoints` usage
(reference: src/Frame.cc:1900-1939 `UndistortKeyPoints`, src/Tracking.cc:53-100
intrinsics loading). Pure-jnp, broadcasting over leading dims.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Intrinsics(NamedTuple):
    """fx, fy, cx, cy plus radtan distortion (k1, k2, p1, p2, k3) and stereo bf.

    `bf` = baseline * fx, used for the virtual-right-image coordinate
    `u_r = u - bf / depth` that the reference derives from RGB-D depth
    (reference: src/Frame.cc:1940-1960 `ComputeStereoFromRGBD`).
    """

    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    bf: float = 40.0
    width: int = 640
    height: int = 480

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    @property
    def has_distortion(self) -> bool:
        return any(abs(v) > 0 for v in (self.k1, self.k2, self.p1, self.p2, self.k3))


def project(intr: Intrinsics, X_c: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> pixel coords (..., 2). No distortion."""
    z = X_c[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = intr.fx * X_c[..., 0] * inv_z + intr.cx
    v = intr.fy * X_c[..., 1] * inv_z + intr.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(intr: Intrinsics, X_c: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3) of (u, v, u_r) with u_r = u - bf/z."""
    uv = project(intr, X_c)
    z = jnp.where(jnp.abs(X_c[..., 2]) > 1e-9, X_c[..., 2], 1e-9)
    ur = uv[..., 0] - intr.bf / z
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def unproject(intr: Intrinsics, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels (..., 2) + depth (...,) -> camera-frame points (..., 3).

    Mirrors the reference's `UnprojectStereo` (src/Frame.cc:2088-2103).
    """
    x = (uv[..., 0] - intr.cx) / intr.fx * depth
    y = (uv[..., 1] - intr.cy) / intr.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def distort_normalized(intr: Intrinsics, xy: jnp.ndarray) -> jnp.ndarray:
    """Apply radtan distortion to normalized coords (..., 2)."""
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (intr.k1 + r2 * (intr.k2 + r2 * intr.k3))
    xd = x * radial + 2.0 * intr.p1 * x * y + intr.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + intr.p1 * (r2 + 2.0 * y * y) + 2.0 * intr.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(intr: Intrinsics, uv: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Undistort pixel coords by fixed-point iteration (cv::undistortPoints
    equivalent; fixed iteration count keeps it jit-friendly)."""
    f = jnp.array([intr.fx, intr.fy], dtype=uv.dtype)
    c = jnp.array([intr.cx, intr.cy], dtype=uv.dtype)
    xy_d = (uv - c) / f
    xy = xy_d
    for _ in range(iters):
        delta = distort_normalized(intr, xy) - xy
        xy = xy_d - delta
    return xy * f + c


def in_image(intr: Intrinsics, uv: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    """Boolean mask (...,) of pixels inside the image bounds."""
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < intr.width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < intr.height - margin)
    )
