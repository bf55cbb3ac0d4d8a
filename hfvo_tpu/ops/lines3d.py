"""3D line fitting from depth samples along 2D segments — batched RANSAC.

Replaces `Frame::isLineGood` + `LINEextractor::extract3dline_mahdist`
(reference: src/Frame.cc:1205-1322, src/LineExtractor.cpp): sample up to
`S` depth points along each detected segment, RANSAC a 3D line with a
depth-noise-scaled distance gate (the reference uses per-point covariance
`depthStdDev = c1*d^2 + c2*d + c3`, src/LineExtractor.cpp:31-42), refit on
inliers via weighted PCA, and trim the endpoints to the supported extent.
All lines fit in parallel (vmap); hypotheses are a fixed index-pair pattern
(vectorized hypothesis scoring replaces sequential RANSAC, SURVEY.md §7).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import Intrinsics

from . import sym_eig

S_SAMPLES = 20  # depth samples per segment (reference: Frame.cc:1211)
N_HYP = 24  # RANSAC hypotheses per line

# Fixed hypothesis index pairs spread across the sample range.
_rs = np.random.RandomState(7)
_PAIRS = np.stack(
    [
        np.concatenate([np.arange(0, S_SAMPLES // 2), _rs.randint(0, S_SAMPLES, N_HYP - S_SAMPLES // 2)]),
        np.concatenate([np.arange(S_SAMPLES // 2, S_SAMPLES), _rs.randint(0, S_SAMPLES, N_HYP - S_SAMPLES // 2)]),
    ],
    axis=1,
).astype(np.int32)  # (N_HYP, 2)
_PAIRS[:, 1] = np.where(_PAIRS[:, 0] == _PAIRS[:, 1], (_PAIRS[:, 1] + 7) % S_SAMPLES, _PAIRS[:, 1])


def depth_sigma(d: jnp.ndarray) -> jnp.ndarray:
    """Axial depth noise model (Kinect-like quadratic; reference:
    src/LineExtractor.cpp:31-42 c1*d^2 + c2*d + c3)."""
    return 0.0012 + 0.0019 * (d - 0.4) ** 2


class Lines3D(NamedTuple):
    X0_c: jnp.ndarray  # (M, 3) camera-frame endpoint
    X1_c: jnp.ndarray  # (M, 3)
    valid: jnp.ndarray  # (M,) 3D fit succeeded


@partial(jax.jit, static_argnames=("intr", "min_valid", "min_length"))
def fit_lines_3d(
    depth_img: jnp.ndarray,
    intr: Intrinsics,
    p0: jnp.ndarray,  # (M, 2)
    p1: jnp.ndarray,  # (M, 2)
    valid2d: jnp.ndarray,  # (M,)
    min_valid: int = 5,
    min_length: float = 0.02,
) -> Lines3D:
    h, w = depth_img.shape
    ts = (jnp.arange(S_SAMPLES) + 0.5) / S_SAMPLES  # (S,)
    pts = p0[:, None, :] + (p1 - p0)[:, None, :] * ts[None, :, None]  # (M, S, 2)
    xi = jnp.clip(jnp.round(pts[..., 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(pts[..., 1]).astype(jnp.int32), 0, h - 1)
    d = depth_img[yi, xi]  # (M, S)
    has_d = d > 1e-3
    X = jnp.stack(
        [
            (pts[..., 0] - intr.cx) / intr.fx * d,
            (pts[..., 1] - intr.cy) / intr.fy * d,
            d,
        ],
        axis=-1,
    )  # (M, S, 3)
    sigma = depth_sigma(d)  # (M, S)

    pairs = jnp.asarray(_PAIRS)  # (H, 2)
    A = X[:, pairs[:, 0]]  # (M, H, 3)
    B = X[:, pairs[:, 1]]
    dir_h = B - A
    dir_h = dir_h / (jnp.linalg.norm(dir_h, axis=-1, keepdims=True) + 1e-9)
    hyp_ok = has_d[:, pairs[:, 0]] & has_d[:, pairs[:, 1]]

    # Distance of every sample to every hypothesis line.
    rel = X[:, None, :, :] - A[:, :, None, :]  # (M, H, S, 3)
    cross = jnp.cross(rel, dir_h[:, :, None, :])
    dist = jnp.linalg.norm(cross, axis=-1)  # (M, H, S)
    gate = 3.0 * sigma[:, None, :] + 0.003
    inl = (dist < gate) & has_d[:, None, :] & hyp_ok[:, :, None]
    counts = jnp.sum(inl, axis=-1)  # (M, H)
    best = jnp.argmax(counts, axis=-1)  # (M,)
    best_inl = jnp.take_along_axis(inl, best[:, None, None], axis=1)[:, 0]  # (M, S)

    # Weighted PCA refit over the best hypothesis' inliers.
    wgt = jnp.where(best_inl, 1.0 / (sigma**2 + 1e-9), 0.0)
    sw = jnp.sum(wgt, axis=-1, keepdims=True) + 1e-9
    c = jnp.sum(wgt[..., None] * X, axis=1) / sw  # (M, 3)
    Xc = X - c[:, None, :]
    cov = jnp.einsum("msi,ms,msj->mij", Xc, wgt, Xc) / sw[..., None]
    # Principal direction from the symmetric 3x3 eigendecomposition.
    evals, evecs = sym_eig.eigh3(cov + 1e-12 * jnp.eye(3))
    u = evecs[..., -1]  # (M, 3) largest-eigenvalue direction

    along = jnp.einsum("msi,mi->ms", Xc, u)  # (M, S)
    big = 1e9
    a_min = jnp.min(jnp.where(best_inl, along, big), axis=1)
    a_max = jnp.max(jnp.where(best_inl, along, -big), axis=1)
    X0 = c + u * a_min[:, None]
    X1 = c + u * a_max[:, None]

    n_inl = jnp.sum(best_inl, axis=1)
    n_valid_d = jnp.sum(has_d, axis=1)
    length3d = a_max - a_min
    ok = (
        valid2d
        & (n_valid_d >= min_valid)
        & (n_inl >= min_valid)
        & (n_inl >= (n_valid_d * 6) // 10)  # verify3dLine-style support ratio
        & (length3d >= min_length)
        & jnp.isfinite(X0).all(axis=1)
        & jnp.isfinite(X1).all(axis=1)
    )
    return Lines3D(X0, X1, ok)
