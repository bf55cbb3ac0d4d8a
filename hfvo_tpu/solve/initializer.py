"""Monocular two-view initialization: parallel H/F scoring + reconstruction.

Replaces the reference's `Initializer` (reference: src/Initializer.cc:111-125
— homography and fundamental hypotheses scored in parallel threads, model
chosen by the ORB-SLAM2 ratio rule; :130 line-aware overload). The RGB-D
pipeline never calls it (depth initializes directly, src/Tracking.cc:1350),
but the capability is part of the surface. TPU formulation: all minimal-set
hypotheses for BOTH models solve and score in one vmapped pass each; model
selection uses RH = S_H / (S_H + S_F) > 0.45; reconstruction recovers
(R, t) from the essential matrix with a vectorized cheirality test over
triangulated inliers.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Intrinsics

N_HYP = 128
TH_F = 3.84  # chi2 gates (ORB-SLAM2 scoring, reference Initializer.cc)
TH_H = 5.99
TH_SCORE = 5.99


class InitResult(NamedTuple):
    ok: jnp.ndarray  # () bool
    used_H: jnp.ndarray  # () bool — homography model selected
    T_21: jnp.ndarray  # (4, 4) pose of view 2 w.r.t. view 1 (unit-norm t)
    X_1: jnp.ndarray  # (N, 3) triangulated points in view-1 frame
    inliers: jnp.ndarray  # (N,)
    score_h: jnp.ndarray
    score_f: jnp.ndarray


def _normalize(uv, intr):
    f = jnp.array([intr.fx, intr.fy])
    c = jnp.array([intr.cx, intr.cy])
    return (uv - c) / f


def _dlt_F(x1, x2):
    """8-point fundamental (normalized coords): (8, 2),(8, 2) -> (3, 3) rank-2."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, jnp.ones_like(u1)],
        axis=1,
    )  # (8, 9)
    _, V = jnp.linalg.eigh(A.T @ A)
    F = V[:, 0].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    return (U * jnp.array([S[0], S[1], 0.0])) @ Vt


def _dlt_H(x1, x2):
    """4-point homography: (4, 2),(4, 2) -> (3, 3)."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=1)
    r2 = jnp.stack([z, z, z, u1, v1, o, -v2 * u1, -v2 * v1, -v2], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # (8, 9)
    _, V = jnp.linalg.eigh(A.T @ A)
    return V[:, 0].reshape(3, 3)


def _score_F(F, x1, x2, valid):
    """Symmetric epipolar chi2 score (reference CheckFundamental)."""
    x1h = jnp.concatenate([x1, jnp.ones((x1.shape[0], 1))], axis=1)
    x2h = jnp.concatenate([x2, jnp.ones((x2.shape[0], 1))], axis=1)
    l2 = x1h @ F.T  # epipolar line in image 2
    l1 = x2h @ F
    d2 = (jnp.sum(x2h * l2, axis=1) ** 2) / (l2[:, 0] ** 2 + l2[:, 1] ** 2 + 1e-12)
    d1 = (jnp.sum(x1h * l1, axis=1) ** 2) / (l1[:, 0] ** 2 + l1[:, 1] ** 2 + 1e-12)
    # Pixel-equivalent scale: normalized coords, so scale chi2 by f^2 later;
    # here both models share the same units so the ratio is unaffected.
    in1 = (d1 < TH_F * 1e-5) & valid
    in2 = (d2 < TH_F * 1e-5) & valid
    score = jnp.sum(jnp.where(in1, TH_SCORE * 1e-5 - d1, 0.0)) + jnp.sum(
        jnp.where(in2, TH_SCORE * 1e-5 - d2, 0.0)
    )
    return score, in1 & in2


def _score_H(H, x1, x2, valid):
    """Symmetric transfer chi2 score (reference CheckHomography)."""
    x1h = jnp.concatenate([x1, jnp.ones((x1.shape[0], 1))], axis=1)
    x2h = jnp.concatenate([x2, jnp.ones((x2.shape[0], 1))], axis=1)
    Hx1 = x1h @ H.T
    Hx1 = Hx1[:, :2] / (Hx1[:, 2:3] + 1e-12)
    Hinv = jnp.linalg.inv(H + 1e-12 * jnp.eye(3))
    Hx2 = x2h @ Hinv.T
    Hx2 = Hx2[:, :2] / (Hx2[:, 2:3] + 1e-12)
    d2 = jnp.sum((x2 - Hx1) ** 2, axis=1)
    d1 = jnp.sum((x1 - Hx2) ** 2, axis=1)
    in1 = (d1 < TH_H * 1e-5) & valid
    in2 = (d2 < TH_H * 1e-5) & valid
    score = jnp.sum(jnp.where(in1, TH_SCORE * 1e-5 - d1, 0.0)) + jnp.sum(
        jnp.where(in2, TH_SCORE * 1e-5 - d2, 0.0)
    )
    return score, in1 & in2


def _triangulate(T_21, x1, x2):
    """DLT triangulation in view-1 frame; normalized coords."""
    P1 = jnp.eye(4)[:3]
    P2 = T_21[:3]

    def one(a, b):
        A = jnp.stack(
            [
                a[0] * P1[2] - P1[0],
                a[1] * P1[2] - P1[1],
                b[0] * P2[2] - P2[0],
                b[1] * P2[2] - P2[1],
            ]
        )
        _, V = jnp.linalg.eigh(A.T @ A)
        X = V[:, 0]
        return X[:3] / jnp.where(jnp.abs(X[3]) > 1e-12, X[3], 1e-12)

    return jax.vmap(one)(x1, x2)


@partial(jax.jit, static_argnames=("intr",))
def initialize_two_view(
    intr: Intrinsics,
    uv1: jnp.ndarray,  # (N, 2) matched pixels in view 1
    uv2: jnp.ndarray,  # (N, 2)
    valid: jnp.ndarray,  # (N,)
    seed: jnp.ndarray,
) -> InitResult:
    N = uv1.shape[0]
    x1 = _normalize(uv1, intr)
    x2 = _normalize(uv2, intr)
    key = jax.random.PRNGKey(seed)
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx8 = jax.random.choice(key, N, shape=(N_HYP, 8), replace=True, p=p)

    Fs = jax.vmap(_dlt_F)(x1[idx8], x2[idx8])
    sF, inF = jax.vmap(lambda F: _score_F(F, x1, x2, valid))(Fs)
    bF = jnp.argmax(sF)
    F = Fs[bF]
    score_f = sF[bF]

    Hs = jax.vmap(_dlt_H)(x1[idx8[:, :4]], x2[idx8[:, :4]])
    sH, inH = jax.vmap(lambda H: _score_H(H, x1, x2, valid))(Hs)
    bH = jnp.argmax(sH)
    score_h = sH[bH]

    used_H = score_h / jnp.maximum(score_h + score_f, 1e-12) > 0.45

    # Essential-matrix reconstruction (normalized coords: E = F).
    U, S, Vt = jnp.linalg.svd(F)
    # Enforce det(R) = +1 sign conventions.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    cands = [
        se3.rt_to_mat(R1, t), se3.rt_to_mat(R1, -t),
        se3.rt_to_mat(R2, t), se3.rt_to_mat(R2, -t),
    ]

    def cheirality(T):
        X = _triangulate(T, x1, x2)
        z1 = X[:, 2]
        X2 = se3.transform(T, X)
        ok = (z1 > 0) & (X2[:, 2] > 0) & valid & inF[bF]
        return jnp.sum(ok.astype(jnp.int32)), X

    counts, Xs = zip(*[cheirality(T) for T in cands])
    counts = jnp.stack(counts)
    best = jnp.argmax(counts)
    T_21 = jnp.stack(cands)[best]
    X_1 = jnp.stack(Xs)[best]
    good = counts[best]
    inliers = inF[bF] & valid
    # ORB-SLAM2's minTriangulated=50 floor (reference uses the same gate).
    ok = (good > 0.7 * jnp.maximum(jnp.sum(inliers.astype(jnp.int32)), 1)) & (good >= 50)
    return InitResult(ok, used_H, T_21, X_1, inliers, score_h, score_f)
