"""PnP: camera pose from 2D-3D correspondences, vectorized RANSAC.

Replaces the reference's EPnP RANSAC (reference: src/PnPsolver.cc:67-477 —
Lepetit's 4-control-point solver inside an adaptive RANSAC, used only by
relocalization, src/Tracking.cc:3805-3830). The TPU formulation samples all
hypotheses up front: each 6-point minimal set solves a DLT for the 3x4
projection matrix (smallest eigenvector of a 12x12 normal matrix — batched
`eigh`), the rotation is projected onto SO(3), and all hypotheses score all
points in one broadcast. The winner is refined by the shared pose-LM
(`solve.lm.pose_optimization`), playing EPnP's internal Gauss-Newton role.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import camera, se3
from ..geometry.camera import Intrinsics
from .lm import PoseObs, pose_optimization

N_HYP = 96
MIN_SET = 6


class PnPResult(NamedTuple):
    T_cw: jnp.ndarray  # (4, 4)
    inliers: jnp.ndarray  # (N,)
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


def _dlt_pose(X: jnp.ndarray, xy_n: jnp.ndarray) -> jnp.ndarray:
    """DLT for T_cw from >= 6 points. X (M, 3) world, xy_n (M, 2) normalized
    image coords. Returns (4, 4) with R projected onto SO(3)."""
    M = X.shape[0]
    zeros = jnp.zeros((M, 4))
    Xh = jnp.concatenate([X, jnp.ones((M, 1))], axis=1)  # (M, 4)
    rows_u = jnp.concatenate([Xh, zeros, -xy_n[:, 0:1] * Xh], axis=1)
    rows_v = jnp.concatenate([zeros, Xh, -xy_n[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (2M, 12)
    _, V = jnp.linalg.eigh(A.T @ A)
    p = V[:, 0].reshape(3, 4)
    # Fix sign so points are in front.
    depth_sign = jnp.sign(jnp.sum(Xh @ p[2]))
    p = p * jnp.where(depth_sign == 0, 1.0, depth_sign)
    R_raw = p[:, :3]
    # Scale from the rotation part, then project to SO(3).
    scale = jnp.exp(jnp.mean(jnp.log(jnp.maximum(
        jnp.linalg.norm(R_raw, axis=1), 1e-12))))
    R = se3.orthonormalize(R_raw / scale)
    t = p[:, 3] / scale
    return se3.rt_to_mat(R, t)


@partial(jax.jit, static_argnames=("min_inliers",))
def pnp_ransac(
    X_w: jnp.ndarray,  # (N, 3)
    uv: jnp.ndarray,  # (N, 2) pixel observations
    valid: jnp.ndarray,  # (N,)
    intr: Intrinsics,
    seed: jnp.ndarray,
    reproj_th: float = 5.0,
    min_inliers: int = 12,
    T_init: jnp.ndarray | None = None,
) -> PnPResult:
    """`T_init` (4, 4) joins the hypothesis pool when given — a coarse prior
    (e.g. the retrieved keyframe's pose during relocalization) covers the
    planar scenes where the 6-point DLT is degenerate (EPnP's planar branch
    in the reference plays the same role, src/PnPsolver.cc)."""
    N = X_w.shape[0]
    f = jnp.array([intr.fx, intr.fy])
    c = jnp.array([intr.cx, intr.cy])
    xy_n = (uv - c) / f

    key = jax.random.PRNGKey(seed)
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(key, N, shape=(N_HYP, MIN_SET), replace=True, p=p)
    T_h = jax.vmap(_dlt_pose)(X_w[idx], xy_n[idx])  # (H, 4, 4)
    if T_init is not None:
        T_h = jnp.concatenate([T_h, T_init[None]], axis=0)

    X_c = jnp.einsum("hij,nj->hni", T_h[:, :3, :3], X_w) + T_h[:, None, :3, 3]
    proj = camera.project(intr, X_c)  # (H, N, 2)
    err = jnp.linalg.norm(proj - uv[None], axis=-1)
    inl = (err < reproj_th) & (X_c[..., 2] > 0.05) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    T_best = T_h[best]
    best_inl = inl[best]

    # Refine with the shared pose LM on the inliers (mono edges).
    obs = jnp.concatenate([uv, -jnp.ones((N, 1))], axis=1)
    pts = PoseObs(
        X_w=X_w,
        obs=obs,
        is_stereo=jnp.zeros((N,), bool),
        inv_sigma2=jnp.ones((N,)),
        valid=best_inl,
    )
    opt = pose_optimization(T_best, pts, intr, n_rounds=2, n_iters=8)
    T_fit = opt.T_cw
    X_cf = se3.transform(T_fit, X_w)
    err_f = jnp.linalg.norm(camera.project(intr, X_cf) - uv, axis=-1)
    final = (err_f < reproj_th) & (X_cf[:, 2] > 0.05) & valid
    n = jnp.sum(final.astype(jnp.int32))
    finite = jnp.all(jnp.isfinite(T_fit))
    return PnPResult(T_fit, final, n, (n >= min_inliers) & finite)
