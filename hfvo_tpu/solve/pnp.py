"""PnP: camera pose from 2D-3D correspondences, vectorized RANSAC.

Replaces the reference's EPnP RANSAC (reference: src/PnPsolver.cc:67-477 —
Lepetit's 4-control-point solver inside an adaptive RANSAC, used only by
relocalization, src/Tracking.cc:3805-3830). The TPU formulation samples all
hypotheses up front; each minimal set contributes FOUR pose candidates to
one broadcast scoring pass:

- a 6-point DLT for the 3x4 projection matrix (smallest eigenvector of a
  12x12 normal matrix — batched `eigh`), rotation projected onto SO(3);
- the three EPnP beta cases N=1/2/3 (`_epnp_pose`): barycentric control
  points, null-space basis of the 12x12 M^T M, pairwise-distance beta
  solves + Gauss-Newton refinement, absolute orientation via Kabsch —
  mirroring compute_pose/find_betas_approx_{1,2,3}/gauss_newton of
  src/PnPsolver.cc:180-477.

The winner is refined by the shared pose-LM (`solve.lm.pose_optimization`),
playing the role of the reference's final `refine()` re-solve.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import camera, se3
from ..geometry.camera import Intrinsics
from .lm import PoseObs, pose_optimization
from .ransac import kabsch

N_HYP = 96
MIN_SET = 6

# Control-point index pairs for the 6 pairwise distances (PnPsolver's
# compute_rho / compute_L_6x10 ordering, src/PnPsolver.cc:389-439).
_PAIR_I = jnp.array([0, 0, 0, 1, 1, 2])
_PAIR_J = jnp.array([1, 2, 3, 2, 3, 3])


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


def _epnp_pose(X: jnp.ndarray, xy_n: jnp.ndarray) -> jnp.ndarray:
    """EPnP for one minimal set: (3, 4, 4) pose candidates (beta cases
    N=1/2/3, each Gauss-Newton refined). X (M, 3) world points, xy_n (M, 2)
    normalized image coords (reference: PnPsolver::compute_pose,
    src/PnPsolver.cc:180-220)."""
    M = X.shape[0]

    # 1. Control points: centroid + principal axes scaled by sqrt of the
    #    per-point scatter eigenvalues (choose_control_points,
    #    src/PnPsolver.cc:240-270). A floor keeps the barycentric basis
    #    invertible for planar sets (the reference switches to its planar
    #    branch; here degraded control points still yield a candidate that
    #    the RANSAC scoring pass simply ranks).
    c0 = jnp.mean(X, axis=0)
    Xc = X - c0
    scatter = Xc.T @ Xc
    w_eig, V = jnp.linalg.eigh(scatter)  # ascending
    k = jnp.sqrt(jnp.maximum(w_eig, 1e-6 * jnp.trace(scatter) + 1e-12) / M)
    ctrl_w = jnp.concatenate([c0[None], c0[None] + k[:, None] * V.T], axis=0)

    # 2. Barycentric coordinates (compute_barycentric_coordinates,
    #    src/PnPsolver.cc:272-295).
    B = (ctrl_w[1:] - ctrl_w[0]).T  # (3, 3), columns = basis vectors
    a123 = jnp.linalg.solve(B, Xc.T).T  # (M, 3)
    alpha = jnp.concatenate(
        [1.0 - jnp.sum(a123, axis=1, keepdims=True), a123], axis=1
    )  # (M, 4)

    # 3. The 2M x 12 M-matrix in normalized coords (fill_M,
    #    src/PnPsolver.cc:297-313) and its null-space basis.
    zeros = jnp.zeros_like(alpha)
    row_u = jnp.stack([alpha, zeros, -alpha * xy_n[:, 0:1]], axis=-1)
    row_v = jnp.stack([zeros, alpha, -alpha * xy_n[:, 1:2]], axis=-1)
    Mm = jnp.concatenate(
        [row_u.reshape(M, 12), row_v.reshape(M, 12)], axis=0
    )
    _, V12 = jnp.linalg.eigh(Mm.T @ Mm)
    vs = V12[:, :4].T.reshape(4, 4, 3)  # (basis k, ctrl j, xyz)

    # 4. Pairwise-distance data for the beta solves (compute_rho +
    #    compute_L_6x10, src/PnPsolver.cc:389-439).
    dv = vs[:, _PAIR_I] - vs[:, _PAIR_J]  # (4, 6, 3)
    D = jnp.einsum("kpi,lpi->pkl", dv, dv)  # (6, 4, 4): dv_k . dv_l per pair
    dw = jnp.sum((ctrl_w[_PAIR_I] - ctrl_w[_PAIR_J]) ** 2, axis=1)  # (6,)

    def lstsq_reg(L, y):
        return jnp.linalg.solve(
            L.T @ L + 1e-9 * jnp.eye(L.shape[1]), L.T @ y
        )

    # find_betas_approx_1 (src/PnPsolver.cc:441-460): b11 only.
    b11 = jnp.sum(D[:, 0, 0] * dw) / jnp.maximum(
        jnp.sum(D[:, 0, 0] ** 2), 1e-12
    )
    beta1 = jnp.array([jnp.sqrt(jnp.abs(b11)), 0.0, 0.0, 0.0])

    # find_betas_approx_2 (src/PnPsolver.cc:462-487): [b11, b12, b22].
    L2 = jnp.stack([D[:, 0, 0], 2.0 * D[:, 0, 1], D[:, 1, 1]], axis=1)
    b2 = lstsq_reg(L2, dw)
    beta2 = jnp.array(
        [
            jnp.sqrt(jnp.abs(b2[0])),
            jnp.sqrt(jnp.abs(b2[2])) * jnp.sign(b2[1]) * jnp.sign(b2[0]),
            0.0,
            0.0,
        ]
    )

    # find_betas_approx_3 (src/PnPsolver.cc:489-519):
    # [b11, b12, b22, b13, b23].
    L3 = jnp.stack(
        [
            D[:, 0, 0],
            2.0 * D[:, 0, 1],
            D[:, 1, 1],
            2.0 * D[:, 0, 2],
            2.0 * D[:, 1, 2],
        ],
        axis=1,
    )
    b3 = lstsq_reg(L3, dw)
    s0 = jnp.sign(b3[0])
    beta3_1 = jnp.sqrt(jnp.abs(b3[0]))
    beta3 = jnp.array(
        [
            beta3_1,
            jnp.sqrt(jnp.abs(b3[2])) * jnp.sign(b3[1]) * s0,
            b3[3] / jnp.maximum(beta3_1, 1e-12) * s0,
            0.0,
        ]
    )

    def gauss_newton(beta):
        # 5 iterations on the 6 distance residuals (gauss_newton,
        # src/PnPsolver.cc:521-575).
        def step(beta, _):
            Db = jnp.einsum("pkl,l->pk", D, beta)  # (6, 4)
            r = dw - jnp.einsum("pk,k->p", Db, beta)
            J = 2.0 * Db  # d(beta^T D beta)/d beta
            H = J.T @ J + 1e-9 * jnp.eye(4)
            return beta + jnp.linalg.solve(H, J.T @ r), None

        beta, _ = jax.lax.scan(step, beta, None, length=5)
        return beta

    def pose_from_beta(beta):
        ctrl_c = jnp.einsum("k,kjx->jx", beta, vs)  # (4, 3)
        pc = alpha @ ctrl_c  # (M, 3) camera coords of the set
        # Sign fix: cheirality (compute_ccs/compute_pcs sign flip,
        # src/PnPsolver.cc:222-238).
        sgn = jnp.where(jnp.sum(pc[:, 2]) < 0, -1.0, 1.0)
        return kabsch(pc * sgn, X, jnp.ones((M,)))

    betas = jnp.stack(
        [gauss_newton(beta1), gauss_newton(beta2), gauss_newton(beta3)]
    )
    return jax.vmap(pose_from_beta)(betas)  # (3, 4, 4)


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
    T_dlt = jax.vmap(_dlt_pose)(X_w[idx], xy_n[idx])  # (H, 4, 4)
    T_epnp = jax.vmap(_epnp_pose)(X_w[idx], xy_n[idx])  # (H, 3, 4, 4)
    T_h = jnp.concatenate([T_dlt, T_epnp.reshape(-1, 4, 4)], axis=0)
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
