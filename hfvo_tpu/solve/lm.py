"""Pose-only Levenberg-Marquardt over batched point/line edges.

TPU-native replacement for the reference's `Optimizer::PoseOptimization`
(reference: src/Optimizer.cc:590-1478): a g2o LM solve over unary edges with
4 rounds x 10 iterations, per-round chi2 outlier gating (5.991 mono / 7.815
stereo / 3.84 line), Huber kernels in the first two rounds only, and outlier
recovery in later rounds. Here the graph is a fixed-capacity edge table and
each LM iteration is one batched residual/Jacobian evaluation + a 6x6 solve —
no sparsity machinery needed for a single pose vertex.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Intrinsics
from . import residuals


class PoseObs(NamedTuple):
    """Fixed-capacity unary point-edge table for one frame.

    obs rows are (u, v, u_r); `is_stereo` zeroes the u_r component for mono
    edges. `inv_sigma2` is the per-edge information scale (1/1.2^(2*octave)).

    `X_c_obs` (optional) carries the depth-measured 3D point in the camera
    frame for a direct 3D alignment residual `T X_w - X_c_obs`. Pure image
    residuals are degenerate along the (t_x, r_y)/(t_y, r_x) valleys when
    all features lie near one fronto-parallel plane (the displacement of
    every pixel cancels at the plane depth, and u_r only resists with
    ~bf/z^2 leverage); the metric 3D term breaks that valley with the full
    depth information RGB-D actually provides.
    """

    X_w: jnp.ndarray  # (N, 3)
    obs: jnp.ndarray  # (N, 3)
    is_stereo: jnp.ndarray  # (N,) bool
    inv_sigma2: jnp.ndarray  # (N,)
    valid: jnp.ndarray  # (N,) bool
    X_c_obs: jnp.ndarray | None = None  # (N, 3) depth-measured camera points
    valid_3d: jnp.ndarray | None = None  # (N,) restrict 3D edges (default is_stereo)


class LineObs(NamedTuple):
    """Line-endpoint edges: both 3D endpoints against the observed 2D line.

    (reference: EdgeLineProjectXYZOnlyPose, include/EdgeLine.h:155 — each map
    line contributes two point-to-2D-line unary edges.)
    """

    X_w: jnp.ndarray  # (M, 3) an endpoint
    line2d: jnp.ndarray  # (M, 3) normalized (a, b, c)
    inv_sigma2: jnp.ndarray  # (M,)
    valid: jnp.ndarray  # (M,) bool


class DirObs(NamedTuple):
    """Line-direction (vanishing-point) edges: the direction of a matched
    map line, rotated by the pose, against the direction measured from the
    frame's depth-fitted 3D line (reference: DistVp2VpOnlyPose,
    include/g2oMSC.h:766-848, built per matched map line in
    PoseOptimization, src/Optimizer.cc:820-860). Translation-free — a pure
    rotation constraint. The reference compares normalized image
    vanishing points; the camera-frame direction chord cross(R d_w, d_c)
    is the same constraint to first order with an analytic Jacobian.
    """

    d_w: jnp.ndarray  # (V, 3) map-line direction, world frame (unit)
    d_c: jnp.ndarray  # (V, 3) observed 3D-line direction, camera frame (unit)
    inv_sigma2: jnp.ndarray  # (V,)
    valid: jnp.ndarray  # (V,) bool


class PlaneObs(NamedTuple):
    """Plane edges for pose optimization (reference: EdgePlaneOnlyPose,
    EdgeParallelPlaneOnlyPose, EdgeVerticalPlaneOnlyPose in g2oAddition/,
    built by PoseOptimization, src/Optimizer.cc:900-1000).

    kind: 0 full (az, el, d), 1 parallel, 2 vertical. weight carries the
    per-component information (angle_info, angle_info, distance_info) for
    full edges / (parallel|vertical_info, 0, 0) for constraint edges.
    """

    pi_w: jnp.ndarray  # (P, 4) map plane, world, unit normal
    pi_obs: jnp.ndarray  # (P, 4) observed plane, camera frame
    kind: jnp.ndarray  # (P,) int32
    weight: jnp.ndarray  # (P, 3)
    chi2_th: jnp.ndarray  # (P,) gate (Plane.Chi / Plane.VPChi)
    valid: jnp.ndarray  # (P,)


class PoseOptResult(NamedTuple):
    T_cw: jnp.ndarray  # (4, 4)
    inlier: jnp.ndarray  # (N,) bool point-edge inliers after gating
    line_inlier: jnp.ndarray  # (M,) bool
    plane_inlier: jnp.ndarray  # (P,) bool
    n_inliers: jnp.ndarray  # scalar int32
    chi2: jnp.ndarray  # scalar total inlier chi2


def _empty_line_obs(dtype=jnp.float32) -> LineObs:
    return LineObs(
        X_w=jnp.zeros((1, 3), dtype),
        line2d=jnp.zeros((1, 3), dtype),
        inv_sigma2=jnp.zeros((1,), dtype),
        valid=jnp.zeros((1,), bool),
    )


def _empty_plane_obs(dtype=jnp.float32) -> PlaneObs:
    return PlaneObs(
        pi_w=jnp.concatenate([jnp.ones((1, 1), dtype), jnp.zeros((1, 3), dtype)], axis=1),
        pi_obs=jnp.concatenate([jnp.ones((1, 1), dtype), jnp.zeros((1, 3), dtype)], axis=1),
        kind=jnp.zeros((1,), jnp.int32),
        weight=jnp.zeros((1, 3), dtype),
        chi2_th=jnp.ones((1,), dtype),
        valid=jnp.zeros((1,), bool),
    )


# All term helpers use the lane-major ("_t") residual variants: Jacobians
# arrive as (k, 6, N) with edges on lanes, so the per-iteration H/g builds
# below contract as (6, kN) @ (kN, 6) at full lane width. The (N, 3, 6)
# layout tiled its (3, 6) minor dims to 4x128 TPU blocks and made each LM
# iteration's elementwise fusions ~10x slower than the math requires
# (measured ~1.3 ms/step of the batch-8 tracker in J assembly alone).


def _point_terms(T, pts: PoseObs, intr):
    r, Jt, z = residuals.point_stereo_terms_t(T, pts.X_w, pts.obs, intr)
    one = jnp.ones_like(pts.inv_sigma2)
    comp = jnp.stack([one, one, pts.is_stereo.astype(r.dtype)], axis=0)
    chi2 = jnp.sum(r * r * comp, axis=0) * pts.inv_sigma2
    ok_depth = z > 1e-3
    return r, Jt, comp, chi2, ok_depth


def _point3d_terms(T, pts: PoseObs, inv_sigma2_3d: float):
    """Metric 3D alignment residual r = T X_w - X_c_obs: (3, N)."""
    r, Jt = residuals.point3d_terms_t(T, pts.X_w, pts.X_c_obs)
    has = pts.is_stereo if pts.valid_3d is None else pts.valid_3d
    chi2 = jnp.sum(r * r, axis=0) * inv_sigma2_3d
    return r, Jt, chi2, has


def _dir_terms(T, dirs: DirObs):
    """Chord residuals R d_w - d_c (3, V) with sign folding (line
    directions are sign-ambiguous); rotation-block Jacobian -hat(R d_w),
    translation block exactly zero."""
    r, Jt = residuals.dir_terms_t(T, dirs.d_w, dirs.d_c)
    chi2 = jnp.sum(r * r, axis=0) * dirs.inv_sigma2
    return r, Jt, chi2


def _line_terms(T, lines: LineObs, intr):
    r, Jt, z = residuals.line_terms_t(T, lines.X_w, lines.line2d, intr)
    chi2 = (r ** 2) * lines.inv_sigma2
    ok_depth = z > 1e-3
    return r, Jt, chi2, ok_depth


def _plane_terms(T, pl: PlaneObs):
    r, Jt, comp = residuals.plane_edge_terms_t(T, pl.pi_w, pl.pi_obs, pl.kind)
    chi2 = jnp.sum(r * r * comp * pl.weight.T, axis=0)
    return r, Jt, comp, chi2


from functools import partial


@partial(
    jax.jit,
    static_argnames=(
        "n_rounds", "n_iters", "chi2_mono", "chi2_stereo", "chi2_line",
        "chi2_3d", "inv_sigma2_3d", "chi2_vp",
    ),
)
def pose_optimization(
    T_cw0: jnp.ndarray,
    pts: PoseObs,
    intr: Intrinsics,
    lines: LineObs | None = None,
    planes: PlaneObs | None = None,
    dirs: DirObs | None = None,
    axes_c: jnp.ndarray | None = None,
    axes_w: jnp.ndarray | None = None,
    w_axis: jnp.ndarray | float = 0.0,
    n_rounds: int = 4,
    n_iters: int = 10,
    chi2_mono: float = 5.991,
    chi2_stereo: float = 7.815,
    chi2_line: float = 3.84,
    chi2_vp: float = 3.84,
    chi2_3d: float = 7.815,
    inv_sigma2_3d: float = 400.0,  # sigma = 5 cm metric alignment
) -> PoseOptResult:
    """Optimize one camera pose against fixed landmarks.

    Mirrors the reference's round structure: optimize 10 iters, re-classify
    inliers by chi2, repeat 4x; Huber on rounds 0-1, plain least squares
    after (reference: src/Optimizer.cc:1175-1258). When `pts.X_c_obs` is
    given, depth-measured points additionally contribute metric 3D
    alignment residuals (see PoseObs docstring).

    `axes_c`/`axes_w`/`w_axis`: per-axis soft rotation anchors. Row k of
    `axes_c` is a direction measured in the camera frame (e.g. a Manhattan
    axis mean-shifted from scene normals), row k of `axes_w` the matching
    world direction; the residual R_cw a_w - a_c is weighted by w_axis[k]
    (0 disables that axis). Each anchor constrains exactly the 2 rotation
    DOF its observations measure — one wall normal already pins the
    (t_x, r_y)/(t_y, r_x) planar-view valleys that bare reprojection terms
    leave flat — and, being measured absolutely each frame, it is
    drift-free.
    """
    if lines is None:
        lines = _empty_line_obs(T_cw0.dtype)
    if planes is None:
        planes = _empty_plane_obs(T_cw0.dtype)
    use_3d = pts.X_c_obs is not None

    th_pt = jnp.where(pts.is_stereo, chi2_stereo, chi2_mono)
    delta_pt = jnp.sqrt(th_pt)
    delta_ln = jnp.sqrt(jnp.asarray(chi2_line, T_cw0.dtype))
    delta_pl = jnp.sqrt(planes.chi2_th)
    delta_3d = jnp.sqrt(jnp.asarray(chi2_3d, T_cw0.dtype))
    delta_vp = jnp.sqrt(jnp.asarray(chi2_vp, T_cw0.dtype))

    def build_normal_eqs(T, inliers, robust):
        pt_inlier, ln_inlier, pl_inlier, p3_inlier, vp_inlier = inliers
        r, J, comp, chi2, okd = _point_terms(T, pts, intr)
        active = pts.valid & pt_inlier & okd
        w = jnp.where(active, pts.inv_sigma2, 0.0)
        if robust:
            scale = jnp.minimum(1.0, delta_pt / jnp.sqrt(jnp.maximum(chi2, 1e-12)))
            w = w * scale
        Wc = w[None, :] * comp  # (3, N)
        H = jnp.einsum("kin,kn,kjn->ij", J, Wc, J)
        g = jnp.einsum("kin,kn->i", J, Wc * r)
        total = jnp.sum(jnp.where(active, chi2, 0.0))

        rl, Jl, chi2l, okdl = _line_terms(T, lines, intr)
        activel = lines.valid & ln_inlier & okdl
        wl = jnp.where(activel, lines.inv_sigma2, 0.0)
        if robust:
            scalel = jnp.minimum(1.0, delta_ln / jnp.sqrt(jnp.maximum(chi2l, 1e-12)))
            wl = wl * scalel
        H = H + jnp.einsum("in,n,jn->ij", Jl, wl, Jl)
        g = g + jnp.einsum("in,n->i", Jl, wl * rl)
        total = total + jnp.sum(jnp.where(activel, chi2l, 0.0))

        rp, Jp, compp, chi2p = _plane_terms(T, planes)
        activep = planes.valid & pl_inlier
        wp = jnp.where(activep[None, :], planes.weight.T * compp, 0.0)  # (3, P)
        if robust:
            scalep = jnp.minimum(1.0, delta_pl / jnp.sqrt(jnp.maximum(chi2p, 1e-12)))
            wp = wp * scalep[None, :]
        H = H + jnp.einsum("kin,kn,kjn->ij", Jp, wp, Jp)
        g = g + jnp.einsum("kin,kn->i", Jp, wp * rp)
        total = total + jnp.sum(jnp.where(activep, chi2p, 0.0))

        if use_3d:
            r3, J3, chi23, has3 = _point3d_terms(T, pts, inv_sigma2_3d)
            active3 = pts.valid & has3 & p3_inlier
            w3 = jnp.where(active3, jnp.asarray(inv_sigma2_3d, T.dtype), 0.0)
            if robust:
                scale3 = jnp.minimum(1.0, delta_3d / jnp.sqrt(jnp.maximum(chi23, 1e-12)))
                w3 = w3 * scale3
            H = H + jnp.einsum("kin,n,kjn->ij", J3, w3, J3)
            g = g + jnp.einsum("kin,kn->i", J3, w3[None, :] * r3)
            total = total + jnp.sum(jnp.where(active3, chi23, 0.0))

        if dirs is not None:
            rv, Jv, chi2v = _dir_terms(T, dirs)
            activev = dirs.valid & vp_inlier
            wv = jnp.where(activev, dirs.inv_sigma2, 0.0)
            if robust:
                scalev = jnp.minimum(
                    1.0, delta_vp / jnp.sqrt(jnp.maximum(chi2v, 1e-12))
                )
                wv = wv * scalev
            H = H + jnp.einsum("kin,n,kjn->ij", Jv, wv, Jv)
            g = g + jnp.einsum("kin,kn->i", Jv, wv[None, :] * rv)
            total = total + jnp.sum(jnp.where(activev, chi2v, 0.0))

        if axes_c is not None:
            # v_k = R_cw a_w,k; r_k = v_k - a_c,k; for T_new = exp(xi) T the
            # rotation-block Jacobian is -hat(v_k), translation block zero.
            V = axes_w @ T[:3, :3].T  # (3, 3) rows = predicted directions
            r_ax = V - axes_c  # (3, 3)
            J_ax = -se3.hat(V)  # (3, 3, 3)
            wa = jnp.broadcast_to(jnp.asarray(w_axis, T.dtype), (3,))
            H = H.at[3:, 3:].add(jnp.einsum("aki,a,akj->ij", J_ax, wa, J_ax))
            g = g.at[3:].add(jnp.einsum("aki,ak->i", J_ax, wa[:, None] * r_ax))
            total = total + jnp.sum(wa * jnp.sum(r_ax * r_ax, axis=-1))
        return H, g, total

    def eval_chi2(T, inliers):
        pt_inlier, ln_inlier, pl_inlier, p3_inlier, vp_inlier = inliers
        _, _, _, chi2, okd = _point_terms(T, pts, intr)
        active = pts.valid & pt_inlier & okd
        t1 = jnp.sum(jnp.where(active, chi2, 0.0))
        _, _, chi2l, okdl = _line_terms(T, lines, intr)
        activel = lines.valid & ln_inlier & okdl
        t1 = t1 + jnp.sum(jnp.where(activel, chi2l, 0.0))
        *_, chi2p = _plane_terms(T, planes)
        activep = planes.valid & pl_inlier
        t1 = t1 + jnp.sum(jnp.where(activep, chi2p, 0.0))
        if use_3d:
            _, _, chi23, has3 = _point3d_terms(T, pts, inv_sigma2_3d)
            active3 = pts.valid & has3 & p3_inlier
            t1 = t1 + jnp.sum(jnp.where(active3, chi23, 0.0))
        if dirs is not None:
            *_, chi2v = _dir_terms(T, dirs)
            activev = dirs.valid & vp_inlier
            t1 = t1 + jnp.sum(jnp.where(activev, chi2v, 0.0))
        if axes_c is not None:
            r_ax = axes_w @ T[:3, :3].T - axes_c
            wa = jnp.broadcast_to(jnp.asarray(w_axis, T.dtype), (3,))
            t1 = t1 + jnp.sum(wa * jnp.sum(r_ax * r_ax, axis=-1))
        return t1

    def lm_round(T0, inliers, robust):
        # Deferred-accept LM: each iteration runs ONE full residual/Jacobian
        # evaluation (at the pending candidate) instead of two (classic
        # build-at-T + eval-at-T_new). The candidate's H, g double as its
        # acceptance chi2 AND, if accepted, the next proposal's normal
        # equations; on rejection the stored (H, g) of the best pose are
        # reused instead of rebuilding them at the unchanged pose. The
        # visited (pose, lambda) sequence is identical to the classic loop —
        # only redundant recomputation is dropped (measured ~2x on the
        # fused step's pose stage).
        def propose(T, H, g, lam):
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6, dtype=H.dtype)
            delta = -jnp.linalg.solve(Hd, g)
            return se3.exp_se3(delta) @ T

        H0, g0, chi2_0 = build_normal_eqs(T0, inliers, robust)
        lam0 = jnp.asarray(1e-3, T0.dtype)
        T_try0 = propose(T0, H0, g0, lam0)

        def one_iter(carry):
            done, rej_rel, T_best, H_b, g_b, c_b, lam, T_try = carry
            H, g, c = build_normal_eqs(T_try, inliers, robust)
            ok = (c < c_b) & jnp.all(jnp.isfinite(T_try))
            # Early termination, mirroring g2o Levenberg's stop rule
            # (OptimizationAlgorithmLevenberg: quit when the relative chi2
            # decrease of an ACCEPTED step is negligible): each sequential
            # LM iteration costs ~50 us of kernel-launch latency on TPU
            # regardless of problem size, and steady-state tracking
            # converges in 2-4 steps — running the remaining iterations
            # moves the pose by < 1e-6 relative chi2.
            # Convergence = an ACCEPTED step with negligible gain. A single
            # rejected near-tie is NOT convergence: an overshooting proposal
            # (Huber-underestimated curvature in robust rounds) can land
            # within the noise floor of the *starting* chi2 while lambda
            # growth + a shorter step would still descend — g2o retries
            # failures with grown lambda. Only after TWO consecutive
            # negligible-margin rejections (lambda grew 16x and the proposal
            # still lands at the optimum's chi2 floor) do we treat the
            # basin as flat and exit.
            rel = jnp.abs(c_b - c) <= 1e-5 * (c_b + 1e-9)
            # Done-MASKED iteration: frozen (identical state) once
            # converged, so two of these can ride one while step — the
            # per-step sync a TPU while_loop pays (~10-15 us) rivals the
            # iteration's math after the lane-major Jacobian rewrite, and
            # a fully unrolled fixed-trip loop over-runs the single-seq
            # case (all 40 round-iterations always execute: measured
            # +0.55 ms/frame). Same visited (pose, lambda) sequence.
            ok = ok & ~done
            rej_rel = jnp.where(
                done, rej_rel, jnp.where(~ok & rel, rej_rel + 1, 0)
            )
            done = done | (ok & rel) | (rej_rel >= 2)
            T_best = jnp.where(ok, T_try, T_best)
            H_b = jnp.where(ok, H, H_b)
            g_b = jnp.where(ok, g, g_b)
            c_b = jnp.where(ok, c, c_b)
            lam = jnp.where(
                done, lam,
                jnp.where(
                    ok, jnp.maximum(lam * 0.5, 1e-7),
                    jnp.minimum(lam * 4.0, 1e4),
                ),
            )
            return (done, rej_rel, T_best, H_b, g_b, c_b, lam,
                    propose(T_best, H_b, g_b, lam))

        def cond(c):
            it, inner = c
            return (it < n_iters) & ~inner[0]

        def body(c):
            it, inner = c
            return it + 2, one_iter(one_iter(inner))

        carry = (jnp.asarray(False), jnp.asarray(0, jnp.int32),
                 T0, H0, g0, chi2_0, lam0, T_try0)
        _, carry = jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), carry)
        )
        return carry[2]

    T = T_cw0
    pt_inlier = jnp.ones_like(pts.valid)
    ln_inlier = jnp.ones_like(lines.valid)
    pl_inlier = jnp.ones_like(planes.valid)
    p3_inlier = jnp.ones_like(pts.valid)
    vp_inlier = (
        jnp.ones_like(dirs.valid) if dirs is not None else jnp.ones((1,), bool)
    )
    for rnd in range(n_rounds):
        inliers = (pt_inlier, ln_inlier, pl_inlier, p3_inlier, vp_inlier)
        T = lm_round(T, inliers, robust=rnd < 2)
        # Re-classify: outliers with chi2 back under threshold recover
        # (reference: Optimizer.cc:1216-1246 e->setLevel(0/1) per round).
        _, _, _, chi2, okd = _point_terms(T, pts, intr)
        pt_inlier = (chi2 <= th_pt) & okd
        _, _, chi2l, okdl = _line_terms(T, lines, intr)
        ln_inlier = (chi2l <= chi2_line) & okdl
        *_, chi2p = _plane_terms(T, planes)
        pl_inlier = chi2p <= planes.chi2_th
        if use_3d:
            _, _, chi23, _ = _point3d_terms(T, pts, inv_sigma2_3d)
            p3_inlier = chi23 <= chi2_3d
        if dirs is not None:
            *_, chi2v = _dir_terms(T, dirs)
            vp_inlier = chi2v <= chi2_vp

    pt_inlier = pt_inlier & pts.valid
    ln_inlier = ln_inlier & lines.valid
    pl_inlier = pl_inlier & planes.valid
    n_in = jnp.sum(pt_inlier.astype(jnp.int32))
    chi2_final = eval_chi2(
        T, (pt_inlier, ln_inlier, pl_inlier, p3_inlier, vp_inlier)
    )
    return PoseOptResult(T, pt_inlier, ln_inlier, pl_inlier, n_in, chi2_final)
