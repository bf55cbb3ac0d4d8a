"""Local bundle adjustment: batched Schur-complement Levenberg-Marquardt.

TPU-native replacement for the reference's g2o local BA
(`Optimizer::LocalMapOptimization`, reference: src/Optimizer.cc:3014-3941):
local keyframes free, frontier keyframes fixed, point landmarks marginalized
via the Schur complement, two-stage schedule (5 robust iters, outlier
demotion, 10 plain iters) with chi2 gates 5.991/7.815 and write-back.

Everything is fixed-capacity and batched:
- edges live in a flat table (kf_idx, pt_idx, obs, weight, valid);
- per-block Hessians come from segment-sums over the edge table;
- the reduced camera system S = Hpp - U A U^T is assembled densely
  ((6K, 6K), K <= ~16) — tiny, so the solve is a single dense Cholesky-ish
  `jnp.linalg.solve` while the heavy work (residuals/Jacobians/contractions)
  is MXU-friendly batched einsum over up to tens of thousands of edges.

The distributed variant shards the edge table and psum-reduces the
accumulated blocks (parallel/dist_lm.py pattern; SURVEY.md §5.8).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import sym_eig
from ..geometry import se3
from ..geometry.camera import Intrinsics
from . import residuals


class BAProblem(NamedTuple):
    """Fixed-capacity local BA problem.

    The landmark table `pt_X` holds point landmarks AND line endpoints (the
    reference also models line endpoints as two marginalized
    `VertexSBAPointXYZ`, src/Optimizer.cc:3368-3378). Point edges carry
    (u, v, u_r) reprojection residuals; line edges tie one landmark (an
    endpoint) to an observed 2D infinite line with a 1-D distance residual
    (`DistPt2Line2DMultiFrame`, include/g2oMSC.h:561).
    """

    kf_T_cw: jnp.ndarray  # (K, 4, 4)
    kf_free: jnp.ndarray  # (K,) bool — False: fixed frontier / invalid
    pt_X: jnp.ndarray  # (P, 3) landmarks: points + line endpoints
    pt_valid: jnp.ndarray  # (P,) bool
    e_kf: jnp.ndarray  # (E,) int32
    e_pt: jnp.ndarray  # (E,) int32
    e_obs: jnp.ndarray  # (E, 3) (u, v, u_r)
    e_stereo: jnp.ndarray  # (E,) bool
    e_inv_sigma2: jnp.ndarray  # (E,)
    e_valid: jnp.ndarray  # (E,) bool
    # Line-endpoint edges (empty arrays when lines are off).
    le_kf: jnp.ndarray  # (El,) int32
    le_lm: jnp.ndarray  # (El,) int32 landmark row (an endpoint)
    le_line2d: jnp.ndarray  # (El, 3) normalized (a, b, c)
    le_inv_sigma2: jnp.ndarray  # (El,)
    le_valid: jnp.ndarray  # (El,) bool
    # Line-axis parallelism edges (reference: ParEptsNVector3DSingleFrame,
    # include/g2oMSC.h:123, added per Manhattan-assigned map line in
    # LocalMapOptimization, src/Optimizer.cc:3382-3410). A binary edge
    # between a line's two endpoint landmarks: residual cross(dir, axis).
    # The endpoints coupled by such an edge are solved as one 6-dof
    # landmark block in the Schur complement (the reference instead leaves
    # those endpoints unmarginalized; pairing keeps our reduced camera
    # system identical in size).
    lp_s: jnp.ndarray | None = None  # (Lc,) start endpoint landmark row
    lp_e: jnp.ndarray | None = None  # (Lc,) end endpoint landmark row
    lp_axis: jnp.ndarray | None = None  # (Lc, 3) world Manhattan axis
    lp_w: jnp.ndarray | None = None  # (Lc,) information (0 = no axis edge)
    lp_valid: jnp.ndarray | None = None  # (Lc,) pair exists
    # Cross-line par/perp structural edges (reference: the multi-frame
    # par/perp edges Par2DVectors/EptsNVector 3DMultiFrame,
    # include/g2oMSC.h:332-559, built from each map line's accumulated
    # par/perp observation maps). A pair couples two lines' directions:
    # parallel -> cross(dir_a, dir_b) = 0, perpendicular ->
    # dot(dir_a, dir_b) = 0. Residuals and gradients are exact; the
    # landmark-landmark Hessian cross blocks between the two lines are
    # dropped (block-Jacobi curvature) so the Schur landmark structure
    # stays block-diagonal — the LM damping + cost-decrease acceptance
    # still descends the true objective to the same fixed point (the
    # reference instead hands the full sparse system to g2o).
    ll_sa: jnp.ndarray | None = None  # (Lq,) line a start-endpoint row
    ll_ea: jnp.ndarray | None = None  # (Lq,) line a end-endpoint row
    ll_sb: jnp.ndarray | None = None  # (Lq,) line b start-endpoint row
    ll_eb: jnp.ndarray | None = None  # (Lq,) line b end-endpoint row
    ll_kind: jnp.ndarray | None = None  # (Lq,) 0 = parallel, 1 = perpendicular
    ll_w: jnp.ndarray | None = None  # (Lq,) information
    ll_valid: jnp.ndarray | None = None  # (Lq,) bool
    # Per-KF Manhattan axis anchors (see solve/lm.py pose_optimization):
    # row a of kf_axes_c[k] is the axis direction measured in KF k's camera
    # frame, kf_axes_w rows the matching world directions, kf_w_axis the
    # per-axis information (0 disables). Reprojection-only BA shares the
    # per-frame (t_x, r_y) planar-view valley; these absolute anchors pin
    # the window's rotations so BA cannot walk keyframes along it.
    kf_axes_c: jnp.ndarray | None = None  # (K, 3, 3)
    kf_axes_w: jnp.ndarray | None = None  # (3, 3)
    kf_w_axis: jnp.ndarray | None = None  # (K, 3)

    @staticmethod
    def empty_line_edges(n: int = 1):
        return dict(
            le_kf=jnp.zeros((n,), jnp.int32),
            le_lm=jnp.zeros((n,), jnp.int32),
            le_line2d=jnp.zeros((n, 3), jnp.float32),
            le_inv_sigma2=jnp.zeros((n,), jnp.float32),
            le_valid=jnp.zeros((n,), bool),
        )


class BAResult(NamedTuple):
    kf_T_cw: jnp.ndarray
    pt_X: jnp.ndarray
    e_inlier: jnp.ndarray  # (E,) bool post-gating
    le_inlier: jnp.ndarray  # (El,) bool
    chi2: jnp.ndarray  # final total inlier chi2


def point_edge_terms(kf_T, pt_X, e_kf, e_pt, e_obs, e_stereo, e_inv_sigma2, intr):
    """Residuals r (E,3), pose Jacobian Jp (E,3,6), point Jacobian Jx (E,3,3),
    per-edge chi2, and depth validity. Explicit-array form shared with the
    distributed solver (parallel/dist_ba.py)."""
    T_e = kf_T[e_kf]  # (E, 4, 4)
    X_e = pt_X[e_pt]  # (E, 3)
    r, Jp, z = residuals.point_stereo_residual(T_e, X_e, e_obs, intr)
    comp = jnp.stack(
        [
            jnp.ones_like(e_inv_sigma2),
            jnp.ones_like(e_inv_sigma2),
            e_stereo.astype(r.dtype),
        ],
        axis=-1,
    )
    # d X_c / d X_w = R of the edge's keyframe.
    R_e = T_e[:, :3, :3]
    # Jp = Jproj @ [I | -hat(X_c)]; the point Jacobian is Jproj @ R.
    # Recover Jproj from Jp's translation block (first 3 columns = Jproj).
    Jproj = Jp[:, :, :3]
    Jx = Jproj @ R_e
    chi2 = jnp.sum(r * r * comp, axis=-1) * e_inv_sigma2
    okd = z > 1e-3
    return r, Jp, Jx, comp, chi2, okd


def _edge_terms(prob: BAProblem, kf_T, pt_X, intr):
    return point_edge_terms(
        kf_T, pt_X, prob.e_kf, prob.e_pt, prob.e_obs, prob.e_stereo,
        prob.e_inv_sigma2, intr,
    )


def line_edge_terms(kf_T, pt_X, le_kf, le_lm, le_line2d, le_inv_sigma2, intr):
    """1-D point-to-2D-line residuals for line-endpoint edges."""
    T_e = kf_T[le_kf]
    X_e = pt_X[le_lm]
    r, Jp, z = residuals.line_endpoint_residual(T_e, X_e, le_line2d, intr)
    # point Jacobian = a-weighted proj rows @ R (recover from Jp's trans block)
    R_e = T_e[:, :3, :3]
    Jx = Jp[:, :, :3] @ R_e  # (El, 1, 3)
    chi2 = (r[..., 0] ** 2) * le_inv_sigma2
    return r, Jp, Jx, chi2, z > 1e-3


def _line_edge_terms(prob: BAProblem, kf_T, pt_X, intr):
    return line_edge_terms(
        kf_T, pt_X, prob.le_kf, prob.le_lm, prob.le_line2d,
        prob.le_inv_sigma2, intr,
    )


def _build_blocks(
    prob: BAProblem, kf_T, pt_X, intr, e_active, le_active, robust, delta_e, delta_l
):
    """Accumulate Hpp (K,6,6), U (P,K,6,3), Hll (P,3,3), b_p (K,6), b_l (P,3)."""
    r, Jp, Jx, comp, chi2, okd = _edge_terms(prob, kf_T, pt_X, intr)
    w = jnp.where(e_active & okd, prob.e_inv_sigma2, 0.0)
    if robust:
        w = w * jnp.minimum(1.0, delta_e / jnp.sqrt(jnp.maximum(chi2, 1e-12)))
    Wc = w[:, None] * comp  # (E, 3)

    K = prob.kf_T_cw.shape[0]
    P = prob.pt_X.shape[0]
    Hpp_e = jnp.einsum("eki,ek,ekj->eij", Jp, Wc, Jp)  # (E, 6, 6)
    Hll_e = jnp.einsum("eki,ek,ekj->eij", Jx, Wc, Jx)  # (E, 3, 3)
    U_e = jnp.einsum("eki,ek,ekj->eij", Jp, Wc, Jx)  # (E, 6, 3)
    bp_e = jnp.einsum("eki,ek->ei", Jp, Wc * r)  # (E, 6)
    bl_e = jnp.einsum("eki,ek->ei", Jx, Wc * r)  # (E, 3)

    Hpp = jnp.zeros((K, 6, 6)).at[prob.e_kf].add(Hpp_e)
    Hll = jnp.zeros((P, 3, 3)).at[prob.e_pt].add(Hll_e)
    U = jnp.zeros((P, K, 6, 3)).at[prob.e_pt, prob.e_kf].add(U_e)
    bp = jnp.zeros((K, 6)).at[prob.e_kf].add(bp_e)
    bl = jnp.zeros((P, 3)).at[prob.e_pt].add(bl_e)
    total_chi2 = jnp.sum(jnp.where(e_active & okd, chi2, 0.0))

    # Line-endpoint edges fold into the same blocks.
    rl, Jpl, Jxl, chi2l, okdl = _line_edge_terms(prob, kf_T, pt_X, intr)
    wl = jnp.where(le_active & okdl, prob.le_inv_sigma2, 0.0)
    if robust:
        wl = wl * jnp.minimum(1.0, delta_l / jnp.sqrt(jnp.maximum(chi2l, 1e-12)))
    Wl = wl[:, None]  # (El, 1)
    Hpp = Hpp.at[prob.le_kf].add(jnp.einsum("eki,ek,ekj->eij", Jpl, Wl, Jpl))
    Hll = Hll.at[prob.le_lm].add(jnp.einsum("eki,ek,ekj->eij", Jxl, Wl, Jxl))
    U = U.at[prob.le_lm, prob.le_kf].add(jnp.einsum("eki,ek,ekj->eij", Jpl, Wl, Jxl))
    bp = bp.at[prob.le_kf].add(jnp.einsum("eki,ek->ei", Jpl, Wl * rl))
    bl = bl.at[prob.le_lm].add(jnp.einsum("eki,ek->ei", Jxl, Wl * rl))
    total_chi2 = total_chi2 + jnp.sum(jnp.where(le_active & okdl, chi2l, 0.0))

    if prob.kf_axes_c is not None:
        r_ax, J_ax = _axis_anchor_terms(prob, kf_T)
        wa = prob.kf_w_axis  # (K, 3)
        Hpp = Hpp.at[:, 3:, 3:].add(
            jnp.einsum("kaci,ka,kacj->kij", J_ax, wa, J_ax)
        )
        bp = bp.at[:, 3:].add(
            jnp.einsum("kaci,kac->ki", J_ax, wa[:, :, None] * r_ax)
        )
        total_chi2 = total_chi2 + jnp.sum(wa * jnp.sum(r_ax * r_ax, axis=-1))

    if prob.ll_sa is not None:
        r_ll, J_ea, J_eb, w_ll, chi2_ll = _line_pair_terms(prob, pt_X)
        HJa = jnp.einsum("lab,l,lac->lbc", J_ea, w_ll, J_ea)
        HJb = jnp.einsum("lab,l,lac->lbc", J_eb, w_ll, J_eb)
        g_a = jnp.einsum("lab,la->lb", J_ea, w_ll[:, None] * r_ll)
        g_b = jnp.einsum("lab,la->lb", J_eb, w_ll[:, None] * r_ll)
        # Diagonal (block-Jacobi) curvature only — see BAProblem.ll_* note.
        Hll = Hll.at[prob.ll_ea].add(HJa).at[prob.ll_sa].add(HJa)
        Hll = Hll.at[prob.ll_eb].add(HJb).at[prob.ll_sb].add(HJb)
        bl = bl.at[prob.ll_ea].add(g_a).at[prob.ll_sa].add(-g_a)
        bl = bl.at[prob.ll_eb].add(g_b).at[prob.ll_sb].add(-g_b)
        total_chi2 = total_chi2 + jnp.sum(chi2_ll)

    Hx = None
    if prob.lp_s is not None:
        r_lp, Je, w_lp, chi2_lp = _line_axis_terms(prob, pt_X)
        # J wrt end = Je, wrt start = -Je; fold into landmark blocks + the
        # start-end cross block consumed by the paired Schur solve.
        HJ = jnp.einsum("lab,l,lcb->lac", Je, w_lp, Je)  # (Lc, 3, 3)
        Hll = Hll.at[prob.lp_s].add(HJ)
        Hll = Hll.at[prob.lp_e].add(HJ)
        Hx = -HJ  # d(start) x d(end) cross block
        g_e = jnp.einsum("lab,la->lb", Je, w_lp[:, None] * r_lp)
        bl = bl.at[prob.lp_e].add(g_e)
        bl = bl.at[prob.lp_s].add(-g_e)
        total_chi2 = total_chi2 + jnp.sum(chi2_lp)
    return Hpp, Hll, Hx, U, bp, bl, total_chi2


def line_pair_terms_x(Xsa, Xea, Xsb, Xeb, ll_kind, ll_w, ll_valid):
    """Cross-line par/perp residuals r (Lq, 3), per-endpoint Jacobians
    (J_ea, J_eb — start endpoints are their negations), weights, chi2.
    Parallel: r = cross(da, db); perpendicular: r = (da.db, 0, 0).
    Explicit endpoint-position form shared with the distributed solver."""
    va, vb = Xea - Xsa, Xeb - Xsb
    na = jnp.linalg.norm(va, axis=-1)
    nb = jnp.linalg.norm(vb, axis=-1)
    da = va / jnp.maximum(na, 1e-6)[:, None]
    db = vb / jnp.maximum(nb, 1e-6)[:, None]
    perp = (ll_kind == 1)
    r_par = jnp.cross(da, db)
    dot = jnp.sum(da * db, axis=-1)
    r_perp = jnp.concatenate(
        [dot[:, None], jnp.zeros((dot.shape[0], 2))], axis=-1
    )
    r = jnp.where(perp[:, None], r_perp, r_par)
    # d r / d da: par -> -hat(db); perp -> row0 = db.
    z = jnp.zeros_like(da)
    J_da = jnp.where(
        perp[:, None, None],
        jnp.stack([db, z, z], axis=-2),
        -_hat3(db),
    )
    J_db = jnp.where(
        perp[:, None, None],
        jnp.stack([da, z, z], axis=-2),
        _hat3(da),
    )
    Pa = (
        jnp.eye(3)[None] - da[:, :, None] * da[:, None, :]
    ) / jnp.maximum(na, 1e-6)[:, None, None]
    Pb = (
        jnp.eye(3)[None] - db[:, :, None] * db[:, None, :]
    ) / jnp.maximum(nb, 1e-6)[:, None, None]
    J_ea = jnp.einsum("lab,lbc->lac", J_da, Pa)
    J_eb = jnp.einsum("lab,lbc->lac", J_db, Pb)
    ok = ll_valid & (na > 1e-3) & (nb > 1e-3)
    w = jnp.where(ok, ll_w, 0.0)
    chi2 = w * jnp.sum(r * r, axis=-1)
    return r, J_ea, J_eb, w, chi2


def _line_pair_terms(prob: BAProblem, pt_X):
    return line_pair_terms_x(
        pt_X[prob.ll_sa], pt_X[prob.ll_ea], pt_X[prob.ll_sb], pt_X[prob.ll_eb],
        prob.ll_kind, prob.ll_w, prob.ll_valid,
    )


def line_axis_terms_x(Xs, Xe, lp_axis, lp_w, lp_valid):
    """cross(unit(end-start), axis) residuals (Lc, 3), the Jacobian wrt the
    END endpoint (start is its negation), effective weights, and chi2."""
    d = Xe - Xs
    nrm = jnp.linalg.norm(d, axis=-1)
    dn = d / jnp.maximum(nrm, 1e-6)[:, None]
    a = lp_axis
    r = jnp.cross(dn, a)  # |r| = sin(angle to axis)
    # dr/d dn = -hat(a); d dn/d d = (I - dn dn^T)/|d|; dr/dXe = chain.
    P_t = (
        jnp.eye(3)[None] - dn[:, :, None] * dn[:, None, :]
    ) / jnp.maximum(nrm, 1e-6)[:, None, None]
    Je = -jnp.einsum("lab,lbc->lac", _hat3(a), P_t)
    ok = lp_valid & (nrm > 1e-3)
    w = jnp.where(ok, lp_w, 0.0)
    chi2 = w * jnp.sum(r * r, axis=-1)
    return r, Je, w, chi2


def _line_axis_terms(prob: BAProblem, pt_X):
    return line_axis_terms_x(
        pt_X[prob.lp_s], pt_X[prob.lp_e], prob.lp_axis, prob.lp_w, prob.lp_valid
    )


def _hat3(v):
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def axis_anchor_terms_x(kf_T, kf_axes_c, kf_axes_w):
    """Per-KF axis-direction anchor residuals r (K,3,3) and rotation-block
    Jacobians -hat(v) (K,3,3,3); v_{k,a} = R_k a_w,a."""
    R = kf_T[:, :3, :3]
    V = jnp.einsum("kij,aj->kai", R, kf_axes_w)  # (K, 3axes, 3)
    r_ax = V - kf_axes_c
    J_ax = -se3.hat(V)
    return r_ax, J_ax


def _axis_anchor_terms(prob: BAProblem, kf_T):
    return axis_anchor_terms_x(kf_T, prob.kf_axes_c, prob.kf_axes_w)


def _chi2_total(prob: BAProblem, kf_T, pt_X, intr, e_active, le_active):
    *_, chi2, okd = _edge_terms(prob, kf_T, pt_X, intr)
    t = jnp.sum(jnp.where(e_active & okd, chi2, 0.0))
    *_, chi2l, okdl = _line_edge_terms(prob, kf_T, pt_X, intr)
    t = t + jnp.sum(jnp.where(le_active & okdl, chi2l, 0.0))
    if prob.kf_axes_c is not None:
        r_ax, _ = _axis_anchor_terms(prob, kf_T)
        t = t + jnp.sum(prob.kf_w_axis * jnp.sum(r_ax * r_ax, axis=-1))
    if prob.lp_s is not None:
        *_, chi2_lp = _line_axis_terms(prob, pt_X)
        t = t + jnp.sum(chi2_lp)
    if prob.ll_sa is not None:
        *_, chi2_ll = _line_pair_terms(prob, pt_X)
        t = t + jnp.sum(chi2_ll)
    return t


def _schur_solve(prob, Hpp, Hll, Hx, U, bp, bl, lam):
    """Solve the damped system via Schur complement; returns (dpose (K,6),
    dpt (P,3)). Landmarks coupled by a line-axis edge (prob.lp_*) are
    marginalized as paired 6-dof blocks; all others as independent 3x3."""
    K = Hpp.shape[0]
    P = Hll.shape[0]
    eye3 = jnp.eye(3)
    # ISOTROPIC per-block damping (lam * max diag): a line endpoint's
    # Hessian is near-singular along the 3D line direction (point-to-2D-line
    # edges are invariant to sliding along the line), and per-coordinate
    # Marquardt damping leaves an axis-aligned line's null direction
    # essentially undamped — numerical noise in the gradient then gets
    # amplified by 1/(lam * 1e-6) and endpoints slide metres per solve.
    dmax = jnp.max(jnp.diagonal(Hll, axis1=1, axis2=2), axis=-1)  # (P,)
    Hll_d = Hll + lam * jnp.maximum(dmax, 1e-6)[:, None, None] * eye3
    # Guard unobserved points: make their block identity (their rhs is 0).
    observed = jnp.abs(Hll).sum(axis=(1, 2)) > 1e-9
    Hll_d = jnp.where(observed[:, None, None], Hll_d, jnp.eye(3))
    A = sym_eig.inv3x3(Hll_d)  # (P, 3, 3); closed form, no LU custom call

    paired = prob.lp_s is not None
    if paired:
        s_rows, e_rows = prob.lp_s, prob.lp_e
        pair_ok = prob.lp_valid
        # Exclude pair members from the scalar path (their contribution
        # moves to the 6x6 pair path below).
        in_pair = (
            jnp.zeros((P,), bool)
            .at[s_rows].max(pair_ok)
            .at[e_rows].max(pair_ok)
        )
        A = jnp.where(in_pair[:, None, None], 0.0, A)

    T1 = jnp.einsum("pkab,pbc->pkac", U, A)  # (P, K, 6, 3)
    S = -jnp.einsum("pkac,pmdc->kmad", T1, U)  # (K, K, 6, 6)

    if paired:
        # 6x6 pair blocks [[H_ss, Hx], [Hx^T, H_ee]] (damping already on
        # the diagonal via Hll_d; the cross block is not damped).
        H6 = jnp.zeros((s_rows.shape[0], 6, 6))
        H6 = H6.at[:, :3, :3].set(Hll_d[s_rows])
        H6 = H6.at[:, 3:, 3:].set(Hll_d[e_rows])
        H6 = H6.at[:, :3, 3:].set(Hx)
        H6 = H6.at[:, 3:, :3].set(Hx.transpose(0, 2, 1))
        pair_obs = pair_ok & (
            observed[s_rows] | observed[e_rows] | (prob.lp_w > 0)
        )
        H6 = jnp.where(pair_obs[:, None, None], H6, jnp.eye(6))
        # 6x6 pair blocks stay on the LU path: Lc is small, and the
        # blocked-3x3 form loses accuracy on near-singular pair blocks.
        A6 = jnp.linalg.inv(H6)  # (Lc, 6, 6)
        A6 = jnp.where(pair_obs[:, None, None], A6, 0.0)
        U6 = jnp.concatenate([U[s_rows], U[e_rows]], axis=-1)  # (Lc, K, 6, 6)
        bl6 = jnp.concatenate([bl[s_rows], bl[e_rows]], axis=-1)  # (Lc, 6)
        T16 = jnp.einsum("lkab,lbc->lkac", U6, A6)
        S = S - jnp.einsum("lkac,lmdc->kmad", T16, U6)
    # Add Hpp on the diagonal + damping.
    diag = Hpp + lam * jnp.eye(6) * jnp.maximum(
        jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-6
    )[:, :, None] * jnp.eye(6)
    S = S.at[jnp.arange(K), jnp.arange(K)].add(diag)
    b_red = bp - jnp.einsum("pkac,pc->ka", T1, bl)  # (K, 6)
    if paired:
        b_red = b_red - jnp.einsum("lkac,lc->ka", T16, bl6)

    # Gauge handling: fixed keyframes get identity rows/cols, zero rhs.
    free = prob.kf_free
    fmask = free[:, None] & free[None, :]
    S = jnp.where(fmask[:, :, None, None], S, 0.0)
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        jnp.where(free, 0.0, 1.0)[:, None, None] * jnp.eye(6)
    )
    b_red = jnp.where(free[:, None], b_red, 0.0)

    S_dense = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    S_dense = S_dense + 1e-8 * jnp.eye(6 * K)
    dpose = -jnp.linalg.solve(S_dense, b_red.reshape(-1)).reshape(K, 6)
    dpose = jnp.where(free[:, None], dpose, 0.0)

    # Back-substitute landmarks: dl = -A (bl + U^T dpose summed over kfs).
    rhs = bl + jnp.einsum("pkab,ka->pb", U, dpose)
    dpt = -jnp.einsum("pab,pb->pa", A, rhs)
    dpt = jnp.where(observed[:, None], dpt, 0.0)
    if paired:
        rhs6 = bl6 + jnp.einsum("lkab,ka->lb", U6, dpose)
        d6 = -jnp.einsum("lab,lb->la", A6, rhs6)
        d6 = jnp.where(pair_obs[:, None], d6, 0.0)
        dpt = dpt.at[s_rows].add(d6[:, :3])
        dpt = dpt.at[e_rows].add(d6[:, 3:])
    return dpose, dpt


@partial(
    jax.jit,
    static_argnames=("n_iters1", "n_iters2", "chi2_mono", "chi2_stereo", "chi2_line"),
)
def local_bundle_adjustment(
    prob: BAProblem,
    intr: Intrinsics,
    n_iters1: int = 5,
    n_iters2: int = 10,
    chi2_mono: float = 5.991,
    chi2_stereo: float = 7.815,
    chi2_line: float = 3.84,
) -> BAResult:
    """Two-stage local BA with outlier demotion between stages
    (reference: src/Optimizer.cc:3818-3899 optimize(5) -> gate -> optimize(10))."""
    th_e = jnp.where(prob.e_stereo, chi2_stereo, chi2_mono)
    delta_e = jnp.sqrt(th_e)
    delta_l = jnp.sqrt(jnp.asarray(chi2_line))

    def lm_stage(kf_T, pt_X, e_active, le_active, n_iters, robust):
        def body(_, carry):
            kf_T, pt_X, lam = carry
            Hpp, Hll, Hx, U, bp, bl, chi2_cur = _build_blocks(
                prob, kf_T, pt_X, intr, e_active, le_active, robust, delta_e, delta_l
            )
            dpose, dpt = _schur_solve(prob, Hpp, Hll, Hx, U, bp, bl, lam)
            kf_T_new = se3.exp_se3(dpose) @ kf_T
            pt_X_new = pt_X + dpt
            chi2_new = _chi2_total(prob, kf_T_new, pt_X_new, intr, e_active, le_active)
            finite = jnp.all(jnp.isfinite(kf_T_new)) & jnp.all(jnp.isfinite(pt_X_new))
            accept = (chi2_new < chi2_cur) & finite
            kf_T = jnp.where(accept, kf_T_new, kf_T)
            pt_X = jnp.where(accept, pt_X_new, pt_X)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7), jnp.minimum(lam * 5.0, 1e5))
            return kf_T, pt_X, lam

        kf_T, pt_X, _ = jax.lax.fori_loop(
            0, n_iters, body, (kf_T, pt_X, jnp.asarray(1e-4))
        )
        return kf_T, pt_X

    e_active = prob.e_valid & prob.pt_valid[prob.e_pt]
    le_active = prob.le_valid & prob.pt_valid[prob.le_lm]
    kf_T, pt_X = lm_stage(prob.kf_T_cw, prob.pt_X, e_active, le_active, n_iters1, True)
    # Outlier demotion between stages.
    *_, chi2, okd = _edge_terms(prob, kf_T, pt_X, intr)
    e_active = e_active & (chi2 <= th_e) & okd
    *_, chi2l, okdl = _line_edge_terms(prob, kf_T, pt_X, intr)
    le_active = le_active & (chi2l <= chi2_line) & okdl
    kf_T, pt_X = lm_stage(kf_T, pt_X, e_active, le_active, n_iters2, False)
    # Final gate for write-back (reference erases these observations).
    *_, chi2, okd = _edge_terms(prob, kf_T, pt_X, intr)
    e_inlier = prob.e_valid & (chi2 <= th_e) & okd
    *_, chi2l, okdl = _line_edge_terms(prob, kf_T, pt_X, intr)
    le_inlier = prob.le_valid & (chi2l <= chi2_line) & okdl
    total = jnp.sum(jnp.where(e_inlier, chi2, 0.0)) + jnp.sum(
        jnp.where(le_inlier, chi2l, 0.0)
    )
    return BAResult(kf_T, pt_X, e_inlier, le_inlier, total)
