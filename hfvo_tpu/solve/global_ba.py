"""Global bundle adjustment: full-map Schur LM with a matrix-free CG solve.

TPU-native equivalent of `Optimizer::GlobalBundleAdjustemnt`
(reference: src/Optimizer.cc:51-66 -> BundleAdjustment with lines,
src/Optimizer.cc:256-652), which the reference runs on a background thread
after every accepted loop closure
(`LoopClosing::RunGlobalBundleAdjustment`, src/LoopClosing.cc:647-653,
launched at src/LoopClosing.cc:580-581).

The local BA (solve/ba.py) materializes the dense landmark-camera coupling
U (P, K, 6, 3) — fine for a 16-KF window, impossible for the full map
(512 KFs x 10k landmarks ~ 1.2 GB and O(P K^2) Schur assembly). Here the
reduced camera system S = Hpp - sum_p U_p A_p U_p^T is never materialized:

- per-edge blocks U_e = Jp^T W Jx (E, 6, 3) are built once per LM
  iteration (tens of MB at full capacity);
- S @ v is two segment-sums over the edge table per CG step
  (t_p = sum_k U_{p,k}^T v_k, then out_k -= sum_p U_{p,k} A_p t_p) —
  batched einsums the MXU eats;
- CG is preconditioned with the block-Jacobi inverse of the damped Hpp.

Everything is fixed-capacity and jit-compiled once: LM outer loop
(`lax.fori_loop`), CG inner loop (`lax.fori_loop` with a converged mask).
Line endpoints are landmarks with point-to-2D-line edges exactly as in the
local BA; the first (or a caller-chosen) keyframe is the gauge.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sym_eig
from ..geometry import se3
from ..geometry.camera import Intrinsics
from .ba import line_edge_terms, point_edge_terms


class GlobalBAProblem(NamedTuple):
    """Fixed-capacity whole-map BA problem (points + line endpoints)."""

    kf_T_cw: jnp.ndarray  # (K, 4, 4)
    kf_free: jnp.ndarray  # (K,) bool — gauge/invalid rows False
    pt_X: jnp.ndarray  # (P, 3)
    pt_valid: jnp.ndarray  # (P,)
    e_kf: jnp.ndarray  # (E,)
    e_pt: jnp.ndarray  # (E,)
    e_obs: jnp.ndarray  # (E, 3) (u, v, u_r)
    e_stereo: jnp.ndarray  # (E,)
    e_inv_sigma2: jnp.ndarray  # (E,)
    e_valid: jnp.ndarray  # (E,)
    le_kf: jnp.ndarray  # (El,)
    le_lm: jnp.ndarray  # (El,)
    le_line2d: jnp.ndarray  # (El, 3)
    le_inv_sigma2: jnp.ndarray  # (El,)
    le_valid: jnp.ndarray  # (El,)


class GlobalBAResult(NamedTuple):
    kf_T_cw: jnp.ndarray
    pt_X: jnp.ndarray
    e_inlier: jnp.ndarray
    le_inlier: jnp.ndarray
    chi2: jnp.ndarray


def _gba_impl(
    prob: GlobalBAProblem,
    intr: Intrinsics,
    n_iters: int = 10,
    cg_iters: int = 40,
    chi2_mono: float = 5.991,
    chi2_stereo: float = 7.815,
    chi2_line: float = 3.84,
    axis_name: str | None = None,
) -> GlobalBAResult:
    """Robust (Huber-reweighted) LM over the whole map; 10 iterations like
    the reference's post-loop GBA (src/LoopClosing.cc:653).

    With `axis_name`, runs as the per-shard body of a `shard_map` whose
    mesh axis partitions the EDGE tables (keyframe/landmark state is
    replicated): every edge-indexed accumulation is followed by a psum
    over the axis, so each device computes the identical replicated update
    from its edge block (SURVEY.md §5.7/§5.8: map-block partitioned
    distributed global BA; Schur reduction = local partial products +
    collective)."""
    if axis_name is None:
        _ps = lambda x: x  # noqa: E731 — single-device: no collective
    else:
        _ps = lambda x: jax.lax.psum(x, axis_name)  # noqa: E731
    K = prob.kf_T_cw.shape[0]
    P = prob.pt_X.shape[0]
    th_e = jnp.where(prob.e_stereo, chi2_stereo, chi2_mono)
    delta_e = jnp.sqrt(th_e)
    delta_l = float(np.sqrt(chi2_line))
    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)

    e_active = prob.e_valid & prob.pt_valid[prob.e_pt]
    le_active = prob.le_valid & prob.pt_valid[prob.le_lm]

    def terms(kf_T, pt_X):
        return point_edge_terms(
            kf_T, pt_X, prob.e_kf, prob.e_pt, prob.e_obs, prob.e_stereo,
            prob.e_inv_sigma2, intr,
        )

    def lterms(kf_T, pt_X):
        return line_edge_terms(
            kf_T, pt_X, prob.le_kf, prob.le_lm, prob.le_line2d,
            prob.le_inv_sigma2, intr,
        )

    def chi2_total(kf_T, pt_X):
        *_, chi2, okd = terms(kf_T, pt_X)
        t = jnp.sum(jnp.where(e_active & okd, chi2, 0.0))
        *_, chi2l, okdl = lterms(kf_T, pt_X)
        return _ps(t + jnp.sum(jnp.where(le_active & okdl, chi2l, 0.0)))

    def body(_, carry):
        kf_T, pt_X, lam = carry
        r, Jp, Jx, comp, chi2, okd = terms(kf_T, pt_X)
        w = jnp.where(e_active & okd, prob.e_inv_sigma2, 0.0)
        w = w * jnp.minimum(1.0, delta_e / jnp.sqrt(jnp.maximum(chi2, 1e-12)))
        Wc = w[:, None] * comp  # (E, 3)
        # Per-edge blocks (kept — E x small, not P x K x dense).
        U_e = jnp.einsum("eki,ek,ekj->eij", Jp, Wc, Jx)  # (E, 6, 3)
        Hpp = jnp.zeros((K, 6, 6)).at[prob.e_kf].add(
            jnp.einsum("eki,ek,ekj->eij", Jp, Wc, Jp)
        )
        Hll = jnp.zeros((P, 3, 3)).at[prob.e_pt].add(
            jnp.einsum("eki,ek,ekj->eij", Jx, Wc, Jx)
        )
        bp = jnp.zeros((K, 6)).at[prob.e_kf].add(
            jnp.einsum("eki,ek->ei", Jp, Wc * r)
        )
        bl = jnp.zeros((P, 3)).at[prob.e_pt].add(
            jnp.einsum("eki,ek->ei", Jx, Wc * r)
        )
        chi2_cur = jnp.sum(jnp.where(e_active & okd, chi2, 0.0))

        rl, Jpl, Jxl, chi2l, okdl = lterms(kf_T, pt_X)
        wl = jnp.where(le_active & okdl, prob.le_inv_sigma2, 0.0)
        wl = wl * jnp.minimum(
            1.0, delta_l / jnp.sqrt(jnp.maximum(chi2l, 1e-12))
        )
        Wl = wl[:, None]
        Ul_e = jnp.einsum("eki,ek,ekj->eij", Jpl, Wl, Jxl)  # (El, 6, 3)
        Hpp = Hpp.at[prob.le_kf].add(
            jnp.einsum("eki,ek,ekj->eij", Jpl, Wl, Jpl)
        )
        Hll = Hll.at[prob.le_lm].add(
            jnp.einsum("eki,ek,ekj->eij", Jxl, Wl, Jxl)
        )
        bp = bp.at[prob.le_kf].add(jnp.einsum("eki,ek->ei", Jpl, Wl * rl))
        bl = bl.at[prob.le_lm].add(jnp.einsum("eki,ek->ei", Jxl, Wl * rl))
        chi2_cur = chi2_cur + jnp.sum(jnp.where(le_active & okdl, chi2l, 0.0))
        # Edge shards each built partial sums; make the normal equations
        # (and the current cost) replicated before factorization.
        Hpp, Hll, bp, bl, chi2_cur = (
            _ps(Hpp), _ps(Hll), _ps(bp), _ps(bl), _ps(chi2_cur),
        )

        # Damped landmark blocks + their inverses (isotropic damping — see
        # solve.ba._schur_solve on the line-direction null space).
        dmax = jnp.max(jnp.diagonal(Hll, axis1=1, axis2=2), axis=-1)
        Hll_d = Hll + lam * jnp.maximum(dmax, 1e-6)[:, None, None] * eye3
        observed = jnp.abs(Hll).sum(axis=(1, 2)) > 1e-9
        Hll_d = jnp.where(observed[:, None, None], Hll_d, eye3)
        A = sym_eig.inv3x3(Hll_d)  # (P, 3, 3); closed form, no LU custom call

        Hpp_d = Hpp + lam * eye6 * jnp.maximum(
            jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-6
        )[:, :, None] * eye6
        # Gauge: fixed keyframes become identity rows with zero rhs.
        free = prob.kf_free
        Hpp_d = jnp.where(free[:, None, None], Hpp_d, eye6)

        def scatter_lm(t_contrib, idx):
            return jnp.zeros((P, 3)).at[idx].add(t_contrib)

        def S_matvec(v):
            """v (K, 6) -> S v, edge-wise, never materializing S. Two
            collectives per call under sharding: the landmark gather t and
            the keyframe scatter-back."""
            v = jnp.where(free[:, None], v, 0.0)
            out = jnp.einsum("kab,kb->ka", Hpp_d, v)
            # t_p = sum_k U_{p,k}^T v_k
            t = _ps(
                scatter_lm(
                    jnp.einsum("eab,ea->eb", U_e, v[prob.e_kf]), prob.e_pt
                ) + scatter_lm(
                    jnp.einsum("eab,ea->eb", Ul_e, v[prob.le_kf]), prob.le_lm
                )
            )
            wv = jnp.einsum("pab,pb->pa", A, t)
            back = jnp.zeros((K, 6)).at[prob.e_kf].add(
                jnp.einsum("eab,eb->ea", U_e, wv[prob.e_pt])
            ).at[prob.le_kf].add(
                jnp.einsum("eab,eb->ea", Ul_e, wv[prob.le_lm])
            )
            out = out - _ps(back)
            return jnp.where(free[:, None], out, 0.0)

        Abl = jnp.einsum("pab,pb->pa", A, bl)
        b_red = bp - _ps(
            jnp.zeros((K, 6)).at[prob.e_kf].add(
                jnp.einsum("eab,eb->ea", U_e, Abl[prob.e_pt])
            )
            + jnp.zeros((K, 6)).at[prob.le_kf].add(
                jnp.einsum("eab,eb->ea", Ul_e, Abl[prob.le_lm])
            )
        )
        b_red = jnp.where(free[:, None], -b_red, 0.0)  # solve S x = -b_red'

        # Block-Jacobi preconditioned CG on S x = rhs.
        # Preconditioner blocks stay on the LU path: K is small and
        # tail keyframes with few observations make Hpp_d ill-conditioned
        # (the blocked-3x3 form measurably degraded CG convergence there).
        M = jnp.linalg.inv(Hpp_d)  # (K, 6, 6)

        def precond(v):
            return jnp.einsum("kab,kb->ka", M, v)

        rhs = b_red
        x0 = jnp.zeros((K, 6))
        r0 = rhs - S_matvec(x0)
        z0 = precond(r0)
        p0 = z0
        rz0 = jnp.sum(r0 * z0)
        tol2 = 1e-12 * jnp.maximum(jnp.sum(rhs * rhs), 1e-20)

        def cg_body(_, c):
            x, rr, p, rz = c
            live = jnp.sum(rr * rr) > tol2
            Sp = S_matvec(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Sp), 1e-20)
            x_n = x + alpha * p
            r_n = rr - alpha * Sp
            z_n = precond(r_n)
            rz_n = jnp.sum(r_n * z_n)
            beta = rz_n / jnp.maximum(rz, 1e-20)
            p_n = z_n + beta * p
            x = jnp.where(live, x_n, x)
            rr = jnp.where(live, r_n, rr)
            p = jnp.where(live, p_n, p)
            rz = jnp.where(live, rz_n, rz)
            return x, rr, p, rz

        dpose, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, (x0, r0, p0, rz0))
        dpose = jnp.where(free[:, None], dpose, 0.0)

        # Back-substitute landmarks.
        t = _ps(
            scatter_lm(
                jnp.einsum("eab,ea->eb", U_e, dpose[prob.e_kf]), prob.e_pt
            ) + scatter_lm(
                jnp.einsum("eab,ea->eb", Ul_e, dpose[prob.le_kf]), prob.le_lm
            )
        )
        dpt = -jnp.einsum("pab,pb->pa", A, bl + t)
        dpt = jnp.where(observed[:, None], dpt, 0.0)

        kf_T_new = se3.exp_se3(dpose) @ kf_T
        pt_X_new = pt_X + dpt
        chi2_new = chi2_total(kf_T_new, pt_X_new)
        finite = jnp.all(jnp.isfinite(kf_T_new)) & jnp.all(jnp.isfinite(pt_X_new))
        accept = (chi2_new < chi2_cur) & finite
        kf_T = jnp.where(accept, kf_T_new, kf_T)
        pt_X = jnp.where(accept, pt_X_new, pt_X)
        lam = jnp.where(
            accept, jnp.maximum(lam * 0.5, 1e-7), jnp.minimum(lam * 5.0, 1e5)
        )
        return kf_T, pt_X, lam

    kf_T, pt_X, _ = jax.lax.fori_loop(
        0, n_iters, body, (prob.kf_T_cw, prob.pt_X, jnp.asarray(1e-4))
    )
    *_, chi2, okd = terms(kf_T, pt_X)
    e_inlier = prob.e_valid & (chi2 <= th_e) & okd
    *_, chi2l, okdl = lterms(kf_T, pt_X)
    le_inlier = prob.le_valid & (chi2l <= chi2_line) & okdl
    total = _ps(
        jnp.sum(jnp.where(e_inlier, chi2, 0.0))
        + jnp.sum(jnp.where(le_inlier, chi2l, 0.0))
    )
    return GlobalBAResult(kf_T, pt_X, e_inlier, le_inlier, total)


global_bundle_adjustment = partial(
    jax.jit,
    static_argnames=(
        "n_iters", "cg_iters", "chi2_mono", "chi2_stereo", "chi2_line",
        "axis_name",
    ),
)(_gba_impl)


def _pow2(n: int, lo: int = 8) -> int:
    return max(lo, 1 << int(np.ceil(np.log2(max(n, 1)))))


def build_global_ba_problem(
    vomap,
    gauge_kf: int | None = None,
    max_edges: int | None = None,
    max_line_edges: int | None = None,
    pad: bool = True,
):
    """Assemble the whole-map problem from the flat VOMap tables
    (reference gathers all KFs + landmarks, src/Optimizer.cc:52-66).

    Returns (prob, window, upts, ulines) with `window` the KF slots in pose
    order so the caller can write results back. With `pad` (default), all
    capacities are bucketed to powers of two so repeated online runs reuse
    a handful of compiled program signatures."""
    kf = vomap.keyframes
    window = np.nonzero(kf.valid)[0]
    order = np.argsort(kf.order[window], kind="stable")
    window = window[order]
    K = len(window)

    pid = kf.point_id[window]
    ov = kf.obs_valid[window] & (pid >= 0) & vomap.points.valid[np.maximum(pid, 0)]
    k_idx, c_idx = np.nonzero(ov)
    e_pt_global = pid[k_idx, c_idx]
    e_obs = kf.obs[window][k_idx, c_idx]
    e_oct = kf.octave[window][k_idx, c_idx]
    upts, e_pt_local = np.unique(e_pt_global, return_inverse=True)
    if max_edges is not None and len(k_idx) > max_edges:
        sel = np.random.RandomState(0).choice(len(k_idx), max_edges, replace=False)
        k_idx, c_idx = k_idx[sel], c_idx[sel]
        e_pt_local, e_obs, e_oct = e_pt_local[sel], e_obs[sel], e_oct[sel]

    kl = vomap.kf_lines
    lid = kl.line_id[window]
    lov = kl.obs_valid[window] & (lid >= 0) & vomap.lines.valid[np.maximum(lid, 0)]
    lk_idx, lc_idx = np.nonzero(lov)
    le_line_global = lid[lk_idx, lc_idx]
    le_l2d_seg = kl.line2d[window][lk_idx, lc_idx]
    ulines, le_line_local = np.unique(le_line_global, return_inverse=True)
    npt = len(upts)
    nu = len(ulines)
    lm_X = np.concatenate(
        [
            vomap.points.X_w[upts].astype(np.float32),
            vomap.lines.X0_w[ulines].astype(np.float32),
            vomap.lines.X1_w[ulines].astype(np.float32),
        ]
    ) if nu else vomap.points.X_w[upts].astype(np.float32)
    le_kf = np.concatenate([lk_idx, lk_idx]).astype(np.int32)
    le_lm = np.concatenate(
        [npt + le_line_local, npt + nu + le_line_local]
    ).astype(np.int32)
    le_l2d = np.concatenate([le_l2d_seg, le_l2d_seg]).astype(np.float32)
    if max_line_edges is not None and len(le_kf) > max_line_edges:
        le_kf, le_lm, le_l2d = (
            le_kf[:max_line_edges], le_lm[:max_line_edges], le_l2d[:max_line_edges]
        )

    free = np.ones((K,), bool)
    gauge = 0 if gauge_kf is None else int(np.nonzero(window == gauge_kf)[0][0])
    free[gauge] = False

    E = len(k_idx)
    El = len(le_kf)
    n_lm = len(lm_X)
    K_cap = _pow2(K) if pad else K
    E_cap = _pow2(E, 64) if pad else E
    El_cap = _pow2(El, 8) if pad else max(El, 1)
    P_cap = _pow2(n_lm, 64) if pad else n_lm

    def padv(a, n, fill=0):
        out = np.full((n,) + a.shape[1:], fill, a.dtype)
        out[: len(a)] = a
        return out

    T_full = np.tile(np.eye(4, dtype=np.float32), (K_cap, 1, 1))
    T_full[:K] = kf.T_cw[window].astype(np.float32)
    prob = GlobalBAProblem(
        kf_T_cw=jnp.asarray(T_full),
        kf_free=jnp.asarray(padv(free, K_cap)),
        pt_X=jnp.asarray(padv(lm_X, P_cap)),
        pt_valid=jnp.asarray(padv(np.ones(n_lm, bool), P_cap)),
        e_kf=jnp.asarray(padv(k_idx.astype(np.int32), E_cap)),
        e_pt=jnp.asarray(padv(e_pt_local.astype(np.int32), E_cap)),
        e_obs=jnp.asarray(padv(e_obs.astype(np.float32), E_cap)),
        e_stereo=jnp.asarray(padv(e_obs[:, 2] > 0, E_cap)),
        e_inv_sigma2=jnp.asarray(
            padv((1.0 / 1.2 ** (2.0 * e_oct)).astype(np.float32), E_cap)
        ),
        e_valid=jnp.asarray(padv(np.ones(E, bool), E_cap)),
        le_kf=jnp.asarray(padv(le_kf, El_cap)),
        le_lm=jnp.asarray(padv(le_lm, El_cap)),
        le_line2d=jnp.asarray(padv(le_l2d, El_cap) if El else np.zeros((El_cap, 3), np.float32)),
        le_inv_sigma2=jnp.asarray(padv(np.ones(El, np.float32), El_cap)),
        le_valid=jnp.asarray(padv(np.ones(El, bool), El_cap)),
    )
    return prob, window, upts, ulines


def run_global_ba(vomap, intr: Intrinsics, gauge_kf: int | None = None,
                  n_iters: int = 10) -> float:
    """Build, solve, and write back the whole-map BA (reference:
    LoopClosing::RunGlobalBundleAdjustment, src/LoopClosing.cc:647-720,
    including landmark write-back). Returns the final inlier chi2."""
    prob, window, upts, ulines = build_global_ba_problem(vomap, gauge_kf)
    res = jax.device_get(global_bundle_adjustment(prob, intr, n_iters=n_iters))
    vomap.keyframes.T_cw[window] = np.asarray(res.kf_T_cw)[: len(window)]
    lm = np.asarray(res.pt_X)
    npt = len(upts)
    vomap.points.X_w[upts] = lm[:npt]
    if len(ulines):
        nu = len(ulines)
        vomap.lines.X0_w[ulines] = lm[npt : npt + nu]
        vomap.lines.X1_w[ulines] = lm[npt + nu : npt + 2 * nu]
    return float(res.chi2)
