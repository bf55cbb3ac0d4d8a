"""Distributed local bundle adjustment over a device mesh — FULL problem.

The scalable Schur reduction of SURVEY.md §5.8: landmarks (and their edges)
are partitioned into per-device blocks; each device owns its landmark block
end-to-end, so

- Hll, U, bl need NO communication (all edges of a landmark live with it);
- the pose blocks Hpp/bp and the reduced camera system
  S = Hpp - sum_p U_p A_p U_p^T are partial sums -> one `psum` of ~40 KB
  per LM iteration over ICI;
- every device solves the tiny replicated (6K, 6K) system, then
  back-substitutes only its own landmarks (results live sharded).

This version shards EVERY edge family of `solve.ba.BAProblem` (not just
point edges): line-endpoint edges, per-line Manhattan axis pairs (solved as
paired 6-dof landmark blocks per device), cross-line par/perp edges, and
the per-KF axis anchors (replicated; folded into the pose system after the
psum). The residual/Jacobian math is shared with the single-device solver
(`solve.ba.point_edge_terms` etc.), so both paths descend the same
objective.

Sharding invariant: a line's two endpoint rows are CO-LOCATED in one
device block (`shard_ba_problem` packs rows group-wise, pairs first), so
axis-pair blocks stay device-local. Cross-line edges couple two lines that
may live on different devices: each edge is materialized twice — once on
each line's owner, contributing that line's Hessian/gradient side only
(exactly the single-device one-sided contributions) — and its chi2 is
halved so the psum'd total matches. Positions of the remote line's
endpoints come from one per-iteration `all_gather` of the landmark table
(~tens of KB on local-BA problem sizes; rides ICI).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import sym_eig
from ..geometry import se3
from ..geometry.camera import Intrinsics
from ..solve.ba import (
    BAProblem,
    axis_anchor_terms_x,
    line_edge_terms,
    line_pair_terms_x,
    line_axis_terms_x,
    point_edge_terms,
)


class ShardedBA(NamedTuple):
    """Per-device-blocked BA problem. Leading axes are concatenations of
    ndev equal blocks; landmark indices are LOCAL to the owning block except
    ll_sb/ll_eb which are GLOBAL (they may point into a remote block and are
    resolved against the all-gathered landmark table)."""

    kf_T_cw: jnp.ndarray  # (K, 4, 4) replicated
    kf_free: jnp.ndarray  # (K,)
    pt_X: jnp.ndarray  # (P, 3) sharded, PERMUTED order
    pt_valid: jnp.ndarray  # (P,)
    # Point(+stereo) reprojection edges, sharded by landmark owner.
    e_kf: jnp.ndarray
    e_pt: jnp.ndarray  # local
    e_obs: jnp.ndarray
    e_stereo: jnp.ndarray
    e_inv_sigma2: jnp.ndarray
    e_valid: jnp.ndarray
    # Line-endpoint edges, sharded by endpoint owner.
    le_kf: jnp.ndarray
    le_lm: jnp.ndarray  # local
    le_line2d: jnp.ndarray
    le_inv_sigma2: jnp.ndarray
    le_valid: jnp.ndarray
    # Per-line Manhattan axis pairs (paired 6-dof Schur blocks), device-local.
    lp_s: jnp.ndarray  # local
    lp_e: jnp.ndarray  # local
    lp_axis: jnp.ndarray
    lp_w: jnp.ndarray
    lp_valid: jnp.ndarray
    # Cross-line par/perp edges, duplicated once per side; a-side local.
    ll_sa: jnp.ndarray  # local (this device's line)
    ll_ea: jnp.ndarray  # local
    ll_sb: jnp.ndarray  # GLOBAL (possibly remote line)
    ll_eb: jnp.ndarray  # GLOBAL
    ll_kind: jnp.ndarray
    ll_w: jnp.ndarray
    ll_valid: jnp.ndarray
    # Per-KF Manhattan axis anchors, replicated (zero weight = absent).
    kf_axes_c: jnp.ndarray  # (K, 3, 3)
    kf_axes_w: jnp.ndarray  # (3, 3)
    kf_w_axis: jnp.ndarray  # (K, 3)
    # Host-side bookkeeping: new_of_old[old_row] = permuted row. Use
    # `unshard_points` to map solved landmarks back to problem order.
    new_of_old: np.ndarray
    n_dropped: int  # edges dropped by per-device capacity (0 in practice)


def unshard_points(sp: ShardedBA, pt_X) -> np.ndarray:
    """Map the solver's (permuted, sharded) landmark table back to the
    original BAProblem row order."""
    return np.asarray(pt_X)[sp.new_of_old]


def _derive_pairs(prob: BAProblem) -> np.ndarray:
    """Endpoint-row pairs that must be co-located: from the axis-pair table
    and both sides of every cross-line edge."""
    pairs = []
    if prob.lp_s is not None:
        v = np.asarray(prob.lp_valid)
        pairs.append(np.stack([np.asarray(prob.lp_s)[v], np.asarray(prob.lp_e)[v]], 1))
    if prob.ll_sa is not None:
        v = np.asarray(prob.ll_valid)
        pairs.append(np.stack([np.asarray(prob.ll_sa)[v], np.asarray(prob.ll_ea)[v]], 1))
        pairs.append(np.stack([np.asarray(prob.ll_sb)[v], np.asarray(prob.ll_eb)[v]], 1))
    if not pairs:
        return np.zeros((0, 2), np.int64)
    return np.unique(np.concatenate(pairs, 0).astype(np.int64), axis=0)


def shard_ba_problem(
    prob: BAProblem, ndev: int, pair_rows: np.ndarray | None = None
) -> ShardedBA:
    """Pack landmarks group-wise into ndev blocks (line endpoint pairs
    co-located), localize edge indices, and block every edge family."""
    P_cap = prob.pt_X.shape[0]
    assert P_cap % ndev == 0, "landmark capacity must divide the mesh"
    blk = P_cap // ndev
    if pair_rows is None:
        pair_rows = _derive_pairs(prob)
    pair_rows = np.asarray(pair_rows, np.int64).reshape(-1, 2)

    e_pt = np.asarray(prob.e_pt)
    e_valid = np.asarray(prob.e_valid)
    le_lm = np.asarray(prob.le_lm)
    le_valid = np.asarray(prob.le_valid)

    # Edge count per row for load balance.
    cnt = np.zeros(P_cap, np.int64)
    np.add.at(cnt, e_pt[e_valid], 1)
    np.add.at(cnt, le_lm[le_valid], 1)

    in_pair = np.zeros(P_cap, bool)
    in_pair[pair_rows.reshape(-1)] = True
    singles = np.nonzero(~in_pair)[0]

    # Greedy: pairs first (need 2 contiguous-block rows), heaviest first,
    # to the least-loaded device with room.
    load = np.zeros(ndev, np.int64)
    room = np.full(ndev, blk, np.int64)
    next_free = np.arange(ndev, dtype=np.int64) * blk
    new_of_old = np.full(P_cap, -1, np.int64)

    def place(rows, cost):
        order = np.argsort(load, kind="stable")
        for d in order:
            if room[d] >= len(rows):
                for r in rows:
                    new_of_old[r] = next_free[d]
                    next_free[d] += 1
                room[d] -= len(rows)
                load[d] += cost
                return
        raise RuntimeError("no device block has room (fragmentation)")

    pcost = cnt[pair_rows[:, 0]] + cnt[pair_rows[:, 1]]
    for i in np.argsort(-pcost, kind="stable"):
        place(pair_rows[i], pcost[i])
    scost = cnt[singles]
    for i in np.argsort(-scost, kind="stable"):
        place(singles[i : i + 1], scost[i])
    assert (new_of_old >= 0).all()

    owner = lambda rows: new_of_old[rows] // blk  # noqa: E731
    local = lambda rows: (new_of_old[rows] % blk).astype(np.int32)  # noqa: E731

    # Permute the landmark table.
    old_of_new = np.empty(P_cap, np.int64)
    old_of_new[new_of_old] = np.arange(P_cap)
    pt_X = np.asarray(prob.pt_X)[old_of_new]
    pt_valid = np.asarray(prob.pt_valid)[old_of_new]

    dropped = 0

    def block_family(dev_of, fields, cap):
        """Pack (dev_of (N,), {name: (N, ...)}) into (ndev * per_dev, ...)."""
        nonlocal dropped
        # Slack over the even split: greedy balance is within the largest
        # group's edge count, so a 25% + constant margin makes drops a
        # true overload signal rather than a rounding artifact.
        per_dev = -(-cap // ndev) + max(8, cap // (4 * ndev))
        out = {
            k: np.zeros((ndev, per_dev) + v.shape[1:], v.dtype)
            for k, v in fields.items()
        }
        valid_b = np.zeros((ndev, per_dev), bool)
        for d in range(ndev):
            sel = np.nonzero(dev_of == d)[0]
            if len(sel) > per_dev:
                dropped += len(sel) - per_dev
                sel = sel[:per_dev]
            n = len(sel)
            for k, v in fields.items():
                out[k][d, :n] = v[sel]
            valid_b[d, :n] = True
        return (
            {k: jnp.asarray(v.reshape((-1,) + v.shape[2:])) for k, v in out.items()},
            jnp.asarray(valid_b.reshape(-1)),
        )

    # Point edges.
    ei = np.nonzero(e_valid)[0]
    pe, pe_valid = block_family(
        owner(e_pt[ei]),
        dict(
            e_kf=np.asarray(prob.e_kf)[ei],
            e_pt=local(e_pt[ei]),
            e_obs=np.asarray(prob.e_obs)[ei],
            e_stereo=np.asarray(prob.e_stereo)[ei],
            e_is=np.asarray(prob.e_inv_sigma2)[ei],
        ),
        prob.e_kf.shape[0],
    )
    # Line-endpoint edges.
    li = np.nonzero(le_valid)[0]
    le, le_valid_b = block_family(
        owner(le_lm[li]),
        dict(
            le_kf=np.asarray(prob.le_kf)[li],
            le_lm=local(le_lm[li]),
            le_line2d=np.asarray(prob.le_line2d)[li],
            le_is=np.asarray(prob.le_inv_sigma2)[li],
        ),
        max(prob.le_kf.shape[0], ndev),
    )
    # Axis pairs (device-local by construction).
    if prob.lp_s is not None:
        lv = np.nonzero(np.asarray(prob.lp_valid))[0]
        lp_cap = max(prob.lp_s.shape[0], ndev)
        lp_s = np.asarray(prob.lp_s)[lv]
        lp, lp_valid_b = block_family(
            owner(lp_s),
            dict(
                lp_s=local(lp_s),
                lp_e=local(np.asarray(prob.lp_e)[lv]),
                lp_axis=np.asarray(prob.lp_axis)[lv],
                lp_w=np.asarray(prob.lp_w)[lv],
            ),
            lp_cap,
        )
    else:
        per = 1
        lp = dict(
            lp_s=jnp.zeros((ndev * per,), jnp.int32),
            lp_e=jnp.zeros((ndev * per,), jnp.int32),
            lp_axis=jnp.zeros((ndev * per, 3), jnp.float32),
            lp_w=jnp.zeros((ndev * per,), jnp.float32),
        )
        lp_valid_b = jnp.zeros((ndev * per,), bool)
    # Cross-line edges: one copy per side (swapped roles on the b side).
    if prob.ll_sa is not None:
        lv = np.nonzero(np.asarray(prob.ll_valid))[0]
        sa, ea = np.asarray(prob.ll_sa)[lv], np.asarray(prob.ll_ea)[lv]
        sb, eb = np.asarray(prob.ll_sb)[lv], np.asarray(prob.ll_eb)[lv]
        kind = np.asarray(prob.ll_kind)[lv]
        w = np.asarray(prob.ll_w)[lv]
        dev_of = np.concatenate([owner(sa), owner(sb)])
        ll, ll_valid_b = block_family(
            dev_of,
            dict(
                ll_sa=np.concatenate([local(sa), local(sb)]),
                ll_ea=np.concatenate([local(ea), local(eb)]),
                ll_sb=np.concatenate(
                    [new_of_old[sb], new_of_old[sa]]
                ).astype(np.int32),
                ll_eb=np.concatenate(
                    [new_of_old[eb], new_of_old[ea]]
                ).astype(np.int32),
                ll_kind=np.concatenate([kind, kind]),
                ll_w=np.concatenate([w, w]),
            ),
            max(2 * prob.ll_sa.shape[0], ndev),
        )
    else:
        per = 1
        ll = dict(
            ll_sa=jnp.zeros((ndev * per,), jnp.int32),
            ll_ea=jnp.zeros((ndev * per,), jnp.int32),
            ll_sb=jnp.zeros((ndev * per,), jnp.int32),
            ll_eb=jnp.zeros((ndev * per,), jnp.int32),
            ll_kind=jnp.zeros((ndev * per,), jnp.int32),
            ll_w=jnp.zeros((ndev * per,), jnp.float32),
        )
        ll_valid_b = jnp.zeros((ndev * per,), bool)

    K = prob.kf_T_cw.shape[0]
    if prob.kf_axes_c is not None:
        axes_c = jnp.asarray(prob.kf_axes_c)
        axes_w = jnp.asarray(prob.kf_axes_w)
        w_axis = jnp.asarray(prob.kf_w_axis)
    else:
        axes_c = jnp.zeros((K, 3, 3), jnp.float32)
        axes_w = jnp.eye(3, dtype=jnp.float32)
        w_axis = jnp.zeros((K, 3), jnp.float32)

    return ShardedBA(
        kf_T_cw=prob.kf_T_cw,
        kf_free=prob.kf_free,
        pt_X=jnp.asarray(pt_X),
        pt_valid=jnp.asarray(pt_valid),
        e_kf=pe["e_kf"], e_pt=pe["e_pt"], e_obs=pe["e_obs"],
        e_stereo=pe["e_stereo"], e_inv_sigma2=pe["e_is"], e_valid=pe_valid,
        le_kf=le["le_kf"], le_lm=le["le_lm"], le_line2d=le["le_line2d"],
        le_inv_sigma2=le["le_is"], le_valid=le_valid_b,
        lp_s=lp["lp_s"], lp_e=lp["lp_e"], lp_axis=lp["lp_axis"],
        lp_w=lp["lp_w"], lp_valid=lp_valid_b,
        ll_sa=ll["ll_sa"], ll_ea=ll["ll_ea"], ll_sb=ll["ll_sb"],
        ll_eb=ll["ll_eb"], ll_kind=ll["ll_kind"], ll_w=ll["ll_w"],
        ll_valid=ll_valid_b,
        kf_axes_c=axes_c, kf_axes_w=axes_w, kf_w_axis=w_axis,
        new_of_old=new_of_old,
        n_dropped=dropped,
    )


def dist_local_bundle_adjustment(
    mesh: Mesh,
    sp: ShardedBA,
    intr: Intrinsics,
    n_iters1: int = 5,
    n_iters2: int = 10,
    chi2_mono: float = 5.991,
    chi2_stereo: float = 7.815,
    chi2_line: float = 3.84,
):
    """Distributed two-stage BA over the full edge set; returns
    (kf_T_cw (K,4,4) replicated, pt_X (P,3) sharded in PERMUTED order — use
    `unshard_points` — , e_inlier (E,), le_inlier (El,)), the latter two in
    the sharded edge order of `sp`."""
    K = sp.kf_T_cw.shape[0]
    th_mono = chi2_mono
    th_st = chi2_stereo
    delta_l = float(np.sqrt(chi2_line))

    espec = P("edge")
    espec3 = P("edge", None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(),  # poses replicated
            espec3, espec,  # landmarks sharded
            espec, espec, espec3, espec, espec, espec,  # point edges
            espec, espec, espec3, espec, espec,  # line edges
            espec, espec, espec3, espec, espec,  # lp pairs
            espec, espec, espec, espec, espec, espec, espec,  # ll edges
            P(), P(), P(),  # axis anchors replicated
        ),
        out_specs=(P(), espec3, espec, espec),
        check_vma=False,
    )
    def run(
        kf_T0, kf_free,
        pt_X0, pt_valid,
        e_kf, e_pt, e_obs, e_stereo, e_is, e_va,
        le_kf, le_lm, le_l2d, le_is, le_va,
        lp_s, lp_e, lp_axis, lp_w, lp_va,
        ll_sa, ll_ea, ll_sb, ll_eb, ll_kind, ll_w, ll_va,
        axes_c, axes_w, w_axis,
    ):
        th_e = jnp.where(e_stereo, th_st, th_mono)
        delta_e = jnp.sqrt(th_e)
        Pl = pt_X0.shape[0]
        eye3 = jnp.eye(3)
        eye6 = jnp.eye(6)

        def gathered(pt_X):
            return jax.lax.all_gather(pt_X, "edge", axis=0, tiled=True)

        def pt_terms(kf_T, pt_X):
            return point_edge_terms(
                kf_T, pt_X, e_kf, e_pt, e_obs, e_stereo, e_is, intr
            )

        def ln_terms(kf_T, pt_X):
            return line_edge_terms(kf_T, pt_X, le_kf, le_lm, le_l2d, le_is, intr)

        def lp_terms(pt_X):
            return line_axis_terms_x(
                pt_X[lp_s], pt_X[lp_e], lp_axis, lp_w, lp_va
            )

        def ll_terms(pt_X, pt_full):
            return line_pair_terms_x(
                pt_X[ll_sa], pt_X[ll_ea], pt_full[ll_sb], pt_full[ll_eb],
                ll_kind, ll_w, ll_va,
            )

        def anchor_blocks(kf_T):
            r_ax, J_ax = axis_anchor_terms_x(kf_T, axes_c, axes_w)
            H = jnp.zeros((K, 6, 6)).at[:, 3:, 3:].add(
                jnp.einsum("kaci,ka,kacj->kij", J_ax, w_axis, J_ax)
            )
            b = jnp.zeros((K, 6)).at[:, 3:].add(
                jnp.einsum("kaci,kac->ki", J_ax, w_axis[:, :, None] * r_ax)
            )
            chi2 = jnp.sum(w_axis * jnp.sum(r_ax * r_ax, axis=-1))
            return H, b, chi2

        def chi2_total(kf_T, pt_X, e_active, le_active):
            pt_full = gathered(pt_X)
            *_, chi2, okd = pt_terms(kf_T, pt_X)
            part = jnp.sum(jnp.where(e_active & okd, chi2, 0.0))
            *_, chi2l, okdl = ln_terms(kf_T, pt_X)
            part = part + jnp.sum(jnp.where(le_active & okdl, chi2l, 0.0))
            *_, chi2_lp = lp_terms(pt_X)
            part = part + jnp.sum(chi2_lp)
            *_, chi2_ll = ll_terms(pt_X, pt_full)
            part = part + 0.5 * jnp.sum(chi2_ll)  # duplicated per side
            total = jax.lax.psum(part, "edge")
            _, _, chi2_ax = anchor_blocks(kf_T)
            return total + chi2_ax

        def lm_stage(kf_T, pt_X, e_active, le_active, n_iters, robust):
            def body(_, carry):
                kf_T, pt_X, lam = carry
                pt_full = gathered(pt_X)
                # ---- accumulate local blocks (mirrors solve.ba._build_blocks)
                r, Jp, Jx, comp, chi2, okd = pt_terms(kf_T, pt_X)
                w = jnp.where(e_active & okd, e_is, 0.0)
                if robust:
                    w = w * jnp.minimum(
                        1.0, delta_e / jnp.sqrt(jnp.maximum(chi2, 1e-12))
                    )
                Wc = w[:, None] * comp
                Hpp = jnp.zeros((K, 6, 6)).at[e_kf].add(
                    jnp.einsum("eki,ek,ekj->eij", Jp, Wc, Jp)
                )
                bp = jnp.zeros((K, 6)).at[e_kf].add(
                    jnp.einsum("eki,ek->ei", Jp, Wc * r)
                )
                Hll = jnp.zeros((Pl, 3, 3)).at[e_pt].add(
                    jnp.einsum("eki,ek,ekj->eij", Jx, Wc, Jx)
                )
                U = jnp.zeros((Pl, K, 6, 3)).at[e_pt, e_kf].add(
                    jnp.einsum("eki,ek,ekj->eij", Jp, Wc, Jx)
                )
                bl = jnp.zeros((Pl, 3)).at[e_pt].add(
                    jnp.einsum("eki,ek->ei", Jx, Wc * r)
                )
                chi2_part = jnp.sum(jnp.where(e_active & okd, chi2, 0.0))

                rl, Jpl, Jxl, chi2l, okdl = ln_terms(kf_T, pt_X)
                wl = jnp.where(le_active & okdl, le_is, 0.0)
                if robust:
                    wl = wl * jnp.minimum(
                        1.0, delta_l / jnp.sqrt(jnp.maximum(chi2l, 1e-12))
                    )
                Wl = wl[:, None]
                Hpp = Hpp.at[le_kf].add(jnp.einsum("eki,ek,ekj->eij", Jpl, Wl, Jpl))
                Hll = Hll.at[le_lm].add(jnp.einsum("eki,ek,ekj->eij", Jxl, Wl, Jxl))
                U = U.at[le_lm, le_kf].add(
                    jnp.einsum("eki,ek,ekj->eij", Jpl, Wl, Jxl)
                )
                bp = bp.at[le_kf].add(jnp.einsum("eki,ek->ei", Jpl, Wl * rl))
                bl = bl.at[le_lm].add(jnp.einsum("eki,ek->ei", Jxl, Wl * rl))
                chi2_part = chi2_part + jnp.sum(
                    jnp.where(le_active & okdl, chi2l, 0.0)
                )

                # Cross-line edges: this device's (a-)side contributions only.
                r_ll, J_ea, _J_eb, w_ll, chi2_ll = ll_terms(pt_X, pt_full)
                HJa = jnp.einsum("lab,l,lac->lbc", J_ea, w_ll, J_ea)
                g_a = jnp.einsum("lab,la->lb", J_ea, w_ll[:, None] * r_ll)
                Hll = Hll.at[ll_ea].add(HJa).at[ll_sa].add(HJa)
                bl = bl.at[ll_ea].add(g_a).at[ll_sa].add(-g_a)
                chi2_part = chi2_part + 0.5 * jnp.sum(chi2_ll)

                # Axis pairs -> paired 6-dof blocks (device-local).
                r_lp, Je, w_lp, chi2_lp = lp_terms(pt_X)
                HJ = jnp.einsum("lab,l,lcb->lac", Je, w_lp, Je)
                Hll = Hll.at[lp_s].add(HJ)
                Hll = Hll.at[lp_e].add(HJ)
                Hx = -HJ
                g_e = jnp.einsum("lab,la->lb", Je, w_lp[:, None] * r_lp)
                bl = bl.at[lp_e].add(g_e)
                bl = bl.at[lp_s].add(-g_e)
                chi2_part = chi2_part + jnp.sum(chi2_lp)

                chi2_cur = jax.lax.psum(chi2_part, "edge")
                H_ax, b_ax, chi2_ax = anchor_blocks(kf_T)
                chi2_cur = chi2_cur + chi2_ax

                # ---- Schur solve (mirrors solve.ba._schur_solve).
                # Isotropic per-block damping: see solve.ba._schur_solve —
                # per-coordinate damping leaves the line-direction null
                # space of endpoint landmarks undamped and endpoints slide.
                dmax = jnp.max(jnp.diagonal(Hll, axis1=1, axis2=2), axis=-1)
                Hll_d = Hll + lam * jnp.maximum(dmax, 1e-6)[:, None, None] * eye3
                observed = jnp.abs(Hll).sum(axis=(1, 2)) > 1e-9
                Hll_d = jnp.where(observed[:, None, None], Hll_d, eye3)
                A = sym_eig.inv3x3(Hll_d)
                in_pair = (
                    jnp.zeros((Pl,), bool)
                    .at[lp_s].max(lp_va)
                    .at[lp_e].max(lp_va)
                )
                A = jnp.where(in_pair[:, None, None], 0.0, A)
                T1 = jnp.einsum("pkab,pbc->pkac", U, A)
                S_part = -jnp.einsum("pkac,pmdc->kmad", T1, U)
                b_part = -jnp.einsum("pkac,pc->ka", T1, bl)

                H6 = jnp.zeros((lp_s.shape[0], 6, 6))
                H6 = H6.at[:, :3, :3].set(Hll_d[lp_s])
                H6 = H6.at[:, 3:, 3:].set(Hll_d[lp_e])
                H6 = H6.at[:, :3, 3:].set(Hx)
                H6 = H6.at[:, 3:, :3].set(Hx.transpose(0, 2, 1))
                pair_obs = lp_va & (
                    observed[lp_s] | observed[lp_e] | (lp_w > 0)
                )
                H6 = jnp.where(pair_obs[:, None, None], H6, eye6)
                A6 = jnp.linalg.inv(H6)  # small Lc; LU for robustness
                A6 = jnp.where(pair_obs[:, None, None], A6, 0.0)
                U6 = jnp.concatenate([U[lp_s], U[lp_e]], axis=-1)
                bl6 = jnp.concatenate([bl[lp_s], bl[lp_e]], axis=-1)
                T16 = jnp.einsum("lkab,lbc->lkac", U6, A6)
                S_part = S_part - jnp.einsum("lkac,lmdc->kmad", T16, U6)
                b_part = b_part - jnp.einsum("lkac,lc->ka", T16, bl6)

                # ICI reductions: pose-sized blocks only.
                Hpp = jax.lax.psum(Hpp, "edge") + H_ax
                bp = jax.lax.psum(bp, "edge") + b_ax
                S = jax.lax.psum(S_part, "edge")
                b_red = bp + jax.lax.psum(b_part, "edge")

                diag = Hpp + lam * eye6 * jnp.maximum(
                    jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-6
                )[:, :, None] * eye6
                S = S.at[jnp.arange(K), jnp.arange(K)].add(diag)
                fmask = kf_free[:, None] & kf_free[None, :]
                S = jnp.where(fmask[:, :, None, None], S, 0.0)
                S = S.at[jnp.arange(K), jnp.arange(K)].add(
                    jnp.where(kf_free, 0.0, 1.0)[:, None, None] * eye6
                )
                b_red = jnp.where(kf_free[:, None], b_red, 0.0)
                S_dense = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
                S_dense = S_dense + 1e-8 * jnp.eye(6 * K)
                dpose = -jnp.linalg.solve(S_dense, b_red.reshape(-1)).reshape(K, 6)
                dpose = jnp.where(kf_free[:, None], dpose, 0.0)

                # Back-substitute own landmark block only.
                rhs = bl + jnp.einsum("pkab,ka->pb", U, dpose)
                dpt = -jnp.einsum("pab,pb->pa", A, rhs)
                dpt = jnp.where(observed[:, None] & ~in_pair[:, None], dpt, 0.0)
                rhs6 = bl6 + jnp.einsum("lkab,ka->lb", U6, dpose)
                d6 = -jnp.einsum("lab,lb->la", A6, rhs6)
                d6 = jnp.where(pair_obs[:, None], d6, 0.0)
                dpt = dpt.at[lp_s].add(d6[:, :3])
                dpt = dpt.at[lp_e].add(d6[:, 3:])

                kf_T_new = se3.exp_se3(dpose) @ kf_T
                pt_X_new = pt_X + dpt
                chi2_new = chi2_total(kf_T_new, pt_X_new, e_active, le_active)
                finite = jnp.all(jnp.isfinite(kf_T_new)) & jnp.all(
                    jnp.isfinite(pt_X_new)
                )
                finite = jax.lax.pmin(finite.astype(jnp.int32), "edge") > 0
                accept = (chi2_new < chi2_cur) & finite
                kf_T = jnp.where(accept, kf_T_new, kf_T)
                pt_X = jnp.where(accept, pt_X_new, pt_X)
                lam = jnp.where(
                    accept, jnp.maximum(lam * 0.5, 1e-7), jnp.minimum(lam * 5.0, 1e5)
                )
                return kf_T, pt_X, lam

            kf_T, pt_X, _ = jax.lax.fori_loop(
                0, n_iters, body, (kf_T, pt_X, jnp.asarray(1e-4))
            )
            return kf_T, pt_X

        e_active = e_va & pt_valid[e_pt]
        le_active = le_va & pt_valid[le_lm]
        kf_T, pt_X = lm_stage(kf_T0, pt_X0, e_active, le_active, n_iters1, True)
        *_, chi2, okd = pt_terms(kf_T, pt_X)
        e_active = e_active & (chi2 <= th_e) & okd
        *_, chi2l, okdl = ln_terms(kf_T, pt_X)
        le_active = le_active & (chi2l <= chi2_line) & okdl
        kf_T, pt_X = lm_stage(kf_T, pt_X, e_active, le_active, n_iters2, False)
        *_, chi2, okd = pt_terms(kf_T, pt_X)
        e_inlier = e_va & (chi2 <= th_e) & okd
        *_, chi2l, okdl = ln_terms(kf_T, pt_X)
        le_inlier = le_va & (chi2l <= chi2_line) & okdl
        return kf_T, pt_X, e_inlier, le_inlier

    return jax.jit(run)(
        sp.kf_T_cw, sp.kf_free,
        sp.pt_X, sp.pt_valid,
        sp.e_kf, sp.e_pt, sp.e_obs, sp.e_stereo, sp.e_inv_sigma2, sp.e_valid,
        sp.le_kf, sp.le_lm, sp.le_line2d, sp.le_inv_sigma2, sp.le_valid,
        sp.lp_s, sp.lp_e, sp.lp_axis, sp.lp_w, sp.lp_valid,
        sp.ll_sa, sp.ll_ea, sp.ll_sb, sp.ll_eb, sp.ll_kind, sp.ll_w, sp.ll_valid,
        sp.kf_axes_c, sp.kf_axes_w, sp.kf_w_axis,
    )
