"""Distributed local bundle adjustment over a device mesh.

The scalable Schur reduction of SURVEY.md §5.8: landmarks (and their edges)
are partitioned into per-device blocks; each device owns its landmark block
end-to-end, so

- Hll, U, bl need NO communication (all edges of a landmark live with it);
- the pose blocks Hpp/bp and the reduced camera system
  S = Hpp - sum_p U_p A_p U_p^T are partial sums -> one `psum` of ~40 KB
  per LM iteration over ICI;
- every device solves the tiny replicated (6K, 6K) system, then
  back-substitutes only its own landmarks (results live sharded).

The host-side `shard_ba_problem` groups edges by landmark block and
localizes indices; `dist_local_bundle_adjustment` mirrors the single-chip
`solve.ba.local_bundle_adjustment` schedule (two stages + chi2 demotion).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..geometry import se3
from ..geometry.camera import Intrinsics
from ..solve import residuals
from ..solve.ba import BAProblem


class ShardedBA(NamedTuple):
    """Per-device-blocked BA problem. Leading axes are concatenations of
    ndev equal blocks; e_pt/le_lm are LOCAL to the owning block."""

    kf_T_cw: jnp.ndarray  # (K, 4, 4) replicated
    kf_free: jnp.ndarray  # (K,)
    pt_X: jnp.ndarray  # (P_total, 3) sharded
    pt_valid: jnp.ndarray  # (P_total,)
    e_kf: jnp.ndarray  # (E_total,) sharded, global KF index
    e_pt: jnp.ndarray  # (E_total,) local landmark index within the block
    e_obs: jnp.ndarray
    e_stereo: jnp.ndarray
    e_inv_sigma2: jnp.ndarray
    e_valid: jnp.ndarray


def shard_ba_problem(prob: BAProblem, ndev: int) -> ShardedBA:
    """Group point edges by landmark block, localize indices, pad blocks."""
    P_cap = prob.pt_X.shape[0]
    assert P_cap % ndev == 0, "landmark capacity must divide the mesh"
    blk = P_cap // ndev
    e_pt = np.asarray(prob.e_pt)
    e_valid = np.asarray(prob.e_valid)
    owner = e_pt // blk
    E_cap = prob.e_kf.shape[0]
    per_dev = -(-E_cap // ndev)

    e_kf_b = np.zeros((ndev, per_dev), np.int32)
    e_pt_b = np.zeros((ndev, per_dev), np.int32)
    e_obs_b = np.zeros((ndev, per_dev, 3), np.float32)
    e_st_b = np.zeros((ndev, per_dev), bool)
    e_is_b = np.zeros((ndev, per_dev), np.float32)
    e_va_b = np.zeros((ndev, per_dev), bool)
    dropped = 0
    for d in range(ndev):
        sel = np.nonzero((owner == d) & e_valid)[0]
        if len(sel) > per_dev:
            dropped += len(sel) - per_dev
            sel = sel[:per_dev]
        n = len(sel)
        e_kf_b[d, :n] = np.asarray(prob.e_kf)[sel]
        e_pt_b[d, :n] = e_pt[sel] - d * blk
        e_obs_b[d, :n] = np.asarray(prob.e_obs)[sel]
        e_st_b[d, :n] = np.asarray(prob.e_stereo)[sel]
        e_is_b[d, :n] = np.asarray(prob.e_inv_sigma2)[sel]
        e_va_b[d, :n] = True
    return ShardedBA(
        kf_T_cw=prob.kf_T_cw,
        kf_free=prob.kf_free,
        pt_X=prob.pt_X,
        pt_valid=prob.pt_valid,
        e_kf=jnp.asarray(e_kf_b.reshape(-1)),
        e_pt=jnp.asarray(e_pt_b.reshape(-1)),
        e_obs=jnp.asarray(e_obs_b.reshape(-1, 3)),
        e_stereo=jnp.asarray(e_st_b.reshape(-1)),
        e_inv_sigma2=jnp.asarray(e_is_b.reshape(-1)),
        e_valid=jnp.asarray(e_va_b.reshape(-1)),
    )


def dist_local_bundle_adjustment(
    mesh: Mesh,
    sp: ShardedBA,
    intr: Intrinsics,
    n_iters1: int = 5,
    n_iters2: int = 10,
    chi2_mono: float = 5.991,
    chi2_stereo: float = 7.815,
):
    """Distributed two-stage BA; returns (kf_T_cw (K,4,4), pt_X (P,3),
    e_inlier (E,)) with pt_X/e_inlier sharded over the 'edge' mesh axis."""
    K = sp.kf_T_cw.shape[0]
    th_e_mono = chi2_mono
    th_e_st = chi2_stereo

    espec = P("edge")
    espec3 = P("edge", None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(),  # poses replicated
            espec3, espec,  # landmarks sharded
            espec, espec, espec3, espec, espec, espec,  # edges sharded
        ),
        out_specs=(P(), espec3, espec),
        check_vma=False,
    )
    def run(kf_T, kf_free, pt_X, pt_valid, e_kf, e_pt, e_obs, e_stereo, e_is, e_va):
        th_e = jnp.where(e_stereo, th_e_st, th_e_mono)
        delta_e = jnp.sqrt(th_e)

        def edge_terms(kf_T, pt_X):
            T_e = kf_T[e_kf]
            X_e = pt_X[e_pt]
            r, Jp, z = residuals.point_stereo_residual(T_e, X_e, e_obs, intr)
            comp = jnp.stack(
                [jnp.ones_like(e_is), jnp.ones_like(e_is), e_stereo.astype(r.dtype)],
                axis=-1,
            )
            Jx = Jp[:, :, :3] @ T_e[:, :3, :3]
            chi2 = jnp.sum(r * r * comp, axis=-1) * e_is
            return r, Jp, Jx, comp, chi2, z > 1e-3

        def chi2_total(kf_T, pt_X, active):
            *_, chi2, okd = edge_terms(kf_T, pt_X)
            return jax.lax.psum(jnp.sum(jnp.where(active & okd, chi2, 0.0)), "edge")

        def lm_stage(kf_T, pt_X, active, n_iters, robust):
            Pl = pt_X.shape[0]

            def body(_, carry):
                kf_T, pt_X, lam = carry
                r, Jp, Jx, comp, chi2, okd = edge_terms(kf_T, pt_X)
                w = jnp.where(active & okd, e_is, 0.0)
                if robust:
                    w = w * jnp.minimum(
                        1.0, delta_e / jnp.sqrt(jnp.maximum(chi2, 1e-12))
                    )
                Wc = w[:, None] * comp
                # Local (per-shard) blocks; Hll/U/bl complete (edges co-located
                # with their landmark block), Hpp/bp partial.
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
                chi2_cur = jax.lax.psum(
                    jnp.sum(jnp.where(active & okd, chi2, 0.0)), "edge"
                )

                eye3 = jnp.eye(3)
                Hll_d = Hll + lam * eye3 * jnp.maximum(
                    jnp.diagonal(Hll, axis1=1, axis2=2), 1e-6
                )[:, :, None] * eye3
                observed = jnp.abs(Hll).sum(axis=(1, 2)) > 1e-9
                Hll_d = jnp.where(observed[:, None, None], Hll_d, jnp.eye(3))
                A = jnp.linalg.inv(Hll_d)
                T1 = jnp.einsum("pkab,pbc->pkac", U, A)
                S_part = -jnp.einsum("pkac,pmdc->kmad", T1, U)
                b_part = -jnp.einsum("pkac,pc->ka", T1, bl)
                # ICI reductions: tiny pose-sized blocks only.
                Hpp = jax.lax.psum(Hpp, "edge")
                bp = jax.lax.psum(bp, "edge")
                S = jax.lax.psum(S_part, "edge")
                b_red = bp + jax.lax.psum(b_part, "edge")

                diag = Hpp + lam * jnp.eye(6) * jnp.maximum(
                    jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-6
                )[:, :, None] * jnp.eye(6)
                S = S.at[jnp.arange(K), jnp.arange(K)].add(diag)
                fmask = kf_free[:, None] & kf_free[None, :]
                S = jnp.where(fmask[:, :, None, None], S, 0.0)
                S = S.at[jnp.arange(K), jnp.arange(K)].add(
                    jnp.where(kf_free, 0.0, 1.0)[:, None, None] * jnp.eye(6)
                )
                b_red = jnp.where(kf_free[:, None], b_red, 0.0)
                S_dense = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
                S_dense = S_dense + 1e-8 * jnp.eye(6 * K)
                dpose = -jnp.linalg.solve(S_dense, b_red.reshape(-1)).reshape(K, 6)
                dpose = jnp.where(kf_free[:, None], dpose, 0.0)
                # Back-substitute own landmark block only.
                rhs = bl + jnp.einsum("pkab,ka->pb", U, dpose)
                dpt = -jnp.einsum("pab,pb->pa", A, rhs)
                dpt = jnp.where(observed[:, None], dpt, 0.0)

                kf_T_new = se3.exp_se3(dpose) @ kf_T
                pt_X_new = pt_X + dpt
                chi2_new = chi2_total(kf_T_new, pt_X_new, active)
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

        active = e_va & pt_valid[e_pt]
        kf_T, pt_X = lm_stage(kf_T, pt_X, active, n_iters1, True)
        *_, chi2, okd = edge_terms(kf_T, pt_X)
        active = active & (chi2 <= th_e) & okd
        kf_T, pt_X = lm_stage(kf_T, pt_X, active, n_iters2, False)
        *_, chi2, okd = edge_terms(kf_T, pt_X)
        e_inlier = e_va & (chi2 <= th_e) & okd
        return kf_T, pt_X, e_inlier

    return jax.jit(run)(
        sp.kf_T_cw, sp.kf_free, sp.pt_X, sp.pt_valid,
        sp.e_kf, sp.e_pt, sp.e_obs, sp.e_stereo, sp.e_inv_sigma2, sp.e_valid,
    )
