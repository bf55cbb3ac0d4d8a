"""Pose-graph optimization: matrix-free LM-CG over relative SE(3) edges.

TPU-native replacement for the reference's essential-graph optimization
(reference: `Optimizer::OptimizeEssentialGraph`, src/Optimizer.cc:4339 —
g2o Sim3 vertices over the spanning tree + covisibility + loop edges; RGB-D
fixes scale so SE(3) suffices, as the reference itself does for RGB-D by
fixing s=1).

Edges carry a measured relative pose T_ij ~ T_i T_j^{-1} (camera-from-world
convention). Each LM iteration linearizes every edge at delta = 0 around
the current poses (per-edge (6,12) Jacobians via vmapped forward-mode
autodiff — each edge touches exactly two poses), and solves the normal
equations with block-Jacobi-preconditioned CG whose matvec is two
edge-local products + scatter-adds. The (6K, 6K) Hessian is never
materialized, so K scales to thousands of keyframes, and the edge axis
can be block-partitioned across a device mesh: with `axis_name` set the
scatter-accumulations are psum-reduced, which is the whole distribution
story (keyframe state replicated, edges sharded —
`parallel/dist_pose_graph.py`, SURVEY.md §5.7/§5.8).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3


class PoseGraph(NamedTuple):
    T_cw: jnp.ndarray  # (K, 4, 4) initial keyframe poses
    free: jnp.ndarray  # (K,) bool — False: fixed (gauge / invalid)
    e_i: jnp.ndarray  # (E,) int32
    e_j: jnp.ndarray  # (E,) int32
    e_Tij: jnp.ndarray  # (E, 4, 4) measured T_i @ inv(T_j)
    e_weight: jnp.ndarray  # (E,) edge weights (0 = invalid)


def _edge_residual(d12, T_i, T_j, Tij_inv, w):
    """r(delta) for one edge at the current poses; d12 = [d_i, d_j]."""
    D_i = se3.exp_se3(d12[:6][None])[0]
    D_j = se3.exp_se3(d12[6:][None])[0]
    rel = (D_i @ T_i) @ se3.inv((D_j @ T_j)[None])[0]
    return se3.log_se3((Tij_inv @ rel)[None])[0] * w


def _pg_impl(
    pg: PoseGraph,
    n_iters: int = 20,
    cg_iters: int = 60,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Returns corrected poses (K, 4, 4)."""
    if axis_name is None:
        _ps = lambda x: x  # noqa: E731
    else:
        _ps = lambda x: jax.lax.psum(x, axis_name)  # noqa: E731
    K = pg.T_cw.shape[0]
    eye6 = jnp.eye(6)
    Tij_inv = se3.inv(pg.e_Tij)
    freem = pg.free[:, None].astype(jnp.float32)

    def edge_terms(T_all):
        T_i = T_all[pg.e_i]
        T_j = T_all[pg.e_j]
        zeros = jnp.zeros((pg.e_i.shape[0], 12))
        r = jax.vmap(_edge_residual)(zeros, T_i, T_j, Tij_inv, pg.e_weight)
        J = jax.vmap(jax.jacfwd(_edge_residual))(
            zeros, T_i, T_j, Tij_inv, pg.e_weight
        )  # (E, 6, 12)
        return r, J[:, :, :6], J[:, :, 6:]

    def chi2_of(T_all):
        T_i = T_all[pg.e_i]
        T_j = T_all[pg.e_j]
        zeros = jnp.zeros((pg.e_i.shape[0], 12))
        r = jax.vmap(_edge_residual)(zeros, T_i, T_j, Tij_inv, pg.e_weight)
        return _ps(jnp.sum(r * r))

    def body(_, carry):
        T_cur, lam = carry
        r, Ji, Jj = edge_terms(T_cur)
        chi2_cur = _ps(jnp.sum(r * r))
        g = _ps(
            jnp.zeros((K, 6))
            .at[pg.e_i].add(jnp.einsum("eri,er->ei", Ji, r))
            .at[pg.e_j].add(jnp.einsum("eri,er->ei", Jj, r))
        ) * freem
        # Per-pose diagonal blocks for damping + preconditioning.
        Hkk = _ps(
            jnp.zeros((K, 6, 6))
            .at[pg.e_i].add(jnp.einsum("eri,erj->eij", Ji, Ji))
            .at[pg.e_j].add(jnp.einsum("eri,erj->eij", Jj, Jj))
        )
        dscale = jnp.maximum(
            jnp.max(jnp.diagonal(Hkk, axis1=1, axis2=2), axis=-1), 1e-6
        )
        Hkk_d = Hkk + (lam * dscale)[:, None, None] * eye6
        Hkk_d = jnp.where(pg.free[:, None, None], Hkk_d, eye6)
        M = jnp.linalg.inv(Hkk_d)

        damp = (lam * dscale)[:, None] * freem

        def H_matvec(v):
            v = v * freem
            Mv = (
                jnp.einsum("eri,ei->er", Ji, v[pg.e_i])
                + jnp.einsum("eri,ei->er", Jj, v[pg.e_j])
            )  # (E, 6) = J v
            out = _ps(
                jnp.zeros((K, 6))
                .at[pg.e_i].add(jnp.einsum("eri,er->ei", Ji, Mv))
                .at[pg.e_j].add(jnp.einsum("eri,er->ei", Jj, Mv))
            )
            return (out + damp * v) * freem

        rhs = -g
        x = jnp.zeros((K, 6))
        res = rhs - H_matvec(x)
        z = jnp.einsum("kab,kb->ka", M, res)
        p = z
        rz = jnp.sum(res * z)
        tol2 = 1e-12 * jnp.maximum(jnp.sum(rhs * rhs), 1e-20)

        def cg_body(_, c):
            x, res, p, rz = c
            live = jnp.sum(res * res) > tol2
            Hp = H_matvec(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Hp), 1e-20)
            x_n = x + alpha * p
            r_n = res - alpha * Hp
            z_n = jnp.einsum("kab,kb->ka", M, r_n)
            rz_n = jnp.sum(r_n * z_n)
            beta = rz_n / jnp.maximum(rz, 1e-20)
            p_n = z_n + beta * p
            return (
                jnp.where(live, x_n, x),
                jnp.where(live, r_n, res),
                jnp.where(live, p_n, p),
                jnp.where(live, rz_n, rz),
            )

        dx, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, (x, res, p, rz))
        dx = dx * freem
        T_new = se3.exp_se3(dx) @ T_cur
        better = (chi2_of(T_new) < chi2_cur) & jnp.all(jnp.isfinite(T_new))
        T_cur = jnp.where(better, T_new, T_cur)
        lam = jnp.where(
            better, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 4.0, 1e4)
        )
        return T_cur, lam

    T_out, _ = jax.lax.fori_loop(
        0, n_iters, body, (pg.T_cw, jnp.asarray(1e-4))
    )
    return T_out


optimize_pose_graph = partial(
    jax.jit, static_argnames=("n_iters", "cg_iters", "axis_name")
)(_pg_impl)
