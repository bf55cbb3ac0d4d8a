"""Distributed pose optimization: edge-sharded normal-equation reduction.

The analog of "distributed training" for this system (SURVEY.md §5.8): edges
(landmark observations) are sharded across the `edge` mesh axis; each device
computes partial `H = sum J^T W J`, `b = sum J^T W r` over its shard; `psum`
over ICI reduces them; every device solves the tiny 6x6 system and applies
the same pose update. Independent sequences ride the `seq` axis (vmapped —
each sequence solves its own pose; no cross-seq communication).

This is the building block the multi-view local BA reuses with a
reduce-scattered block-sparse H (solve/ba.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..geometry import se3
from ..geometry.camera import Intrinsics
from ..solve import residuals


def _partial_normal_eqs(T, X_w, obs, w, intr):
    """Per-shard H (6,6), b (6,), chi2 (scalar). Lane-major (k, 6, N)
    Jacobians like solve/lm.py: the (N, 3, 6) layout tiles its minor dims
    to 4x128 TPU blocks (28x pad waste in every elementwise consumer)."""
    r, Jt, z = residuals.point_stereo_terms_t(T, X_w, obs, intr)
    w = jnp.where(z > 1e-3, w, 0.0)
    H = jnp.einsum("kin,n,kjn->ij", Jt, w, Jt)
    b = jnp.einsum("kin,kn->i", Jt, w[None, :] * r)
    chi2 = jnp.sum(w * jnp.sum(r * r, axis=0))
    return H, b, chi2


def dist_pose_step(
    mesh: Mesh,
    T_cw: jnp.ndarray,  # (S, 4, 4) one pose per sequence (replicated)
    X_w: jnp.ndarray,  # (S, E, 3) edges, E sharded over 'edge'
    obs: jnp.ndarray,  # (S, E, 3)
    weight: jnp.ndarray,  # (S, E) 0 = invalid edge
    intr: Intrinsics,
    n_iters: int = 5,
):
    """One jitted distributed Gauss-Newton/LM run: returns updated (S,4,4)."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, "edge", None), P(None, "edge", None), P(None, "edge")),
        out_specs=P(),
        check_vma=False,
    )
    def step(T, Xs, obss, ws):
        def one_seq(T_s, X_s, obs_s, w_s):
            def body(_, carry):
                T, lam = carry
                H, b, chi2 = _partial_normal_eqs(T, X_s, obs_s, w_s, intr)
                H = jax.lax.psum(H, "edge")
                b = jax.lax.psum(b, "edge")
                chi2 = jax.lax.psum(chi2, "edge")
                Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6)
                delta = -jnp.linalg.solve(Hd, b)
                T_new = se3.exp_se3(delta) @ T
                _, _, chi2_new = _partial_normal_eqs(T_new, X_s, obs_s, w_s, intr)
                chi2_new = jax.lax.psum(chi2_new, "edge")
                accept = (chi2_new < chi2) & jnp.all(jnp.isfinite(T_new))
                return (
                    jnp.where(accept, T_new, T),
                    jnp.where(accept, lam * 0.5, lam * 4.0),
                )

            T_s, _ = jax.lax.fori_loop(0, n_iters, body, (T_s, jnp.asarray(1e-3)))
            return T_s

        return jax.vmap(one_seq)(T, Xs, obss, ws)

    return jax.jit(step)(T_cw, X_w, obs, weight)
