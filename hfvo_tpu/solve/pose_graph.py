"""Pose-graph optimization: batched LM over relative SE(3) edges.

TPU-native replacement for the reference's essential-graph optimization
(reference: `Optimizer::OptimizeEssentialGraph`, src/Optimizer.cc:4339 —
g2o Sim3 vertices over the spanning tree + covisibility + loop edges; RGB-D
fixes scale so SE(3) suffices, as the reference itself does for RGB-D by
fixing s=1).

Edges carry a measured relative pose T_ij ~ T_i T_j^{-1} (camera-from-world
convention). Residual r = log_se3(T_ij^{-1} T_i T_j^{-1}); Jacobians come
from autodiff of the batched residual (E edges at once), and the dense
(6K, 6K) normal system is one solve — K is a few hundred keyframes.
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


@partial(jax.jit, static_argnames=("n_iters",))
def optimize_pose_graph(pg: PoseGraph, n_iters: int = 20) -> jnp.ndarray:
    """Returns corrected poses (K, 4, 4)."""
    K = pg.T_cw.shape[0]

    def residuals_of(xi_all):
        """xi_all (K, 6) twists applied to the initial poses."""
        T_all = se3.exp_se3(xi_all) @ pg.T_cw
        T_i = T_all[pg.e_i]
        T_j = T_all[pg.e_j]
        rel = jnp.einsum("eij,ejk->eik", T_i, se3.inv(T_j))
        err = jnp.einsum("eij,ejk->eik", se3.inv(pg.e_Tij), rel)
        return se3.log_se3(err) * pg.e_weight[:, None]  # (E, 6)

    def body(_, carry):
        xi, lam = carry
        r = residuals_of(xi)  # (E, 6)
        # Dense Jacobian wrt all twists via forward-mode autodiff.
        J = jax.jacfwd(lambda x: residuals_of(x).reshape(-1))(xi)  # (6E, K, 6)
        Jf = J.reshape(-1, K * 6)
        rf = r.reshape(-1)
        H = Jf.T @ Jf
        g = Jf.T @ rf
        # Gauge: zero rows/cols of fixed poses.
        free6 = jnp.repeat(pg.free, 6)
        H = jnp.where(free6[:, None] & free6[None, :], H, 0.0)
        H = H + jnp.diag(jnp.where(free6, lam * jnp.maximum(jnp.diag(H), 1e-6), 1.0))
        g = jnp.where(free6, g, 0.0)
        dx = -jnp.linalg.solve(H + 1e-9 * jnp.eye(6 * K), g).reshape(K, 6)
        xi_new = xi + jnp.where(pg.free[:, None], dx, 0.0)
        better = jnp.sum(residuals_of(xi_new) ** 2) < jnp.sum(r**2)
        xi = jnp.where(better, xi_new, xi)
        lam = jnp.where(better, lam * 0.5, lam * 4.0)
        return xi, lam

    xi0 = jnp.zeros((K, 6))
    xi, _ = jax.lax.fori_loop(0, n_iters, body, (xi0, jnp.asarray(1e-4)))
    return se3.exp_se3(xi) @ pg.T_cw
