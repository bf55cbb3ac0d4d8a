"""Vectorized RANSAC solvers: rigid 3D-3D alignment (Horn/Kabsch).

Replaces sequential hypothesis loops (reference: src/PnPsolver.cc EPnP
RANSAC :165 used by relocalization; src/Sim3Solver.cc:140 Horn similarity
RANSAC) with batched hypothesis scoring: sample all H minimal sets up
front, solve them in parallel (vmapped Kabsch), score all points against
all hypotheses in one broadcast, pick the best (SURVEY.md §7 design
stance). For RGB-D relocalization the 3D-3D form replaces EPnP: depth is
available on both sides, and Kabsch on 3 points is exact where EPnP needs 4+.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3

N_HYPOTHESES = 128


class RansacResult(NamedTuple):
    T_ab: jnp.ndarray  # (4, 4) best rigid transform mapping b-points to a-points
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray  # scalar int32
    ok: jnp.ndarray  # scalar bool


def kabsch(Xa: jnp.ndarray, Xb: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted rigid transform T with Xa ~ T @ Xb. Shapes (..., N, 3)."""
    sw = jnp.sum(w, axis=-1, keepdims=True) + 1e-9
    ca = jnp.sum(Xa * w[..., None], axis=-2) / sw
    cb = jnp.sum(Xb * w[..., None], axis=-2) / sw
    A = Xa - ca[..., None, :]
    B = Xb - cb[..., None, :]
    H = jnp.einsum("...ni,...n,...nj->...ij", B, w, A)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2))
    D = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
    )
    R = jnp.einsum("...ji,...j,...kj->...ik", Vt, D, U)  # V diag(D) U^T
    t = ca - jnp.einsum("...ij,...j->...i", R, cb)
    return se3.rt_to_mat(R, t)


def kabsch_sim3(Xa: jnp.ndarray, Xb: jnp.ndarray, w: jnp.ndarray):
    """Weighted Horn similarity: (s, R, t) with Xa ~ s R Xb + t.

    (reference: Sim3Solver::ComputeSim3, src/Sim3Solver.cc:226 — Horn's
    closed form; the reference fixes s=1 for RGB-D, which `kabsch` covers.)
    Returns (s (scalar), T (4, 4) containing R and t; apply as s*R@x+t).
    """
    sw = jnp.sum(w, axis=-1, keepdims=True) + 1e-9
    ca = jnp.sum(Xa * w[..., None], axis=-2) / sw
    cb = jnp.sum(Xb * w[..., None], axis=-2) / sw
    A = Xa - ca[..., None, :]
    B = Xb - cb[..., None, :]
    H = jnp.einsum("...ni,...n,...nj->...ij", B, w, A)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2))
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = jnp.einsum("...ji,...j,...kj->...ik", Vt, D, U)
    # Symmetric scale (Horn): sqrt(sum|A|^2 / sum|B|^2) over inliers.
    na = jnp.sum(w[..., None] * A * A, axis=(-2, -1))
    nb = jnp.sum(w[..., None] * B * B, axis=(-2, -1))
    s = jnp.sqrt(na / jnp.maximum(nb, 1e-12))
    t = ca - s[..., None] * jnp.einsum("...ij,...j->...i", R, cb)
    return s, se3.rt_to_mat(R, t)


@partial(jax.jit, static_argnames=("min_inliers",))
def ransac_rigid_3d3d(
    Xa: jnp.ndarray,  # (N, 3) target points (e.g. map/world)
    Xb: jnp.ndarray,  # (N, 3) source points (e.g. current camera frame)
    valid: jnp.ndarray,  # (N,)
    seed: jnp.ndarray,  # () uint32 PRNG seed
    inlier_th: float = 0.05,
    min_inliers: int = 12,
) -> RansacResult:
    """Best rigid T with Xa ~ T Xb from 3-point hypotheses + inlier refit."""
    N = Xa.shape[0]
    key = jax.random.PRNGKey(seed)
    # (H, 3) sample indices, biased to valid via weighted choice.
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(key, N, shape=(N_HYPOTHESES, 3), replace=True, p=p)

    A = Xa[idx]  # (H, 3, 3)
    B = Xb[idx]
    w3 = jnp.ones((N_HYPOTHESES, 3))
    T_h = kabsch(A, B, w3)  # (H, 4, 4)
    # Degenerate sample guard: nearly-collinear triples give unstable R.
    spread = jnp.linalg.norm(jnp.cross(A[:, 1] - A[:, 0], A[:, 2] - A[:, 0]), axis=-1)
    ok_h = spread > 1e-4

    Xb_h = jnp.einsum("hij,nj->hni", T_h[:, :3, :3], Xb) + T_h[:, None, :3, 3]
    err = jnp.linalg.norm(Xb_h - Xa[None], axis=-1)  # (H, N)
    inl = (err < inlier_th) & valid[None, :]
    counts = jnp.sum(inl, axis=1) * ok_h
    best = jnp.argmax(counts)
    best_inl = inl[best]

    # Refit on inliers.
    T_fit = kabsch(Xa, Xb, best_inl.astype(jnp.float32))
    Xb_f = jnp.einsum("ij,nj->ni", T_fit[:3, :3], Xb) + T_fit[:3, 3]
    err_f = jnp.linalg.norm(Xb_f - Xa, axis=-1)
    final_inl = (err_f < inlier_th) & valid
    n = jnp.sum(final_inl.astype(jnp.int32))
    return RansacResult(T_fit, final_inl, n, n >= min_inliers)
