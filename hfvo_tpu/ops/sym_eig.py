"""Batched small symmetric eigendecomposition without XLA custom calls.

`jnp.linalg.eigh` on TPU lowers to the iterative `EighTpu` custom call;
inside the fused per-frame program its three 3x3 instances (plane block
fits over the 30x40 grid, the region refit, and the 3D line PCA) cost
~29 ms per batch-8 step — 20% of the whole device program — because the
custom call cannot fuse and pads every 3x3 problem to 2x2 block form.

A fixed-sweep cyclic Jacobi rotation schedule is exact to float32
precision after a handful of sweeps (quadratic convergence), is pure
elementwise math the XLA fuser folds into neighboring ops, is branch-free
(safe under vmap/jit), and — unlike the closed-form Cardano route — stays
well-defined on the degenerate all-zero covariances that masked-out
blocks produce.

Drop-in contract matches jnp.linalg.eigh: ascending eigenvalues, V[...,i]
the i-th eigenvector, V orthonormal.

Reference equivalence: the reference's plane fitter runs per-block 3x3
eigensolves through its own closed-form routine (include/peac/eig33sym.hpp);
this module is the TPU-native analog.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Cyclic (p, q) rotation schedules. 5 sweeps leaves off-diagonal mass at
# ~1e-7 of the Frobenius norm for float32 inputs (quadratic convergence
# after the first two sweeps).
_PAIRS3 = ((0, 1), (0, 2), (1, 2))
_PAIRS4 = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _jacobi_rotate(A, V, p: int, q: int):
    """One Jacobi rotation zeroing A[..., p, q], applied symmetrically to A
    and accumulated into V. p < q are static Python ints."""
    apq = A[..., p, q]
    app = A[..., p, p]
    aqq = A[..., q, q]
    # Rotation angle: theta = 0.5 * atan2(2 a_pq, a_qq - a_pp). atan2 is
    # well-defined at (0, 0) (returns 0 -> identity rotation), which covers
    # the degenerate all-zero matrices of masked-out blocks.
    theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
    c = jnp.cos(theta)[..., None]
    s = jnp.sin(theta)[..., None]

    # Column updates: col_p' = c*col_p - s*col_q ; col_q' = s*col_p + c*col_q
    Acp = A[..., :, p]
    Acq = A[..., :, q]
    new_p = c * Acp - s * Acq
    new_q = s * Acp + c * Acq
    A = A.at[..., :, p].set(new_p).at[..., :, q].set(new_q)
    # Row updates (same rotation from the left, transposed).
    Arp = A[..., p, :]
    Arq = A[..., q, :]
    new_rp = c * Arp - s * Arq
    new_rq = s * Arp + c * Arq
    A = A.at[..., p, :].set(new_rp).at[..., q, :].set(new_rq)

    Vcp = V[..., :, p]
    Vcq = V[..., :, q]
    V = V.at[..., :, p].set(c * Vcp - s * Vcq).at[..., :, q].set(s * Vcp + c * Vcq)
    return A, V


def _eigh_jacobi(A: jnp.ndarray, pairs, sweeps: int):
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    n = A.shape[-1]
    V = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    for _ in range(sweeps):
        for p, q in pairs:
            A, V = _jacobi_rotate(A, V, p, q)
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    # Ascending order WITHOUT argsort + take_along_axis: those lower to
    # serialized row-gathers on TPU (~0.35 ms/step batch-8 just to order
    # 3-vectors). Each element's rank is how many elements precede it
    # (stable: ties break by index, matching argsort), and the rank one-hot
    # applied as a tiny fused matmul permutes both w and V.
    idx = jnp.arange(n)
    before = (w[..., :, None] > w[..., None, :]) | (
        (w[..., :, None] == w[..., None, :]) & (idx[:, None] > idx[None, :])
    )
    rank = jnp.sum(before.astype(jnp.int32), axis=-1)  # (..., n)
    onehot = (rank[..., :, None] == idx).astype(w.dtype)  # (..., n src, n dst)
    w = jnp.einsum("...ir,...i->...r", onehot, w)
    V = jnp.einsum("...ir,...ki->...kr", onehot, V)
    return w, V


@partial(jax.jit, static_argnames=("sweeps",))
def eigh3(A: jnp.ndarray, sweeps: int = 5):
    """Symmetric 3x3 batched eigendecomposition, ascending eigenvalues.
    Drop-in for jnp.linalg.eigh on (..., 3, 3) symmetric inputs."""
    assert A.shape[-2:] == (3, 3), A.shape
    return _eigh_jacobi(A, _PAIRS3, sweeps)


@partial(jax.jit, static_argnames=("sweeps",))
def eigh4(A: jnp.ndarray, sweeps: int = 6):
    """Symmetric 4x4 batched eigendecomposition, ascending eigenvalues."""
    assert A.shape[-2:] == (4, 4), A.shape
    return _eigh_jacobi(A, _PAIRS4, sweeps)


def inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate / det).

    `jnp.linalg.inv` on (..., 3, 3) lowers to TPU's unfused LU custom call
    — measured ~3.2 ms per local-BA iteration at P=4096 blocks — while the
    cofactor form is ~40 FLOPs of fusable elementwise math. Callers damp
    their blocks first (BA adds lam*max-diag), so det is bounded away
    from 0; a 1e-30 guard keeps masked identity blocks finite."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c11 = e * i - f * h
    c12 = c * h - b * i
    c13 = b * f - c * e
    c21 = f * g - d * i
    c22 = a * i - c * g
    c23 = c * d - a * f
    c31 = d * h - e * g
    c32 = b * g - a * h
    c33 = a * e - b * d
    det = a * c11 + b * c21 + c * c31
    r = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    rows = jnp.stack(
        [
            jnp.stack([c11, c12, c13], axis=-1),
            jnp.stack([c21, c22, c23], axis=-1),
            jnp.stack([c31, c32, c33], axis=-1),
        ],
        axis=-2,
    )
    return rows * r[..., None, None]


def inv6x6_blocked(A: jnp.ndarray) -> jnp.ndarray:
    """Batched 6x6 inverse via 2x2-of-3x3 block Schur (two closed-form 3x3
    inverses + small matmuls) — same LU-custom-call avoidance as inv3x3.
    Requires the leading 3x3 block (after the caller's damping) to be
    invertible, which holds for the damped SPD-ish blocks BA feeds it."""
    P = A[..., :3, :3]
    Q = A[..., :3, 3:]
    R = A[..., 3:, :3]
    S = A[..., 3:, 3:]
    Pi = inv3x3(P)
    W = inv3x3(S - R @ Pi @ Q)
    PiQ = Pi @ Q
    top_left = Pi + PiQ @ W @ (R @ Pi)
    top_right = -(PiQ @ W)
    bot_left = -(W @ R @ Pi)
    return jnp.concatenate(
        [
            jnp.concatenate([top_left, top_right], axis=-1),
            jnp.concatenate([bot_left, W], axis=-1),
        ],
        axis=-2,
    )
