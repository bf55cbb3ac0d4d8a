"""Hamming distance between packed 256-bit ORB descriptors — MXU-friendly.

Replaces the reference's scalar popcount loop
(reference: src/ORBmatcher.cc:1669-1693 `DescriptorDistance`, the classic
Stanford bit-hack) with a bipolar matmul: unpack bits to {-1, +1} and use
`dist = (256 - A @ B^T) / 2`, putting the whole N1 x N2 distance matrix on
the MXU in one contraction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MAX_DIST = 256


def unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) float32 in {0, 1}."""
    shifts = jnp.asarray(np.arange(32, dtype=np.uint32))
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], 256).astype(jnp.float32)


def hamming_matrix_f(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Hamming distances (N1, N2) as EXACT integer-valued float32.

    The float form lets XLA fuse the (256 - dot)/2 epilogue into downstream
    reduction consumers instead of materializing a second full-size int32
    matrix next to the MXU's f32 dot output (measured 0.44 ms/step of pure
    HBM writes on the batch-8 tracker at L=8192, N=1024)."""
    a = unpack_bits(desc_a) * 2.0 - 1.0
    b = unpack_bits(desc_b) * 2.0 - 1.0
    # precision=DEFAULT (bf16 inputs on TPU) is EXACT here: ±1 inputs and
    # partial sums within ±256 are all representable in bf16/f32-accum, so
    # this opts out of the package-wide f32 ("highest") default for free
    # MXU speed (hfvo_tpu/__init__.py).
    dot = jnp.dot(a, b.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    return (MAX_DIST - dot) * 0.5


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Hamming distances (N1, N2) int32 from packed descriptors."""
    return hamming_matrix_f(desc_a, desc_b).astype(jnp.int32)


def hamming_pairs(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Hamming distance for aligned rows: (N, 8), (N, 8) -> (N,)."""
    x = jnp.bitwise_xor(desc_a, desc_b)
    return jnp.sum(_popcount_u32(x), axis=-1).astype(jnp.int32)


def _popcount_u32(x: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount on uint32."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


def masked_best2(
    dist: jnp.ndarray, mask: jnp.ndarray, invalid: int = MAX_DIST + 1
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Best and second-best along axis 1 under a boolean mask.

    Returns (best_idx (N1,), best_dist (N1,), second_dist (N1,)); masked-out
    entries read as `invalid`.

    Gather/scatter-free: TPU row-gathers serialize (~7 ns/row; the previous
    take_along_axis + .at[].set formulation cost ~1.9 ms/step on the batch-8
    tracker). Instead (distance, column) packs into one exact f32 key
    d * N + col — integer-valued while d * N + N < 2^24, true for every
    caller (max: line distances 10^4 x N=1024) — so ONE min-reduce yields
    both the best distance and its column, and a second masked min-reduce
    (best column excluded, ties by value still count) yields second-best.
    Matches argmin semantics exactly: the smallest column wins ties.
    """
    n = dist.shape[1]
    inv = jnp.asarray(invalid, dist.dtype)
    d = jnp.where(mask, dist, inv)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    key = d.astype(jnp.float32) * n + cols.astype(jnp.float32)
    kbest = jnp.min(key, axis=1)
    bestf = jnp.floor(kbest / n)
    best_idx = (kbest - bestf * n).astype(jnp.int32)
    # Exclude the best COLUMN (not value): duplicates of the best value in
    # other columns still count as second-best, like the .at[].set version.
    key_excl = jnp.asarray(invalid, jnp.float32) * n + (n - 1)
    ksec = jnp.min(
        jnp.where(cols == best_idx[:, None], key_excl, key), axis=1
    )
    second = jnp.floor(ksec / n)
    return best_idx, bestf.astype(dist.dtype), second.astype(dist.dtype)


def mutual_best(dist: jnp.ndarray, mask: jnp.ndarray, invalid: int = MAX_DIST + 1):
    """Mutual nearest-neighbor matches: returns (idx_b (N1,), ok (N1,))."""
    d = jnp.where(mask, dist, invalid)
    best_b = jnp.argmin(d, axis=1)
    best_a = jnp.argmin(d, axis=0)
    ok = best_a[best_b] == jnp.arange(d.shape[0])
    ok &= jnp.take_along_axis(d, best_b[:, None], axis=1)[:, 0] <= MAX_DIST
    return best_b, ok


def rotation_consistency_mask(
    angle_a: jnp.ndarray,
    angle_b_matched: jnp.ndarray,
    match_ok: jnp.ndarray,
    n_bins: int = 30,
    keep_top: int = 3,
) -> jnp.ndarray:
    """Keep matches whose angle difference falls in the `keep_top` most
    populated histogram bins (reference: src/ORBmatcher.cc rotation histogram,
    HISTO_LENGTH=30, ComputeThreeMaxima :1632)."""
    two_pi = 2.0 * jnp.pi
    rot = jnp.mod(angle_a - angle_b_matched, two_pi)
    bin_idx = jnp.clip((rot * n_bins / two_pi).astype(jnp.int32), 0, n_bins - 1)
    # Compare-reduce histogram: a scatter-add over n_bins slots serializes
    # per element on TPU (~0.5 ms/step batched at L=8192); the (n_bins, L)
    # one-hot sum is a few hundred K fused VPU ops.
    bins = jnp.arange(n_bins, dtype=jnp.int32)
    hist = jnp.sum(
        ((bin_idx[None, :] == bins[:, None]) & match_ok[None, :]).astype(
            jnp.int32
        ),
        axis=1,
    )
    _, top_bins = jax.lax.top_k(hist, keep_top)
    in_top = (bin_idx[:, None] == top_bins[None, :]).any(axis=1)
    return match_ok & in_top
