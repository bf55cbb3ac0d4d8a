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


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Hamming distances (N1, N2) int32 from packed descriptors."""
    a = unpack_bits(desc_a) * 2.0 - 1.0
    b = unpack_bits(desc_b) * 2.0 - 1.0
    # precision=DEFAULT (bf16 inputs on TPU) is EXACT here: ±1 inputs and
    # partial sums within ±256 are all representable in bf16/f32-accum, so
    # this opts out of the package-wide f32 ("highest") default for free
    # MXU speed (hfvo_tpu/__init__.py).
    dot = jnp.dot(a, b.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    return ((MAX_DIST - dot) * 0.5).astype(jnp.int32)


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
    """
    d = jnp.where(mask, dist, invalid)
    best_idx = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(invalid)
    second = jnp.min(d2, axis=1)
    return best_idx, best, second


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
    hist = jnp.zeros((n_bins,), jnp.int32).at[bin_idx].add(match_ok.astype(jnp.int32))
    _, top_bins = jax.lax.top_k(hist, keep_top)
    in_top = (bin_idx[:, None] == top_bins[None, :]).any(axis=1)
    return match_ok & in_top
