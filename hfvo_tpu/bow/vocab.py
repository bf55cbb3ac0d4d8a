"""Appearance vocabulary: descriptor -> word quantization, MXU-native.

Replaces DBoW2's hierarchical k-means ORB vocabulary + inverted file
(reference: Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h — a 6-level tree
loaded from a 40 MB blob; Thirdparty/DBoW2/DBoW2/FORB.cpp Hamming scoring).
Instead of a learned tree walked branch-by-branch, words come from a fixed
bank of random bipolar prototypes: `word = argmax(prototypes @ bits)` — one
(N, 256) x (256, W) matmul per frame on the MXU, no vocabulary file needed.
Random hyperplane LSH of this form preserves Hamming locality, which is all
the BoW layer needs for candidate retrieval; the verification stage
(descriptor matching + RANSAC) does the precise work, as in the reference.

BoW vectors are L1-normalized word histograms scored with the same L1
similarity as DBoW2 (ScoringObject.cpp).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hamming import unpack_bits

N_WORDS = 1024

_rs = np.random.RandomState(123)
# Bipolar prototype bank (W, 256).
PROTOTYPES = (_rs.rand(N_WORDS, 256) < 0.5).astype(np.float32) * 2.0 - 1.0

# Optional trained DBoW2 vocabulary (set_vocabulary). When active,
# compute_words descends the tree and bow_histogram folds word ids into
# the SAME fixed-width histogram (word_id mod N_WORDS) so database shapes
# stay jit-static regardless of vocabulary size.
_ACTIVE_TREE = None


def set_vocabulary(path: str | None) -> None:
    """Load a trained DBoW2 text vocabulary (e.g. ORBvoc.txt; reference:
    System.cc:70-74 loadFromTextFile). Pass None to return to the
    file-free LSH prototype bank."""
    global _ACTIVE_TREE
    if path is None:
        _ACTIVE_TREE = None
        return
    from .dbow2 import load_dbow2_text

    _ACTIVE_TREE = load_dbow2_text(path)


@jax.jit
def _compute_words_lsh(desc: jnp.ndarray) -> jnp.ndarray:
    bits = unpack_bits(desc) * 2.0 - 1.0  # (N, 256) bipolar
    # ±1 x ±1 with sums within ±256: exact in bf16 — opt out of the
    # package-wide f32 matmul default (see ops/hamming.py).
    scores = jnp.dot(bits, jnp.asarray(PROTOTYPES).T,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.DEFAULT)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def compute_words(desc: jnp.ndarray) -> jnp.ndarray:
    """Packed descriptors (N, 8) uint32 -> word ids (N,) int32."""
    if _ACTIVE_TREE is not None:
        from .dbow2 import compute_words_tree

        return compute_words_tree(desc, _ACTIVE_TREE) % N_WORDS
    return _compute_words_lsh(desc)


@jax.jit
def bow_histogram(words: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Word ids (N,) + validity -> L1-normalized histogram (N_WORDS,)."""
    h = jnp.zeros((N_WORDS,), jnp.float32).at[words].add(valid.astype(jnp.float32))
    return h / jnp.maximum(jnp.sum(h), 1.0)


def bow_histogram_np(words: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Host-side `bow_histogram` (the keyframe path already holds pulled
    word ids; a device round trip just for a bincount would cost an RTT)."""
    h = np.bincount(
        np.asarray(words)[np.asarray(valid)], minlength=N_WORDS
    ).astype(np.float32)
    return h / max(h.sum(), 1.0)


def l1_score(h1: jnp.ndarray, h2: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity in [0, 1]: 1 - 0.5 * |h1 - h2|_1
    (reference: DBoW2/ScoringObject.cpp L1Scoring)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(h1 - h2), axis=-1)
