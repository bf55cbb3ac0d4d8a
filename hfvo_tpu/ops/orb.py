"""ORB keypoint orientation + rBRIEF descriptors, batched over keypoints.

Replaces the reference's extractor core (reference: src/ORBextractor.cc:
`IC_Angle` :77, `computeOrbDescriptor` :105, `operator()` :1041) with
vmapped patch gathers. Deviations from the reference, by design:

- The 256 BRIEF point pairs are *generated* from a fixed-seed Gaussian
  (sigma = patch/5, clipped to a radius-13 disk, the original BRIEF paper's
  G-II distribution) instead of copying the learned OpenCV pattern table.
  Both frames use the same pattern, so matching is self-consistent; absolute
  descriptor values differ from OpenCV's.
- Keypoint budgeting is per-cell top-k (ops/fast.py) instead of quadtree.

Descriptors are packed (N, 8) uint32 = 256 bits.
"""
from __future__ import annotations

from functools import partial
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OrbConfig
from . import fast as fast_ops
from .image import build_pyramid, extract_patches, gaussian_blur

PATCH_R = 15  # orientation patch radius (31x31), reference HALF_PATCH_SIZE
_PATTERN_R = 13  # BRIEF sample points live in a radius-13 disk


def _make_pattern(seed: int = 42, n_bits: int = 256) -> np.ndarray:
    """(n_bits, 4) float32 of (x1, y1, x2, y2) BRIEF sample offsets."""
    rs = np.random.RandomState(seed)
    pts = []
    while len(pts) < n_bits:
        p = rs.normal(0.0, PATCH_R * 2 / 5.0, size=4)
        if np.hypot(p[0], p[1]) <= _PATTERN_R and np.hypot(p[2], p[3]) <= _PATTERN_R:
            pts.append(p)
    return np.asarray(pts, dtype=np.float32)


BRIEF_PATTERN = _make_pattern()

# Steered BRIEF via quantized rotations, as in the ORB paper ("we discretize
# the angle to increments of 2pi/30 and construct a lookup table of
# precomputed BRIEF patterns"; the reference rotates per keypoint at
# descriptor time, src/ORBextractor.cc:110-121). On TPU the lookup table
# becomes a bank of {-1,0,+1} difference matrices so the per-keypoint
# "gather 512 rotated samples" turns into one MXU matmul plus a one-hot
# bin selection — a per-element gather over 31x31 patches costs ~50 ms per
# batch-8 frame step, the matmul form ~2 ms.
N_ANGLE_BINS = 32


def _make_bin_diff_mats() -> np.ndarray:
    """(N_ANGLE_BINS, 961, 256) float32: column j of bank b holds +1 at the
    rotated-and-rounded patch index of pattern point 2 and -1 at point 1,
    so patch_flat @ W_b = (v2 - v1) for every pair under rotation bin b."""
    side = 2 * PATCH_R + 1
    out = np.zeros((N_ANGLE_BINS, side * side, 256), np.float32)
    j = np.arange(256)
    for b in range(N_ANGLE_BINS):
        th = 2.0 * np.pi * b / N_ANGLE_BINS
        ca, sa = np.cos(th), np.sin(th)
        x1 = BRIEF_PATTERN[:, 0] * ca - BRIEF_PATTERN[:, 1] * sa
        y1 = BRIEF_PATTERN[:, 0] * sa + BRIEF_PATTERN[:, 1] * ca
        x2 = BRIEF_PATTERN[:, 2] * ca - BRIEF_PATTERN[:, 3] * sa
        y2 = BRIEF_PATTERN[:, 2] * sa + BRIEF_PATTERN[:, 3] * ca
        ix1 = np.clip(np.round(x1).astype(int) + PATCH_R, 0, side - 1)
        iy1 = np.clip(np.round(y1).astype(int) + PATCH_R, 0, side - 1)
        ix2 = np.clip(np.round(x2).astype(int) + PATCH_R, 0, side - 1)
        iy2 = np.clip(np.round(y2).astype(int) + PATCH_R, 0, side - 1)
        np.add.at(out[b], (iy2 * side + ix2, j), 1.0)
        np.add.at(out[b], (iy1 * side + ix1, j), -1.0)
    return out


BIN_DIFF_MATS = _make_bin_diff_mats()

# Circular mask for the intensity-centroid moment patch.
_yy, _xx = np.mgrid[-PATCH_R : PATCH_R + 1, -PATCH_R : PATCH_R + 1]
CIRC_MASK = (_yy**2 + _xx**2 <= PATCH_R**2).astype(np.float32)
MOMENT_X = (_xx * CIRC_MASK).astype(np.float32)
MOMENT_Y = (_yy * CIRC_MASK).astype(np.float32)


def ic_angles_from_patches(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation (radians) from (N, 31, 31) patches."""
    m10 = jnp.sum(patches * jnp.asarray(MOMENT_X), axis=(1, 2))
    m01 = jnp.sum(patches * jnp.asarray(MOMENT_Y), axis=(1, 2))
    return jnp.arctan2(m01, m10)


def ic_angles(img: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation (radians) for keypoints (N, 2) int."""
    return ic_angles_from_patches(extract_patches(img, yx, PATCH_R))


def brief_from_patches(
    patches: jnp.ndarray, angles: jnp.ndarray
) -> jnp.ndarray:
    """Steered-BRIEF 256-bit descriptors -> (N, 8) uint32 from (N, 31, 31)
    patches.

    The keypoint angle selects one of N_ANGLE_BINS precomputed rotated
    patterns (the ORB paper's 2pi/30 lookup-table discretization; the
    reference samples at integer-rounded rotated offsets,
    src/ORBextractor.cc:110-121 GET_VALUE). All bins are evaluated as one
    (N, 961) @ (961, BINS*256) MXU matmul; a one-hot reduction then picks
    each keypoint's bin — no per-element gathers.
    """
    flat = patches.reshape(patches.shape[0], -1)  # (N, 961)
    bins = jnp.mod(
        jnp.round(angles * (N_ANGLE_BINS / (2.0 * jnp.pi))).astype(jnp.int32),
        N_ANGLE_BINS,
    )
    # precision=DEFAULT (bf16 on TPU): the heaviest matmul of the frame.
    # Inputs are {-1,0,+1} pair matrices x smoothed uint8 intensities; the
    # only consumers are the SIGNS of the pair differences, and the
    # reference's own BRIEF samples integer-rounded intensities
    # (src/ORBextractor.cc:110-121) — sign flips at |diff| ~ 1 intensity
    # level are sensor-noise-level for a Hamming-thresholded descriptor.
    diff = jnp.einsum(
        "np,bpj->nbj", flat, jnp.asarray(BIN_DIFF_MATS),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # (N, BINS, 256) = v2 - v1 under every rotation bin
    onehot = (bins[:, None] == jnp.arange(N_ANGLE_BINS)[None, :]).astype(
        jnp.float32
    )
    sel = jnp.einsum("nbj,nb->nj", diff, onehot,
                     precision=jax.lax.Precision.DEFAULT)  # (N, 256)
    bits = (sel > 0).astype(jnp.uint32)  # (N, 256)
    # Pack 256 bits -> 8 uint32 words (bit j of word k = bit 32k+j).
    shifts = jnp.asarray(np.arange(32, dtype=np.uint32))
    words = bits.reshape(-1, 8, 32) << shifts[None, None, :]
    return jnp.sum(words, axis=2, dtype=jnp.uint32)


def brief_descriptors(
    img_blur: jnp.ndarray, yx: jnp.ndarray, angles: jnp.ndarray
) -> jnp.ndarray:
    """Steered-BRIEF descriptors sampling patches from `img_blur`."""
    return brief_from_patches(extract_patches(img_blur, yx, PATCH_R), angles)


class OrbFeatures(NamedTuple):
    """Fixed-capacity per-frame ORB features (level-0 pixel coordinates)."""

    uv: jnp.ndarray  # (N, 2) float32, (x, y) at level-0 scale
    response: jnp.ndarray  # (N,)
    angle: jnp.ndarray  # (N,) radians
    octave: jnp.ndarray  # (N,) int32
    desc: jnp.ndarray  # (N, 8) uint32
    valid: jnp.ndarray  # (N,) bool

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]


def level_budgets(n_features: int, n_levels: int, scale: float) -> List[int]:
    """Per-level keypoint budgets, geometric like the reference
    (src/ORBextractor.cc:448-470)."""
    inv = 1.0 / scale
    raw = np.array([inv**l for l in range(n_levels)])
    b = np.floor(n_features * raw / raw.sum()).astype(int)
    b[-1] = max(n_features - int(b[:-1].sum()), 0)
    return [int(x) for x in b]


@partial(jax.jit, static_argnums=(1, 2))
def extract_orb(img: jnp.ndarray, cfg: OrbConfig, capacity: int) -> OrbFeatures:
    """Full ORB extraction over the pyramid into fixed-capacity arrays.

    img: (H, W) float32 grayscale in [0, 255].
    """
    pyr = build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    budgets = level_budgets(cfg.n_features, cfg.n_levels, cfg.scale_factor)
    uvs, resps, angs, octs, descs, valids = [], [], [], [], [], []
    for l, (img_l, budget) in enumerate(zip(pyr, budgets)):
        if budget == 0:
            continue
        yx, resp, valid = fast_ops.detect_grid_topk(
            img_l,
            float(cfg.ini_th_fast),
            float(cfg.min_th_fast),
            cfg.grid_cell,
            budget,
            cfg.edge_threshold,
        )
        # ONE patch extraction per level serves both the orientation and the
        # descriptor (the reference reads IC moments from the raw level and
        # BRIEF from the blurred one, src/ORBextractor.cc:467-480; the
        # intensity centroid is robust to the sigma=2 blur, and halving the
        # patch matmuls saves ~1.5 ms/frame on TPU).
        blur = gaussian_blur(img_l, 2.0, 3)
        patches = extract_patches(blur, yx, PATCH_R)
        ang = ic_angles_from_patches(patches)
        desc = brief_from_patches(patches, ang)
        # Map level-l pixel centers to level-0 coordinates with the *actual*
        # per-level scale and the half-pixel offset of bilinear resize
        # (out pixel i samples input at (i+0.5)*scale-0.5); using a bare
        # scale_factor**l would bias high-octave keypoints by >1 px.
        h_l, w_l = img_l.shape
        sx = img.shape[1] / w_l
        sy = img.shape[0] / h_l
        u = (yx[:, 1].astype(jnp.float32) + 0.5) * sx - 0.5
        v = (yx[:, 0].astype(jnp.float32) + 0.5) * sy - 0.5
        uv = jnp.stack([u, v], axis=1)
        uvs.append(uv)
        resps.append(resp)
        angs.append(ang)
        octs.append(jnp.full((budget,), l, dtype=jnp.int32))
        descs.append(desc)
        valids.append(valid)

    uv = jnp.concatenate(uvs)
    resp = jnp.concatenate(resps)
    ang = jnp.concatenate(angs)
    octv = jnp.concatenate(octs)
    desc = jnp.concatenate(descs)
    valid = jnp.concatenate(valids)
    n = uv.shape[0]
    if n < capacity:
        pad = capacity - n
        uv = jnp.pad(uv, ((0, pad), (0, 0)))
        resp = jnp.pad(resp, (0, pad))
        ang = jnp.pad(ang, (0, pad))
        octv = jnp.pad(octv, (0, pad))
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    else:
        uv, resp, ang, octv, desc, valid = (
            uv[:capacity], resp[:capacity], ang[:capacity],
            octv[:capacity], desc[:capacity], valid[:capacity],
        )
    return OrbFeatures(uv, resp, ang, octv, desc, valid)
