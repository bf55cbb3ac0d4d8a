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

    Samples the rotated pattern with nearest-neighbor reads from the patch
    (reference rounds to integer offsets the same way,
    src/ORBextractor.cc:110-121 GET_VALUE).
    """
    pat = jnp.asarray(BRIEF_PATTERN)  # (256, 4)
    ca, sa = jnp.cos(angles), jnp.sin(angles)  # (N,)
    # Rotate both sample points of every pair: (N, 256)
    x1 = pat[None, :, 0] * ca[:, None] - pat[None, :, 1] * sa[:, None]
    y1 = pat[None, :, 0] * sa[:, None] + pat[None, :, 1] * ca[:, None]
    x2 = pat[None, :, 2] * ca[:, None] - pat[None, :, 3] * sa[:, None]
    y2 = pat[None, :, 2] * sa[:, None] + pat[None, :, 3] * ca[:, None]
    ix1 = jnp.clip(jnp.round(x1).astype(jnp.int32) + PATCH_R, 0, 2 * PATCH_R)
    iy1 = jnp.clip(jnp.round(y1).astype(jnp.int32) + PATCH_R, 0, 2 * PATCH_R)
    ix2 = jnp.clip(jnp.round(x2).astype(jnp.int32) + PATCH_R, 0, 2 * PATCH_R)
    iy2 = jnp.clip(jnp.round(y2).astype(jnp.int32) + PATCH_R, 0, 2 * PATCH_R)
    flat = patches.reshape(patches.shape[0], -1)  # (N, 31*31)
    W = 2 * PATCH_R + 1
    v1 = jnp.take_along_axis(flat, iy1 * W + ix1, axis=1)
    v2 = jnp.take_along_axis(flat, iy2 * W + ix2, axis=1)
    bits = (v1 < v2).astype(jnp.uint32)  # (N, 256)
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
