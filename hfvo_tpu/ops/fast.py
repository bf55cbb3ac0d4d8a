"""FAST-9/16 corner detection as a dense, branch-free array program.

Replaces the per-cell `cv::FAST` calls of the reference
(reference: src/ORBextractor.cc:770-860: FAST in 30-px cells with threshold
fallback 20 -> 7). Here the whole image is scored at both thresholds in one
pass; the high-threshold response dominates so the budgeted selection prefers
strong corners but can fall back to weak ones in empty regions — the same
intent as the reference's per-cell retry, without data-dependent control flow.

Score is the arc-strength (sum of |p_i - center| - t over the best contiguous
bright/dark arc proxy), which orders corners like OpenCV's FAST score for NMS
purposes (exact max-threshold bisection score deviates; documented).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .image import gaussian_blur, maxpool2d_same, sobel_gradients

# Bresenham circle of radius 3, 16 points, clockwise from 12 o'clock, as
# (dy, dx) offsets.
CIRCLE_OFFSETS = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3),
        (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

ARC_LEN = 9  # FAST-9


def _circle_stack(img: jnp.ndarray) -> jnp.ndarray:
    """(16, H, W) stack of the circle-neighbor images via rolls."""
    return jnp.stack(
        [jnp.roll(img, (-int(dy), -int(dx)), axis=(0, 1)) for dy, dx in CIRCLE_OFFSETS]
    )


def _contiguous_arc(mask: jnp.ndarray) -> jnp.ndarray:
    """Any contiguous run of ARC_LEN true values on the circular 16-axis 0."""
    acc = mask
    for k in range(1, ARC_LEN):
        acc = acc & jnp.roll(mask, -k, axis=0)
    return jnp.any(acc, axis=0)


def fast_score(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-9/16 response map (H, W); zero where not a corner."""
    c = img[None]
    ring = _circle_stack(img)
    bright = ring > c + threshold
    dark = ring < c - threshold
    is_corner = _contiguous_arc(bright) | _contiguous_arc(dark)
    bright_s = jnp.sum(jnp.where(bright, ring - c - threshold, 0.0), axis=0)
    dark_s = jnp.sum(jnp.where(dark, c - threshold - ring, 0.0), axis=0)
    score = jnp.maximum(bright_s, dark_s)
    # Kill the (invalid) wrap-around border introduced by jnp.roll.
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    return jnp.where(is_corner & interior, score, 0.0)


def fast_nms(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression on a response map."""
    return jnp.where(score >= maxpool2d_same(score, 3), score, 0.0)


def shi_tomasi_min_eig(img: jnp.ndarray) -> jnp.ndarray:
    """Min eigenvalue of the smoothed gradient structure tensor.

    Straight edges have lambda_min ~ 0 while true corners have both
    eigenvalues large; FAST's arc test alone fires along high-contrast
    straight edges (aliasing), where descriptors are identical along the
    edge and matches slide (the aperture problem — the exact failure the
    reference's line features exist to absorb).
    """
    gx, gy = sobel_gradients(img)
    sxx = gaussian_blur(gx * gx, 1.5, 2)
    syy = gaussian_blur(gy * gy, 1.5, 2)
    sxy = gaussian_blur(gx * gy, 1.5, 2)
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    disc = jnp.sqrt(jnp.maximum(tr * tr * 0.25 - det, 0.0))
    return tr * 0.5 - disc


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def detect_grid_topk(
    img: jnp.ndarray,
    th_high: float,
    th_low: float,
    cell: int,
    n_keep: int,
    border: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """FAST keypoints with per-cell uniformity and a fixed budget.

    Returns (yx (n_keep, 2) int32, response (n_keep,), valid (n_keep,)).

    Replaces the reference's quadtree `DistributeOctTree`
    (src/ORBextractor.cc:537) with: dual-threshold scoring (high-threshold
    corners get a large bonus so they always win over fallback corners),
    3x3 NMS, per-`cell` top-1 bucketing, then global top-`n_keep`.
    """
    h, w = img.shape
    if jax.default_backend() == "tpu":
        # Fused Pallas kernel: ~30x faster than the jnp formulation on TPU
        # (whole ring test in VMEM, no boolean intermediates in HBM); the
        # dual-threshold variant runs both thresholds in one pass over the
        # ring stack and emits the combined priority map directly.
        from .pallas_fast import fast_score_dual_pallas

        combined = fast_score_dual_pallas(
            img, float(th_low), float(th_high), bonus=1e4
        )
    else:
        s_low = fast_score(img, th_low)
        s_high = fast_score(img, th_high)
        combined = jnp.where(s_high > 0, s_high + 1e4, s_low)
    # High-threshold corners dominate ordering; low-threshold ones fill gaps.
    score = fast_nms(combined)
    # Edge suppression: reject responses whose structure tensor is
    # edge-like (lambda_min small relative to lambda-scale); keeps corners
    # and stripe crossings, kills slide-prone points along straight edges.
    lam_min = shi_tomasi_min_eig(img)
    score = jnp.where(lam_min > 20.0, score, 0.0)

    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    in_border = (
        (yy >= border) & (yy < h - border) & (xx >= border) & (xx < w - border)
    )
    score = jnp.where(in_border, score, 0.0)

    # Per-cell argmax. Pad to a multiple of the cell size.
    gh, gw = -(-h // cell), -(-w // cell)
    pad_h, pad_w = gh * cell - h, gw * cell - w
    sp = jnp.pad(score, ((0, pad_h), (0, pad_w)))
    cells = sp.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3).reshape(gh * gw, cell * cell)
    best_in_cell = jnp.argmax(cells, axis=1)
    best_score = jnp.take_along_axis(cells, best_in_cell[:, None], axis=1)[:, 0]
    cy = best_in_cell // cell
    cx = best_in_cell % cell
    gy = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0).reshape(-1)
    gx = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1).reshape(-1)
    ys = gy * cell + cy
    xs = gx * cell + cx

    k = min(n_keep, gh * gw)
    top_score, top_idx = jax.lax.top_k(best_score, k)
    yx = jnp.stack([ys[top_idx], xs[top_idx]], axis=1)
    valid = top_score > 0
    if k < n_keep:
        yx = jnp.pad(yx, ((0, n_keep - k), (0, 0)))
        top_score = jnp.pad(top_score, (0, n_keep - k))
        valid = jnp.pad(valid, (0, n_keep - k))
    # Report the raw response (strip the high-threshold bonus).
    resp = jnp.where(top_score > 1e4, top_score - 1e4, top_score)
    return yx, jnp.where(valid, resp, 0.0), valid
