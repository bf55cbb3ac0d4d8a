"""Basic image ops: separable Gaussian blur, resize, gradients, pyramids.

Replaces the reference's OpenCV usage (`cv::GaussianBlur` before descriptor
computation, reference: src/ORBextractor.cc:1026-1038; `cv::resize` pyramid,
reference: src/ORBextractor.cc:1105-1131). Everything is pure jnp on (H, W)
float32 single-channel images so XLA can fuse.
"""
from __future__ import annotations

import math
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _conv1d(img: jnp.ndarray, k: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Separable 1D convolution along `axis` with reflect padding."""
    r = (k.shape[0] - 1) // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (r, r)
    x = jnp.pad(img, pad, mode="reflect")
    # Shift-and-accumulate: small fixed kernel, XLA fuses this well.
    out = jnp.zeros_like(img)
    for i in range(k.shape[0]):
        sl = [slice(None), slice(None)]
        sl[axis] = slice(i, i + img.shape[axis])
        out = out + k[i] * x[tuple(sl)]
    return out


def gaussian_blur(img: jnp.ndarray, sigma: float = 2.0, radius: int = 3) -> jnp.ndarray:
    """7x7 Gaussian blur (sigma 2), matching the pre-descriptor blur of the
    reference (src/ORBextractor.cc:1036 `GaussianBlur(..., Size(7,7), 2, 2)`)."""
    k = jnp.asarray(gaussian_kernel1d(sigma, radius))
    return _conv1d(_conv1d(img, k, 0), k, 1)


def resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    return jax.image.resize(img, out_hw, method="bilinear")


def pyramid_shapes(h: int, w: int, n_levels: int, scale: float) -> List[Tuple[int, int]]:
    return [
        (int(round(h / scale**l)), int(round(w / scale**l))) for l in range(n_levels)
    ]


def build_pyramid(
    img: jnp.ndarray, n_levels: int = 8, scale: float = 1.2
) -> List[jnp.ndarray]:
    """Image pyramid with per-level static shapes (reference:
    src/ORBextractor.cc:1105 `ComputePyramid`)."""
    h, w = img.shape
    out = [img]
    for l in range(1, n_levels):
        hh, ww = int(round(h / scale**l)), int(round(w / scale**l))
        out.append(resize_bilinear(out[-1], (hh, ww)))
    return out


def sobel_gradients(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(gx, gy) Sobel gradients with reflect padding."""
    x = jnp.pad(img, 1, mode="reflect")
    gx = (
        (x[:-2, 2:] + 2 * x[1:-1, 2:] + x[2:, 2:])
        - (x[:-2, :-2] + 2 * x[1:-1, :-2] + x[2:, :-2])
    ) * 0.25
    gy = (
        (x[2:, :-2] + 2 * x[2:, 1:-1] + x[2:, 2:])
        - (x[:-2, :-2] + 2 * x[:-2, 1:-1] + x[:-2, 2:])
    ) * 0.25
    return gx, gy


@partial(jax.jit, static_argnums=(1,))
def maxpool2d_same(x: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """k x k max pool with stride 1 and same shape (for NMS)."""
    r = k // 2
    xp = jnp.pad(x, r, mode="constant", constant_values=-jnp.inf)
    out = x
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            out = jnp.maximum(out, xp[r + dy : r + dy + x.shape[0], r + dx : r + dx + x.shape[1]])
    return out


def extract_patches(
    img: jnp.ndarray, centers_yx: jnp.ndarray, radius: int
) -> jnp.ndarray:
    """Gather square patches (N, 2r+1, 2r+1) around integer centers (N, 2).

    Centers are clamped so patches stay in bounds; callers guarantee
    border-margin validity for real keypoints.
    """
    size = 2 * radius + 1
    h, w = img.shape
    y0 = jnp.clip(centers_yx[:, 0] - radius, 0, h - size).astype(jnp.int32)
    x0 = jnp.clip(centers_yx[:, 1] - radius, 0, w - size).astype(jnp.int32)
    # One-hot matmul extraction: vmapped dynamic_slice lowers to a
    # SEQUENTIAL per-point while loop on TPU (~2-4 us/iteration — ~8 ms per
    # frame over the ORB pyramid), while two one-hot contractions ride the
    # MXU. precision=DEFAULT opts out of the package-wide f32 ("highest",
    # 6-pass) MXU mode: the one-hot operand is exactly representable in
    # bf16, and the image side's bf16 rounding (<= 0.5 of 255 on blurred
    # intensities) is below the BRIEF comparator's own integer-rounded
    # sampling noise (same argument as the descriptor bank, BENCH_NOTES r4)
    # — measured 4x on this stage (1.4 -> 0.35 ms per batch-8 step). On
    # CPU the precision hint is a no-op and the math stays exact f32.
    span = jnp.arange(size, dtype=jnp.int32)
    ys = y0[:, None] + span  # (N, size)
    xs = x0[:, None] + span
    oh_y = (ys[:, :, None] == jnp.arange(h, dtype=jnp.int32)).astype(img.dtype)
    rows = jnp.einsum(
        "nrh,hw->nrw", oh_y, img, precision=jax.lax.Precision.DEFAULT
    )  # (N, size, W)
    oh_x = (xs[:, :, None] == jnp.arange(w, dtype=jnp.int32)).astype(img.dtype)
    return jnp.einsum(
        "nrw,ncw->nrc", rows, oh_x, precision=jax.lax.Precision.DEFAULT
    )


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample at float coords (..., 2) as (x, y). Out-of-bounds clamped."""
    h, w = img.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
