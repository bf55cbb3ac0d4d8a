"""Pallas TPU kernel for the FAST-9/16 corner response map.

The jnp formulation in ops/fast.py materializes a (16, H, W) ring stack and
then ~2x16 boolean mask stacks plus 16-way rolled AND-reductions in HBM;
XLA fuses some of it but the arc test still round-trips large intermediates.
Here XLA only produces the 16 shifted ring images (cheap strided slices of
one padded copy); the Pallas kernel consumes one (16, tile) block + the
center tile and performs all 32 threshold comparisons, both 16-start
contiguous-arc tests, and the arc-strength accumulation entirely in VMEM —
one pass, no boolean intermediates in HBM.

`fast_score_pallas(img, th)` matches `ops.fast.fast_score(img, th)` exactly.

Batching: `jax.vmap`'s automatic pallas batching places the batch axis where
the TPU tiling rules reject it, so the kernel registers a `custom_vmap` rule
that lowers a batched call to the same kernel over a (S, gh, gw) grid with
the batch dimension squeezed per block — the multi-sequence tracker
(parallel/multiseq.py) vmaps the whole fused per-frame program through this.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fast import ARC_LEN, CIRCLE_OFFSETS

TILE_H = 128
TILE_W = 128


def _fast_score_tile(rings, c, th: float):
    """Masked FAST-9/16 arc-strength score for one VMEM tile at threshold
    `th` — shared by the single- and dual-threshold kernels so threshold
    semantics cannot diverge between them."""
    bright = [r > c + th for r in rings]
    dark = [r < c - th for r in rings]

    def contiguous(masks):
        acc = None
        for start in range(16):
            run = masks[start]
            for k in range(1, ARC_LEN):
                run = jnp.logical_and(run, masks[(start + k) % 16])
            acc = run if acc is None else jnp.logical_or(acc, run)
        return acc

    is_corner = jnp.logical_or(contiguous(bright), contiguous(dark))
    bright_s = jnp.zeros_like(c)
    dark_s = jnp.zeros_like(c)
    for r, b, d in zip(rings, bright, dark):
        bright_s = bright_s + jnp.where(b, r - c - th, 0.0)
        dark_s = dark_s + jnp.where(d, c - th - r, 0.0)
    return jnp.where(is_corner, jnp.maximum(bright_s, dark_s), 0.0)


def _kernel(ring_ref, c_ref, out_ref, *, th: float):
    c = c_ref[...]  # (TILE_H, TILE_W)
    rings = [ring_ref[k] for k in range(16)]
    out_ref[...] = _fast_score_tile(rings, c, th)


def _kernel_dual(ring_ref, c_ref, out_ref, *, th_low: float, th_high: float,
                 bonus: float):
    """Both FAST thresholds in one VMEM pass, combined into the detector's
    priority score: high-threshold corners get `bonus` added so they always
    outrank low-threshold fallback corners (see fast.detect_grid_topk).
    Saves half the kernel launches and ring reloads of two single-threshold
    passes, and one full-res score map's HBM round trip."""
    c = c_ref[...]
    rings = [ring_ref[k] for k in range(16)]
    s_low = _fast_score_tile(rings, c, th_low)
    s_high = _fast_score_tile(rings, c, th_high)
    out_ref[...] = jnp.where(s_high > 0, s_high + bonus, s_low)


def _pad_and_ring(img: jnp.ndarray):
    """(…, H, W) -> padded center (…, ph, pw) + ring stack (…, 16, ph, pw)."""
    h, w = img.shape[-2:]
    gh = -(-h // TILE_H)
    gw = -(-w // TILE_W)
    ph, pw = gh * TILE_H, gw * TILE_W
    pad = 3
    widths = [(0, 0)] * (img.ndim - 2) + [
        (pad, ph - h + pad),
        (pad, pw - w + pad),
    ]
    img_p = jnp.pad(img, widths)
    center = img_p[..., pad : pad + ph, pad : pad + pw]
    ring = jnp.stack(
        [
            img_p[
                ...,
                pad + int(dy) : pad + int(dy) + ph,
                pad + int(dx) : pad + int(dx) + pw,
            ]
            for dy, dx in CIRCLE_OFFSETS
        ],
        axis=-3,
    )
    return center, ring, gh, gw, ph, pw


def _mask_interior(out: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    return jnp.where(interior, out, 0.0)


def _score_2d(img: jnp.ndarray, th: float, interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl

    h, w = img.shape
    center, ring, gh, gw, ph, pw = _pad_and_ring(img)
    out = pl.pallas_call(
        functools.partial(_kernel, th=th),
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec((16, TILE_H, TILE_W), lambda i, j: (0, i, j)),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((ph, pw), img.dtype),
        interpret=interpret,
    )(ring, center)
    return _mask_interior(out[:h, :w], h, w)


def _score_batched(imgs: jnp.ndarray, th: float, interpret: bool) -> jnp.ndarray:
    """(S, H, W) -> (S, H, W): same kernel over an (S, gh, gw) grid with the
    batch dimension squeezed out of each block."""
    from jax.experimental import pallas as pl

    s, h, w = imgs.shape
    center, ring, gh, gw, ph, pw = _pad_and_ring(imgs)
    out = pl.pallas_call(
        functools.partial(_kernel, th=th),
        grid=(s, gh, gw),
        in_specs=[
            pl.BlockSpec(
                (None, 16, TILE_H, TILE_W), lambda b, i, j: (b, 0, i, j)
            ),
            pl.BlockSpec((None, TILE_H, TILE_W), lambda b, i, j: (b, i, j)),
        ],
        out_specs=pl.BlockSpec((None, TILE_H, TILE_W), lambda b, i, j: (b, i, j)),
        out_shape=jax.ShapeDtypeStruct((s, ph, pw), imgs.dtype),
        interpret=interpret,
    )(ring, center)
    return jax.vmap(lambda o: _mask_interior(o[:h, :w], h, w))(out)


@functools.lru_cache(maxsize=None)
def _make_fast_fn(th: float, interpret: bool):
    @jax.custom_batching.custom_vmap
    def fn(img):
        return _score_2d(img, th, interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, imgs):  # noqa: ANN001
        (img_batched,) = in_batched
        if not img_batched:
            return fn(imgs), False
        return _score_batched(imgs, th, interpret), True

    return fn


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_score_pallas(
    img: jnp.ndarray, threshold: float, interpret: bool = False
) -> jnp.ndarray:
    """Dense FAST-9/16 response map via a tiled Pallas kernel."""
    return _make_fast_fn(float(threshold), bool(interpret))(img)


def _dual_2d(img, th_low, th_high, bonus, interpret):
    from jax.experimental import pallas as pl

    h, w = img.shape
    center, ring, gh, gw, ph, pw = _pad_and_ring(img)
    out = pl.pallas_call(
        functools.partial(
            _kernel_dual, th_low=th_low, th_high=th_high, bonus=bonus
        ),
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec((16, TILE_H, TILE_W), lambda i, j: (0, i, j)),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((ph, pw), img.dtype),
        interpret=interpret,
    )(ring, center)
    return _mask_interior(out[:h, :w], h, w)


def _dual_batched(imgs, th_low, th_high, bonus, interpret):
    from jax.experimental import pallas as pl

    s, h, w = imgs.shape
    center, ring, gh, gw, ph, pw = _pad_and_ring(imgs)
    out = pl.pallas_call(
        functools.partial(
            _kernel_dual, th_low=th_low, th_high=th_high, bonus=bonus
        ),
        grid=(s, gh, gw),
        in_specs=[
            pl.BlockSpec(
                (None, 16, TILE_H, TILE_W), lambda b, i, j: (b, 0, i, j)
            ),
            pl.BlockSpec((None, TILE_H, TILE_W), lambda b, i, j: (b, i, j)),
        ],
        out_specs=pl.BlockSpec((None, TILE_H, TILE_W), lambda b, i, j: (b, i, j)),
        out_shape=jax.ShapeDtypeStruct((s, ph, pw), imgs.dtype),
        interpret=interpret,
    )(ring, center)
    return jax.vmap(lambda o: _mask_interior(o[:h, :w], h, w))(out)


@functools.lru_cache(maxsize=None)
def _make_dual_fn(th_low: float, th_high: float, bonus: float,
                  interpret: bool):
    @jax.custom_batching.custom_vmap
    def fn(img):
        return _dual_2d(img, th_low, th_high, bonus, interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, imgs):  # noqa: ANN001
        (img_batched,) = in_batched
        if not img_batched:
            return fn(imgs), False
        return _dual_batched(imgs, th_low, th_high, bonus, interpret), True

    return fn


@functools.partial(
    jax.jit, static_argnames=("th_low", "th_high", "bonus", "interpret")
)
def fast_score_dual_pallas(
    img: jnp.ndarray,
    th_low: float,
    th_high: float,
    bonus: float = 1e4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Combined dual-threshold FAST priority map, one kernel pass.

    Equals `where(s_high > 0, s_high + bonus, s_low)` for
    `s_* = fast_score_pallas(img, th_*)`."""
    return _make_dual_fn(
        float(th_low), float(th_high), float(bonus), bool(interpret)
    )(img)
