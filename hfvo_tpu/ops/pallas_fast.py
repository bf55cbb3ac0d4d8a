"""Pallas TPU kernel for the FAST-9/16 corner response map.

The jnp formulation in ops/fast.py materializes a (16, H, W) ring stack and
then ~2x16 boolean mask stacks plus 16-way rolled AND-reductions in HBM;
XLA fuses some of it but the arc test still round-trips large intermediates.
Here XLA only produces the 16 shifted ring images (cheap strided slices of
one padded copy); the Pallas kernel consumes one (16, tile) block + the
center tile and performs all 32 threshold comparisons, both 16-start
contiguous-arc tests, and the arc-strength accumulation entirely in VMEM —
one pass, no boolean intermediates in HBM.

`fast_score_pallas(img, th)` matches `ops.fast.fast_score(img, th)`: the
corner SET is bit-exact (the packed arc test is integer logic); scores agree
to float accumulation order (~2^-11 relative on TPU, exact in interpret
mode), which only reorders exact ties in downstream top-k ranking.

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


def _contiguous_arc(masks):
    """True where any ARC_LEN-long circular run of the 16 masks holds.

    Bit-packed log-step run-length test: flags pack into one int32 lane
    (low 16 bits), the circle unrolls by doubling (x | x << 16), and
    r_{2k} = r_k & (r_k >> k) halves the remaining length each step —
    ~20 integer ops vs the 16-start x (ARC_LEN-1)-AND sweep's ~128."""
    x = None
    for k, f in enumerate(masks):
        b = f.astype(jnp.int32) << k
        x = b if x is None else x | b
    x = x | (x << 16)
    run = x
    need = ARC_LEN
    step = 1
    while step * 2 <= need:
        run = run & (run >> step)
        step *= 2
    if step < need:
        # run holds length-`step` runs; r_step & (r_step >> (need - step))
        # extends to `need` (valid while need - step <= step).
        run = run & (run >> (need - step))
    return (run & 0xFFFF) != 0


def _fast_score_tile(rings, c, th: float):
    """Masked FAST-9/16 arc-strength score for one VMEM tile at threshold
    `th` — shared by the single- and dual-threshold kernels so threshold
    semantics cannot diverge between them."""
    bright = [r > c + th for r in rings]
    dark = [r < c - th for r in rings]
    is_corner = jnp.logical_or(
        _contiguous_arc(bright), _contiguous_arc(dark)
    )
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
    # Ring axis OUTERMOST: XLA's slice-stack fusion naturally emits the
    # (S, 16, ph, pw) stack in layout {3,2,0,1} — which IS the default
    # layout of (16, S, ph, pw). Passing it that way (block squeezing the
    # batch dim) avoids a 0.5 ms full-ring relayout copy per batch-8 step
    # that the (S, 16, ...) operand order forced.
    ring = jnp.moveaxis(ring, 1, 0)
    out = pl.pallas_call(
        functools.partial(_kernel, th=th),
        grid=(s, gh, gw),
        in_specs=[
            pl.BlockSpec(
                (16, None, TILE_H, TILE_W), lambda b, i, j: (0, b, i, j)
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
    # Ring axis outermost — see _score_batched for the layout rationale.
    ring = jnp.moveaxis(ring, 1, 0)
    out = pl.pallas_call(
        functools.partial(
            _kernel_dual, th_low=th_low, th_high=th_high, bonus=bonus
        ),
        grid=(s, gh, gw),
        in_specs=[
            pl.BlockSpec(
                (16, None, TILE_H, TILE_W), lambda b, i, j: (0, b, i, j)
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
