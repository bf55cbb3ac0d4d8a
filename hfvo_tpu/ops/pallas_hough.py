"""Pallas TPU kernel for the tiled gradient-weighted Hough vote.

The jnp formulation (`lines._tile_hough`) scans 36 theta rows; each
iteration builds a (tiles, pixels, N_RHO) one-hot and select-reduces it —
~530M VPU ops + ~220 us of sequential-loop sync per frame, and the loop
serializes under vmap (the batched tracker's single biggest scaling loss).

Key identity: each pixel votes into exactly THREE theta rows (its own
orientation bin at weight 1, the two neighbors at 0.5), so the whole
accumulator factorizes as a per-tile ONE-HOT MATMUL on the MXU:

    acc[a, b] = sum_p sum_d  w_d[p] * 1[a == theta_d[p]] * 1[b == rho_d[p]]
              = sum_d dot( A_d[a, p], B_d[b, p] )   (contract p on lanes)

A_d carries the vote weight in its theta one-hot and B_d the rho one-hot;
both are broadcast-compares from (1, P) lane rows — no reshapes, the
contraction rides the MXU's native rhs-transposed layout, and everything
stays in VMEM. Inputs arrive PRE-TILED as (T, TILE*TILE) rows (the same
`to_tiles` layout detection already builds for endpoint extraction); each
grid step processes TILES_PER_BLOCK sublane rows.

The dot runs in bfloat16 (B is exactly {0, 1}; A's magnitudes round ~0.4%,
far below the magnitude spread that ranks accumulator peaks) with float32
accumulation. Matches the scan formulation to ~1e-2 relative.

Reference behavior being replaced: LSD region-growing line detection
(Thirdparty/line_descriptor, src/LineExtractor.cpp) — see ops/lines.py for
the full deviation note.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE = 64  # Hough tile (must match lines.TILE)
N_THETA = 36
N_RHO = 48
_DIAG = TILE * (2.0 ** 0.5)
TILES_PER_BLOCK = 8
_P = TILE * TILE


def _kernel(m_ref, na_ref, out_ref):
    # m_ref/na_ref: (TILES_PER_BLOCK, P) — one Hough tile per sublane row.
    # Pixel p of a tile sits at local (y, x) = (p // TILE, p % TILE).
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _P), 1)
    xl = (p_iota % TILE).astype(jnp.float32)
    yl = (p_iota // TILE).astype(jnp.float32)
    a_iota = jax.lax.broadcasted_iota(jnp.int32, (N_THETA, 1), 0)
    b_iota = jax.lax.broadcasted_iota(jnp.int32, (N_RHO, 1), 0)

    for k in range(TILES_PER_BLOCK):
        w = m_ref[k : k + 1, :]  # (1, P); already 0 below threshold
        na = na_ref[k : k + 1, :]
        theta_bin = jnp.clip(
            (na / jnp.pi * N_THETA).astype(jnp.int32), 0, N_THETA - 1
        )
        acc = jnp.zeros((N_THETA, N_RHO), jnp.float32)
        for delta, wscale in ((0, 1.0), (-1, 0.5), (1, 0.5)):
            t = (theta_bin + delta) % N_THETA
            th = (t.astype(jnp.float32) + 0.5) / N_THETA * jnp.pi
            rho = xl * jnp.cos(th) + yl * jnp.sin(th)
            rb = jnp.clip(
                ((rho / _DIAG + 1.0) * 0.5 * N_RHO).astype(jnp.int32),
                0, N_RHO - 1,
            )
            A = jnp.where(t == a_iota, w * wscale, 0.0).astype(jnp.bfloat16)
            B = (rb == b_iota).astype(jnp.bfloat16)
            # Explicit DEFAULT precision: the package-global
            # default_matmul_precision=highest would request an fp32
            # contraction on bf16 operands, which Mosaic rejects — and the
            # whole point here is the single-pass bf16 MXU contraction.
            acc = acc + jax.lax.dot_general(
                A, B, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
        out_ref[k] = acc


def _vote(m_t, na_t, mag_th: float, interpret: bool):
    """(..., T, P) thresholded-magnitude + normal-angle tiles ->
    (..., T, N_THETA, N_RHO) accumulators."""
    from jax.experimental import pallas as pl

    T = m_t.shape[-2]
    tp = -(-T // TILES_PER_BLOCK) * TILES_PER_BLOCK
    lead = m_t.shape[:-2]
    pad = [(0, 0)] * len(lead) + [(0, tp - T), (0, 0)]
    w_t = jnp.pad(jnp.where(m_t > mag_th, m_t, 0.0), pad)
    na_p = jnp.pad(na_t, pad)
    nb = len(lead)
    grid = tuple(lead) + (tp // TILES_PER_BLOCK,)
    idx_in = lambda *g: g[:nb] + (g[nb], 0)
    idx_out = lambda *g: g[:nb] + (g[nb], 0, 0)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None,) * nb + (TILES_PER_BLOCK, _P), idx_in),
            pl.BlockSpec((None,) * nb + (TILES_PER_BLOCK, _P), idx_in),
        ],
        out_specs=pl.BlockSpec(
            (None,) * nb + (TILES_PER_BLOCK, N_THETA, N_RHO), idx_out
        ),
        out_shape=jax.ShapeDtypeStruct(
            lead + (tp, N_THETA, N_RHO), jnp.float32
        ),
        interpret=interpret,
    )(w_t, na_p)
    return out[..., :T, :, :]


@functools.lru_cache(maxsize=None)
def _make_vote_fn(mag_th: float, interpret: bool):
    @jax.custom_batching.custom_vmap
    def fn(m_t, na_t):
        return _vote(m_t, na_t, mag_th, interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, m_t, na_t):  # noqa: ANN001
        if not all(in_batched):
            m_t = jnp.broadcast_to(m_t, (axis_size,) + m_t.shape[-2:])
            na_t = jnp.broadcast_to(na_t, (axis_size,) + na_t.shape[-2:])
        return _vote(m_t, na_t, mag_th, interpret), True

    return fn


def hough_vote_pallas(
    m_t: jnp.ndarray,
    na_t: jnp.ndarray,
    mag_th: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-tile Hough accumulator (T, N_THETA, N_RHO) via one MXU pass.

    m_t, na_t: (T, TILE*TILE) gradient magnitude / normal angle, tiled in
    the `lines.to_tiles` row-major layout.
    """
    return _make_vote_fn(float(mag_th), bool(interpret))(m_t, na_t)
