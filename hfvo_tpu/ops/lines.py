"""Line segment detection + band descriptors, batched for TPU.

Replaces the reference's vendored LSD detector + binary LBD descriptor
(reference: Thirdparty/line_descriptor/src/binary_descriptor_custom.cpp,
src/LineExtractor.cpp). LSD's region-growing is inherently sequential, so
detection is reformulated (SURVEY.md §7 "hard parts") as a **tiled
gradient-weighted Hough transform**:

1. Sobel gradients; pixels vote in their tile's (theta, rho) accumulator,
   weighted by magnitude and gated to the 2 orientation bins consistent
   with their own gradient normal (a batched analog of LSD's level-line
   alignment test).
2. Top-k accumulator peaks per tile -> candidate infinite lines.
3. Endpoint extraction: aligned pixels within a perpendicular distance gate
   are projected onto the line; the segment spans the supported extent, with
   support/length gates.
4. Collinear merging across tiles replicates `Frame::cullingLine` semantics
   (reference: src/Frame.cc:952-1115): angle + perpendicular distance +
   endpoint-gap gates, iterated to fixpoint, longest segment wins.

Descriptors are a float band-gradient signature (mean/std of aligned and
perpendicular gradient over bands parallel to the segment), an LBD-style
statistic (reference computes the same band statistics then binarizes);
matching uses cosine distance on the MXU instead of Hamming. Deviation
documented; both frames use the same descriptor so matching is
self-consistent.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .image import sobel_gradients

TILE = 64
N_THETA = 36
N_RHO = 48  # rho resolution over the tile diagonal
DESC_BANDS = 9
DESC_SAMPLES = 16


class LineFeatures(NamedTuple):
    """Fixed-capacity per-frame line segments (level-0 pixel coords)."""

    p0: jnp.ndarray  # (M, 2) endpoint (x, y)
    p1: jnp.ndarray  # (M, 2)
    angle: jnp.ndarray  # (M,) direction angle in [-pi/2, pi/2)
    response: jnp.ndarray  # (M,) support strength
    desc: jnp.ndarray  # (M, D) float32, L2-normalized
    valid: jnp.ndarray  # (M,)

    @property
    def length(self) -> jnp.ndarray:
        return jnp.linalg.norm(self.p1 - self.p0, axis=-1)

    @property
    def line2d(self) -> jnp.ndarray:
        """Normalized infinite-line coefficients (a, b, c): a*u + b*v + c = 0."""
        d = self.p1 - self.p0
        n = jnp.stack([-d[:, 1], d[:, 0]], axis=1)
        n = n / (jnp.linalg.norm(n, axis=1, keepdims=True) + 1e-9)
        c = -jnp.sum(n * self.p0, axis=1)
        return jnp.concatenate([n, c[:, None]], axis=1)


def _tile_hough(gray: jnp.ndarray, mag_th: float):
    """Per-tile Hough accumulation. Returns (acc (T, N_THETA, N_RHO),
    tile origins (T, 2), gx, gy, mag)."""
    H, W = gray.shape
    gx, gy = sobel_gradients(gray)
    mag = jnp.sqrt(gx * gx + gy * gy)
    # Line-normal angle of each pixel = gradient direction (mod pi).
    normal_ang = jnp.arctan2(gy, gx) % jnp.pi  # [0, pi)

    ty, tx = H // TILE, W // TILE
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    def to_tiles(a):
        return (
            a[: ty * TILE, : tx * TILE]
            .reshape(ty, TILE, tx, TILE)
            .transpose(0, 2, 1, 3)
            .reshape(ty * tx, TILE * TILE)
        )

    m_t = to_tiles(mag)
    na_t = to_tiles(normal_ang)
    x_t = to_tiles(xx)
    y_t = to_tiles(yy)
    ox = (jax.lax.broadcasted_iota(jnp.float32, (ty, tx), 1) * TILE).reshape(-1)
    oy = (jax.lax.broadcasted_iota(jnp.float32, (ty, tx), 0) * TILE).reshape(-1)
    xl = x_t - ox[:, None]
    yl = y_t - oy[:, None]

    # theta = line-normal angle bins.
    theta_bin = jnp.clip((na_t / jnp.pi * N_THETA).astype(jnp.int32), 0, N_THETA - 1)
    thetas = (jnp.arange(N_THETA) + 0.5) / N_THETA * jnp.pi
    diag = TILE * np.sqrt(2.0)
    # rho = x cos(theta) + y sin(theta), in [-TILE, diag] -> bin over [-diag, diag]
    w = jnp.where(m_t > mag_th, m_t, 0.0)

    # DENSE voting: scatter-add histograms serialize on TPU (~0.12 us per
    # conflicting element — the 3x287k-vote scatter cost ~9 ms/frame).
    # Instead, for each accumulator theta row, build the rho histogram as a
    # masked comparison-reduction over the tile pixels: the (px, N_RHO)
    # one-hot fuses into the sum, so everything stays on the vector units.
    # A pixel votes into its own theta bin (weight 1) and the two
    # neighboring rows (weight 0.5, orientation tolerance), with rho
    # computed against the TARGET row's theta — identical semantics to the
    # original scatter formulation.
    rho_iota = jnp.arange(N_RHO, dtype=jnp.int32)

    def vote_row(_, t):
        th = (t.astype(jnp.float32) + 0.5) / N_THETA * jnp.pi
        rho = xl * jnp.cos(th) + yl * jnp.sin(th)
        rb = jnp.clip(
            ((rho / diag + 1.0) * 0.5 * N_RHO).astype(jnp.int32), 0, N_RHO - 1
        )
        wt = w * (
            (theta_bin == t).astype(jnp.float32)
            + 0.5 * (theta_bin == (t - 1) % N_THETA).astype(jnp.float32)
            + 0.5 * (theta_bin == (t + 1) % N_THETA).astype(jnp.float32)
        )
        onehot = (rb[:, :, None] == rho_iota).astype(jnp.float32)
        return None, jnp.einsum("tp,tpb->tb", wt, onehot)

    if jax.default_backend() == "tpu":
        # MXU one-hot-matmul vote (ops/pallas_hough.py): the 36-row scan
        # serializes (~0.7 ms/frame and no vmap amortization); the kernel
        # runs the identical vote as per-tile bf16 one-hot matmuls
        # entirely in VMEM (~1e-2 relative on accumulator values — below
        # the magnitude spread that ranks peaks).
        from .pallas_hough import hough_vote_pallas

        acc = hough_vote_pallas(m_t, na_t, mag_th)
    else:
        # lax.scan over theta rows: traces the row computation ONCE (an
        # unrolled 36-way loop bloats the fused program's HLO and compile).
        _, rows = jax.lax.scan(vote_row, None, jnp.arange(N_THETA))
        acc = rows.transpose(1, 0, 2)  # (T, N_THETA, N_RHO)
    origins = jnp.stack([ox, oy], axis=1)
    return acc, origins, gx, gy, mag, normal_ang


@partial(jax.jit, static_argnames=("peaks_per_tile", "capacity", "mag_th", "min_support", "min_length"))
def detect_lines(
    gray: jnp.ndarray,
    peaks_per_tile: int = 4,
    capacity: int = 256,
    mag_th: float = 12.0,
    min_support: float = 20.0,
    min_length: float = 20.0,
) -> LineFeatures:
    """Detect line segments -> fixed-capacity LineFeatures."""
    H, W = gray.shape
    acc, origins, gx, gy, mag, normal_ang = _tile_hough(gray, mag_th)
    T = acc.shape[0]
    flat = acc.reshape(T, -1)
    top_v, top_i = jax.lax.top_k(flat, peaks_per_tile)  # (T, P)
    tb = top_i // N_RHO
    rb = top_i % N_RHO
    diag = TILE * np.sqrt(2.0)
    theta = (tb.astype(jnp.float32) + 0.5) / N_THETA * jnp.pi  # line normal
    rho = (rb.astype(jnp.float32) / N_RHO * 2.0 - 1.0) * diag + diag / N_RHO

    # For each candidate (tile t, peak p): gather the tile's pixels and find
    # the supported extent along the line.
    ty, tx = H // TILE, W // TILE
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    def to_tiles(a):
        return (
            a[: ty * TILE, : tx * TILE]
            .reshape(ty, TILE, tx, TILE)
            .transpose(0, 2, 1, 3)
            .reshape(ty * tx, TILE * TILE)
        )

    m_t = to_tiles(mag)
    na_t = to_tiles(normal_ang)
    xl = to_tiles(xx) - origins[:, 0:1]
    yl = to_tiles(yy) - origins[:, 1:2]

    def extract(xs, ys, ms, nas, theta_c, rho_c):
        ct, st = jnp.cos(theta_c), jnp.sin(theta_c)
        d_perp = xs * ct + ys * st - rho_c
        ang_diff = jnp.abs(((nas - theta_c) + jnp.pi / 2) % jnp.pi - jnp.pi / 2)
        # Gate width covers the Hough rho quantization (diag/N_RHO ~ 1.9 px
        # half-bin); the PCA refit below recovers sub-pixel placement.
        support = (jnp.abs(d_perp) < 2.5) & (ang_diff < jnp.pi / N_THETA * 1.5) & (ms > mag_th)
        w = jnp.where(support, ms, 0.0)
        sw = jnp.sum(w) + 1e-9
        cx = jnp.sum(w * xs) / sw
        cy = jnp.sum(w * ys) / sw
        dxs = xs - cx
        dys = ys - cy
        cxx = jnp.sum(w * dxs * dxs) / sw
        cyy = jnp.sum(w * dys * dys) / sw
        cxy = jnp.sum(w * dxs * dys) / sw
        # Principal direction of the weighted support (2x2 closed form).
        phi = 0.5 * jnp.arctan2(2 * cxy, cxx - cyy)
        ux, uy = jnp.cos(phi), jnp.sin(phi)
        along = dxs * ux + dys * uy
        big = 1e9
        a_min = jnp.min(jnp.where(support, along, big))
        a_max = jnp.max(jnp.where(support, along, -big))
        strength = sw
        n_sup = jnp.sum(support.astype(jnp.float32))
        ok = (n_sup >= min_support) & (a_max - a_min >= min_length)
        p0 = jnp.stack([cx + a_min * ux, cy + a_min * uy])
        p1 = jnp.stack([cx + a_max * ux, cy + a_max * uy])
        return p0, p1, strength, ok

    # Double vmap (tiles x peaks): every peak of tile t reduces over tile
    # t's own pixel block — no cross-tile row gather (TPU gathers serialize).
    per_tile = jax.vmap(  # over tiles
        jax.vmap(extract, in_axes=(None, None, None, None, 0, 0)),
        in_axes=(0, 0, 0, 0, 0, 0),
    )
    p0, p1, strength, ok = per_tile(xl, yl, m_t, na_t, theta, rho)
    p0 = (p0 + origins[:, None, :]).reshape(-1, 2)
    p1 = (p1 + origins[:, None, :]).reshape(-1, 2)
    strength = strength.reshape(-1)
    ok = ok.reshape(-1)

    # Pad/trim to capacity by strength.
    n_cand = p0.shape[0]
    score = jnp.where(ok, strength, -1.0)
    k = min(capacity, n_cand)
    top_s, sel = jax.lax.top_k(score, k)
    p0 = p0[sel]
    p1 = p1[sel]
    valid = top_s > 0
    if k < capacity:
        p0 = jnp.pad(p0, ((0, capacity - k), (0, 0)))
        p1 = jnp.pad(p1, ((0, capacity - k), (0, 0)))
        top_s = jnp.pad(top_s, (0, capacity - k))
        valid = jnp.pad(valid, (0, capacity - k))

    p0, p1, valid = merge_collinear(p0, p1, jnp.where(valid, top_s, 0.0), valid)
    # Canonical orientation: flip endpoints so the mean perpendicular
    # gradient is positive — the two edges of a dark stripe then get
    # opposite directions and distinct band descriptors (the LBD reference
    # orders bands by the gradient-defined line direction the same way).
    #
    # The flip needs NO extra image sampling: under an endpoint swap the
    # band sample POINTS are identical (ts and band offsets are symmetric),
    # so the flipped descriptor is an exact permutation of the unflipped
    # one — bands reversed, (par+, par-) and (perp+, perp-) swapped — and
    # the flip decision is the sign of the center band's mean perpendicular
    # gradient (perp+ minus perp- means; positive normalization preserves
    # the sign). The previous formulation resampled the midline bilinearly
    # just for this sign: 8 serialized 4096-row gathers, ~0.33 ms/frame on
    # TPU, and the only behavioral difference is the sign choice at
    # |gperp| ~ 0 where orientation is ambiguous anyway.
    desc_raw = band_descriptors(gray, gx, gy, p0, p1)
    M = p0.shape[0]
    db = desc_raw.reshape(M, DESC_BANDS, 4)
    gperp_mean = db[:, DESC_BANDS // 2, 2] - db[:, DESC_BANDS // 2, 3]
    flip = gperp_mean < 0
    desc_flipped = db[:, ::-1, :][:, :, jnp.array([1, 0, 3, 2])].reshape(M, -1)
    desc = jnp.where(flip[:, None], desc_flipped, desc_raw)
    p0_c = jnp.where(flip[:, None], p1, p0)
    p1_c = jnp.where(flip[:, None], p0, p1)
    d = p1_c - p0_c
    angle = jnp.arctan2(d[:, 1], d[:, 0])  # full [-pi, pi): direction-aware
    return LineFeatures(p0_c, p1_c, angle, jnp.where(valid, top_s, 0.0), desc, valid)


def merge_collinear(
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    strength: jnp.ndarray,
    valid: jnp.ndarray,
    ang_th: float = 0.05,
    dist_th: float = 2.5,
    gap_th: float = 12.0,
    n_iters: int = 3,
):
    """Merge collinear/overlapping segments (reference: Frame::cullingLine,
    src/Frame.cc:952: pairs within angle/dist/gap gates merge; iterated).

    Batched reformulation: each iteration computes the pairwise merge gate
    matrix; a segment absorbed by a *stronger* collinear partner extends the
    stronger one and is invalidated.
    """
    M = p0.shape[0]

    def one_iter(carry, _):
        p0, p1, strength, valid = carry
        d = p1 - p0
        length = jnp.linalg.norm(d, axis=1) + 1e-9
        u = d / length[:, None]
        mid = 0.5 * (p0 + p1)
        # Pairwise gates.
        cosang = jnp.abs(u @ u.T)
        ang_ok = cosang > jnp.cos(ang_th)
        # Perp distance of j's midpoint to line i.
        n_i = jnp.stack([-u[:, 1], u[:, 0]], axis=1)
        dperp = jnp.abs(jnp.einsum("id,jd->ij", n_i, mid) - jnp.sum(n_i * p0, axis=1)[:, None])
        dist_ok = dperp < dist_th
        # Along-line gap between segments (projections onto i's direction).
        t0 = jnp.einsum("id,jd->ij", u, p0) - jnp.sum(u * p0, axis=1)[:, None]
        t1 = jnp.einsum("id,jd->ij", u, p1) - jnp.sum(u * p0, axis=1)[:, None]
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        gap = jnp.maximum(lo - length[:, None], -hi)  # >0 -> separated
        gap_ok = gap < gap_th
        both = valid[:, None] & valid[None, :]
        mergeable = ang_ok & dist_ok & gap_ok & both & ~jnp.eye(M, dtype=bool)
        # Strict strength order (ties by index) to rank partners.
        idx = jnp.arange(M)
        stronger = mergeable & (
            (strength[:, None] > strength[None, :])
            | ((strength[:, None] == strength[None, :]) & (idx[:, None] < idx[None, :]))
        )
        # Only chain-top segments (no stronger mergeable partner themselves)
        # may absorb this iteration — otherwise an absorber can die in the
        # same pass and its inherited extent is lost.
        is_top = ~jnp.any(stronger, axis=0)
        can_absorb = stronger & is_top[:, None]
        # j is absorbed by its strongest eligible partner.
        absorber = jnp.argmax(
            jnp.where(can_absorb, strength[:, None], -jnp.inf), axis=0
        )
        absorbed = jnp.any(can_absorb, axis=0)
        absorb = can_absorb & (absorber[None, :] == idx[:, None])
        # Extend absorbers: new extent = min/max of own + absorbed projections.
        ext_lo = jnp.min(jnp.where(absorb, lo, 0.0), axis=1)
        ext_hi = jnp.max(jnp.where(absorb, hi, length[:, None] * jnp.ones((M, M))), axis=1)
        ext_lo = jnp.minimum(ext_lo, 0.0)
        ext_hi = jnp.maximum(ext_hi, length)
        new_p0 = p0 + u * ext_lo[:, None]
        new_p1 = p0 + u * ext_hi[:, None]
        gains = jnp.zeros((M,)).at[absorber].add(jnp.where(absorbed, strength, 0.0))
        strength = strength + gains
        valid = valid & ~absorbed
        return (new_p0, new_p1, strength, valid), None

    (p0, p1, strength, valid), _ = jax.lax.scan(
        one_iter, (p0, p1, strength, valid), None, length=n_iters
    )
    return p0, p1, valid


def band_descriptors(
    gray: jnp.ndarray,
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    p0: jnp.ndarray,
    p1: jnp.ndarray,
) -> jnp.ndarray:
    """LBD-style band gradient statistics -> (M, 4 * DESC_BANDS) float32.

    Bands are DESC_BANDS strips parallel to the segment (perpendicular
    offsets -4..4 px x DESC_SAMPLES points along it); per band we store the
    mean of (g_parallel+, g_parallel-, g_perp+, g_perp-) like LBD's
    directional sums (reference: binary_descriptor_custom.cpp band layout).
    L2-normalized for cosine matching.
    """
    M = p0.shape[0]
    d = p1 - p0
    length = jnp.linalg.norm(d, axis=1, keepdims=True) + 1e-9
    u = d / length  # along
    n = jnp.stack([-u[:, 1], u[:, 0]], axis=1)  # perpendicular

    ts = (jnp.arange(DESC_SAMPLES) + 0.5) / DESC_SAMPLES  # (S,)
    offs = jnp.arange(DESC_BANDS) - (DESC_BANDS - 1) / 2.0  # (B,)
    # Sample points: (M, B, S, 2)
    base = p0[:, None, None, :] + d[:, None, None, :] * ts[None, None, :, None]
    pts = base + n[:, None, None, :] * offs[None, :, None, None]
    xy = pts.reshape(-1, 2)
    h, w = gray.shape
    # Nearest-pixel sampling (the vendored LBD also reads integer pixel
    # rows per band, binary_descriptor_custom.cpp). Bilinear here costs 4
    # gathers per gradient image (~34 ms per batch-8 step, the second
    # hottest op group in the fused program) for sub-half-pixel smoothing
    # a band *mean* then averages away; one gather from the (H, W, 2)
    # stacked gradients reads both channels per point.
    xr = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, w - 1)
    yr = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, h - 1)
    g2 = jnp.stack([gx, gy], axis=-1)  # (H, W, 2)
    samples = g2[yr, xr]  # (M*B*S, 2) — one gather, two channels
    gxs = samples[:, 0].reshape(M, DESC_BANDS, DESC_SAMPLES)
    gys = samples[:, 1].reshape(M, DESC_BANDS, DESC_SAMPLES)
    g_par = gxs * u[:, 0, None, None] + gys * u[:, 1, None, None]
    g_perp = gxs * n[:, 0, None, None] + gys * n[:, 1, None, None]
    feats = jnp.stack(
        [
            jnp.mean(jnp.maximum(g_par, 0.0), axis=2),
            jnp.mean(jnp.maximum(-g_par, 0.0), axis=2),
            jnp.mean(jnp.maximum(g_perp, 0.0), axis=2),
            jnp.mean(jnp.maximum(-g_perp, 0.0), axis=2),
        ],
        axis=2,
    )  # (M, B, 4)
    desc = feats.reshape(M, DESC_BANDS * 4)
    return desc / (jnp.linalg.norm(desc, axis=1, keepdims=True) + 1e-9)


def line_distance_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """Cosine distance in [0, 2] between band descriptors (MXU matmul)."""
    return 1.0 - jnp.dot(desc_a, desc_b.T, preferred_element_type=jnp.float32)


# Static pair list for LBD-style binarization: all ordered (i, j), i < j,
# of the 36 band statistics in lexicographic order; the first 256 become
# bits. The reference binarizes its float LBD the same way — pairwise
# comparisons of descriptor elements (Thirdparty/line_descriptor/src/
# binary_descriptor_custom.cpp::computeBinary, bit = d[i] > d[j]).
_BIN_PAIRS = np.asarray(
    [(i, j) for i in range(4 * DESC_BANDS) for j in range(i + 1, 4 * DESC_BANDS)][:256],
    np.int32,
)


def binarize_band_desc(desc: jnp.ndarray) -> jnp.ndarray:
    """Float band descriptor (M, 4*DESC_BANDS) -> 256-bit binarized LBD
    (M, 8) uint32, bit-packed in ops/hamming.unpack_bits order (bit k of
    word w = global bit w*32 + k). Match with hamming.hamming_matrix."""
    pa = desc[:, _BIN_PAIRS[:, 0]]
    pb = desc[:, _BIN_PAIRS[:, 1]]
    bits = (pa > pb).astype(jnp.uint32)  # (M, 256)
    shifts = jnp.asarray(np.arange(32, dtype=np.uint32))
    words = jnp.sum(
        bits.reshape(desc.shape[0], 8, 32) << shifts[None, None, :], axis=-1
    )
    return words.astype(jnp.uint32)
