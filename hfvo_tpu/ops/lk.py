"""Pyramidal Lucas-Kanade optical flow, batched over track points.

Replaces `cv::calcOpticalFlowPyrLK` as used by the reference's
Manhattan-seeded line recovery (reference: LSDmatcher::optical_flow_line,
src/LSDmatcher.cpp:158-520: sample points on an unmatched line, warp them by
`K R_cl K^-1` as the initial guess, run pyramidal LK, refit the line).

Each tracked point iterates the classic LK update on a fixed window at each
pyramid level, coarse to fine; everything is vmapped so thousands of points
solve their 2x2 systems in parallel on the VPU.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .image import build_pyramid, bilinear_sample, sobel_gradients

WIN = 7  # window half-size -> (2*WIN+1)^2 patch


def _lk_level(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    gx0: jnp.ndarray,
    gy0: jnp.ndarray,
    p0: jnp.ndarray,  # (N, 2) source points at this level
    p1: jnp.ndarray,  # (N, 2) current estimates at this level
    n_iters: int,
) -> jnp.ndarray:
    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-WIN, WIN + 1, dtype=jnp.float32),
            jnp.arange(-WIN, WIN + 1, dtype=jnp.float32),
            indexing="xy",
        ),
        axis=-1,
    ).reshape(-1, 2)  # (W2, 2)

    def track_one(q0, q1):
        pts0 = q0[None, :] + offs  # (W2, 2)
        I0 = bilinear_sample(img0, pts0)
        Ix = bilinear_sample(gx0, pts0)
        Iy = bilinear_sample(gy0, pts0)
        G = jnp.array(
            [[jnp.sum(Ix * Ix), jnp.sum(Ix * Iy)],
             [jnp.sum(Ix * Iy), jnp.sum(Iy * Iy)]]
        ) + 1e-4 * jnp.eye(2)
        G_inv = jnp.linalg.inv(G)

        def body(_, q):
            I1 = bilinear_sample(img1, q[None, :] + offs)
            dI = I1 - I0
            b = jnp.array([jnp.sum(dI * Ix), jnp.sum(dI * Iy)])
            return q - G_inv @ b

        return jax.lax.fori_loop(0, n_iters, body, q1)

    return jax.vmap(track_one)(p0, p1)


@partial(jax.jit, static_argnames=("n_levels", "n_iters"))
def pyr_lk(
    img0: jnp.ndarray,  # (H, W) float32 source frame
    img1: jnp.ndarray,  # (H, W) target frame
    p0: jnp.ndarray,  # (N, 2) points in img0
    p1_init: jnp.ndarray,  # (N, 2) initial guesses in img1 (e.g. rotation-warped)
    n_levels: int = 3,
    n_iters: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Track p0 from img0 into img1. Returns (p1 (N, 2), ok (N,)).

    `ok` gates on in-bounds results and forward-match residual.
    """
    pyr0 = build_pyramid(img0, n_levels, 2.0)
    pyr1 = build_pyramid(img1, n_levels, 2.0)
    # NOTE: do NOT wrap the pyramids in jax.lax.optimization_barrier — a
    # barrier turns them into tuple elements, and TPU XLA lowers gathers
    # whose operand is a tuple-element to a serialized path (~75 ms per
    # 921k-element patch gather; measured 1.27 s for this op vs 0.2 ms
    # without the barrier).
    scale_top = 2.0 ** (n_levels - 1)
    cur = p1_init / scale_top
    for l in range(n_levels - 1, -1, -1):
        s = 2.0**l
        gx0, gy0 = sobel_gradients(pyr0[l])
        cur = _lk_level(pyr0[l], pyr1[l], gx0, gy0, p0 / s, cur, n_iters)
        if l > 0:
            cur = cur * 2.0
    p1 = cur
    h, w = img0.shape
    inb = (
        (p1[:, 0] >= WIN) & (p1[:, 0] < w - WIN)
        & (p1[:, 1] >= WIN) & (p1[:, 1] < h - WIN)
    )
    # Photometric check: mean abs diff over a small patch.
    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-2, 3, dtype=jnp.float32),
            jnp.arange(-2, 3, dtype=jnp.float32),
            indexing="xy",
        ),
        axis=-1,
    ).reshape(-1, 2)

    def photo_err(q0, q1):
        return jnp.mean(
            jnp.abs(
                bilinear_sample(img1, q1[None, :] + offs)
                - bilinear_sample(img0, q0[None, :] + offs)
            )
        )

    err = jax.vmap(photo_err)(p0, p1)
    ok = inb & (err < 12.0)
    return p1, ok


@partial(jax.jit, static_argnames=("intr", "n_samples"))
def warp_points_by_rotation(
    intr, uv: jnp.ndarray, R_10: jnp.ndarray, n_samples: int = 0
) -> jnp.ndarray:
    """Initial LK guesses by the infinite-homography warp `K R K^-1`
    (reference seeds LK with the Manhattan rotation, src/LSDmatcher.cpp:260)."""
    x = (uv[:, 0] - intr.cx) / intr.fx
    y = (uv[:, 1] - intr.cy) / intr.fy
    rays = jnp.stack([x, y, jnp.ones_like(x)], axis=1)
    r1 = rays @ R_10.T
    z = jnp.where(jnp.abs(r1[:, 2]) > 1e-6, r1[:, 2], 1e-6)
    return jnp.stack(
        [intr.fx * r1[:, 0] / z + intr.cx, intr.fy * r1[:, 1] / z + intr.cy],
        axis=1,
    )


def _avg_pool2(img: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape
    return img[: h // 2 * 2, : w // 2 * 2].reshape(h // 2, 2, w // 2, 2).mean(
        axis=(1, 3)
    )


@partial(jax.jit, static_argnames=("search", "box"))
def dense_flow_half(
    img0: jnp.ndarray,  # (H, W) float32 source frame
    img1: jnp.ndarray,  # (H, W) target frame
    search: int = 12,  # half-res px -> covers +-2*search full-res px
    box: int = 11,  # SAD aggregation window (half-res px)
):
    """Dense optical flow at half resolution via a shifted-SAD cost volume
    with softmin sub-pixel interpolation. Returns flow (H//2, W//2, 2) in
    FULL-resolution pixels (img0 -> img1).

    TPU-native formulation: scattered per-point patch gathers run on a
    serialized path on TPU (~0.12 us/element — a classical pyramidal LK
    costs >1 s/frame), while static-shift slices, cumsum box filters, and
    displacement-axis reductions are all dense vector ops (~ms). The cost
    volume is (2*search+1)^2 slices of |I0 - shift(I1)| box-filtered with a
    summed-area trick; flow is the softmin-weighted displacement, which
    interpolates sub-(half-)pixel without any argmin gather."""
    # The cost volume runs in bfloat16. This is NOT exact: _avg_pool2's
    # quarter-integer 2x2 means need 10 mantissa bits vs bf16's 8, so the
    # operands round by up to ~0.5 intensity near 255 before the |I0 - I1|
    # differences, and the box SUMS round further (~0.4% relative). What
    # justifies the cast is the MEASURED end-to-end bound: the softmin flow
    # moves by <= 0.3 px (mean 0.02) vs f32 — far below the 2.5 px line-fit
    # gate downstream — while the MXU runs the banded contractions at 2x
    # the f32 rate (measured 3.6 -> 1.7 ms for the full volume).
    a = _avg_pool2(img0).astype(jnp.bfloat16)
    b = _avg_pool2(img1).astype(jnp.bfloat16)
    h, w = a.shape
    pad = jnp.pad(b, search, mode="edge")
    k = box
    tau = 2.0 * float(k * k)
    dxs = jnp.arange(-search, search + 1, dtype=jnp.float32)

    # Separable box sums as banded-matrix matmuls: cumsum lowers to a
    # sequential scan on TPU, while the two (h,h)/(w,w) banded contractions
    # ride the MXU (~30 GMAC total for the full volume — sub-ms).
    r2 = k // 2
    iy = jnp.arange(h)
    Bh = (jnp.abs(iy[:, None] - iy[None, :]) <= r2).astype(jnp.bfloat16)
    ix = jnp.arange(w)
    Bw = (jnp.abs(ix[:, None] - ix[None, :]) <= r2).astype(jnp.bfloat16)

    def boxfilt(C):
        C = jnp.einsum(
            "hj,djw->dhw", Bh, C, preferred_element_type=jnp.float32
        )
        return jnp.einsum(
            "dhw,wx->dhx", C.astype(jnp.bfloat16), Bw,
            preferred_element_type=jnp.float32,
        )

    # Streaming softmin over the displacement axis, one dy-row of the cost
    # volume at a time: the full (2s+1)^2-slice volume never materializes
    # (4x less HBM traffic than volume + separate softmin passes), with the
    # standard running-max (here running-min) correction. lax.scan over dy
    # traces the band computation once (unrolling bloats the HLO).
    def dy_step(carry, dy):
        M, S0, Sx, Sy = carry
        band = jax.lax.dynamic_slice(
            pad, (search + dy, 0), (h, w + 2 * search)
        )
        C = jnp.stack(
            [
                jnp.abs(a - jax.lax.dynamic_slice(band, (0, search + dx), (h, w)))
                for dx in range(-search, search + 1)
            ]
        )
        C = boxfilt(C)
        m = jnp.min(C, axis=0)
        M_new = jnp.minimum(M, m)
        scale = jnp.exp((M_new - M) / tau)  # <= 1, rescales old sums
        Wt = jnp.exp(-(C - M_new[None]) / tau)
        S0 = S0 * scale + jnp.sum(Wt, axis=0)
        Sx = Sx * scale + jnp.einsum("dhw,d->hw", Wt, dxs)
        Sy = Sy * scale + jnp.sum(Wt, axis=0) * dy.astype(jnp.float32)
        return (M_new, S0, Sx, Sy), None

    init = (
        jnp.full((h, w), 1e30), jnp.zeros((h, w)),
        jnp.zeros((h, w)), jnp.zeros((h, w)),
    )
    (M, S0, Sx, Sy), _ = jax.lax.scan(
        dy_step, init, jnp.arange(-search, search + 1)
    )
    fx = Sx / (S0 + 1e-12)
    fy = Sy / (S0 + 1e-12)
    flow = jnp.stack([fx, fy], axis=-1) * 2.0  # half-res disp -> full px
    # Match confidence proxy: best aggregated SAD per pixel (normalized).
    conf = M / float(k * k)
    return flow, conf


@partial(jax.jit, static_argnames=("intr", "n_pts"))
def recover_lines_by_flow(
    intr,
    img0: jnp.ndarray,  # (H, W) previous frame
    img1: jnp.ndarray,  # (H, W) current frame
    p0_seg: jnp.ndarray,  # (NL, 2) segment endpoints in img0
    p1_seg: jnp.ndarray,  # (NL, 2)
    seg_valid: jnp.ndarray,  # (NL,) bool — which segments to track
    R_10: jnp.ndarray,  # (3, 3) rotation prior (cam1 <- cam0)
    n_pts: int = 16,
):
    """Batched line recovery by dense flow (reference: per-line
    cv::calcOpticalFlowPyrLK in LSDmatcher::optical_flow_line,
    src/LSDmatcher.cpp:158-520). Sample points along each unmatched
    segment, displace them by the dense half-res flow field (see
    `dense_flow_half` — the TPU-native replacement for scattered patch
    LK), and refit a 2D line by weighted PCA. The +-2*search px range
    absorbs the inter-frame rotation the reference handles with its
    K R K^-1 warp seed; larger motions fail the fit/verification gates.

    Returns (q0 (NL, 2), q1 (NL, 2), ok (NL,)).
    """
    NL = p0_seg.shape[0]
    ts = (jnp.arange(n_pts, dtype=jnp.float32) + 0.5) / n_pts
    pts = (
        p0_seg[:, None, :]
        + (p1_seg - p0_seg)[:, None, :] * ts[None, :, None]
    )  # (NL, P, 2)
    flat = pts.reshape(-1, 2)
    flow, conf = dense_flow_half(img0, img1)
    half_xy = flat / 2.0
    fx = bilinear_sample(flow[:, :, 0], half_xy)
    fy = bilinear_sample(flow[:, :, 1], half_xy)
    cf = bilinear_sample(conf, half_xy)
    tracked = flat + jnp.stack([fx, fy], axis=1)
    h, w = img0.shape
    inb = (
        (tracked[:, 0] >= 2.0) & (tracked[:, 0] < w - 2.0)
        & (tracked[:, 1] >= 2.0) & (tracked[:, 1] < h - 2.0)
    )
    # Photometric agreement at the matched location (single-sample; the
    # line-fit residual + the tracker's projection-vs-map verification are
    # the load-bearing gates).
    i0 = bilinear_sample(img0, flat)
    i1 = bilinear_sample(img1, tracked)
    ok_pt = inb & (jnp.abs(i0 - i1) < 24.0) & (cf < 20.0)
    tracked = tracked.reshape(NL, n_pts, 2)
    ok_pt = ok_pt.reshape(NL, n_pts) & seg_valid[:, None]
    # Weighted PCA line refit per segment (vectorized; same math as the
    # scalar recover_line_by_flow below).
    w = ok_pt.astype(jnp.float32)
    sw = jnp.sum(w, axis=1) + 1e-9  # (NL,)
    c = jnp.sum(tracked * w[:, :, None], axis=1) / sw[:, None]  # (NL, 2)
    d = tracked - c[:, None, :]
    cxx = jnp.sum(w * d[..., 0] * d[..., 0], axis=1) / sw
    cyy = jnp.sum(w * d[..., 1] * d[..., 1], axis=1) / sw
    cxy = jnp.sum(w * d[..., 0] * d[..., 1], axis=1) / sw
    phi = 0.5 * jnp.arctan2(2 * cxy, cxx - cyy)
    u = jnp.stack([jnp.cos(phi), jnp.sin(phi)], axis=1)  # (NL, 2)
    along = jnp.sum(d * u[:, None, :], axis=-1)  # (NL, P)
    a_min = jnp.min(jnp.where(ok_pt, along, 1e9), axis=1)
    a_max = jnp.max(jnp.where(ok_pt, along, -1e9), axis=1)
    perp = jnp.abs(jnp.sum(d * jnp.stack([-u[:, 1], u[:, 0]], 1)[:, None, :], -1))
    # Fit gate mirrors the reference's point-line distance tiers
    # (src/LSDmatcher.cpp:420-470).
    good_fit = jnp.sum((perp < 2.5) & ok_pt, axis=1) >= max(n_pts // 2, 5)
    ok = seg_valid & good_fit & (a_max > a_min)
    q0 = c + u * a_min[:, None]
    q1 = c + u * a_max[:, None]
    return q0, q1, ok


@partial(jax.jit, static_argnames=("intr", "n_pts"))
def recover_line_by_flow(
    intr,
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    p0_seg: jnp.ndarray,  # (2,) line endpoint A in img0
    p1_seg: jnp.ndarray,  # (2,) endpoint B
    R_10: jnp.ndarray,  # (3, 3) rotation prior (cam1 <- cam0)
    n_pts: int = 16,
):
    """Track a line segment into the next frame via rotation-seeded LK and
    refit (reference: optical_flow_line's sample -> warp -> LK -> line refit,
    src/LSDmatcher.cpp:158-520). Returns (q0 (2,), q1 (2,), ok ())."""
    ts = (jnp.arange(n_pts, dtype=jnp.float32) + 0.5) / n_pts
    pts = p0_seg[None, :] + (p1_seg - p0_seg)[None, :] * ts[:, None]
    guess = warp_points_by_rotation(intr, pts, R_10)
    tracked, ok = pyr_lk(img0, img1, pts, guess)
    w = ok.astype(jnp.float32)
    sw = jnp.sum(w) + 1e-9
    c = jnp.sum(tracked * w[:, None], axis=0) / sw
    d = tracked - c
    cxx = jnp.sum(w * d[:, 0] * d[:, 0]) / sw
    cyy = jnp.sum(w * d[:, 1] * d[:, 1]) / sw
    cxy = jnp.sum(w * d[:, 0] * d[:, 1]) / sw
    phi = 0.5 * jnp.arctan2(2 * cxy, cxx - cyy)
    u = jnp.array([jnp.cos(phi), jnp.sin(phi)])
    along = d @ u
    a_min = jnp.min(jnp.where(ok, along, 1e9))
    a_max = jnp.max(jnp.where(ok, along, -1e9))
    # Line fit residual gate (reference gates on point-line distance 0.1 px
    # ... 2.5 px tiers, src/LSDmatcher.cpp:420-470).
    perp = jnp.abs(d @ jnp.array([-u[1], u[0]]))
    good_fit = jnp.sum((perp < 2.5) & ok) >= jnp.maximum(n_pts // 2, 5)
    return c + u * a_min, c + u * a_max, good_fit & (a_max > a_min)
