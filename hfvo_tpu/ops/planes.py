"""Plane segmentation from organized depth — PEAC-equivalent, batched.

Replaces the reference's agglomerative-hierarchical-clustering plane fitter
(reference: include/peac/AHCPlaneFitter.hpp `run()`, AHCPlaneSeg.hpp,
DisjointSet.hpp; wrapped by src/PlaneExtractor.cpp): PEAC's sequential
min-heap merging + disjoint sets become

1. block-wise plane fits (16x16 px): centroid/covariance + smallest
   eigenvector per block, batched 3x3 eigensolves — PEAC's node init;
2. fixed-iteration label propagation: each block adopts the minimum label
   among 4-neighbors whose normals agree and whose planes are mutually
   consistent — PEAC's merge phase without a disjoint-set forest
   (SURVEY.md §7 "iterate-to-fixpoint merging");
3. per-label weighted refit from the blocks' accumulated first/second
   moments (exact — moments are additive), top-k planes by support.

Outputs Hessian-normal planes in the camera frame with per-block labels.
The reference's voxel-downsampled per-plane clouds (src/Frame.cc:2104-2213)
are represented by the block centroids of each plane (bounded, regular).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import Intrinsics

from . import sym_eig

BLOCK = 16
N_PROP_ITERS = 12


class PlaneSegmentation(NamedTuple):
    planes: jnp.ndarray  # (Pmax, 4): unit normal (towards camera) + d; n.X + d = 0
    centroids: jnp.ndarray  # (Pmax, 3)
    counts: jnp.ndarray  # (Pmax,) supporting-block pixel counts
    valid: jnp.ndarray  # (Pmax,)
    block_label: jnp.ndarray  # (nby, nbx) int32 plane row per block (-1 none)
    block_centroid: jnp.ndarray  # (nby, nbx, 3) per-block centroids (cloud proxy)
    covs: jnp.ndarray  # (Pmax, 3, 3) point scatter about the centroid —
    # sufficient statistics for map-plane coefficient refits (the TPU
    # replacement for carrying the observation's point cloud around)


def depth_to_cloud(depth: jnp.ndarray, intr: Intrinsics) -> jnp.ndarray:
    h, w = depth.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    X = (xx - intr.cx) / intr.fx * depth
    Y = (yy - intr.cy) / intr.fy * depth
    return jnp.stack([X, Y, depth], axis=-1)


@partial(jax.jit, static_argnames=("intr", "max_planes", "mse_factor", "min_blocks"))
def segment_planes(
    depth: jnp.ndarray,
    intr: Intrinsics,
    max_planes: int = 32,
    mse_factor: float = 3.0,
    min_blocks: int = 6,
) -> PlaneSegmentation:
    h, w = depth.shape
    nby, nbx = h // BLOCK, w // BLOCK
    cloud = depth_to_cloud(depth, intr)
    valid_px = depth > 1e-3

    # Per-block first/second moments (additive -> exact merged refits).
    # Two-pass block moments: covariance about each block's OWN mean. The
    # one-pass E[XX^T] - mu mu^T form cancels catastrophically in float32
    # for far/grazing geometry (|X|^2 ~ 100 vs in-plane variances ~ 1e-3)
    # and tilts fitted normals by tenths of a degree.
    #
    # Block pooling rides SEPARABLE one-hot matmuls (pool_y @ map @ pool_x)
    # instead of axis reductions over the (nby, B, nbx, B) view: every
    # previous formulation drew a bad lowering on TPU — the einsum form a
    # grouped convolution + full block-tensor layout copies, the
    # blockify-transpose form the same copies, and plain multiply+reduce
    # chains batch-minor {0,2,1} Loop fusions under vmap (~1.9 ms/step
    # batch-8). Matmuls get natural layouts everywhere; the per-block mean
    # broadcast back to pixels is the transposed pair of the same one-hots.
    Hc, Wc = nby * BLOCK, nbx * BLOCK
    Vf = valid_px[:Hc, :Wc].astype(jnp.float32)
    pool_y = (
        (jnp.arange(Hc, dtype=jnp.int32)[None, :] // BLOCK)
        == jnp.arange(nby, dtype=jnp.int32)[:, None]
    ).astype(jnp.float32)  # (nby, Hc)
    pool_x = (
        (jnp.arange(Wc, dtype=jnp.int32)[:, None] // BLOCK)
        == jnp.arange(nbx, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)  # (Wc, nbx)

    def pool(m):  # (Hc, Wc) -> (nby, nbx)
        return pool_y @ m @ pool_x

    def bcast(b):  # (nby, nbx) -> (Hc, Wc), nearest-block
        return pool_y.T @ b @ pool_x.T

    comp = [cloud[:Hc, :Wc, k] for k in range(3)]  # 3 x (Hc, Wc)
    n_valid = pool(Vf)
    n_safe = jnp.maximum(n_valid, 1.0)
    mu_k = [pool(ck * Vf) / n_safe for ck in comp]
    cen = [ck - bcast(mk) for ck, mk in zip(comp, mu_k)]
    cov_rows = [
        [pool(cen[i] * cen[j] * Vf) / n_safe for j in range(3)]
        for i in range(3)
    ]
    mu_b = jnp.stack(mu_k, axis=-1)  # (nby, nbx, 3)
    cov_b = jnp.stack(
        [jnp.stack(r, axis=-1) for r in cov_rows], axis=-2
    )  # (nby, nbx, 3, 3)

    def plane_from_cov(mu, cov):
        evals, evecs = sym_eig.eigh3(cov + 1e-10 * jnp.eye(3))
        normal = evecs[..., 0]  # smallest eigenvalue direction
        # Orient towards the camera (n . viewdir < 0 with viewdir = mu).
        sign = jnp.where(jnp.sum(normal * mu, axis=-1, keepdims=True) > 0, -1.0, 1.0)
        normal = normal * sign
        d = -jnp.sum(normal * mu, axis=-1)
        mse = evals[..., 0]
        return normal, d, mse

    normal, d, mse = plane_from_cov(mu_b, cov_b)
    mu = mu_b
    # Block validity: enough depth + planar enough (depth-noise-scaled MSE,
    # PEAC's depth-dependent threshold; sigma_z ~ 0.0012 + 0.0019 (z-0.4)^2).
    sigma = 0.0012 + 0.0019 * (mu[..., 2] - 0.4) ** 2
    block_ok = (n_valid > 0.8 * BLOCK * BLOCK) & (mse < (mse_factor * sigma) ** 2)

    # Label propagation: labels = flat block ids; adopt min compatible
    # neighbor label, iterate.
    flat_ids = jnp.arange(nby * nbx, dtype=jnp.int32).reshape(nby, nbx)
    label = jnp.where(block_ok, flat_ids, nby * nbx)  # invalid -> sentinel

    def compatible(na, da, mua, nb, db, mub):
        ang = jnp.sum(na * nb, axis=-1) > 0.95  # ~18 deg
        # Mutual point-plane distance.
        d_ab = jnp.abs(jnp.sum(nb * mua, axis=-1) + db)
        d_ba = jnp.abs(jnp.sum(na * mub, axis=-1) + da)
        sig = 0.0012 + 0.0019 * (mua[..., 2] - 0.4) ** 2
        return ang & (d_ab < 6 * sig + 0.01) & (d_ba < 6 * sig + 0.01)

    def shift(a, dy, dx, fill):
        return jnp.roll(a, (dy, dx), axis=(0, 1)) if False else _shift(a, dy, dx, fill)

    def _shift(a, dy, dx, fill):
        out = jnp.full_like(a, fill)
        ys = slice(max(dy, 0), nby + min(dy, 0))
        yd = slice(max(-dy, 0), nby + min(-dy, 0))
        xs = slice(max(dx, 0), nbx + min(dx, 0))
        xd = slice(max(-dx, 0), nbx + min(-dx, 0))
        return out.at[yd, xd].set(a[ys, xs])

    neigh = [(0, 1), (0, -1), (1, 0), (-1, 0)]
    comp_masks = []
    for dy, dx in neigh:
        nn = _shift(normal, dy, dx, 0.0)
        nd = _shift(d, dy, dx, 1e9)
        nmu = _shift(mu, dy, dx, 0.0)
        nok = _shift(block_ok.astype(jnp.float32), dy, dx, 0.0) > 0.5
        comp_masks.append(block_ok & nok & compatible(normal, d, mu, nn, nd, nmu))

    sentinel = nby * nbx

    lut_ids = jnp.arange(nby * nbx + 1, dtype=jnp.int32)

    def prop_once(label, _):
        best = label
        for (dy, dx), cm in zip(neigh, comp_masks):
            nl = _shift(label, dy, dx, sentinel)
            best = jnp.where(cm, jnp.minimum(best, nl), best)
        # Pointer jumping: adopt the label of the block my label points to —
        # O(log n) convergence instead of O(grid diameter). The lookup runs
        # as a compare-reduce over the label table, NOT a gather: TPU
        # row-gathers serialize (~7 ns/row; 2 x 12 jumps cost 1.7 ms/step
        # on the batch-8 tracker), while the (nby, nbx, nlbl) one-hot
        # min-select is a fused VPU sweep that vmaps cleanly.
        for _ in range(2):
            flat = jnp.append(best.reshape(-1), sentinel)  # sentinel self-maps
            picked = jnp.min(
                jnp.where(best[..., None] == lut_ids, flat, sentinel),
                axis=-1,
            )
            best = jnp.minimum(best, picked)
        return best, None

    label, _ = jax.lax.scan(prop_once, label, None, length=N_PROP_ITERS)

    # Per-label refit: merge block moments via the parallel-axis theorem
    # (differences of nearby means stay small, so float32 is stable).
    flat_label = label.reshape(-1)
    nlbl = nby * nbx + 1
    w_blk = jnp.where(block_ok, n_valid, 0.0).reshape(-1)
    cnt = jnp.zeros((nlbl,)).at[flat_label].add(w_blk)
    cnt_safe = jnp.maximum(cnt, 1.0)
    Mup = (
        jnp.zeros((nlbl, 3)).at[flat_label].add(w_blk[:, None] * mu_b.reshape(-1, 3))
        / cnt_safe[:, None]
    )
    dmu = mu_b.reshape(-1, 3) - Mup[flat_label]
    S2c = jnp.zeros((nlbl, 3, 3)).at[flat_label].add(
        w_blk[:, None, None]
        * (cov_b.reshape(-1, 3, 3) + dmu[:, :, None] * dmu[:, None, :])
    )
    Cov_l = S2c / cnt_safe[:, None, None]
    Np, Dp, _ = plane_from_cov(Mup, Cov_l)
    nblocks = jnp.zeros((nlbl,)).at[flat_label].add(block_ok.reshape(-1).astype(jnp.float32))
    ok = (nblocks >= min_blocks) & (jnp.arange(nlbl) < nby * nbx)

    score = jnp.where(ok, cnt, -1.0)
    k = min(max_planes, nlbl)
    top_cnt, top_lbl = jax.lax.top_k(score, k)
    planes = jnp.concatenate([Np[top_lbl], Dp[top_lbl][:, None]], axis=1)
    centroids = Mup[top_lbl]
    covs = Cov_l[top_lbl]
    pvalid = top_cnt > 0
    if k < max_planes:
        planes = jnp.pad(planes, ((0, max_planes - k), (0, 0)))
        centroids = jnp.pad(centroids, ((0, max_planes - k), (0, 0)))
        covs = jnp.pad(covs, ((0, max_planes - k), (0, 0), (0, 0)))
        top_cnt = jnp.pad(top_cnt, (0, max_planes - k))
        pvalid = jnp.pad(pvalid, (0, max_planes - k))

    # Block -> plane-row map for masks/visualization.
    row_of_label = jnp.full((nlbl,), -1, jnp.int32).at[top_lbl].set(
        jnp.where(pvalid, jnp.arange(max_planes, dtype=jnp.int32)[:k] if k == max_planes else jnp.arange(k, dtype=jnp.int32), -1)
    )
    block_row = row_of_label[label]
    return PlaneSegmentation(
        planes, centroids, jnp.maximum(top_cnt, 0.0), pvalid, block_row, mu, covs
    )


def compute_normals(depth: jnp.ndarray, intr: Intrinsics, stride: int = 4):
    """Surface normals from smoothed cloud tangents, subsampled.

    Replaces the reference's PCL integral-image normals on a 1/3-subsampled
    cloud (reference: src/Frame.cc:2157-2210). Returns (normals (Ns, 3)
    camera-frame unit vectors pointing towards the camera, valid (Ns,)).
    """
    cloud = depth_to_cloud(depth, intr)
    # Central differences over a 'stride' baseline, subsampled.
    c = cloud[::stride, ::stride]
    v = (depth > 1e-3)[::stride, ::stride]
    du = jnp.zeros_like(c).at[:, 1:-1].set((c[:, 2:] - c[:, :-2]) * 0.5)
    dv = jnp.zeros_like(c).at[1:-1, :].set((c[2:, :] - c[:-2, :]) * 0.5)
    n = jnp.cross(du, dv)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.where(norm > 1e-9, norm, 1.0)
    # Orient towards camera.
    sign = jnp.where(jnp.sum(n * c, axis=-1, keepdims=True) > 0, -1.0, 1.0)
    n = n * sign
    ok = (
        v
        & (norm[..., 0] > 1e-9)
        & jnp.roll(v, 1, 0) & jnp.roll(v, -1, 0)
        & jnp.roll(v, 1, 1) & jnp.roll(v, -1, 1)
    )
    return n.reshape(-1, 3), ok.reshape(-1)
