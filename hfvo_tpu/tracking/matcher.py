"""Projection-window descriptor matching — the dense-array ORBmatcher.

Replaces the reference's grid-bucketed candidate search + per-feature loops
(reference: src/ORBmatcher.cc:45 `SearchByProjection` vs local map, :1353
frame-to-frame variant) with one masked (L x N) Hamming matrix per search:
window mask x octave-consistency mask x descriptor distance, argmin per
landmark, then conflict resolution so each keypoint keeps only its best
landmark. The (L, N) matrix rides the MXU via the bipolar matmul in
ops/hamming.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import camera, se3
from ..geometry.camera import Intrinsics
from ..ops import hamming

INF_KEY = jnp.int32(2**30)


class ProjMatchResult(NamedTuple):
    pt_id_per_kp: jnp.ndarray  # (N,) int32 landmark row per keypoint (-1 none)
    n_matches: jnp.ndarray  # scalar int32
    visible: jnp.ndarray  # (L,) bool landmark projected into the image


@partial(jax.jit, static_argnames=("radius", "max_hamming", "check_octave"))
def search_by_projection(
    map_X: jnp.ndarray,  # (L, 3) world points
    map_desc: jnp.ndarray,  # (L, 8)
    map_valid: jnp.ndarray,  # (L,)
    map_ids: jnp.ndarray,  # (L,) ids to report back (pass arange for local rows)
    map_octave: jnp.ndarray,  # (L,)
    kp_uv: jnp.ndarray,  # (N, 2)
    kp_desc: jnp.ndarray,  # (N, 8)
    kp_octave: jnp.ndarray,  # (N,)
    kp_valid: jnp.ndarray,  # (N,)
    T_cw: jnp.ndarray,
    intr: Intrinsics,
    radius: float = 15.0,
    max_hamming: int = 80,
    check_octave: bool = True,
    map_angle: jnp.ndarray | None = None,  # (L,) creation-keypoint IC angle
    kp_angle: jnp.ndarray | None = None,  # (N,)
    map_normal: jnp.ndarray | None = None,  # (L, 3) mean viewing direction
    view_cos_limit: float = 0.5,
) -> ProjMatchResult:
    """Match projected landmarks to frame keypoints in a search window.

    The window radius scales with the keypoint octave like the reference
    (r * scaleFactor^octave, src/ORBmatcher.cc:87-94). When angles are
    given, matches must agree with the dominant in-plane rotation: the
    30-bin angle-difference histogram keeps only the 3 fullest bins
    (reference: mbCheckOrientation + ComputeThreeMaxima,
    src/ORBmatcher.cc:37-39,1632 — invariant to the global roll between the
    creating keyframe and the current frame, which shifts all differences
    by the same amount).
    """
    L = map_X.shape[0]
    N = kp_uv.shape[0]
    X_c = se3.transform(T_cw, map_X)
    z = X_c[:, 2]
    proj = camera.project(intr, X_c)
    visible = (
        map_valid
        & (z > 0.1)
        & camera.in_image(intr, proj, margin=1.0)
    )
    if map_normal is not None:
        # Viewing-direction gate (reference: Frame::isInFrustum rejects
        # viewCos < viewingCosLimit = 0.5, src/Frame.cc:1371-1427). Points
        # without an accumulated normal (zero vector) pass ungated.
        O_w = -T_cw[:3, :3].T @ T_cw[:3, 3]
        view = map_X - O_w
        view = view / (jnp.linalg.norm(view, axis=1, keepdims=True) + 1e-9)
        cos_v = jnp.sum(view * map_normal, axis=1)
        has_n = jnp.sum(map_normal * map_normal, axis=1) > 0.25
        visible &= (~has_n) | (cos_v > view_cos_limit)

    # Window + octave gating.
    r_per_kp = radius * 1.2 ** kp_octave.astype(jnp.float32)  # (N,)
    du = jnp.abs(proj[:, 0:1] - kp_uv[None, :, 0])  # (L, N)
    dv = jnp.abs(proj[:, 1:2] - kp_uv[None, :, 1])
    window = (du <= r_per_kp[None, :]) & (dv <= r_per_kp[None, :])
    mask = visible[:, None] & kp_valid[None, :] & window
    if check_octave:
        d_oct = jnp.abs(map_octave[:, None] - kp_octave[None, :])
        mask &= d_oct <= 1

    # Float dist: the (256 - dot)/2 epilogue fuses into the reductions
    # below instead of materializing an int32 (L, N) copy (ops/hamming).
    dist = hamming.hamming_matrix_f(map_desc, kp_desc)  # (L, N) f32
    best_kp, best_d, second_d = hamming.masked_best2(dist, mask)
    matched = best_d <= max_hamming

    # Conflict resolution: each keypoint keeps the landmark with smallest
    # (distance, slot) key. All reductions, no scatter/gather: TPU scatters
    # serialize per update (the .at[best_kp].min + two index gathers cost
    # ~1.1 ms/step on the batch-8 tracker); the (N, L) masked min-reduces
    # below are fused VPU sweeps. key = d * L + slot stays an exact integer
    # in f32 (max 257 * 8192 + 8192 < 2^24).
    slots = jnp.arange(L, dtype=jnp.float32)
    key = jnp.where(matched, best_d.astype(jnp.float32) * L + slots,
                    jnp.float32(INF_KEY))
    eq = best_kp[None, :] == jnp.arange(N, dtype=jnp.int32)[:, None]  # (N, L)
    kp_min_key = jnp.min(
        jnp.where(eq, key[None, :], jnp.float32(INF_KEY)), axis=1
    )  # (N,)
    # keep[l] <=> landmark l wins its keypoint's column (matched gate:
    # unmatched rows carry INF keys and must not "win" empty columns).
    keep = matched & jnp.any(
        eq & (key[None, :] == kp_min_key[:, None]), axis=0
    )

    if map_angle is not None and kp_angle is not None:
        # kp_angle[best_kp] as a masked reduce (an (L,)-row gather from the
        # (N,) table otherwise serializes).
        kp_ang_of_best = jnp.sum(
            jnp.where(eq, kp_angle[:, None], 0.0), axis=0
        )
        rot_ok = hamming.rotation_consistency_mask(
            kp_ang_of_best, map_angle, keep
        )
        keep = keep & rot_ok

    # Winner landmark per keypoint -> reported id (reduce + one N-row
    # gather from the L-table, which is small).
    kmin2 = jnp.min(
        jnp.where(eq & keep[None, :], key[None, :], jnp.float32(INF_KEY)),
        axis=1,
    )
    has = kmin2 < INF_KEY
    winner = (kmin2 - jnp.floor(kmin2 / L) * L).astype(jnp.int32)
    pt_per_kp = jnp.where(
        has, map_ids[jnp.minimum(winner, L - 1)].astype(jnp.int32), -1
    )
    n = jnp.sum((pt_per_kp >= 0).astype(jnp.int32))
    return ProjMatchResult(pt_per_kp, n, visible)


@partial(jax.jit, static_argnames=("radius", "max_desc_dist", "max_angle"))
def search_lines_by_projection(
    ml_X0: jnp.ndarray,  # (L, 3) map line endpoints (world)
    ml_X1: jnp.ndarray,
    ml_desc: jnp.ndarray,  # (L, D) float band descriptors
    ml_valid: jnp.ndarray,  # (L,)
    ln_p0: jnp.ndarray,  # (M, 2) detected segments
    ln_p1: jnp.ndarray,
    ln_desc: jnp.ndarray,  # (M, D)
    ln_valid: jnp.ndarray,
    T_cw: jnp.ndarray,
    intr: Intrinsics,
    radius: float = 30.0,
    max_desc_dist: float = 0.5,
    max_angle: float = 0.2,
) -> ProjMatchResult:
    """Match projected map lines to detected segments.

    Replaces `LSDmatcher::SearchByProjection` vs map lines
    (reference: src/LSDmatcher.cpp:709): project both 3D endpoints, gate by
    midpoint distance + *directional* angle (segments are canonically
    oriented by gradient polarity) + band-descriptor cosine distance, then
    resolve conflicts per detected segment.
    """
    from ..ops.lines import line_distance_matrix

    L = ml_X0.shape[0]
    M = ln_p0.shape[0]
    Q0c = se3.transform(T_cw, ml_X0)
    Q1c = se3.transform(T_cw, ml_X1)
    q0 = camera.project(intr, Q0c)
    q1 = camera.project(intr, Q1c)
    # No in-image endpoint requirement: a long map line can cross the view
    # with both endpoints projecting outside the frame (full-wall stripes do
    # this constantly); the perpendicular-distance + overlap gates below
    # carry the geometric validity.
    vis = ml_valid & (Q0c[:, 2] > 0.1) & (Q1c[:, 2] > 0.1)
    dir_m = q1 - q0
    len_m = jnp.linalg.norm(dir_m, axis=-1) + 1e-9
    u_m = dir_m / len_m[:, None]
    ang_m = jnp.arctan2(dir_m[:, 1], dir_m[:, 0])

    mid_f = 0.5 * (ln_p0 + ln_p1)  # (M, 2)
    dir_f = ln_p1 - ln_p0
    ang_f = jnp.arctan2(dir_f[:, 1], dir_f[:, 0])

    # Gates robust to partial detections (a half-detected segment's midpoint
    # can be far from the projected map-line midpoint): perpendicular
    # distance of the detected midpoint to the projected infinite line, plus
    # along-line overlap with margin, plus directional angle.
    n_m = jnp.stack([-u_m[:, 1], u_m[:, 0]], axis=1)  # (L, 2)
    rel = mid_f[None, :, :] - q0[:, None, :]  # (L, M, 2)
    d_perp = jnp.abs(jnp.einsum("lmc,lc->lm", rel, n_m))
    t_along = jnp.einsum("lmc,lc->lm", rel, u_m)
    margin = 40.0
    overlap = (t_along > -margin) & (t_along < len_m[:, None] + margin)
    da = jnp.abs(((ang_m[:, None] - ang_f[None, :]) + jnp.pi) % (2 * jnp.pi) - jnp.pi)
    mask = (
        vis[:, None] & ln_valid[None, :]
        & (d_perp < radius) & overlap & (da < max_angle)
    )

    D = line_distance_matrix(ml_desc, ln_desc)  # (L, M) in [0, 2]
    Di = jnp.clip((D * 1000).astype(jnp.int32), 0, 2000)
    best_f, best_d, _ = hamming.masked_best2(Di, mask, invalid=10_000)
    matched = best_d <= int(max_desc_dist * 1000)

    key = jnp.where(matched, best_d * L + jnp.arange(L), INF_KEY)
    f_min_key = jnp.full((M,), INF_KEY).at[best_f].min(key)
    keep = matched & (key == f_min_key[best_f])

    per_f = jnp.full((M,), -1, jnp.int32)
    per_f = per_f.at[jnp.where(keep, best_f, M)].set(
        jnp.where(keep, jnp.arange(L, dtype=jnp.int32), -1), mode="drop"
    )
    n = jnp.sum((per_f >= 0).astype(jnp.int32))
    return ProjMatchResult(per_f, n, vis)


@partial(jax.jit, static_argnames=("max_desc_dist", "max_mid_dist", "max_angle"))
def search_lines_f2f(
    w0: jnp.ndarray,  # (P, 2) previous segments' endpoints, rotation-warped
    w1: jnp.ndarray,  # into the current view (K R_cl K^-1)
    prev_desc: jnp.ndarray,  # (P, D)
    prev_valid: jnp.ndarray,  # (P,)
    ln_p0: jnp.ndarray,  # (C, 2) current detections
    ln_p1: jnp.ndarray,
    ln_desc: jnp.ndarray,  # (C, D)
    ln_valid: jnp.ndarray,
    max_desc_dist: float = 0.5,
    max_mid_dist: float = 40.0,
    max_angle: float = 0.2,
) -> ProjMatchResult:
    """Frame-to-frame line matching by descriptor + warped geometry
    (reference: LSDmatcher::SearchByGeomNApearance, src/LSDmatcher.cpp:36-156
    — called from TrackWithMotionModel so the previous frame's map-line
    matches can be inherited). Mutual best under midpoint-distance, angle
    and band-descriptor gates. Returns the previous-segment index per
    current segment (-1 = none)."""
    from ..ops.lines import line_distance_matrix

    P = w0.shape[0]
    C = ln_p0.shape[0]
    mid_p = 0.5 * (w0 + w1)
    dir_p = w1 - w0
    ang_p = jnp.arctan2(dir_p[:, 1], dir_p[:, 0])
    mid_c = 0.5 * (ln_p0 + ln_p1)
    dir_c = ln_p1 - ln_p0
    ang_c = jnp.arctan2(dir_c[:, 1], dir_c[:, 0])
    dmid = jnp.linalg.norm(mid_p[:, None, :] - mid_c[None, :, :], axis=-1)
    da = jnp.abs(((ang_p[:, None] - ang_c[None, :]) + jnp.pi) % (2 * jnp.pi) - jnp.pi)
    mask = (
        prev_valid[:, None] & ln_valid[None, :]
        & (dmid < max_mid_dist) & (da < max_angle)
    )
    D = line_distance_matrix(prev_desc, ln_desc)  # (P, C)
    Di = jnp.clip((D * 1000).astype(jnp.int32), 0, 2000)
    best_c, best_d, _ = hamming.masked_best2(Di, mask, invalid=10_000)
    ok_p = best_d <= int(max_desc_dist * 1000)
    # Mutual: the chosen current segment's best previous segment must agree.
    best_p = jnp.argmin(jnp.where(mask, Di, 10_000), axis=0)
    ok_p &= best_p[best_c] == jnp.arange(P)
    per_c = jnp.full((C,), -1, jnp.int32)
    per_c = per_c.at[jnp.where(ok_p, best_c, C)].set(
        jnp.where(ok_p, jnp.arange(P, dtype=jnp.int32), -1), mode="drop"
    )
    n = jnp.sum((per_c >= 0).astype(jnp.int32))
    return ProjMatchResult(per_c, n, prev_valid)


class PlaneMatchResult(NamedTuple):
    map_idx: jnp.ndarray  # (P,) matched/constraint map-plane row (-1 none)
    kind: jnp.ndarray  # (P,) 0 full, 1 parallel, 2 vertical, -1 none
    n_matches: jnp.ndarray  # scalar int32 (full associations only)


@partial(jax.jit, static_argnames=("ang_ref", "dis_ref", "vert_sin", "par_cos"))
def match_planes(
    mp_pi_w: jnp.ndarray,  # (Q, 4) map planes (world)
    mp_valid: jnp.ndarray,  # (Q,)
    obs_pi: jnp.ndarray,  # (P, 4) observed planes (camera frame)
    obs_centroid: jnp.ndarray,  # (P, 3) camera frame
    obs_valid: jnp.ndarray,  # (P,)
    T_cw: jnp.ndarray,
    ang_ref: float = 0.2618,  # ~15 deg (Plane.AssociationAngRef)
    dis_ref: float = 0.15,  # Plane.AssociationDisRef
    vert_sin: float = 0.0872,  # ~5 deg around perpendicular
    par_cos: float = 0.9962,  # ~5 deg around parallel
) -> PlaneMatchResult:
    """Associate observed planes to map planes + tag parallel/vertical
    constraint pairs (reference: PlaneMatcher::SearchMapByCoefficients,
    src/PlaneMatcher.cpp:10-70)."""
    R = T_cw[:3, :3]
    t = T_cw[:3, 3]
    n_pred = mp_pi_w[:, :3] @ R.T  # (Q, 3) in camera frame
    d_pred = mp_pi_w[:, 3] - n_pred @ t

    dot = obs_pi[:, :3] @ n_pred.T  # (P, Q)
    # Point-to-plane: observed centroid against predicted map plane.
    dist = jnp.abs(obs_centroid @ n_pred.T + d_pred[None, :])  # (P, Q)
    both = obs_valid[:, None] & mp_valid[None, :]

    full_ok = both & (dot > jnp.cos(ang_ref)) & (dist < dis_ref)
    score_full = jnp.where(full_ok, dot, -2.0)
    best_full = jnp.argmax(score_full, axis=1)
    has_full = jnp.max(score_full, axis=1) > -1.0

    adot = jnp.abs(dot)
    par_ok = both & (adot > par_cos)
    score_par = jnp.where(par_ok, adot, -2.0)
    best_par = jnp.argmax(score_par, axis=1)
    has_par = jnp.max(score_par, axis=1) > -1.0

    vert_ok = both & (adot < vert_sin)
    score_vert = jnp.where(vert_ok, -adot, -2.0)
    best_vert = jnp.argmax(score_vert, axis=1)
    has_vert = jnp.max(score_vert, axis=1) > -1.0

    kind = jnp.where(
        has_full, 0, jnp.where(has_par, 1, jnp.where(has_vert, 2, -1))
    ).astype(jnp.int32)
    map_idx = jnp.where(
        has_full, best_full, jnp.where(has_par, best_par, jnp.where(has_vert, best_vert, -1))
    ).astype(jnp.int32)
    n = jnp.sum(has_full.astype(jnp.int32))
    return PlaneMatchResult(map_idx, kind, n)


@partial(jax.jit, static_argnames=("max_hamming", "ratio"))
def match_descriptors_mutual(
    desc_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    max_hamming: int = 64,
    ratio: float = 0.9,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unconstrained mutual-best descriptor matching with Lowe ratio.

    (reference: src/ORBmatcher.cc:412 `SearchForInitialization`-style.)
    Returns (idx_b per a (Na,), ok (Na,)).
    """
    D = hamming.hamming_matrix(desc_a, desc_b)
    mask = valid_a[:, None] & valid_b[None, :]
    idx_b, best, second = hamming.masked_best2(D, mask)
    ok = (best <= max_hamming) & (best.astype(jnp.float32) <= ratio * second.astype(jnp.float32))
    best_a = jnp.argmin(jnp.where(mask, D, hamming.MAX_DIST + 1), axis=0)
    ok &= best_a[idx_b] == jnp.arange(desc_a.shape[0])
    return idx_b, ok
