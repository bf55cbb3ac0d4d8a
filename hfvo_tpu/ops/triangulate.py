"""Epipolar search + two-view triangulation of new map points.

TPU-native equivalent of `LocalMapping::CreateNewMapPoints` (reference:
src/LocalMapping.cc:335-660): the reference walks each unmatched keypoint of
the new keyframe, scans the neighbor keyframe's grid rows near the epipolar
line, and triangulates per match with a fresh cv::SVD. Here one jitted
program scores ALL candidate pairs at once — a masked Hamming popcount
matmul gated by the point-to-epipolar-line distance — and triangulates every
mutual-best pair as a batched 4x4 symmetric eigensolve (DLT normal
equations), so the whole neighbor runs as one device program with fixed
shapes.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import sym_eig

from ..geometry import camera as camera_ops
from ..geometry import se3
from . import hamming


class TriangulationResult(NamedTuple):
    X_a: jnp.ndarray  # (C, 3) new point in frame-A camera coords
    match_b: jnp.ndarray  # (C,) matched candidate index in B (-1 = none)
    ok: jnp.ndarray  # (C,) bool — triangulation accepted


def _skew(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.array(
        [[0.0, -t[2], t[1]], [t[2], 0.0, -t[0]], [-t[1], t[0], 0.0]],
        dtype=t.dtype,
    )


@partial(jax.jit, static_argnames=("intr", "max_hamming"))
def triangulate_pair(
    intr,
    uv_a: jnp.ndarray,  # (C, 2) keypoints of KF a (the new keyframe)
    desc_a: jnp.ndarray,  # (C, 8) uint32
    cand_a: jnp.ndarray,  # (C,) bool — unmatched, landmark-less keypoints
    oct_a: jnp.ndarray,  # (C,) int32
    uv_b: jnp.ndarray,  # (C, 2) keypoints of neighbor KF b
    desc_b: jnp.ndarray,
    cand_b: jnp.ndarray,
    oct_b: jnp.ndarray,
    T_ab: jnp.ndarray,  # (4, 4) a-camera <- b-camera
    scale_factor: float = 1.2,
    max_hamming: int = 50,
) -> TriangulationResult:
    """Match candidate keypoints of two keyframes along the epipolar
    geometry and triangulate (reference: ORBmatcher::SearchForTriangulation
    src/ORBmatcher.cc:668 + the acceptance checks of
    src/LocalMapping.cc:470-650: positive depth in both views, parallax,
    per-view chi2 reprojection gates, octave-scale consistency)."""
    R_ab, t_ab = T_ab[:3, :3], T_ab[:3, 3]
    K = jnp.array(
        [[intr.fx, 0.0, intr.cx], [0.0, intr.fy, intr.cy], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    Kinv = jnp.array(
        [
            [1.0 / intr.fx, 0.0, -intr.cx / intr.fx],
            [0.0, 1.0 / intr.fy, -intr.cy / intr.fy],
            [0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    # Fundamental matrix b->a: x_a^T F x_b = 0 with F = K^-T [t]x R K^-1.
    F = Kinv.T @ _skew(t_ab) @ R_ab @ Kinv

    ha = jnp.concatenate([uv_a, jnp.ones_like(uv_a[:, :1])], axis=1)  # (C,3)
    hb = jnp.concatenate([uv_b, jnp.ones_like(uv_b[:, :1])], axis=1)
    # Distance of each b-keypoint to the epipolar line of each a-keypoint.
    lines_b = ha @ F  # (C, 3): line in image b for every a-kp
    num = jnp.abs(lines_b @ hb.T)  # (Ca, Cb)
    den = jnp.sqrt(lines_b[:, 0] ** 2 + lines_b[:, 1] ** 2)[:, None] + 1e-9
    epi_dist = num / den
    sigma2_b = scale_factor ** (2.0 * oct_b.astype(jnp.float32))
    epi_ok = epi_dist * epi_dist < 3.84 * sigma2_b[None, :]

    mask = cand_a[:, None] & cand_b[None, :] & epi_ok
    D = hamming.hamming_matrix(desc_a, desc_b)
    b_of_a, mok = hamming.mutual_best(D, mask)
    best_d = jnp.take_along_axis(
        D, jnp.maximum(b_of_a, 0)[:, None], axis=1
    )[:, 0]
    matched = mok & (best_d <= max_hamming)
    jb = jnp.maximum(b_of_a, 0)

    # Normalized rays in each camera, both expressed in camera a.
    ray_a = (Kinv @ ha.T).T  # (C, 3)
    xb = (Kinv @ hb[jb].T).T  # (C, 3) in camera b
    ray_b_in_a = xb @ R_ab.T  # rotate only — direction for parallax
    cos_par = jnp.sum(ray_a * ray_b_in_a, axis=1) / (
        jnp.linalg.norm(ray_a, axis=1) * jnp.linalg.norm(ray_b_in_a, axis=1)
        + 1e-9
    )

    # DLT triangulation in frame a: rows from both projections. With
    # P_a = [I|0], P_b = [R_ba|t_ba] (b-cam <- a-cam).
    T_ba = jnp.linalg.inv(T_ab)
    R_ba, t_ba = T_ba[:3, :3], T_ba[:3, 3]
    Pa = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    Pb = jnp.concatenate([R_ba, t_ba[:, None]], axis=1)

    def dlt_rows(x, P):
        # x: (C, 3) normalized homogeneous, P: (3, 4)
        return jnp.stack(
            [
                x[:, 0:1] * P[2] - x[:, 2:3] * P[0],
                x[:, 1:2] * P[2] - x[:, 2:3] * P[1],
            ],
            axis=1,
        )  # (C, 2, 4)

    A = jnp.concatenate([dlt_rows(ray_a, Pa), dlt_rows(xb, Pb)], axis=1)
    AtA = jnp.einsum("cia,cib->cab", A, A)  # (C, 4, 4)
    _, V = sym_eig.eigh4(AtA)  # ascending eigenvalues
    Xh = V[:, :, 0]  # smallest eigenvector
    w = Xh[:, 3]
    X_a = Xh[:, :3] / jnp.where(jnp.abs(w) > 1e-9, w, 1.0)[:, None]
    X_b = X_a @ R_ba.T + t_ba

    # Acceptance gates (reference: src/LocalMapping.cc:545-650).
    za, zb = X_a[:, 2], X_b[:, 2]
    pr_a = camera_ops.project(intr, X_a)
    pr_b = camera_ops.project(intr, X_b)
    sigma2_a = scale_factor ** (2.0 * oct_a.astype(jnp.float32))
    err_a = jnp.sum((pr_a - uv_a) ** 2, axis=1)
    err_b = jnp.sum((pr_b - uv_b[jb]) ** 2, axis=1)
    reproj_ok = (err_a < 5.991 * sigma2_a) & (
        err_b < 5.991 * sigma2_b[jb]
    )
    # Scale consistency: distance ratio must agree with the octave ratio
    # within a factor (reference ratioFactor = 1.5 * scaleFactor).
    dist_a = jnp.linalg.norm(X_a, axis=1)
    dist_b = jnp.linalg.norm(X_b, axis=1)
    ratio_dist = dist_b / jnp.maximum(dist_a, 1e-9)
    ratio_oct = scale_factor ** (oct_a - oct_b[jb]).astype(jnp.float32)
    rf = 1.5 * scale_factor
    scale_ok = (ratio_dist < ratio_oct * rf) & (ratio_dist * rf > ratio_oct)

    ok = (
        matched
        & (jnp.abs(w) > 1e-9)
        & (cos_par < 0.9998)
        & (cos_par > 0.0)
        & (za > 0.05)
        & (zb > 0.05)
        & reproj_ok
        & scale_ok
        & jnp.isfinite(X_a).all(axis=1)
    )
    return TriangulationResult(X_a, jnp.where(ok, b_of_a, -1), ok)


class LineTriangulationResult(NamedTuple):
    X0_a: jnp.ndarray  # (C, 3) endpoint 0 in frame-A camera coords
    X1_a: jnp.ndarray  # (C, 3)
    match_b: jnp.ndarray  # (C,) matched segment index in B (-1 = none)
    ok: jnp.ndarray  # (C,) bool


@partial(jax.jit, static_argnames=("intr", "max_desc_dist", "max_angle"))
def triangulate_lines_pair(
    intr,
    p0_a: jnp.ndarray,  # (C, 2) segment endpoints of KF a (new keyframe)
    p1_a: jnp.ndarray,
    desc_a: jnp.ndarray,  # (C, D) float band descriptors
    cand_a: jnp.ndarray,  # (C,) landmark-less detected segments
    p0_b: jnp.ndarray,  # (C, 2) segments of neighbor KF b
    p1_b: jnp.ndarray,
    desc_b: jnp.ndarray,
    cand_b: jnp.ndarray,
    T_ab: jnp.ndarray,  # (4, 4) a-camera <- b-camera
    p0_c: jnp.ndarray,  # (C, 2) third-view segments for verification
    p1_c: jnp.ndarray,
    seg_c: jnp.ndarray,  # (C,) third view has a detected segment
    T_ca: jnp.ndarray,  # (4, 4) c-camera <- a-camera
    max_desc_dist: float = 0.45,
    max_angle: float = 0.15,
) -> LineTriangulationResult:
    """Two-view line triangulation with third-view consistency.

    TPU-native equivalent of `LocalMapping::CreateNewMapLinesConstraint`
    (reference: src/LocalMapping.cc:1064-1203 — LSDmatcher::
    SearchForTriangulation across >= 2 neighbor keyframes, per-match
    plane-plane intersection, 3-view agreement). One batched program:
    descriptor matching under a rotation-warp angle gate, every matched
    pair's 3D line as the intersection of the two back-projected planes
    (each 2D segment + camera center spans a plane; endpoints come from
    intersecting KF a's endpoint rays with KF b's plane), then acceptance
    only when a third keyframe sees a collinear segment."""
    Kinv = jnp.array(
        [
            [1.0 / intr.fx, 0.0, -intr.cx / intr.fx],
            [0.0, 1.0 / intr.fy, -intr.cy / intr.fy],
            [0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )

    def rays(p):
        h = jnp.concatenate([p, jnp.ones_like(p[:, :1])], axis=1)
        return h @ Kinv.T  # (C, 3) unit-z rays

    r0a, r1a = rays(p0_a), rays(p1_a)
    r0b, r1b = rays(p0_b), rays(p1_b)
    # Back-projected plane normal per segment (through the camera center).
    n_a = jnp.cross(r0a, r1a)
    n_a = n_a / (jnp.linalg.norm(n_a, axis=-1, keepdims=True) + 1e-12)
    n_b = jnp.cross(r0b, r1b)
    n_b = n_b / (jnp.linalg.norm(n_b, axis=-1, keepdims=True) + 1e-12)

    # Descriptor matching with a rotation-warped direction gate: segment
    # direction in b, rotated into a, must agree with the direction in a
    # (reference gates SearchForTriangulation by warped geometry,
    # src/LSDmatcher.cpp:1155-1290).
    from .lines import line_distance_matrix

    R_ab, t_ab = T_ab[:3, :3], T_ab[:3, 3]
    d_a = r1a - r0a  # image-plane direction proxies (z = 0 component small)
    d_b_in_a = (r1b - r0b) @ R_ab.T
    ua = d_a / (jnp.linalg.norm(d_a, axis=-1, keepdims=True) + 1e-9)
    ub = d_b_in_a / (jnp.linalg.norm(d_b_in_a, axis=-1, keepdims=True) + 1e-9)
    cosd = jnp.abs(ua @ ub.T)  # (Ca, Cb)
    ang_ok = cosd > jnp.cos(max_angle)
    mask = cand_a[:, None] & cand_b[None, :] & ang_ok
    D = line_distance_matrix(desc_a, desc_b)
    Di = jnp.clip((D * 1000).astype(jnp.int32), 0, 2000)
    b_of_a, best_d, _ = hamming.masked_best2(Di, mask, invalid=10_000)
    matched = (b_of_a >= 0) & (best_d <= int(max_desc_dist * 1000))
    jb = jnp.maximum(b_of_a, 0)

    # Plane of b's matched segment expressed in a's frame: normal
    # m = R_ab n_b, passing through the b-camera center t_ab:
    # m . (X - t_ab) = 0. Endpoint depths: X = s r with m.(s r - t_ab)=0.
    m = n_b[jb] @ R_ab.T  # (C, 3)
    md = jnp.sum(m * t_ab[None, :], axis=-1)  # (C,)
    s0 = md / (jnp.sum(m * r0a, axis=-1) + 1e-12)
    s1 = md / (jnp.sum(m * r1a, axis=-1) + 1e-12)
    X0 = s0[:, None] * r0a
    X1 = s1[:, None] * r1a

    # Degenerate when the two planes are near-parallel (no parallax): gate
    # on the angle between plane normals (reference uses the epipolar
    # parallax test, src/LocalMapping.cc:1130-1160).
    m_all = n_b @ R_ab.T
    sin_pl = jnp.linalg.norm(jnp.cross(n_a, m_all[jb]), axis=-1)
    length = jnp.linalg.norm(X1 - X0, axis=-1)
    ok = (
        matched
        & (sin_pl > 0.02)
        & (s0 > 0.2) & (s1 > 0.2) & (s0 < 12.0) & (s1 < 12.0)
        & (length > 0.05) & (length < 10.0)
        & jnp.isfinite(X0).all(axis=1) & jnp.isfinite(X1).all(axis=1)
    )

    # Third-view consistency: project the candidate into KF c; some
    # detected segment there must be collinear (small perpendicular
    # distance of both projected endpoints to its infinite line, aligned
    # direction) (reference: 3-view check, src/LocalMapping.cc:1105-1203).
    X0c = se3.transform(T_ca, X0)
    X1c = se3.transform(T_ca, X1)
    q0 = camera_ops.project(intr, X0c)
    q1 = camera_ops.project(intr, X1c)
    front_c = (X0c[:, 2] > 0.1) & (X1c[:, 2] > 0.1)
    dc = p1_c - p0_c
    lc = jnp.linalg.norm(dc, axis=-1) + 1e-9
    uc = dc / lc[:, None]
    nc = jnp.stack([-uc[:, 1], uc[:, 0]], axis=1)  # (Cc, 2)
    off = jnp.sum(nc * p0_c, axis=-1)  # (Cc,)
    dist0 = jnp.abs(q0 @ nc.T - off[None, :])  # (Ca, Cc)
    dist1 = jnp.abs(q1 @ nc.T - off[None, :])
    dq = q1 - q0
    uq = dq / (jnp.linalg.norm(dq, axis=-1, keepdims=True) + 1e-9)
    cos_c = jnp.abs(uq @ uc.T)
    support = (
        seg_c[None, :]
        & (dist0 < 3.0) & (dist1 < 3.0)
        & (cos_c > jnp.cos(max_angle))
    )
    third_ok = front_c & jnp.any(support, axis=1)
    ok = ok & third_ok
    return LineTriangulationResult(X0, X1, jnp.where(ok, b_of_a, -1), ok)


@partial(jax.jit, static_argnames=("intr", "max_hamming", "scale_factor"))
def triangulate_multi(
    intr,
    uv_a: jnp.ndarray,
    desc_a: jnp.ndarray,
    cand_a: jnp.ndarray,
    oct_a: jnp.ndarray,
    uv_b: jnp.ndarray,  # (Nn, C, 2) stacked neighbor keyframes
    desc_b: jnp.ndarray,  # (Nn, C, 8)
    cand_b: jnp.ndarray,  # (Nn, C) — all-False rows are padding neighbors
    oct_b: jnp.ndarray,  # (Nn, C)
    T_ab: jnp.ndarray,  # (Nn, 4, 4)
    scale_factor: float = 1.2,
    max_hamming: int = 50,
) -> TriangulationResult:
    """All neighbor keyframes in ONE device program (the per-neighbor loop
    of the reference, src/LocalMapping.cc:390, costs a dispatch + result
    round trip each over RTT-bound transports). Results are stacked (Nn, C);
    the host registers matches in neighbor order."""
    fn = jax.vmap(
        lambda ub, db, cb, ob, T: triangulate_pair(
            intr, uv_a, desc_a, cand_a, oct_a, ub, db, cb, ob, T,
            scale_factor=scale_factor, max_hamming=max_hamming,
        )
    )
    return fn(uv_b, desc_b, cand_b, oct_b, T_ab)
