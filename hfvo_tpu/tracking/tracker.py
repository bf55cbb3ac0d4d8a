"""Tracking state machine: the reference's front end, array-native.

Mirrors `Tracking::Track` (reference: src/Tracking.cc:619): initialization
from the first RGB-D frame (StereoInitialization, src/Tracking.cc:1350),
motion-model prediction, projection matching against the local map, two pose
optimizations, keyframe policy, and LOST handling. The map lives in flat
tables (vomap.map); the hot work (extraction, matching, LM) is jitted.

Round-1 scope: point features. Line/plane/Manhattan tracking layers on top
(same structure, extra edge tables into the same pose LM).
"""
from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..bow.database import KeyFrameDatabase
from ..bow.vocab import bow_histogram, bow_histogram_np, compute_words
from ..config import VOConfig
from ..geometry import camera as camera_ops
from ..geometry import se3
from ..mapping.local_mapping import LocalMapper
from ..solve.ransac import ransac_rigid_3d3d
from ..ops import lines as line_ops
from ..ops import lines3d as line3d_ops
from ..ops import lk as lk_ops
from ..ops import manhattan as manh_ops
from ..ops import planes as plane_ops
from ..ops import structural as struct_ops
from ..solve.lm import DirObs, LineObs, PlaneObs, PoseObs, pose_optimization
from ..utils import pack as pack_utils
from ..vomap.map import VOMap
from . import matcher
from .frontend import FrameFeatures, extract_frame, extract_frame_jit


class TrackState(enum.Enum):
    NOT_INITIALIZED = 0
    OK = 1
    LOST = 2


def _fused_track_step_impl(
    cfg: VOConfig,
    gray_u8: jnp.ndarray,  # (H, W) uint8 — compact host->device upload
    depth_mm: jnp.ndarray,  # (H, W) uint16 millimeters
    map_X: jnp.ndarray,  # (L, 3) local-map snapshot (device-resident)
    map_desc: jnp.ndarray,
    map_valid: jnp.ndarray,
    map_octave: jnp.ndarray,
    map_angle: jnp.ndarray,  # (L,) creation-keypoint IC angle
    map_normal: jnp.ndarray,  # (L, 3) mean viewing direction (0 = ungated)
    ml_X0: jnp.ndarray,  # (Ll, 3) map-line snapshot
    ml_X1: jnp.ndarray,
    ml_desc: jnp.ndarray,
    ml_valid: jnp.ndarray,
    mp_pi: jnp.ndarray,  # (Lp, 4) map-plane snapshot
    mp_valid: jnp.ndarray,
    R_wm: jnp.ndarray,  # (3, 3) world Manhattan rotation (columns = axes)
    manh_valid: jnp.ndarray,  # () bool — Manhattan frame initialized
    T_pred_a: jnp.ndarray,  # (4, 4) see below
    T_pred_b: jnp.ndarray,  # (4, 4)
    T_prev_cw: jnp.ndarray,  # (4, 4) previous frame's pose (device ok)
    lk_q0: jnp.ndarray,  # (Ml, 2) LK-recovered segment endpoints — computed
    lk_q1: jnp.ndarray,  # by the SEPARATE `lk_recover_program` dispatch (its
    lk_fit: jnp.ndarray,  # (Ml,) scattered-gather LK loops lower to a slow
    # serialized path when inlined into this program; standalone they run in
    # ~0.2 ms). Device arrays chain between the two dispatches with no sync.
    prev_p0: jnp.ndarray,  # (Ml, 2) previous frame's detected segments
    prev_p1: jnp.ndarray,
    prev_desc: jnp.ndarray,  # (Ml, D)
    prev_lvalid: jnp.ndarray,  # (Ml,)
    prev_row: jnp.ndarray,  # (Ml,) prev segment's map-line row in the
    # CURRENT snapshot (-1 = none) — host remaps global ids at dispatch
    static_mask: jnp.ndarray = None,  # (H, W) bool, True = usable region
    # (reference: the ./masks/mask.png feature mask, src/Tracking.cc:82-86);
    # device-resident, uploaded once at tracker construction
    radius: float = 15.0,
    check_octave: bool = True,
):
    """One device program for the whole per-frame hot path:
    point + line extraction -> projection matching -> hybrid pose LM. A
    single dispatch and a single host pull per frame (the reference spreads
    this over 4+ CPU threads and many locks; here XLA schedules it on-chip).

    The pose prediction is composed INSIDE the program as
    `T_pred = T_pred_a @ T_pred_b @ T_pred_a` so the pipelined tracker can
    chain a constant-velocity prediction on the still-in-flight previous
    pose without host syncs. Synchronous callers pass (T_pred,
    inv(T_pred)) — the identity A inv(A) A = A — and pipelined callers
    (T_prev, inv(T_prevprev)) — constant velocity. At pipeline depth > 2
    the prev-prev pose is itself still in flight; the caller inverts it
    with a chained one-op device jit (`_inv_pose_jit`), never with the
    last RESOLVED pose (P frames old), which would overshoot the
    prediction by (P-1) x velocity — a death spiral at P >= 4.
    """
    gray = gray_u8.astype(jnp.float32)
    depth = depth_mm.astype(jnp.float32) * 1e-3
    if depth.shape[0] != gray.shape[0]:
        # Subsampled depth upload (see TrackingConfig.depth_upload_stride):
        # nearest-upsample on device so all consumers keep full-res geometry.
        # One broadcast + reshape instead of two jnp.repeats: the chained
        # repeats materialize an intermediate in a transposed layout under
        # vmap (~0.3 ms/step batch-8).
        s = -(-gray.shape[0] // depth.shape[0])  # ceil: subsample rounds down
        dh, dw = depth.shape
        depth = jnp.broadcast_to(
            depth[:, None, :, None], (dh, s, dw, s)
        ).reshape(dh * s, dw * s)
        depth = depth[: gray.shape[0], : gray.shape[1]]
    T_pred = T_pred_a @ T_pred_b @ T_pred_a

    R_cm_ref = None
    axes_c_lm = None
    axes_w_lm = None
    w_axis = jnp.zeros((3,), jnp.float32)
    if cfg.use_manhattan:
        # Manhattan rotation prior (reference: TrackManhattanFrame before
        # motion-model tracking, src/Tracking.cc:706): mean-shift the
        # predicted R_cm against the frame's surface normals, and replace the
        # predicted rotation when the axes are well supported.
        normals, n_ok = plane_ops.compute_normals(depth, cfg.camera, stride=8)
        R_cm_pred = T_pred[:3, :3] @ R_wm
        R_cm_ref, sup = manh_ops.refine_axes(
            R_cm_pred, normals, n_ok.astype(jnp.float32),
            cone=cfg.manhattan.normal_cone,
            kernel=cfg.manhattan.meanshift_kernel,
        )
        enough = manh_valid & (jnp.sum((sup > 30).astype(jnp.int32)) >= 2)
        R_prior = R_cm_ref @ R_wm.T
        # The prior is a drift-correcting refinement of the prediction, not a
        # replacement: if the mean shift jumped to a different basin (wrong
        # axis lock), trust the motion model instead.
        cos_rel = 0.5 * (jnp.trace(R_prior @ T_pred[:3, :3].T) - 1.0)
        small_correction = cos_rel > jnp.cos(0.02)
        T_pred = jnp.where(
            enough & small_correction,
            T_pred.at[:3, :3].set(R_prior),
            T_pred,
        )
        # Per-axis rotation anchors for the pose LM: mean-shift measures
        # each Manhattan axis direction absolutely from the frame's normals,
        # so anchoring pins exactly the rotation DOF the scene actually
        # constrains (one wall normal alone kills the (t_x, r_y) valley).
        # Raw per-axis measurements (no joint orthonormalization) so a
        # weakly-supported axis can't corrupt a strong one; per-axis gates:
        # enough support, plausible correction (no basin jumps).
        A_meas, sup_m = manh_ops.measure_axes(
            R_cm_pred, normals, n_ok.astype(jnp.float32),
            cone=cfg.manhattan.normal_cone,
            kernel=cfg.manhattan.meanshift_kernel,
        )
        pred_dirs = R_cm_pred.T  # rows = predicted axis dirs, camera frame
        cos_ax = jnp.sum(A_meas * pred_dirs, axis=-1)
        ax_anchor_ok = (
            manh_valid
            & (sup_m >= cfg.manhattan.rot_prior_min_support)
            & (cos_ax > jnp.cos(cfg.manhattan.rot_prior_max_correction))
        )
        axes_c_lm = A_meas
        axes_w_lm = R_wm.T  # rows = Manhattan axes in world frame
        w_raw = cfg.manhattan.rot_prior_weight * sup_m.astype(jnp.float32)
        w_sat = w_raw / (1.0 + w_raw * cfg.manhattan.rot_prior_bias**2)
        w_axis = jnp.where(ax_anchor_ok, w_sat, 0.0)

    feats = extract_frame(gray, depth, cfg)
    if static_mask is not None and cfg.tracking.static_mask_path is not None:
        # Exclude features in masked (dynamic) regions, like the reference's
        # detector mask (src/Tracking.cc:82-86 + the mask arg to ORB detect).
        mu = jnp.clip(feats.uv[:, 0].astype(jnp.int32), 0, gray.shape[1] - 1)
        mv = jnp.clip(feats.uv[:, 1].astype(jnp.int32), 0, gray.shape[0] - 1)
        feats = feats._replace(valid=feats.valid & static_mask[mv, mu])
    # BoW word ids ride along in the fused program (reference computes BoW
    # on keyframe insertion, src/LocalMapping.cc:185; computing them here is
    # ~free on-device and saves the keyframe path a separate dispatch+pull
    # round trip over RTT-bound transports).
    words = compute_words(feats.desc)
    L = map_X.shape[0]
    res = matcher.search_by_projection(
        map_X, map_desc, map_valid,
        jnp.arange(L, dtype=jnp.int32), map_octave,
        feats.uv, feats.desc, feats.octave, feats.valid,
        T_pred, cfg.camera, radius=radius, check_octave=check_octave,
        map_angle=(
            map_angle if cfg.tracking.check_rotation_consistency else None
        ),
        kp_angle=(
            feats.angle if cfg.tracking.check_rotation_consistency else None
        ),
        map_normal=map_normal if cfg.tracking.check_view_cos else None,
        view_cos_limit=cfg.tracking.view_cos_limit,
    )
    pt_local = res.pt_id_per_kp  # (N,) row into snapshot or -1
    matched = pt_local >= 0
    X_w = map_X[jnp.maximum(pt_local, 0)]
    kp_Xc = camera_ops.unproject(
        cfg.camera, feats.uv, jnp.maximum(feats.depth, 1e-3)
    )
    pts = PoseObs(
        X_w=X_w,
        obs=feats.obs,
        is_stereo=feats.depth > 1e-3,
        inv_sigma2=feats.inv_sigma2,
        valid=matched & feats.valid,
        X_c_obs=kp_Xc if cfg.tracking.inv_sigma2_3d > 0 else None,
    )

    # Optional metric-3D path (cfg.tracking.inv_sigma2_3d > 0; default off):
    # a 3D-3D RANSAC over the matched pairs picks the majority alignment,
    # seeds the LM with it, and restricts the metric 3D edges to the
    # consensus inliers (slid matches on repetitive stripe lattices have
    # near-zero image residual but lattice-sized 3D error, and would drag
    # the Huber rounds along the stripe direction). This rescues
    # points-only tracking in planar views, but in the full hybrid it
    # anchors the pose to map points created during drift and blocks the
    # line/plane-driven recovery — hence opt-in, with the Manhattan
    # rotation prior as the default valley fix.
    T_lm0 = T_pred
    if pts.X_c_obs is not None:
        r3 = ransac_rigid_3d3d(
            X_w, kp_Xc, pts.valid & (feats.depth > 1e-3), jnp.uint32(7),
            inlier_th=0.05, min_inliers=25,
        )
        T_consensus = se3.inv(r3.T_ab)
        T_lm0 = jnp.where(
            r3.ok & jnp.all(jnp.isfinite(T_consensus)), T_consensus, T_pred
        )
        pts = pts._replace(
            valid_3d=(feats.depth > 1e-3) & jnp.where(r3.ok, r3.inliers, True)
        )

    if cfg.use_lines:
        lf = line_ops.detect_lines(gray, capacity=cfg.cap.lines)
        if static_mask is not None and cfg.tracking.static_mask_path is not None:
            mid = 0.5 * (lf.p0 + lf.p1)
            su = jnp.clip(mid[:, 0].astype(jnp.int32), 0, gray.shape[1] - 1)
            sv = jnp.clip(mid[:, 1].astype(jnp.int32), 0, gray.shape[0] - 1)
            lf = lf._replace(valid=lf.valid & static_mask[sv, su])
        l3d = line3d_ops.fit_lines_3d(
            depth, cfg.camera, lf.p0, lf.p1, lf.valid,
            min_valid=cfg.lines.min_valid_depth_samples,
            min_length=cfg.lines.min_length_3d,
        )
        # Structural endpoint refinement (reference: par/perp discovery at
        # frame construction, src/Tracking.cc:270-293, then LineOptStruct,
        # src/Tracking.cc:331).
        v3 = lf.valid & l3d.valid
        d3 = l3d.X1_c - l3d.X0_c
        d3 = d3 / (jnp.linalg.norm(d3, axis=-1, keepdims=True) + 1e-9)
        d2 = lf.p1 - lf.p0
        d2 = d2 / (jnp.linalg.norm(d2, axis=-1, keepdims=True) + 1e-9)
        pairs = struct_ops.discover_pairs(
            d2, d3, v3,
            par_deg=cfg.manhattan.par_deg_2d3d,
            perp_deg=cfg.manhattan.perp_deg_2d3d,
        )
        if cfg.use_manhattan and R_cm_ref is not None:
            ax_idx = manh_ops.line_axis_assignment(
                R_cm_ref, d3, cone=cfg.manhattan.line_cone
            )
            axes_c = R_cm_ref.T  # rows = axes in camera frame
            ax_dir = axes_c[jnp.maximum(ax_idx, 0)]
            ax_ok = (ax_idx >= 0) & manh_valid & v3
        else:
            ax_dir = jnp.zeros_like(d3)
            ax_ok = jnp.zeros_like(v3)
        # Frame-vs-MAP structural pairs: frame lines par/perp to local map
        # lines constrain the same endpoint refinement (reference:
        # Manhattan::computeStructConstInMap feeding LineOptStruct,
        # src/Manhattan.cpp:163-214 via src/Tracking.cc:2831). Map
        # directions rotate into the camera frame with the predicted pose
        # and enter as fixed measurements.
        ml_d_w = ml_X1 - ml_X0
        ml_len = jnp.linalg.norm(ml_d_w, axis=-1, keepdims=True)
        ml_d_w = ml_d_w / jnp.maximum(ml_len, 1e-9)
        ml_dvalid = ml_valid & (ml_len[:, 0] > 1e-3)
        d3_w = d3 @ T_pred[:3, :3]  # R_cw^T d_c rowwise
        par_map, perp_map = struct_ops.discover_pairs_vs_map(
            d3_w, v3, ml_d_w, ml_dvalid,
            par_deg=cfg.manhattan.par_deg_map,
            perp_deg=cfg.manhattan.perp_deg_map,
        )
        ml_d_c = ml_d_w @ T_pred[:3, :3].T  # rows: R_cw d_w
        X0r, X1r = struct_ops.line_opt_struct(
            l3d.X0_c, l3d.X1_c, v3, pairs.par, pairs.perp, ax_dir, ax_ok,
            map_dir=ml_d_c, par_map=par_map, perp_map=perp_map,
        )
        l3d = l3d._replace(X0_c=X0r, X1_c=X1r)
        lres = matcher.search_lines_by_projection(
            ml_X0, ml_X1, ml_desc, ml_valid,
            lf.p0, lf.p1, lf.desc, lf.valid,
            T_pred, cfg.camera,
        )
        ln_local = lres.pt_id_per_kp  # (M,) map-line row per segment or -1

        # Frame-to-frame line search: current segments that the projection
        # search left unmatched inherit the previous frame's map-line match
        # when descriptor + rotation-warped geometry agree (reference:
        # LSDmatcher::SearchByGeomNApearance in TrackWithMotionModel,
        # src/LSDmatcher.cpp:36-156, src/Tracking.cc:2290).
        R_cl = T_pred[:3, :3] @ T_prev_cw[:3, :3].T
        w0 = lk_ops.warp_points_by_rotation(cfg.camera, prev_p0, R_cl)
        w1 = lk_ops.warp_points_by_rotation(cfg.camera, prev_p1, R_cl)
        f2f = matcher.search_lines_f2f(
            w0, w1, prev_desc, prev_lvalid & (prev_row >= 0),
            lf.p0, lf.p1, lf.desc, lf.valid,
            max_desc_dist=cfg.lines.f2f_max_desc_dist,
            max_mid_dist=cfg.lines.f2f_max_mid_dist,
            max_angle=cfg.lines.f2f_max_angle,
        )
        inherit = (ln_local < 0) & (f2f.pt_id_per_kp >= 0)
        inherited_row = prev_row[jnp.maximum(f2f.pt_id_per_kp, 0)]
        ln_local = jnp.where(inherit, inherited_row, ln_local)

        lmatched = ln_local >= 0
        safe = jnp.maximum(ln_local, 0)
        line2d = lf.line2d  # (M, 3)

        # Manhattan-seeded LK recovery: previous-frame segments whose map
        # line found NO match above are tracked into this frame with
        # rotation-warped initial guesses and refit to a 2D line; the
        # recovered observation re-enters the pose LM as extra line edges
        # (reference: LSDmatcher::optical_flow_line called per frame,
        # src/LSDmatcher.cpp:158-520, src/Tracking.cc:2299-2301).
        Ll = ml_X0.shape[0]
        row_matched = jnp.zeros((Ll,), bool).at[
            jnp.where(lmatched, safe, Ll)
        ].set(True, mode="drop")
        prow_safe = jnp.maximum(prev_row, 0)
        if cfg.lines.lk_recovery:
            need = prev_lvalid & (prev_row >= 0) & ~row_matched[prow_safe]
            # LK itself ran in the separate `lk_recover_program` dispatch
            # over ALL candidate segments (the batched op always computes
            # every row and masks — applying the `need` gate here instead of
            # there is numerically identical).
            q0, q1, rec_fit = lk_q0, lk_q1, lk_fit
            # Verify against the projected map line in the predicted view
            # (reference gates on point-line distance + direction,
            # src/LSDmatcher.cpp:420-470).
            P0c = se3.transform(T_pred, ml_X0[prow_safe])
            P1c = se3.transform(T_pred, ml_X1[prow_safe])
            pr0 = camera_ops.project(cfg.camera, P0c)
            pr1 = camera_ops.project(cfg.camera, P1c)
            dirm = pr1 - pr0
            lenm = jnp.linalg.norm(dirm, axis=-1) + 1e-9
            um = dirm / lenm[:, None]
            nm = jnp.stack([-um[:, 1], um[:, 0]], axis=1)
            front = (P0c[:, 2] > 0.1) & (P1c[:, 2] > 0.1)
            dperp = jnp.maximum(
                jnp.abs(jnp.sum((q0 - pr0) * nm, axis=1)),
                jnp.abs(jnp.sum((q1 - pr0) * nm, axis=1)),
            )
            dq = q1 - q0
            lenq = jnp.linalg.norm(dq, axis=-1) + 1e-9
            cosang = jnp.abs(jnp.sum(dq * um, axis=1)) / lenq
            rec_ok = (
                need & rec_fit & front
                & (dperp < cfg.lines.lk_max_perp)
                & (cosang > jnp.cos(cfg.lines.lk_max_angle))
                & (lenq > 10.0)
            )
            # Homogeneous 2D line through the recovered endpoints,
            # normalized like detect_lines' line2d.
            rl = jnp.cross(
                jnp.concatenate([q0, jnp.ones_like(q0[:, :1])], axis=1),
                jnp.concatenate([q1, jnp.ones_like(q1[:, :1])], axis=1),
            )
            rl = rl / (jnp.linalg.norm(rl[:, :2], axis=1, keepdims=True) + 1e-9)
            rec_rows = jnp.where(rec_ok, prev_row, -1)
        else:
            rec_ok = jnp.zeros_like(prev_lvalid)
            rl = jnp.zeros((prev_p0.shape[0], 3), jnp.float32)
            rec_rows = jnp.full((prev_p0.shape[0],), -1, jnp.int32)

        lobs = LineObs(
            X_w=jnp.concatenate(
                [ml_X0[safe], ml_X1[safe], ml_X0[prow_safe], ml_X1[prow_safe]]
            ),
            line2d=jnp.concatenate([line2d, line2d, rl, rl]),
            inv_sigma2=jnp.ones((2 * ln_local.shape[0] + 2 * rec_ok.shape[0],)),
            valid=jnp.concatenate(
                [
                    lmatched & lf.valid, lmatched & lf.valid,
                    rec_ok, rec_ok,
                ]
            ),
        )
        # Vanishing-point direction edges: the matched map line's world
        # direction against the frame's depth-fitted 3D direction — a
        # translation-free rotation constraint (reference:
        # DistVp2VpOnlyPose per matched line, src/Optimizer.cc:820-860).
        dml = ml_X1[safe] - ml_X0[safe]
        dml_n = jnp.linalg.norm(dml, axis=-1, keepdims=True)
        d3r = l3d.X1_c - l3d.X0_c  # structurally-refined observation
        d3r = d3r / (jnp.linalg.norm(d3r, axis=-1, keepdims=True) + 1e-9)
        dobs = DirObs(
            d_w=dml / jnp.maximum(dml_n, 1e-9),
            d_c=d3r,
            inv_sigma2=jnp.ones((ln_local.shape[0],)),
            valid=lmatched & v3 & (dml_n[:, 0] > 1e-3),
        )
    else:
        lf = l3d = None
        ln_local = jnp.zeros((0,), jnp.int32)
        lres = None
        lobs = None
        dobs = None
        rec_rows = None
        rec_ok = None

    if cfg.use_planes:
        seg = plane_ops.segment_planes(
            depth, cfg.camera, max_planes=cfg.cap.planes
        )
        pres = matcher.match_planes(
            mp_pi, mp_valid, seg.planes, seg.centroids, seg.valid, T_pred,
            ang_ref=cfg.planes.association_ang_ref,
            dis_ref=cfg.planes.association_dis_ref,
        )
        psafe = jnp.maximum(pres.map_idx, 0)
        kind = jnp.maximum(pres.kind, 0)
        w_full = jnp.array(
            [cfg.planes.angle_info, cfg.planes.angle_info, cfg.planes.distance_info]
        )
        w_par = jnp.array([cfg.planes.parallel_info, 0.0, 0.0])
        w_vert = jnp.array([cfg.planes.vertical_info, 0.0, 0.0])
        weight = jnp.where(
            (kind == 0)[:, None], w_full[None, :],
            jnp.where((kind == 1)[:, None], w_par[None, :], w_vert[None, :]),
        )
        chi2_th = jnp.where(kind == 0, cfg.planes.chi, cfg.planes.vp_chi)
        pobs = PlaneObs(
            pi_w=mp_pi[psafe],
            pi_obs=seg.planes,
            kind=kind,
            weight=weight,
            chi2_th=chi2_th,
            valid=seg.valid & (pres.kind >= 0),
        )
    else:
        seg = pres = pobs = None

    opt = pose_optimization(
        T_lm0, pts, cfg.camera, lines=lobs, planes=pobs, dirs=dobs,
        axes_c=axes_c_lm, axes_w=axes_w_lm, w_axis=w_axis,
        chi2_mono=cfg.tracking.chi2_mono,
        chi2_stereo=cfg.tracking.chi2_stereo,
        chi2_line=cfg.tracking.chi2_line,
        chi2_3d=cfg.tracking.chi2_3d,
        inv_sigma2_3d=cfg.tracking.inv_sigma2_3d,
    )
    line_out = None
    if cfg.use_lines:
        M = ln_local.shape[0]
        Mr = rec_ok.shape[0]
        ln_inlier = opt.line_inlier[:M] & opt.line_inlier[M : 2 * M]
        rec_inlier = (
            opt.line_inlier[2 * M : 2 * M + Mr]
            & opt.line_inlier[2 * M + Mr :]
            & rec_ok
        )
        # The pulled copy carries float16 descriptors: the D2H wire is the
        # throughput bottleneck and LBD band distances are thresholded at
        # 0.5 — f16 rounding (~1e-3) is noise. The device-side f32 copy
        # stays in `feed_dev` for the chained f2f channel.
        line_out = (
            lf._replace(desc=lf.desc.astype(jnp.float16)),
            l3d, ln_local, ln_inlier, lres.visible, rec_rows, rec_inlier,
        )
    plane_out = None
    if cfg.use_planes:
        # block_label / block_centroid have no host consumer — drop them
        # from the per-frame pull (19.2 KB/frame on the wire otherwise).
        seg_out = seg._replace(
            block_label=jnp.zeros((0, 0), jnp.int32),
            block_centroid=jnp.zeros((0, 0, 3), jnp.float32),
        )
        plane_out = (seg_out, pres.map_idx, pres.kind, opt.plane_inlier)
    manh_out = None
    if cfg.use_manhattan:
        # Measured axes travel to the host so keyframes can store them:
        # local BA re-uses them as per-KF rotation anchors (same valley
        # argument as pose_optimization, applied to the whole window).
        manh_out = (axes_c_lm, sup_m)
    return (
        opt.T_cw, opt.inlier, opt.n_inliers, pt_local, res.visible, feats,
        line_out, plane_out, manh_out, words,
    )


@partial(jax.jit, static_argnames=("cfg", "radius", "check_octave"))
def fused_track_step(cfg: VOConfig, *args, radius: float = 15.0,
                     check_octave: bool = True):
    """Jitted per-frame program returning its result PACKED, split in two.

    Returns (packed_main, packed_big, T_cw, feed_dev):
    - `packed_main`: the per-frame essentials concatenated into one flat
      uint8 buffer (utils/pack.py) — over an RTT-bound transport a
      per-leaf `device_get` of the ~44-leaf tree costs ~44 round trips
      (~75 ms measured) vs one for the packed form. Unpack on host with
      `unpack_main(jax.device_get(packed_main), fused_out_meta(...))`.
    - `packed_big`: the keyframe-only leaves (descriptors, uv/obs,
      angles, octaves — ~70% of the result's bytes, consumed by the host
      only on KF insertion / relocalization / viz). Pulled lazily via
      `Tracker._materialize_feats` on the ~1/7 frames that need it; on a
      bandwidth-bound transport this is most of the steady-state wire.
    - `T_cw`: the pose as its own device array so the pipelined tracker can
      chain the next frame's prediction on it without pulling anything.
    - `feed_dev`: (p0, p1, desc, valid) of this frame's detected segments,
      kept device-resident as the next frame's f2f/LK feed (saves the
      re-upload).
    """
    out = _fused_track_step_impl(
        cfg, *args, radius=radius, check_octave=check_octave
    )
    packed_main, packed_big = pack_utils.pack_split(out)
    line_out = out[6]
    feed_dev = ()
    if line_out is not None:
        lf = line_out[0]
        # lf.desc is the float16 WIRE copy (see _fused_track_step_impl);
        # the chained feed must stay float32 — feeding f16 back into the
        # next fused_track_step changes its signature and silently
        # recompiles the whole program as a second variant (observed as
        # 40 s mid-run stalls in the round-4 bench).
        feed_dev = (lf.p0, lf.p1, lf.desc.astype(jnp.float32), lf.valid)
    return packed_main, packed_big, out[0], feed_dev


_FUSED_META: dict = {}


def fused_out_meta(cfg: VOConfig, args, radius: float = 15.0,
                   check_octave: bool = True):
    """Static (treedef, leaf spec, big-leaf mask) of the UNPACKED fused
    result, for `unpack_main`/`fill_big`. Cached per (cfg, arg shapes)."""
    key = (
        cfg, radius, check_octave,
        tuple((tuple(a.shape), str(a.dtype)) for a in args),
    )
    m = _FUSED_META.get(key)
    if m is None:
        sh = jax.eval_shape(
            partial(
                _fused_track_step_impl, cfg,
                radius=radius, check_octave=check_octave,
            ),
            *args,
        )
        m = pack_utils.tree_spec_split(sh)
        _FUSED_META[key] = m
    return m


@partial(jax.jit, static_argnames=("cfg",))
def lk_recover_program(
    cfg: VOConfig,
    gray_any: jnp.ndarray,  # (H, W) current frame (uint8 or float32)
    prev_gray_u8: jnp.ndarray,  # (H, W) previous frame intensity
    prev_p0: jnp.ndarray,  # (Ml, 2) previous frame's detected segments
    prev_p1: jnp.ndarray,
    cand: jnp.ndarray,  # (Ml,) segments worth tracking (valid & has row)
    T_pred_a: jnp.ndarray,  # (4, 4) pose prediction factors (see
    T_pred_b: jnp.ndarray,  # fused_track_step: T_pred = a @ b @ a)
    T_prev_cw: jnp.ndarray,  # (4, 4)
):
    """Manhattan/rotation-seeded LK line recovery as its OWN device program
    (reference: LSDmatcher::optical_flow_line, src/LSDmatcher.cpp:158-520).

    Deliberately dispatched separately from `fused_track_step`: inlined into
    the big program, XLA lowers the LK patch gathers to a serialized path
    (~75 ms per 921k-element gather — measured 1.3 s/frame total); as a
    standalone program the same op runs in ~0.2 ms. The outputs chain into
    the fused step as device arrays, so splitting adds no host sync."""
    T_pred = T_pred_a @ T_pred_b @ T_pred_a
    R_cl = T_pred[:3, :3] @ T_prev_cw[:3, :3].T
    return lk_ops.recover_lines_by_flow(
        cfg.camera,
        prev_gray_u8.astype(jnp.float32),
        gray_any.astype(jnp.float32),
        prev_p0, prev_p1, cand, R_cl,
        n_pts=cfg.lines.lk_samples,
    )


_inv_pose_jit = jax.jit(se3.inv)


@jax.jit
def _stack_packed(*bufs: jnp.ndarray) -> jnp.ndarray:
    """Stack K same-shape packed result buffers -> (K, nbytes) so a resolve
    burst fetches them with one device_get (one transport round trip)."""
    return jnp.stack(bufs)


@partial(jax.jit, static_argnames=("height", "width"))
def _depth_full_jit(depth_u16: jnp.ndarray, *, height: int,
                    width: int) -> jnp.ndarray:
    """uint16 mm (possibly subsampled) -> float32 meters at full resolution.

    Callers must pass the target (gray / camera) dims explicitly — the
    subsampled depth carries no record of the original resolution."""
    d = depth_u16.astype(jnp.float32) * 1e-3
    if d.shape[0] != height:
        s = -(-height // d.shape[0])  # ceil: stride subsample may round down
        d = jnp.repeat(jnp.repeat(d, s, axis=0), s, axis=1)[:height, :width]
    return d



def _gray_u8(gray_np: np.ndarray) -> np.ndarray:
    """uint8 passthrough (the sensor/PNG format); clip+cast only floats."""
    if gray_np.dtype == np.uint8:
        return gray_np
    return np.clip(gray_np, 0, 255).astype(np.uint8)


@dataclass
class TrackResult:
    state: TrackState
    T_cw: np.ndarray
    n_matches: int
    is_keyframe: bool


@dataclass
class Tracker:
    cfg: VOConfig
    use_local_ba: bool = True
    use_loop_closing: bool = True
    # In-flight frame budget for track_rgbd_async. 1 = one-frame-lag
    # (dispatch, then resolve the previous frame). >=2 also hides the
    # transport's dispatch->execution latency: frame i-depth is resolved
    # BEFORE dispatching frame i, so by resolve time its result has been
    # on host for (depth-1) call periods. Map updates lag `depth` frames.
    pipeline_depth: int = 1
    # Frames resolved per blocking device pull (>=2 amortizes the
    # transport round trip): as soon as K in-flight frames accumulate,
    # their packed results are stacked ON DEVICE by one async jit and the
    # stack's D2H copy starts immediately (`copy_to_host_async`); by the
    # time the group is resolved — (pipeline_depth - K) calls later — the
    # host copy is complete and the blocking device_get costs ~0 instead
    # of a ~25-30 ms transport round trip per frame (measured: plain pull
    # 29.4 ms, pull after completed async copy 0.2 ms; pure device
    # throughput 13 ms/frame). 0 (default) = max(1, pipeline_depth // 2):
    # per-frame resolution at depth <= 2, stacked groups at deeper
    # pipelines with half the pipe as copy-completion headroom.
    resolve_burst: int = 0
    vomap: VOMap = field(init=False)
    mapper: LocalMapper = field(init=False)
    state: TrackState = TrackState.NOT_INITIALIZED
    T_cw: np.ndarray = field(init=False)
    velocity: np.ndarray = field(init=False)  # T_cw_cur @ inv(T_cw_last)
    frame_id: int = -1
    last_kf_frame: int = -1
    n_matches_ref_kf: int = 0
    # Early-loss auto-reset (reference: Tracking.cc:918-926). Tests that
    # exercise relocalization against an infant map disable it.
    auto_reset: bool = True

    def __post_init__(self):
        self.vomap = VOMap(self.cfg)
        self.mapper = LocalMapper(self.cfg, self.vomap)
        self.T_cw = np.eye(4, dtype=np.float32)
        self.velocity = np.eye(4, dtype=np.float32)
        self._snap = None
        self._snap_host = None
        self._last_line_out = None
        self._prev_line_feed = None  # last resolved frame's segments + gray
        self._last_plane_out = None
        self._last_axes = None
        self._last_words = None  # (frame_id, word ids) from the fused step
        self._last_n_matches = 0
        # Per-stage accumulated wall times (reference: System::ExtractTimes,
        # src/System.cc:406-425 reports mean feature-extraction / line-opt /
        # pose-estimation / local-BA times; the fused design folds the first
        # three into one device program, so the split here is fused-step
        # dispatch+pull vs the keyframe-path sub-stages).
        self.stage_times: dict = {}
        # Live-viewer hook: when enabled, _finish stores zero-copy overlay
        # references for viz.live.LiveViewer (reference: FrameDrawer::Update,
        # src/FrameDrawer.cc:247). Off by default — no hot-path cost.
        self.viz_enabled = False
        self._last_viz_kp = None
        self._pipe: list = []  # in-flight pipelined frames (track_rgbd_async)
        self._stacks: list = []  # pre-stacked result groups (resolve_burst)
        self._big_ctx = None  # lazily-pulled keyframe-only leaves context
        self._used_fallback = False
        self._pads = (None, None)
        # World Manhattan rotation (columns = axes) once initialized
        # (reference: Map::SetWorldManhAxis, src/Map.cc:144).
        self.R_wm = np.eye(3, dtype=np.float32)
        self.manh_valid = False
        self._manh_fine_done = False
        self._manh_fine_pending = None  # in-flight multiview_manh_init result
        self.kf_db = KeyFrameDatabase(self.cfg.cap.keyframes)
        from ..mapping.loop_closing import LoopCloser

        self.loop_closer = LoopCloser(self.cfg, self.vomap)
        self.mapper._kf_db = self.kf_db
        # Static feature mask, device-resident (uploaded once; reference
        # loads ./masks/mask.png at startup, src/Tracking.cc:82-86).
        H, W = self.cfg.camera.height, self.cfg.camera.width
        if self.cfg.tracking.static_mask_path:
            from PIL import Image

            m = np.asarray(
                Image.open(self.cfg.tracking.static_mask_path).convert("L")
            )
            if m.shape != (H, W):
                m = np.asarray(
                    Image.fromarray(m).resize((W, H), Image.NEAREST)
                )
            self._mask_dev = jnp.asarray(m > 0)
        else:
            self._mask_dev = jnp.ones((H, W), bool)
        # Per-frame (ref_kf_slot, T_cr) for keyframe-relative trajectory
        # chaining (reference: System::SaveTrajectoryTUM, src/System.cc:346:
        # each frame stores its pose relative to a reference keyframe so that
        # later BA corrections propagate to the whole trajectory).
        self._traj_rel: list = []

    def reset(self) -> None:
        """Full in-place reset: clear the map, database, Manhattan frame and
        tracking state, keeping compiled programs warm (reference:
        Tracking::Reset, src/Tracking.cc:3923 — clear map + KF database +
        counters). The trajectory log survives so saved trajectories still
        cover pre-reset frames (their poses freeze at the last estimates)."""
        # Materialize pre-reset trajectory entries into absolute poses
        # against the OLD map before it is dropped (their reference KF
        # slots would otherwise dangle into the new empty map).
        kf = self.vomap.keyframes
        frozen = [
            (-1, T_cr if ref < 0 else (T_cr @ kf.T_cw[ref]).astype(np.float32))
            for ref, T_cr in self._traj_rel
        ]
        saved_stages = self.stage_times
        fid = self.frame_id
        self.state = TrackState.NOT_INITIALIZED
        self.last_kf_frame = -1
        self.n_matches_ref_kf = 0
        self.__post_init__()
        self._traj_rel = frozen
        self.frame_id = fid
        self.stage_times = saved_stages

    def _stage(self, name: str, dt: float) -> None:
        acc = self.stage_times.get(name)
        if acc is None:
            self.stage_times[name] = [dt, 1]
        else:
            acc[0] += dt
            acc[1] += 1

    def stage_report(self) -> str:
        """Per-stage mean times (reference: System::ExtractTimes,
        src/System.cc:406-425)."""
        rows = []
        for k in sorted(self.stage_times):
            s, n = self.stage_times[k]
            rows.append(
                f"mean {k} time: {s / max(n, 1) * 1000:.2f} ms over {n} calls"
            )
        return "\n".join(rows)

    # ------------------------------------------------------------------

    def track_rgbd(
        self, gray: np.ndarray, depth: np.ndarray, T_cw_init: Optional[np.ndarray] = None
    ) -> TrackResult:
        """Process one RGB-D frame (reference: System::TrackRGBD ->
        Tracking::GrabImageRGBD_wh, src/Tracking.cc:236)."""
        self.frame_id += 1
        gray_np = np.asarray(gray)
        depth_np = np.asarray(depth)
        # Compact uploads for the per-frame hot path: uint8 intensity +
        # uint16 millimeter depth (3.5x less tunnel traffic than float32).
        gray_u8 = jnp.asarray(_gray_u8(gray_np))
        depth_u16 = jnp.asarray(self._depth_host_u16(depth_np))

        if self.state is TrackState.NOT_INITIALIZED:
            gray_f = jnp.asarray(gray_np.astype(np.float32))
            # uint16 input is millimeters (sensor format); init works in
            # float meters.
            depth_f = jnp.asarray(
                depth_np.astype(np.float32) * 1e-3
                if depth_np.dtype == np.uint16
                else depth_np.astype(np.float32)
            )
            feats = extract_frame_jit(gray_f, depth_f, self.cfg)
            self._initialize(feats, gray_f, depth_f, T_cw_init)
            self._record_trajectory()
            return TrackResult(self.state, self.T_cw.copy(), 0, True)
        return self._track_prepared(gray_u8, depth_u16)

    def warmup(self, gray: np.ndarray, depth: np.ndarray) -> None:
        """Compile/prime every device program the tracking loop can reach
        beyond the steady path: the wide-window recovery variant and the
        failure-path programs (BoW reloc, descriptor matching, 3D-3D
        RANSAC, EPnP, fine-Manhattan init).

        Uses the PRODUCTION signatures (uint8 gray + stride-subsampled
        uint16 depth) — warming with float32 would compile different
        programs and the first real fallback would still pay a 10+ s
        compile/cache load mid-run over a remote-compile tunnel. Call with
        one representative frame after the normal warm frames; benchmarks
        and latency-sensitive drivers should call this so no program
        compiles mid-measurement."""
        g0 = jnp.asarray(_gray_u8(np.asarray(gray)))
        d0 = jnp.asarray(self._depth_host_u16(np.asarray(depth)))
        # Standard single-frame variant (radius=15, check_octave=True):
        # batch runners never touch it until a slot falls back to
        # synchronous re-tracking, which would then compile mid-run.
        self._track_local_map(g0, d0, self.T_cw)
        self._track_local_map(g0, d0, self.T_cw, radius=50.0, check_octave=False)
        self._relocalize(g0, d0)
        # Burst-resolve stack program (track_rgbd_async with resolve
        # bursts): compile the arity-K stack against a real packed buffer
        # WITHOUT touching tracker state — priming it with re-tracked
        # frames would reset the velocity model right before measurement.
        if self._burst_k() > 1:
            saved_pads = self._pads
            args = self.prepare_step_args(g0, d0, self.T_cw)
            packed0 = fused_track_step(self.cfg, *args)[0]
            jax.block_until_ready(_stack_packed(*([packed0] * self._burst_k())))
            self._pads = saved_pads
        # Fine-Manhattan init fires a few keyframes in (reference:
        # MultiViewManhInit, src/LocalMapping.cc:100-110).
        from ..ops import manhattan as manh_ops

        manh_ops.multiview_manh_init(
            jnp.eye(3, dtype=jnp.float32),
            jnp.zeros((1024, 3), jnp.float32),
            jnp.zeros((1024,), jnp.float32),
            jnp.full((1024,), -1, jnp.int32),
        )
        # Loop-closure pose graph at its smallest fixed capacity (K_CAP=16,
        # E_CAP=32 — loop_closing.py pads to powers of two): the first real
        # closure otherwise compiles it mid-run (observed as a multi-second
        # stall window in the system-configuration bench).
        if self.use_loop_closing:
            from ..solve.pose_graph import PoseGraph, optimize_pose_graph

            Kc, Ec = 16, 32
            eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (Kc, 4, 4))
            pgw = PoseGraph(
                T_cw=eye,
                free=jnp.zeros((Kc,), bool).at[1:4].set(True),
                e_i=jnp.zeros((Ec,), jnp.int32),
                e_j=jnp.zeros((Ec,), jnp.int32),
                e_Tij=jnp.broadcast_to(
                    jnp.eye(4, dtype=jnp.float32), (Ec, 4, 4)
                ),
                e_weight=jnp.zeros((Ec,), jnp.float32),
            )
            jax.block_until_ready(optimize_pose_graph(pgw))
        # EPnP fallback of relocalization (reference: src/Tracking.cc:3805).
        from ..solve.pnp import pnp_ransac

        rngw = np.random.default_rng(0)
        cap = self.cfg.cap.keypoints
        pnp_ransac(
            jnp.asarray(
                rngw.normal(size=(cap, 3)).astype(np.float32)
                + np.array([0, 0, 4], np.float32)
            ),
            jnp.asarray(rngw.uniform(0, 480, (cap, 2)).astype(np.float32)),
            jnp.ones((cap,), bool),
            self.cfg.camera,
            jnp.uint32(0),
        )

    def _track_prepared(self, gray, depth) -> TrackResult:
        """Synchronous tracking given already-uploaded uint8/uint16 frames."""
        T_pred = self.velocity @ self.T_cw
        if self.state is TrackState.LOST:
            # Relocalize by appearance before attempting to track
            # (reference: Tracking::Relocalization, src/Tracking.cc:3760).
            T_reloc = self._relocalize(gray, depth)
            if T_reloc is not None:
                T_pred = T_reloc
                self.velocity = np.eye(4, dtype=np.float32)
        five = self._track_local_map(gray, depth, T_pred)
        return self._post_track(five, gray, depth)

    def _materialize_feats(self, feats: FrameFeatures) -> FrameFeatures:
        """Fill the lazily-pulled keyframe-only leaves (descriptors, uv,
        obs, angles, octaves — see utils/pack.BIG_LEAF_NAMES) of the frame
        currently being resolved. No-op when `feats` is already complete
        (synchronous paths). One device_get of the big buffer; also patches
        `_last_line_out` and `_prev_line_feed` so the keyframe path sees
        complete line features."""
        if feats.desc is not None:
            return feats
        ctx = getattr(self, "_big_ctx", None)
        assert ctx is not None, "partial feats outside a resolve context"
        big_src, meta, out_partial = ctx
        if callable(big_src):
            big_src = big_src()
        big_host = (
            big_src if isinstance(big_src, np.ndarray)
            else jax.device_get(big_src)
        )
        full = pack_utils.fill_big(
            out_partial, pack_utils.unpack_big_leaves(big_host, meta), meta
        )
        feats_full = full[5]
        line_out = full[6]
        if line_out is not None and self._last_line_out is not None:
            lf_full = line_out[0]
            _lf, l3d, ln_per_seg = self._last_line_out
            self._last_line_out = (lf_full, l3d, ln_per_seg)
            if self._prev_line_feed is not None and \
                    self._prev_line_feed.get("fid") == self.frame_id:
                self._prev_line_feed["desc"] = np.asarray(lf_full.desc)
        # Cache into the context so repeated calls in one resolve are free.
        self._big_ctx = (big_host, meta, full)
        return feats_full

    def _post_track(self, five, gray, depth) -> TrackResult:
        """Everything after the primary fused-step result: fallback chain,
        pose/velocity update, keyframe policy, mapping, trajectory."""
        ok, T_new, pt_per_kp, n_matches, feats = five
        self._used_fallback = False
        # Poison-worthiness of this frame's fallback: anything but a
        # near-primary wide-window recovery keeps the conservative value.
        self._fallback_delta = np.inf
        T_primary = np.asarray(T_new, np.float64)
        if not ok:
            # Wide-window recovery from the last pose (reference falls back
            # from the motion model to wider searches the same way).
            self._used_fallback = True
            ok, T_new, pt_per_kp, n_matches, feats = self._track_local_map(
                gray, depth, self.T_cw, radius=50.0, check_octave=False
            )
            if ok:
                # How far the recovered pose landed from the failed
                # primary's estimate: in-flight successors chained their
                # predictions on the PRIMARY pose, so a small delta means
                # their dispatches are still fine (the matcher window
                # absorbs cm-scale prediction error) and the pipeline need
                # not be poisoned (_resolve_oldest checks this).
                # The failed primary's pose can be any garbage, including
                # singular — treat it as maximally-distant then.
                try:
                    if not np.isfinite(T_primary).all():
                        raise np.linalg.LinAlgError
                    d = np.asarray(T_new, np.float64) @ np.linalg.inv(T_primary)
                except np.linalg.LinAlgError:
                    d = np.full((4, 4), np.nan)
                if np.isfinite(d).all():
                    rot = np.clip((np.trace(d[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)
                    # Rotation is weighted by scene depth scale: 0.01 rad
                    # already moves an edge pixel ~7 px at fx=535, so it
                    # counts ~4 m/rad against the translation budget.
                    self._fallback_delta = float(
                        np.linalg.norm(d[:3, 3]) + 4.0 * np.arccos(rot)
                    )
                else:
                    self._fallback_delta = np.inf
        if not ok:
            # Window-free fallback vs the reference keyframe (reference:
            # TrackReferenceKeyFrame, src/Tracking.cc:1831). Descriptor-only
            # matches can produce false consensus, so acceptance demands a
            # much larger inlier count than the normal gate.
            feats = self._materialize_feats(feats)
            T_ref = self._track_reference_kf(feats)
            if T_ref is not None:
                ok, T_new, pt_per_kp, n_matches, feats = self._track_local_map(
                    gray, depth, T_ref
                )
                ok = ok and n_matches >= 3 * self.cfg.tracking.min_matches_track

        is_kf = False
        if ok:
            vel = T_new @ np.linalg.inv(self.T_cw)
            self.velocity = vel.astype(np.float32)
            self.T_cw = T_new.astype(np.float32)
            self.state = TrackState.OK
            if self._need_new_keyframe(n_matches, feats, pt_per_kp):
                if self.cfg.use_manhattan and not self.manh_valid:
                    self._try_coarse_manhattan(depth)
                t0 = time.perf_counter()
                feats = self._materialize_feats(feats)
                self._create_keyframe(feats, pt_per_kp)
                self._stage("kf_insert", time.perf_counter() - t0)
                # Reference ratio rule compares against the reference KF's
                # *tracked* matches (mnMatchesInliers vs nRefMatches,
                # src/Tracking.cc:2966-2985), not the total observation
                # count — counting freshly created points makes every frame
                # trip the 0.75 ratio and churns keyframes.
                self.n_matches_ref_kf = max(n_matches, 1)
                is_kf = True
                # Epipolar triangulation reaches keypoints depth could not
                # landmark (reference order: CreateNewMapPoints runs before
                # fuse + BA, src/LocalMapping.cc:82-122).
                if self.cfg.tracking.triangulate_new_points:
                    t0 = time.perf_counter()
                    self.mapper.create_new_map_points()
                    self._stage("kf_triangulate", time.perf_counter() - t0)
                if self.cfg.use_lines and self.cfg.tracking.triangulate_new_lines:
                    t0 = time.perf_counter()
                    self.mapper.create_new_map_lines()
                    self._stage("kf_triangulate_lines", time.perf_counter() - t0)
                t0 = time.perf_counter()
                self.mapper.fuse_points()
                if self.cfg.use_lines:
                    self.mapper.fuse_lines()
                # Distinctive-descriptor re-election over the covisible
                # window (reference: ComputeDistinctiveDescriptors from
                # ProcessNewKeyFrame + after Fuse, src/LocalMapping.cc:93).
                self.mapper.reelect_point_descriptors()
                self._stage("kf_fuse", time.perf_counter() - t0)
                if self.use_local_ba:
                    t0 = time.perf_counter()
                    self.mapper.run_local_ba()
                    self._stage("local_ba", time.perf_counter() - t0)
                    # BA may have moved the newest KF (= this frame's pose).
                    self.T_cw = self.vomap.keyframes.T_cw[
                        self.vomap.newest_kf_slot
                    ].copy()
                t0 = time.perf_counter()
                if self.use_loop_closing and self.loop_closer.detect_and_close(self):
                    self.T_cw = self.vomap.keyframes.T_cw[
                        self.vomap.newest_kf_slot
                    ].copy()
                self._stage("loop_detect", time.perf_counter() - t0)
                # Redundant-keyframe culling every few insertions
                # (reference: LocalMapping::KeyFrameCulling runs per KF).
                if self.vomap.n_keyframes() % 4 == 0:
                    t0 = time.perf_counter()
                    self._reanchor_trajectory(self.mapper.cull_keyframes())
                    self._stage("kf_cull", time.perf_counter() - t0)
                self.invalidate_map_snapshot()
        else:
            self.state = TrackState.LOST
            # Auto-reset on early loss: with <= 5 keyframes the infant map
            # is unrecoverable junk — rebuild from scratch instead of trying
            # to relocalize against it (reference: Tracking.cc:918-926).
            if self.auto_reset and self.vomap.n_keyframes() <= 5:
                self.reset()
        self._record_trajectory()
        return TrackResult(self.state, self.T_cw.copy(), n_matches, is_kf)

    # ---- pipelined (one-frame-lag) tracking ---------------------------

    def track_rgbd_async(
        self, gray: np.ndarray, depth: np.ndarray,
        T_cw_init: Optional[np.ndarray] = None,
    ) -> list:
        """Pipelined tracking for RTT-bound transports (depth in-flight).

        With pipeline_depth=1 (default): dispatches this frame's fused step
        against a device-resident constant-velocity prediction chained on
        the still-in-flight previous result, then resolves the PREVIOUS
        frame — so device compute and transfers overlap host bookkeeping
        instead of serializing (the reference gets the same overlap from
        its mapping/tracking thread split, src/System.cc:74-90).

        With pipeline_depth>=2: frame i-depth is resolved BEFORE frame i is
        dispatched. By then its result has been on host for (depth-1) call
        periods, so the blocking device_get costs ~0 even when the
        transport adds tens of ms between host dispatch and device
        execution; the velocity baseline stays exactly one frame behind
        the newest in-flight pose. Steady-state throughput becomes
        max(host bookkeeping, device time, upload line rate) instead of
        including the dispatch->execution latency.

        Returns the TrackResults that became final during this call (empty
        on the first `depth` calls). Call `flush()` at sequence end.
        Keyframe insertion and map updates lag `depth` frames; dispatched
        frames track against a snapshot that old, matching the reference's
        asynchronous LocalMapping semantics.
        """
        if self.state is not TrackState.OK:
            out = []
            out.extend(self.flush())
            out.append(self.track_rgbd(gray, depth, T_cw_init))
            return out

        # Phase timers (host-side dispatch time; transfers/compute overlap
        # asynchronously — see parallel/multiseq.py for the same contract):
        # "upload" = host encode + async H2D dispatch, "dispatch" = arg prep
        # + program enqueue, "resolve" = previous-frame pull + bookkeeping.
        _tm = self.step_times = getattr(self, "step_times", {
            "upload": [], "dispatch": [], "resolve": []
        })
        for v in _tm.values():
            if len(v) >= 512:
                del v[: len(v) - 511]

        results: list = []
        if self.pipeline_depth > 1:
            # Resolve-first: the oldest in-flight frame is depth calls old
            # and already on host; resolving it now keeps the velocity
            # baseline (T_pred_b below) exactly one frame behind the newest
            # in-flight pose.
            _t0 = time.perf_counter()
            while self._pipe and len(self._pipe) >= self.pipeline_depth:
                results.extend(self._resolve_burst())
            _tm["resolve"].append(time.perf_counter() - _t0)
            if self.state is not TrackState.OK:
                results.append(self.track_rgbd(gray, depth, T_cw_init))
                return results

        self.frame_id += 1
        fid = self.frame_id
        _t0 = time.perf_counter()
        gray_np = np.asarray(gray)
        depth_np = np.asarray(depth)
        gray_u8 = jnp.asarray(_gray_u8(gray_np))
        depth_u16 = jnp.asarray(self._depth_host_u16(depth_np))
        _tm["upload"].append(time.perf_counter() - _t0)
        _t0 = time.perf_counter()

        if not self._pipe:
            T_pred = (self.velocity @ self.T_cw).astype(np.float32)
            T_pred_b = None
        else:
            # Constant-velocity prediction entirely inside the fused jit:
            # the newest pending frame's pose is still in flight; chaining
            # keeps the dispatch asynchronous, and composing
            # T_prev inv(T_pp) T_prev inside the program avoids per-frame
            # eager device ops (each its own execution over the tunnel).
            # T_pp must be the SECOND-newest in-flight pose, not the last
            # resolved one: at pipeline depth P the resolved pose is P
            # frames old and the prediction would overshoot by (P-1) x
            # velocity. Its inverse is computed by a chained one-op device
            # jit — still no host sync.
            T_pred = self._pipe[-1]["out"][2]  # in-flight device pose
            T_pred_b = (_inv_pose_jit(self._pipe[-2]["out"][2])
                        if len(self._pipe) >= 2
                        else np.linalg.inv(self.T_cw).astype(np.float32))
        args = self.prepare_step_args(gray_u8, depth_u16, T_pred, T_pred_b)
        out_dev = fused_track_step(self.cfg, *args)
        # Start the packed result's D2H copy at DISPATCH time (not the
        # pose/feed device arrays — those stay on device): it runs as soon
        # as this frame's compute finishes. Requesting it on the next call
        # would queue it behind the next frame's compute, adding a full
        # device step to every resolve. Skipped in burst mode — the group
        # stack's own async copy replaces it, and the per-frame copy would
        # just double the D2H bytes.
        if self._burst_k() <= 1 and hasattr(out_dev[0], "copy_to_host_async"):
            out_dev[0].copy_to_host_async()
        self._pipe.append(dict(
            out=out_dev, fid=fid, gray=gray_u8, depth=depth_u16,
            pads=self._pads,
            meta=fused_out_meta(self.cfg, args),
        ))
        self._maybe_stack_pending()
        _tm["dispatch"].append(time.perf_counter() - _t0)
        if self.pipeline_depth == 1:
            # Dispatch-then-resolve: this dispatch overlaps the previous
            # frame's in-flight compute (the original one-frame-lag order).
            _t0 = time.perf_counter()
            while len(self._pipe) > 1:
                results.extend(self._resolve_oldest())
            _tm["resolve"].append(time.perf_counter() - _t0)
        return results

    def flush(self) -> list:
        """Resolve all in-flight pipelined frames; returns their TrackResults."""
        # Group the unstacked tail first: flushing a deep pipe frame by
        # frame would pay one transport round trip per leftover frame.
        if getattr(self, "_pipe", None) and self._burst_k() > 1:
            n_stacked = sum(g["k"] for g in self._stacks)
            grp = self._pipe[n_stacked:]
            if len(grp) >= 2:
                bufs = [p["out"][0] for p in grp]
                stacked = _stack_packed(*bufs)
                if hasattr(stacked, "copy_to_host_async"):
                    stacked.copy_to_host_async()
                self._stacks.append(
                    dict(stacked=stacked, bufs=bufs, k=len(grp))
                )
        results: list = []
        while getattr(self, "_pipe", None):
            results.extend(self._resolve_burst())
        return results

    def _burst_k(self) -> int:
        if self.resolve_burst > 0:
            return self.resolve_burst
        return max(1, self.pipeline_depth // 2)

    def _maybe_stack_pending(self) -> None:
        """Once K dispatched-but-unstacked frames accumulate, stack their
        packed results with one async jit and start the stack's D2H copy.
        Resolution happens (pipeline_depth - K) calls later, by which time
        the copy is complete and the pull is ~free (see `resolve_burst`)."""
        k = self._burst_k()
        if k <= 1:
            return
        n_stacked = sum(g["k"] for g in self._stacks)
        while len(self._pipe) - n_stacked >= k:
            grp = self._pipe[n_stacked : n_stacked + k]
            bufs = [p["out"][0] for p in grp]
            stacked = _stack_packed(*bufs)
            if hasattr(stacked, "copy_to_host_async"):
                stacked.copy_to_host_async()
            self._stacks.append(dict(stacked=stacked, bufs=bufs, k=k))
            n_stacked += k

    def _resolve_burst(self) -> list:
        """Resolve the oldest in-flight group with ONE blocking device
        pull (pre-stacked + async-copied by `_maybe_stack_pending`), or a
        single frame when no group covers the head of the pipe."""
        results: list = []
        if self._stacks and self._pipe and \
                self._stacks[0]["bufs"][0] is self._pipe[0]["out"][0]:
            g = self._stacks.pop(0)
            rows = jax.device_get(g["stacked"])
            for j in range(g["k"]):
                # A failure inside a resolve re-tracks every remaining
                # in-flight frame synchronously and empties the pipe — the
                # pre-pulled rows and stacks are then stale.
                if not self._pipe or self._pipe[0]["out"][0] is not g["bufs"][j]:
                    self._stacks.clear()
                    break
                results.extend(self._resolve_oldest(rows[j]))
            return results
        results.extend(self._resolve_oldest())
        if not self._pipe:
            self._stacks.clear()
        return results

    def _resolve_oldest(self, out_host_packed=None) -> list:
        p = self._pipe.pop(0)
        saved_fid = self.frame_id
        self.frame_id = p["fid"]
        try:
            self._pads = p["pads"]  # pad maps as of this frame's dispatch
            packed, packed_big, _T_dev, feed_dev = p["out"]
            if out_host_packed is None:
                out_host_packed = jax.device_get(packed)
            out_host = pack_utils.unpack_main(out_host_packed, p["meta"])
            # Keyframe-only leaves stay on device; _materialize_feats pulls
            # them on the ~1/7 frames whose host path needs them.
            self._big_ctx = (packed_big, p["meta"], out_host)
            five = self.finish_step(out_host, gray=p["gray"], feed_dev=feed_dev)
            res = self._post_track(five, p["gray"], p["depth"])
        finally:
            self._big_ctx = None
            self.frame_id = saved_fid
        results = [res]
        # A fallback whose recovered pose landed within the matcher's
        # absorption range of the primary estimate (< 5 cm + rad combined;
        # the 15 px window at typical scene depth tolerates more) leaves
        # the successors' chained predictions valid — re-tracking them
        # would cost ~P x 45 ms of synchronous storms for nothing.
        benign_fallback = (
            self._used_fallback
            and getattr(self, "_fallback_delta", np.inf) < 0.02
        )
        if res.state is not TrackState.OK or (
            self._used_fallback and not benign_fallback
        ):
            # Every in-flight successor was chained on a pose that turned
            # out wrong; their dispatches are poisoned. Re-track them
            # synchronously, in order, from the corrected state.
            dead_list, self._pipe = self._pipe, []
            for dead in dead_list:
                saved_fid = self.frame_id
                self.frame_id = dead["fid"]
                try:
                    results.append(
                        self._track_prepared(dead["gray"], dead["depth"])
                    )
                finally:
                    self.frame_id = saved_fid
        return results

    def _reanchor_trajectory(self, culled: list) -> None:
        """Re-chain trajectory entries referencing culled keyframes onto the
        nearest surviving keyframe (reference keeps the relative pose to a
        reference KF and re-parents on cull, src/System.cc:372-401 +
        KeyFrame::SetBadFlag). Must run before culled slots are recycled —
        their final poses are still in the table at this point."""
        if not culled:
            return
        vm = self.vomap
        surv = vm.kf_slots_by_order()
        # The victims may still be flagged valid (the eviction path re-anchors
        # before releasing the slot so the pose is guaranteed live) — they are
        # never survivors.
        surv = surv[~np.isin(surv, culled)]
        if len(surv) == 0:
            return
        kf = vm.keyframes
        refs = np.fromiter(
            (r for r, _ in self._traj_rel), np.int64, len(self._traj_rel)
        )
        for k in culled:
            hits = np.nonzero(refs == k)[0]
            if len(hits) == 0:
                continue
            j = int(surv[np.argmin(np.abs(kf.frame_id[surv] - kf.frame_id[k]))])
            D = (kf.T_cw[k] @ np.linalg.inv(kf.T_cw[j])).astype(np.float32)
            for i in hits:
                ref_i, T_cr = self._traj_rel[i]
                self._traj_rel[i] = (j, (T_cr @ D).astype(np.float32))
            refs[hits] = j

    def _record_trajectory(self):
        ref = self.vomap.newest_kf_slot
        if ref < 0:
            self._traj_rel.append((-1, self.T_cw.copy()))
            return
        T_cr = self.T_cw @ np.linalg.inv(self.vomap.keyframes.T_cw[ref])
        self._traj_rel.append((int(ref), T_cr.astype(np.float32)))

    def get_trajectory(self) -> np.ndarray:
        """(F, 4, 4) camera-to-world poses, chained through the *current*
        (BA-corrected) keyframe poses (reference: src/System.cc:372-401)."""
        out = []
        for ref, T_cr in self._traj_rel:
            if ref < 0:
                out.append(np.linalg.inv(T_cr))
            else:
                T_cw = T_cr @ self.vomap.keyframes.T_cw[ref]
                out.append(np.linalg.inv(T_cw))
        return np.stack(out)

    # ------------------------------------------------------------------

    def _initialize(
        self,
        feats: FrameFeatures,
        gray: jnp.ndarray,
        depth: jnp.ndarray,
        T_cw_init: Optional[np.ndarray],
    ):
        """Create the first keyframe + map points/lines from depth
        (reference: StereoInitialization, src/Tracking.cc:1350)."""
        if T_cw_init is not None:
            self.T_cw = T_cw_init.astype(np.float32)
        pt_per_kp = np.full((self.cfg.cap.keypoints,), -1, np.int32)
        valid = np.asarray(feats.valid) & (np.asarray(feats.depth) > 1e-3)
        if valid.sum() < 50:
            return  # not enough depth to initialize
        if self.cfg.use_lines:
            lf = line_ops.detect_lines(gray, capacity=self.cfg.cap.lines)
            l3d = line3d_ops.fit_lines_3d(
                depth, self.cfg.camera, lf.p0, lf.p1, lf.valid,
                min_valid=self.cfg.lines.min_valid_depth_samples,
                min_length=self.cfg.lines.min_length_3d,
            )
            self._last_line_out = (
                lf, l3d, np.full((self.cfg.cap.lines,), -1, np.int32)
            )
            # Line feed so frame 1 can already run the f2f/LK channel.
            self._prev_line_feed = dict(
                gray=jnp.clip(gray, 0, 255).astype(jnp.uint8),
                fid=self.frame_id,
                p0=np.asarray(lf.p0), p1=np.asarray(lf.p1),
                desc=np.asarray(lf.desc), valid=np.asarray(lf.valid),
                gid=np.full((self.cfg.cap.lines,), -1, np.int32),
            )
        if self.cfg.use_planes:
            seg = plane_ops.segment_planes(
                depth, self.cfg.camera, max_planes=self.cfg.cap.planes
            )
            none = np.full((self.cfg.cap.planes,), -1, np.int32)
            self._last_plane_out = (seg, none, none.copy(), np.zeros_like(none, bool))
        if self.cfg.use_manhattan:
            self._try_coarse_manhattan(depth)
        self._create_keyframe(feats, pt_per_kp)
        self.state = TrackState.OK
        self.last_kf_frame = self.frame_id

    def _depth_host_u16(self, depth_np: np.ndarray) -> np.ndarray:
        """Host-side compact depth encoding: uint16 millimeters, optionally
        sxs-subsampled (TrackingConfig.depth_upload_stride). uint16 input is
        taken as millimeters as-is (the TUM sensor format — 16-bit PNGs;
        converting disk-u16 -> float meters -> u16 again costs ~3.5 ms per
        640x480 frame of pure numpy)."""
        s = self.cfg.tracking.depth_upload_stride
        if s > 1:
            depth_np = depth_np[::s, ::s]
        if depth_np.dtype == np.uint16:
            return np.ascontiguousarray(depth_np)
        return np.clip(depth_np * 1000.0, 0, 65535).astype(np.uint16)

    def invalidate_map_snapshot(self):
        self._snap = None
        self._snap_host = None

    def _local_map_snapshot_host(self):
        """Host-side local-map snapshot arrays + (pad, lpad) row maps. The
        batch runner stacks these across trackers before one upload.
        Cached until `invalidate_map_snapshot` (the gathers copy the map
        tables, so later in-place table mutations don't leak in)."""
        if getattr(self, "_snap_host", None) is not None:
            return self._snap_host
        cap = self.cfg.cap.local_points
        ids = self.vomap.local_point_ids(self.cfg.tracking.local_map_size_kf, cap)
        pad = np.full((cap,), -1, np.int64)
        pad[: len(ids)] = ids
        safe = np.maximum(pad, 0)
        p = self.vomap.points
        lcap = self.cfg.cap.local_lines
        lids = self.vomap.local_line_ids(self.cfg.tracking.local_map_size_kf, lcap)
        lpad = np.full((lcap,), -1, np.int64)
        lpad[: len(lids)] = lids
        lsafe = np.maximum(lpad, 0)
        t = self.vomap.lines
        mp = self.vomap.planes
        self._snap_host = (
            p.X_w[safe],
            p.desc[safe],
            (pad >= 0) & p.valid[safe],
            p.octave[safe],
            p.angle[safe],
            p.normal[safe],
            t.X0_w[lsafe],
            t.X1_w[lsafe],
            t.desc[lsafe],
            (lpad >= 0) & t.valid[lsafe],
            mp.pi_w.copy(),  # plane table is small: global slots direct
            mp.valid.copy(),
            pad,
            lpad,
        )
        return self._snap_host

    def _local_map_snapshot(self):
        """Device-resident local-map snapshot, rebuilt only when the map
        changed (KF insertion / BA / culling) — keeps the per-frame path at
        one host->device upload (the images) and one device->host pull."""
        if self._snap is not None:
            return self._snap
        t0 = time.perf_counter()
        host = self._local_map_snapshot_host()
        self._snap = tuple(jnp.asarray(a) for a in host[:-2]) + host[-2:]
        self._stage("kf_snapshot", time.perf_counter() - t0)
        return self._snap

    def _track_local_map(
        self,
        gray: jnp.ndarray,
        depth: jnp.ndarray,
        T_pred: np.ndarray,
        radius: float = 15.0,
        check_octave: bool = True,
    ):
        """Project local map into the predicted view, match, optimize pose
        (reference: TrackWithMotionModel + TrackLocalMapWithLines,
        src/Tracking.cc:2251, :2816) — all in one fused device call."""
        t0 = time.perf_counter()
        args = self.prepare_step_args(gray, depth, T_pred)
        packed, packed_big, _T_dev, feed_dev = fused_track_step(
            self.cfg, *args, radius=radius, check_octave=check_octave
        )
        # ONE synchronization point per frame: pull both packed buffers in
        # a single device_get (per-leaf pulls of the ~44-leaf tree would
        # cost a round trip each over the tunnel) and rebuild the tree.
        # The synchronous path always materializes the keyframe-only
        # leaves — it IS the fallback/KF-heavy path.
        meta = fused_out_meta(self.cfg, args, radius, check_octave)
        main_h, big_h = jax.device_get((packed, packed_big))
        out_host = pack_utils.fill_big(
            pack_utils.unpack_main(main_h, meta),
            pack_utils.unpack_big_leaves(big_h, meta),
            meta,
        )
        self._stage("fused_step", time.perf_counter() - t0)
        return self.finish_step(out_host, gray=gray, feed_dev=feed_dev)

    def prepare_step_args(self, gray, depth, T_pred, T_pred_b=None,
                          T_prev=None):
        """Device inputs for `fused_track_step` (split out so a batch runner
        can stack several trackers' inputs and vmap one call).

        `T_pred` may be a host pose (T_pred_b defaults to its inverse — the
        A inv(A) A = A identity) or an in-flight device pose with T_pred_b
        inv(T_prevprev) (host, or device via `_inv_pose_jit`) for
        on-device constant velocity.
        `T_prev` is the last frame's pose (host or in-flight device) seeding
        the rotation warp of the line f2f/LK channel."""
        (
            mX, mdesc, mvalid, moct, mangle, mnormal,
            lX0, lX1, ldesc, lvalid, mppi, mpvalid, pad, lpad,
        ) = self._local_map_snapshot()
        self._pads = (pad, lpad)
        if T_pred_b is None:
            T_pred_b = np.linalg.inv(np.asarray(T_pred)).astype(np.float32)
        if not isinstance(T_pred, jax.Array):
            # Host pose: upload; device poses pass through untouched (any
            # eager op on them would be a separate tunnel execution).
            T_pred = jnp.asarray(np.asarray(T_pred).astype(np.float32))
        if T_prev is None:
            T_prev = self.T_cw
        if not isinstance(T_prev, jax.Array):
            T_prev = jnp.asarray(np.asarray(T_prev).astype(np.float32))
        # Previous-frame line feed for the f2f + LK-recovery channel; the
        # stored GLOBAL map-line ids remap into the current snapshot's rows
        # (the snapshot may have been rebuilt since the feed was captured).
        p0_h, p1_h, desc_h, valid_h, prev_row_h, gray_h = self._prev_feed_host(lpad)
        feed = self._prev_line_feed
        dev = feed.get("dev") if feed else None
        if dev:
            # Device-resident segment feed from the previous fused step: no
            # re-upload of p0/p1/desc/valid.
            p0_d, p1_d, desc_d, valid_d = dev
        else:
            p0_d = jnp.asarray(p0_h)
            p1_d = jnp.asarray(p1_h)
            desc_d = jnp.asarray(desc_h)
            valid_d = jnp.asarray(valid_h)
        T_pred_b_d = jnp.asarray(T_pred_b)
        # LK line recovery runs as its own chained device dispatch (see
        # lk_recover_program); zeros when the channel is off or unseeded.
        if (
            feed is not None
            and self.cfg.use_lines
            and self.cfg.lines.lk_recovery
        ):
            prev_gray_d = (
                feed["gray"] if isinstance(feed["gray"], jax.Array)
                else jnp.asarray(gray_h)
            )
            lk_q0, lk_q1, lk_fit = lk_recover_program(
                self.cfg, gray, prev_gray_d, p0_d, p1_d,
                jnp.asarray(valid_h & (prev_row_h >= 0)),
                T_pred, T_pred_b_d, T_prev,
            )
        else:
            Ml = p0_h.shape[0]
            lk_q0 = jnp.zeros((Ml, 2), jnp.float32)
            lk_q1 = jnp.zeros((Ml, 2), jnp.float32)
            lk_fit = jnp.zeros((Ml,), bool)
        return (
            gray, depth, mX, mdesc, mvalid, moct, mangle, mnormal,
            lX0, lX1, ldesc, lvalid, mppi, mpvalid,
            jnp.asarray(self.R_wm), jnp.asarray(self.manh_valid),
            T_pred,
            T_pred_b_d,
            T_prev,
            lk_q0, lk_q1, lk_fit,
            p0_d, p1_d,
            desc_d, valid_d,
            jnp.asarray(prev_row_h),
            self._mask_dev,
        )

    def _prev_feed_host(self, lpad):
        """Host arrays for the previous-frame line-feed channel: (p0, p1,
        desc, valid, prev_row, gray_u8). `prev_row` remaps the feed's global
        map-line ids into the current snapshot's rows."""
        Ml = self.cfg.cap.lines
        D = 36
        feed = self._prev_line_feed
        if feed is None or not self.cfg.use_lines:
            H = self.cfg.camera.height
            W = self.cfg.camera.width
            return (
                np.zeros((Ml, 2), np.float32), np.zeros((Ml, 2), np.float32),
                np.zeros((Ml, D), np.float32), np.zeros((Ml,), bool),
                np.full((Ml,), -1, np.int32), np.zeros((H, W), np.uint8),
            )
        inv = np.full((self.cfg.cap.map_lines,), -1, np.int32)
        rows = np.nonzero(lpad >= 0)[0]
        inv[lpad[rows]] = rows.astype(np.int32)
        gid = feed["gid"]
        prev_row = np.where(gid >= 0, inv[np.maximum(gid, 0)], -1).astype(np.int32)
        if feed["desc"] is None and not feed.get("dev"):
            # Rare: the keyframe-only descriptor leaves were never pulled
            # for this frame AND the device feed is gone (e.g. reset during
            # a deep pipeline). Degrade to an empty feed — one frame
            # without f2f inheritance instead of a stale-descriptor match.
            H = self.cfg.camera.height
            W = self.cfg.camera.width
            return (
                np.zeros((Ml, 2), np.float32), np.zeros((Ml, 2), np.float32),
                np.zeros((Ml, D), np.float32), np.zeros((Ml,), bool),
                np.full((Ml,), -1, np.int32), np.zeros((H, W), np.uint8),
            )
        # The pulled descriptors are float16 (wire diet); the fused program
        # consumes a float32 feed. With a device feed present the host copy
        # is unused — zeros keep the upload shape without a real pull.
        desc = (
            np.asarray(feed["desc"], dtype=np.float32)
            if feed["desc"] is not None
            else np.zeros((Ml, D), np.float32)
        )
        return (
            feed["p0"], feed["p1"], desc, feed["valid"], prev_row,
            feed["gray"],
        )

    def prepare_step_args_host(self, gray_u8, depth_u16, T_pred, T_pred_b=None,
                               T_prev=None):
        """All-host variant of `prepare_step_args` for the batch runner: the
        returned leaves are numpy (snapshot via `_local_map_snapshot_host`),
        so S trackers' tuples can be np.stack-ed into one upload per
        position. The runner substitutes device arrays for the chained pose
        positions and the previous batched image itself."""
        host = self._local_map_snapshot_host()
        (
            mX, mdesc, mvalid, moct, mangle, mnormal,
            lX0, lX1, ldesc, lvalid, mppi, mpvalid, pad, lpad,
        ) = host
        self._pads = (pad, lpad)
        if T_pred_b is None:
            T_pred_b = np.linalg.inv(np.asarray(T_pred)).astype(np.float32)
        if T_prev is None:
            T_prev = self.T_cw
        p0_h, p1_h, desc_h, valid_h, prev_row_h, gray_h = self._prev_feed_host(lpad)
        if np.asarray(gray_h).dtype != np.uint8:
            gray_h = np.zeros_like(np.asarray(gray_u8))
        # Leaves 0-18 match fused_track_step positions; 19-23 are the
        # prev-line-feed tail (fused positions 22-26 after the 3 LK leaves
        # the batch runner inserts); 24 is the previous gray frame for the
        # runner's vmapped lk_recover_program dispatch.
        return (
            gray_u8, depth_u16, mX, mdesc, mvalid, moct, mangle, mnormal,
            lX0, lX1, ldesc, lvalid, mppi, mpvalid,
            self.R_wm, np.asarray(self.manh_valid),
            np.asarray(T_pred, np.float32),
            np.asarray(T_pred_b, np.float32),
            np.asarray(T_prev, np.float32),
            p0_h, p1_h, desc_h, valid_h, prev_row_h,
            np.asarray(gray_h),
        )

    def finish_step(self, out_host, gray=None, feed_dev=None):
        """Host bookkeeping for one pulled step result. `gray` is the
        device-resident uint8 frame, kept as the LK source for the next
        frame's line-recovery channel; `feed_dev` the device-resident
        (p0, p1, desc, valid) segment feed from the fused program (saves
        the next frame's re-upload)."""
        pad, lpad = self._pads
        (
            T_new, inlier, n_in, pt_local, visible, feats, line_out, plane_out,
            manh_out, words,
        ) = out_host
        # BoW words computed inside the fused program; consumed (on host) by
        # keyframe insertion and the keyframe database.
        self._last_words = (self.frame_id, np.asarray(words))
        n_in = int(n_in)
        pt_per_kp = np.where(pt_local >= 0, pad[np.maximum(pt_local, 0)], -1)
        matched = pt_per_kp >= 0
        # Tracking bookkeeping (reference: MapPoint::IncreaseVisible/Found).
        vis_ids = pad[visible & (pad >= 0)]
        self.vomap.points.n_visible[vis_ids] += 1
        found_ids = pt_per_kp[matched & inlier]
        self.vomap.points.n_found[found_ids] += 1
        self.vomap.points.last_seen_frame[found_ids] = self.frame_id
        pt_per_kp = np.where(matched & inlier, pt_per_kp, -1).astype(np.int32)

        self._last_line_out = None
        if line_out is not None:
            lf, l3d, ln_local, ln_inlier, ln_vis, rec_rows, rec_inlier = line_out
            ln_per_seg = np.where(ln_local >= 0, lpad[np.maximum(ln_local, 0)], -1)
            lmatched = ln_per_seg >= 0
            lvis_ids = lpad[ln_vis & (lpad >= 0)]
            self.vomap.lines.n_visible[lvis_ids] += 1
            lfound = ln_per_seg[lmatched & ln_inlier]
            self.vomap.lines.n_found[lfound] += 1
            self.vomap.lines.last_seen_frame[lfound] = self.frame_id
            ln_per_seg = np.where(lmatched & ln_inlier, ln_per_seg, -1).astype(np.int32)
            # LK-recovered observations keep the map line alive even though
            # no detected segment matched it (reference: a recovered line
            # counts as a tracked match, src/Tracking.cc:2299-2309).
            rec_g = np.where(
                (rec_rows >= 0) & rec_inlier,
                lpad[np.maximum(rec_rows, 0)], -1,
            )
            rec_found = rec_g[rec_g >= 0]
            self.vomap.lines.n_found[rec_found] += 1
            self.vomap.lines.n_visible[rec_found] += 1
            self.vomap.lines.last_seen_frame[rec_found] = self.frame_id
            self._last_line_out = (lf, l3d, ln_per_seg)
            # Feed for the next frame's f2f + LK channel. lf.desc may be a
            # lazily-pulled keyframe-only leaf (None here): the DEVICE feed
            # carries the descriptors in that case, and the host copy is
            # only a fallback for device-feed-less paths (_prev_feed_host
            # degrades to an empty feed if both are missing).
            if gray is not None:
                self._prev_line_feed = dict(
                    gray=gray, fid=self.frame_id,
                    p0=np.asarray(lf.p0), p1=np.asarray(lf.p1),
                    desc=(np.asarray(lf.desc)
                          if lf.desc is not None else None),
                    valid=np.asarray(lf.valid),
                    gid=ln_per_seg.copy(),
                    dev=feed_dev if feed_dev else None,
                )

        self._last_plane_out = None
        if plane_out is not None:
            seg, p_map_idx, p_kind, p_inlier = plane_out
            self.vomap.planes.last_seen_frame[
                p_map_idx[(p_kind == 0) & p_inlier]
            ] = self.frame_id
            self._last_plane_out = (seg, p_map_idx, p_kind, p_inlier)
            # Coefficient refinement from every matched observation
            # (reference: UpdateCoefficientsAndPoints per matched frame
            # plane in the tracking loop, src/Tracking.cc:795-800).
            upd = (
                np.asarray(seg.valid) & (p_kind == 0) & p_inlier & (p_map_idx >= 0)
            )
            if upd.any() and np.isfinite(T_new).all():
                T_wc = np.linalg.inv(T_new)
                R, tw = T_wc[:3, :3], T_wc[:3, 3]
                mu_c = np.asarray(seg.centroids)[upd]
                cov_c = np.asarray(seg.covs)[upd]
                self.vomap.update_plane_coefficients(
                    p_map_idx[upd],
                    (mu_c @ R.T + tw).astype(np.float64),
                    np.einsum("ab,nbc,dc->nad", R, cov_c, R),
                    np.asarray(seg.counts)[upd],
                )

        self._last_axes = manh_out  # (axes_c (3,3), sup (3,)) or None

        ok = n_in >= self.cfg.tracking.min_matches_track and np.isfinite(T_new).all()
        # A sudden match collapse (>75% drop vs the previous frame) means the
        # solution jumped basins even if the absolute count clears the gate —
        # fail over to the recovery chain instead of accepting it.
        if ok and self._last_n_matches > 0 and n_in < 0.25 * self._last_n_matches:
            ok = False
        if ok:
            self._last_n_matches = n_in
        if self.viz_enabled:
            # Zero-copy reference swap for the live viewer's frame overlay
            # (reference: FrameDrawer::Update copies the current image +
            # tracked-feature flags under a mutex, src/FrameDrawer.cc:247).
            feats = self._materialize_feats(feats)
            self._last_viz_kp = (
                np.asarray(feats.uv), pt_per_kp >= 0, np.asarray(feats.valid),
            )
        return ok, T_new.astype(np.float32), pt_per_kp, n_in, feats

    def _track_reference_kf(self, feats: FrameFeatures):
        """Window-free descriptor matching vs the newest keyframe, solved by
        3D-3D RANSAC (reference: TrackReferenceKeyFrame, src/Tracking.cc:1831
        uses SearchByBoW + pose optimization). Returns a pose estimate or
        None."""
        k = self.vomap.newest_kf_slot
        if k < 0:
            return None
        kf = self.vomap.keyframes
        idx_b, mok = matcher.match_descriptors_mutual(
            feats.desc, feats.valid,
            jnp.asarray(kf.desc[k]), jnp.asarray(kf.obs_valid[k]),
        )
        idx_b, mok = np.asarray(idx_b), np.asarray(mok)
        depth_np = np.asarray(feats.depth)
        pid = kf.point_id[k][idx_b]
        good = (
            mok & (pid >= 0)
            & self.vomap.points.valid[np.maximum(pid, 0)]
            & (depth_np > 1e-3)
        )
        if good.sum() < 15:
            return None
        Xa = self.vomap.points.X_w[np.maximum(pid, 0)]
        X_c = np.array(
            camera_ops.unproject(
                self.cfg.camera, feats.uv, jnp.asarray(np.maximum(depth_np, 1e-3))
            )
        )
        res = ransac_rigid_3d3d(
            jnp.asarray(Xa), jnp.asarray(X_c), jnp.asarray(good),
            jnp.asarray(np.uint32(self.frame_id)),
        )
        if bool(res.ok):
            return np.linalg.inv(np.asarray(res.T_ab)).astype(np.float32)
        return None

    def _relocalize(self, gray: jnp.ndarray, depth: jnp.ndarray):
        """BoW candidate retrieval + 3D-3D RANSAC pose recovery.

        (reference: Tracking::Relocalization src/Tracking.cc:3760 —
        KeyFrameDatabase candidates, SearchByBoW per candidate, EPnP RANSAC,
        pose refinement. RGB-D depth lets a 3-point Kabsch RANSAC replace
        EPnP; the subsequent `_track_local_map` plays the refinement role.)
        """
        if gray.dtype == jnp.uint8:
            gray = gray.astype(jnp.float32)
        if depth.shape[0] != gray.shape[0]:
            # Any upload stride (see TrackingConfig.depth_upload_stride):
            # nearest-upsample back to the gray resolution on device.
            depth = _depth_full_jit(
                depth, height=int(gray.shape[0]), width=int(gray.shape[1])
            )
        elif depth.dtype == jnp.uint16:
            depth = depth.astype(jnp.float32) * 1e-3
        feats = extract_frame_jit(gray, depth, self.cfg)
        words = compute_words(feats.desc)
        hist = np.asarray(bow_histogram(words, feats.valid))
        cands, _ = self.kf_db.query(hist, top_k=5)
        if len(cands) == 0:
            return None
        depth_np = np.asarray(feats.depth)
        uv_np = np.asarray(feats.uv)
        kf = self.vomap.keyframes
        X_c_all = np.array(
            camera_ops.unproject(
                self.cfg.camera, feats.uv, jnp.asarray(np.maximum(depth_np, 1e-3))
            )
        )
        for k in cands:
            idx_b, mok = matcher.match_descriptors_mutual(
                feats.desc, feats.valid,
                jnp.asarray(kf.desc[k]), jnp.asarray(kf.obs_valid[k]),
            )
            idx_b, mok = np.asarray(idx_b), np.asarray(mok)
            pid = kf.point_id[k][idx_b]
            matched = mok & (pid >= 0) & self.vomap.points.valid[np.maximum(pid, 0)]
            good = matched & (depth_np > 1e-3)
            Xa = self.vomap.points.X_w[np.maximum(pid, 0)]  # world
            if good.sum() >= 15:
                res = ransac_rigid_3d3d(
                    jnp.asarray(Xa), jnp.asarray(X_c_all), jnp.asarray(good),
                    jnp.asarray(np.uint32(self.frame_id)),
                )
                if bool(res.ok):
                    T_wc = np.asarray(res.T_ab)
                    return np.linalg.inv(T_wc).astype(np.float32)
            if matched.sum() >= 15:
                # Depth-free fallback: 2D-3D PnP RANSAC (the reference's
                # EPnP relocalization path, src/Tracking.cc:3805).
                from ..solve.pnp import pnp_ransac

                res = pnp_ransac(
                    jnp.asarray(Xa), feats.uv, jnp.asarray(matched),
                    self.cfg.camera, jnp.asarray(np.uint32(self.frame_id)),
                    T_init=jnp.asarray(kf.T_cw[k]),
                )
                if bool(res.ok):
                    return np.asarray(res.T_cw).astype(np.float32)
        return None

    def _try_coarse_manhattan(self, depth: jnp.ndarray) -> None:
        """One-shot world Manhattan axes from the frame's normals (+ line
        directions when available) (reference: Tracking::ExtractCoarseManhAx,
        src/Tracking.cc:533-585; retried per frame until success :644-650)."""
        if depth.shape[0] != self.cfg.camera.height:
            depth = _depth_full_jit(
                depth,
                height=int(self.cfg.camera.height),
                width=int(self.cfg.camera.width),
            )
        elif depth.dtype == jnp.uint16:
            depth = depth.astype(jnp.float32) * 1e-3
        normals, ok = plane_ops.compute_normals(depth, self.cfg.camera, stride=8)
        d = np.asarray(normals)[np.asarray(ok)]
        line_dirs_np = None
        if self._last_line_out is not None:
            lf, l3d, _ = self._last_line_out
            v3 = np.asarray(l3d.valid)
            if v3.any():
                ld = np.asarray(l3d.X1_c)[v3] - np.asarray(l3d.X0_c)[v3]
                ld /= np.linalg.norm(ld, axis=1, keepdims=True) + 1e-9
                line_dirs_np = ld
                d = np.concatenate([d, ld.astype(d.dtype)])
            # Vanishing-point directions contribute depth-free structure
            # (reference seeds Manhattan from line VPs, Frame.cc:330-337 +
            # Tracking's mVF3DLines path) — each VP repeated to carry weight.
            from ..ops import vp as vp_ops

            vpr = vp_ops.estimate_vps(
                self.cfg.camera, jnp.asarray(lf.p0), jnp.asarray(lf.p1),
                jnp.asarray(lf.valid),
            )
            if bool(vpr.ok):
                sup = np.asarray(vpr.support)
                vps = np.asarray(vpr.vps)
                reps = np.repeat(vps, np.clip(sup, 0, 20), axis=0)
                if len(reps):
                    d = np.concatenate([d, reps.astype(d.dtype)])
        if len(d) < 100:
            return
        sub = d[:: max(len(d) // 1500, 1)].astype(np.float32)
        # Fixed-size padding: a data-dependent length would recompile the
        # jitted hypothesis search on every retry.
        CAP = 1536
        w = np.zeros((CAP,), np.float32)
        w[: min(len(sub), CAP)] = 1.0
        buf = np.zeros((CAP, 3), np.float32)
        buf[: min(len(sub), CAP)] = sub[:CAP]
        rng = np.random.RandomState(self.frame_id + 1)
        idx = rng.randint(0, max(min(len(sub), CAP), 1), size=(24, 2))
        pairs = buf[idx]
        # Deterministic plane-pair seed ahead of the random hypotheses
        # (reference: Map::FindManhattan picks the best perpendicular plane
        # pair — else plane + perpendicular line — to seed the initial
        # Manhattan rotation, src/Map.cc:150-394, called at init from
        # src/Tracking.cc:658; here mean-shift refinement + the support-rate
        # gate of coarse_manhattan_init validate the seed instead of the
        # follow-up TrackManhattanFrame call). Fixed hypothesis count: the
        # seed replaces the first random pair rather than growing the batch.
        if self._last_plane_out is not None:
            seg = self._last_plane_out[0]
            seed = manh_ops.plane_seed_pair(
                np.asarray(seg.planes)[:, :3],
                np.asarray(seg.counts),
                np.asarray(seg.valid),
                line_dirs=line_dirs_np,
                ver_th=self.cfg.planes.vertical_threshold,
            )
            if seed is not None:
                pairs[0] = seed
        R_cm, rate = manh_ops.coarse_manhattan_init(
            jnp.asarray(buf), jnp.asarray(w), jnp.asarray(pairs),
            cone=self.cfg.manhattan.normal_cone,
        )
        if float(rate) > self.cfg.manhattan.coarse_success_rate:
            R_wc = np.linalg.inv(self.T_cw)[:3, :3]
            self.R_wm = (R_wc @ np.asarray(R_cm)).astype(np.float32)
            self.manh_valid = True
            self.mapper.R_wm = self.R_wm
            self.mapper.manh_valid = True

    def _need_new_keyframe(self, n_matches: int, feats=None, pt_per_kp=None) -> bool:
        """(reference: Tracking::NeedNewKeyFrame, src/Tracking.cc:2923 —
        frame-gap rule, tracked-ratio rule vs the reference keyframe, and the
        RGB-D close-points condition `bNeedToInsertClose`
        src/Tracking.cc:2966-2985)."""
        since = self.frame_id - self.last_kf_frame
        if since < max(self.cfg.tracking.min_frames_between_kf, 1):
            return False
        if since >= self.cfg.tracking.max_frames_between_kf:
            return True
        ratio_low = n_matches < 0.75 * max(self.n_matches_ref_kf, 1)
        need_close = False
        if feats is not None and pt_per_kp is not None:
            # Close = within the stereo-reliable depth band (bf*ThDepth/fx).
            th_m = self.cfg.camera.bf * self.cfg.tracking.th_depth / self.cfg.camera.fx
            depth = np.asarray(feats.depth)
            valid = np.asarray(feats.valid)
            close = valid & (depth > 1e-3) & (depth < th_m)
            tracked_close = int((close & (pt_per_kp >= 0)).sum())
            untracked_close = int((close & (pt_per_kp < 0)).sum())
            need_close = tracked_close < 100 and untracked_close > 70
        # Absolute coverage floor: matches decaying regardless of the ratio
        # means the local map no longer covers the view.
        coverage_low = n_matches < self.cfg.tracking.min_coverage_kf
        return (ratio_low or need_close or coverage_low) and n_matches > 15

    def _create_keyframe(self, feats: FrameFeatures, pt_per_kp: np.ndarray):
        """Insert a keyframe; unmatched keypoints with depth become new map
        points (reference: Tracking::CreateNewKeyFrame, src/Tracking.cc:3032)."""
        # Capacity pressure: the reference map is unbounded; the fixed tables
        # here evict the least-covisible old keyframe when full so long
        # sequences keep running (culling normally frees slots first).
        if self.vomap.kf_capacity_left() == 0:
            victim = self.vomap.weakest_kf()
            if victim >= 0:
                self._reanchor_trajectory([victim])
                self.vomap.release_keyframe(victim)
                self.kf_db.erase(victim)
        t0 = time.perf_counter()
        uv = np.asarray(feats.uv)
        depth = np.asarray(feats.depth)
        desc = np.asarray(feats.desc)
        octave = np.asarray(feats.octave)
        valid = np.asarray(feats.valid)
        obs = np.asarray(feats.obs)
        self._stage("kf_pull_feats", time.perf_counter() - t0)
        t0 = time.perf_counter()

        new_mask = valid & (depth > 1e-3) & (pt_per_kp < 0)
        idx = np.nonzero(new_mask)[0]
        if len(idx):
            # Host numpy (a jnp call here would recompile per keyframe:
            # idx length is data-dependent).
            cam = self.cfg.camera
            d_i = depth[idx]
            X_c = np.stack(
                [
                    (uv[idx, 0] - cam.cx) / cam.fx * d_i,
                    (uv[idx, 1] - cam.cy) / cam.fy * d_i,
                    d_i,
                ],
                axis=1,
            )
            T_wc = np.linalg.inv(self.T_cw)
            X_w = (T_wc[:3, :3] @ X_c.T).T + T_wc[:3, 3]
            cam_center = T_wc[:3, 3]
            normal = X_w - cam_center
            normal /= np.linalg.norm(normal, axis=1, keepdims=True) + 1e-9
            ids = self.vomap.add_points(
                X_w.astype(np.float32), desc[idx], normal.astype(np.float32),
                octave[idx], self.frame_id,
                angle=np.asarray(feats.angle)[idx],
            )
            pt_per_kp = pt_per_kp.copy()
            created = ids >= 0
            pt_per_kp[idx[created]] = ids[created]

        obs_valid = valid & (pt_per_kp >= 0)
        axes_c = axes_sup = None
        if self._last_axes is not None:
            axes_c = np.asarray(self._last_axes[0], np.float32)
            axes_sup = np.asarray(self._last_axes[1], np.int32)
        kf_slot = self.vomap.add_keyframe(
            self.T_cw, self.frame_id, pt_per_kp.astype(np.int32),
            obs, octave, desc, obs_valid,
            axes_c=axes_c, axes_sup=axes_sup, kp_valid=valid,
        )
        self._stage("kf_points_add", time.perf_counter() - t0)
        # Appearance index for relocalization (reference: KeyFrameDatabase::add).
        # Words normally arrive with the fused-step result; the init path
        # (extract_frame_jit, no fused step) computes them here.
        t0 = time.perf_counter()
        if self._last_words is not None and self._last_words[0] == self.frame_id:
            words = self._last_words[1]
        else:
            words = np.asarray(compute_words(jnp.asarray(np.asarray(feats.desc))))
        self.kf_db.add(kf_slot, bow_histogram_np(words, valid))
        self._stage("kf_bow", time.perf_counter() - t0)

        t0 = time.perf_counter()
        if self.cfg.use_lines and self._last_line_out is not None:
            lf, l3d, ln_per_seg = self._last_line_out
            lvalid = np.asarray(lf.valid)
            v3d = np.asarray(l3d.valid)
            # Host-side line coefficients: lf.line2d is a jnp property — on
            # host-numpy endpoints it would run an eager device round-trip
            # (~85 ms over the tunnel) per keyframe.
            p0_np = np.asarray(lf.p0)
            p1_np = np.asarray(lf.p1)
            d_np = p1_np - p0_np
            n_np = np.stack([-d_np[:, 1], d_np[:, 0]], axis=1)
            n_np = n_np / (np.linalg.norm(n_np, axis=1, keepdims=True) + 1e-9)
            line2d = np.concatenate(
                [n_np, -np.sum(n_np * p0_np, axis=1, keepdims=True)], axis=1
            ).astype(np.float32)
            ldesc = np.asarray(lf.desc)
            ln_per_seg = np.asarray(ln_per_seg).copy()
            new_mask = lvalid & v3d & (ln_per_seg < 0)
            lidx = np.nonzero(new_mask)[0]
            if len(lidx):
                T_wc = np.linalg.inv(self.T_cw)
                X0c = np.asarray(l3d.X0_c)[lidx]
                X1c = np.asarray(l3d.X1_c)[lidx]
                X0w = (T_wc[:3, :3] @ X0c.T).T + T_wc[:3, 3]
                X1w = (T_wc[:3, :3] @ X1c.T).T + T_wc[:3, 3]
                lids = self.vomap.add_lines(
                    X0w.astype(np.float32), X1w.astype(np.float32),
                    ldesc[lidx], self.frame_id, first_kf=kf_slot,
                )
                created = lids >= 0
                ln_per_seg[lidx[created]] = lids[created]
                if self.manh_valid and created.any():
                    # Tag new lines with their Manhattan axis (reference:
                    # Manhattan::LineManhAxisCorresp, src/Manhattan.cpp:1139).
                    dw = X1w[created] - X0w[created]
                    dw /= np.linalg.norm(dw, axis=1, keepdims=True) + 1e-9
                    cosang = np.abs(dw @ self.R_wm)  # (n, 3)
                    best = cosang.argmax(axis=1)
                    ok_ax = cosang.max(axis=1) > np.cos(
                        self.cfg.manhattan.line_cone
                    )
                    midx = np.where(ok_ax, best, -1).astype(np.int32)
                    self.vomap.lines.manh_idx[lids[created]] = midx
            l_obs_valid = lvalid & (ln_per_seg >= 0)
            self.vomap.add_kf_line_obs(
                kf_slot, ln_per_seg.astype(np.int32), line2d, l_obs_valid,
                p0=p0_np, p1=p1_np,
                desc=ldesc, seg_valid=lvalid,
            )
            self.vomap.cull_lines(self.frame_id)
            # Newly created map lines become inheritable by the next
            # frame's f2f channel.
            if (
                self._prev_line_feed is not None
                and self._prev_line_feed.get("fid") == self.frame_id
            ):
                self._prev_line_feed["gid"] = ln_per_seg.astype(np.int32).copy()
        self._stage("kf_lines_add", time.perf_counter() - t0)
        t0 = time.perf_counter()

        # Fine Manhattan initialization: Levenberg-Marquardt over three free
        # axis vectors against the accumulated map-line directions, a few
        # keyframes after the coarse estimate (reference: MultiViewManhInit,
        # src/Optimizer.cc:3942-4338 — 3 marginalized axis vertices +
        # par/perp angle edges over the keyframes' line observations, SVD
        # orthonormalized; triggered 4 KFs after coarse init,
        # src/LocalMapping.cc:100-110). Each line weights by its observation
        # count, the multi-frame analog of per-KF edges.
        # Resolve a fine init dispatched at an earlier keyframe: by now the
        # async host copy has landed, so the pull is free (dispatching and
        # pulling in the same call would stall ~40 ms on the transport).
        if self._manh_fine_pending is not None:
            R_new = np.asarray(self._manh_fine_pending)
            self._manh_fine_pending = None
            if np.isfinite(R_new).all():
                self.R_wm = R_new.astype(np.float32)
                self.mapper.R_wm = self.R_wm
                self._manh_fine_done = True
        if (
            self.cfg.use_manhattan
            and self.manh_valid
            and not self._manh_fine_done
            and self.vomap.n_keyframes() >= 4
        ):
            lt = self.vomap.lines
            lv = lt.valid & (lt.manh_idx >= 0)
            if lv.sum() >= 12:
                dw = lt.X1_w[lv] - lt.X0_w[lv]
                dw = (dw / (np.linalg.norm(dw, axis=1, keepdims=True) + 1e-9)).astype(np.float32)
                CAP = 1024  # fixed shape: avoid per-call recompilation
                buf = np.zeros((CAP, 3), np.float32)
                n = min(len(dw), CAP)
                buf[:n] = dw[:n]
                wgt = np.zeros((CAP,), np.float32)
                wgt[:n] = np.minimum(
                    lt.n_obs[lv][:n].astype(np.float32), 8.0
                ).clip(1.0)
                aidx = np.full((CAP,), -1, np.int32)
                aidx[:n] = lt.manh_idx[lv][:n]
                R_dev, _cost = manh_ops.multiview_manh_init(
                    jnp.asarray(self.R_wm), jnp.asarray(buf), jnp.asarray(wgt),
                    jnp.asarray(aidx),
                )
                if hasattr(R_dev, "copy_to_host_async"):
                    R_dev.copy_to_host_async()
                self._manh_fine_pending = R_dev

        self._stage("kf_manh_fine", time.perf_counter() - t0)
        t0 = time.perf_counter()
        if self.cfg.use_planes and self._last_plane_out is not None:
            seg, p_map_idx, p_kind, p_inlier = self._last_plane_out
            pvalid = np.asarray(seg.valid)
            pi_obs = np.asarray(seg.planes)
            cent_c = np.asarray(seg.centroids)
            counts = np.asarray(seg.counts)
            plane_id = np.where(
                pvalid & (p_kind == 0) & p_inlier, p_map_idx, -1
            ).astype(np.int32)
            new_mask = pvalid & (plane_id < 0) & (p_kind != 1) & (p_kind != 2)
            pidx = np.nonzero(new_mask)[0]
            if len(pidx):
                # Transform observation to world: n_w = R_wc n_c,
                # d_w = d_c + n_c . t_cw  (from n_c^T(R X_w + t) + d_c = 0).
                R_cw = self.T_cw[:3, :3]
                t_cw = self.T_cw[:3, 3]
                n_w = pi_obs[pidx, :3] @ R_cw
                d_w = pi_obs[pidx, 3] + pi_obs[pidx, :3] @ t_cw
                pi_w = np.concatenate([n_w, d_w[:, None]], axis=1).astype(np.float32)
                T_wc = np.linalg.inv(self.T_cw)
                c_w = (T_wc[:3, :3] @ cent_c[pidx].T).T + T_wc[:3, 3]
                cov_w = np.einsum(
                    "ab,nbc,dc->nad", T_wc[:3, :3], np.asarray(seg.covs)[pidx],
                    T_wc[:3, :3],
                )
                pids = self.vomap.add_planes(
                    pi_w, c_w.astype(np.float32), counts[pidx], self.frame_id,
                    cov_w=cov_w, first_kf=kf_slot,
                )
                created = pids >= 0
                plane_id[pidx[created]] = pids[created]
            p_obs_valid = pvalid & (plane_id >= 0)
            self.vomap.add_kf_plane_obs(kf_slot, plane_id, pi_obs, p_obs_valid)
            self.vomap.merge_planes()

        self._stage("kf_planes_add", time.perf_counter() - t0)
        t0 = time.perf_counter()
        self.last_kf_frame = self.frame_id
        self.n_matches_ref_kf = int(obs_valid.sum())
        self.vomap.cull_points(self.frame_id)
        self._stage("kf_cull_points", time.perf_counter() - t0)
