"""Loop closing: detection, geometric verification, pose-graph correction.

The reference ships this pipeline compiled but dormant (reference:
src/LoopClosing.cc:57-101 — the work loop is commented out). Here it is
active: BoW candidates from the keyframe database with the covisible region
excluded by co-observation (reference: DetectLoop consults
GetConnectedKeyFrames, src/LoopClosing.cc:123-130), a consecutive-detection
consistency gate (the reference requires candidate covisibility groups to be
re-detected over consecutive keyframes, mnCovisibilityConsistencyTh,
src/LoopClosing.cc:160-208), geometric verification by mutual descriptor
matching + 3D-3D Kabsch RANSAC (the reference's RGB-D Sim3 with fixed scale,
src/LoopClosing.cc:233), an SE(3) pose-graph optimization over odometry +
loop edges (OptimizeEssentialGraph, src/Optimizer.cc:4339), and a full
landmark correction: points, line endpoints, and plane coefficients/moments
all transform with their owning keyframe's correction, followed by a
duplicate-landmark fuse (reference: CorrectLoop transforms every landmark
type with its reference KF then runs SearchAndFuse,
src/LoopClosing.cc:404-560).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import VOConfig
from ..geometry import se3 as se3_ops
from ..solve.pose_graph import PoseGraph, optimize_pose_graph
from ..solve.ransac import ransac_rigid_3d3d
from ..vomap.map import VOMap


@dataclass
class LoopCloser:
    cfg: VOConfig
    vomap: VOMap
    min_gap_kfs: int = 15  # candidate must be this many KFs older (by order)
    min_score: float = 0.12
    min_inliers: int = 40
    # Consecutive-keyframe consistency requirement before geometric
    # verification (reference: mnCovisibilityConsistencyTh = 3 covisibility
    # groups, src/LoopClosing.cc:105-208; 2 here — detections are per-KF and
    # the RANSAC + pose-graph residual still gate geometry).
    consistency_th: int = 2
    # Full-map BA after an accepted closure (reference: CorrectLoop launches
    # RunGlobalBundleAdjustment, src/LoopClosing.cc:580-581); the matrix-free
    # CG-Schur GBA (solve/global_ba.py) runs synchronously here.
    run_gba: bool = True
    n_loops_closed: int = 0
    last_loop_order: int = -100
    _consistent_group: set = field(default_factory=set)
    _consistency_count: int = 0

    def _detect_candidate(self, tracker, cur: int) -> Optional[int]:
        """BoW candidate outside the covisible region + consistency gate."""
        vm = self.vomap
        kf = vm.keyframes
        order = vm.kf_slots_by_order()
        pos_of = {int(s): i for i, s in enumerate(order)}
        cur_pos = pos_of[cur]
        hist = tracker.kf_db.hists[cur]
        scores = 1.0 - 0.5 * np.abs(tracker.kf_db.hists - hist[None, :]).sum(axis=1)
        scores[~tracker.kf_db.valid] = -1.0
        scores[~kf.valid] = -1.0
        # Exclude by co-observation (covisible KFs share the very points a
        # loop would re-find) AND by temporal proximity in insertion order.
        covis = vm.covisible_kfs(cur, min_weight=1, cap=0)
        scores[covis] = -1.0
        near = np.abs(kf.order[order] - kf.order[cur]) < self.min_gap_kfs
        scores[order[near]] = -1.0
        cand = int(np.argmax(scores))
        if scores[cand] < self.min_score:
            self._consistency_count = 0
            self._consistent_group = set()
            return None
        # Consistency: the candidate region (candidate + its covisible
        # group) must recur over consecutive keyframe insertions.
        group = set(vm.covisible_kfs(cand, min_weight=1, cap=0).tolist())
        group.add(cand)
        if group & self._consistent_group:
            self._consistency_count += 1
        else:
            self._consistency_count = 1
        self._consistent_group = group
        if self._consistency_count < self.consistency_th:
            return None
        return cand

    def detect_and_close(self, tracker) -> bool:
        """Try to close a loop at the newest keyframe. Returns True if a
        loop was found and the map was corrected."""
        vm = self.vomap
        cur = vm.newest_kf_slot
        kf = vm.keyframes
        if cur < 0 or vm.n_keyframes() < self.min_gap_kfs:
            return False
        if kf.order[cur] - self.last_loop_order < 10:
            return False
        cand = self._detect_candidate(tracker, cur)
        if cand is None:
            return False

        # Geometric verification: match current KF's observed points vs the
        # candidate's, RANSAC the relative camera transform.
        from ..tracking import matcher

        idx_b, mok = matcher.match_descriptors_mutual(
            jnp.asarray(kf.desc[cur]), jnp.asarray(kf.obs_valid[cur]),
            jnp.asarray(kf.desc[cand]), jnp.asarray(kf.obs_valid[cand]),
        )
        idx_b, mok = np.asarray(idx_b), np.asarray(mok)
        pid_cur = kf.point_id[cur]
        pid_cand = kf.point_id[cand][idx_b]
        good = (
            mok
            & (pid_cur >= 0) & (pid_cand >= 0)
            & vm.points.valid[np.maximum(pid_cur, 0)]
            & vm.points.valid[np.maximum(pid_cand, 0)]
        )
        if good.sum() < self.min_inliers:
            return False
        # Express each side's landmark in its own keyframe camera frame:
        # current-KF camera points vs candidate-KF camera points.
        X_cur_w = vm.points.X_w[np.maximum(pid_cur, 0)]
        X_cand_w = vm.points.X_w[np.maximum(pid_cand, 0)]
        T_cur = kf.T_cw[cur]
        T_cand = kf.T_cw[cand]
        Xb = (T_cur[:3, :3] @ X_cur_w.T).T + T_cur[:3, 3]  # current cam frame
        Xa = (T_cand[:3, :3] @ X_cand_w.T).T + T_cand[:3, 3]  # candidate cam
        res = ransac_rigid_3d3d(
            jnp.asarray(Xa.astype(np.float32)),
            jnp.asarray(Xb.astype(np.float32)),
            jnp.asarray(good),
            jnp.uint32(cur),
            inlier_th=0.08,
            min_inliers=self.min_inliers,
        )
        if not bool(res.ok):
            return False
        T_cand_cur = np.asarray(res.T_ab)  # candidate-cam <- current-cam

        # Pose graph: odometry edges between order-consecutive valid KFs
        # (from current estimates) + the loop edge; oldest KF fixed.
        kf_ids = vm.kf_slots_by_order()
        K = len(kf_ids)
        slot_of = {int(s): i for i, s in enumerate(kf_ids)}
        T = kf.T_cw[kf_ids].astype(np.float32)
        e_i, e_j, e_T, e_w = [], [], [], []
        for a, b in zip(kf_ids[:-1], kf_ids[1:]):
            i, j = slot_of[int(a)], slot_of[int(b)]
            e_i.append(i)
            e_j.append(j)
            e_T.append(T[i] @ np.linalg.inv(T[j]))
            e_w.append(1.0)
        # Loop edge: T_cand @ inv(T_cur_corrected) = T_cand_cur
        i, j = slot_of[cand], slot_of[cur]
        e_i.append(i)
        e_j.append(j)
        e_T.append(T_cand_cur)
        e_w.append(2.0)

        # Fixed-capacity padding: a data-dependent graph size would recompile
        # the jitted optimizer on every closure. Padding poses are fixed
        # (free=False) identities; padding edges carry zero weight.
        K_CAP = 1 << max(int(np.ceil(np.log2(max(K, 2)))), 4)
        E_CAP = 2 * K_CAP
        E = len(e_i)
        if K > K_CAP or E > E_CAP:
            return False
        T_pad = np.tile(np.eye(4, dtype=np.float32), (K_CAP, 1, 1))
        T_pad[:K] = T
        free = np.zeros((K_CAP,), bool)
        free[1:K] = True
        ei = np.zeros((E_CAP,), np.int32)
        ej = np.zeros((E_CAP,), np.int32)
        eT = np.tile(np.eye(4, dtype=np.float32), (E_CAP, 1, 1))
        ew = np.zeros((E_CAP,), np.float32)
        ei[:E] = e_i
        ej[:E] = e_j
        eT[:E] = np.stack(e_T)
        ew[:E] = e_w
        pg = PoseGraph(
            T_cw=jnp.asarray(T_pad),
            free=jnp.asarray(free),
            e_i=jnp.asarray(ei),
            e_j=jnp.asarray(ej),
            e_Tij=jnp.asarray(eT),
            e_weight=jnp.asarray(ew),
        )
        T_new = np.asarray(optimize_pose_graph(pg))[:K]
        if not np.isfinite(T_new).all():
            return False

        self._correct_landmarks(kf_ids, T, T_new)
        kf.T_cw[kf_ids] = T_new
        self.n_loops_closed += 1
        self.last_loop_order = int(kf.order[cur])
        self._consistency_count = 0
        self._consistent_group = set()
        # Post-loop fuse: the corrected sides of the loop now overlap —
        # merge duplicated points and planes (reference: SearchAndFuse,
        # src/LoopClosing.cc:560).
        if tracker is not None and hasattr(tracker, "mapper"):
            tracker.mapper.fuse_points()
            vm.merge_planes()
            tracker.invalidate_map_snapshot()
        if self.run_gba:
            from ..solve.global_ba import run_global_ba

            # Gauge = the loop (candidate-side) keyframe: the freshly
            # verified region anchors the map (reference fixes the origin
            # KF + loop KF in its GBA, src/Optimizer.cc:280-296).
            run_global_ba(vm, self.cfg.camera, gauge_kf=int(cand))
            if tracker is not None and hasattr(tracker, "invalidate_map_snapshot"):
                tracker.invalidate_map_snapshot()
        return True

    def _correct_landmarks(
        self, kf_ids: np.ndarray, T_old: np.ndarray, T_new: np.ndarray
    ) -> None:
        """Apply each keyframe's pose correction to every landmark it owns:
        points, line endpoints, and plane coefficients + accumulated moments
        (reference: CorrectLoop transforms MapPoints/MapLines/MapPlanes with
        their reference KF, src/LoopClosing.cc:439-474).

        The world-frame correction of owner i is
        ``M = inv(T_new[i]) @ T_old[i]`` (old world -> corrected world).
        Planes transform covariantly: n' = R n, d' = d - n' . t; the running
        moments transform as a rigid pushforward so later coefficient refits
        stay consistent.
        """
        vm = self.vomap
        pt, ln, pl = vm.points, vm.lines, vm.planes
        slot_of = {int(s): i for i, s in enumerate(kf_ids)}
        for s in kf_ids:
            i = slot_of[int(s)]
            M = np.linalg.inv(T_new[i]) @ T_old[i]
            if np.allclose(M, np.eye(4), atol=1e-9):
                continue
            R, t = M[:3, :3], M[:3, 3]
            sel = pt.valid & (pt.first_kf == s)
            if sel.any():
                pt.X_w[sel] = (R @ pt.X_w[sel].T).T + t
            lsel = ln.valid & (ln.first_kf == s)
            if lsel.any():
                ln.X0_w[lsel] = (R @ ln.X0_w[lsel].T).T + t
                ln.X1_w[lsel] = (R @ ln.X1_w[lsel].T).T + t
            psel = pl.valid & (pl.first_kf == s)
            if psel.any():
                n_new = pl.pi_w[psel, :3] @ R.T
                pl.pi_w[psel, 3] = pl.pi_w[psel, 3] - n_new @ t
                pl.pi_w[psel, :3] = n_new
                pl.centroid_w[psel] = (R @ pl.centroid_w[psel].T).T + t
                Rd, td = R.astype(np.float64), t.astype(np.float64)
                m_sum = pl.m_sum[psel]
                m_w = pl.m_w[psel]
                Rs = m_sum @ Rd.T  # (n, 3) = R m_sum
                pl.m_outer[psel] = (
                    np.einsum("ab,nbc,dc->nad", Rd, pl.m_outer[psel], Rd)
                    + Rs[:, :, None] * td[None, None, :]
                    + td[None, :, None] * Rs[:, None, :]
                    + m_w[:, None, None] * np.outer(td, td)[None]
                )
                pl.m_sum[psel] = Rs + m_w[:, None] * td[None, :]
