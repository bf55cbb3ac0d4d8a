"""Loop closing: detection, geometric verification, pose-graph correction.

The reference ships this pipeline compiled but dormant (reference:
src/LoopClosing.cc:57-101 — the work loop is commented out). Here it is
active: BoW candidates from the keyframe database (excluding the recent
covisible window, reference: DetectLoop src/LoopClosing.cc:105), geometric
verification by mutual descriptor matching + 3D-3D Kabsch RANSAC (the
reference's RGB-D Sim3 with fixed scale, src/LoopClosing.cc:233), and an
SE(3) pose-graph optimization over odometry + loop edges
(OptimizeEssentialGraph, src/Optimizer.cc:4339), after which landmarks are
corrected with their reference keyframe (CorrectLoop, src/LoopClosing.cc:404).
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
    min_gap_kfs: int = 15  # candidate must be this many KFs older
    min_score: float = 0.12
    min_inliers: int = 40
    n_loops_closed: int = 0
    last_loop_kf: int = -100

    def detect_and_close(self, tracker) -> bool:
        """Try to close a loop at the newest keyframe. Returns True if a
        loop was found and the map was corrected."""
        vm = self.vomap
        cur = vm.next_kf_slot - 1
        if cur < self.min_gap_kfs or cur - self.last_loop_kf < 10:
            return False
        hist = tracker.kf_db.hists[cur]
        scores = 1.0 - 0.5 * np.abs(tracker.kf_db.hists - hist[None, :]).sum(axis=1)
        scores[~tracker.kf_db.valid] = -1
        # Exclude the recent window (covisible region).
        scores[max(cur - self.min_gap_kfs, 0) :] = -1
        cand = int(np.argmax(scores))
        if scores[cand] < self.min_score:
            return False

        # Geometric verification: match current KF's observed points vs the
        # candidate's, RANSAC the relative camera transform.
        kf = vm.keyframes
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

        # Pose graph: odometry edges between consecutive valid KFs (from
        # current estimates) + the loop edge; oldest KF fixed.
        kf_ids = np.nonzero(kf.valid)[0]
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

        # Correct landmarks with their first-observing keyframe's correction
        # (reference: CorrectLoop transforms MapPoints with their ref KF).
        corrections = {
            int(s): T_new[i] @ np.linalg.inv(T[i]) for i, s in enumerate(kf_ids)
        }  # maps old cam frame -> new cam frame... applied in world:
        # X_new = inv(T_new) @ T_old @ X_old per owning KF.
        pt = vm.points
        own = pt.first_kf.copy()
        for s in kf_ids:
            sel = pt.valid & (own == s)
            if not sel.any():
                continue
            i = slot_of[int(s)]
            M = np.linalg.inv(T_new[i]) @ T[i]
            pt.X_w[sel] = (M[:3, :3] @ pt.X_w[sel].T).T + M[:3, 3]
        kf.T_cw[kf_ids] = T_new
        self.n_loops_closed += 1
        self.last_loop_kf = cur
        return True
