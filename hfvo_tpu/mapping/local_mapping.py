"""Local mapping: builds + runs local BA over the keyframe window.

The reference runs this on a background thread per inserted keyframe
(reference: src/LocalMapping.cc:53-155): process KF, cull landmarks, create
new ones, then `LocalMapOptimization` when the map has >3 KFs. Here the
builder assembles a fixed-capacity `BAProblem` from the flat map tables, the
jitted Schur LM solves it, and write-back updates poses/points and erases
outlier observations (reference: src/Optimizer.cc:3902-3941).

Static shapes: the problem is always (K_CAP keyframes, P cap points, E cap
edges) so the BA kernel compiles once.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VOConfig
from ..solve.ba import BAProblem, local_bundle_adjustment
from ..vomap.map import VOMap


@dataclass
class LocalMapper:
    cfg: VOConfig
    vomap: VOMap
    n_ba_runs: int = 0
    # Number of oldest window keyframes held fixed as the gauge. RGB-D has
    # metric scale, so one fixed pose fully pins the gauge; fixing more
    # over-constrains the window when the frontier poses carry drift.
    n_fixed: int = 1
    # Shard the BA across all visible devices (landmark-block Schur with
    # psum over ICI, parallel/dist_ba.py). Point edges only; line-endpoint
    # edges fall back to the single-device solver.
    use_distributed: bool = False
    _kf_db: object = None  # KeyFrameDatabase for erase-on-cull (set by Tracker)
    # World Manhattan rotation (columns = axes) + validity, mirrored from
    # the Tracker once the Manhattan frame initializes; enables per-KF axis
    # anchors in the BA window.
    R_wm: np.ndarray | None = None
    manh_valid: bool = False

    def run_local_ba(self) -> bool:
        """Optimize the recent keyframe window; returns True if BA ran.

        Gate mirrors the reference (`KeyFramesInMap() > 3`,
        src/LocalMapping.cc:116)."""
        vm = self.vomap
        kf_ids = np.nonzero(vm.keyframes.valid)[0]
        if len(kf_ids) <= 3:
            return False
        cap = self.cfg.cap
        K = cap.local_kfs
        # Window = newest KF + its best-connected covisible neighbors; the
        # fixed frontier = further covisible KFs that share points with the
        # window but are not optimized (reference: LocalMapOptimization
        # builds lLocalKeyFrames from covisibility and lFixedCameras from
        # remaining observers, src/Optimizer.cc:3025-3120). The frontier
        # goes FIRST in the pose array so rows [0, n_fixed) are fixed.
        newest = vm.newest_kf_slot
        free_kfs = vm.local_kf_window(K - self.n_fixed)
        neigh_all = vm.covisible_kfs(newest, min_weight=1, cap=0)
        frontier = np.asarray(
            [s for s in neigh_all if s not in set(free_kfs.tolist())],
            dtype=np.int64,
        )[: max(self.n_fixed, cap.ba_fixed_kfs)]
        if len(frontier) == 0:
            # No covisible frontier (early map): fix the oldest window KF.
            order = np.argsort(vm.keyframes.order[free_kfs], kind="stable")
            free_kfs = free_kfs[order]
            frontier, free_kfs = free_kfs[:1], free_kfs[1:]
        if len(frontier) + len(free_kfs) > K:
            frontier = frontier[: K - len(free_kfs)]
        window = np.concatenate([frontier, free_kfs])
        n_fixed = len(frontier)

        kf = vm.keyframes
        # Gather edges from the window's observation snapshots.
        pid = kf.point_id[window]  # (k, C)
        ov = kf.obs_valid[window] & (pid >= 0) & vm.points.valid[np.maximum(pid, 0)]
        k_idx, c_idx = np.nonzero(ov)
        e_pt_global = pid[k_idx, c_idx]
        e_obs = kf.obs[window][k_idx, c_idx]
        e_oct = kf.octave[window][k_idx, c_idx]
        e_stereo = e_obs[:, 2] > 0

        # Compact point ids.
        upts, e_pt_local = np.unique(e_pt_global, return_inverse=True)
        P = cap.local_points
        E = cap.ba_edges
        if len(upts) > P:
            # Keep the most-observed points (capacity guard; log-free clamp).
            counts = np.bincount(e_pt_local, minlength=len(upts))
            keep = np.argsort(-counts)[:P]
            keep_mask = np.isin(e_pt_local, keep)
            remap = np.full(len(upts), -1, np.int64)
            remap[keep] = np.arange(len(keep))
            k_idx, c_idx = k_idx[keep_mask], c_idx[keep_mask]
            e_pt_local = remap[e_pt_local[keep_mask]]
            e_obs, e_oct, e_stereo = e_obs[keep_mask], e_oct[keep_mask], e_stereo[keep_mask]
            upts = upts[keep]
        if len(k_idx) > E:
            sel = np.random.RandomState(0).choice(len(k_idx), E, replace=False)
            k_idx, c_idx = k_idx[sel], c_idx[sel]
            e_pt_local, e_obs, e_oct, e_stereo = (
                e_pt_local[sel], e_obs[sel], e_oct[sel], e_stereo[sel]
            )

        ne = len(k_idx)
        npt = len(upts)

        def pad(a, n, fill=0):
            out = np.full((n,) + a.shape[1:], fill, a.dtype)
            out[: len(a)] = a
            return out

        T_full = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        T_full[: len(window)] = kf.T_cw[window]
        free = np.zeros((K,), bool)
        free[n_fixed : len(window)] = True

        # Line-endpoint edges: two landmark slots per map line, appended
        # after the point landmarks (reference models endpoints as point
        # vertices, src/Optimizer.cc:3368-3378).
        kl = vm.kf_lines
        lid = kl.line_id[window]
        lov = kl.obs_valid[window] & (lid >= 0) & vm.lines.valid[np.maximum(lid, 0)]
        lk_idx, lc_idx = np.nonzero(lov)
        le_line_global = lid[lk_idx, lc_idx]
        le_line2d = kl.line2d[window][lk_idx, lc_idx]
        ulines, le_line_local = np.unique(le_line_global, return_inverse=True)
        n_line_lm = 2 * len(ulines)
        if npt + n_line_lm > P:
            # Capacity: drop line edges beyond what fits (points take priority).
            max_lines = max((P - npt) // 2, 0)
            keepl = le_line_local < max_lines
            lk_idx, lc_idx = lk_idx[keepl], lc_idx[keepl]
            le_line_local, le_line2d = le_line_local[keepl], le_line2d[keepl]
            ulines = ulines[:max_lines]
        lm_X = np.concatenate(
            [
                vm.points.X_w[upts].astype(np.float32),
                vm.lines.X0_w[ulines].astype(np.float32),
                vm.lines.X1_w[ulines].astype(np.float32),
            ]
        ) if len(ulines) else vm.points.X_w[upts].astype(np.float32)
        n_lm = len(lm_X)
        # Endpoint landmark rows: X0 at npt + i, X1 at npt + len(ulines) + i.
        le_kf = np.concatenate([lk_idx, lk_idx]).astype(np.int32)
        le_lm = np.concatenate(
            [npt + le_line_local, npt + len(ulines) + le_line_local]
        ).astype(np.int32)
        le_l2d = np.concatenate([le_line2d, le_line2d]).astype(np.float32)
        El = self.cfg.cap.ba_edges // 4
        nle = min(len(le_kf), El)
        le_kf, le_lm, le_l2d = le_kf[:nle], le_lm[:nle], le_l2d[:nle]

        # Line-axis parallelism edges: each Manhattan-assigned map line in
        # the window constrains its endpoint pair parallel to its world
        # axis (reference: ParEptsNVector3DSingleFrame per map line,
        # src/Optimizer.cc:3382-3410). The pair rows double as the paired
        # 6-dof landmark blocks in the Schur solve.
        lp_kwargs = {}
        LPC = cap.ba_line_pairs
        if len(ulines) and self.manh_valid and self.cfg.use_manhattan and self.R_wm is not None:
            nl = min(len(ulines), LPC)
            lp_s = np.zeros((LPC,), np.int32)
            lp_e = np.zeros((LPC,), np.int32)
            lp_axis = np.zeros((LPC, 3), np.float32)
            lp_w = np.zeros((LPC,), np.float32)
            lp_valid = np.zeros((LPC,), bool)
            midx = vm.lines.manh_idx[ulines[:nl]]
            lp_s[:nl] = npt + np.arange(nl)
            lp_e[:nl] = npt + len(ulines) + np.arange(nl)
            lp_axis[:nl] = self.R_wm.T[np.maximum(midx, 0)]
            lp_w[:nl] = np.where(midx >= 0, self.cfg.manhattan.line_axis_info, 0.0)
            lp_valid[:nl] = True
            lp_kwargs = dict(
                lp_s=jnp.asarray(lp_s),
                lp_e=jnp.asarray(lp_e),
                lp_axis=jnp.asarray(lp_axis),
                lp_w=jnp.asarray(lp_w),
                lp_valid=jnp.asarray(lp_valid),
            )

        # Cross-line par/perp structural edges (reference: multi-frame
        # par/perp edges from the map lines' par/perp observation maps,
        # include/g2oMSC.h:332-559, added per pair in LocalMapOptimization,
        # src/Optimizer.cc:3327-3587). Pairs discovered from the window's
        # map-line world directions at the frame-level thresholds
        # (3 deg par / 87 deg perp, src/Manhattan.cpp:28-34).
        ll_kwargs = {}
        LQ = cap.ba_line_pair_edges
        if self.cfg.use_lines:
            # Always pass the (possibly all-invalid) fixed-shape tables so
            # the BA program keeps one jit signature across calls.
            ll_sa = np.zeros((LQ,), np.int32)
            ll_ea = np.zeros((LQ,), np.int32)
            ll_sb = np.zeros((LQ,), np.int32)
            ll_eb = np.zeros((LQ,), np.int32)
            ll_kind = np.zeros((LQ,), np.int32)
            ll_w = np.zeros((LQ,), np.float32)
            ll_valid = np.zeros((LQ,), bool)
            ll_kwargs = dict(
                ll_sa=ll_sa, ll_ea=ll_ea, ll_sb=ll_sb, ll_eb=ll_eb,
                ll_kind=ll_kind, ll_w=ll_w, ll_valid=ll_valid,
            )
        if len(ulines) >= 2 and self.cfg.use_lines:
            dirs = vm.lines.X1_w[ulines] - vm.lines.X0_w[ulines]
            dn = np.linalg.norm(dirs, axis=1)
            dirs = dirs / np.maximum(dn, 1e-9)[:, None]
            usable = dn > 1e-3
            C = np.abs(dirs @ dirs.T)
            iu, ju = np.triu_indices(len(ulines), 1)
            ok_pair = usable[iu] & usable[ju]
            cosv = C[iu, ju]
            mc = self.cfg.manhattan
            is_par = ok_pair & (cosv > np.cos(np.radians(mc.par_deg_2d3d)))
            is_perp = ok_pair & (cosv < np.cos(np.radians(mc.perp_deg_2d3d)))
            pi = np.concatenate([iu[is_par], iu[is_perp]])
            pj = np.concatenate([ju[is_par], ju[is_perp]])
            pkind = np.concatenate(
                [np.zeros(int(is_par.sum()), np.int32),
                 np.ones(int(is_perp.sum()), np.int32)]
            )
            if len(pi) > LQ:
                sel = np.random.RandomState(1).choice(len(pi), LQ, replace=False)
                pi, pj, pkind = pi[sel], pj[sel], pkind[sel]
            if len(pi):
                nq = len(pi)
                nu = len(ulines)
                ll_sa[:nq] = npt + pi
                ll_ea[:nq] = npt + nu + pi
                ll_sb[:nq] = npt + pj
                ll_eb[:nq] = npt + nu + pj
                ll_kind[:nq] = pkind
                ll_w[:nq] = mc.line_pair_info
                ll_valid[:nq] = True
        if ll_kwargs:
            ll_kwargs = {k: jnp.asarray(v) for k, v in ll_kwargs.items()}

        # Per-KF Manhattan axis anchors: reprojection-only BA shares the
        # per-frame (t_x, r_y) planar-view valley and can walk keyframe
        # poses along it (observed: online tracking fine, BA retroactively
        # degrading early KFs by 100-300 mm in low-texture scenes). The
        # axes each KF measured absolutely from its normals pin the
        # window's rotations. Same gates as the tracker's anchors.
        axes_kwargs = {}
        if self.manh_valid and self.cfg.use_manhattan and self.R_wm is not None:
            mc = self.cfg.manhattan
            axc = kf.axes_c[window].astype(np.float32)  # (k, 3, 3)
            sup = kf.axes_sup[window].astype(np.float32)  # (k, 3)
            axes_w = self.R_wm.T.astype(np.float32)  # rows = world axes
            pred = np.einsum(
                "kij,aj->kai", kf.T_cw[window][:, :3, :3], axes_w
            )
            cos_ax = np.sum(pred * axc, axis=-1)
            ok = (sup >= mc.rot_prior_min_support) & (
                cos_ax > np.cos(mc.rot_prior_max_correction)
            )
            w_raw = mc.rot_prior_weight * sup
            w_sat = w_raw / (1.0 + w_raw * mc.rot_prior_bias**2)
            w = np.where(ok, w_sat, 0.0).astype(np.float32)
            axc_full = np.zeros((K, 3, 3), np.float32)
            axc_full[: len(window)] = axc
            w_full = np.zeros((K, 3), np.float32)
            w_full[: len(window)] = w
            axes_kwargs = dict(
                kf_axes_c=jnp.asarray(axc_full),
                kf_axes_w=jnp.asarray(axes_w),
                kf_w_axis=jnp.asarray(w_full),
            )

        prob = BAProblem(
            kf_T_cw=jnp.asarray(T_full),
            kf_free=jnp.asarray(free),
            pt_X=jnp.asarray(pad(lm_X, P)),
            pt_valid=jnp.asarray(pad(np.ones(n_lm, bool), P)),
            e_kf=jnp.asarray(pad(k_idx.astype(np.int32), E)),
            e_pt=jnp.asarray(pad(e_pt_local.astype(np.int32), E)),
            e_obs=jnp.asarray(pad(e_obs.astype(np.float32), E)),
            e_stereo=jnp.asarray(pad(e_stereo, E)),
            e_inv_sigma2=jnp.asarray(
                pad((1.0 / 1.2 ** (2.0 * e_oct)).astype(np.float32), E)
            ),
            e_valid=jnp.asarray(pad(np.ones(ne, bool), E)),
            le_kf=jnp.asarray(pad(le_kf, El)),
            le_lm=jnp.asarray(pad(le_lm, El)),
            le_line2d=jnp.asarray(pad(le_l2d, El)),
            le_inv_sigma2=jnp.asarray(pad(np.ones(nle, np.float32), El)),
            le_valid=jnp.asarray(pad(np.ones(nle, bool), El)),
            **axes_kwargs,
            **lp_kwargs,
            **ll_kwargs,
        )
        import jax

        if self.use_distributed and len(jax.devices()) > 1:
            from ..parallel.dist_ba import (
                dist_local_bundle_adjustment,
                shard_ba_problem,
                unshard_points,
            )
            from ..parallel.mesh import make_mesh

            ndev = len(jax.devices())
            mesh = make_mesh(n_edge=ndev, n_seq=1)
            # Endpoint-pair co-location constraint: line i's endpoints sit at
            # rows (npt + i, npt + nu + i) of the landmark table.
            nu = len(ulines)
            pair_rows = np.stack(
                [npt + np.arange(nu), npt + nu + np.arange(nu)], axis=1
            ) if nu else None
            sp = shard_ba_problem(prob, ndev, pair_rows=pair_rows)
            kf_T_d, pt_X_d, _, _ = dist_local_bundle_adjustment(
                mesh, sp, self.cfg.camera
            )
            # Distributed edge/landmark order differs (grouped by landmark
            # block); un-permute landmarks and re-gate inliers on the final
            # geometry in the ORIGINAL edge order with the single-device rule.
            from ..solve.ba import BAResult, _edge_terms, _line_edge_terms

            import jax.numpy as _jnp

            kf_T_j = _jnp.asarray(kf_T_d)
            pt_X_j = _jnp.asarray(unshard_points(sp, pt_X_d))
            *_, chi2, okd = _edge_terms(prob, kf_T_j, pt_X_j, self.cfg.camera)
            th = _jnp.where(prob.e_stereo, 7.815, 5.991)
            *_, chi2l, okdl = _line_edge_terms(prob, kf_T_j, pt_X_j, self.cfg.camera)
            res = BAResult(
                kf_T_cw=kf_T_j,
                pt_X=pt_X_j,
                e_inlier=prob.e_valid & (chi2 <= th) & okd,
                le_inlier=prob.le_valid & (chi2l <= 3.84) & okdl,
                chi2=_jnp.sum(_jnp.where(prob.e_valid, chi2, 0.0)),
            )
            res = jax.device_get(res)
        else:
            res = jax.device_get(local_bundle_adjustment(prob, self.cfg.camera))

        # Write back poses + points + line endpoints.
        T_new = np.asarray(res.kf_T_cw)[: len(window)]
        kf.T_cw[window] = T_new
        lm_out = np.asarray(res.pt_X)
        vm.points.X_w[upts] = lm_out[:npt]
        if len(ulines):
            vm.lines.X0_w[ulines] = lm_out[npt : npt + len(ulines)]
            vm.lines.X1_w[ulines] = lm_out[npt + len(ulines) : npt + 2 * len(ulines)]
        # Erase outlier observations (reference: Optimizer.cc:3907-3929).
        inlier = np.asarray(res.e_inlier)[:ne]
        bad = ~inlier
        if bad.any():
            bk, bc = k_idx[bad], c_idx[bad]
            kf.obs_valid[window[bk], bc] = False
            pts_bad = kf.point_id[window[bk], bc]
            np.add.at(vm.points.n_obs, pts_bad, -1)
            kf.point_id[window[bk], bc] = -1
        # Outlier line observations: an edge covers one endpoint; erase the
        # observation when either endpoint edge fails the gate.
        le_inlier = np.asarray(res.le_inlier)[:nle]
        half = nle // 2
        bad_l = ~(le_inlier[:half] & le_inlier[half : 2 * half])
        if bad_l.any():
            blk, blc = lk_idx[:half][bad_l], lc_idx[:half][bad_l]
            kl.obs_valid[window[blk], blc] = False
            lids_bad = kl.line_id[window[blk], blc]
            np.add.at(vm.lines.n_obs, lids_bad, -1)
            kl.line_id[window[blk], blc] = -1
        self.n_ba_runs += 1
        return True

    def create_new_map_points(self, max_neighbors: int = 5) -> int:
        """Triangulate new map points for the newest keyframe's
        landmark-less keypoints against its best covisible neighbors
        (reference: LocalMapping::CreateNewMapPoints,
        src/LocalMapping.cc:335-660 — epipolar search per neighbor +
        per-match SVD; here one batched program per neighbor).

        Depth-based creation at keyframe insertion already covers keypoints
        with valid depth; this path reaches beyond the depth range — points
        the round-1 system could never landmark. Returns #points created."""
        vm = self.vomap
        newest = vm.newest_kf_slot
        if newest < 0 or not vm.keyframes.valid[newest]:
            return 0
        kf = vm.keyframes
        cam = self.cfg.camera
        neigh = vm.covisible_kfs(newest, min_weight=10, cap=max_neighbors)
        if len(neigh) == 0:
            return 0
        from ..ops.triangulate import triangulate_multi

        cand_a = kf.kp_valid[newest] & (kf.point_id[newest] < 0)
        uv_a = kf.obs[newest, :, :2]
        T_a = kf.T_cw[newest]
        C_a = -T_a[:3, :3].T @ T_a[:3, 3]
        # The RGB-D virtual stereo baseline: neighbors closer than this add
        # no parallax beyond what depth already gave (reference skips
        # baseline < mb, src/LocalMapping.cc:398-410).
        min_baseline = cam.bf / cam.fx
        # Stack ALL usable neighbors into one fixed-shape batch — a single
        # device program + single result pull for the whole keyframe
        # (the reference's per-neighbor loop would cost a round trip each).
        Nn = max_neighbors
        C = uv_a.shape[0]
        uv_b = np.zeros((Nn, C, 2), np.float32)
        desc_b = np.zeros((Nn,) + kf.desc[newest].shape, kf.desc.dtype)
        cand_b = np.zeros((Nn, C), bool)
        oct_b = np.zeros((Nn, C), np.int32)
        T_ab = np.tile(np.eye(4, dtype=np.float32), (Nn, 1, 1))
        used = []
        for nb in neigh:
            T_b = kf.T_cw[nb]
            C_b = -T_b[:3, :3].T @ T_b[:3, 3]
            if np.linalg.norm(C_a - C_b) < min_baseline:
                continue
            cb = kf.kp_valid[nb] & (kf.point_id[nb] < 0)
            if not cb.any():
                continue
            j = len(used)
            if j >= Nn:
                break
            uv_b[j] = kf.obs[nb, :, :2]
            desc_b[j] = kf.desc[nb]
            cand_b[j] = cb
            oct_b[j] = kf.octave[nb]
            T_ab[j] = (T_a @ np.linalg.inv(T_b)).astype(np.float32)
            used.append(int(nb))
        if not used:
            return 0
        res = triangulate_multi(
            cam,
            jnp.asarray(uv_a.astype(np.float32)),
            jnp.asarray(kf.desc[newest]),
            jnp.asarray(cand_a),
            jnp.asarray(kf.octave[newest]),
            jnp.asarray(uv_b), jnp.asarray(desc_b), jnp.asarray(cand_b),
            jnp.asarray(oct_b), jnp.asarray(T_ab),
            scale_factor=self.cfg.orb.scale_factor,
        )
        ok_all, match_all, X_all = jax.device_get(
            (res.ok, res.match_b, res.X_a)
        )
        T_wa = np.linalg.inv(T_a)
        created = 0
        for j, nb in enumerate(used):
            ia = np.nonzero(ok_all[j] & cand_a)[0]
            if len(ia) == 0:
                continue
            ib = match_all[j][ia]
            X_w = (T_wa[:3, :3] @ X_all[j][ia].T).T + T_wa[:3, 3]
            normal = X_w - C_a[None, :]
            normal /= np.linalg.norm(normal, axis=1, keepdims=True) + 1e-9
            ids = vm.add_points(
                X_w.astype(np.float32), kf.desc[newest][ia],
                normal.astype(np.float32), kf.octave[newest][ia],
                int(kf.frame_id[newest]),
            )
            made = ids >= 0
            ia, ib, ids = ia[made], ib[made], ids[made]
            if len(ia) == 0:
                continue
            # Register both observations (mono edges: u_r stays -1).
            kf.point_id[newest, ia] = ids
            kf.obs_valid[newest, ia] = True
            kf.point_id[nb, ib] = ids
            kf.obs_valid[nb, ib] = True
            vm.points.n_obs[ids] = 2
            vm.points.first_kf[ids] = newest
            cand_a[ia] = False
            created += len(ia)
        return created

    def create_new_map_lines(self, max_neighbors: int = 3) -> int:
        """Triangulate new map lines for the newest keyframe's landmark-less
        segments against covisible neighbors, with third-view verification
        (reference: LocalMapping::CreateNewMapLinesConstraint,
        src/LocalMapping.cc:1064-1203 — the only way lines beyond the depth
        range become landmarks). Returns #lines created."""
        vm = self.vomap
        newest = vm.newest_kf_slot
        if newest < 0 or not vm.keyframes.valid[newest]:
            return 0
        kf = vm.keyframes
        kl = vm.kf_lines
        cam = self.cfg.camera
        neigh = vm.covisible_kfs(newest, min_weight=10, cap=max_neighbors + 1)
        if len(neigh) < 2:
            return 0
        from ..ops.triangulate import triangulate_lines_pair

        cand_a = kl.seg_valid[newest] & (kl.line_id[newest] < 0)
        if not cand_a.any():
            return 0
        T_a = kf.T_cw[newest]
        C_a = -T_a[:3, :3].T @ T_a[:3, 3]
        min_baseline = cam.bf / cam.fx
        T_wa = np.linalg.inv(T_a)
        created = 0
        for bi, nb in enumerate(neigh[:max_neighbors]):
            if not cand_a.any():
                break
            T_b = kf.T_cw[nb]
            C_b = -T_b[:3, :3].T @ T_b[:3, 3]
            if np.linalg.norm(C_a - C_b) < min_baseline:
                continue
            cand_b = kl.seg_valid[nb] & (kl.line_id[nb] < 0)
            if not cand_b.any():
                continue
            # Third view: the best covisible neighbor that is not b.
            third = [c for c in neigh if c != nb][0]
            T_ab = (T_a @ np.linalg.inv(T_b)).astype(np.float32)
            T_ca = (kf.T_cw[third] @ T_wa).astype(np.float32)
            res = triangulate_lines_pair(
                cam,
                jnp.asarray(kl.p0[newest]), jnp.asarray(kl.p1[newest]),
                jnp.asarray(kl.desc[newest]), jnp.asarray(cand_a),
                jnp.asarray(kl.p0[nb]), jnp.asarray(kl.p1[nb]),
                jnp.asarray(kl.desc[nb]), jnp.asarray(cand_b),
                jnp.asarray(T_ab),
                jnp.asarray(kl.p0[third]), jnp.asarray(kl.p1[third]),
                jnp.asarray(kl.seg_valid[third]),
                jnp.asarray(T_ca),
            )
            ok, mb, X0a, X1a = jax.device_get(
                (res.ok, res.match_b, res.X0_a, res.X1_a)
            )
            ia = np.nonzero(ok & cand_a)[0]
            if len(ia) == 0:
                continue
            ib = mb[ia]
            X0w = (T_wa[:3, :3] @ X0a[ia].T).T + T_wa[:3, 3]
            X1w = (T_wa[:3, :3] @ X1a[ia].T).T + T_wa[:3, 3]
            lids = vm.add_lines(
                X0w.astype(np.float32), X1w.astype(np.float32),
                kl.desc[newest][ia], int(kf.frame_id[newest]),
                first_kf=newest,
            )
            made = lids >= 0
            ia, ib, lids = ia[made], ib[made], lids[made]
            if len(ia) == 0:
                continue
            kl.line_id[newest, ia] = lids
            kl.obs_valid[newest, ia] = True
            kl.line_id[nb, ib] = lids
            kl.obs_valid[nb, ib] = True
            vm.lines.n_obs[lids] = 2
            # line2d for the b observation from its own segment geometry.
            h0 = np.concatenate([kl.p0[nb][ib], np.ones((len(ib), 1))], axis=1)
            h1 = np.concatenate([kl.p1[nb][ib], np.ones((len(ib), 1))], axis=1)
            l2 = np.cross(h0, h1)
            l2 /= np.linalg.norm(l2[:, :2], axis=1, keepdims=True) + 1e-9
            kl.line2d[nb, ib] = l2.astype(np.float32)
            cand_a[ia] = False
            created += len(ia)
        return created

    def fuse_lines(self, max_desc: float = 0.4) -> int:
        """Merge duplicate map lines observed by the local window
        (reference: LocalMapping::SearchLineInNeighbors -> LSDmatcher::Fuse,
        src/LocalMapping.cc:1699, src/LSDmatcher.cpp:1297). Vectorized:
        pairwise direction alignment + mutual endpoint-to-line distance +
        descriptor distance; the survivor is the more-observed line and
        keyframe observations re-point to it. Returns #merges."""
        vm = self.vomap
        ids = vm.local_line_ids(self.cfg.cap.local_kfs, self.cfg.cap.local_lines)
        if len(ids) < 2:
            return 0
        t = vm.lines
        X0, X1 = t.X0_w[ids], t.X1_w[ids]
        d = X1 - X0
        ln = np.linalg.norm(d, axis=1)
        usable = ln > 1e-3
        u = d / np.maximum(ln, 1e-9)[:, None]
        cosd = np.abs(u @ u.T)
        # Perpendicular distance of i's midpoint to j's infinite line.
        mid = 0.5 * (X0 + X1)
        rel = mid[:, None, :] - X0[None, :, :]  # (n, n, 3)
        along = np.einsum("ijc,jc->ij", rel, u)
        perp = rel - along[:, :, None] * u[None, :, :]
        dperp = np.linalg.norm(perp, axis=-1)
        # Along-line overlap: i's midpoint must fall inside j's span (+20%).
        overlap = (along > -0.2 * ln[None, :]) & (along < 1.2 * ln[None, :])
        desc = t.desc[ids]
        dn = desc / (np.linalg.norm(desc, axis=1, keepdims=True) + 1e-9)
        ddist = 1.0 - dn @ dn.T
        near = (
            (cosd > np.cos(np.radians(3.0)))
            & (dperp < 0.08) & (dperp.T < 0.08)
            & overlap & overlap.T
            & (ddist < max_desc)
            & usable[:, None] & usable[None, :]
        )
        np.fill_diagonal(near, False)
        ai, bj = np.nonzero(np.triu(near, 1))
        if len(ai) == 0:
            return 0
        remap: dict = {}
        for a, b in zip(ids[ai], ids[bj]):
            ia, ib = int(a), int(b)
            while ia in remap:
                ia = remap[ia]
            while ib in remap:
                ib = remap[ib]
            if ia == ib or not (t.valid[ia] and t.valid[ib]):
                continue
            keep, drop = (ia, ib) if t.n_obs[ia] >= t.n_obs[ib] else (ib, ia)
            remap[drop] = keep
            t.n_obs[keep] += t.n_obs[drop]
            t.n_found[keep] += t.n_found[drop]
            t.n_visible[keep] += t.n_visible[drop]
            t.valid[drop] = False
        if remap:
            def resolve(k):
                while k in remap:
                    k = remap[k]
                return k

            lut = np.arange(t.valid.shape[0], dtype=np.int32)
            for d_, k_ in remap.items():
                lut[d_] = resolve(k_)
            lid = vm.kf_lines.line_id
            mask = lid >= 0
            lid[mask] = lut[lid[mask]]
        return len(remap)

    def fuse_points(self, radius_px: float = 2.0, max_desc: int = 30) -> int:
        """Merge duplicate map points observed by the recent window.

        (reference: LocalMapping::SearchInNeighbors -> ORBmatcher::Fuse,
        src/LocalMapping.cc:1567, src/ORBmatcher.cc:838: project candidates
        into neighbor keyframes and Replace on match.) Here: project every
        windowed point into the newest keyframe, bucket by pixel cell, and
        merge near-coincident points with close descriptors — the survivor
        is the more-observed one, and keyframe observations re-point to it.
        """
        vm = self.vomap
        if vm.n_keyframes() < 2 or vm.newest_kf_slot < 0:
            return 0
        newest = vm.newest_kf_slot
        T = vm.keyframes.T_cw[newest]
        cam = self.cfg.camera
        ids = vm.local_point_ids(self.cfg.cap.local_kfs, self.cfg.cap.local_points)
        if len(ids) < 2:
            return 0
        p = vm.points
        X = p.X_w[ids]
        Xc = (T[:3, :3] @ X.T).T + T[:3, 3]
        z = Xc[:, 2]
        vis = z > 0.1
        u = cam.fx * Xc[:, 0] / np.maximum(z, 1e-6) + cam.cx
        v = cam.fy * Xc[:, 1] / np.maximum(z, 1e-6) + cam.cy
        vis &= (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
        cell = (np.floor(v / radius_px).astype(np.int64) * 10000
                + np.floor(u / radius_px).astype(np.int64))
        cell[~vis] = -1
        # Vectorized duplicate detection: sort by (cell, depth); duplicate
        # candidates are sort-adjacent entries sharing a cell (offset 1 and
        # 2 cover the typical 2-3-point buckets; chains resolve over the
        # repeated per-keyframe calls). One batched Hamming check — no
        # per-bucket Python loop.
        ord_idx = np.lexsort((z, cell))
        sc = cell[ord_idx]
        cand_a, cand_b = [], []
        for off in (1, 2):
            same = (sc[:-off] == sc[off:]) & (sc[:-off] >= 0)
            cand_a.append(ord_idx[:-off][same])
            cand_b.append(ord_idx[off:][same])
        A = np.concatenate(cand_a)
        B = np.concatenate(cand_b)
        if len(A) == 0:
            return 0
        dz_ok = np.abs(z[A] - z[B]) <= 0.05
        A, B = A[dz_ok], B[dz_ok]
        if len(A) == 0:
            return 0
        da = p.desc[ids[A]].view(np.uint8)
        db = p.desc[ids[B]].view(np.uint8)
        pop = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)
        hd = pop[np.bitwise_xor(da, db)].sum(axis=1)
        keep_pair = hd <= max_desc
        A, B = A[keep_pair], B[keep_pair]
        remap = {}
        for a, b in zip(ids[A], ids[B]):  # only actual merge pairs (few)
            ia, ib = int(a), int(b)
            while ia in remap:
                ia = remap[ia]
            while ib in remap:
                ib = remap[ib]
            if ia == ib or not (p.valid[ia] and p.valid[ib]):
                continue
            keep, drop = (ia, ib) if p.n_obs[ia] >= p.n_obs[ib] else (ib, ia)
            remap[drop] = keep
            p.n_obs[keep] += p.n_obs[drop]
            p.n_found[keep] += p.n_found[drop]
            p.n_visible[keep] += p.n_visible[drop]
            p.valid[drop] = False
        if remap:
            # Resolve chains drop->keep->keep2, then one vectorized re-point.
            def resolve(k):
                while k in remap:
                    k = remap[k]
                return k

            lut = np.arange(p.valid.shape[0], dtype=np.int32)
            for d_, k_ in remap.items():
                lut[d_] = resolve(k_)
            pid = vm.keyframes.point_id
            mask = pid >= 0
            pid[mask] = lut[pid[mask]]
        return len(remap)

    def reelect_point_descriptors(self, max_window: int = 6) -> int:
        """Re-elect each tracked point's distinctive descriptor: among its
        observation descriptors across the covisible keyframe window, keep
        the one with the smallest median Hamming distance to the others
        (reference: MapPoint::ComputeDistinctiveDescriptors,
        src/MapPoint.cc:120-170, run per processed keyframe from
        LocalMapping::ProcessNewKeyFrame, src/LocalMapping.cc:185-257).

        Batched: one (W, W, P) popcount tensor over the window's
        observation descriptors — no per-point loop."""
        vm = self.vomap
        newest = vm.newest_kf_slot
        if newest < 0 or vm.n_keyframes() < 2:
            return 0
        kf = vm.keyframes
        window = np.concatenate(
            [[newest], vm.covisible_kfs(newest, min_weight=1, cap=max_window - 1)]
        ).astype(np.int64)
        W = len(window)
        if W < 2:
            return 0
        pid_new = kf.point_id[newest]
        tgt = np.unique(pid_new[kf.obs_valid[newest] & (pid_new >= 0)])
        tgt = tgt[vm.points.valid[tgt]]
        P = len(tgt)
        if P == 0:
            return 0
        descs = np.zeros((W, P, 8), np.uint32)
        have = np.zeros((W, P), bool)
        inv = np.full((vm.points.valid.shape[0],), -1, np.int64)
        for w, k in enumerate(window):
            pid = kf.point_id[k]
            rows = np.nonzero(kf.obs_valid[k] & (pid >= 0))[0]
            inv[:] = -1
            inv[pid[rows]] = rows
            r = inv[tgt]
            hv = r >= 0
            descs[w, hv] = kf.desc[k, r[hv]]
            have[w, hv] = True
        nobs = have.sum(0)
        if not (nobs >= 2).any():
            return 0
        d8 = descs.view(np.uint8)  # (W, P, 32)
        x = np.bitwise_count(d8[:, None] ^ d8[None, :]).sum(-1).astype(np.int32)
        big = np.int32(10000)
        x = np.where(have[:, None] & have[None, :], x, big)
        # Reference semantics: for candidate i the score is the median of
        # its distances to ALL of the point's observations (self distance 0
        # included), i.e. sorted[(n-1)//2]; invalid pairs sort to the back.
        xs = np.sort(x, axis=1)  # (W, W, P)
        med_idx = np.broadcast_to((nobs - 1) // 2, (W, P))[:, None, :]
        med = np.take_along_axis(xs, med_idx.astype(np.int64), axis=1)[:, 0, :]
        med = np.where(have, med, big)
        best_w = med.argmin(axis=0)
        ar = np.arange(P)
        upd = (nobs >= 2) & have[best_w, ar]
        vm.points.desc[tgt[upd]] = descs[best_w, ar][upd]
        return int(upd.sum())

    def cull_keyframes(self) -> list:
        """Cull keyframes whose close points are >=90% observed by >=3 other
        keyframes at the same or finer octave (reference:
        LocalMapping::KeyFrameCulling, src/LocalMapping.cc:1875-1990).
        Returns the culled slots so the tracker can re-anchor trajectory
        entries before the slots are recycled."""
        vm = self.vomap
        order = vm.kf_slots_by_order()
        if len(order) <= 5:
            return []
        kf = vm.keyframes
        culled = []
        # Per-point octave of each observation, gathered once: for candidate
        # KF k, an observation elsewhere is redundant cover if its octave is
        # <= the candidate's octave + 1 (reference: scaleLevel <=
        # scaleLevel + 1, src/LocalMapping.cc:1930).
        for k in order[2:-2]:  # never cull the map origin pair or newest two
            pid = kf.point_id[k]
            ov = kf.obs_valid[k] & (pid >= 0)
            n_own = int(ov.sum())
            if n_own == 0:
                culled.append(int(k))
                continue
            own_pids = pid[ov]
            own_oct = kf.octave[k][ov]
            oct_of = np.full((vm.points.valid.shape[0],), -2, np.int32)
            oct_of[own_pids] = own_oct
            flag = oct_of >= 0
            others = np.nonzero(kf.valid)[0]
            others = others[others != k]
            opid = kf.point_id[others]
            oov = kf.obs_valid[others] & (opid >= 0)
            safe = np.maximum(opid, 0)
            covers = oov & flag[safe] & (kf.octave[others] <= oct_of[safe] + 1)
            n_cover = np.zeros((vm.points.valid.shape[0],), np.int32)
            np.add.at(n_cover, safe[covers], 1)
            redundant = n_cover[own_pids] >= 3
            if redundant.mean() > 0.9:
                culled.append(int(k))
        for k in culled:
            vm.release_keyframe(k)  # decrements landmark n_obs itself
            if self._kf_db is not None:
                self._kf_db.erase(int(k))
        return culled
