"""Distributed BA on the virtual 8-device CPU mesh: must agree with the
single-device solver — including line-endpoint edges, Manhattan axis pairs,
and cross-line par/perp edges (reference scope: Optimizer.cc:3014-3941)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hfvo_tpu.config import tum3_config
from hfvo_tpu.geometry import se3, camera
from hfvo_tpu.parallel.dist_ba import (
    dist_local_bundle_adjustment,
    shard_ba_problem,
    unshard_points,
)
from hfvo_tpu.parallel.mesh import make_mesh
from hfvo_tpu.solve.ba import local_bundle_adjustment

from test_ba import make_ba_problem, pose_errors

INTR = tum3_config().camera


@pytest.fixture
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh(n_edge=8, n_seq=1)


def _pad_problem_landmarks(prob, P_cap=320):
    """Pad landmark capacity to a multiple of 8 for sharding."""
    P = prob.pt_X.shape[0]
    pad = P_cap - P
    return prob._replace(
        pt_X=jnp.pad(prob.pt_X, ((0, pad), (0, 0))),
        pt_valid=jnp.pad(prob.pt_valid, (0, pad)),
    )


def make_line_ba_problem(rng, K=4, P_pts=60, n_lines=24):
    """Points + line-endpoint landmarks with reprojection, point-to-2D-line,
    per-line axis-pair, and cross-line parallel edges."""
    prob0, T_gt, X_gt, _ = make_ba_problem(
        rng, K=K, P=P_pts, pose_noise=0.02, pt_noise=0.02, obs_noise=0.2
    )
    # GT lines along the world x axis (so axis pairs + parallel cross-line
    # edges are all consistent constraints).
    axis = np.array([1.0, 0.0, 0.0], np.float32)
    L0 = np.stack(
        [rng.uniform(-2, 0, n_lines), rng.uniform(-1.5, 1.5, n_lines),
         rng.uniform(3.5, 6, n_lines)], 1
    ).astype(np.float32)
    L1 = L0 + axis * rng.uniform(0.8, 1.5, (n_lines, 1)).astype(np.float32)

    le_kf, le_lm, le_l2d = [], [], []
    for k in range(K):
        uv0 = np.array(camera.project(INTR, se3.transform(jnp.asarray(T_gt[k]), jnp.asarray(L0))))
        uv1 = np.array(camera.project(INTR, se3.transform(jnp.asarray(T_gt[k]), jnp.asarray(L1))))
        dd = uv1 - uv0
        n = np.stack([-dd[:, 1], dd[:, 0]], 1)
        n /= np.linalg.norm(n, axis=1, keepdims=True) + 1e-9
        c = -(n * uv0).sum(1)
        l2d = np.concatenate([n, c[:, None]], 1).astype(np.float32)
        for i in range(n_lines):
            le_kf += [k, k]
            le_lm += [P_pts + i, P_pts + n_lines + i]
            le_l2d += [l2d[i], l2d[i]]
    El = len(le_kf)

    lm_X = np.concatenate([
        np.asarray(prob0.pt_X)[:P_pts],
        L0 + rng.normal(size=(n_lines, 3)).astype(np.float32) * 0.03,
        L1 + rng.normal(size=(n_lines, 3)).astype(np.float32) * 0.03,
    ])
    P_total = P_pts + 2 * n_lines

    # Axis pairs: every line parallel to world x.
    lp_s = (P_pts + np.arange(n_lines)).astype(np.int32)
    lp_e = (P_pts + n_lines + np.arange(n_lines)).astype(np.int32)
    lp_axis = np.tile(axis, (n_lines, 1))
    lp_w = np.full((n_lines,), 20.0, np.float32)
    lp_valid = np.ones((n_lines,), bool)

    # Cross-line parallel edges between consecutive lines.
    nq = n_lines - 1
    ll_sa = lp_s[:nq]
    ll_ea = lp_e[:nq]
    ll_sb = lp_s[1:]
    ll_eb = lp_e[1:]
    ll_kind = np.zeros((nq,), np.int32)
    ll_w = np.full((nq,), 10.0, np.float32)
    ll_valid = np.ones((nq,), bool)

    prob = prob0._replace(
        pt_X=jnp.asarray(lm_X),
        pt_valid=jnp.ones((P_total,), bool),
        le_kf=jnp.asarray(np.array(le_kf, np.int32)),
        le_lm=jnp.asarray(np.array(le_lm, np.int32)),
        le_line2d=jnp.asarray(np.stack(le_l2d)),
        le_inv_sigma2=jnp.ones((El,)),
        le_valid=jnp.ones((El,), bool),
        lp_s=jnp.asarray(lp_s), lp_e=jnp.asarray(lp_e),
        lp_axis=jnp.asarray(lp_axis), lp_w=jnp.asarray(lp_w),
        lp_valid=jnp.asarray(lp_valid),
        ll_sa=jnp.asarray(ll_sa), ll_ea=jnp.asarray(ll_ea),
        ll_sb=jnp.asarray(ll_sb), ll_eb=jnp.asarray(ll_eb),
        ll_kind=jnp.asarray(ll_kind), ll_w=jnp.asarray(ll_w),
        ll_valid=jnp.asarray(ll_valid),
    )
    return prob, T_gt, X_gt, L0, L1, axis


def test_dist_ba_matches_single_device(rng, mesh):
    prob, T_gt, X_gt, _ = make_ba_problem(rng, K=6, P=300, pose_noise=0.03, pt_noise=0.03, obs_noise=0.3)
    prob = _pad_problem_landmarks(prob)
    single = local_bundle_adjustment(prob, INTR)

    sp = shard_ba_problem(prob, 8)
    assert sp.n_dropped == 0
    kf_T, pt_X, e_inlier, _ = dist_local_bundle_adjustment(mesh, sp, INTR)
    kf_T = np.asarray(kf_T)
    # Both solvers converge to the ground truth within tolerance.
    perr_d = pose_errors(kf_T, T_gt)
    perr_s = pose_errors(np.asarray(single.kf_T_cw), T_gt)
    assert perr_d[2:, :3].max() < 0.01, perr_d
    assert abs(perr_d.max() - perr_s.max()) < 0.01
    # Distributed landmark update close to single-device result.
    Xd = unshard_points(sp, pt_X)[:300]
    Xs = np.asarray(single.pt_X)[:300]
    assert np.median(np.linalg.norm(Xd - X_gt, axis=1)) < 0.01
    assert np.median(np.linalg.norm(Xs - X_gt, axis=1)) < 0.01


def test_dist_ba_outlier_gating(rng, mesh):
    prob, T_gt, X_gt, _ = make_ba_problem(
        rng, K=6, P=300, pose_noise=0.02, pt_noise=0.02, obs_noise=0.3, outlier_frac=0.15
    )
    prob = _pad_problem_landmarks(prob)
    sp = shard_ba_problem(prob, 8)
    kf_T, pt_X, e_inlier, _ = dist_local_bundle_adjustment(mesh, sp, INTR)
    perr = pose_errors(np.asarray(kf_T), T_gt)
    assert perr[2:, :3].max() < 0.02
    inl = np.asarray(e_inlier)
    # Some edges rejected (outliers), most kept.
    frac = inl.sum() / np.asarray(sp.e_valid).sum()
    assert 0.6 < frac < 0.95


def test_dist_ba_line_edges_match_single(rng, mesh):
    """Full problem — line-endpoint edges, paired axis blocks, cross-line
    parallel edges — agrees with the single-device solver."""
    prob, T_gt, X_gt, L0, L1, axis = make_line_ba_problem(rng)
    prob = _pad_problem_landmarks(prob)
    single = local_bundle_adjustment(prob, INTR)
    sp = shard_ba_problem(prob, 8)
    assert sp.n_dropped == 0
    kf_T, pt_X, e_inl, le_inl = dist_local_bundle_adjustment(mesh, sp, INTR)

    perr_d = pose_errors(np.asarray(kf_T), T_gt)
    perr_s = pose_errors(np.asarray(single.kf_T_cw), T_gt)
    assert perr_d[2:, :3].max() < 0.01, perr_d
    assert abs(perr_d.max() - perr_s.max()) < 0.005

    Xd = unshard_points(sp, pt_X)
    Xs = np.asarray(single.pt_X)
    n_lines = len(L0)
    # Endpoints recovered: perpendicular distance to GT infinite lines.
    for X_opt, tag in ((Xd, "dist"), (Xs, "single")):
        E0 = X_opt[60 : 60 + n_lines]
        rel = E0 - L0
        perp = rel - (rel * axis).sum(1, keepdims=True) * axis
        assert np.median(np.linalg.norm(perp, axis=1)) < 0.02, tag
    # Endpoint solutions agree between the two solvers.
    d_ep = np.linalg.norm(Xd[60 : 60 + 2 * n_lines] - Xs[60 : 60 + 2 * n_lines], axis=1)
    assert np.median(d_ep) < 0.01, np.median(d_ep)
    # Line-edge inliers mostly kept.
    assert np.asarray(le_inl).sum() / np.asarray(sp.le_valid).sum() > 0.9


def test_dist_ba_pairs_colocated(rng):
    """shard_ba_problem keeps every line's endpoint pair in one block."""
    prob, *_ = make_line_ba_problem(rng)
    prob = _pad_problem_landmarks(prob)
    sp = shard_ba_problem(prob, 8)
    blk = sp.pt_X.shape[0] // 8
    s_new = sp.new_of_old[np.asarray(prob.lp_s)]
    e_new = sp.new_of_old[np.asarray(prob.lp_e)]
    assert (s_new // blk == e_new // blk).all()


def test_mapper_distributed_ba_end_to_end(rng, mesh):
    """Tracker with the distributed BA flag produces a consistent trajectory
    on the 8-device CPU mesh with the FULL hybrid config (lines included)."""
    from hfvo_tpu.io import evaluate
    from hfvo_tpu.testing import synthetic
    from hfvo_tpu.tracking.tracker import Tracker

    import dataclasses

    cfg = tum3_config()
    # Force frequent keyframes so local BA (gated at >3 KFs) runs.
    cfg = cfg.replace(tracking=dataclasses.replace(cfg.tracking, max_frames_between_kf=2))
    T_wc, grays, depths = synthetic.render_sequence(n=12, seed=0)
    tr = Tracker(cfg, use_local_ba=True, use_loop_closing=False)
    tr.mapper.use_distributed = True
    for g, d in zip(grays, depths):
        r = tr.track_rgbd(g, d, T_cw_init=np.linalg.inv(T_wc[0]))
    assert tr.mapper.n_ba_runs >= 1
    est = tr.get_trajectory()
    ts = np.arange(len(est)) / 30.0
    ape = evaluate.ate(ts, T_wc, ts, est, align="origin")
    assert ape.rmse < 0.02, ape.rmse
