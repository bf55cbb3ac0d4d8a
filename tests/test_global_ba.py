"""Global BA (matrix-free CG-Schur over the whole map) must converge like
the dense-window local BA (reference: Optimizer::GlobalBundleAdjustemnt,
src/Optimizer.cc:51, run after loop closure, src/LoopClosing.cc:653)."""
import jax.numpy as jnp
import numpy as np

from hfvo_tpu.config import tum3_config
from hfvo_tpu.solve.ba import local_bundle_adjustment
from hfvo_tpu.solve.global_ba import (
    GlobalBAProblem,
    build_global_ba_problem,
    global_bundle_adjustment,
    run_global_ba,
)

from test_ba import make_ba_problem, pose_errors

INTR = tum3_config().camera


def _to_global(prob):
    return GlobalBAProblem(
        kf_T_cw=prob.kf_T_cw,
        kf_free=prob.kf_free,
        pt_X=prob.pt_X,
        pt_valid=prob.pt_valid,
        e_kf=prob.e_kf,
        e_pt=prob.e_pt,
        e_obs=prob.e_obs,
        e_stereo=prob.e_stereo,
        e_inv_sigma2=prob.e_inv_sigma2,
        e_valid=prob.e_valid,
        le_kf=prob.le_kf,
        le_lm=prob.le_lm,
        le_line2d=prob.le_line2d,
        le_inv_sigma2=prob.le_inv_sigma2,
        le_valid=prob.le_valid,
    )


def test_global_ba_converges_like_local(rng):
    prob, T_gt, X_gt, _ = make_ba_problem(
        rng, K=6, P=300, pose_noise=0.03, pt_noise=0.03, obs_noise=0.3
    )
    single = local_bundle_adjustment(prob, INTR)
    res = global_bundle_adjustment(_to_global(prob), INTR, n_iters=12)
    perr_g = pose_errors(np.asarray(res.kf_T_cw), T_gt)
    perr_s = pose_errors(np.asarray(single.kf_T_cw), T_gt)
    assert perr_g[2:, :3].max() < 0.01, perr_g
    assert abs(perr_g.max() - perr_s.max()) < 0.01
    Xg = np.asarray(res.pt_X)
    assert np.median(np.linalg.norm(Xg - X_gt, axis=1)) < 0.01
    assert np.asarray(res.e_inlier).mean() > 0.95


def test_global_ba_outlier_robust(rng):
    prob, T_gt, X_gt, n_out = make_ba_problem(
        rng, K=6, P=300, pose_noise=0.02, pt_noise=0.02, obs_noise=0.3,
        outlier_frac=0.15,
    )
    res = global_bundle_adjustment(_to_global(prob), INTR, n_iters=12)
    perr = pose_errors(np.asarray(res.kf_T_cw), T_gt)
    assert perr[2:, :3].max() < 0.02, perr
    inl = np.asarray(res.e_inlier)
    assert 0.6 < inl.mean() < 0.95


def test_global_ba_many_keyframes(rng):
    """Scales past the 16-KF local window: 24 KFs, one gauge KF. (The
    16-KF dense-U local window cannot represent this problem at all.)"""
    prob, T_gt, X_gt, _ = make_ba_problem(
        rng, K=24, P=500, pose_noise=0.015, pt_noise=0.02, obs_noise=0.3
    )
    # make_ba_problem fixes the first two; emulate GBA's single gauge.
    free = np.asarray(prob.kf_free).copy()
    free[1] = True
    prob = prob._replace(kf_free=jnp.asarray(free))
    res = global_bundle_adjustment(
        _to_global(prob), INTR, n_iters=15, cg_iters=80
    )
    perr = pose_errors(np.asarray(res.kf_T_cw), T_gt)
    # Tail keyframes see few landmarks (the camera line walks away from
    # the landmark field), so gate the well-observed majority tightly.
    assert np.median(perr[1:, :3].max(axis=1)) < 0.005, perr.max()
    assert perr[1:16, :3].max() < 0.01, perr.max()


def test_run_global_ba_on_tracker_map(rng):
    """End-to-end: perturb a tracker-built map, run_global_ba restores it."""
    from hfvo_tpu.io import evaluate
    from hfvo_tpu.testing import synthetic
    from hfvo_tpu.tracking.tracker import Tracker

    import dataclasses

    cfg = tum3_config()
    cfg = cfg.replace(
        tracking=dataclasses.replace(cfg.tracking, max_frames_between_kf=2)
    )
    T_wc, grays, depths = synthetic.render_sequence(n=14, seed=3)
    tr = Tracker(cfg, use_local_ba=False, use_loop_closing=False)
    for g, d in zip(grays, depths):
        tr.track_rgbd(g, d, T_cw_init=np.linalg.inv(T_wc[0]))
    vm = tr.vomap
    kf_slots = np.nonzero(vm.keyframes.valid)[0]
    assert len(kf_slots) >= 5
    T_before = vm.keyframes.T_cw[kf_slots].copy()
    # Perturb all non-gauge KF poses + the points they own.
    from hfvo_tpu.geometry import se3 as se3m
    rs = np.random.default_rng(7)
    order = np.argsort(vm.keyframes.order[kf_slots], kind="stable")
    gauge = kf_slots[order[0]]
    for s in kf_slots:
        if s == gauge:
            continue
        xi = (rs.normal(size=6) * 0.01).astype(np.float32)
        vm.keyframes.T_cw[s] = np.asarray(se3m.exp_se3(jnp.asarray(xi))) @ vm.keyframes.T_cw[s]
    chi2 = run_global_ba(vm, cfg.camera, gauge_kf=int(gauge))
    assert np.isfinite(chi2)
    T_after = vm.keyframes.T_cw[kf_slots]
    # Poses recovered close to the pre-perturbation map.
    dt = np.linalg.norm(T_after[:, :3, 3] - T_before[:, :3, 3], axis=1)
    # 0.010-0.013 observed across descriptor variants (binned vs continuous
    # BRIEF changes the tracker-built map slightly); the gate checks the
    # solver pulls perturbed poses back toward the optimum, not exact ATE.
    assert np.median(dt) < 0.015, np.median(dt)
