"""Distributed BA on the virtual 8-device CPU mesh: must agree with the
single-device solver."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hfvo_tpu.config import tum3_config
from hfvo_tpu.geometry import se3
from hfvo_tpu.parallel.dist_ba import dist_local_bundle_adjustment, shard_ba_problem
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
    import jax.numpy as jnp

    P = prob.pt_X.shape[0]
    pad = P_cap - P
    return prob._replace(
        pt_X=jnp.pad(prob.pt_X, ((0, pad), (0, 0))),
        pt_valid=jnp.pad(prob.pt_valid, (0, pad)),
    )


def test_dist_ba_matches_single_device(rng, mesh):
    prob, T_gt, X_gt, _ = make_ba_problem(rng, K=6, P=300, pose_noise=0.03, pt_noise=0.03, obs_noise=0.3)
    prob = _pad_problem_landmarks(prob)
    single = local_bundle_adjustment(prob, INTR)

    sp = shard_ba_problem(prob, 8)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        kf_T, pt_X, e_inlier = dist_local_bundle_adjustment(mesh, sp, INTR)
    kf_T = np.asarray(kf_T)
    # Both solvers converge to the ground truth within tolerance.
    perr_d = pose_errors(kf_T, T_gt)
    perr_s = pose_errors(np.asarray(single.kf_T_cw), T_gt)
    assert perr_d[2:, :3].max() < 0.01, perr_d
    assert abs(perr_d.max() - perr_s.max()) < 0.01
    # Distributed landmark update close to single-device result.
    Xd = np.asarray(pt_X)[:300]
    Xs = np.asarray(single.pt_X)[:300]
    assert np.median(np.linalg.norm(Xd - X_gt, axis=1)) < 0.01
    assert np.median(np.linalg.norm(Xs - X_gt, axis=1)) < 0.01


def test_dist_ba_outlier_gating(rng, mesh):
    prob, T_gt, X_gt, _ = make_ba_problem(
        rng, K=6, P=300, pose_noise=0.02, pt_noise=0.02, obs_noise=0.3, outlier_frac=0.15
    )
    prob = _pad_problem_landmarks(prob)
    sp = shard_ba_problem(prob, 8)
    kf_T, pt_X, e_inlier = dist_local_bundle_adjustment(mesh, sp, INTR)
    perr = pose_errors(np.asarray(kf_T), T_gt)
    assert perr[2:, :3].max() < 0.02
    inl = np.asarray(e_inlier)
    # Some edges rejected (outliers), most kept.
    frac = inl.sum() / np.asarray(sp.e_valid).sum()
    assert 0.6 < frac < 0.95


def test_mapper_distributed_ba_end_to_end(rng, mesh):
    """Tracker with the distributed BA flag produces a consistent trajectory
    on the 8-device CPU mesh (points-only config: line edges fall back)."""
    from hfvo_tpu.config import tum3_config
    from hfvo_tpu.io import evaluate
    from hfvo_tpu.testing import synthetic
    from hfvo_tpu.tracking.tracker import Tracker

    import dataclasses

    cfg = tum3_config().replace(use_lines=False, use_planes=False, use_manhattan=False)
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
