import jax.numpy as jnp
import numpy as np

from hfvo_tpu.geometry import se3
from hfvo_tpu.solve.pose_graph import PoseGraph, optimize_pose_graph


def chain_poses(n, step_xi):
    """Ground-truth chain of poses T_i = step^i."""
    T = [np.eye(4, dtype=np.float32)]
    S = np.asarray(se3.exp_se3(jnp.asarray(step_xi)))
    for _ in range(n - 1):
        T.append((S @ T[-1]).astype(np.float32))
    return np.stack(T)


def test_pgo_consistent_graph_stays():
    """With consistent edges, optimization should not move poses."""
    T = chain_poses(8, np.array([0.1, 0, 0.02, 0, 0.05, 0], np.float32))
    e_i = np.arange(7, dtype=np.int32)
    e_j = e_i + 1
    e_T = np.stack([T[i] @ np.linalg.inv(T[j]) for i, j in zip(e_i, e_j)])
    pg = PoseGraph(
        T_cw=jnp.asarray(T),
        free=jnp.asarray(np.arange(8) > 0),
        e_i=jnp.asarray(e_i), e_j=jnp.asarray(e_j),
        e_Tij=jnp.asarray(e_T.astype(np.float32)),
        e_weight=jnp.ones((7,)),
    )
    T_out = np.asarray(optimize_pose_graph(pg))
    np.testing.assert_allclose(T_out, T, atol=1e-4)


def test_pgo_distributes_loop_drift():
    """A drifted chain with one exact loop-closure edge: drift should be
    redistributed so the loop edge is (nearly) satisfied."""
    n = 12
    T_gt = chain_poses(n, np.array([0.2, 0, 0, 0, 0.05, 0], np.float32))
    # Simulate accumulated drift: each relative step slightly wrong.
    T_drift = [T_gt[0]]
    for i in range(1, n):
        rel = T_gt[i] @ np.linalg.inv(T_gt[i - 1])
        noise = np.asarray(
            se3.exp_se3(jnp.asarray(np.array([0.01, 0.004, 0, 0, 0.006, 0], np.float32)))
        )
        T_drift.append((noise @ rel @ T_drift[-1]).astype(np.float32))
    T_drift = np.stack(T_drift)
    drift0 = np.linalg.norm(T_drift[-1][:3, 3] - T_gt[-1][:3, 3])
    assert drift0 > 0.05  # meaningful drift accumulated

    # Odometry edges from the *drifted* relative poses, loop edge exact (GT).
    e_i = list(range(n - 1))
    e_j = list(range(1, n))
    e_T = [T_drift[i] @ np.linalg.inv(T_drift[j]) for i, j in zip(e_i, e_j)]
    e_w = [1.0] * (n - 1)
    e_i.append(0)
    e_j.append(n - 1)
    e_T.append(T_gt[0] @ np.linalg.inv(T_gt[n - 1]))
    e_w.append(3.0)

    pg = PoseGraph(
        T_cw=jnp.asarray(T_drift),
        free=jnp.asarray(np.arange(n) > 0),
        e_i=jnp.asarray(np.array(e_i, np.int32)),
        e_j=jnp.asarray(np.array(e_j, np.int32)),
        e_Tij=jnp.asarray(np.stack(e_T).astype(np.float32)),
        e_weight=jnp.asarray(np.array(e_w, np.float32)),
    )
    T_out = np.asarray(optimize_pose_graph(pg))
    drift1 = np.linalg.norm(T_out[-1][:3, 3] - T_gt[-1][:3, 3])
    assert drift1 < 0.35 * drift0, (drift0, drift1)
    # Middle poses also improved.
    mid0 = np.linalg.norm(T_drift[n // 2][:3, 3] - T_gt[n // 2][:3, 3])
    mid1 = np.linalg.norm(T_out[n // 2][:3, 3] - T_gt[n // 2][:3, 3])
    assert mid1 < mid0 + 1e-6


def test_loop_closer_on_revisit():
    """Track an out-and-back sequence; manually invoke the loop closer at the
    end and confirm detection + correction runs (or cleanly declines)."""
    from hfvo_tpu.config import tum3_config
    from hfvo_tpu.mapping.loop_closing import LoopCloser
    from hfvo_tpu.testing import synthetic
    from hfvo_tpu.tracking.tracker import Tracker

    cfg = tum3_config()
    T_fwd = synthetic.orbit_trajectory(10)
    T_wc = np.concatenate([T_fwd, T_fwd[::-1][1:]])  # out and back
    scene = synthetic.make_room(0)
    tr = Tracker(cfg, use_local_ba=False)
    for i in range(len(T_wc)):
        g, d = synthetic.render_jit(scene, cfg.camera, jnp.asarray(T_wc[i]))
        tr.track_rgbd(np.asarray(g), np.asarray(d), T_cw_init=np.linalg.inv(T_wc[0]))
    lc = LoopCloser(cfg, tr.vomap, min_gap_kfs=4, min_score=0.05, min_inliers=20)
    closed = lc.detect_and_close(tr)
    # On a clean synthetic track drift is tiny; what matters is that the
    # pipeline runs end-to-end without corrupting the map.
    if closed:
        assert np.isfinite(tr.vomap.keyframes.T_cw[tr.vomap.keyframes.valid]).all()
        est = tr.get_trajectory()
        assert np.isfinite(est).all()
