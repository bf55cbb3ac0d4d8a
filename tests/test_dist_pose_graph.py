"""Edge-sharded distributed pose graph == single-device solver.

(parallel/dist_pose_graph.py; reference: Optimizer::OptimizeEssentialGraph,
src/Optimizer.cc:4339 — here the edge table partitions over a device mesh.)
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hfvo_tpu.geometry import se3
from hfvo_tpu.parallel.dist_pose_graph import dist_optimize_pose_graph
from hfvo_tpu.solve.pose_graph import PoseGraph, optimize_pose_graph


def _loop_graph(K=12, seed=0, drift=0.02):
    """A drifting loop: odometry chain + one loop-closure edge back to the
    start, the canonical pose-graph correction scenario."""
    rng = np.random.default_rng(seed)
    T_gt = [np.eye(4, dtype=np.float32)]
    for k in range(1, K):
        th = 2 * np.pi / K
        d = np.array([0.0, 0, 0.4, 0, th, 0], np.float32)
        T_gt.append(
            np.asarray(se3.exp_se3(jnp.asarray(d[None]))[0]) @ T_gt[-1]
        )
    T_gt = np.stack(T_gt)
    # Drifted initialization: accumulate noisy odometry.
    T_init = [T_gt[0]]
    for k in range(1, K):
        rel = T_gt[k] @ np.linalg.inv(T_gt[k - 1])
        xi = rng.normal(0, drift, 6).astype(np.float32)
        rel_n = np.asarray(se3.exp_se3(jnp.asarray(xi[None]))[0]) @ rel
        T_init.append(rel_n @ T_init[-1])
    T_init = np.stack(T_init).astype(np.float32)

    e_i, e_j, Tij, w = [], [], [], []
    for k in range(1, K):  # exact odometry measurements
        e_i.append(k)
        e_j.append(k - 1)
        Tij.append(T_gt[k] @ np.linalg.inv(T_gt[k - 1]))
        w.append(1.0)
    e_i.append(0)  # loop edge
    e_j.append(K - 1)
    Tij.append(T_gt[0] @ np.linalg.inv(T_gt[K - 1]))
    w.append(2.0)
    free = np.ones(K, bool)
    free[0] = False
    return PoseGraph(
        T_cw=jnp.asarray(T_init),
        free=jnp.asarray(free),
        e_i=jnp.asarray(np.asarray(e_i, np.int32)),
        e_j=jnp.asarray(np.asarray(e_j, np.int32)),
        e_Tij=jnp.asarray(np.stack(Tij).astype(np.float32)),
        e_weight=jnp.asarray(np.asarray(w, np.float32)),
    ), T_gt


def test_pose_graph_corrects_drift():
    pg, T_gt = _loop_graph()
    T_out = np.asarray(optimize_pose_graph(pg, n_iters=15))
    err = np.abs(T_out[:, :3, 3] - T_gt[:, :3, 3]).max()
    err0 = np.abs(np.asarray(pg.T_cw)[:, :3, 3] - T_gt[:, :3, 3]).max()
    assert err < 0.2 * err0 + 1e-4, (err, err0)


def test_dist_pose_graph_matches_single():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    pg, T_gt = _loop_graph(K=16, seed=1)
    T1 = np.asarray(optimize_pose_graph(pg, n_iters=12))
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("edge",))
    T8 = np.asarray(dist_optimize_pose_graph(mesh, pg, n_iters=12))
    assert np.abs(T1 - T8).max() < 1e-4, np.abs(T1 - T8).max()
    err = np.abs(T8[:, :3, 3] - T_gt[:, :3, 3]).max()
    err0 = np.abs(np.asarray(pg.T_cw)[:, :3, 3] - T_gt[:, :3, 3]).max()
    assert err < 0.2 * err0 + 1e-4
