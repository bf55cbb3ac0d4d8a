"""Edge-sharded distributed global BA == single-device global BA.

(parallel/dist_gba.py; reference: LoopClosing::RunGlobalBundleAdjustment,
src/LoopClosing.cc:647 — here partitioned over a device mesh.)
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hfvo_tpu.config import tum3_config
from hfvo_tpu.geometry import se3
from hfvo_tpu.parallel.dist_gba import dist_global_bundle_adjustment
from hfvo_tpu.parallel.mesh import make_mesh
from hfvo_tpu.solve.global_ba import (
    GlobalBAProblem,
    global_bundle_adjustment,
)


def _make_problem(K=6, Pn=160, seed=0, noise_px=0.5, pose_noise=0.01):
    intr = tum3_config().camera
    rng = np.random.default_rng(seed)
    X = np.stack(
        [
            rng.uniform(-2, 2, Pn),
            rng.uniform(-1.5, 1.5, Pn),
            rng.uniform(2.5, 6.0, Pn),
        ],
        axis=1,
    ).astype(np.float32)
    T_gt = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    for k in range(K):
        T_gt[k, :3, 3] = [0.08 * k, 0.02 * k, 0.0]
    e_kf, e_pt, e_obs = [], [], []
    for k in range(K):
        Xc = (T_gt[k, :3, :3] @ X.T).T + T_gt[k, :3, 3]
        u = intr.fx * Xc[:, 0] / Xc[:, 2] + intr.cx + rng.normal(0, noise_px, Pn)
        v = intr.fy * Xc[:, 1] / Xc[:, 2] + intr.cy + rng.normal(0, noise_px, Pn)
        ok = (u > 0) & (u < intr.width) & (v > 0) & (v < intr.height)
        idx = np.nonzero(ok)[0]
        e_kf.append(np.full(len(idx), k))
        e_pt.append(idx)
        e_obs.append(np.stack([u[idx], v[idx], -np.ones(len(idx))], axis=1))
    e_kf = np.concatenate(e_kf).astype(np.int32)
    e_pt = np.concatenate(e_pt).astype(np.int32)
    e_obs = np.concatenate(e_obs).astype(np.float32)
    E = len(e_kf)

    T_init = T_gt.copy()
    for k in range(1, K):
        tw = rng.normal(0, pose_noise, 6).astype(np.float32)
        T_init[k] = np.asarray(se3.exp_se3(jnp.asarray(tw[None]))[0]) @ T_init[k]
    X_init = X + rng.normal(0, 0.02, X.shape).astype(np.float32)
    free = np.ones(K, bool)
    free[0] = False

    El = 8  # empty line-edge table (padded, all invalid)
    prob = GlobalBAProblem(
        kf_T_cw=jnp.asarray(T_init),
        kf_free=jnp.asarray(free),
        pt_X=jnp.asarray(X_init),
        pt_valid=jnp.ones((Pn,), bool),
        e_kf=jnp.asarray(e_kf),
        e_pt=jnp.asarray(e_pt),
        e_obs=jnp.asarray(e_obs),
        e_stereo=jnp.zeros((E,), bool),
        e_inv_sigma2=jnp.ones((E,), jnp.float32),
        e_valid=jnp.ones((E,), bool),
        le_kf=jnp.zeros((El,), jnp.int32),
        le_lm=jnp.zeros((El,), jnp.int32),
        le_line2d=jnp.zeros((El, 3), jnp.float32),
        le_inv_sigma2=jnp.ones((El,), jnp.float32),
        le_valid=jnp.zeros((El,), bool),
    )
    return prob, T_gt, intr


def test_dist_gba_matches_single_device():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    prob, T_gt, intr = _make_problem()
    res1 = jax.device_get(global_bundle_adjustment(prob, intr, n_iters=8))

    mesh = make_mesh(n_edge=len(jax.devices()), n_seq=1)
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("edge",))
    res8 = jax.device_get(
        dist_global_bundle_adjustment(mesh, prob, intr, n_iters=8)
    )

    # Both reach the same optimum (reduction order differs -> tolerance).
    dT = np.abs(res1.kf_T_cw - res8.kf_T_cw).max()
    assert dT < 1e-4, dT
    # And both are close to ground truth.
    for res in (res1, res8):
        err = np.abs(res.kf_T_cw[:, :3, 3] - T_gt[:, :3, 3]).max()
        assert err < 0.02, err
    assert np.isfinite(res8.chi2)


def test_dist_gba_with_line_edges():
    """Line-endpoint edges shard like point edges (both endpoints of each
    map line are landmarks; the psum path must handle a nonempty table)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    prob, T_gt, intr = _make_problem()
    # Fabricate line-endpoint edges that re-observe existing landmarks
    # along exact image lines through their projections.
    X = np.asarray(prob.pt_X)
    T0 = np.asarray(prob.kf_T_cw[0])
    Xc = (T0[:3, :3] @ X[:16].T).T + T0[:3, 3]
    u = intr.fx * Xc[:, 0] / Xc[:, 2] + intr.cx
    v = intr.fy * Xc[:, 1] / Xc[:, 2] + intr.cy
    # Vertical 2D line through each projection: x - u0 = 0.
    l2d = np.stack([np.ones(16), np.zeros(16), -u], axis=1).astype(np.float32)
    El = prob.le_kf.shape[0]
    n = min(16, El)
    le_kf = np.zeros((El,), np.int32)
    le_lm = np.zeros((El,), np.int32)
    le_l2d = np.zeros((El, 3), np.float32)
    le_valid = np.zeros((El,), bool)
    le_lm[:n] = np.arange(n)
    le_l2d[:n] = l2d[:n]
    le_valid[:n] = True
    prob = prob._replace(
        le_kf=jnp.asarray(le_kf),
        le_lm=jnp.asarray(le_lm),
        le_line2d=jnp.asarray(le_l2d),
        le_valid=jnp.asarray(le_valid),
    )
    res1 = jax.device_get(global_bundle_adjustment(prob, intr, n_iters=6))
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("edge",))
    res8 = jax.device_get(
        dist_global_bundle_adjustment(mesh, prob, intr, n_iters=6)
    )
    assert np.abs(res1.kf_T_cw - res8.kf_T_cw).max() < 1e-4
    assert np.isfinite(res8.pt_X).all()
