import jax.numpy as jnp
import numpy as np

from hfvo_tpu.config import tum3_config
from hfvo_tpu.geometry import camera, se3
from hfvo_tpu.solve.initializer import initialize_two_view

INTR = tum3_config().camera


def two_view(rng, n=200, planar=False, noise=0.2):
    if planar:
        X = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), np.full(n, 4.0)], 1
        ).astype(np.float32)
    else:
        X = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(2.5, 7, n)], 1
        ).astype(np.float32)
    xi = np.array([0.3, 0.05, 0.1, 0.02, -0.06, 0.01], np.float32)  # baseline 0.3m
    T_21 = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    uv1 = np.array(camera.project(INTR, jnp.asarray(X)))
    X2 = np.asarray(se3.transform(jnp.asarray(T_21), jnp.asarray(X)))
    uv2 = np.array(camera.project(INTR, jnp.asarray(X2)))
    uv1 += rng.normal(size=uv1.shape) * noise
    uv2 += rng.normal(size=uv2.shape) * noise
    return T_21, X, uv1.astype(np.float32), uv2.astype(np.float32)


def test_general_scene_selects_F_and_recovers_pose(rng):
    T_gt, X, uv1, uv2 = two_view(rng, planar=False)
    res = initialize_two_view(
        INTR, jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones((200,), bool), jnp.uint32(0)
    )
    assert bool(res.ok)
    assert not bool(res.used_H)
    T = np.asarray(res.T_21)
    # Rotation exact up to noise; translation up to scale.
    R_err = np.abs(np.asarray(se3.log_so3(jnp.asarray(T_gt[:3, :3] @ T[:3, :3].T)))).max()
    assert R_err < 0.01, R_err
    t_dir = T[:3, 3] / np.linalg.norm(T[:3, 3])
    t_gt = T_gt[:3, 3] / np.linalg.norm(T_gt[:3, 3])
    assert abs(t_dir @ t_gt) > 0.995
    # Triangulated structure matches GT up to the global scale.
    Xr = np.asarray(res.X_1)
    inl = np.asarray(res.inliers)
    s = np.median(X[inl][:, 2] / np.maximum(Xr[inl][:, 2], 1e-9))
    rel = np.linalg.norm(Xr[inl] * s - X[inl], axis=1) / np.linalg.norm(X[inl], axis=1)
    assert np.median(rel) < 0.02


def test_planar_scene_selects_H(rng):
    T_gt, X, uv1, uv2 = two_view(rng, planar=True)
    res = initialize_two_view(
        INTR, jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones((200,), bool), jnp.uint32(1)
    )
    assert bool(res.used_H)


def test_insufficient_matches_declines(rng):
    T_gt, X, uv1, uv2 = two_view(rng)
    valid = np.zeros((200,), bool)
    valid[:10] = True
    res = initialize_two_view(
        INTR, jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid), jnp.uint32(2)
    )
    assert not bool(res.ok)
