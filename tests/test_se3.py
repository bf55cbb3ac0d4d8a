import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hfvo_tpu.geometry import se3


def random_rotations(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return np.asarray(se3.mat_from_quat(jnp.asarray(q)))


def test_exp_log_so3_roundtrip(rng):
    w = rng.normal(size=(64, 3)).astype(np.float32) * 1.5
    R = se3.exp_so3(jnp.asarray(w))
    w2 = se3.log_so3(R)
    R2 = se3.exp_so3(w2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=2e-5)


def test_exp_so3_small_angle(rng):
    w = rng.normal(size=(8, 3)).astype(np.float32) * 1e-6
    R = np.asarray(se3.exp_so3(jnp.asarray(w)))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), R.shape), atol=1e-5)


def test_log_so3_near_pi():
    # Rotation by pi around z.
    w = jnp.array([0.0, 0.0, np.pi - 1e-4], dtype=jnp.float32)
    R = se3.exp_so3(w)
    w2 = se3.log_so3(R)
    np.testing.assert_allclose(np.abs(np.asarray(w2)[2]), np.pi - 1e-4, atol=1e-3)


def test_exp_log_se3_roundtrip(rng):
    xi = rng.normal(size=(32, 6)).astype(np.float32)
    T = se3.exp_se3(jnp.asarray(xi))
    xi2 = se3.log_se3(T)
    T2 = se3.exp_se3(xi2)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T2), atol=2e-5)


def test_inv_compose(rng):
    xi = rng.normal(size=(16, 6)).astype(np.float32)
    T = se3.exp_se3(jnp.asarray(xi))
    I = np.asarray(T @ se3.inv(T))
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), I.shape), atol=1e-5)


def test_transform_matches_matmul(rng):
    xi = rng.normal(size=(6,)).astype(np.float32)
    T = se3.exp_se3(jnp.asarray(xi))
    X = rng.normal(size=(10, 3)).astype(np.float32)
    Y = np.asarray(se3.transform(T, jnp.asarray(X)))
    Xh = np.concatenate([X, np.ones((10, 1), np.float32)], axis=1)
    Y2 = (np.asarray(T) @ Xh.T).T[:, :3]
    np.testing.assert_allclose(Y, Y2, atol=1e-5)


def test_quat_roundtrip(rng):
    R = random_rotations(rng, 64)
    q = se3.quat_from_mat(jnp.asarray(R))
    R2 = np.asarray(se3.mat_from_quat(q))
    np.testing.assert_allclose(R, R2, atol=1e-5)
    # Unit norm, canonical sign
    qn = np.asarray(q)
    np.testing.assert_allclose(np.linalg.norm(qn, axis=1), 1.0, atol=1e-5)
    assert np.all(qn[:, 3] >= -1e-7)


def test_orthonormalize(rng):
    R = random_rotations(rng, 8) + rng.normal(size=(8, 3, 3)).astype(np.float32) * 0.05
    Ro = np.asarray(se3.orthonormalize(jnp.asarray(R)))
    err = Ro @ np.transpose(Ro, (0, 2, 1)) - np.eye(3)
    assert np.abs(err).max() < 1e-5
    np.testing.assert_allclose(np.linalg.det(Ro), 1.0, atol=1e-5)


def test_jit_compatible():
    f = jax.jit(lambda xi: se3.log_se3(se3.exp_se3(xi)))
    xi = jnp.array([0.1, -0.2, 0.3, 0.02, 0.05, -0.01], dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=1e-5)
