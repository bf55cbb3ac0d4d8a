import os

import jax.numpy as jnp
import numpy as np

from hfvo_tpu.config import tum1_config, tum3_config
from hfvo_tpu.geometry import camera, se3
from hfvo_tpu.io import evaluate, trajectory


def test_project_unproject_roundtrip(rng):
    intr = tum3_config().camera
    uv = rng.uniform(low=[0, 0], high=[640, 480], size=(100, 2)).astype(np.float32)
    depth = rng.uniform(0.5, 5.0, size=(100,)).astype(np.float32)
    X = camera.unproject(intr, jnp.asarray(uv), jnp.asarray(depth))
    uv2 = camera.project(intr, X)
    np.testing.assert_allclose(np.asarray(uv2), uv, atol=1e-3)


def test_stereo_projection():
    intr = tum3_config().camera
    X = jnp.array([[0.5, -0.2, 2.0]], dtype=jnp.float32)
    uvr = camera.project_stereo(intr, X)
    assert np.asarray(uvr)[0, 2] == np.asarray(uvr)[0, 0] - intr.bf / 2.0


def test_undistort_inverts_distortion(rng):
    intr = tum1_config().camera  # has real TUM1 distortion coefficients
    uv_ideal = rng.uniform(low=[100, 100], high=[540, 380], size=(50, 2)).astype(
        np.float32
    )
    f = np.array([intr.fx, intr.fy], np.float32)
    c = np.array([intr.cx, intr.cy], np.float32)
    xy = (uv_ideal - c) / f
    uv_dist = np.asarray(camera.distort_normalized(intr, jnp.asarray(xy))) * f + c
    uv_rec = np.asarray(camera.undistort_points(intr, jnp.asarray(uv_dist), iters=20))
    np.testing.assert_allclose(uv_rec, uv_ideal, atol=0.05)


def _random_trajectory(rng, n=50):
    ts = np.arange(n, dtype=np.float64) / 30.0
    xi = rng.normal(size=(n, 6)).astype(np.float32) * 0.2
    T = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    return ts, T


def test_tum_trajectory_roundtrip(rng, tmp_path):
    ts, T = _random_trajectory(rng)
    path = os.path.join(tmp_path, "traj.txt")
    trajectory.save_tum(path, ts, T)
    ts2, T2 = trajectory.load_tum(path)
    np.testing.assert_allclose(ts, ts2, atol=1e-6)
    np.testing.assert_allclose(T, T2, atol=1e-5)


def test_ate_zero_on_identical(rng):
    ts, T = _random_trajectory(rng)
    res = evaluate.ate(ts, T, ts, T, align="origin")
    assert res.rmse < 1e-6
    res2 = evaluate.ate(ts, T, ts, T, align="umeyama")
    assert res2.rmse < 1e-5


def test_ate_invariant_to_rigid_offset(rng):
    ts, T = _random_trajectory(rng)
    offset = np.asarray(
        se3.exp_se3(jnp.array([1.0, -2.0, 0.5, 0.3, -0.1, 0.2], dtype=jnp.float32))
    )
    T_shifted = np.einsum("ij,njk->nik", offset, T)
    res = evaluate.ate(ts, T, ts, T_shifted, align="umeyama")
    assert res.rmse < 1e-4
    # align_origin also removes a global offset exactly
    res2 = evaluate.ate(ts, T, ts, T_shifted, align="origin")
    assert res2.rmse < 1e-4


def test_ate_detects_error(rng):
    ts, T = _random_trajectory(rng)
    T_noisy = T.copy()
    T_noisy[:, :3, 3] += rng.normal(size=(len(ts), 3)) * 0.05
    res = evaluate.ate(ts, T, ts, T_noisy, align="umeyama")
    assert 0.02 < res.rmse < 0.2
