import jax
import jax.numpy as jnp
import numpy as np

from hfvo_tpu.config import tum3_config
from hfvo_tpu.geometry import camera, se3
from hfvo_tpu.solve import residuals
from hfvo_tpu.solve.lm import LineObs, PoseObs, pose_optimization

CFG = tum3_config()
INTR = CFG.camera


def make_scene(rng, n=200, noise=0.0, outlier_frac=0.0):
    """Random landmarks in front of a ground-truth camera, observed with noise."""
    X_w = np.stack(
        [
            rng.uniform(-2, 2, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(2.0, 6.0, n),
        ],
        axis=1,
    ).astype(np.float32)
    xi = np.array([0.1, -0.05, 0.08, 0.04, -0.03, 0.06], np.float32)
    T_cw = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    X_c = np.asarray(se3.transform(jnp.asarray(T_cw), jnp.asarray(X_w)))
    obs = np.array(camera.project_stereo(INTR, jnp.asarray(X_c)))
    obs[:, :2] += rng.normal(size=(n, 2)) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        obs[:n_out, :2] += rng.uniform(20, 80, size=(n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return T_cw, X_w, obs, n_out


def make_obs(X_w, obs, stereo=True):
    n = len(X_w)
    return PoseObs(
        X_w=jnp.asarray(X_w),
        obs=jnp.asarray(obs),
        is_stereo=jnp.full((n,), stereo),
        inv_sigma2=jnp.ones((n,)),
        valid=jnp.ones((n,), bool),
    )


def test_jacobian_matches_autodiff(rng):
    X_w = jnp.asarray(rng.uniform(-1, 1, (5, 3)).astype(np.float32) + np.array([0, 0, 3]))
    obs = jnp.zeros((5, 3))
    T = se3.exp_se3(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.1))

    def res_of_twist(xi):
        Tp = se3.exp_se3(xi) @ T
        r, _, _ = residuals.point_stereo_residual(Tp, X_w, obs, INTR)
        return r

    J_auto = jax.jacobian(res_of_twist)(jnp.zeros(6))  # (5, 3, 6)
    _, J_analytic, _ = residuals.point_stereo_residual(T, X_w, obs, INTR)
    np.testing.assert_allclose(np.asarray(J_auto), np.asarray(J_analytic), atol=1e-2, rtol=1e-3)


def test_line_jacobian_matches_autodiff(rng):
    X_w = jnp.asarray(rng.uniform(-1, 1, (5, 3)).astype(np.float32) + np.array([0, 0, 3]))
    ab = rng.normal(size=(5, 2)).astype(np.float32)
    ab /= np.linalg.norm(ab, axis=1, keepdims=True)
    line2d = jnp.asarray(np.concatenate([ab, rng.normal(size=(5, 1)).astype(np.float32) * 100], axis=1))
    T = se3.exp_se3(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.1))

    def res_of_twist(xi):
        Tp = se3.exp_se3(xi) @ T
        r, _, _ = residuals.line_endpoint_residual(Tp, X_w, line2d, INTR)
        return r

    J_auto = jax.jacobian(res_of_twist)(jnp.zeros(6))
    _, J_analytic, _ = residuals.line_endpoint_residual(T, X_w, line2d, INTR)
    np.testing.assert_allclose(np.asarray(J_auto), np.asarray(J_analytic), atol=1e-2, rtol=1e-3)


def test_pose_opt_converges_clean(rng):
    T_gt, X_w, obs, _ = make_scene(rng, n=200, noise=0.0)
    T0 = np.asarray(
        se3.exp_se3(jnp.asarray(np.array([0.05, -0.03, 0.02, 0.02, 0.01, -0.02], np.float32)))
    ) @ T_gt
    res = pose_optimization(jnp.asarray(T0), make_obs(X_w, obs), INTR)
    err = np.asarray(se3.log_se3(jnp.asarray(T_gt) @ se3.inv(res.T_cw)))
    assert np.abs(err).max() < 1e-3, err
    assert int(res.n_inliers) == 200


def test_pose_opt_rejects_outliers(rng):
    T_gt, X_w, obs, n_out = make_scene(rng, n=300, noise=0.5, outlier_frac=0.2)
    T0 = np.asarray(
        se3.exp_se3(jnp.asarray(np.array([0.05, 0.02, -0.03, 0.01, -0.02, 0.02], np.float32)))
    ) @ T_gt
    res = pose_optimization(jnp.asarray(T0), make_obs(X_w, obs), INTR)
    err = np.asarray(se3.log_se3(jnp.asarray(T_gt) @ se3.inv(res.T_cw)))
    # Translation within ~1 cm, rotation within ~0.5 deg despite 20% outliers.
    assert np.abs(err[:3]).max() < 0.02, err
    assert np.abs(err[3:]).max() < 0.01, err
    inlier = np.asarray(res.inlier)
    assert inlier[n_out:].mean() > 0.95  # keeps the good edges
    assert inlier[:n_out].mean() < 0.1  # rejects the gross outliers


def test_pose_opt_with_lines(rng):
    T_gt, X_w, obs, _ = make_scene(rng, n=60, noise=0.2)
    # Build 3D line endpoints + their GT image lines.
    m = 40
    P1 = np.stack([rng.uniform(-2, 2, m), rng.uniform(-1.5, 1.5, m), rng.uniform(2, 5, m)], 1).astype(np.float32)
    P2 = P1 + rng.normal(size=(m, 3)).astype(np.float32) * 0.5
    uv1 = np.asarray(camera.project(INTR, se3.transform(jnp.asarray(T_gt), jnp.asarray(P1))))
    uv2 = np.asarray(camera.project(INTR, se3.transform(jnp.asarray(T_gt), jnp.asarray(P2))))
    d = uv2 - uv1
    n_ab = np.stack([-d[:, 1], d[:, 0]], 1)
    n_ab /= np.linalg.norm(n_ab, axis=1, keepdims=True) + 1e-9
    c = -(n_ab * uv1).sum(1)
    line2d = np.concatenate([n_ab, c[:, None]], 1).astype(np.float32)
    lines = LineObs(
        X_w=jnp.asarray(np.concatenate([P1, P2])),
        line2d=jnp.asarray(np.concatenate([line2d, line2d])),
        inv_sigma2=jnp.ones((2 * m,)),
        valid=jnp.ones((2 * m,), bool),
    )
    T0 = np.asarray(
        se3.exp_se3(jnp.asarray(np.array([0.04, -0.02, 0.03, 0.015, 0.02, -0.01], np.float32)))
    ) @ T_gt
    res = pose_optimization(jnp.asarray(T0), make_obs(X_w, obs), INTR, lines=lines)
    err = np.asarray(se3.log_se3(jnp.asarray(T_gt) @ se3.inv(res.T_cw)))
    assert np.abs(err[:3]).max() < 0.02
    assert int(np.asarray(res.line_inlier).sum()) > 70


def test_pose_opt_all_invalid_is_stable():
    n = 16
    pts = PoseObs(
        X_w=jnp.zeros((n, 3)),
        obs=jnp.zeros((n, 3)),
        is_stereo=jnp.ones((n,), bool),
        inv_sigma2=jnp.ones((n,)),
        valid=jnp.zeros((n,), bool),
    )
    T0 = jnp.eye(4)
    res = pose_optimization(T0, pts, INTR)
    assert np.isfinite(np.asarray(res.T_cw)).all()
    np.testing.assert_allclose(np.asarray(res.T_cw), np.eye(4), atol=1e-5)
    assert int(res.n_inliers) == 0
