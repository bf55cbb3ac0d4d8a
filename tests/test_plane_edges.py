import jax.numpy as jnp
import numpy as np

from hfvo_tpu.config import tum3_config
from hfvo_tpu.geometry import se3
from hfvo_tpu.solve.lm import PlaneObs, PoseObs, pose_optimization

INTR = tum3_config().camera


def transform_plane(T_cw, pi_w):
    """pi_c = (R n, d - t . R n) for plane n.X + d = 0."""
    R, t = T_cw[:3, :3], T_cw[:3, 3]
    n_c = R @ pi_w[:3]
    d_c = pi_w[3] - t @ n_c
    return np.concatenate([n_c, [d_c]])


def make_plane_scene(rng):
    pi_w = np.array(
        [
            [0, 0, -1, 3.0],  # wall z=3 (normal towards camera at origin)
            [-1, 0, 0, 3.0],  # wall x=3
            [0, -1, 0, 2.0],  # floor y=2
        ],
        np.float32,
    )
    xi = np.array([0.05, -0.04, 0.06, 0.03, -0.02, 0.04], np.float32)
    T_gt = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    pi_obs = np.stack([transform_plane(T_gt, p) for p in pi_w]).astype(np.float32)
    return pi_w, pi_obs, T_gt


def empty_points(n=4):
    return PoseObs(
        X_w=jnp.zeros((n, 3)),
        obs=jnp.zeros((n, 3)),
        is_stereo=jnp.zeros((n,), bool),
        inv_sigma2=jnp.ones((n,)),
        valid=jnp.zeros((n,), bool),
    )


def test_three_planes_fully_constrain_pose(rng):
    pi_w, pi_obs, T_gt = make_plane_scene(rng)
    planes = PlaneObs(
        pi_w=jnp.asarray(pi_w),
        pi_obs=jnp.asarray(pi_obs),
        kind=jnp.zeros((3,), jnp.int32),
        weight=jnp.asarray(np.tile([0.5, 0.5, 100.0], (3, 1)).astype(np.float32)),
        chi2_th=jnp.full((3,), 100.0),
        valid=jnp.ones((3,), bool),
    )
    T0 = np.asarray(se3.exp_se3(jnp.asarray(
        np.array([0.03, 0.02, -0.04, 0.02, 0.015, -0.01], np.float32)))) @ T_gt
    res = pose_optimization(jnp.asarray(T0), empty_points(), INTR, planes=planes)
    err = np.asarray(se3.log_se3(jnp.asarray(T_gt.astype(np.float32)) @ se3.inv(res.T_cw)))
    assert np.abs(err).max() < 1e-3, err
    assert bool(np.asarray(res.plane_inlier).all())


def test_parallel_vertical_constraints_fix_rotation(rng):
    pi_w, pi_obs, T_gt = make_plane_scene(rng)
    # Constraint-only edges over two observed normals: two parallel edges pin
    # all 3 rotation DoF; a vertical edge adds redundancy. (A single observed
    # normal leaves rotation about it unobservable.)
    pi_w_edges = np.stack([pi_w[0], pi_w[1], pi_w[2]])
    pi_obs_edges = np.stack([pi_obs[0], pi_obs[1], pi_obs[0]])
    kinds = np.array([1, 1, 2], np.int32)
    planes = PlaneObs(
        pi_w=jnp.asarray(pi_w_edges),
        pi_obs=jnp.asarray(pi_obs_edges),
        kind=jnp.asarray(kinds),
        weight=jnp.asarray(np.tile([0.5, 0, 0], (3, 1)).astype(np.float32)),
        chi2_th=jnp.full((3,), 50.0),
        valid=jnp.ones((3,), bool),
    )
    # Perturb rotation only.
    T0 = np.asarray(se3.exp_se3(jnp.asarray(
        np.array([0.0, 0.0, 0.0, 0.03, -0.02, 0.025], np.float32)))) @ T_gt
    res = pose_optimization(jnp.asarray(T0), empty_points(), INTR, planes=planes)
    err = np.asarray(se3.log_se3(jnp.asarray(T_gt.astype(np.float32)) @ se3.inv(res.T_cw)))
    assert np.abs(err[3:]).max() < 5e-3, err  # rotation recovered


def test_plane_outlier_gated(rng):
    pi_w, pi_obs, T_gt = make_plane_scene(rng)
    # Corrupt one observation badly.
    pi_obs = pi_obs.copy()
    bad_n = pi_obs[2, :3] + np.array([0.7, 0.7, 0.0], np.float32)
    pi_obs[2, :3] = bad_n / np.linalg.norm(bad_n)
    pi_obs[2, 3] += 1.5
    planes = PlaneObs(
        pi_w=jnp.asarray(pi_w),
        pi_obs=jnp.asarray(pi_obs),
        kind=jnp.zeros((3,), jnp.int32),
        weight=jnp.asarray(np.tile([0.5, 0.5, 100.0], (3, 1)).astype(np.float32)),
        chi2_th=jnp.full((3,), 100.0),
        valid=jnp.ones((3,), bool),
    )
    # Points to keep the pose observable despite the outlier plane.
    from hfvo_tpu.geometry import camera

    X_w = np.stack([rng.uniform(-2, 2, 50), rng.uniform(-1.5, 1.5, 50), rng.uniform(2, 5, 50)], 1).astype(np.float32)
    X_c = np.asarray(se3.transform(jnp.asarray(T_gt.astype(np.float32)), jnp.asarray(X_w)))
    obs = np.array(camera.project_stereo(INTR, jnp.asarray(X_c)))
    pts = PoseObs(
        X_w=jnp.asarray(X_w), obs=jnp.asarray(obs),
        is_stereo=jnp.ones((50,), bool), inv_sigma2=jnp.ones((50,)),
        valid=jnp.ones((50,), bool),
    )
    T0 = np.asarray(se3.exp_se3(jnp.asarray(
        np.array([0.02, 0.01, -0.02, 0.01, 0.01, -0.01], np.float32)))) @ T_gt
    res = pose_optimization(jnp.asarray(T0), pts, INTR, planes=planes)
    err = np.asarray(se3.log_se3(jnp.asarray(T_gt.astype(np.float32)) @ se3.inv(res.T_cw)))
    assert np.abs(err).max() < 2e-3, err
    inl = np.asarray(res.plane_inlier)
    assert inl[0] and inl[1] and not inl[2]
