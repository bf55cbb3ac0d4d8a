import jax.numpy as jnp
import numpy as np

from hfvo_tpu.config import tum3_config
from hfvo_tpu.geometry import camera, se3
from hfvo_tpu.solve.pnp import pnp_ransac

INTR = tum3_config().camera


def scene(rng, n=80, noise=0.3, outlier_frac=0.0):
    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(2.5, 6, n)], 1
    ).astype(np.float32)
    xi = np.array([0.2, -0.1, 0.15, 0.1, -0.08, 0.12], np.float32)
    T = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    Xc = np.asarray(se3.transform(jnp.asarray(T), jnp.asarray(X)))
    uv = np.array(camera.project(INTR, jnp.asarray(Xc)))
    uv += rng.normal(size=uv.shape) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        uv[:n_out] += rng.uniform(25, 120, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return T, X, uv.astype(np.float32), n_out


def test_pnp_clean(rng):
    T_gt, X, uv, _ = scene(rng, noise=0.0)
    res = pnp_ransac(jnp.asarray(X), jnp.asarray(uv), jnp.ones((80,), bool), INTR, jnp.uint32(0))
    assert bool(res.ok)
    err = np.abs(np.asarray(se3.log_se3(jnp.asarray(T_gt.astype(np.float32)) @ se3.inv(res.T_cw))))
    assert err.max() < 5e-3, err
    assert int(res.n_inliers) == 80


def test_pnp_outliers(rng):
    T_gt, X, uv, n_out = scene(rng, n=120, noise=0.5, outlier_frac=0.3)
    res = pnp_ransac(jnp.asarray(X), jnp.asarray(uv), jnp.ones((120,), bool), INTR, jnp.uint32(3))
    assert bool(res.ok)
    err = np.abs(np.asarray(se3.log_se3(jnp.asarray(T_gt.astype(np.float32)) @ se3.inv(res.T_cw))))
    assert err[:3].max() < 0.02, err
    inl = np.asarray(res.inliers)
    assert inl[n_out:].mean() > 0.9
    assert inl[:n_out].mean() < 0.15


def test_pnp_degenerate_declines(rng):
    # All points coplanar AND nearly collinear in image: DLT unstable; with
    # too few valid points the solver must not report success.
    X = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (20, 1))
    uv = np.tile(np.array([[320.0, 240.0]], np.float32), (20, 1))
    res = pnp_ransac(jnp.asarray(X), jnp.asarray(uv), jnp.zeros((20,), bool), INTR, jnp.uint32(0))
    assert not bool(res.ok)


def test_epnp_exact_general_scene(rng):
    """_epnp_pose recovers an exact pose from one noise-free minimal set
    (reference: PnPsolver::compute_pose beta cases + gauss_newton,
    src/PnPsolver.cc:180-575)."""
    from hfvo_tpu.solve.pnp import _epnp_pose

    T_gt, X, uv, _ = scene(rng, n=6, noise=0.0)
    f = np.array([INTR.fx, INTR.fy])
    c = np.array([INTR.cx, INTR.cy])
    xy_n = (uv - c) / f
    cands = np.asarray(_epnp_pose(jnp.asarray(X), jnp.asarray(xy_n)))
    assert cands.shape == (3, 4, 4)
    errs = [
        np.abs(
            np.asarray(
                se3.log_se3(
                    jnp.asarray(T_gt.astype(np.float32)) @ se3.inv(jnp.asarray(Tc))
                )
            )
        ).max()
        for Tc in cands
    ]
    # At least one beta case nails the pose (the RANSAC scoring pass picks it).
    assert min(errs) < 1e-3, errs


def test_pnp_planar_scene(rng):
    """All 3D points on one plane: the 6-point DLT is rank-deficient, but
    the EPnP candidates keep RANSAC working (reference handles planar sets
    inside EPnP; the repo's earlier DLT-only pool needed the pose prior)."""
    n = 60
    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), np.full(n, 4.0)], 1
    ).astype(np.float32)
    xi = np.array([0.15, -0.1, 0.1, 0.1, -0.05, 0.1], np.float32)
    T_gt = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    Xc = np.asarray(se3.transform(jnp.asarray(T_gt), jnp.asarray(X)))
    uv = np.array(camera.project(INTR, jnp.asarray(Xc))).astype(np.float32)
    res = pnp_ransac(
        jnp.asarray(X), jnp.asarray(uv), jnp.ones((n,), bool), INTR, jnp.uint32(1)
    )
    assert bool(res.ok)
    err = np.abs(
        np.asarray(
            se3.log_se3(jnp.asarray(T_gt.astype(np.float32)) @ se3.inv(res.T_cw))
        )
    )
    assert err.max() < 5e-3, err
    assert int(res.n_inliers) >= n - 2
