import jax.numpy as jnp
import numpy as np

from hfvo_tpu.geometry import se3
from hfvo_tpu.ops import manhattan, planes
from hfvo_tpu.config import tum3_config
from hfvo_tpu.testing import synthetic


def synthetic_bundle(rng, R_gt, n_per_axis=200, noise=0.02, outlier_frac=0.1):
    """Noisy direction observations around the 3 axes of R_gt (+ outliers)."""
    dirs = []
    for a in range(3):
        axis = R_gt[:, a]
        d = axis[None, :] + rng.normal(size=(n_per_axis, 3)) * noise
        d *= rng.choice([-1, 1], (n_per_axis, 1))  # sign ambiguity
        dirs.append(d)
    n_out = int(3 * n_per_axis * outlier_frac)
    dirs.append(rng.normal(size=(n_out, 3)))
    d = np.concatenate(dirs)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return d.astype(np.float32)


def rot_angle(Ra, Rb):
    """Smallest rotation angle mapping axes of Ra onto axes of Rb, up to
    axis permutation/sign (the Manhattan frame is only defined up to the
    cube's symmetry group)."""
    M = np.abs(Ra.T @ Rb)  # |cos| between axis pairs
    # Greedy assignment is fine for near-aligned frames.
    ang = np.arccos(np.clip(M.max(axis=1), -1, 1))
    return ang.max()


def test_refine_axes_converges(rng):
    R_gt = np.asarray(se3.exp_so3(jnp.array([0.2, -0.3, 0.5])))
    d = synthetic_bundle(rng, R_gt)
    # Start from a perturbed rotation (~5 deg off).
    R0 = np.asarray(se3.exp_so3(jnp.array([0.05, 0.03, -0.06]))) @ R_gt
    R, sup = manhattan.refine_axes(
        jnp.asarray(R0.astype(np.float32)), jnp.asarray(d),
        jnp.ones((len(d),)), n_iters=3,
    )
    R = np.asarray(R)
    assert rot_angle(R, R_gt) < 0.01, rot_angle(R, R_gt)
    assert (np.asarray(sup) > 100).all()


def test_refine_axes_two_axes_only(rng):
    """Only two axes observed: the third completes by cross product."""
    R_gt = np.asarray(se3.exp_so3(jnp.array([0.1, 0.2, -0.1])))
    d = []
    for a in (0, 1):
        axis = R_gt[:, a]
        dd = axis[None, :] + rng.normal(size=(150, 3)) * 0.02
        d.append(dd / np.linalg.norm(dd, axis=1, keepdims=True))
    d = np.concatenate(d).astype(np.float32)
    R0 = np.asarray(se3.exp_so3(jnp.array([0.04, -0.03, 0.05]))) @ R_gt
    R, sup = manhattan.refine_axes(
        jnp.asarray(R0.astype(np.float32)), jnp.asarray(d), jnp.ones((len(d),)),
        n_iters=3,
    )
    assert rot_angle(np.asarray(R), R_gt) < 0.02
    # Orthonormal result.
    RtR = np.asarray(R).T @ np.asarray(R)
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-5)


def test_coarse_init_finds_rotation(rng):
    R_gt = np.asarray(se3.exp_so3(jnp.array([0.4, -0.2, 0.3])))
    d = synthetic_bundle(rng, R_gt, outlier_frac=0.05)
    w = np.ones((len(d),), np.float32)
    # Seed pairs from random observation pairs.
    idx = rng.integers(0, len(d), size=(24, 2))
    seeds = d[idx]
    R, rate = manhattan.coarse_manhattan_init(
        jnp.asarray(d), jnp.asarray(w), jnp.asarray(seeds)
    )
    assert float(rate) > 0.9
    assert rot_angle(np.asarray(R), R_gt) < 0.02


def test_coarse_init_rejects_unstructured(rng):
    d = rng.normal(size=(500, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    idx = rng.integers(0, len(d), size=(24, 2))
    R, rate = manhattan.coarse_manhattan_init(
        jnp.asarray(d), jnp.ones((500,)), jnp.asarray(d[idx])
    )
    assert float(rate) < 0.8  # no 0.95-gate pass on isotropic directions


def test_room_normals_give_manhattan(rng):
    """Normals from the rendered room recover the world axes."""
    intr = tum3_config().camera
    T_wc, grays, depths = synthetic.render_sequence(n=1, seed=0)
    n, ok = planes.compute_normals(jnp.asarray(depths[0]), intr)
    d = np.asarray(n)[np.asarray(ok)]
    sub = d[:: max(len(d) // 800, 1)].astype(np.float32)
    idx = rng.integers(0, len(sub), size=(24, 2))
    R_cm, rate = manhattan.coarse_manhattan_init(
        jnp.asarray(sub), jnp.ones((len(sub),)), jnp.asarray(sub[idx])
    )
    assert float(rate) > 0.9
    # World Manhattan axes = identity; camera axes = R_cw @ I.
    R_cw = np.linalg.inv(T_wc[0])[:3, :3]
    assert rot_angle(np.asarray(R_cm), R_cw) < 0.03


def test_line_axis_assignment():
    R = np.eye(3, dtype=np.float32)
    dirs = jnp.asarray(
        np.array(
            [[1, 0.02, 0], [0, -1, 0.03], [0.02, 0, 1], [0.7, 0.7, 0]], np.float32
        )
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    a = np.asarray(manhattan.line_axis_assignment(jnp.asarray(R), dirs))
    assert list(a[:3]) == [0, 1, 2]
    assert a[3] == -1
