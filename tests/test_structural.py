import jax.numpy as jnp
import numpy as np

from hfvo_tpu.ops import structural


def unit(v):
    return v / np.linalg.norm(v)


def test_discover_pairs():
    d3 = np.array(
        [
            [1, 0, 0],
            [0.9998, 0.02, 0],  # ~1.1 deg from line 0 -> parallel
            [0, 1, 0],  # perpendicular to 0
            [0.7, 0.7, 0.14],  # neither
        ],
        np.float32,
    )
    d3 = d3 / np.linalg.norm(d3, axis=1, keepdims=True)
    d2 = d3[:, :2]
    d2 = d2 / (np.linalg.norm(d2, axis=1, keepdims=True) + 1e-9)
    pairs = structural.discover_pairs(
        jnp.asarray(d2), jnp.asarray(d3), jnp.ones((4,), bool)
    )
    par = np.asarray(pairs.par)
    perp = np.asarray(pairs.perp)
    assert par[0, 1] and not par[0, 2] and not par[0, 3]
    assert perp[0, 2] and not perp[0, 1]
    assert not par[1, 0]  # upper-triangular only


def test_line_opt_struct_snaps_parallel():
    """Two nearly-parallel noisy lines + one perpendicular: after refinement
    the pair angles are (near-)exact while endpoints stay close to input."""
    rng = np.random.default_rng(0)
    X0 = np.array([[0, 0, 3], [0, 0.5, 3], [0, 1, 3]], np.float32)
    d = np.stack([
        unit(np.array([1.0, 0.03, 0.01])),   # ~2 deg off x-axis
        unit(np.array([1.0, -0.035, 0.0])),  # ~2 deg off the other way
        unit(np.array([0.02, 1.0, 0.015])),  # ~y-axis
    ]).astype(np.float32)
    X1 = X0 + d
    par = np.zeros((3, 3), bool)
    par[0, 1] = True
    perp = np.zeros((3, 3), bool)
    perp[0, 2] = True
    X0n, X1n = structural.line_opt_struct(
        jnp.asarray(X0), jnp.asarray(X1), jnp.ones((3,), bool),
        jnp.asarray(par), jnp.asarray(perp),
        jnp.zeros((3, 3), jnp.float32), jnp.zeros((3,), bool),
        n_iters=30,
    )
    X0n, X1n = np.asarray(X0n), np.asarray(X1n)
    u = np.array(X1n) - np.array(X0n)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    ang01 = np.degrees(np.arccos(np.clip(abs(u[0] @ u[1]), -1, 1)))
    ang02 = np.degrees(np.arccos(np.clip(abs(u[0] @ u[2]), -1, 1)))
    assert ang01 < 1.0, ang01  # pair snapped toward parallel
    assert ang02 > 87.5, ang02
    # Endpoints moved only slightly.
    assert np.linalg.norm(X0n - X0, axis=1).max() < 0.05
    assert np.linalg.norm(X1n - X1, axis=1).max() < 0.05


def test_line_opt_struct_axis_alignment():
    X0 = np.array([[0, 0, 3]], np.float32)
    d = unit(np.array([1.0, 0.05, 0.03])).astype(np.float32)
    X1 = X0 + d
    axis = np.array([[1.0, 0, 0]], np.float32)
    X0n, X1n = structural.line_opt_struct(
        jnp.asarray(X0), jnp.asarray(X1), jnp.ones((1,), bool),
        jnp.zeros((1, 1), bool), jnp.zeros((1, 1), bool),
        jnp.asarray(axis), jnp.ones((1,), bool),
        n_iters=40,
    )
    u = np.array(X1n - X0n)[0]
    u /= np.linalg.norm(u)
    ang = np.degrees(np.arccos(np.clip(abs(u @ axis[0]), -1, 1)))
    assert ang < 1.5, ang


def test_line_opt_struct_prunes_bad_pairs():
    """A falsely-labeled parallel pair at 20 deg should be pruned, not
    force-merged."""
    X0 = np.array([[0, 0, 3], [0, 0.5, 3]], np.float32)
    d = np.stack([
        unit(np.array([1.0, 0.0, 0.0])),
        unit(np.array([0.94, 0.34, 0.0])),  # 20 deg off
    ]).astype(np.float32)
    X1 = X0 + d
    par = np.zeros((2, 2), bool)
    par[0, 1] = True
    X0n, X1n = structural.line_opt_struct(
        jnp.asarray(X0), jnp.asarray(X1), jnp.ones((2,), bool),
        jnp.asarray(par), jnp.zeros((2, 2), bool),
        jnp.zeros((2, 3), jnp.float32), jnp.zeros((2,), bool),
        n_iters=30,
    )
    u = np.array(X1n - X0n)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    ang = np.degrees(np.arccos(np.clip(abs(u[0] @ u[1]), -1, 1)))
    assert ang > 15.0, f"bad pair was force-merged: {ang}"


def test_invalid_lines_untouched():
    X0 = np.zeros((4, 3), np.float32)
    X1 = np.ones((4, 3), np.float32)
    valid = np.array([True, False, True, False])
    X0n, X1n = structural.line_opt_struct(
        jnp.asarray(X0), jnp.asarray(X1), jnp.asarray(valid),
        jnp.zeros((4, 4), bool), jnp.zeros((4, 4), bool),
        jnp.zeros((4, 3), jnp.float32), jnp.zeros((4,), bool),
    )
    np.testing.assert_allclose(np.asarray(X0n)[~valid], X0[~valid])
    np.testing.assert_allclose(np.asarray(X1n)[~valid], X1[~valid])
