"""Fixed-sweep Jacobi eigh vs jnp.linalg.eigh (ops/sym_eig.py).

The fused per-frame program uses eigh3/eigh4 for plane block fits
(reference: PEAC's closed-form eig33sym, include/peac/eig33sym.hpp),
3D line PCA, VP refinement, and DLT triangulation.
"""
import numpy as np
import jax.numpy as jnp

from hfvo_tpu.ops import sym_eig


def _rand_sym(rng, n, k, scale=1.0):
    A = rng.normal(size=(k, n, n)).astype(np.float32) * scale
    return (A + A.swapaxes(-1, -2)) / 2


def _check(A, w, V, tol):
    A = np.asarray(A, np.float64)
    w = np.asarray(w, np.float64)
    V = np.asarray(V, np.float64)
    # ascending
    assert (np.diff(w, axis=-1) >= -tol).all()
    # orthonormal
    I = np.eye(A.shape[-1])
    ortho = np.abs(V.swapaxes(-1, -2) @ V - I).max()
    assert ortho < 1e-5, ortho
    # A v = w v
    res = A @ V - w[..., None, :] * V
    scale = np.abs(w).max(axis=-1).clip(1e-6)[:, None, None]
    assert (np.abs(res) / scale).max() < tol, (np.abs(res) / scale).max()


def test_eigh3_random():
    rng = np.random.default_rng(0)
    A = _rand_sym(rng, 3, 512)
    w, V = sym_eig.eigh3(jnp.asarray(A))
    _check(A, w, V, 5e-5)
    # matches the reference eigenvalues
    w_ref = np.linalg.eigvalsh(A)
    assert np.abs(np.asarray(w) - w_ref).max() < 1e-4


def test_eigh3_degenerate():
    """Masked-out plane blocks produce (near-)zero covariances; the solver
    must stay finite and orthonormal there."""
    rng = np.random.default_rng(1)
    A = np.zeros((6, 3, 3), np.float32)
    A[1] = np.eye(3)  # triple eigenvalue
    A[2] = np.diag([1.0, 1.0, 2.0])  # double
    A[3] = 1e-10 * np.eye(3, dtype=np.float32)
    B = _rand_sym(rng, 3, 1)[0]
    A[4] = B * 1e4  # large scale
    A[5] = B * 1e-4  # small scale
    w, V = sym_eig.eigh3(jnp.asarray(A))
    assert np.isfinite(np.asarray(w)).all()
    assert np.isfinite(np.asarray(V)).all()
    _check(A, w, V, 5e-5)


def test_eigh3_smallest_eigenvector_plane_normal():
    """Plane-fit usage: smallest eigenvector of a rank-2 covariance is the
    plane normal."""
    rng = np.random.default_rng(2)
    n = np.array([0.3, -0.5, 0.81], np.float32)
    n /= np.linalg.norm(n)
    # covariance of points spread in the plane orthogonal to n
    u = np.cross(n, [0, 0, 1.0]); u /= np.linalg.norm(u)
    v = np.cross(n, u)
    pts = rng.normal(size=(400, 2)).astype(np.float32) @ np.stack([u, v]).astype(np.float32)
    cov = (pts.T @ pts / len(pts)).astype(np.float32)
    w, V = sym_eig.eigh3(jnp.asarray(cov[None]))
    n_est = np.asarray(V)[0, :, 0]
    assert abs(abs(n_est @ n) - 1.0) < 1e-4


def test_eigh4_random():
    rng = np.random.default_rng(3)
    A = _rand_sym(rng, 4, 256)
    w, V = sym_eig.eigh4(jnp.asarray(A))
    _check(A, w, V, 5e-5)
    w_ref = np.linalg.eigvalsh(A)
    assert np.abs(np.asarray(w) - w_ref).max() < 1e-4


def test_inv3x3_and_blocked6x6_match_lu():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    A = A @ A.transpose(0, 2, 1) + 0.5 * np.eye(3)  # SPD, well-conditioned
    got = np.asarray(sym_eig.inv3x3(jnp.asarray(A)))
    ref = np.linalg.inv(A)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    B = rng.normal(size=(32, 6, 6)).astype(np.float32)
    B = B @ B.transpose(0, 2, 1) + 0.5 * np.eye(6)
    got6 = np.asarray(sym_eig.inv6x6_blocked(jnp.asarray(B)))
    ref6 = np.linalg.inv(B)
    np.testing.assert_allclose(got6, ref6, rtol=2e-3, atol=2e-3)
