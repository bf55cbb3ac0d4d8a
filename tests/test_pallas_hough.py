"""Parity: the MXU one-hot-matmul Hough vote (ops/pallas_hough.py) against
the scan formulation in ops/lines._tile_hough."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hfvo_tpu.ops import lines as line_ops
from hfvo_tpu.ops.pallas_hough import hough_vote_pallas


def _scan_reference(gray, mag_th):
    """The scan path of _tile_hough, whatever backend we're on."""
    from hfvo_tpu.ops.image import sobel_gradients

    gx, gy = sobel_gradients(gray)
    mag = jnp.sqrt(gx * gx + gy * gy)
    normal_ang = jnp.arctan2(gy, gx) % jnp.pi
    return mag, normal_ang


def _to_tiles(a):
    TILE = line_ops.TILE
    H, W = a.shape
    ty, tx = H // TILE, W // TILE
    return (
        a[: ty * TILE, : tx * TILE]
        .reshape(ty, TILE, tx, TILE)
        .transpose(0, 2, 1, 3)
        .reshape(ty * tx, TILE * TILE)
    )


def _scan_acc(mag, normal_ang, mag_th):
    H, W = mag.shape
    TILE, N_THETA, N_RHO = line_ops.TILE, line_ops.N_THETA, line_ops.N_RHO
    ty, tx = H // TILE, W // TILE
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    def to_tiles(a):
        return (
            a[: ty * TILE, : tx * TILE]
            .reshape(ty, TILE, tx, TILE)
            .transpose(0, 2, 1, 3)
            .reshape(ty * tx, TILE * TILE)
        )

    m_t = to_tiles(mag)
    na_t = to_tiles(normal_ang)
    ox = (jax.lax.broadcasted_iota(jnp.float32, (ty, tx), 1) * TILE).reshape(-1)
    oy = (jax.lax.broadcasted_iota(jnp.float32, (ty, tx), 0) * TILE).reshape(-1)
    xl = to_tiles(xx) - ox[:, None]
    yl = to_tiles(yy) - oy[:, None]
    theta_bin = jnp.clip(
        (na_t / jnp.pi * N_THETA).astype(jnp.int32), 0, N_THETA - 1
    )
    diag = TILE * np.sqrt(2.0)
    w = jnp.where(m_t > mag_th, m_t, 0.0)
    rho_iota = jnp.arange(N_RHO, dtype=jnp.int32)

    def vote_row(_, t):
        th = (t.astype(jnp.float32) + 0.5) / N_THETA * jnp.pi
        rho = xl * jnp.cos(th) + yl * jnp.sin(th)
        rb = jnp.clip(
            ((rho / diag + 1.0) * 0.5 * N_RHO).astype(jnp.int32), 0, N_RHO - 1
        )
        wt = w * (
            (theta_bin == t).astype(jnp.float32)
            + 0.5 * (theta_bin == (t - 1) % N_THETA).astype(jnp.float32)
            + 0.5 * (theta_bin == (t + 1) % N_THETA).astype(jnp.float32)
        )
        onehot = (rb[:, :, None] == rho_iota).astype(jnp.float32)
        return None, jnp.einsum("tp,tpb->tb", wt, onehot)

    _, rows = jax.lax.scan(vote_row, None, jnp.arange(N_THETA))
    return rows.transpose(1, 0, 2)


@pytest.mark.parametrize("shape", [(256, 320), (192, 448), (128, 128)])
def test_vote_matches_scan(shape):
    rng = np.random.default_rng(0)
    gray = jnp.asarray(
        rng.uniform(0, 255, size=shape).astype(np.float32)
    )
    mag, na = _scan_reference(gray, 12.0)
    ref = np.asarray(_scan_acc(mag, na, 12.0))
    m_t, na_t = _to_tiles(mag), _to_tiles(na)
    got = np.asarray(hough_vote_pallas(m_t, na_t, 12.0, interpret=True))
    assert got.shape == ref.shape
    # bf16 weights round ~0.4% per element; isolated small-value bins can
    # reach a few percent. What detection consumes is the top-k peak RANKING
    # per tile, so gate on: tight mean, loose max, and peak agreement.
    denom = np.maximum(np.abs(ref), 1.0)
    rel = np.abs(got - ref) / denom
    assert np.mean(rel) < 0.005
    assert np.max(rel) < 0.05
    ref_top = np.argsort(ref.reshape(ref.shape[0], -1), axis=1)[:, -4:]
    got_top = np.argsort(got.reshape(got.shape[0], -1), axis=1)[:, -4:]
    agree = np.mean([
        len(set(ref_top[t]) & set(got_top[t])) for t in range(ref.shape[0])
    ])
    assert agree >= 3.5


def test_vote_batched_rule(monkeypatch):
    rng = np.random.default_rng(1)
    grays = jnp.asarray(rng.uniform(0, 255, size=(3, 128, 192)).astype(np.float32))
    mags, nas = jax.vmap(lambda g: _scan_reference(g, 12.0))(grays)
    mts = jax.vmap(_to_tiles)(mags)
    nts = jax.vmap(_to_tiles)(nas)
    got = jax.vmap(
        lambda m, n: hough_vote_pallas(m, n, 12.0, interpret=True)
    )(mts, nts)
    for i in range(3):
        ref = np.asarray(_scan_acc(mags[i], nas[i], 12.0))
        denom = np.maximum(np.abs(ref), 1.0)
        assert np.max(np.abs(np.asarray(got[i]) - ref) / denom) < 0.02


def test_detect_lines_structured_scene():
    """End-to-end sanity on a synthetic striped image: the kernel-backed
    detector must fire on the stripe edges (runs the scan path on CPU, so
    this exercises the shared decode/extract stages either way)."""
    H, W = 256, 320
    img = np.zeros((H, W), np.float32)
    for x0 in range(40, W - 40, 60):
        img[:, x0 : x0 + 4] = 200.0
    lf = line_ops.detect_lines(jnp.asarray(img))
    n = int(np.sum(np.asarray(lf.valid)))
    assert n >= 4


def test_flip_is_exact_descriptor_permutation():
    """detect_lines' canonical-orientation flip relies on:
    band_descriptors(p1, p0) == bands-reversed, channels-swapped
    band_descriptors(p0, p1). Exact because the sample point set is
    symmetric under the endpoint swap."""
    from hfvo_tpu.ops.image import sobel_gradients
    from hfvo_tpu.ops.lines import DESC_BANDS, band_descriptors

    rng = np.random.default_rng(2)
    gray = jnp.asarray(rng.uniform(0, 255, size=(128, 160)).astype(np.float32))
    gx, gy = sobel_gradients(gray)
    p0 = jnp.asarray(rng.uniform(10, 110, size=(20, 2)).astype(np.float32))
    p1 = jnp.asarray(rng.uniform(10, 110, size=(20, 2)).astype(np.float32))
    fwd = np.asarray(band_descriptors(gray, gx, gy, p0, p1))
    bwd = np.asarray(band_descriptors(gray, gx, gy, p1, p0))
    M = fwd.shape[0]
    perm = fwd.reshape(M, DESC_BANDS, 4)[:, ::-1, :][:, :, [1, 0, 3, 2]]
    np.testing.assert_allclose(bwd, perm.reshape(M, -1), rtol=1e-5, atol=1e-6)
