import jax
import jax.numpy as jnp
import numpy as np

from hfvo_tpu.config import tum3_config
from hfvo_tpu.ops import lk
from hfvo_tpu.testing import synthetic

INTR = tum3_config().camera


def textured(rng, h=240, w=320):
    base = rng.uniform(0, 255, (h // 8, w // 8)).astype(np.float32)
    return np.asarray(jax.image.resize(jnp.asarray(base), (h, w), "cubic"))


def test_lk_pure_translation(rng):
    img0 = textured(rng)
    dx, dy = 6.0, -4.0
    img1 = np.roll(np.roll(img0, int(dy), axis=0), int(dx), axis=1)
    p0 = rng.uniform([40, 40], [280, 200], size=(50, 2)).astype(np.float32)
    p1, ok = lk.pyr_lk(jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(p0), jnp.asarray(p0))
    p1, ok = np.asarray(p1), np.asarray(ok)
    assert ok.mean() > 0.8
    flow = p1[ok] - p0[ok]
    np.testing.assert_allclose(np.median(flow, axis=0), [dx, dy], atol=0.3)


def test_lk_rejects_occluded(rng):
    img0 = textured(rng)
    img1 = textured(np.random.default_rng(99))  # unrelated frame
    p0 = rng.uniform([40, 40], [280, 200], size=(30, 2)).astype(np.float32)
    p1, ok = lk.pyr_lk(jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(p0), jnp.asarray(p0))
    assert np.asarray(ok).mean() < 0.5


def test_rotation_warp_matches_rendered(rng):
    """Rotation-only camera motion: the K R K^-1 warp must predict pixel
    motion on the rendered room."""
    from hfvo_tpu.geometry import se3

    scene = synthetic.make_room(0)
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, 3] = [0, 0, -0.8]
    R = np.asarray(se3.exp_so3(jnp.array([0.0, 0.04, 0.0])))  # 2.3 deg yaw
    T1 = T0.copy()
    T1[:3, :3] = T0[:3, :3] @ R
    g0, d0 = synthetic.render_jit(scene, INTR, jnp.asarray(T0))
    g1, d1 = synthetic.render_jit(scene, INTR, jnp.asarray(T1))
    # cam1 <- cam0 rotation: R_10 = R_c1w @ R_w_c0 = R^T
    R_10 = R.T.astype(np.float32)
    uv = rng.uniform([100, 100], [540, 380], size=(40, 2)).astype(np.float32)
    warped = np.asarray(
        lk.warp_points_by_rotation(INTR, jnp.asarray(uv), jnp.asarray(R_10))
    )
    # LK from the warped guess should converge with small residual motion.
    p1, ok = lk.pyr_lk(jnp.asarray(g0), jnp.asarray(g1), jnp.asarray(uv), jnp.asarray(warped))
    p1, ok = np.asarray(p1), np.asarray(ok)
    assert ok.mean() > 0.7
    # The final track should be near the warp prediction (motion is pure
    # rotation, scene depth >> translation 0).
    assert np.median(np.linalg.norm(p1[ok] - warped[ok], axis=1)) < 1.0


def test_recover_line_by_flow(rng):
    """A stripe line tracked across a small camera rotation lands on the
    stripe in the next frame."""
    from hfvo_tpu.geometry import se3
    from hfvo_tpu.ops import lines

    scene = synthetic.make_room(0)
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, 3] = [0, 0, -0.8]
    R = np.asarray(se3.exp_so3(jnp.array([0.0, 0.03, 0.0])))
    T1 = T0.copy()
    T1[:3, :3] = T0[:3, :3] @ R
    g0, _ = synthetic.render_jit(scene, INTR, jnp.asarray(T0))
    g1, _ = synthetic.render_jit(scene, INTR, jnp.asarray(T1))
    lf0 = lines.detect_lines(g0)
    v = np.asarray(lf0.valid)
    lengths = np.asarray(lf0.length)
    i = int(np.argmax(np.where(v, lengths, 0)))  # longest line
    q0, q1, ok = lk.recover_line_by_flow(
        INTR, g0, g1,
        lf0.p0[i], lf0.p1[i], jnp.asarray(R.T.astype(np.float32)),
    )
    assert bool(ok)
    # The recovered segment should coincide with a detected line in frame 1.
    lf1 = lines.detect_lines(g1)
    v1 = np.asarray(lf1.valid)
    p0_1, p1_1 = np.asarray(lf1.p0)[v1], np.asarray(lf1.p1)[v1]
    mid = 0.5 * (np.asarray(q0) + np.asarray(q1))
    d = p1_1 - p0_1
    n = np.stack([-d[:, 1], d[:, 0]], 1)
    n /= np.linalg.norm(n, axis=1, keepdims=True) + 1e-9
    perp = np.abs((n * (mid[None, :] - p0_1)).sum(1))
    assert perp.min() < 3.0, f"recovered line {perp.min():.1f}px from nearest detection"


def test_dense_flow_translation(rng):
    """Dense cost-volume flow recovers a uniform translation (the TPU-native
    replacement for scattered-gather pyramidal LK on the batched path)."""
    img0 = textured(rng, h=240, w=320)
    dx, dy = 8.0, -6.0
    img1 = np.roll(np.roll(img0, int(dy), axis=0), int(dx), axis=1)
    flow, conf = lk.dense_flow_half(jnp.asarray(img0), jnp.asarray(img1))
    f = np.asarray(flow)[20:100, 20:140]  # interior
    np.testing.assert_allclose(np.median(f[..., 0]), dx, atol=0.6)
    np.testing.assert_allclose(np.median(f[..., 1]), dy, atol=0.6)


def test_recover_lines_by_flow_batched(rng):
    """Batched dense-flow line recovery lands segments on the rendered
    stripes across a small rotation (live-tracker path)."""
    from hfvo_tpu.geometry import se3
    from hfvo_tpu.ops import lines

    scene = synthetic.make_room(0)
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, 3] = [0, 0, -0.8]
    R = np.asarray(se3.exp_so3(jnp.array([0.0, 0.03, 0.0])))
    T1 = T0.copy()
    T1[:3, :3] = T0[:3, :3] @ R
    g0, _ = synthetic.render_jit(scene, INTR, jnp.asarray(T0))
    g1, _ = synthetic.render_jit(scene, INTR, jnp.asarray(T1))
    lf0 = lines.detect_lines(g0)
    valid = jnp.asarray(lf0.valid)
    q0, q1, ok = lk.recover_lines_by_flow(
        INTR, g0, g1, lf0.p0, lf0.p1, valid,
        jnp.asarray(R.T.astype(np.float32)), n_pts=16,
    )
    ok = np.asarray(ok)
    assert ok.sum() >= 0.5 * np.asarray(valid).sum(), (
        ok.sum(), np.asarray(valid).sum())
    # Each recovered segment should lie near a detected frame-1 line.
    lf1 = lines.detect_lines(g1)
    v1 = np.asarray(lf1.valid)
    p0_1, p1_1 = np.asarray(lf1.p0)[v1], np.asarray(lf1.p1)[v1]
    d = p1_1 - p0_1
    n = d[:, ::-1] * np.array([-1.0, 1.0])
    n = n / (np.linalg.norm(n, axis=1, keepdims=True) + 1e-9)
    mids = 0.5 * (np.asarray(q0)[ok] + np.asarray(q1)[ok])
    perp = np.abs(
        np.einsum("mc,nc->mn", mids, n)
        - np.einsum("nc,nc->n", p0_1, n)[None, :]
    )
    near = perp.min(axis=1)
    assert np.median(near) < 3.0, np.median(near)
