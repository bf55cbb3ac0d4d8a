import jax.numpy as jnp
import numpy as np

from hfvo_tpu.bow import vocab
from hfvo_tpu.config import tum3_config
from hfvo_tpu.geometry import se3
from hfvo_tpu.solve.ransac import kabsch, ransac_rigid_3d3d
from hfvo_tpu.testing import synthetic
from hfvo_tpu.tracking.tracker import Tracker, TrackState


def test_words_are_locality_sensitive(rng):
    """Similar descriptors map to the same word far more often than random."""
    d = rng.integers(0, 2**32, (200, 8), dtype=np.uint32)
    w1 = np.asarray(vocab.compute_words(jnp.asarray(d)))
    # Flip 5 random bits in each descriptor.
    d2 = d.copy()
    for i in range(200):
        for _ in range(5):
            word = rng.integers(0, 8)
            bit = np.uint32(1) << np.uint32(rng.integers(0, 32))
            d2[i, word] ^= bit
    w2 = np.asarray(vocab.compute_words(jnp.asarray(d2)))
    same_after_5bits = (w1 == w2).mean()
    d3 = rng.integers(0, 2**32, (200, 8), dtype=np.uint32)
    w3 = np.asarray(vocab.compute_words(jnp.asarray(d3)))
    same_random = (w1 == w3).mean()
    assert same_after_5bits > 0.5
    assert same_random < 0.05


def test_kabsch_exact(rng):
    X = rng.normal(size=(20, 3)).astype(np.float32)
    T_gt = np.asarray(se3.exp_se3(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.5)))
    Y = (T_gt[:3, :3] @ X.T).T + T_gt[:3, 3]
    T = np.asarray(kabsch(jnp.asarray(Y), jnp.asarray(X), jnp.ones((20,))))
    np.testing.assert_allclose(T, T_gt, atol=1e-4)


def test_ransac_3d3d_with_outliers(rng):
    n = 100
    X = rng.normal(size=(n, 3)).astype(np.float32) * 2
    T_gt = np.asarray(se3.exp_se3(jnp.asarray(np.array([0.3, -0.2, 0.5, 0.2, 0.1, -0.3], np.float32))))
    Y = (T_gt[:3, :3] @ X.T).T + T_gt[:3, 3]
    Y[:30] += rng.uniform(0.5, 2.0, (30, 3))  # 30% outliers
    res = ransac_rigid_3d3d(
        jnp.asarray(Y), jnp.asarray(X), jnp.ones((n,), bool), jnp.uint32(0)
    )
    assert bool(res.ok)
    assert int(res.n_inliers) >= 65
    err = np.asarray(se3.log_se3(jnp.asarray(T_gt.astype(np.float32)) @ se3.inv(res.T_ab)))
    assert np.abs(err).max() < 0.01


def test_kidnapped_relocalization():
    """Track a few frames, blind the camera for 3 frames (LOST), then show a
    view near the start: BoW reloc must recover the true pose."""
    cfg = tum3_config()
    T_wc, grays, depths = synthetic.render_sequence(n=12, seed=0)
    tr = Tracker(cfg, use_local_ba=False, auto_reset=False)
    for i in range(8):
        tr.track_rgbd(grays[i], depths[i], T_cw_init=np.linalg.inv(T_wc[0]))
    assert tr.vomap.n_keyframes() >= 2
    blank = np.full_like(grays[0], 120.0)
    for _ in range(2):
        r = tr.track_rgbd(blank, np.zeros_like(depths[0]))
    assert r.state is TrackState.LOST
    # Kidnapped to frame 1's viewpoint.
    r = tr.track_rgbd(grays[1], depths[1])
    assert r.state is TrackState.OK, "relocalization failed"
    T_gt = np.linalg.inv(T_wc[1])
    err = np.asarray(
        se3.log_se3(jnp.asarray(T_gt.astype(np.float32)) @ se3.inv(jnp.asarray(r.T_cw)))
    )
    assert np.abs(err[:3]).max() < 0.05, err


def test_kabsch_sim3_recovers_scale(rng):
    from hfvo_tpu.solve.ransac import kabsch_sim3

    X = rng.normal(size=(30, 3)).astype(np.float32) * 2
    s_gt = 1.7
    T_gt = np.asarray(se3.exp_se3(jnp.asarray(np.array([0.2, -0.1, 0.3, 0.1, 0.2, -0.1], np.float32))))
    Y = s_gt * (T_gt[:3, :3] @ X.T).T + T_gt[:3, 3]
    s, T = kabsch_sim3(jnp.asarray(Y), jnp.asarray(X), jnp.ones((30,)))
    assert abs(float(s) - s_gt) < 1e-3
    np.testing.assert_allclose(np.asarray(T)[:3, :3], T_gt[:3, :3], atol=1e-4)
    rec = float(s) * (np.asarray(T)[:3, :3] @ X.T).T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(rec, Y, atol=1e-3)
