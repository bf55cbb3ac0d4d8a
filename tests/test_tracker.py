"""End-to-end tracking on the synthetic room: the golden-trajectory test
(SURVEY.md §4 implication: gated by ATE bounds)."""
import jax.numpy as jnp
import numpy as np
import pytest

from hfvo_tpu.config import tum3_config
from hfvo_tpu.io import evaluate
from hfvo_tpu.testing import synthetic
from hfvo_tpu.tracking import matcher
from hfvo_tpu.tracking.tracker import Tracker, TrackState


@pytest.fixture(scope="module")
def sequence():
    return synthetic.render_sequence(n=25, seed=0)


def test_search_by_projection_basic(rng):
    # Landmarks visible in front of an identity camera; keypoints at exact
    # projections with identical descriptors.
    from hfvo_tpu.geometry import camera

    intr = tum3_config().camera
    L, N = 64, 64
    X = np.stack(
        [rng.uniform(-1, 1, L), rng.uniform(-0.7, 0.7, L), rng.uniform(2, 4, L)], 1
    ).astype(np.float32)
    uv = np.array(camera.project(intr, jnp.asarray(X)))
    desc = rng.integers(0, 2**32, (L, 8), dtype=np.uint32)
    res = matcher.search_by_projection(
        jnp.asarray(X), jnp.asarray(desc), jnp.ones((L,), bool),
        jnp.arange(L, dtype=jnp.int32), jnp.zeros((L,), jnp.int32),
        jnp.asarray(uv), jnp.asarray(desc), jnp.zeros((N,), jnp.int32),
        jnp.ones((N,), bool), jnp.eye(4), intr,
    )
    pt = np.asarray(res.pt_id_per_kp)
    assert int(res.n_matches) == L
    np.testing.assert_array_equal(pt, np.arange(L))


def test_search_by_projection_view_cos_gate(rng):
    """Viewing-direction gate (reference: Frame::isInFrustum viewCos <
    viewingCosLimit = 0.5, src/Frame.cc:1371-1427): a point whose mean
    observation direction opposes the current viewing ray is rejected;
    zero-normal (fresh) points pass ungated."""
    from hfvo_tpu.geometry import camera

    intr = tum3_config().camera
    L = 8
    X = np.stack(
        [rng.uniform(-1, 1, L), rng.uniform(-0.7, 0.7, L), rng.uniform(2, 4, L)], 1
    ).astype(np.float32)
    uv = np.array(camera.project(intr, jnp.asarray(X)))
    desc = rng.integers(0, 2**32, (L, 8), dtype=np.uint32)
    view = X / np.linalg.norm(X, axis=1, keepdims=True)  # camera at origin
    normal = view.copy()
    normal[0] = -view[0]          # seen from the opposite side -> reject
    normal[1] = 0.0               # no accumulated normal -> pass
    # 60-deg-boundary case: rotate view[2] by ~70 deg -> reject.
    axis = np.array([view[2][1], -view[2][0], 0.0])
    axis /= np.linalg.norm(axis) + 1e-9
    from hfvo_tpu.geometry import se3 as _se3
    R70 = np.asarray(_se3.exp_so3(jnp.asarray((axis * np.deg2rad(70)).astype(np.float32))))
    normal[2] = R70 @ view[2]
    args = (
        jnp.asarray(X), jnp.asarray(desc), jnp.ones((L,), bool),
        jnp.arange(L, dtype=jnp.int32), jnp.zeros((L,), jnp.int32),
        jnp.asarray(uv), jnp.asarray(desc), jnp.zeros((L,), jnp.int32),
        jnp.ones((L,), bool), jnp.eye(4), intr,
    )
    res = matcher.search_by_projection(
        *args, map_normal=jnp.asarray(normal.astype(np.float32))
    )
    pt = np.asarray(res.pt_id_per_kp)
    assert pt[0] == -1 and pt[2] == -1  # gated out
    assert pt[1] == 1                   # zero normal passes
    assert (pt[3:] == np.arange(3, L)).all()
    # Without normals everything matches (the pre-gate behavior).
    res2 = matcher.search_by_projection(*args)
    assert int(res2.n_matches) == L


def test_search_by_projection_conflict(rng):
    # Two landmarks projecting to the same keypoint: closest descriptor wins.
    from hfvo_tpu.geometry import camera

    intr = tum3_config().camera
    X = np.array([[0.0, 0.0, 3.0], [0.0, 0.0, 3.0]], np.float32)
    uv = np.array(camera.project(intr, jnp.asarray(X)))[:1]
    kp_desc = rng.integers(0, 2**32, (1, 8), dtype=np.uint32)
    desc = np.stack([kp_desc[0] ^ np.uint32(0b111), kp_desc[0]])  # 3 bits vs 0 bits
    res = matcher.search_by_projection(
        jnp.asarray(X), jnp.asarray(desc), jnp.ones((2,), bool),
        jnp.arange(2, dtype=jnp.int32), jnp.zeros((2,), jnp.int32),
        jnp.asarray(uv), jnp.asarray(kp_desc), jnp.zeros((1,), jnp.int32),
        jnp.ones((1,), bool), jnp.eye(4), intr,
    )
    assert int(res.n_matches) == 1
    assert int(np.asarray(res.pt_id_per_kp)[0]) == 1  # exact-match landmark wins


def test_tracking_synthetic_sequence(sequence):
    T_wc_gt, grays, depths = sequence
    cfg = tum3_config()
    tracker = Tracker(cfg)
    est = []
    for g, d in zip(grays, depths):
        res = tracker.track_rgbd(g, d, T_cw_init=np.linalg.inv(T_wc_gt[0]))
        assert res.state is TrackState.OK, f"lost at frame {len(est)}"
        est.append(np.linalg.inv(res.T_cw))  # store T_wc
    est = np.stack(est)
    ts = np.arange(len(est)) / 30.0
    ape = evaluate.ate(ts, T_wc_gt, ts, est, align="origin")
    # Synthetic room, exact depth: should track well under 2 cm RMSE.
    assert ape.rmse < 0.02, f"ATE RMSE {ape.rmse:.4f} m"


def test_tracking_survives_textureless_frames(sequence):
    """Blank out one frame (lost) and confirm recovery on the next."""
    T_wc_gt, grays, depths = sequence
    cfg = tum3_config()
    tracker = Tracker(cfg)
    n_lost = 0
    for i, (g, d) in enumerate(zip(grays[:10], depths[:10])):
        if i == 5:
            g = np.full_like(g, 128.0)  # featureless frame
        res = tracker.track_rgbd(g, d, T_cw_init=np.linalg.inv(T_wc_gt[0]))
        if res.state is TrackState.LOST:
            n_lost += 1
    assert n_lost <= 1
    assert res.state is TrackState.OK  # recovered by the end
