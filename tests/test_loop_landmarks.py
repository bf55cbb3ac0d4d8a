"""Loop correction must move EVERY landmark type with its owning keyframe
(reference: CorrectLoop transforms points, lines, and planes with their
reference KF, src/LoopClosing.cc:439-474) — round 1 left lines/planes stale
(ADVICE high)."""
import numpy as np

from hfvo_tpu.config import VOConfig, Capacities
from hfvo_tpu.mapping.loop_closing import LoopCloser
from hfvo_tpu.vomap.map import VOMap


def _rot(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def test_correct_landmarks_moves_lines_planes_and_moments():
    cfg = VOConfig(cap=Capacities(
        keypoints=32, map_points=64, map_lines=16, map_planes=8, keyframes=4,
        lines=8, planes=4,
    ))
    vm = VOMap(cfg)
    C = cfg.cap.keypoints
    k0 = vm.add_keyframe(
        np.eye(4, dtype=np.float32), 0, np.full((C,), -1, np.int32),
        np.zeros((C, 3), np.float32), np.zeros((C,), np.int32),
        np.zeros((C, 8), np.uint32), np.zeros((C,), bool),
    )
    rng = np.random.RandomState(0)
    X = rng.randn(5, 3).astype(np.float32)
    pids = vm.add_points(
        X, np.zeros((5, 8), np.uint32), np.zeros((5, 3), np.float32),
        np.zeros((5,), np.int32), 0,
    )
    vm.points.first_kf[pids] = k0
    L0 = rng.randn(3, 3).astype(np.float32)
    L1 = L0 + rng.randn(3, 3).astype(np.float32)
    lids = vm.add_lines(L0, L1, np.zeros((3, 36), np.float32), 0, first_kf=k0)
    # A plane through points with normal nz: pi = (0,0,1,-1) i.e. z = 1.
    pts = rng.randn(50, 3) * np.array([1.0, 1.0, 0.0]) + np.array([0, 0, 1.0])
    mu = pts.mean(0)
    cov = np.cov(pts.T, bias=True)
    plid = vm.add_planes(
        np.array([[0, 0, 1, -1]], np.float32), mu[None].astype(np.float32),
        np.array([50.0], np.float32), 0, cov_w=cov[None], first_kf=k0,
    )

    # One rigid world correction M applied to the only keyframe.
    R = _rot([0.3, 1.0, 0.2], 0.4)
    t = np.array([0.5, -0.2, 0.8])
    M = np.eye(4)
    M[:3, :3], M[:3, 3] = R, t
    T_old = vm.keyframes.T_cw[[k0]].astype(np.float64)
    T_new = (T_old[0] @ np.linalg.inv(M))[None]  # inv(T_new) @ T_old = M

    lc = LoopCloser(cfg, vm)
    lc._correct_landmarks(np.array([k0]), T_old, T_new)

    np.testing.assert_allclose(vm.points.X_w[pids], (R @ X.T).T + t, atol=1e-5)
    np.testing.assert_allclose(vm.lines.X0_w[lids], (R @ L0.T).T + t, atol=1e-5)
    np.testing.assert_allclose(vm.lines.X1_w[lids], (R @ L1.T).T + t, atol=1e-5)
    # Plane coefficients: transformed points satisfy the corrected plane.
    pi = vm.planes.pi_w[plid[0]]
    pts_new = (R @ pts.T).T + t
    resid = pts_new @ pi[:3] + pi[3]
    assert np.abs(resid).max() < 1e-4
    # Moments stay coherent: a refit from the pushed-forward moments must
    # reproduce the corrected plane.
    vm._refit_planes(np.asarray(plid))
    pi2 = vm.planes.pi_w[plid[0]]
    s = np.sign(pi2[:3] @ pi[:3])
    np.testing.assert_allclose(s * pi2, pi, atol=1e-4)


def test_consistency_gate_requires_consecutive_detection():
    """One isolated BoW hit must not trigger geometric verification
    (reference: consistency groups over consecutive KFs,
    src/LoopClosing.cc:160-208)."""

    class _DB:
        pass

    cfg = VOConfig(cap=Capacities(
        keypoints=16, map_points=64, keyframes=64, lines=8, planes=4,
        map_lines=16, map_planes=8,
    ))
    vm = VOMap(cfg)
    C = cfg.cap.keypoints
    rng = np.random.RandomState(1)
    # 20 distinct keyframes with disjoint observations (no covisibility).
    pids = vm.add_points(
        rng.randn(40, 3).astype(np.float32), np.zeros((40, 8), np.uint32),
        np.zeros((40, 3), np.float32), np.zeros((40,), np.int32), 0,
    )
    for i in range(20):
        point_id = np.full((C,), -1, np.int32)
        point_id[:2] = pids[2 * i: 2 * i + 2]
        vm.add_keyframe(
            np.eye(4, dtype=np.float32), i, point_id,
            np.zeros((C, 3), np.float32), np.zeros((C,), np.int32),
            np.zeros((C, 8), np.uint32), point_id >= 0,
        )
    from hfvo_tpu.bow.vocab import N_WORDS

    class Trk:
        pass

    trk = Trk()
    db = _DB()
    db.hists = np.zeros((cfg.cap.keyframes, N_WORDS), np.float32)
    db.valid = np.zeros((cfg.cap.keyframes,), bool)
    db.valid[:20] = True
    # KF 2 and the newest KF 19 share an identical appearance histogram.
    h = rng.rand(N_WORDS).astype(np.float32)
    h /= h.sum()
    db.hists[:20] = rng.rand(20, N_WORDS).astype(np.float32)
    db.hists[:20] /= db.hists[:20].sum(axis=1, keepdims=True)
    db.hists[2] = h
    db.hists[19] = h
    trk.kf_db = db

    lc = LoopCloser(cfg, vm, min_gap_kfs=5, min_score=0.1)
    cur = vm.newest_kf_slot
    first = lc._detect_candidate(trk, cur)
    assert first is None and lc._consistency_count == 1
    second = lc._detect_candidate(trk, cur)
    assert second == 2 and lc._consistency_count == 2
