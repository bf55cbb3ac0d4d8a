"""Epipolar triangulation of new map points (reference:
LocalMapping::CreateNewMapPoints, src/LocalMapping.cc:335-660)."""
import numpy as np
import jax.numpy as jnp

from hfvo_tpu.config import tum3_config, Capacities
from hfvo_tpu.mapping.local_mapping import LocalMapper
from hfvo_tpu.ops.triangulate import triangulate_pair
from hfvo_tpu.vomap.map import VOMap


def _project(cam, X_c):
    return np.stack(
        [
            cam.fx * X_c[:, 0] / X_c[:, 2] + cam.cx,
            cam.fy * X_c[:, 1] / X_c[:, 2] + cam.cy,
        ],
        axis=1,
    )


def _rand_descs(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def test_triangulate_pair_recovers_depth():
    rng = np.random.default_rng(0)
    cfg = tum3_config()
    cam = cfg.camera
    C = 64
    # Points 4-12 m out (beyond a typical RGB-D range), in view of both.
    X_w = np.stack(
        [
            rng.uniform(-2.0, 2.0, C),
            rng.uniform(-1.5, 1.5, C),
            rng.uniform(4.0, 12.0, C),
        ],
        axis=1,
    ).astype(np.float32)
    T_a = np.eye(4, dtype=np.float32)
    T_b = np.eye(4, dtype=np.float32)
    T_b[:3, 3] = [-0.4, 0.05, 0.0]  # strong horizontal baseline
    uv_a = _project(cam, X_w)
    X_b = (T_b[:3, :3] @ X_w.T).T + T_b[:3, 3]
    uv_b = _project(cam, X_b)
    desc = _rand_descs(rng, C)
    inside = lambda uv: (
        (uv[:, 0] > 5) & (uv[:, 0] < 634) & (uv[:, 1] > 5) & (uv[:, 1] < 474)
    )
    cand = inside(uv_a) & inside(uv_b)
    T_ab = T_a @ np.linalg.inv(T_b)
    res = triangulate_pair(
        cam,
        jnp.asarray(uv_a), jnp.asarray(desc), jnp.asarray(cand),
        jnp.zeros((C,), jnp.int32),
        jnp.asarray(uv_b), jnp.asarray(desc), jnp.asarray(cand),
        jnp.zeros((C,), jnp.int32),
        jnp.asarray(T_ab),
    )
    ok = np.asarray(res.ok)
    assert ok.sum() >= 0.8 * cand.sum()
    # Matches must be identity (same descriptor index).
    mb = np.asarray(res.match_b)
    assert (mb[ok] == np.nonzero(np.ones(C))[0][ok]).all()
    X_rec = np.asarray(res.X_a)[ok]
    err = np.linalg.norm(X_rec - X_w[ok], axis=1)
    assert np.median(err) < 0.05, f"median triangulation err {np.median(err)}"


def test_triangulate_rejects_no_baseline():
    rng = np.random.default_rng(1)
    cfg = tum3_config()
    cam = cfg.camera
    C = 32
    X_w = np.stack(
        [rng.uniform(-1, 1, C), rng.uniform(-1, 1, C), rng.uniform(4, 8, C)],
        axis=1,
    ).astype(np.float32)
    uv = _project(cam, X_w)
    desc = _rand_descs(rng, C)
    cand = np.ones((C,), bool)
    res = triangulate_pair(
        cam,
        jnp.asarray(uv), jnp.asarray(desc), jnp.asarray(cand),
        jnp.zeros((C,), jnp.int32),
        jnp.asarray(uv), jnp.asarray(desc), jnp.asarray(cand),
        jnp.zeros((C,), jnp.int32),
        jnp.asarray(np.eye(4, dtype=np.float32)),  # zero baseline
    )
    # Parallax gate must kill everything.
    assert not np.asarray(res.ok).any()


def test_create_new_map_points_registers_both_views():
    rng = np.random.default_rng(2)
    cfg = tum3_config().replace(cap=Capacities(keyframes=8))
    cam = cfg.camera
    vm = VOMap(cfg)
    C = vm.keyframes.point_id.shape[1]
    n = 80
    X_w = np.stack(
        [
            rng.uniform(-2, 2, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(5.0, 10.0, n),
        ],
        axis=1,
    ).astype(np.float32)
    T_a = np.eye(4, dtype=np.float32)
    T_b = np.eye(4, dtype=np.float32)
    T_b[:3, 3] = [-0.5, 0.0, 0.0]
    desc = np.zeros((C, 8), np.uint32)
    desc[:n] = _rand_descs(rng, n)

    def kf_arrays(T):
        X_c = (T[:3, :3] @ X_w.T).T + T[:3, 3]
        uv = _project(cam, X_c)
        obs = np.zeros((C, 3), np.float32)
        obs[:n, :2] = uv
        obs[:, 2] = -1.0  # no depth anywhere -> triangulation is the only path
        kp_valid = np.zeros((C,), bool)
        kp_valid[:n] = (
            (uv[:, 0] > 5) & (uv[:, 0] < 634) & (uv[:, 1] > 5) & (uv[:, 1] < 474)
        )
        return obs, kp_valid

    obs_a, va = kf_arrays(T_a)
    obs_b, vb = kf_arrays(T_b)
    pid = np.full((C,), -1, np.int32)
    ov = np.zeros((C,), bool)
    oct_ = np.zeros((C,), np.int32)
    # Give the pair some shared landmarks so covisibility links them.
    shared = vm.add_points(
        X_w[:20], desc[:20], np.tile([[0, 0, 1.0]], (20, 1)).astype(np.float32),
        np.zeros(20, np.int32), 0,
    )
    pid_a = pid.copy(); ov_a = ov.copy()
    pid_a[:20] = shared; ov_a[:20] = True
    pid_b = pid.copy(); ov_b = ov.copy()
    pid_b[:20] = shared; ov_b[:20] = True
    ka = vm.add_keyframe(T_a, 0, pid_a, obs_a, oct_, desc, ov_a, kp_valid=va)
    kb = vm.add_keyframe(T_b, 1, pid_b, obs_b, oct_, desc, ov_b, kp_valid=vb)
    mapper = LocalMapper(cfg, vm)
    made = mapper.create_new_map_points()
    assert made >= 40, f"only {made} triangulated"
    kf = vm.keyframes
    new_a = kf.point_id[kb] >= 0
    # Both views observe each created point; positions match ground truth.
    ids = kf.point_id[kb][new_a & vb]
    ids = ids[ids >= 0]
    assert (vm.points.n_obs[ids] == 2).all()
    err = np.linalg.norm(
        vm.points.X_w[kf.point_id[ka][20:n]][kf.point_id[ka][20:n] >= 0]
        - X_w[20:n][kf.point_id[ka][20:n] >= 0],
        axis=1,
    )
    assert np.median(err) < 0.05


def test_triangulate_lines_pair_synthetic(rng):
    """Two-view line triangulation with third-view verification recovers 3D
    segments (reference: CreateNewMapLinesConstraint semantics)."""
    import jax.numpy as jnp
    from hfvo_tpu.config import tum3_config
    from hfvo_tpu.geometry import se3, camera
    from hfvo_tpu.ops.triangulate import triangulate_lines_pair

    intr = tum3_config().camera
    n = 24
    C = 64
    # Random 3D segments in front of the cameras.
    X0 = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1, 1, n),
                   rng.uniform(3, 6, n)], 1).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    X1 = X0 + d * rng.uniform(0.5, 1.5, (n, 1)).astype(np.float32)

    def view(T):
        q0 = np.array(camera.project(intr, se3.transform(jnp.asarray(T), jnp.asarray(X0))))
        q1 = np.array(camera.project(intr, se3.transform(jnp.asarray(T), jnp.asarray(X1))))
        return q0.astype(np.float32), q1.astype(np.float32)

    T_a = np.eye(4, dtype=np.float32)
    T_b = np.asarray(se3.exp_se3(jnp.asarray(np.array([0.4, 0.05, 0, 0, 0.03, 0], np.float32))))
    T_c = np.asarray(se3.exp_se3(jnp.asarray(np.array([-0.3, 0, 0.05, 0.02, 0, 0], np.float32))))
    qa0, qa1 = view(T_a)
    qb0, qb1 = view(T_b)
    qc0, qc1 = view(T_c)

    # Shared descriptors per line (same descriptor in both views).
    desc = rng.normal(size=(n, 36)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)

    def pad2(a, fill=0.0):
        out = np.full((C,) + a.shape[1:], fill, np.float32)
        out[: len(a)] = a
        return out

    cand = np.zeros((C,), bool)
    cand[:n] = True
    T_ab = (T_a @ np.linalg.inv(T_b)).astype(np.float32)
    T_ca = (T_c @ np.linalg.inv(T_a)).astype(np.float32)
    res = triangulate_lines_pair(
        intr,
        jnp.asarray(pad2(qa0)), jnp.asarray(pad2(qa1)), jnp.asarray(pad2(desc)),
        jnp.asarray(cand),
        jnp.asarray(pad2(qb0)), jnp.asarray(pad2(qb1)), jnp.asarray(pad2(desc)),
        jnp.asarray(cand),
        jnp.asarray(T_ab),
        jnp.asarray(pad2(qc0)), jnp.asarray(pad2(qc1)), jnp.asarray(cand),
        jnp.asarray(T_ca),
    )
    ok = np.asarray(res.ok)[:n]
    X0r = np.asarray(res.X0_a)[:n]
    X1r = np.asarray(res.X1_a)[:n]
    assert ok.sum() >= n * 0.6, ok.sum()
    err0 = np.linalg.norm(X0r[ok] - X0[ok], axis=1)
    err1 = np.linalg.norm(X1r[ok] - X1[ok], axis=1)
    assert np.median(err0) < 0.01 and np.median(err1) < 0.01, (
        np.median(err0), np.median(err1))
    # Correct matches: match_b should be the identity for accepted lines.
    mb = np.asarray(res.match_b)[:n]
    assert (mb[ok] == np.nonzero(cand)[0][: n][ok]).mean() > 0.95


def test_create_new_map_lines_and_fuse(rng):
    """Tracker end-to-end: segments beyond depth range become map lines via
    multi-view triangulation, and fuse_lines merges duplicates."""
    from hfvo_tpu.config import tum3_config
    from hfvo_tpu.testing import synthetic
    from hfvo_tpu.tracking.tracker import Tracker

    cfg = tum3_config()
    T_wc, grays, depths = synthetic.render_sequence(n=14, seed=2)
    tr = Tracker(cfg, use_local_ba=False, use_loop_closing=False)
    for i in range(14):
        r = tr.track_rgbd(grays[i], depths[i],
                          T_cw_init=np.linalg.inv(T_wc[0]) if i == 0 else None)
        assert r.state.name == "OK"
    # Lines with exactly 2 observations created by triangulation exist OR
    # the depth-complete synthetic room landmarks every line from depth --
    # in that case force the path directly:
    created = tr.mapper.create_new_map_lines()
    merged = tr.mapper.fuse_lines()
    assert created >= 0 and merged >= 0  # exercises both paths
    # Duplicate-merge correctness on a constructed duplicate. fuse_lines only
    # considers lines observed by the local KF window (like the reference's
    # SearchLineInNeighbors), so pick a source from that set and register the
    # duplicate as a KF observation in a free segment slot.
    vm = tr.vomap
    local = vm.local_line_ids(tr.mapper.cfg.cap.local_kfs,
                              tr.mapper.cfg.cap.local_lines)
    assert len(local) > 0
    src = int(local[0])
    ids = vm.add_lines(
        vm.lines.X0_w[src][None] + 0.005, vm.lines.X1_w[src][None] + 0.005,
        vm.lines.desc[src][None], 99, first_kf=int(vm.newest_kf_slot),
    )
    assert ids[0] >= 0
    kl = vm.kf_lines
    newest = int(vm.newest_kf_slot)
    free = np.nonzero(kl.line_id[newest] < 0)[0]
    assert len(free) > 0
    kl.line_id[newest, free[0]] = ids[0]
    kl.obs_valid[newest, free[0]] = True
    vm.lines.n_obs[ids[0]] = 1
    n_before = int(vm.lines.valid.sum())
    merged = tr.mapper.fuse_lines()
    assert merged >= 1
    assert int(vm.lines.valid.sum()) == n_before - merged
