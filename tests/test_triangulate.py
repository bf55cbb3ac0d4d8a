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
