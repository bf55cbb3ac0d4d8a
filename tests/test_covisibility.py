"""Covisibility graph + keyframe slot recycling (reference:
KeyFrame::UpdateConnections / GetBestCovisibilityKeyFrames,
include/KeyFrame.h:135-158, and the unbounded reference map vs this
framework's fixed tables with a free-list)."""
import numpy as np
import pytest

from hfvo_tpu.config import VOConfig, Capacities
from hfvo_tpu.vomap.map import VOMap


def _mini_cfg(**kw):
    return VOConfig(cap=Capacities(
        keypoints=256, map_points=512, keyframes=8, lines=8, planes=4,
        map_lines=32, map_planes=8, local_points=128, local_lines=16,
        local_kfs=4, ba_edges=256, **kw,
    ))


def _add_kf(vm, pids, frame_id, T=None):
    C = vm.cfg.cap.keypoints
    point_id = np.full((C,), -1, np.int32)
    point_id[: len(pids)] = pids
    ov = point_id >= 0
    return vm.add_keyframe(
        np.eye(4, dtype=np.float32) if T is None else T,
        frame_id, point_id,
        np.zeros((C, 3), np.float32), np.zeros((C,), np.int32),
        np.zeros((C, 8), np.uint32), ov,
    )


def _seed_points(vm, n):
    ids = vm.add_points(
        np.random.RandomState(0).randn(n, 3).astype(np.float32),
        np.zeros((n, 8), np.uint32), np.zeros((n, 3), np.float32),
        np.zeros((n,), np.int32), 0,
    )
    return ids


def test_covisibility_weights_count_shared_points():
    vm = VOMap(_mini_cfg())
    pids = _seed_points(vm, 30)
    k0 = _add_kf(vm, pids[:20], 0)
    k1 = _add_kf(vm, pids[10:30], 1)  # shares 10 with k0
    k2 = _add_kf(vm, pids[25:30], 2)  # shares 5 with k1, 0 with k0
    slots, w = vm.covisibility(k1)
    wk = dict(zip(slots.tolist(), w.tolist()))
    assert wk[k0] == 10
    assert wk[k2] == 5
    # Ranked neighbors of k1: k0 first.
    neigh = vm.covisible_kfs(k1, min_weight=1)
    assert list(neigh[:2]) == [k0, k2]
    # min_weight filter falls back to best edge.
    neigh = vm.covisible_kfs(k2, min_weight=100)
    assert len(neigh) == 1 and neigh[0] == k1


def test_local_window_follows_covisibility_not_slot_order():
    vm = VOMap(_mini_cfg())
    pids = _seed_points(vm, 40)
    ka = _add_kf(vm, pids[:20], 0)
    _add_kf(vm, pids[30:40], 1)  # unrelated view
    kc = _add_kf(vm, pids[:20], 2)  # same view as ka
    win = vm.local_kf_window(2)
    assert win[0] == kc  # newest first
    assert ka in win  # covisible beats recency


def test_kf_slot_recycling_no_capacity_crash():
    vm = VOMap(_mini_cfg())
    pids = _seed_points(vm, 8)
    cap = vm.cfg.cap.keyframes
    slots = []
    for i in range(cap):
        slots.append(_add_kf(vm, pids, i))
    # Table is full; releasing one slot lets insertion continue.
    vm.release_keyframe(slots[3])
    k_new = _add_kf(vm, pids, cap + 1)
    assert k_new == slots[3]
    assert vm.newest_kf_slot == k_new
    # Temporal order reflects insertion, not slot index.
    by_order = vm.kf_slots_by_order()
    assert by_order[-1] == k_new
    assert vm.keyframes.order[k_new] == cap
    # Without a free slot the exhaustion error still fires.
    with pytest.raises(RuntimeError):
        _add_kf(vm, pids, cap + 2)


def test_release_reowns_landmarks():
    vm = VOMap(_mini_cfg())
    pids = _seed_points(vm, 10)
    k0 = _add_kf(vm, pids[:5], 0)
    k1 = _add_kf(vm, pids, 1)
    assert (vm.points.first_kf[pids[:5]] == k0).all()
    vm.release_keyframe(k0)
    assert (vm.points.first_kf[pids[:5]] == k1).all()


def test_local_point_ids_rank_by_observations():
    vm = VOMap(_mini_cfg())
    pids = _seed_points(vm, 200)
    # Two KFs observe the first 150 points; the strong half (every other
    # point) gets a third observation.
    _add_kf(vm, pids[:150], 0)
    _add_kf(vm, pids[:150], 1)
    _add_kf(vm, pids[:150:2], 2)
    ids = vm.local_point_ids(4, cap=60)
    assert len(ids) == 60
    # All surviving entries should be from the thrice-observed subset.
    assert (vm.points.n_obs[ids] >= 3).all()
