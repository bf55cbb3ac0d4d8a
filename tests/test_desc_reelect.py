"""Distinctive-descriptor re-election (LocalMapper.reelect_point_descriptors).

Reference: MapPoint::ComputeDistinctiveDescriptors (src/MapPoint.cc) —
the elected descriptor is the observation with minimal median Hamming
distance to the point's other observations.
"""
import numpy as np

from hfvo_tpu.config import tum3_config
from hfvo_tpu.mapping.local_mapping import LocalMapper
from hfvo_tpu.vomap.map import VOMap


def _mk_map():
    cfg = tum3_config()
    vm = VOMap(cfg)
    return cfg, vm, LocalMapper(cfg, vm)


def _add_kf(vm, cfg, pid_rows, descs, fid):
    C = cfg.cap.keypoints
    point_id = np.full((C,), -1, np.int32)
    desc = np.zeros((C, 8), np.uint32)
    obs_valid = np.zeros((C,), bool)
    for row, (pid, d) in enumerate(zip(pid_rows, descs)):
        point_id[row] = pid
        desc[row] = d
        obs_valid[row] = True
    obs = np.zeros((C, 3), np.float32)
    octave = np.zeros((C,), np.int32)
    return vm.add_keyframe(
        np.eye(4, dtype=np.float32), fid, point_id, obs, octave, desc,
        obs_valid,
    )


def test_reelects_central_descriptor():
    cfg, vm, mapper = _mk_map()
    # One map point, first observed with an OUTLIER descriptor.
    d_out = np.full((8,), 0xFFFFFFFF, np.uint32)  # all ones
    d_a = np.zeros((8,), np.uint32)
    d_b = d_a.copy()
    d_b[0] = 0x3  # 2 bits from d_a
    d_c = d_a.copy()
    d_c[1] = 0x1  # 1 bit from d_a
    pid = vm.add_points(
        np.array([[0, 0, 2.0]], np.float32), d_out[None],
        np.array([[0, 0, 1.0]], np.float32), np.zeros((1,), np.int32), 0,
    )[0]
    assert pid >= 0
    assert (vm.points.desc[pid] == d_out).all()
    # Three keyframes observe it with clustered descriptors + the outlier.
    _add_kf(vm, cfg, [pid], [d_out], fid=0)
    _add_kf(vm, cfg, [pid], [d_a], fid=1)
    _add_kf(vm, cfg, [pid], [d_b], fid=2)
    _add_kf(vm, cfg, [pid], [d_c], fid=3)
    n = mapper.reelect_point_descriptors()
    assert n == 1
    elected = vm.points.desc[pid]
    # The outlier (256 bits from everyone) must lose to a cluster member.
    assert not (elected == d_out).all()
    assert any((elected == d).all() for d in (d_a, d_b, d_c))


def test_single_observation_keeps_descriptor():
    cfg, vm, mapper = _mk_map()
    d0 = np.arange(8, dtype=np.uint32)
    pid = vm.add_points(
        np.array([[0, 0, 2.0]], np.float32), d0[None],
        np.array([[0, 0, 1.0]], np.float32), np.zeros((1,), np.int32), 0,
    )[0]
    _add_kf(vm, cfg, [pid], [d0], fid=0)
    _add_kf(vm, cfg, [], [], fid=1)  # newest KF sees nothing
    assert mapper.reelect_point_descriptors() == 0
    assert (vm.points.desc[pid] == d0).all()
