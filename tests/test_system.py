import os

import numpy as np
import pytest

from hfvo_tpu.config import tum3_config
from hfvo_tpu.io import evaluate, trajectory, yaml_config
from hfvo_tpu.system import VOSystem
from hfvo_tpu.testing import synthetic


@pytest.fixture(scope="module")
def short_sequence():
    return synthetic.render_sequence(n=12, seed=0)


def test_yaml_config_parsing(tmp_path):
    p = os.path.join(tmp_path, "settings.yaml")
    with open(p, "w") as f:
        f.write(
            "%YAML:1.0\n\n"
            "# camera\n"
            "Camera.fx: 517.306408\n"
            "Camera.fy: 516.469215\n"
            "Camera.cx: 318.643040\n"
            "Camera.cy: 255.313989\n"
            "Camera.k1: 0.262383\n"
            "Camera.bf: 40.0\n"
            "Camera.fps: 30.0\n"
            "ORBextractor.nFeatures: 1000\n"
            "ORBextractor.scaleFactor: 1.2\n"
            "ORBextractor.nLevels: 8\n"
            "ORBextractor.iniThFAST: 20\n"
            "ORBextractor.minThFAST: 7\n"
            "DepthMapFactor: 5000.0\n"
            "Plane.AngleInfo: 0.5\n"
            "Plane.Chi: 100\n"
        )
    cfg = yaml_config.config_from_yaml(p)
    assert abs(cfg.camera.fx - 517.306408) < 1e-6
    assert cfg.camera.has_distortion
    assert cfg.orb.n_features == 1000
    assert cfg.tracking.depth_map_factor == 5000.0
    assert cfg.planes.chi == 100.0


def test_system_end_to_end(short_sequence, tmp_path):
    T_wc, grays, depths = short_sequence
    system = VOSystem(config=tum3_config())
    for i, (g, d) in enumerate(zip(grays, depths)):
        system.track_rgbd(g, d, timestamp=i / 30.0)
    traj_path = os.path.join(tmp_path, "traj.txt")
    system.save_trajectory_tum(traj_path)
    ts, est = trajectory.load_tum(traj_path)
    assert len(est) == len(grays)
    ape = evaluate.ate(np.arange(len(grays)) / 30.0, T_wc, ts, est, align="umeyama")
    assert ape.rmse < 0.02
    # Timing report exists and counts frames.
    rep = system.extract_times()
    assert "mean tracking time" in rep
    assert system.times.n_frames == len(grays)

    kf_path = os.path.join(tmp_path, "kf.txt")
    system.save_keyframe_trajectory_tum(kf_path)
    _, kfs = trajectory.load_tum(kf_path)
    assert 1 <= len(kfs) <= len(grays)

    ply_path = os.path.join(tmp_path, "map.ply")
    system.save_point_cloud_ply(ply_path)
    with open(ply_path) as f:
        head = f.read(200)
    assert head.startswith("ply") and "element vertex" in head


def test_localization_mode(short_sequence):
    T_wc, grays, depths = short_sequence
    system = VOSystem(config=tum3_config())
    for i in range(6):
        system.track_rgbd(grays[i], depths[i], i / 30.0)
    n_kf = system.tracker.vomap.n_keyframes()
    system.activate_localization_mode()
    for i in range(6, 12):
        res = system.track_rgbd(grays[i], depths[i], i / 30.0)
    assert system.tracker.vomap.n_keyframes() == n_kf  # map frozen
    assert res.state.name == "OK"


def test_reset(short_sequence):
    T_wc, grays, depths = short_sequence
    system = VOSystem(config=tum3_config())
    for i in range(4):
        system.track_rgbd(grays[i], depths[i], i / 30.0)
    system.reset()
    assert system.tracker.vomap.n_keyframes() == 0
    assert system.times.n_frames == 0
    res = system.track_rgbd(grays[0], depths[0], 0.0)
    assert res.state.name == "OK"  # re-initializes


def test_kitti_trajectory_saver(short_sequence, tmp_path):
    import numpy as np

    T_wc, grays, depths = short_sequence
    system = VOSystem(config=tum3_config())
    for i in range(4):
        system.track_rgbd(grays[i], depths[i], i / 30.0)
    p = os.path.join(tmp_path, "kitti.txt")
    system.save_trajectory_kitti(p)
    rows = [list(map(float, l.split())) for l in open(p)]
    assert len(rows) == 4 and all(len(r) == 12 for r in rows)
    # First pose R block orthonormal.
    M = np.array(rows[0]).reshape(3, 4)
    np.testing.assert_allclose(M[:3, :3] @ M[:3, :3].T, np.eye(3), atol=1e-4)


def test_checkpoint_resume(short_sequence, tmp_path):
    """Save mid-sequence, restore into a fresh tracker, keep tracking."""
    import numpy as np

    from hfvo_tpu.tracking.tracker import Tracker
    from hfvo_tpu.vomap.checkpoint import load_checkpoint, save_checkpoint

    T_wc, grays, depths = short_sequence
    tr = Tracker(tum3_config(), use_local_ba=False)
    for i in range(6):
        tr.track_rgbd(grays[i], depths[i], T_cw_init=np.linalg.inv(T_wc[0]))
    p = os.path.join(tmp_path, "map.npz")
    save_checkpoint(p, tr)

    tr2 = Tracker(tum3_config(), use_local_ba=False)
    load_checkpoint(p, tr2)
    assert tr2.vomap.n_keyframes() == tr.vomap.n_keyframes()
    assert tr2.vomap.points.valid.sum() == tr.vomap.points.valid.sum()
    # Resumed tracker continues tracking the sequence.
    r = tr2.track_rgbd(grays[6], depths[6])
    assert r.state.name == "OK"
    import jax.numpy as jnp

    from hfvo_tpu.geometry import se3

    T_gt = np.linalg.inv(T_wc[6]).astype(np.float32)
    err = np.abs(np.asarray(se3.log_se3(jnp.asarray(T_gt) @ se3.inv(jnp.asarray(r.T_cw)))))
    assert err[:3].max() < 0.02, err
