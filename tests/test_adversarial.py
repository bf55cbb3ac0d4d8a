"""Adversarial validation scenes the system can FAIL on (VERDICT round-1:
all prior accuracy evidence came from the axis-aligned exact-depth room —
exactly the regime the Manhattan machinery is tuned for). Golden-ATE
regression gates per scenario; reference protocol: utils/EVO_APE.sh.
"""
import numpy as np
import pytest

from hfvo_tpu.config import tum1_config, tum3_config
from hfvo_tpu.io import evaluate
from hfvo_tpu.testing import synthetic
from hfvo_tpu.tracking.tracker import Tracker


def _run(cfg, T_wc, grays, depths, **kw):
    tr = Tracker(cfg, use_local_ba=True, use_loop_closing=False, **kw)
    for g, d in zip(grays, depths):
        tr.track_rgbd(g, d, T_cw_init=np.linalg.inv(T_wc[0]))
    est = tr.get_trajectory()
    ts = np.arange(len(est)) / 30.0
    return evaluate.ate(ts, T_wc, ts, est, align="origin"), tr


def test_non_manhattan_slanted_structure(rng):
    """Slanted striped quads + spheres: the Manhattan rotation prior must
    not snap poses onto wrong axes when a large share of lines/normals
    disagree with the room frame (exercises rot_prior gating for real).

    Golden gate: ATE < 3 cm over 25 frames (axis-aligned room: ~1 cm)."""
    cfg = tum3_config()
    scene = synthetic.make_adversarial_room(seed=3, n_slanted=2, n_spheres=3)
    T_wc, grays, depths = synthetic.render_sequence(n=25, scene=scene, seed=3)
    ape, tr = _run(cfg, T_wc, grays, depths)
    assert ape.rmse < 0.03, f"slanted-scene ATE {ape.rmse:.4f} m"


def test_lens_distortion_end_to_end(rng):
    """Frames rendered THROUGH the tum1 radtan model, tracked with the
    distortion-aware config (undistort_points in the frontend). A config
    that ignored distortion would drift immediately (fr1 has strong k1/k2).

    Golden gate: ATE < 3 cm over 20 frames."""
    cfg = tum1_config()
    T_wc, grays, depths = synthetic.render_sequence(
        n=20, intr=cfg.camera, seed=5, distort=True
    )
    ape, tr = _run(cfg, T_wc, grays, depths)
    assert ape.rmse < 0.03, f"distorted-scene ATE {ape.rmse:.4f} m"


def test_depth_noise_and_holes(rng):
    """Quadratic depth noise (sigma = 0.6% z^2 — the upper end of the
    Kinect structured-light error model; ~5 cm at z=3 m) + dropout holes:
    depth-derived points/planes/normals all degrade and the depth loss
    must not corrupt the Manhattan estimate or the KF landmarks.

    Golden gate: ATE < 4.5 cm over 25 frames (exact-depth room: ~1 cm)."""
    cfg = tum3_config()
    T_wc, grays, depths = synthetic.render_sequence(n=25, seed=6)
    rs = np.random.default_rng(6)
    depths = [synthetic.corrupt_depth(d, rs, quad_sigma=0.006) for d in depths]
    ape, tr = _run(cfg, T_wc, grays, depths)
    assert ape.rmse < 0.045, f"noisy-depth ATE {ape.rmse:.4f} m"


def test_low_texture_non_manhattan(rng):
    """The reference's headline regime (low texture) WITHOUT the clean
    Manhattan scaffolding: low-texture walls + slanted striped quads.
    Hybrid tracking must still hold (points alone collapse here).

    Golden gate: ATE < 6 cm over 25 frames."""
    cfg = tum3_config()
    scene = synthetic.make_adversarial_room(
        seed=9, n_slanted=2, n_spheres=2, low_texture=True
    )
    T_wc, grays, depths = synthetic.render_sequence(n=25, scene=scene, seed=9)
    ape, tr = _run(cfg, T_wc, grays, depths)
    assert ape.rmse < 0.06, f"low-texture slanted ATE {ape.rmse:.4f} m"


def test_icl_preset_negative_fy_end_to_end(rng):
    """ICL-NUIM preset: fy is NEGATIVE (the dataset's flipped-v quirk,
    reference: Examples/RGB-D/ICL.yaml Camera.fy=-480). Render with the ICL
    camera and track with the ICL config — projection, grid assignment,
    line geometry, and depth handling (DepthMapFactor 5000) must all hold
    under the sign flip."""
    from hfvo_tpu.config import icl_config

    cfg = icl_config()
    T_wc, grays, depths = synthetic.render_sequence(n=8, seed=4, intr=cfg.camera)
    # Round-trip depth through the dataset's integer format at factor 5000.
    depths = [
        np.clip(d * 5000.0, 0, 65535).astype(np.uint16).astype(np.float32)
        / 5000.0
        for d in depths
    ]
    ape, tr = _run(cfg, T_wc, grays, depths)
    assert tr.state.name == "OK"
    assert ape.rmse < 0.02, ape.rmse
