import os

import numpy as np
import pytest

from hfvo_tpu.config import tum3_config
from hfvo_tpu.testing import synthetic
from hfvo_tpu.tracking.tracker import Tracker
from hfvo_tpu.viz import drawers


@pytest.fixture(scope="module")
def tracked():
    cfg = tum3_config()
    T_wc, grays, depths = synthetic.render_sequence(n=6, seed=0)
    tr = Tracker(cfg, use_local_ba=False)
    for g, d in zip(grays, depths):
        tr.track_rgbd(g, d, T_cw_init=np.linalg.inv(T_wc[0]))
    return tr, grays


def _is_png(path):
    with open(path, "rb") as f:
        return f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_draw_frame(tracked, tmp_path):
    tr, grays = tracked
    feats = tr._last_line_out
    p = os.path.join(tmp_path, "frame.png")
    kf = tr.vomap.keyframes
    k = tr.vomap.next_kf_slot - 1
    tracked_mask = kf.obs_valid[k]
    drawers.draw_frame(
        grays[-1], p,
        kp_uv=kf.obs[k][:, :2], kp_tracked=tracked_mask,
        line_p0=np.asarray(feats[0].p0) if feats else None,
        line_p1=np.asarray(feats[0].p1) if feats else None,
        line_valid=np.asarray(feats[0].valid) if feats else None,
    )
    assert _is_png(p) and os.path.getsize(p) > 10000


def test_draw_map(tracked, tmp_path):
    tr, _ = tracked
    p = os.path.join(tmp_path, "map.png")
    drawers.draw_map(
        tr.vomap, p,
        trajectory=np.linalg.inv(tr.get_trajectory()),
        R_wm=tr.R_wm if tr.manh_valid else None,
    )
    assert _is_png(p) and os.path.getsize(p) > 10000


def test_draw_empty_map(tmp_path):
    from hfvo_tpu.vomap.map import VOMap

    vm = VOMap(tum3_config())
    p = os.path.join(tmp_path, "empty.png")
    drawers.draw_map(vm, p)
    assert _is_png(p)


def test_live_viewer_endpoints(tracked):
    """Spin up the HTTP viewer against a tracked sequence and fetch all
    three endpoints (reference: Viewer thread + FrameDrawer/MapDrawer,
    src/System.cc:108-113, src/FrameDrawer.cc:38, src/MapDrawer.cc:42)."""
    import json
    import urllib.request

    from hfvo_tpu.viz.live import LiveViewer

    tr, grays = tracked
    viewer = LiveViewer(tr, port=0)
    try:
        # Simulate VOSystem.track_rgbd's per-frame publish call.
        class Res:
            state = "OK"
            n_matches = 123
            is_keyframe = False

        viewer.publish(grays[-1], Res())
        base = f"http://127.0.0.1:{viewer.port}"
        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"hfvo_tpu" in page and b"Show Manh Axis" in page
        state = json.loads(
            urllib.request.urlopen(base + "/state.json", timeout=10).read()
        )
        assert state["state"] == "OK" and state["n_matches"] == 123
        assert state["png"]  # frame image present
        m = json.loads(
            urllib.request.urlopen(base + "/map.json", timeout=10).read()
        )
        assert len(m["points"]) > 0 and len(m["kf_T_wc"]) > 0
        assert len(m["T_cw"]) == 4
    finally:
        viewer.close()
