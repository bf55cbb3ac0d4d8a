"""Pipelined (one-frame-lag) tracking must match synchronous tracking on
clean sequences and recover when a frame poisons the in-flight dispatch."""
import jax.numpy as jnp
import numpy as np

from hfvo_tpu.config import tum3_config
from hfvo_tpu.io import evaluate
from hfvo_tpu.testing import synthetic
from hfvo_tpu.tracking.tracker import Tracker, TrackState

CFG = tum3_config()


def _frames(n=14, lowtex=False):
    T_wc = synthetic.orbit_trajectory(n)
    scene = synthetic.make_room(0, low_texture=lowtex)
    out = []
    for i in range(n):
        g, d = synthetic.render_jit(scene, CFG.camera, jnp.asarray(T_wc[i]))
        out.append((np.asarray(g), np.asarray(d)))
    return T_wc, out


def _ate(T_wc, est):
    ts = np.arange(len(est)) / 30.0
    return evaluate.ate(ts, T_wc[: len(est)], ts, est, align="origin").rmse


def test_async_matches_sync():
    T_wc, frames = _frames()
    tr_s = Tracker(CFG, use_local_ba=False, use_loop_closing=False)
    for g, d in frames:
        tr_s.track_rgbd(g, d, T_cw_init=np.linalg.inv(T_wc[0]))
    tr_a = Tracker(CFG, use_local_ba=False, use_loop_closing=False)
    results = []
    for g, d in frames:
        results.extend(tr_a.track_rgbd_async(g, d, T_cw_init=np.linalg.inv(T_wc[0])))
    results.extend(tr_a.flush())
    assert len(results) == len(frames)
    est_s = tr_s.get_trajectory()
    est_a = tr_a.get_trajectory()
    assert len(est_a) == len(frames)
    ate_s, ate_a = _ate(T_wc, est_s), _ate(T_wc, est_a)
    # One-frame-lagged map updates cost a little accuracy, not much.
    assert ate_a < max(2.0 * ate_s, 0.02), (ate_a, ate_s)


def test_async_recovers_from_poisoned_dispatch():
    T_wc, frames = _frames(12)
    # auto_reset off: this test isolates the poisoned-dispatch re-track +
    # relocalization path (the early-loss auto-reset has its own test in
    # test_mask_reset.py).
    tr = Tracker(CFG, use_local_ba=False, use_loop_closing=False,
                 auto_reset=False)
    results = []
    for i, (g, d) in enumerate(frames):
        if i == 6:
            # A garbage frame fails tracking; the already-dispatched
            # successor is chained on the bad pose and must be re-tracked.
            g = np.zeros_like(g)
            d = np.zeros_like(d)
        results.extend(tr.track_rgbd_async(g, d, T_cw_init=np.linalg.inv(T_wc[0])))
    results.extend(tr.flush())
    assert len(results) == len(frames)
    assert results[-1].state is TrackState.OK
    est = tr.get_trajectory()
    assert len(est) == len(frames)
    # Frames after the blank one must re-localize close to ground truth.
    err = np.linalg.norm(est[-1][:3, 3] - T_wc[11][:3, 3])
    assert err < 0.08, err
