import jax.numpy as jnp
import numpy as np

from hfvo_tpu.config import tum3_config
from hfvo_tpu.geometry import se3
from hfvo_tpu.testing import synthetic
from hfvo_tpu.tracking.tracker import Tracker, TrackState


def test_kidnapped_reloc_without_depth():
    """Relocalize on a frame whose depth sensor dropped out entirely: the
    2D-3D PnP fallback must recover the pose."""
    cfg = tum3_config()
    T_wc, grays, depths = synthetic.render_sequence(n=12, seed=0)
    tr = Tracker(cfg, use_local_ba=False, auto_reset=False)
    for i in range(8):
        tr.track_rgbd(grays[i], depths[i], T_cw_init=np.linalg.inv(T_wc[0]))
    blank = np.full_like(grays[0], 120.0)
    for _ in range(2):
        r = tr.track_rgbd(blank, np.zeros_like(depths[0]))
    assert r.state is TrackState.LOST
    # Reloc frame: real image, NO depth.
    T_reloc = tr._relocalize(
        jnp.asarray(grays[1]), jnp.asarray(np.zeros_like(depths[1]))
    )
    assert T_reloc is not None, "PnP fallback did not fire"
    T_gt = np.linalg.inv(T_wc[1]).astype(np.float32)
    err = np.asarray(
        se3.log_se3(jnp.asarray(T_gt) @ se3.inv(jnp.asarray(T_reloc)))
    )
    # PnP only needs to land inside the tracking basin; the subsequent
    # local-map track snaps the pose (verified below).
    assert np.abs(err[:3]).max() < 0.3, err
    r = tr.track_rgbd(grays[1], depths[1])
    assert r.state is TrackState.OK
    err2 = np.asarray(
        se3.log_se3(jnp.asarray(T_gt) @ se3.inv(jnp.asarray(r.T_cw)))
    )
    assert np.abs(err2[:3]).max() < 0.03, err2
