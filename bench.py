"""Benchmark: end-to-end RGB-D tracking throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Protocol mirrors the reference's own throughput metric — mean per-frame
`TrackRGBD` wall time on 640x480 RGB-D at the 1000-point budget (reference:
Examples/RGB-D/rgbd_tum.cc:159-166 "Mean Tracking Time"). The reference
publishes no numbers (README is one line) and paces input at 30 fps
(rgbd_tum.cc:137-152), so the baseline constant here is 30 frames/s — the
rate the reference system is designed to sustain in real time on CPU.
`vs_baseline` = measured fps / 30.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FPS = 30.0


def _enable_compile_cache() -> None:
    """Persistent compilation cache: the hybrid fused program takes minutes
    to compile over the remote-compile tunnel the first time; cached runs
    load in seconds."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main() -> None:
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from hfvo_tpu.config import tum3_config
    from hfvo_tpu.testing import synthetic
    from hfvo_tpu.tracking.tracker import Tracker

    cfg = tum3_config()
    n_warm, n_timed = 8, 30
    T_wc, grays, depths = synthetic.render_sequence(n=n_warm + n_timed, seed=0)
    # Keep frames as host arrays: track_rgbd uploads compact uint8/uint16
    # itself; pre-uploaded float device arrays would round-trip the tunnel.

    # Local BA runs on a background thread in the reference and is excluded
    # from its "Mean Tracking Time" metric (rgbd_tum.cc:159-166); loop
    # closing ships deactivated in the reference (LoopClosing.cc:57-101).
    # Measure the tracking path under the same protocol.
    tracker = Tracker(cfg, use_local_ba=False, use_loop_closing=False)
    # Warmup: initialize + compile/cache-load every program the loop can
    # touch — the steady path, the wide-window recovery variant, and the
    # failure-path programs (BoW reloc, descriptor matching, 3D-3D RANSAC,
    # PnP). A first call mid-measurement costs a 10-20 s cache load over the
    # remote-compile tunnel.
    for i in range(n_warm):
        tracker.track_rgbd(grays[i], depths[i], T_cw_init=np.linalg.inv(T_wc[0]))
    g0 = jnp.asarray(np.asarray(grays[0]).astype(np.float32))
    d0 = jnp.asarray(np.asarray(depths[0]).astype(np.float32))
    tracker._track_local_map(grays[0], depths[0], tracker.T_cw, radius=50.0, check_octave=False)
    tracker._relocalize(g0, d0)
    from hfvo_tpu.solve.pnp import pnp_ransac

    rngw = np.random.default_rng(0)
    pnp_ransac(
        jnp.asarray(rngw.normal(size=(cfg.cap.keypoints, 3)).astype(np.float32) + np.array([0, 0, 4], np.float32)),
        jnp.asarray(rngw.uniform(0, 480, (cfg.cap.keypoints, 2)).astype(np.float32)),
        jnp.ones((cfg.cap.keypoints,), bool), cfg.camera, jnp.uint32(0),
    )

    # Prime the pipelined path (same compiled program, device-chained
    # prediction) before timing.
    tracker.track_rgbd_async(grays[n_warm - 1], depths[n_warm - 1])
    tracker.flush()

    # Timed loop: one-frame-lag pipelined tracking — device compute and
    # tunnel transfers overlap host bookkeeping (the reference overlaps the
    # same work across its tracking/mapping threads).
    t0 = time.perf_counter()
    n_done = 0
    for i in range(n_warm, n_warm + n_timed):
        n_done += len(tracker.track_rgbd_async(grays[i], depths[i]))
    n_done += len(tracker.flush())
    dt = time.perf_counter() - t0
    fps = n_done / dt

    print(
        json.dumps(
            {
                "metric": "tracking_throughput_640x480_rgbd",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
