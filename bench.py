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


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hfvo_tpu.config import tum3_config
    from hfvo_tpu.testing import synthetic
    from hfvo_tpu.tracking.tracker import Tracker

    cfg = tum3_config()
    n_render = 12
    T_wc, grays, depths = synthetic.render_sequence(n=n_render, seed=0)
    grays = [jnp.asarray(g) for g in grays]
    depths = [jnp.asarray(d) for d in depths]

    tracker = Tracker(cfg)
    # Warmup: initialize + compile every kernel in the loop.
    for i in range(3):
        tracker.track_rgbd(grays[i], depths[i], T_cw_init=np.linalg.inv(T_wc[0]))

    n_timed = 30
    t0 = time.perf_counter()
    for i in range(n_timed):
        j = 3 + (i % (n_render - 3))
        tracker.track_rgbd(grays[j], depths[j])
    dt = time.perf_counter() - t0
    fps = n_timed / dt

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
