"""cProfile of the single-seq pipelined loop (dev tool)."""
import cProfile, pstats, io, os, sys, time
import numpy as np

sys.argv = ["bench"]
import bench
bench._enable_compile_cache()
from hfvo_tpu.config import tum3_config
from hfvo_tpu.testing import synthetic
from hfvo_tpu.tracking.tracker import Tracker

cfg = tum3_config()
n_warm, n_timed = 8, 60
T_wc, grays, depths = synthetic.render_sequence(n=n_warm + n_timed, seed=0)
grays = [np.clip(np.rint(g), 0, 255).astype(np.uint8) for g in grays]
depths = [np.clip(d * 1000.0, 0, 65535).astype(np.uint16) for d in depths]

tracker = Tracker(cfg, use_local_ba=False, use_loop_closing=False,
                  pipeline_depth=24)
for i in range(n_warm):
    tracker.track_rgbd(grays[i], depths[i], T_cw_init=np.linalg.inv(T_wc[0]))
tracker.warmup(grays[0], depths[0])
tracker.track_rgbd_async(grays[n_warm - 1], depths[n_warm - 1])
tracker.flush()

pr = cProfile.Profile()
t0 = time.perf_counter()
pr.enable()
for i in range(n_warm, n_warm + n_timed):
    tracker.track_rgbd_async(grays[i], depths[i])
tracker.flush()
pr.disable()
dt = time.perf_counter() - t0
print(f"{n_timed} frames in {dt:.2f}s = {n_timed/dt:.1f} fps", file=sys.stderr)
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(30)
print(s.getvalue())
