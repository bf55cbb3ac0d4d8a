import numpy as np

from hfvo_tpu.config import tum3_config
from hfvo_tpu.io import evaluate
from hfvo_tpu.parallel.multiseq import BatchTracker
from hfvo_tpu.testing import synthetic


def test_batch_tracker_matches_single(rng):
    """Two different sequences tracked in one vmapped batch must each reach
    the same accuracy as standalone tracking."""
    cfg = tum3_config()
    seqs = [synthetic.render_sequence(n=10, seed=s) for s in (0, 7)]
    bt = BatchTracker(cfg, n_seq=2, use_local_ba=False)
    for i in range(10):
        grays = [seqs[s][1][i] for s in range(2)]
        depths = [seqs[s][2][i] for s in range(2)]
        inits = [np.linalg.inv(seqs[s][0][0]) for s in range(2)] if i == 0 else None
        res = bt.track_batch(grays, depths, inits)
        assert all(r.state.name == "OK" for r in res)
    ts = np.arange(10) / 30.0
    for s, est in enumerate(bt.get_trajectories()):
        ape = evaluate.ate(ts, seqs[s][0], ts, est, align="origin")
        assert ape.rmse < 0.02, f"seq {s}: {ape.rmse}"


def test_batch_tracker_pipelined(rng):
    """One-batch-lag pipelined batch tracking (the bench's serving mode)
    stays accurate: every frame resolves, keyframes are created, and each
    sequence's trajectory matches ground truth."""
    cfg = tum3_config()
    n = 12
    seqs = [synthetic.render_sequence(n=n, seed=s) for s in (3, 11)]
    bt = BatchTracker(cfg, n_seq=2, use_local_ba=False)
    n_done = 0
    for i in range(n):
        grays = [seqs[s][1][i] for s in range(2)]
        depths = [seqs[s][2][i] for s in range(2)]
        if i == 0:
            inits = [np.linalg.inv(seqs[s][0][0]) for s in range(2)]
            n_done += len(bt.track_batch(grays, depths, inits))
        else:
            n_done += len(bt.track_batch_async(grays, depths))
    n_done += len(bt.flush())
    assert n_done == 2 * n
    ts = np.arange(n) / 30.0
    for s, est in enumerate(bt.get_trajectories()):
        assert len(est) == n
        ape = evaluate.ate(ts, seqs[s][0], ts, est, align="origin")
        assert ape.rmse < 0.02, f"seq {s}: {ape.rmse}"
    # Stage timers accumulated per tracker (System::ExtractTimes parity).
    assert "kf_insert" in bt.trackers[0].stage_times
    assert bt.trackers[0].stage_report()
