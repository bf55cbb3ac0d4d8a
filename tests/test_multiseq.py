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


def test_batch_tracker_sharded_mesh(rng):
    """Serving scale-out: the same batch program with the sequence axis
    sharded over an 8-device mesh (SURVEY.md §2.3 "multi-host batch over
    sequences") — trivially parallel, so per-sequence trajectories must
    match the unsharded batch path to numerical noise."""
    import jax
    from jax.sharding import Mesh

    cfg = tum3_config()
    n, S = 8, 8
    seqs = [synthetic.render_sequence(n=n, seed=20 + s) for s in range(S)]
    mesh = Mesh(np.array(jax.devices()[:8]), ("seq",))
    bt = BatchTracker(cfg, n_seq=S, use_local_ba=False, mesh=mesh)
    ref = BatchTracker(cfg, n_seq=S, use_local_ba=False)
    for i in range(n):
        grays = [seqs[s][1][i] for s in range(S)]
        depths = [seqs[s][2][i] for s in range(S)]
        inits = [np.linalg.inv(seqs[s][0][0]) for s in range(S)] if i == 0 else None
        if i == 0:
            bt.track_batch(grays, depths, inits)
            ref.track_batch(grays, depths, inits)
        else:
            bt.track_batch_async(grays, depths)
            ref.track_batch_async(grays, depths)
    bt.flush()
    ref.flush()
    # Inputs landed sharded: one shard of the gray batch per device.
    assert bt._sharding is not None
    ts = np.arange(n) / 30.0
    for s in range(S):
        est_sh = bt.get_trajectories()[s]
        est_ref = ref.get_trajectories()[s]
        ape = evaluate.ate(ts, seqs[s][0], ts, est_sh, align="origin")
        assert ape.rmse < 0.02, f"seq {s}: {ape.rmse}"
        # The partitioned program reorders fp reductions, so bitwise
        # equality with the unsharded batch is not expected; the chained
        # nonlinear solves stay within a few mm of each other.
        assert np.abs(est_sh[:, :3, 3] - est_ref[:, :3, 3]).max() < 1e-2
