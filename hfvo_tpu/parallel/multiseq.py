"""Multi-sequence batch tracking: S sequences in lockstep on one chip.

The reference is strictly single-sequence; the TPU build's multi-sequence
config (SURVEY.md §2.3: "multi-host batch over sequences via DCN") batches
S independent trackers through ONE vmapped `fused_track_step` per frame
index — the fixed-capacity array design means every sequence's inputs have
identical shapes, so the whole fleet is a leading batch axis. Across hosts,
sequences partition trivially (no cross-sequence communication); within a
host, batching amortizes dispatch overhead and fills the MXU.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VOConfig
from ..tracking.tracker import (
    _gray_u8,
    _inv_pose_jit,
    Tracker,
    TrackResult,
    TrackState,
    fused_out_meta,
    fused_track_step,
    lk_recover_program,
)
from ..utils import pack as pack_utils

# Most-recent step_times entries kept per phase (see track_batch_async).
_STEP_TIMES_CAP = 512


@dataclass
class BatchTracker:
    """Run S trackers whose per-frame device work is one vmapped call.

    With `mesh` set (a 1-d `jax.sharding.Mesh` whose single axis is named
    ``seq``), the sequence axis of every stacked input is sharded across
    the mesh devices and the same jitted program partitions trivially —
    sequences share no state, so XLA emits zero collectives and each chip
    tracks S / n_devices sequences (the "multi-host batch over sequences"
    scale-out of SURVEY.md §2.3/§5.8; across hosts the mesh spans DCN via
    jax.distributed and each process feeds its addressable shards).
    """

    cfg: VOConfig
    n_seq: int
    use_local_ba: bool = True
    mesh: Optional[jax.sharding.Mesh] = None
    # In-flight batch budget for track_batch_async. 1 = the original
    # one-batch lag (dispatch batch i, then resolve batch i-1: the pull
    # waits for most of batch i-1's device compute). >=2 resolves batch
    # i-depth, whose compute AND dispatch-time async D2H copy finished
    # during earlier calls, so the blocking pull costs ~0 and steady-state
    # throughput reaches max(device compute, host bookkeeping) per batch.
    # The constant-velocity baseline stays exactly one frame behind the
    # newest in-flight pose at any depth (device-side inverse of the
    # second-newest in-flight batch pose).
    pipeline_depth: int = 1
    trackers: List[Tracker] = field(init=False)

    def __post_init__(self):
        self.trackers = [
            Tracker(self.cfg, use_local_ba=self.use_local_ba)
            for _ in range(self.n_seq)
        ]
        if self.mesh is not None:
            (axis,) = self.mesh.axis_names
            assert axis == "seq", "BatchTracker mesh axis must be 'seq'"
            ndev = self.mesh.devices.size
            assert self.n_seq % ndev == 0, (
                f"n_seq={self.n_seq} not divisible by mesh size {ndev}"
            )
            self._sharding = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec("seq")
            )
        else:
            self._sharding = None
        self._pend_q: List[dict] = []  # in-flight batches, oldest first
        self._vstep = jax.jit(
            jax.vmap(
                partial(fused_track_step, self.cfg, radius=15.0, check_octave=True),
            ),
            static_argnums=(),
        )
        # LK line recovery stays a SEPARATE vmapped dispatch (inlining its
        # patch gathers into the fused program triggers a serialized XLA
        # lowering — see lk_recover_program).
        self._vlk = jax.jit(jax.vmap(partial(lk_recover_program, self.cfg)))

    def _stack_dev(self, leaves) -> jnp.ndarray:
        """Stack per-sequence host leaves and place the result sharded
        along the sequence axis (one upload per device shard) when a mesh
        is configured."""
        stacked = np.stack([np.asarray(l) for l in leaves])
        if self._sharding is None:
            return jnp.asarray(stacked)
        return jax.device_put(stacked, self._sharding)

    def _shard_dev(self, x: jnp.ndarray) -> jnp.ndarray:
        """Reshard an already-device array along the sequence axis."""
        if self._sharding is None:
            return x
        return jax.device_put(x, self._sharding)

    def warmup(self, gray: np.ndarray, depth: np.ndarray) -> None:
        """Compile/prime the SINGLE-frame fallback programs the batch loop
        reaches only when a slot leaves the steady path (LOST -> reloc,
        wide-window recovery, synchronous re-track after a poisoned
        dispatch, fine-Manhattan init). The jit caches are module-level and
        the trackers share one config, so warming one tracker covers every
        slot. Without this, the first mid-run fallback pays a 10-40 s
        compile inside the serving loop (observed in the round-4 bench)."""
        self.trackers[0].warmup(gray, depth)

    def track_batch(
        self,
        grays: Sequence[np.ndarray],
        depths: Sequence[np.ndarray],
        T_cw_inits: Optional[Sequence[Optional[np.ndarray]]] = None,
    ) -> List[TrackResult]:
        """Advance every sequence by one frame."""
        assert len(grays) == self.n_seq
        results: List[Optional[TrackResult]] = [None] * self.n_seq
        batch_ids = []
        batch_grays = []
        per_seq_args = []
        for s, tr in enumerate(self.trackers):
            tr.frame_id += 1
            gray_np = np.asarray(grays[s])
            depth_np = np.asarray(depths[s])
            if tr.state is TrackState.NOT_INITIALIZED:
                # Rare path: run the tracker's own init sequentially.
                tr.frame_id -= 1
                init = T_cw_inits[s] if T_cw_inits else None
                results[s] = tr.track_rgbd(gray_np, depth_np, T_cw_init=init)
                continue
            gray_u8 = jnp.asarray(_gray_u8(gray_np))
            depth_u16 = jnp.asarray(tr._depth_host_u16(depth_np))
            T_pred = tr.velocity @ tr.T_cw
            per_seq_args.append(tr.prepare_step_args(gray_u8, depth_u16, T_pred))
            batch_ids.append(s)
            batch_grays.append(gray_u8)

        if batch_ids:
            stacked = [
                self._shard_dev(jnp.stack(cols)) for cols in zip(*per_seq_args)
            ]
            packed, packed_big, _T_dev, _feed = self._vstep(*stacked)
            meta = fused_out_meta(self.cfg, per_seq_args[0])
            main_h, big_h = jax.device_get((packed, packed_big))
            outs = pack_utils.fill_big(
                pack_utils.unpack_main(main_h, meta, batch=True),
                pack_utils.unpack_big_leaves(big_h, meta, batch=True),
                meta,
            )
            for bi, s in enumerate(batch_ids):
                tr = self.trackers[s]
                out_s = jax.tree.map(lambda a: a[bi], outs)
                ok, T_new, pt_per_kp, n_in, feats = tr.finish_step(
                    out_s, gray=batch_grays[bi]
                )
                is_kf = False
                if ok:
                    tr.velocity = (T_new @ np.linalg.inv(tr.T_cw)).astype(np.float32)
                    tr.T_cw = T_new
                    tr.state = TrackState.OK
                    if tr._need_new_keyframe(n_in, feats, pt_per_kp):
                        tr._create_keyframe(feats, pt_per_kp)
                        is_kf = True
                        if tr.use_local_ba:
                            tr.mapper.run_local_ba()
                            tr.T_cw = tr.vomap.keyframes.T_cw[
                                tr.vomap.newest_kf_slot
                            ].copy()
                        tr.invalidate_map_snapshot()
                else:
                    tr.state = TrackState.LOST
                tr._record_trajectory()
                results[s] = TrackResult(tr.state, tr.T_cw.copy(), n_in, is_kf)
        return results  # type: ignore[return-value]

    def get_trajectories(self) -> List[np.ndarray]:
        return [tr.get_trajectory() for tr in self.trackers]

    # ---- pipelined (one-batch-lag) batch tracking ---------------------

    def _stacked_snapshot(self):
        """Batched device snapshot: per-tracker device snapshots (cached,
        re-uploaded only on map change) stacked along a leading S axis. The
        stack itself is cached and rebuilt only when some tracker's snapshot
        object changed, so the steady-state per-frame cost is zero device
        ops."""
        import jax.numpy as _jnp

        snaps = [tr._local_map_snapshot() for tr in self.trackers]
        key = tuple(id(s) for s in snaps)
        if getattr(self, "_snap_key", None) != key:
            cols = list(zip(*[s[:-2] for s in snaps]))
            self._snap_stack = tuple(
                self._shard_dev(_jnp.stack(c)) for c in cols
            )
            self._snap_key = key
        return self._snap_stack, [s[-2:] for s in snaps]

    def track_batch_async(
        self,
        grays: Sequence[np.ndarray],
        depths: Sequence[np.ndarray],
    ) -> List[TrackResult]:
        """One-batch-lag pipelined batch tracking (the S-sequence analog of
        `Tracker.track_rgbd_async`): dispatch this frame's vmapped fused
        step chained on the still-in-flight previous batch poses, then
        resolve the PREVIOUS batch — host bookkeeping for S trackers
        overlaps the in-flight device compute and both tunnel transfers.
        Returns the TrackResults that became final during this call
        (empty on the first call); call `flush()` at sequence end."""
        if any(tr.state is not TrackState.OK for tr in self.trackers):
            out = list(self.flush())
            out.extend(r for r in self.track_batch(grays, depths) if r is not None)
            return out

        import time as _time
        # Phase timers measure HOST-SIDE time only: "prep" = per-tracker arg
        # assembly, "upload" = batched leaf assembly + async jnp.asarray
        # DISPATCH (actual H2D transfer overlaps in flight), "dispatch" = the
        # vstep call (async: enqueues, does not wait for compute), "resolve" =
        # previous-batch bookkeeping, "pull" = the blocking device_get of the
        # previous result (the only phase that waits on device/transport).
        # Sum of phases = wall step time; device compute hides under "pull"
        # only when it exceeds one call period. Lists keep the most recent
        # _STEP_TIMES_CAP entries (endurance runs would grow unbounded).
        _tm = getattr(self, "step_times", None)
        if _tm is None:
            _tm = self.step_times = {
                "prep": [], "upload": [], "dispatch": [], "resolve": []
            }
        for v in _tm.values():
            if len(v) >= _STEP_TIMES_CAP:
                del v[: len(v) - _STEP_TIMES_CAP + 1]
        _t0 = _time.perf_counter()
        S = self.n_seq
        gray_h = [
            _gray_u8(np.asarray(g)) for g in grays
        ]
        depth_h = [
            self.trackers[s]._depth_host_u16(np.asarray(d))
            for s, d in enumerate(depths)
        ]
        pend = self._pend_q[-1] if self._pend_q else None
        host_cols: List[list] = None  # type: ignore[assignment]
        fids, pads = [], []
        for s, tr in enumerate(self.trackers):
            tr.frame_id += 1
            fids.append(tr.frame_id)
            if pend is None:
                T_pred = (tr.velocity @ tr.T_cw).astype(np.float32)
                T_pred_b = None
            else:
                # Constant velocity chained on the in-flight batched pose
                # inside the program (T_pred_a @ T_pred_b @ T_pred_a):
                # positions 16/18 are substituted with the device array
                # below; the host placeholder here is ignored. T_pred_b is
                # inv(last RESOLVED pose) — exactly one frame behind the
                # in-flight one at this runner's fixed one-batch lag.
                T_pred = tr.T_cw
                T_pred_b = np.linalg.inv(tr.T_cw).astype(np.float32)
            a = tr.prepare_step_args_host(
                gray_h[s], depth_h[s], T_pred, T_pred_b=T_pred_b
            )
            pads.append(tr._pads)
            if host_cols is None:
                host_cols = [[] for _ in a]
            for j, leaf in enumerate(a):
                host_cols[j].append(leaf)

        _tm["prep"].append(_time.perf_counter() - _t0)
        _t0 = _time.perf_counter()
        # Assemble the batched leaves (host layout: 0-18 fused positions,
        # 19-23 prev-line tail, 24 prev gray). Snapshot positions 2..13 come
        # from the cached stacked device snapshot; pose positions 16/18 and
        # the previous image reuse in-flight device arrays when available.
        snap_stack, _snap_pads = self._stacked_snapshot()
        gray_dev = self._stack_dev(host_cols[0])
        cols: dict = {}
        cols[0] = gray_dev
        cols[1] = self._stack_dev(host_cols[1])
        for j in range(12):
            cols[2 + j] = snap_stack[j]
        for j in (14, 15, 17, 19, 20, 21, 22, 23):
            cols[j] = self._stack_dev(host_cols[j])
        if pend is None:
            cols[16] = self._stack_dev(host_cols[16])
            cols[18] = self._stack_dev(host_cols[18])
            prev_gray_dev = self._stack_dev(host_cols[24])
        else:
            in_flight_T = pend["out"][2]  # (S, 4, 4) device pose output
            cols[16] = in_flight_T
            cols[18] = in_flight_T
            prev_gray_dev = pend["gray_dev"]
            if len(self._pend_q) >= 2:
                # Velocity baseline = second-newest in-flight batch pose
                # (device-side rigid inverse, chained, no host sync) — the
                # host placeholder (inv of the last RESOLVED pose) would be
                # pipeline_depth frames stale and overshoot the prediction.
                cols[17] = _inv_pose_jit(self._pend_q[-2]["out"][2])

        # Chained LK dispatch feeding the fused step (no host sync).
        if self.cfg.use_lines and self.cfg.lines.lk_recovery:
            cand = self._shard_dev(jnp.asarray(
                np.stack(host_cols[22]) & (np.stack(host_cols[23]) >= 0)
            ))
            lk_q0, lk_q1, lk_fit = self._vlk(
                cols[0], prev_gray_dev, cols[19], cols[20], cand,
                cols[16], cols[17], cols[18],
            )
        else:
            Ml = self.cfg.cap.lines
            lk_q0 = jnp.zeros((S, Ml, 2), jnp.float32)
            lk_q1 = jnp.zeros((S, Ml, 2), jnp.float32)
            lk_fit = jnp.zeros((S, Ml), bool)

        # Cached stacked static mask (device-resident, built once).
        if getattr(self, "_mask_stack", None) is None:
            self._mask_stack = self._shard_dev(jnp.stack(
                [tr._mask_dev for tr in self.trackers]
            ))
        leaves = [cols[j] for j in range(19)] + [lk_q0, lk_q1, lk_fit] + [
            cols[j] for j in range(19, 24)
        ] + [self._mask_stack]
        _tm["upload"].append(_time.perf_counter() - _t0)
        _t0 = _time.perf_counter()
        out_dev = self._vstep(*leaves)
        # Start the packed result's D2H copy NOW, at dispatch time: it then
        # runs as soon as this batch's compute finishes, overlapping the
        # host bookkeeping below. Requesting it on the NEXT call would
        # enqueue it behind the next batch's compute, adding a full device
        # step to every resolve.
        if hasattr(out_dev[0], "copy_to_host_async"):
            out_dev[0].copy_to_host_async()
        meta = fused_out_meta(
            self.cfg,
            [jax.ShapeDtypeStruct(l.shape[1:], l.dtype) for l in leaves],
        )
        self._pend_q.append(dict(
            out=out_dev, gray_dev=gray_dev, fids=fids, pads=pads,
            gray_h=gray_h, depth_h=depth_h, poisoned=set(), meta=meta,
        ))
        _tm["dispatch"].append(_time.perf_counter() - _t0)
        res: List[TrackResult] = []
        _t0 = _time.perf_counter()
        while len(self._pend_q) > self.pipeline_depth:
            res.extend(self._resolve_batch(self._pend_q.pop(0)))
        if res:
            _tm["resolve"].append(_time.perf_counter() - _t0)
        return res

    def flush(self) -> List[TrackResult]:
        res: List[TrackResult] = []
        while self._pend_q:
            res.extend(self._resolve_batch(self._pend_q.pop(0)))
        return res

    def _resolve_batch(self, p) -> List[TrackResult]:
        import time as _time
        _t0 = _time.perf_counter()
        buf_host = jax.device_get(p["out"][0])
        _tm = getattr(self, "step_times", None)
        if _tm is not None:
            _tm.setdefault("pull", []).append(_time.perf_counter() - _t0)
        outs = pack_utils.unpack_main(buf_host, p["meta"], batch=True)
        packed_big = p["out"][1]  # (S, nbytes) device buffer, pulled lazily
        big_rows: dict = {}

        def _big_row(s):
            # One device_get per row that actually needs its keyframe-only
            # leaves (~1/7 of rows per step); cached within the step.
            if s not in big_rows:
                big_rows[s] = jax.device_get(packed_big[s])
            return big_rows[s]

        results: List[TrackResult] = []
        poisoned_next = []
        for s, tr in enumerate(self.trackers):
            saved_fid = tr.frame_id
            tr.frame_id = p["fids"][s]
            try:
                if s in p["poisoned"]:
                    # This row's dispatch chained on a pose that turned out
                    # wrong; re-track synchronously from the corrected state.
                    res = tr._track_prepared(
                        jnp.asarray(p["gray_h"][s]), jnp.asarray(p["depth_h"][s])
                    )
                else:
                    tr._pads = p["pads"][s]
                    out_s = jax.tree.map(lambda a: a[s], outs)
                    tr._big_ctx = (
                        (lambda s=s: _big_row(s)), p["meta"], out_s,
                    )
                    five = tr.finish_step(out_s, gray=p["gray_h"][s])
                    res = tr._post_track(five, p["gray_h"][s], p["depth_h"][s])
            finally:
                tr._big_ctx = None
                tr.frame_id = saved_fid
            if res.state is not TrackState.OK or tr._used_fallback:
                poisoned_next.append(s)
            results.append(res)
        for d in self._pend_q:
            d["poisoned"].update(poisoned_next)
        return results
