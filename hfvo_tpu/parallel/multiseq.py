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
from ..tracking.tracker import Tracker, TrackResult, TrackState, fused_track_step


@dataclass
class BatchTracker:
    """Run S trackers whose per-frame device work is one vmapped call."""

    cfg: VOConfig
    n_seq: int
    use_local_ba: bool = True
    trackers: List[Tracker] = field(init=False)

    def __post_init__(self):
        self.trackers = [
            Tracker(self.cfg, use_local_ba=self.use_local_ba)
            for _ in range(self.n_seq)
        ]
        self._vstep = jax.jit(
            jax.vmap(
                partial(fused_track_step, self.cfg, radius=15.0, check_octave=True),
            ),
            static_argnums=(),
        )

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
            gray_u8 = jnp.asarray(np.clip(gray_np, 0, 255).astype(np.uint8))
            depth_u16 = jnp.asarray(
                np.clip(depth_np * 1000.0, 0, 65535).astype(np.uint16)
            )
            T_pred = tr.velocity @ tr.T_cw
            per_seq_args.append(tr.prepare_step_args(gray_u8, depth_u16, T_pred))
            batch_ids.append(s)
            batch_grays.append(gray_u8)

        if batch_ids:
            stacked = [jnp.stack(cols) for cols in zip(*per_seq_args)]
            outs = jax.device_get(self._vstep(*stacked))
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
