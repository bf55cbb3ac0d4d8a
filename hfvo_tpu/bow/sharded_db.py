"""Keyframe-axis-sharded appearance database over a device mesh.

TPU-native replacement for DBoW2's inverted file at fleet scale
(reference: `KeyFrameDatabase` + `vector<list<KeyFrame*>>`,
include/KeyFrameDatabase.h:55-66, queried by
DetectRelocalizationCandidates src/KeyFrameDatabase.cc:199). The dense
(K, W) histogram matrix partitions over the mesh's `kf` axis; a query is
a shard-local L1 score matvec + shard-local top-k, then one all_gather of
(n_dev * top_k) candidates merged on the host (SURVEY.md §5.8: "a sharded
inverted-index lookup (segment-sum over shards + top-k all-gather)").

Host tables stay the source of truth (`add`/`erase` are numpy writes);
the device copy refreshes lazily before a query when dirty — queries are
rare (relocalization / loop detection) next to per-frame tracking.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .vocab import N_WORDS


class ShardedKeyFrameDatabase:
    """Same query contract as `KeyFrameDatabase` (top-k L1 candidates gated
    at 0.75x best, src/KeyFrameDatabase.cc:256), K axis sharded."""

    def __init__(self, mesh: Mesh, capacity: int, top_k: int = 5):
        self.mesh = mesh
        n_dev = mesh.shape["kf"]
        self.capacity = ((capacity + n_dev - 1) // n_dev) * n_dev
        self.top_k = top_k
        self.hists = np.zeros((self.capacity, N_WORDS), np.float32)
        self.valid = np.zeros((self.capacity,), bool)
        self._dirty = True
        self._dev = None

        @partial(jax.jit, static_argnames=("k",))
        def _query(hists_d, valid_d, hist, exclude, k):
            def shard_fn(h_blk, v_blk, q, excl):
                idx = jax.lax.axis_index("kf")
                blk = h_blk.shape[0]
                base = idx * blk
                scores = 1.0 - 0.5 * jnp.sum(jnp.abs(h_blk - q[None, :]), axis=1)
                gids = base + jnp.arange(blk)
                scores = jnp.where(v_blk & (gids != excl), scores, -1.0)
                s, i = jax.lax.top_k(scores, min(k, blk))
                return (
                    jax.lax.all_gather(s, "kf", tiled=True),
                    jax.lax.all_gather(base + i, "kf", tiled=True),
                )

            return jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P("kf"), P("kf"), P(), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )(hists_d, valid_d, hist, exclude)

        self._query_fn = _query

    def add(self, kf_slot: int, hist: np.ndarray) -> None:
        self.hists[kf_slot] = hist
        self.valid[kf_slot] = True
        self._dirty = True

    def erase(self, kf_slot: int) -> None:
        self.valid[kf_slot] = False
        self._dirty = True

    def _refresh(self):
        if self._dirty or self._dev is None:
            sh = NamedSharding(self.mesh, P("kf"))
            self._dev = (
                jax.device_put(self.hists, sh),
                jax.device_put(self.valid, sh),
            )
            self._dirty = False

    def query(self, hist: np.ndarray, top_k: int | None = None,
              exclude: int = -1):
        """Top-k candidate KF slots by L1 similarity across all shards."""
        k = self.top_k if top_k is None else top_k
        self._refresh()
        s, i = self._query_fn(
            self._dev[0], self._dev[1],
            jnp.asarray(hist, jnp.float32), jnp.asarray(exclude, jnp.int32),
            k=k,
        )
        s = np.asarray(s)
        i = np.asarray(i)
        order = np.argsort(-s)[:k]
        s, i = s[order], i[order]
        keep = (s >= 0) & (s >= max(0.0, 0.75 * (s[0] if len(s) else 0.0)))
        return i[keep], s[keep]
