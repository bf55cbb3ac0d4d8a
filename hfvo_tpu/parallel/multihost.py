"""Multi-host execution of the distributed solvers (SURVEY.md §5.8).

The reference is a single-process threaded pipeline with no distributed
communication at all (no MPI/NCCL/sockets — SURVEY.md §2.3). The TPU build
scales past one host with `jax.distributed`: every host contributes its
local chips to ONE global mesh, the blocked `ShardedBA` arrays become
global `jax.Array`s (each process materializes only its addressable
shards), and the same `shard_map` Schur program from `parallel.dist_ba`
runs unchanged — partial-sum `psum`s ride ICI within a host and DCN
across hosts.

The host-side problem (keyframe window, edge tables) is replicated: each
process builds the identical blocked problem and `globalize_sharded_ba`
slices out its local shards. That mirrors how the tracker drives local BA
— the map state is host-resident and cheap relative to the solve.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .dist_ba import ShardedBA


def initialize(coordinator: str, num_processes: int, process_id: int) -> None:
    """Join the jax.distributed runtime (idempotent per process)."""
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


# Sharding of every ShardedBA array field, matching the in_specs of
# dist_ba.dist_local_bundle_adjustment's shard_map: per-edge/landmark
# tables are blocked along the 'edge' mesh axis, poses and axis anchors
# replicated.
_EDGE = (
    "pt_X", "pt_valid",
    "e_kf", "e_pt", "e_obs", "e_stereo", "e_inv_sigma2", "e_valid",
    "le_kf", "le_lm", "le_line2d", "le_inv_sigma2", "le_valid",
    "lp_s", "lp_e", "lp_axis", "lp_w", "lp_valid",
    "ll_sa", "ll_ea", "ll_sb", "ll_eb", "ll_kind", "ll_w", "ll_valid",
)
_REPL = ("kf_T_cw", "kf_free", "kf_axes_c", "kf_axes_w", "kf_w_axis")


def globalize_sharded_ba(sp: ShardedBA, mesh: Mesh) -> ShardedBA:
    """Turn host-replicated blocked arrays into global jax.Arrays laid out
    for the distributed BA. Each process only touches the block rows its
    local devices own; under a single process this is a plain device_put."""
    out = {}
    for name in _EDGE:
        a = np.asarray(getattr(sp, name))
        spec = P("edge", *([None] * (a.ndim - 1)))
        sh = NamedSharding(mesh, spec)
        out[name] = jax.make_array_from_callback(
            a.shape, sh, lambda idx, a=a: a[idx]
        )
    for name in _REPL:
        a = np.asarray(getattr(sp, name))
        sh = NamedSharding(mesh, P())
        out[name] = jax.make_array_from_callback(
            a.shape, sh, lambda idx, a=a: a[idx]
        )
    return sp._replace(**out)
