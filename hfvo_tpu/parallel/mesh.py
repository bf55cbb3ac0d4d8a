"""Device mesh helpers for multi-chip/multi-host scaling.

The reference is a single-process threaded pipeline with no distributed
anything (SURVEY.md §2.3/§5.8). The TPU build's scaling axes:
- `edge`: landmark/edge-block sharding inside one solve (Schur partial sums
  reduced over ICI with psum/reduce-scatter),
- `seq`: independent sequences batched across hosts over DCN.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_edge: int | None = None, n_seq: int = 1) -> Mesh:
    """1- or 2-axis mesh over available devices: ('seq', 'edge')."""
    devs = np.array(jax.devices())
    if n_edge is None:
        n_edge = len(devs) // n_seq
    devs = devs[: n_seq * n_edge].reshape(n_seq, n_edge)
    return Mesh(devs, ("seq", "edge"))


def edge_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (edge/landmark) axis across the 'edge' mesh axis."""
    return NamedSharding(mesh, P(None, "edge"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
