"""Distributed pose-graph optimization: edge-sharded LM-CG over a mesh.

The essential-graph solve after a loop closure
(reference: Optimizer::OptimizeEssentialGraph, src/Optimizer.cc:4339) at
multi-device scale: keyframe poses replicated, the SE(3) edge table
block-partitioned over the mesh's `edge` axis. The math is
`solve.pose_graph._pg_impl` under `shard_map` — each device linearizes its
edge block and the gradient / diagonal-block / CG-matvec accumulations are
psum-reduced (SURVEY.md §5.7: partition the keyframe-constraint axis for
pose-graph optimization).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solve.pose_graph import PoseGraph, _pg_impl

_EDGE_FIELDS = ("e_i", "e_j", "e_Tij", "e_weight")


def pad_graph_for_mesh(pg: PoseGraph, n_dev: int) -> PoseGraph:
    """Pad the edge table to a multiple of the mesh size (padding rows get
    weight 0, contributing nothing)."""
    E = pg.e_i.shape[0]
    E_pad = ((E + n_dev - 1) // n_dev) * n_dev
    if E_pad == E:
        return pg
    p = E_pad - E
    return pg._replace(
        e_i=jnp.pad(pg.e_i, (0, p)),
        e_j=jnp.pad(pg.e_j, (0, p)),
        e_Tij=jnp.pad(
            pg.e_Tij, ((0, p), (0, 0), (0, 0)), constant_values=0.0
        ).at[E:].set(jnp.eye(4)),
        e_weight=jnp.pad(pg.e_weight, (0, p)),
    )


def dist_optimize_pose_graph(
    mesh: Mesh,
    pg: PoseGraph,
    n_iters: int = 20,
    cg_iters: int = 60,
) -> jnp.ndarray:
    """Edge-sharded pose-graph solve; returns replicated corrected poses."""
    n_dev = mesh.shape["edge"]
    pg = pad_graph_for_mesh(pg, n_dev)
    in_specs = PoseGraph(
        **{
            f: P("edge") if f in _EDGE_FIELDS else P()
            for f in PoseGraph._fields
        }
    )
    fn = jax.jit(
        jax.shard_map(
            partial(
                _pg_impl, n_iters=n_iters, cg_iters=cg_iters,
                axis_name="edge",
            ),
            mesh=mesh,
            in_specs=(in_specs,),
            out_specs=P(),
            check_vma=False,
        )
    )
    placed = PoseGraph(
        *(
            jax.device_put(
                getattr(pg, f),
                NamedSharding(mesh, P("edge") if f in _EDGE_FIELDS else P()),
            )
            for f in PoseGraph._fields
        )
    )
    return fn(placed)
