"""Distributed global bundle adjustment: edge-sharded CG-Schur over a mesh.

TPU-native counterpart of the reference's post-loop global BA thread
(`LoopClosing::RunGlobalBundleAdjustment`, src/LoopClosing.cc:647-653) at
pod scale: the whole-map problem's EDGE tables (point reprojection + line
endpoint observations) are block-partitioned across the mesh's `edge`
axis, while the keyframe poses and landmark positions are replicated.
Each device builds the partial normal equations / Schur matvec terms from
its edge block; `psum` over ICI makes every accumulation replicated
(SURVEY.md §5.7: "shard the reduced camera system / landmark blocks
across devices", §5.8). The math is `solve.global_ba._gba_impl` run under
`shard_map` with `axis_name="edge"` — identical results to the
single-device solver up to float reduction order.

Collectives per LM iteration: 1 psum for the normal equations, 2 per CG
step (landmark gather + keyframe scatter-back), 1 for back-substitution —
all O(K*36 + P*9) floats, tiny next to ICI bandwidth.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.camera import Intrinsics
from ..solve.global_ba import GlobalBAProblem, GlobalBAResult, _gba_impl


def _pad_axis(x: jnp.ndarray, n: int) -> jnp.ndarray:
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def pad_problem_for_mesh(prob: GlobalBAProblem, n_dev: int) -> GlobalBAProblem:
    """Pad both edge tables to multiples of the mesh size (padding rows are
    e_valid/le_valid=False so they contribute nothing)."""
    def up(n):
        return ((n + n_dev - 1) // n_dev) * n_dev

    E = up(prob.e_kf.shape[0])
    El = up(prob.le_kf.shape[0])
    return prob._replace(
        e_kf=_pad_axis(prob.e_kf, E),
        e_pt=_pad_axis(prob.e_pt, E),
        e_obs=_pad_axis(prob.e_obs, E),
        e_stereo=_pad_axis(prob.e_stereo, E),
        e_inv_sigma2=_pad_axis(prob.e_inv_sigma2, E),
        e_valid=_pad_axis(prob.e_valid, E),
        le_kf=_pad_axis(prob.le_kf, El),
        le_lm=_pad_axis(prob.le_lm, El),
        le_line2d=_pad_axis(prob.le_line2d, El),
        le_inv_sigma2=_pad_axis(prob.le_inv_sigma2, El),
        le_valid=_pad_axis(prob.le_valid, El),
    )


_EDGE_FIELDS = (
    "e_kf", "e_pt", "e_obs", "e_stereo", "e_inv_sigma2", "e_valid",
    "le_kf", "le_lm", "le_line2d", "le_inv_sigma2", "le_valid",
)


def dist_global_bundle_adjustment(
    mesh: Mesh,
    prob: GlobalBAProblem,
    intr: Intrinsics,
    n_iters: int = 10,
    cg_iters: int = 40,
) -> GlobalBAResult:
    """Run the whole-map BA with edges sharded over `mesh`'s 'edge' axis.

    Returns a GlobalBAResult whose kf_T_cw/pt_X/chi2 are replicated and
    whose per-edge inlier masks are global (gathered)."""
    n_dev = mesh.shape["edge"]
    prob = pad_problem_for_mesh(prob, n_dev)

    in_specs = GlobalBAProblem(
        **{
            f: P("edge") if f in _EDGE_FIELDS else P()
            for f in GlobalBAProblem._fields
        }
    )
    out_specs = GlobalBAResult(
        kf_T_cw=P(), pt_X=P(), e_inlier=P("edge"), le_inlier=P("edge"),
        chi2=P(),
    )

    fn = jax.jit(
        jax.shard_map(
            partial(
                _gba_impl,
                intr=intr,
                n_iters=n_iters,
                cg_iters=cg_iters,
                axis_name="edge",
            ),
            mesh=mesh,
            in_specs=(in_specs,),
            out_specs=out_specs,
            check_vma=False,
        )
    )
    # Place replicated/sharded inputs explicitly so jit does not insert
    # resharding collectives of its own.
    placed = GlobalBAProblem(
        *(
            jax.device_put(
                getattr(prob, f),
                NamedSharding(
                    mesh, P("edge") if f in _EDGE_FIELDS else P()
                ),
            )
            for f in GlobalBAProblem._fields
        )
    )
    return fn(placed)
