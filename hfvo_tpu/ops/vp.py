"""Vanishing points from 2D line segments — batched hypothesis voting.

Replaces the reference's VP machinery in Frame (reference:
`getVPHypVia2Lines` src/Frame.cc:442 — ~37.8k two-line hypotheses;
`getSphereGrids` :546 — Gaussian-sphere accumulation; `getBestVpsHyp` :651;
`line2Vps` :708 — line->VP clustering at a 1 deg threshold, Frame.h:365).

Formulation: each 2D segment lifts to a great-circle normal on the Gaussian
sphere (`n = K^T l`, unit). A VP direction v is consistent with a line when
v ⟂ n. Hypotheses come from line pairs (`v = n_i x n_j`); each is scored
against all lines in one |cos| matrix; the best orthogonal triple wins.
The reference's sphere-grid accumulation is the same consistency count with
binning — scoring directly on hypotheses avoids the grid while keeping the
vote semantics.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import Intrinsics

from . import sym_eig

N_PAIRS = 512  # two-line hypotheses scored (reference enumerates ~37.8k)


class VPResult(NamedTuple):
    vps: jnp.ndarray  # (3, 3) unit VP directions in camera coords
    support: jnp.ndarray  # (3,) supporting line counts
    line_vp: jnp.ndarray  # (NL,) int32 assignment (-1 none)
    ok: jnp.ndarray  # () bool — found at least 2 strong orthogonal VPs


def line_normals(intr: Intrinsics, p0: jnp.ndarray, p1: jnp.ndarray) -> jnp.ndarray:
    """Great-circle normals (NL, 3) of segments on the Gaussian sphere."""
    def lift(p):
        return jnp.stack(
            [(p[:, 0] - intr.cx) / intr.fx, (p[:, 1] - intr.cy) / intr.fy,
             jnp.ones(p.shape[0])],
            axis=1,
        )

    n = jnp.cross(lift(p0), lift(p1))
    return n / (jnp.linalg.norm(n, axis=1, keepdims=True) + 1e-12)


@partial(jax.jit, static_argnames=("intr", "cone_deg"))
def estimate_vps(
    intr: Intrinsics,
    p0: jnp.ndarray,  # (NL, 2)
    p1: jnp.ndarray,
    valid: jnp.ndarray,  # (NL,)
    cone_deg: float = 1.0,
) -> VPResult:
    NL = p0.shape[0]
    n = line_normals(intr, p0, p1)  # (NL, 3)
    # Length-weighted votes (long segments have accurate normals; short edge
    # fragments are noisy) — the reference's sphere-grid votes carry line
    # weight the same way. Normalized to mean 1 over valid lines.
    length = jnp.linalg.norm(p1 - p0, axis=1)
    wv = jnp.where(valid, length, 0.0)
    wv = wv / jnp.maximum(jnp.sum(wv) / jnp.maximum(jnp.sum(valid), 1), 1e-9)

    # Deterministic pair pattern (fresh seed per trace: call-order must not
    # change which hypotheses a given input size gets), drawn over the
    # *compacted* valid lines so sparse inputs still yield dense hypotheses.
    order = jnp.argsort(~valid)  # valid slots first
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    raw = jnp.asarray(
        np.random.RandomState(17)
        .randint(0, 1 << 30, size=(N_PAIRS, 2))
        .astype(np.int32)
    )
    idx = order[raw % n_valid]
    vi = n[idx[:, 0]]
    vj = n[idx[:, 1]]
    v = jnp.cross(vi, vj)
    norm = jnp.linalg.norm(v, axis=1, keepdims=True)
    v = v / jnp.maximum(norm, 1e-9)
    hyp_ok = (
        (norm[:, 0] > 1e-3)
        & valid[idx[:, 0]]
        & valid[idx[:, 1]]
    )

    # Two-line hypotheses from near-parallel pairs are directionally noisy
    # (cross product of similar normals). Refine each against its loose-cone
    # inliers: the VP is the null direction of the supported normals, i.e.
    # the smallest eigenvector of sum(n n^T) — the batched equivalent of the
    # reference's sphere-grid accumulation + peak (getSphereGrids).
    th_loose = jnp.sin(jnp.deg2rad(3.0 * cone_deg))
    supp_l = (jnp.abs(v @ n.T) < th_loose) & valid[None, :]  # (H, NL)
    w_l = supp_l.astype(jnp.float32) * wv[None, :]
    M = jnp.einsum("hl,li,lj->hij", w_l, n, n)  # (H, 3, 3)
    _, evecs = sym_eig.eigh3(M + 1e-9 * jnp.eye(3))
    v_ref = evecs[:, :, 0]
    enough = jnp.sum(supp_l, axis=1) >= 3
    v = jnp.where(enough[:, None], v_ref, v)

    # Consistency: |v . n_l| < sin(cone) for supporting lines.
    th = jnp.sin(jnp.deg2rad(cone_deg))
    C = jnp.abs(v @ n.T)  # (H, NL)
    supp = (C < th) & valid[None, :]
    counts = jnp.sum(supp * wv[None, :], axis=1) * hyp_ok

    # Best VP first; the second is chosen by the JOINT support of the
    # orthogonalized candidate and the completing third axis — a weakly
    # constrained second VP (near-parallel line families) would otherwise
    # slide along its great circle (the reference resolves the same
    # ambiguity by scoring orthogonal triples in getBestVpsHyp).
    b1 = jnp.argmax(counts)
    v1 = v[b1]
    ortho2 = jnp.abs(v @ v1) < 0.2588  # within 75-105 deg
    v2_cand = v - (v @ v1)[:, None] * v1[None, :]
    v2_cand = v2_cand / (jnp.linalg.norm(v2_cand, axis=1, keepdims=True) + 1e-12)
    v3_cand = jnp.cross(v1[None, :], v2_cand)
    c2 = jnp.sum(((jnp.abs(v2_cand @ n.T) < th) & valid[None, :]) * wv[None, :], axis=1)
    c3 = jnp.sum(((jnp.abs(v3_cand @ n.T) < th) & valid[None, :]) * wv[None, :], axis=1)
    joint = (c2 + c3) * ortho2 * hyp_ok
    b2 = jnp.argmax(joint)
    v2 = v2_cand[b2]
    v3 = v3_cand[b2]
    vps = jnp.stack([v1, v2, v3])

    # Line assignment at the reference's 1 deg gate (Frame.h:365).
    A = jnp.abs(vps @ n.T)  # (3, NL)
    best = jnp.argmin(A, axis=0)
    best_val = jnp.min(A, axis=0)
    line_vp = jnp.where((best_val < th) & valid, best, -1).astype(jnp.int32)

    support = jnp.stack(
        [jnp.sum((line_vp == k).astype(jnp.int32)) for k in range(3)]
    )
    ok = (counts[b1] >= 4) & (joint[b2] >= 3)
    return VPResult(vps, support, line_vp, ok)
