"""Manhattan-frame estimation: mean-shift rotation tracking + coarse init.

Replaces the reference's Manhattan machinery (reference:
`Tracking::TrackManhattanFrame` src/Tracking.cc:1172-1348,
`ProjectSN2Conic`/`ProjectSN2MF` :953/:1028, `MeanShift` :1152;
`Manhattan::extractCoarseManhAxes` src/Manhattan.cpp:555-740) with batched
array programs:

- `refine_axes` (= TrackManhattanFrame): for each of the 3 candidate axes,
  conically gate the observed directions (surface normals + 3D line
  directions, sign-folded), project onto the axis' tangent plane, take the
  Gaussian-kernel mean shift `exp(-kernel * ||x||^2)` (reference kernel 20,
  src/Tracking.cc:1161), update the axis, complete a missing third axis by
  cross product (src/Tracking.cc:1292-1331), and re-orthonormalize by SVD
  (src/Tracking.cc:1334-1339). The reference's outer loop runs exactly once
  (`for (int i=0;i<1;i++)`, src/Tracking.cc:1180); iterations here are a
  parameter.
- `coarse_manhattan_init` (= extractCoarseManhAxes): score many rotation
  hypotheses (seeded from observed direction pairs + fixed quasi-random
  rotations) by refining each a few mean-shift steps and measuring support;
  accept when the support rate clears the reference's 0.95 gate
  (src/Tracking.cc:573).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3


def _fold(dirs: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """Flip directions into the hemisphere of `axis` (normals/line dirs are
    sign-ambiguous)."""
    s = jnp.sign(jnp.sum(dirs * axis, axis=-1, keepdims=True))
    return dirs * jnp.where(s == 0, 1.0, s)


def _meanshift_axes(R, dirs, weights, cone, kernel):
    """One mean-shift step per axis; returns (rows-of-axes (3, 3), support
    counts (3,)) WITHOUT cross-completion or re-orthonormalization — each
    row is exactly what the observations measured for that axis."""
    cos_cone = jnp.cos(cone)
    axes = R.T  # (3, 3) rows = axes
    new_axes = []
    supports = []
    for a in range(3):
        axis = axes[a]
        d = _fold(dirs, axis)
        cosang = jnp.sum(d * axis, axis=-1)
        gate = (cosang > cos_cone) & (weights > 0)
        # Tangent-plane projection (reference ProjectSN2MF): express the
        # residual of each gated direction in the plane orthogonal to
        # the axis.
        perp = d - cosang[:, None] * axis[None, :]
        # Gaussian kernel on tangent magnitude.
        w = jnp.where(gate, weights * jnp.exp(-kernel * jnp.sum(perp * perp, axis=-1)), 0.0)
        sw = jnp.sum(w)
        shift = jnp.sum(w[:, None] * perp, axis=0) / jnp.maximum(sw, 1e-9)
        new_axis = axis + shift
        new_axis = new_axis / (jnp.linalg.norm(new_axis) + 1e-12)
        has = sw > 1e-6
        new_axes.append(jnp.where(has, new_axis, axis))
        supports.append(jnp.sum(gate.astype(jnp.int32)))
    return jnp.stack(new_axes), jnp.stack(supports)


def measure_axes(
    R_cm: jnp.ndarray,
    dirs: jnp.ndarray,
    weights: jnp.ndarray,
    cone: jnp.ndarray | float = 0.2018,
    kernel: float = 20.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-axis mean-shift measurement (rows = measured axis directions in
    the camera frame, support counts). Unlike refine_axes, no joint
    orthonormalization: a weakly-supported axis cannot corrupt a
    well-supported one, so the rows are usable as independent direction
    anchors (one wall normal pins 2 rotation DOF by itself)."""
    return _meanshift_axes(R_cm, dirs, weights, cone, kernel)


@partial(jax.jit, static_argnames=("n_iters", "kernel"))
def refine_axes(
    R_cm: jnp.ndarray,  # (3, 3) columns = Manhattan axes in camera frame
    dirs: jnp.ndarray,  # (N, 3) unit observation directions (camera frame)
    weights: jnp.ndarray,  # (N,) observation weights (0 = invalid)
    cone: jnp.ndarray | float = 0.2018,  # conic half-angle gate (radians)
    n_iters: int = 1,
    kernel: float = 20.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-shot mean-shift refinement of the Manhattan rotation.

    Returns (R_cm_refined (3, 3), per-axis support counts (3,)).
    """
    def one_iter(R, _):
        A, sup = _meanshift_axes(R, dirs, weights, cone, kernel)
        # Missing-axis completion by cross products (keep handedness).
        s0, s1, s2 = sup[0] > 0, sup[1] > 0, sup[2] > 0
        a0 = jnp.where(s0, A[0], _unit(jnp.cross(A[1], A[2])))
        a1 = jnp.where(s1, A[1], _unit(jnp.cross(A[2], a0)))
        a2 = jnp.where(s2, A[2], _unit(jnp.cross(a0, a1)))
        R_new = jnp.stack([a0, a1, a2]).T  # columns = axes
        R_new = se3.orthonormalize(R_new)
        return R_new, sup

    R, sup = R_cm, jnp.zeros((3,), jnp.int32)
    for _ in range(n_iters):
        R, sup = one_iter(R, None)
    return R, sup


def _unit(v):
    return v / (jnp.linalg.norm(v) + 1e-12)


def support_rate(
    R_cm: jnp.ndarray, dirs: jnp.ndarray, weights: jnp.ndarray, cone: float = 0.2018
) -> jnp.ndarray:
    """Fraction of valid directions within the cone of *some* axis."""
    axes = R_cm.T
    d = dirs[:, None, :]
    cosang = jnp.abs(jnp.sum(d * axes[None, :, :], axis=-1))  # (N, 3)
    near = jnp.any(cosang > jnp.cos(cone), axis=-1)
    ok = weights > 0
    return jnp.sum((near & ok).astype(jnp.float32)) / jnp.maximum(
        jnp.sum(ok.astype(jnp.float32)), 1.0
    )


def _hypothesis_rotations(dirs: np.ndarray | None, n_random: int = 40) -> np.ndarray:
    """Candidate rotations: fixed quasi-random + (optionally) seeded from
    observation pairs at call time. Returns (H, 3, 3) float32."""
    rs = np.random.RandomState(11)
    qs = rs.normal(size=(n_random, 4))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    Rs = np.asarray(se3.mat_from_quat(jnp.asarray(qs.astype(np.float32))))
    return Rs


_FIXED_HYPS = _hypothesis_rotations(None)


@partial(jax.jit, static_argnames=("cone", "n_refine"))
def coarse_manhattan_init(
    dirs: jnp.ndarray,  # (N, 3) normals + line directions, camera frame
    weights: jnp.ndarray,  # (N,)
    seed_pairs: jnp.ndarray,  # (S, 2, 3) direction pairs to seed rotations
    cone: float = 0.2018,
    n_refine: int = 4,
):
    """Hypothesis search for the initial Manhattan rotation.

    Returns (R_cm (3, 3), rate scalar). Accept if rate > 0.95
    (reference: src/Tracking.cc:573).
    """
    # Seeded hypotheses: a = first dir; b = orthogonalized second; c = a x b.
    a = seed_pairs[:, 0]
    a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-9)
    b0 = seed_pairs[:, 1]
    b = b0 - jnp.sum(b0 * a, axis=-1, keepdims=True) * a
    bn = jnp.linalg.norm(b, axis=-1, keepdims=True)
    b = b / jnp.maximum(bn, 1e-6)
    c = jnp.cross(a, b)
    seeded = jnp.stack([a, b, c], axis=-1)  # (S, 3, 3) columns = axes
    ok_seed = (bn[:, 0] > 0.3)  # reject near-parallel pairs
    seeded = jnp.where(ok_seed[:, None, None], seeded, jnp.eye(3))

    hyps = jnp.concatenate([seeded, jnp.asarray(_FIXED_HYPS)], axis=0)

    def eval_hyp(R0):
        R, _ = refine_axes(R0, dirs, weights, cone=cone, n_iters=n_refine)
        return R, support_rate(R, dirs, weights, cone)

    Rs, rates = jax.vmap(eval_hyp)(hyps)
    best = jnp.argmax(rates)
    return Rs[best], rates[best]


def line_axis_assignment(
    R_cm: jnp.ndarray, line_dirs: jnp.ndarray, cone: float = 0.1018
) -> jnp.ndarray:
    """Assign each line direction to a Manhattan axis (or -1).

    (reference: Manhattan::LineManhAxisCorresp, src/Manhattan.cpp:1139; line
    cone sin(0.1018), src/Tracking.cc:961.)
    """
    axes = R_cm.T
    cosang = jnp.abs(line_dirs @ axes.T)  # (N, 3)
    best = jnp.argmax(cosang, axis=-1)
    best_cos = jnp.max(cosang, axis=-1)
    return jnp.where(best_cos > jnp.cos(cone), best, -1).astype(jnp.int32)
