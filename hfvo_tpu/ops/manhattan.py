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


@partial(jax.jit, static_argnames=("n_iters",))
def multiview_manh_init(
    R0: jnp.ndarray,  # (3, 3) columns = seed Manhattan axes (world frame)
    d_w: jnp.ndarray,  # (L, 3) unit line directions (world frame)
    w: jnp.ndarray,  # (L,) observation weights (e.g. #KF observations; 0 = off)
    axis_idx: jnp.ndarray,  # (L,) int32 axis assignment in {-1, 0, 1, 2}
    n_iters: int = 10,
    w_perp: float = 0.25,
    w_unit: float = 10.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fine Manhattan initialization as a Levenberg-Marquardt optimization
    over three free axis vectors (reference: Optimizer::MultiViewManhInit,
    src/Optimizer.cc:3942-4338 — three marginalized `VertexSBAPointXYZ` axis
    vertices with `Par2Vectors3DMultiFrame` / `Perp2Vectors3DMultiFrame`
    angle edges over the keyframes' accumulated line observations, SVD
    re-orthonormalized at :4325-4337; triggered 4 KFs after the coarse init,
    src/LocalMapping.cc:100-110).

    Each assigned line contributes one parallel edge to its axis,
    `cross(unit(a_m), d)` (|r| = sin of the misalignment), and — because a
    Manhattan line parallel to one axis is perpendicular to the other two —
    down-weighted perpendicular edges `dot(unit(a_k), d)`, k != m. A soft
    unit-norm residual fixes each vector's scale. The three axes never share
    an edge, so the Gauss-Newton system is three independent damped 3x3
    solves per iteration; mutual orthogonality is restored at the end by the
    same SVD projection as the reference.

    Returns (R (3, 3) columns = orthonormalized axes, final cost scalar).
    """
    valid = (axis_idx >= 0) & (w > 0)
    safe_idx = jnp.maximum(axis_idx, 0)
    onehot = jax.nn.one_hot(safe_idx, 3, dtype=jnp.float32)  # (L, 3)
    w_par_la0 = jnp.where(valid, w, 0.0)[:, None] * onehot  # (L, 3)
    w_perp_la0 = jnp.where(valid, w, 0.0)[:, None] * (1.0 - onehot) * w_perp
    # Huber-IRLS robustness (reference wraps the par/perp edges in robust
    # kernels, src/Optimizer.cc:4150-4230): |r| = sin(angle error); the
    # delta matches the line conic gate so a mis-assigned line stops
    # pulling its axis.
    delta = jnp.sin(jnp.asarray(0.1018))

    L = d_w.shape[0]

    def _cross_all(An):
        """(L, 3axes, 3) cross(axis_a, d_l) for every line x axis."""
        return jnp.cross(
            jnp.broadcast_to(An[None, :, :], (L, 3, 3)),
            jnp.broadcast_to(d_w[:, None, :], (L, 3, 3)),
        )

    def cost_of(A, w_par_la, w_perp_la):  # A rows = axes
        nrm = jnp.linalg.norm(A, axis=1, keepdims=True)
        An = A / jnp.maximum(nrm, 1e-9)
        # (L, 3axes, 3) cross residuals / (L, 3axes) dot residuals
        r_par = _cross_all(An)
        r_perp = jnp.sum(An[None, :, :] * d_w[:, None, :], axis=-1)
        c = jnp.sum(w_par_la * jnp.sum(r_par * r_par, axis=-1))
        c = c + jnp.sum(w_perp_la * r_perp * r_perp)
        c = c + w_unit * jnp.sum((jnp.sum(A * A, axis=1) - 1.0) ** 2)
        return c

    def _irls_weights(A):
        nrm = jnp.linalg.norm(A, axis=1, keepdims=True)
        An = A / jnp.maximum(nrm, 1e-9)
        s_par = jnp.linalg.norm(_cross_all(An), axis=-1)  # (L, 3)
        s_perp = jnp.abs(jnp.sum(An[None, :, :] * d_w[:, None, :], axis=-1))
        w_par_la = w_par_la0 * jnp.minimum(1.0, delta / jnp.maximum(s_par, 1e-9))
        w_perp_la = w_perp_la0 * jnp.minimum(
            1.0, delta / jnp.maximum(s_perp, 1e-9)
        )
        return w_par_la, w_perp_la

    def body(_, carry):
        A, lam = carry
        w_par_la, w_perp_la = _irls_weights(A)
        nrm = jnp.linalg.norm(A, axis=1, keepdims=True)
        An = A / jnp.maximum(nrm, 1e-9)
        # d(An)/dA per axis: (I - An An^T) / |A|  -> (3, 3, 3)
        Pn = (jnp.eye(3)[None] - An[:, :, None] * An[:, None, :]) / jnp.maximum(
            nrm[:, :, None], 1e-9
        )
        # Parallel edges: r = cross(An_m, d_l) = -hat(d_l) An_m.
        # dr/dAn_m = -hat(d_l) -> (L, 3, 3), same for every axis.
        Hd = -_hat_rows(d_w)  # (L, 3, 3)
        r_par = _cross_all(An)  # (L, 3axes, 3)
        # Per-axis accumulation: H_a = sum_l w J^T J, g_a = sum_l w J^T r.
        H = jnp.einsum("la,lij,lik->ajk", w_par_la, Hd, Hd)
        g = jnp.einsum("la,lji,laj->ai", w_par_la, Hd, r_par)  # J^T r
        # Perpendicular edges: r = An_a . d_l, dr/dAn = d_l.
        r_perp = jnp.sum(An[None, :, :] * d_w[:, None, :], axis=-1)  # (L, 3)
        H = H + jnp.einsum("la,li,lj->aij", w_perp_la, d_w, d_w)
        g = g + jnp.einsum("la,la,li->ai", w_perp_la, r_perp, d_w)
        # Chain through d(An)/dA.
        H = jnp.einsum("aij,aik,akl->ajl", Pn, H, Pn)
        # (Gauss-Newton: J_A = J_An Pn, H_A = Pn^T H_An Pn, g_A = Pn^T g_An)
        g = jnp.einsum("aij,ai->aj", Pn, g)
        # Unit-norm residual (on raw A): r = |A|^2 - 1, J = 2 A.
        r_u = jnp.sum(A * A, axis=1) - 1.0
        H = H + 4.0 * w_unit * A[:, :, None] * A[:, None, :]
        g = g + 2.0 * w_unit * r_u[:, None] * A
        H = H + lam * jnp.eye(3)[None] * jnp.maximum(
            jnp.diagonal(H, axis1=1, axis2=2), 1e-6
        )[:, :, None] * jnp.eye(3)[None]
        dA = -jnp.linalg.solve(H, g[:, :, None])[..., 0]
        A_new = A + dA
        accept = (
            cost_of(A_new, w_par_la, w_perp_la) < cost_of(A, w_par_la, w_perp_la)
        ) & jnp.all(jnp.isfinite(A_new))
        A = jnp.where(accept, A_new, A)
        lam = jnp.where(
            accept, jnp.maximum(lam * 0.5, 1e-7), jnp.minimum(lam * 5.0, 1e4)
        )
        return A, lam

    A0 = R0.T  # rows = axes
    A, _ = jax.lax.fori_loop(0, n_iters, body, (A0, jnp.asarray(1e-3)))
    An = A / jnp.maximum(jnp.linalg.norm(A, axis=1, keepdims=True), 1e-9)
    R = se3.orthonormalize(An.T)  # columns = axes, SVD projection
    wp_f, wq_f = _irls_weights(R.T)
    return R, cost_of(R.T, wp_f, wq_f)


def _hat_rows(v: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) -> (N, 3, 3) cross-product matrices."""
    z = jnp.zeros_like(v[:, 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[:, 2], v[:, 1]], axis=-1),
            jnp.stack([v[:, 2], z, -v[:, 0]], axis=-1),
            jnp.stack([-v[:, 1], v[:, 0], z], axis=-1),
        ],
        axis=-2,
    )


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


def plane_seed_pair(
    plane_normals,
    plane_counts,
    plane_valid,
    line_dirs=None,
    ver_th: float = 0.08716,
):
    """Seed direction pair for the coarse Manhattan init from detected planes.

    Host-side numpy analog of ``Map::FindManhattan``
    (/root/reference/src/Map.cc:150-394, called at init from
    src/Tracking.cc:658): pick the near-perpendicular plane-normal pair
    (|n1.n2| < ver_th) with the largest combined pixel support; if no such
    pair exists, pair the plane normal with the most perpendicular 3D line
    direction. The caller feeds the pair into
    :func:`coarse_manhattan_init`'s seeded hypotheses, where mean-shift
    refinement + support-rate validation replace the reference's follow-up
    ``TrackManhattanFrame`` call.

    Returns a ``(2, 3)`` float32 array or ``None``.
    """
    import numpy as np

    n = np.asarray(plane_normals, np.float32)
    cnt = np.asarray(plane_counts, np.float32)
    ok = np.asarray(plane_valid, bool)
    n = n[ok]
    cnt = cnt[ok]
    if len(n) >= 2:
        dot = np.abs(n @ n.T)
        support = cnt[:, None] + cnt[None, :]
        perp = dot < ver_th
        np.fill_diagonal(perp, False)
        if perp.any():
            support = np.where(perp, support, -1.0)
            i, j = np.unravel_index(np.argmax(support), support.shape)
            return np.stack([n[i], n[j]]).astype(np.float32)
    if len(n) >= 1 and line_dirs is not None and len(line_dirs):
        ld = np.asarray(line_dirs, np.float32)
        ld = ld / (np.linalg.norm(ld, axis=1, keepdims=True) + 1e-9)
        dot = np.abs(n @ ld.T)  # (P, L)
        i, j = np.unravel_index(np.argmin(dot), dot.shape)
        if dot[i, j] < ver_th:
            return np.stack([n[i], ld[j]]).astype(np.float32)
    return None
