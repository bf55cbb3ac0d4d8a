"""Structural line constraints: par/perp discovery + endpoint refinement.

Replaces the reference's per-frame structural machinery:
- `Manhattan::computeStructConstrains` (reference: src/Manhattan.cpp:107-161)
  discovers parallel/perpendicular line pairs by testing BOTH the 2D segment
  angle and the 3D direction angle (3 deg par / 87 deg perp gates);
- `Manhattan::computeStructConstInMap` (src/Manhattan.cpp:163-214) does the
  same against map lines in world coordinates (5 deg / 85 deg);
- `Optimizer::LineOptStruct` (src/Optimizer.cc:1480-1876) refines the
  frame's 3D line endpoints so constrained pairs become exactly
  parallel/perpendicular, with a chi2 0.02 prune and write-back.

Here discovery is one masked NL x NL angle matrix per relation, and the
endpoint refinement is a damped Gauss-Newton over all endpoints at once:
residuals are pair angle errors (1-|cos| par, |cos| perp), optional
Manhattan-axis alignment, and anchor terms tying endpoints to their
measured positions (playing the role of the reference's point-to-2D-line
reprojection edges).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class StructPairs(NamedTuple):
    par: jnp.ndarray  # (NL, NL) bool, i<j upper-triangular parallel pairs
    perp: jnp.ndarray  # (NL, NL) bool


@partial(jax.jit, static_argnames=("par_deg", "perp_deg"))
def discover_pairs(
    dir2d: jnp.ndarray,  # (NL, 2) unit 2D segment directions
    dir3d: jnp.ndarray,  # (NL, 3) unit 3D directions
    valid: jnp.ndarray,  # (NL,)
    par_deg: float = 3.0,
    perp_deg: float = 87.0,
) -> StructPairs:
    """Par/perp pair masks gated in both 2D and 3D (reference thresholds)."""
    NL = dir2d.shape[0]
    c2 = jnp.abs(dir2d @ dir2d.T)  # |cos| of 2D angles
    c3 = jnp.abs(dir3d @ dir3d.T)
    cos_par = jnp.cos(jnp.deg2rad(par_deg))
    cos_perp = jnp.cos(jnp.deg2rad(perp_deg))
    both = valid[:, None] & valid[None, :]
    upper = jnp.triu(jnp.ones((NL, NL), bool), k=1)
    par = both & upper & (c2 > cos_par) & (c3 > cos_par)
    perp = both & upper & (c2 < cos_perp) & (c3 < cos_perp)
    return StructPairs(par, perp)


@partial(jax.jit, static_argnames=("par_deg", "perp_deg"))
def discover_pairs_vs_map(
    dir_frame_w: jnp.ndarray,  # (NL, 3) frame line dirs in world coords
    valid_frame: jnp.ndarray,
    dir_map_w: jnp.ndarray,  # (M, 3) map line dirs (world)
    valid_map: jnp.ndarray,
    par_deg: float = 5.0,
    perp_deg: float = 85.0,
):
    """(NL, M) par/perp masks vs map lines (reference: computeStructConstInMap)."""
    c = jnp.abs(dir_frame_w @ dir_map_w.T)
    both = valid_frame[:, None] & valid_map[None, :]
    par = both & (c > jnp.cos(jnp.deg2rad(par_deg)))
    perp = both & (c < jnp.cos(jnp.deg2rad(perp_deg)))
    return par, perp


@partial(jax.jit, static_argnames=("n_iters", "chi2_prune"))
def line_opt_struct(
    X0: jnp.ndarray,  # (NL, 3) measured endpoint
    X1: jnp.ndarray,  # (NL, 3)
    valid: jnp.ndarray,  # (NL,)
    par: jnp.ndarray,  # (NL, NL) parallel pair mask
    perp: jnp.ndarray,  # (NL, NL)
    axis_dir: jnp.ndarray,  # (NL, 3) Manhattan axis per line (zeros if none)
    axis_valid: jnp.ndarray,  # (NL,)
    map_dir: jnp.ndarray | None = None,  # (M, 3) map-line dirs, camera frame
    par_map: jnp.ndarray | None = None,  # (NL, M) frame-line ∥ map-line
    perp_map: jnp.ndarray | None = None,  # (NL, M)
    n_iters: int = 10,
    w_struct: float = 20.0,
    w_anchor: float = 20.0,
    chi2_prune: float = 0.02,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Refine endpoints so constrained pairs are structurally consistent.

    Mirrors LineOptStruct's two-round schedule: optimize, prune constraints
    with angle chi2 > 0.02, optimize again, write endpoints back
    (reference: src/Optimizer.cc:1480-1876). Gradient steps come from
    autodiff of the total cost; anchors keep endpoints near measurements.
    When `map_dir`/`par_map`/`perp_map` are given, frame lines are also
    pulled par/perp to matched MAP line directions — the reference's
    `computeStructConstInMap` constraints feeding the same optimization
    (reference: src/Manhattan.cpp:163-214, called at src/Tracking.cc:2831;
    map directions are fixed measurements, not variables).
    Returns (X0', X1').
    """
    use_map = map_dir is not None

    def directions(X0v, X1v):
        d = X1v - X0v
        return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-9)

    def cost(params, par_m, perp_m, par_mm, perp_mm):
        X0v, X1v = params
        u = directions(X0v, X1v)
        c = u @ u.T
        # sin^2 for parallel/axis and cos^2 for perpendicular are quadratic
        # in the angle deviation (the reference's (1-|cos|)^2 chi2 is
        # quartic near the optimum, fine for LM but too flat for gradient
        # steps).
        e_par = jnp.where(par_m, 1.0 - c * c, 0.0)
        e_perp = jnp.where(perp_m, c * c, 0.0)
        ca = jnp.sum(u * axis_dir, axis=-1)
        e_axis = jnp.where(axis_valid & valid, 1.0 - ca * ca, 0.0)
        e_anchor = jnp.sum((X0v - X0) ** 2 + (X1v - X1) ** 2, axis=-1)
        total = (
            w_struct * (jnp.sum(e_par) + jnp.sum(e_perp) + jnp.sum(e_axis))
            + w_anchor * jnp.sum(jnp.where(valid, e_anchor, 0.0))
        )
        if use_map:
            cm = u @ map_dir.T  # (NL, M)
            total = total + w_struct * (
                jnp.sum(jnp.where(par_mm, 1.0 - cm * cm, 0.0))
                + jnp.sum(jnp.where(perp_mm, cm * cm, 0.0))
            )
        return total

    grad = jax.grad(cost)

    def run_round(params, par_m, perp_m, par_mm, perp_mm):
        # The current cost rides in the carry (one eval per iteration, not
        # two), and the loop is fully unrolled: each fori iteration is tiny
        # VPU work behind a sequential dependency, so per-iteration loop
        # sync dominated the stage (~1.6 ms/step on the batch-8 tracker for
        # both line_opt_struct rounds).
        def body(_, carry):
            params, cp, lr = carry
            g0, g1 = grad(params, par_m, perp_m, par_mm, perp_mm)
            new = (params[0] - lr * g0, params[1] - lr * g1)
            cn = cost(new, par_m, perp_m, par_mm, perp_mm)
            better = cn < cp
            params = jax.tree.map(
                lambda a, b: jnp.where(better, b, a), params, new
            )
            cp = jnp.where(better, cn, cp)
            lr = jnp.where(better, lr * 1.2, lr * 0.5)
            return params, cp, lr

        c0 = cost(params, par_m, perp_m, par_mm, perp_mm)
        params, _, _ = jax.lax.fori_loop(
            0, n_iters, body, (params, c0, jnp.asarray(0.01)),
            unroll=True,
        )
        return params

    # Prune pairings that are inconsistent in the *measured* geometry (the
    # reference prunes by chi2 > 0.02 on its (1-|cos|) error after the first
    # round, src/Optimizer.cc:1833-1851; gating on input directions has the
    # same intent without letting a strong weight first drag a bad pair in).
    u0 = directions(X0, X1)
    c0 = u0 @ u0.T
    par1 = par & (1.0 - jnp.abs(c0) <= chi2_prune)
    perp1 = perp & (jnp.abs(c0) <= chi2_prune)
    zmap = jnp.zeros((X0.shape[0], 1), bool)
    if use_map:
        cm0 = jnp.abs(u0 @ map_dir.T)
        par_m1 = par_map & (1.0 - cm0 <= chi2_prune)
        perp_m1 = perp_map & (cm0 <= chi2_prune)
    else:
        par_m1 = perp_m1 = zmap
    params = (X0, X1)
    params = run_round(params, par1, perp1, par_m1, perp_m1)
    # Second prune on optimized geometry + final round.
    u = directions(*params)
    c = u @ u.T
    par2 = par1 & (1.0 - c * c <= chi2_prune)
    perp2 = perp1 & (c * c <= chi2_prune)
    if use_map:
        cm = jnp.abs(u @ map_dir.T)
        par_m2 = par_m1 & (1.0 - cm * cm <= chi2_prune)
        perp_m2 = perp_m1 & (cm * cm <= chi2_prune)
    else:
        par_m2 = perp_m2 = zmap
    params = run_round(params, par2, perp2, par_m2, perp_m2)
    X0n, X1n = params
    keep = valid[:, None]
    return jnp.where(keep, X0n, X0), jnp.where(keep, X1n, X1)
