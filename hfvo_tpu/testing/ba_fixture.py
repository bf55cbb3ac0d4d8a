"""Deterministic synthetic BA problem shared by the driver dryrun and the
multi-host tests (every process must build bit-identical host data)."""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..geometry import camera, se3
from ..geometry.camera import Intrinsics
from ..solve.ba import BAProblem


def synthetic_ba_problem(
    intr: Intrinsics, n_blocks: int, K: int = 6, pts_per_block: int = 40,
    seed: int = 0,
):
    """K poses on a line, `pts_per_block * n_blocks` landmarks with EXACT
    stereo observations (the global optimum is the ground truth to machine
    precision), poses 2.. and points perturbed. Returns (prob, T_gt)."""
    rng = np.random.default_rng(seed)
    Pn = pts_per_block * n_blocks
    X_gt = np.stack(
        [rng.uniform(-2, 2, Pn), rng.uniform(-1.5, 1.5, Pn), rng.uniform(3, 7, Pn)], 1
    ).astype(np.float32)
    T_gt = []
    for k in range(K):
        xi = np.zeros(6, np.float32)
        xi[0] = 0.15 * k
        T_gt.append(np.asarray(se3.exp_se3(jnp.asarray(xi))))
    T_gt = np.stack(T_gt)
    e_kf, e_pt, e_obs = [], [], []
    for k in range(K):
        X_c = np.asarray(se3.transform(jnp.asarray(T_gt[k]), jnp.asarray(X_gt)))
        uvr = np.array(camera.project_stereo(intr, jnp.asarray(X_c)))
        vis = (
            (X_c[:, 2] > 0.5)
            & (uvr[:, 0] > 0) & (uvr[:, 0] < 640)
            & (uvr[:, 1] > 0) & (uvr[:, 1] < 480)
        )
        ids = np.nonzero(vis)[0]
        e_kf += [k] * len(ids)
        e_pt += list(ids)
        e_obs += list(uvr[ids])
    E = len(e_kf)
    T_init = T_gt.copy()
    for k in range(2, K):
        T_init[k] = np.asarray(
            se3.exp_se3(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.02))
        ) @ T_gt[k]
    prob = BAProblem(
        kf_T_cw=jnp.asarray(T_init),
        kf_free=jnp.asarray(np.arange(K) >= 2),
        pt_X=jnp.asarray(X_gt + rng.normal(size=(Pn, 3)).astype(np.float32) * 0.02),
        pt_valid=jnp.ones((Pn,), bool),
        e_kf=jnp.asarray(np.array(e_kf, np.int32)),
        e_pt=jnp.asarray(np.array(e_pt, np.int32)),
        e_obs=jnp.asarray(np.stack(e_obs).astype(np.float32)),
        e_stereo=jnp.ones((E,), bool),
        e_inv_sigma2=jnp.ones((E,)),
        e_valid=jnp.ones((E,), bool),
        **BAProblem.empty_line_edges(),
    )
    return prob, T_gt
