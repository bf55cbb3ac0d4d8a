import jax.numpy as jnp
import numpy as np

from hfvo_tpu.geometry import se3
from hfvo_tpu.ops import manhattan, planes
from hfvo_tpu.config import tum3_config
from hfvo_tpu.testing import synthetic


def synthetic_bundle(rng, R_gt, n_per_axis=200, noise=0.02, outlier_frac=0.1):
    """Noisy direction observations around the 3 axes of R_gt (+ outliers)."""
    dirs = []
    for a in range(3):
        axis = R_gt[:, a]
        d = axis[None, :] + rng.normal(size=(n_per_axis, 3)) * noise
        d *= rng.choice([-1, 1], (n_per_axis, 1))  # sign ambiguity
        dirs.append(d)
    n_out = int(3 * n_per_axis * outlier_frac)
    dirs.append(rng.normal(size=(n_out, 3)))
    d = np.concatenate(dirs)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return d.astype(np.float32)


def rot_angle(Ra, Rb):
    """Smallest rotation angle mapping axes of Ra onto axes of Rb, up to
    axis permutation/sign (the Manhattan frame is only defined up to the
    cube's symmetry group)."""
    M = np.abs(Ra.T @ Rb)  # |cos| between axis pairs
    # Greedy assignment is fine for near-aligned frames.
    ang = np.arccos(np.clip(M.max(axis=1), -1, 1))
    return ang.max()


def test_refine_axes_converges(rng):
    R_gt = np.asarray(se3.exp_so3(jnp.array([0.2, -0.3, 0.5])))
    d = synthetic_bundle(rng, R_gt)
    # Start from a perturbed rotation (~5 deg off).
    R0 = np.asarray(se3.exp_so3(jnp.array([0.05, 0.03, -0.06]))) @ R_gt
    R, sup = manhattan.refine_axes(
        jnp.asarray(R0.astype(np.float32)), jnp.asarray(d),
        jnp.ones((len(d),)), n_iters=3,
    )
    R = np.asarray(R)
    assert rot_angle(R, R_gt) < 0.01, rot_angle(R, R_gt)
    assert (np.asarray(sup) > 100).all()


def test_refine_axes_two_axes_only(rng):
    """Only two axes observed: the third completes by cross product."""
    R_gt = np.asarray(se3.exp_so3(jnp.array([0.1, 0.2, -0.1])))
    d = []
    for a in (0, 1):
        axis = R_gt[:, a]
        dd = axis[None, :] + rng.normal(size=(150, 3)) * 0.02
        d.append(dd / np.linalg.norm(dd, axis=1, keepdims=True))
    d = np.concatenate(d).astype(np.float32)
    R0 = np.asarray(se3.exp_so3(jnp.array([0.04, -0.03, 0.05]))) @ R_gt
    R, sup = manhattan.refine_axes(
        jnp.asarray(R0.astype(np.float32)), jnp.asarray(d), jnp.ones((len(d),)),
        n_iters=3,
    )
    assert rot_angle(np.asarray(R), R_gt) < 0.02
    # Orthonormal result.
    RtR = np.asarray(R).T @ np.asarray(R)
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-5)


def test_coarse_init_finds_rotation(rng):
    R_gt = np.asarray(se3.exp_so3(jnp.array([0.4, -0.2, 0.3])))
    d = synthetic_bundle(rng, R_gt, outlier_frac=0.05)
    w = np.ones((len(d),), np.float32)
    # Seed pairs from random observation pairs.
    idx = rng.integers(0, len(d), size=(24, 2))
    seeds = d[idx]
    R, rate = manhattan.coarse_manhattan_init(
        jnp.asarray(d), jnp.asarray(w), jnp.asarray(seeds)
    )
    assert float(rate) > 0.9
    assert rot_angle(np.asarray(R), R_gt) < 0.02


def test_coarse_init_rejects_unstructured(rng):
    d = rng.normal(size=(500, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    idx = rng.integers(0, len(d), size=(24, 2))
    R, rate = manhattan.coarse_manhattan_init(
        jnp.asarray(d), jnp.ones((500,)), jnp.asarray(d[idx])
    )
    assert float(rate) < 0.8  # no 0.95-gate pass on isotropic directions


def test_room_normals_give_manhattan(rng):
    """Normals from the rendered room recover the world axes."""
    intr = tum3_config().camera
    T_wc, grays, depths = synthetic.render_sequence(n=1, seed=0)
    n, ok = planes.compute_normals(jnp.asarray(depths[0]), intr)
    d = np.asarray(n)[np.asarray(ok)]
    sub = d[:: max(len(d) // 800, 1)].astype(np.float32)
    idx = rng.integers(0, len(sub), size=(24, 2))
    R_cm, rate = manhattan.coarse_manhattan_init(
        jnp.asarray(sub), jnp.ones((len(sub),)), jnp.asarray(sub[idx])
    )
    assert float(rate) > 0.9
    # World Manhattan axes = identity; camera axes = R_cw @ I.
    R_cw = np.linalg.inv(T_wc[0])[:3, :3]
    assert rot_angle(np.asarray(R_cm), R_cw) < 0.03


def test_line_axis_assignment():
    R = np.eye(3, dtype=np.float32)
    dirs = jnp.asarray(
        np.array(
            [[1, 0.02, 0], [0, -1, 0.03], [0.02, 0, 1], [0.7, 0.7, 0]], np.float32
        )
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    a = np.asarray(manhattan.line_axis_assignment(jnp.asarray(R), dirs))
    assert list(a[:3]) == [0, 1, 2]
    assert a[3] == -1


def test_multiview_manh_init_lm_beats_meanshift(rng):
    """MultiViewManhInit as an LM (reference: Optimizer.cc:3942-4338): from
    a coarse init ~10 deg off — beyond the mean-shift conic gate — the LM
    still converges to sub-degree axes while the refit stays stuck."""
    from hfvo_tpu.geometry import se3

    errs_lm, errs_ms = [], []
    for seed in range(8):
        r = np.random.default_rng(seed)
        q = r.normal(size=4)
        q /= np.linalg.norm(q)
        R_true = np.asarray(se3.mat_from_quat(jnp.asarray(q.astype(np.float32))))
        L = 128
        idx = r.integers(0, 3, L).astype(np.int32)
        d = R_true[:, idx].T + r.normal(size=(L, 3)) * 0.03
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        w = np.ones(L, np.float32)
        v = r.normal(size=3)
        v = v / np.linalg.norm(v) * 0.17  # ~10 deg initial error
        R0 = np.asarray(se3.exp_so3(jnp.asarray(v.astype(np.float32)))) @ R_true

        def angerr(R):
            cos = np.abs(np.sum(R * R_true, axis=0))
            return np.degrees(np.arccos(np.clip(cos, -1, 1))).max()

        R_lm, _ = manhattan.multiview_manh_init(
            jnp.asarray(R0.astype(np.float32)), jnp.asarray(d.astype(np.float32)),
            jnp.asarray(w), jnp.asarray(idx), n_iters=15,
        )
        R_ms, _ = manhattan.refine_axes(
            jnp.asarray(R0.astype(np.float32)), jnp.asarray(d.astype(np.float32)),
            jnp.asarray(w), cone=0.1018, n_iters=3,
        )
        errs_lm.append(angerr(np.asarray(R_lm)))
        errs_ms.append(angerr(np.asarray(R_ms)))
    assert max(errs_lm) < 0.5, errs_lm
    # Some alignments keep the refit inside its cone (it does fine there);
    # the failure mode is the stuck-outside-cone case, which the LM never
    # hits.
    assert max(errs_ms) > 2.0, (errs_lm, errs_ms)
    assert np.mean(errs_ms) > 3.0 * np.mean(errs_lm), (errs_lm, errs_ms)


def test_plane_seed_pair_picks_perpendicular_planes():
    """Best near-perpendicular plane pair by combined support (reference:
    Map::FindManhattan plane-pair branch, src/Map.cc:158-201)."""
    n = np.array(
        [
            [1.0, 0.0, 0.0],
            [0.02, 0.999, 0.0],  # ~perpendicular to plane 0
            [0.97, 0.24, 0.0],  # nearly parallel to plane 0
            [0.0, 0.05, 0.999],  # perpendicular to both 0 and 1
        ],
        np.float32,
    )
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    counts = np.array([500.0, 100.0, 400.0, 300.0])
    pair = manhattan.plane_seed_pair(n, counts, np.ones(4, bool))
    assert pair is not None
    # 0+3 has support 800 > 0+1 (600) > 1+3 (400); 0+2 is not perpendicular.
    np.testing.assert_allclose(pair[0], n[0], atol=1e-6)
    np.testing.assert_allclose(pair[1], n[3], atol=1e-6)


def test_plane_seed_pair_plane_line_fallback():
    """With one plane, pair it with the most perpendicular line direction
    (reference: Map::FindManhattan plane+line branch, src/Map.cc:206-270)."""
    n = np.array([[0.0, 0.0, 1.0]], np.float32)
    lines = np.array([[1.0, 0.0, 0.3], [0.99, 0.0, 0.02]], np.float32)
    pair = manhattan.plane_seed_pair(n, [100.0], [True], line_dirs=lines)
    assert pair is not None
    np.testing.assert_allclose(pair[0], n[0], atol=1e-6)
    want = lines[1] / np.linalg.norm(lines[1])
    np.testing.assert_allclose(pair[1], want, atol=1e-6)
    # No perpendicular candidate at a tight threshold -> no seed.
    assert (
        manhattan.plane_seed_pair(
            n, [100.0], [True], line_dirs=lines[:1], ver_th=0.05
        )
        is None
    )


def test_plane_seed_drives_coarse_init(rng):
    """A plane-pair seed alone (degenerate random pairs) recovers the
    rotation through coarse_manhattan_init's refinement + rate gate."""
    R_gt = np.asarray(se3.exp_so3(jnp.array([0.3, 0.5, -0.2])))
    d = synthetic_bundle(rng, R_gt, outlier_frac=0.05)
    w = np.ones((len(d),), np.float32)
    # Plane normals = two noisy axes of R_gt, as segment_planes would emit.
    noisy = R_gt[:, :2].T + rng.normal(size=(2, 3)) * 0.02
    pair = manhattan.plane_seed_pair(noisy, [400.0, 300.0], [True, True])
    assert pair is not None
    # All random pairs degenerate (parallel) so only the plane seed works;
    # the fixed-hypothesis fallback bank remains, so require the seed to win
    # by a margin: rate with seed must beat rate with degenerate seed only.
    degen = np.tile(d[:1], (24, 2, 1)).astype(np.float32)
    seeds = degen.copy()
    seeds[0] = pair
    R, rate = manhattan.coarse_manhattan_init(
        jnp.asarray(d), jnp.asarray(w), jnp.asarray(seeds)
    )
    assert float(rate) > 0.9
    assert rot_angle(np.asarray(R), R_gt) < 0.03
