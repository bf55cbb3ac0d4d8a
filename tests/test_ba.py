import jax.numpy as jnp
import numpy as np

from hfvo_tpu.config import tum3_config
from hfvo_tpu.geometry import camera, se3
from hfvo_tpu.solve.ba import BAProblem, local_bundle_adjustment

INTR = tum3_config().camera


def make_ba_problem(
    rng, K=6, P=300, pose_noise=0.02, pt_noise=0.02, obs_noise=0.3, outlier_frac=0.0
):
    """K cameras in a line observing P landmarks; first two KFs fixed."""
    X_gt = np.stack(
        [rng.uniform(-2, 2, P), rng.uniform(-1.5, 1.5, P), rng.uniform(3, 7, P)], 1
    ).astype(np.float32)
    T_gt = []
    for k in range(K):
        xi = np.zeros(6, np.float32)
        xi[0] = 0.15 * k  # translate along x
        xi[4] = 0.02 * k  # slight yaw
        T_gt.append(np.asarray(se3.exp_se3(jnp.asarray(xi))))
    T_gt = np.stack(T_gt)

    e_kf, e_pt, e_obs = [], [], []
    for k in range(K):
        X_c = np.asarray(se3.transform(jnp.asarray(T_gt[k]), jnp.asarray(X_gt)))
        uvr = np.array(camera.project_stereo(INTR, jnp.asarray(X_c)))
        uvr[:, :2] += rng.normal(size=(P, 2)) * obs_noise
        vis = (
            (X_c[:, 2] > 0.5)
            & (uvr[:, 0] > 0) & (uvr[:, 0] < 640)
            & (uvr[:, 1] > 0) & (uvr[:, 1] < 480)
        )
        ids = np.nonzero(vis)[0]
        e_kf += [k] * len(ids)
        e_pt += list(ids)
        e_obs += list(uvr[ids])
    e_kf = np.array(e_kf, np.int32)
    e_pt = np.array(e_pt, np.int32)
    e_obs = np.stack(e_obs).astype(np.float32)
    E = len(e_kf)
    n_out = int(E * outlier_frac)
    if n_out:
        sel = rng.choice(E, n_out, replace=False)
        e_obs[sel, :2] += rng.uniform(15, 60, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))

    # Perturb initial estimates (fixed KFs stay at GT).
    T_init = T_gt.copy()
    for k in range(2, K):
        xi = rng.normal(size=6).astype(np.float32) * pose_noise
        T_init[k] = np.asarray(se3.exp_se3(jnp.asarray(xi))) @ T_gt[k]
    X_init = X_gt + rng.normal(size=(P, 3)).astype(np.float32) * pt_noise

    prob = BAProblem(
        kf_T_cw=jnp.asarray(T_init),
        kf_free=jnp.asarray(np.arange(K) >= 2),
        pt_X=jnp.asarray(X_init),
        pt_valid=jnp.ones((P,), bool),
        e_kf=jnp.asarray(e_kf),
        e_pt=jnp.asarray(e_pt),
        e_obs=jnp.asarray(e_obs),
        e_stereo=jnp.ones((E,), bool),
        e_inv_sigma2=jnp.ones((E,)),
        e_valid=jnp.ones((E,), bool),
        **BAProblem.empty_line_edges(),
    )
    return prob, T_gt, X_gt, n_out


def pose_errors(T_est, T_gt):
    err = np.asarray(se3.log_se3(jnp.asarray(T_gt) @ se3.inv(jnp.asarray(T_est))))
    return np.abs(err)


def test_ba_converges_clean(rng):
    prob, T_gt, X_gt, _ = make_ba_problem(rng, obs_noise=0.0)
    res = local_bundle_adjustment(prob, INTR)
    perr = pose_errors(np.asarray(res.kf_T_cw), T_gt)
    assert perr.max() < 2e-3, perr.max()
    xerr = np.abs(np.asarray(res.pt_X) - X_gt)
    assert np.median(xerr) < 2e-3
    assert bool(np.asarray(res.e_inlier).all())


def test_ba_improves_noisy(rng):
    prob, T_gt, X_gt, _ = make_ba_problem(rng, pose_noise=0.05, pt_noise=0.05, obs_noise=0.5)
    perr0 = pose_errors(np.asarray(prob.kf_T_cw), T_gt)
    res = local_bundle_adjustment(prob, INTR)
    perr = pose_errors(np.asarray(res.kf_T_cw), T_gt)
    assert perr[2:, :3].max() < perr0[2:, :3].max() * 0.3
    assert perr[2:, :3].max() < 0.01  # within 1 cm


def test_ba_fixed_kfs_untouched(rng):
    prob, T_gt, _, _ = make_ba_problem(rng)
    res = local_bundle_adjustment(prob, INTR)
    np.testing.assert_allclose(np.asarray(res.kf_T_cw)[:2], T_gt[:2], atol=1e-7)


def test_ba_rejects_outliers(rng):
    prob, T_gt, X_gt, n_out = make_ba_problem(
        rng, pose_noise=0.03, pt_noise=0.03, obs_noise=0.3, outlier_frac=0.15
    )
    res = local_bundle_adjustment(prob, INTR)
    perr = pose_errors(np.asarray(res.kf_T_cw), T_gt)
    assert perr[2:, :3].max() < 0.015, perr
    inl = np.asarray(res.e_inlier)
    assert inl.mean() > 0.7  # most edges kept
    assert inl.mean() < 0.95  # outliers demoted


def test_ba_unobserved_points_stable(rng):
    prob, T_gt, X_gt, _ = make_ba_problem(rng, P=100)
    # Invalidate half the points' edges; those points must not move or NaN.
    e_pt = np.asarray(prob.e_pt)
    keep = e_pt < 50
    prob = prob._replace(e_valid=jnp.asarray(keep))
    res = local_bundle_adjustment(prob, INTR)
    assert np.isfinite(np.asarray(res.pt_X)).all()
    np.testing.assert_allclose(
        np.asarray(res.pt_X)[50:], np.asarray(prob.pt_X)[50:], atol=1e-6
    )


def test_ba_line_endpoint_edges(rng):
    """Line-endpoint landmarks with point-to-2D-line edges: BA should
    recover perturbed endpoints and poses using line constraints."""
    from hfvo_tpu.geometry import camera

    K, P_pts, n_lines = 4, 60, 30
    # Point scaffolding (anchors the gauge + scale).
    prob0, T_gt, X_gt, _ = make_ba_problem(rng, K=K, P=P_pts, pose_noise=0.02,
                                           pt_noise=0.02, obs_noise=0.2)
    # 3D lines: endpoints appended as landmarks after the points.
    L0 = np.stack([rng.uniform(-2, 2, n_lines), rng.uniform(-1.5, 1.5, n_lines),
                   rng.uniform(3.5, 6, n_lines)], 1).astype(np.float32)
    d = rng.normal(size=(n_lines, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    L1 = L0 + d * rng.uniform(0.5, 1.2, (n_lines, 1)).astype(np.float32)

    le_kf, le_lm, le_l2d = [], [], []
    for k in range(K):
        uv0 = np.array(camera.project(INTR, se3.transform(jnp.asarray(T_gt[k]), jnp.asarray(L0))))
        uv1 = np.array(camera.project(INTR, se3.transform(jnp.asarray(T_gt[k]), jnp.asarray(L1))))
        dd = uv1 - uv0
        n = np.stack([-dd[:, 1], dd[:, 0]], 1)
        n /= np.linalg.norm(n, axis=1, keepdims=True) + 1e-9
        c = -(n * uv0).sum(1)
        l2d = np.concatenate([n, c[:, None]], 1).astype(np.float32)
        for i in range(n_lines):
            le_kf += [k, k]
            le_lm += [P_pts + i, P_pts + n_lines + i]
            le_l2d += [l2d[i], l2d[i]]
    El = len(le_kf)

    lm_X = np.concatenate([
        np.asarray(prob0.pt_X)[:P_pts],
        L0 + rng.normal(size=(n_lines, 3)).astype(np.float32) * 0.03,
        L1 + rng.normal(size=(n_lines, 3)).astype(np.float32) * 0.03,
    ])
    P_total = P_pts + 2 * n_lines
    prob = prob0._replace(
        pt_X=jnp.asarray(lm_X),
        pt_valid=jnp.ones((P_total,), bool),
        le_kf=jnp.asarray(np.array(le_kf, np.int32)),
        le_lm=jnp.asarray(np.array(le_lm, np.int32)),
        le_line2d=jnp.asarray(np.stack(le_l2d)),
        le_inv_sigma2=jnp.ones((El,)),
        le_valid=jnp.ones((El,), bool),
    )
    res = local_bundle_adjustment(prob, INTR)
    # Endpoints should return to (near) the true 3D lines: perpendicular
    # distance of optimized endpoints to the GT infinite lines.
    X_opt = np.asarray(res.pt_X)
    E0 = X_opt[P_pts : P_pts + n_lines]
    rel = E0 - L0
    perp = rel - (rel * d).sum(1, keepdims=True) * d
    dist0 = np.linalg.norm(perp, axis=1)
    assert np.median(dist0) < 0.012, np.median(dist0)
    assert bool(np.asarray(res.le_inlier).mean() > 0.9)


def test_ba_line_axis_edges(rng):
    """Manhattan line-axis parallelism edges (paired 6-dof landmark blocks
    in the Schur solve): axis-aligned lines perturbed off-axis must come
    back more parallel than without the edges, without breaking poses."""
    K, P_pts, n_lines = 4, 80, 12
    prob0, T_gt, X_gt, _ = make_ba_problem(rng, K=K, P=P_pts, pose_noise=0.01,
                                           pt_noise=0.01, obs_noise=0.2)
    # GT lines exactly along the world x axis.
    axis = np.array([1.0, 0.0, 0.0], np.float32)
    L0 = np.stack([rng.uniform(-2, 0, n_lines), rng.uniform(-1.5, 1.5, n_lines),
                   rng.uniform(3.5, 6, n_lines)], 1).astype(np.float32)
    L1 = L0 + axis * rng.uniform(0.8, 1.5, (n_lines, 1)).astype(np.float32)

    from hfvo_tpu.geometry import camera as cam
    le_kf, le_lm, le_l2d = [], [], []
    for k in range(K):
        uv0 = np.array(cam.project(INTR, se3.transform(jnp.asarray(T_gt[k]), jnp.asarray(L0))))
        uv1 = np.array(cam.project(INTR, se3.transform(jnp.asarray(T_gt[k]), jnp.asarray(L1))))
        dd = uv1 - uv0
        n = np.stack([-dd[:, 1], dd[:, 0]], 1)
        n /= np.linalg.norm(n, axis=1, keepdims=True) + 1e-9
        c = -(n * uv0).sum(1)
        l2d = np.concatenate([n, c[:, None]], 1).astype(np.float32)
        for i in range(n_lines):
            le_kf += [k, k]
            le_lm += [P_pts + i, P_pts + n_lines + i]
            le_l2d += [l2d[i], l2d[i]]
    El = len(le_kf)

    # Perturb endpoints perpendicular to the axis (pure off-axis error the
    # 2D line observations barely see along their own direction).
    perturb = np.stack([np.zeros(n_lines), rng.uniform(-0.05, 0.05, n_lines),
                        rng.uniform(-0.05, 0.05, n_lines)], 1).astype(np.float32)
    lm_X = np.concatenate([
        np.asarray(prob0.pt_X)[:P_pts], L0 + perturb, L1 - perturb,
    ])
    P_total = P_pts + 2 * n_lines
    base = prob0._replace(
        pt_X=jnp.asarray(lm_X),
        pt_valid=jnp.ones((P_total,), bool),
        le_kf=jnp.asarray(np.array(le_kf, np.int32)),
        le_lm=jnp.asarray(np.array(le_lm, np.int32)),
        le_line2d=jnp.asarray(np.stack(le_l2d)),
        le_inv_sigma2=jnp.ones((El,)),
        le_valid=jnp.ones((El,), bool),
    )
    LPC = 16
    lp_s = np.zeros((LPC,), np.int32)
    lp_e = np.zeros((LPC,), np.int32)
    lp_axis = np.zeros((LPC, 3), np.float32)
    lp_w = np.zeros((LPC,), np.float32)
    lp_valid = np.zeros((LPC,), bool)
    lp_s[:n_lines] = P_pts + np.arange(n_lines)
    lp_e[:n_lines] = P_pts + n_lines + np.arange(n_lines)
    lp_axis[:n_lines] = axis
    lp_w[:n_lines] = 100.0
    lp_valid[:n_lines] = True
    with_ax = base._replace(
        lp_s=jnp.asarray(lp_s), lp_e=jnp.asarray(lp_e),
        lp_axis=jnp.asarray(lp_axis), lp_w=jnp.asarray(lp_w),
        lp_valid=jnp.asarray(lp_valid),
    )

    def dir_err(res):
        X = np.asarray(res.pt_X)
        dvec = X[P_pts + n_lines : P_pts + 2 * n_lines] - X[P_pts : P_pts + n_lines]
        dvec /= np.linalg.norm(dvec, axis=1, keepdims=True) + 1e-12
        return np.degrees(np.arccos(np.clip(np.abs(dvec @ axis), -1, 1)))

    res_no = local_bundle_adjustment(base, INTR)
    res_ax = local_bundle_adjustment(with_ax, INTR)
    e_no, e_ax = dir_err(res_no), dir_err(res_ax)
    assert np.median(e_ax) < 0.6 * np.median(e_no), (np.median(e_ax), np.median(e_no))
    # Poses must stay as good as the edge-free solve.
    p_no = pose_errors(np.asarray(res_no.kf_T_cw), T_gt)
    p_ax = pose_errors(np.asarray(res_ax.kf_T_cw), T_gt)
    assert p_ax[2:, :3].max() < max(p_no[2:, :3].max() * 1.5, 0.01)
    # Zero-weight pairs route through the paired 6x6 path; endpoint
    # directions are ill-determined in this setup (lines parallel to the
    # camera baseline), so only sanity is comparable, not the solution:
    # poses must stay good and nothing may go non-finite.
    zero_w = with_ax._replace(lp_w=jnp.zeros((LPC,)))
    res_zero = local_bundle_adjustment(zero_w, INTR)
    assert np.isfinite(np.asarray(res_zero.pt_X)).all()
    p_zero = pose_errors(np.asarray(res_zero.kf_T_cw), T_gt)
    assert p_zero[2:, :3].max() < max(p_no[2:, :3].max() * 1.5, 0.01)
    # With the edges active the directions must beat the zero-weight path
    # as well (not just the scalar path).
    assert np.median(e_ax) < 0.6 * np.median(dir_err(res_zero))


def test_ba_cross_line_par_perp_edges(rng):
    """Cross-line par/perp structural edges (reference: multi-frame par/perp
    edges, include/g2oMSC.h:332-559): mutually parallel lines perturbed
    off-direction must come back more parallel to EACH OTHER (and perp
    pairs more perpendicular) than without the edges."""
    from hfvo_tpu.geometry import camera as cam

    K, P_pts, n_lines = 4, 80, 10
    prob0, T_gt, X_gt, _ = make_ba_problem(rng, K=K, P=P_pts, pose_noise=0.01,
                                           pt_noise=0.01, obs_noise=0.2)
    # 6 lines along world x, 4 along world y.
    dirs_gt = np.zeros((n_lines, 3), np.float32)
    dirs_gt[:6, 0] = 1.0
    dirs_gt[6:, 1] = 1.0
    L0 = np.stack([rng.uniform(-2, 0, n_lines), rng.uniform(-1.5, 0.5, n_lines),
                   rng.uniform(3.5, 6, n_lines)], 1).astype(np.float32)
    L1 = L0 + dirs_gt * rng.uniform(0.8, 1.5, (n_lines, 1)).astype(np.float32)

    le_kf, le_lm, le_l2d = [], [], []
    for k in range(K):
        uv0 = np.array(cam.project(INTR, se3.transform(jnp.asarray(T_gt[k]), jnp.asarray(L0))))
        uv1 = np.array(cam.project(INTR, se3.transform(jnp.asarray(T_gt[k]), jnp.asarray(L1))))
        dd = uv1 - uv0
        n = np.stack([-dd[:, 1], dd[:, 0]], 1)
        n /= np.linalg.norm(n, axis=1, keepdims=True) + 1e-9
        c = -(n * uv0).sum(1)
        l2d = np.concatenate([n, c[:, None]], 1).astype(np.float32)
        for i in range(n_lines):
            le_kf += [k, k]
            le_lm += [P_pts + i, P_pts + n_lines + i]
            le_l2d += [l2d[i], l2d[i]]
    El = len(le_kf)

    perturb = rng.normal(size=(n_lines, 3)).astype(np.float32) * 0.04
    lm_X = np.concatenate([
        np.asarray(prob0.pt_X)[:P_pts], L0 + perturb, L1 - perturb,
    ])
    P_total = P_pts + 2 * n_lines
    base = prob0._replace(
        pt_X=jnp.asarray(lm_X),
        pt_valid=jnp.ones((P_total,), bool),
        le_kf=jnp.asarray(np.array(le_kf, np.int32)),
        le_lm=jnp.asarray(np.array(le_lm, np.int32)),
        le_line2d=jnp.asarray(np.stack(le_l2d)),
        le_inv_sigma2=jnp.ones((El,)),
        le_valid=jnp.ones((El,), bool),
    )
    # Par pairs among the x lines + perp pairs x-vs-y.
    pi, pj, kind = [], [], []
    for i in range(6):
        for j in range(i + 1, 6):
            pi.append(i); pj.append(j); kind.append(0)
    for i in range(6):
        for j in range(6, n_lines):
            pi.append(i); pj.append(j); kind.append(1)
    LQ = 64
    nq = len(pi)
    ll = dict(
        ll_sa=np.zeros((LQ,), np.int32), ll_ea=np.zeros((LQ,), np.int32),
        ll_sb=np.zeros((LQ,), np.int32), ll_eb=np.zeros((LQ,), np.int32),
        ll_kind=np.zeros((LQ,), np.int32), ll_w=np.zeros((LQ,), np.float32),
        ll_valid=np.zeros((LQ,), bool),
    )
    ll["ll_sa"][:nq] = P_pts + np.array(pi)
    ll["ll_ea"][:nq] = P_pts + n_lines + np.array(pi)
    ll["ll_sb"][:nq] = P_pts + np.array(pj)
    ll["ll_eb"][:nq] = P_pts + n_lines + np.array(pj)
    ll["ll_kind"][:nq] = kind
    ll["ll_w"][:nq] = 50.0
    ll["ll_valid"][:nq] = True
    with_ll = base._replace(**{k: jnp.asarray(v) for k, v in ll.items()})

    def par_err(res):
        X = np.asarray(res.pt_X)
        d = X[P_pts + n_lines : P_pts + 2 * n_lines] - X[P_pts : P_pts + n_lines]
        d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-9
        errs = []
        for i, j, kd in zip(pi, pj, kind):
            c = abs(float(d[i] @ d[j]))
            errs.append(1.0 - c if kd == 0 else c)
        return float(np.mean(errs))

    res_plain = local_bundle_adjustment(base, INTR)
    res_ll = local_bundle_adjustment(with_ll, INTR)
    e_plain, e_ll = par_err(res_plain), par_err(res_ll)
    assert e_ll < 0.6 * e_plain, (e_plain, e_ll)
    # Poses must not degrade.
    def pose_err(res):
        T = np.asarray(res.kf_T_cw)[:K]
        return max(
            float(np.abs(np.asarray(se3.log_se3(
                jnp.asarray(T_gt[k].astype(np.float32)) @ se3.inv(jnp.asarray(T[k]))
            ))).max()) for k in range(2, K)
        )
    assert pose_err(res_ll) < 0.02, pose_err(res_ll)
