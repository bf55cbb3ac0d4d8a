"""Quantifying the two biggest documented deviations from the reference
(VERDICT r3 #8; design notes in PARITY.md):

(a) Keypoint budgeting — per-cell top-k (`ops/fast.py::detect_grid_topk`)
    vs the reference's quadtree `DistributeOctTree`
    (src/ORBextractor.cc:537). A faithful numpy quadtree is implemented
    here (test-only) and both policies select the SAME budget on cluttered
    rendered frames; spatial coverage and nearest-neighbor dispersion of
    the two selections are compared directly. Tracking-ATE stability on
    the same cluttered scene is covered by test_adversarial.py's golden
    gates (slanted quads + spheres, ATE < 3 cm).

(b) Line detection — tiled gradient-weighted Hough + PCA endpoint refit
    (`ops/lines.py::detect_lines`) vs LSD region growing
    (Thirdparty/line_descriptor/src/binary_descriptor_custom.cpp). The
    synthetic room gives EXACT ground-truth 3D stripe-border segments;
    recall of the visible GT segments on low-texture renders (the
    reference's headline regime, where lines must carry tracking) is
    measured and gated.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from hfvo_tpu.config import tum3_config
from hfvo_tpu.ops import fast as fast_ops
from hfvo_tpu.ops import lines as line_ops
from hfvo_tpu.testing import synthetic


# ---------------------------------------------------------------------------
# (a) quadtree vs per-cell top-k
# ---------------------------------------------------------------------------


def _distribute_octtree(yx: np.ndarray, resp: np.ndarray, h: int, w: int,
                        n_target: int) -> np.ndarray:
    """Reference DistributeOctTree semantics (src/ORBextractor.cc:537-729)
    in numpy: start from aspect-ratio initial nodes, repeatedly 4-split the
    most-populated splittable nodes until the node count reaches the budget
    (nodes with one key stop splitting), then keep the highest-response
    keypoint per node. Returns indices into yx."""
    n_ini = max(1, round(w / h))
    nodes = []  # (y0, y1, x0, x1, member-indices)
    hx = w / n_ini
    for i in range(n_ini):
        sel = (yx[:, 1] >= i * hx) & (yx[:, 1] < (i + 1) * hx)
        idx = np.nonzero(sel)[0]
        if len(idx):
            nodes.append((0.0, float(h), i * hx, (i + 1) * hx, idx))
    guard = 0
    while len(nodes) < n_target and guard < 50 * n_target:
        guard += 1
        # Split the most-populated node (the reference expands largest
        # first via vSizeAndPointerToNode sorting, ORBextractor.cc:648).
        sizes = [len(n[4]) for n in nodes]
        j = int(np.argmax(sizes))
        if sizes[j] <= 1:
            break  # nothing splittable remains
        y0, y1, x0, x1, idx = nodes.pop(j)
        ym, xm = (y0 + y1) / 2, (x0 + x1) / 2
        pts = yx[idx]
        for (ya, yb, xa, xb) in ((y0, ym, x0, xm), (y0, ym, xm, x1),
                                 (ym, y1, x0, xm), (ym, y1, xm, x1)):
            # children keep the (y0, y1, x0, x1) bound order
            sel = (
                (pts[:, 0] >= ya) & (pts[:, 0] < yb)
                & (pts[:, 1] >= xa) & (pts[:, 1] < xb)
            )
            if sel.any():
                nodes.append((ya, yb, xa, xb, idx[sel]))
    keep = [int(idx[np.argmax(resp[idx])]) for *_, idx in nodes]
    return np.asarray(sorted(keep[:n_target]))


def _coverage_and_nn(pts: np.ndarray, h: int, w: int, cell: int = 40):
    """(occupied-cell fraction over a cell-px grid, mean NN distance)."""
    occ = {(int(y // cell), int(x // cell)) for y, x in pts}
    n_cells = -(-h // cell) * (-(-w // cell))
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1).astype(np.float64)
    np.fill_diagonal(d2, np.inf)
    return len(occ) / n_cells, float(np.sqrt(d2.min(axis=1)).mean())


@pytest.fixture(scope="module")
def cluttered_frame():
    scene = synthetic.make_adversarial_room(seed=3, n_slanted=2, n_spheres=3)
    cfg = tum3_config()
    T_wc = synthetic.orbit_trajectory(1)[0]
    g, _ = synthetic.render_jit(scene, cfg.camera, jnp.asarray(T_wc))
    return np.asarray(g), cfg


def test_topk_spatial_distribution_matches_quadtree(cluttered_frame):
    """Same candidates, same budget: the per-cell top-k selection must
    cover the frame (occupied 40-px cells) and disperse (mean NN distance)
    at least ~as well as the reference's quadtree."""
    gray, cfg = cluttered_frame
    img = jnp.asarray(gray, jnp.float32)
    h, w = gray.shape
    border = cfg.orb.edge_threshold

    # Shipped policy.
    yx_k, resp_k, valid_k = fast_ops.detect_grid_topk(
        img, cfg.orb.ini_th_fast, cfg.orb.min_th_fast, cfg.orb.grid_cell,
        cfg.orb.n_features, border,
    )
    sel_topk = np.asarray(yx_k)[np.asarray(valid_k)]
    n_budget = len(sel_topk)
    assert n_budget >= 200, "cluttered frame should give a meaningful budget"

    # Reference policy on the same candidate field: dual-threshold scored +
    # NMS'd corners (what the reference feeds DistributeOctTree after its
    # per-cell FAST retry, ORBextractor.cc:770-860).
    s_low = fast_ops.fast_score(img, cfg.orb.min_th_fast)
    s_high = fast_ops.fast_score(img, cfg.orb.ini_th_fast)
    score = np.array(fast_ops.fast_nms(jnp.where(s_high > 0, s_high + 1e4, s_low)))
    score[:border], score[-border:] = 0, 0
    score[:, :border], score[:, -border:] = 0, 0
    cand = np.argwhere(score > 0)
    keep = _distribute_octtree(cand, score[cand[:, 0], cand[:, 1]], h, w, n_budget)
    sel_quad = cand[keep]

    cov_k, nn_k = _coverage_and_nn(sel_topk, h, w)
    cov_q, nn_q = _coverage_and_nn(sel_quad, h, w)
    # The grid policy's whole purpose is spatial uniformity; it must not be
    # meaningfully WORSE than the quadtree at its own goal.
    assert cov_k >= 0.85 * cov_q, (cov_k, cov_q)
    assert nn_k >= 0.75 * nn_q, (nn_k, nn_q)


# ---------------------------------------------------------------------------
# (b) tiled-Hough recall vs ground-truth segments
# ---------------------------------------------------------------------------


def _gt_world_segments(scene) -> list:
    """Exact 3D stripe-border segments of the room's six faces: textures
    paint stripes at value 20.0 along full texture rows/cols
    (synthetic.make_room_textures); each stripe boundary is a world-space
    segment on the face plane."""
    texs = np.asarray(scene.textures)
    segs = []
    for fid, (axis, sign) in enumerate(synthetic._FACES):
        ext = sign * synthetic._EXTENT[fid]
        ua, va = synthetic._UVAXES[fid]
        su, sv = synthetic._UVSPAN[fid]
        t = texs[fid]
        for const_axis_is_v, mask, span_const, span_free, free_ax, const_ax in (
            (True, (t == 20.0).all(axis=1), sv, su, ua, va),   # texture rows
            (False, (t == 20.0).all(axis=0), su, sv, va, ua),  # texture cols
        ):
            d = np.diff(mask.astype(np.int8))
            edges = np.concatenate(
                [np.nonzero(d == 1)[0] + 0.5, np.nonzero(d == -1)[0] + 0.5]
            )
            for e in edges:
                c = e / (synthetic.TEX - 1) * 2 * span_const - span_const
                p0 = np.zeros(3)
                p1 = np.zeros(3)
                p0[axis] = p1[axis] = ext
                p0[const_ax] = p1[const_ax] = c
                p0[free_ax], p1[free_ax] = -span_free, span_free
                segs.append((p0, p1))
    return segs


def _visible_gt_2d(segs, T_wc, intr, depth, min_px: float = 60.0):
    """Project GT segments, keep the longest contiguous run of samples that
    are in-frame AND the nearest surface (checked against rendered depth).
    Returns a list of (S, 2) pixel-sample arrays, one per visible segment."""
    T_cw = np.linalg.inv(np.asarray(T_wc, np.float64))
    Rr, tt = T_cw[:3, :3], T_cw[:3, 3]
    h, w = depth.shape
    out = []
    for p0, p1 in segs:
        s = np.linspace(0.0, 1.0, 161)
        Pw = p0[None] + s[:, None] * (p1 - p0)[None]
        Pc = Pw @ Rr.T + tt
        z = Pc[:, 2]
        ok = z > 0.05
        u = np.where(ok, intr.fx * Pc[:, 0] / np.where(ok, z, 1) + intr.cx, -1)
        v = np.where(ok, intr.fy * Pc[:, 1] / np.where(ok, z, 1) + intr.cy, -1)
        m = 6
        ok &= (u >= m) & (u < w - m) & (v >= m) & (v < h - m)
        ui = np.clip(np.round(u).astype(int), 0, w - 1)
        vi = np.clip(np.round(v).astype(int), 0, h - 1)
        ok &= np.abs(depth[vi, ui] - z) < 0.01 * z + 0.02  # nearest hit
        # Longest visible run.
        best, cur = (0, 0), None
        for i, o in enumerate(ok):
            if o and cur is None:
                cur = i
            if (not o or i == len(ok) - 1) and cur is not None:
                end = i + 1 if o else i
                if end - cur > best[1] - best[0]:
                    best = (cur, end)
                cur = None
        a, b = best
        if b - a < 3:
            continue
        pts = np.stack([u[a:b], v[a:b]], axis=1)
        if np.linalg.norm(pts[-1] - pts[0]) >= min_px:
            out.append(pts)
    return out


def _recall(gt_pts_list, lf, max_perp=3.0, max_ang=np.deg2rad(5), min_ov=0.5):
    valid = np.asarray(lf.valid)
    p0 = np.asarray(lf.p0)[valid]
    p1 = np.asarray(lf.p1)[valid]
    coef = np.asarray(lf.line2d)[valid]
    det_d = p1 - p0
    det_ang = np.arctan2(det_d[:, 1], det_d[:, 0]) % np.pi
    hits = 0
    for pts in gt_pts_list:
        g = pts[-1] - pts[0]
        g_len = np.linalg.norm(g)
        g_dir = g / g_len
        g_ang = np.arctan2(g[1], g[0]) % np.pi
        d_ang = np.abs(det_ang - g_ang)
        d_ang = np.minimum(d_ang, np.pi - d_ang)
        perp = np.abs(coef[:, :2] @ pts.T + coef[:, 2:3]).mean(axis=1)
        # Overlap of the detected segment's projection onto the GT extent.
        t0 = (p0 - pts[0]) @ g_dir / g_len
        t1 = (p1 - pts[0]) @ g_dir / g_len
        lo, hi = np.minimum(t0, t1), np.maximum(t0, t1)
        ov = np.minimum(hi, 1.0) - np.maximum(lo, 0.0)
        if ((d_ang < max_ang) & (perp < max_perp) & (ov > min_ov)).any():
            hits += 1
    return hits / max(len(gt_pts_list), 1)


def test_hough_recall_on_low_texture_gt_segments():
    """On the low-texture room (only structural stripes; the regime the
    reference's line pipeline exists for) the tiled-Hough detector must
    recall the large majority of visible GT stripe borders across several
    viewpoints."""
    cfg = tum3_config()
    scene = synthetic.make_room(0, low_texture=True)
    segs = _gt_world_segments(scene)
    assert len(segs) >= 48, "expect ~2 borders per stripe, ~6 stripes per face"
    T_wc = synthetic.orbit_trajectory(12)
    recalls = []
    for i in range(0, 12, 3):
        g, d = synthetic.render_jit(scene, cfg.camera, jnp.asarray(T_wc[i]))
        g, d = np.asarray(g), np.asarray(d)
        gt2d = _visible_gt_2d(segs, T_wc[i], cfg.camera, d)
        if len(gt2d) < 4:
            continue
        lf = line_ops.detect_lines(jnp.asarray(g, jnp.float32))
        recalls.append(_recall(gt2d, lf))
    assert len(recalls) >= 3
    mean_recall = float(np.mean(recalls))
    # Gate: the detector must find >=75% of long visible GT borders on
    # average and never collapse below 60% on a single view.
    assert mean_recall >= 0.75, (mean_recall, recalls)
    assert min(recalls) >= 0.60, recalls
