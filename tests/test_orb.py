import jax.numpy as jnp
import numpy as np
import pytest

from hfvo_tpu.config import OrbConfig
from hfvo_tpu.ops import fast as fast_ops
from hfvo_tpu.ops import hamming, orb
from hfvo_tpu.ops.image import build_pyramid, gaussian_blur


def squares_image(h=240, w=320, sq=16, step=48, lo=40.0, hi=220.0):
    """Isolated bright squares on dark background; square corners are
    genuine FAST-9 corners (checkerboard X-junctions are not)."""
    img = np.full((h, w), lo, np.float32)
    corners = []
    for y0 in range(step // 2, h - sq, step):
        for x0 in range(step // 2, w - sq, step):
            img[y0 : y0 + sq, x0 : x0 + sq] = hi
            corners += [(y0, x0), (y0, x0 + sq - 1), (y0 + sq - 1, x0), (y0 + sq - 1, x0 + sq - 1)]
    return img, np.array(corners)


def textured_image(rng, h=240, w=320):
    """Smooth random texture with strong local structure."""
    base = rng.uniform(0, 255, size=(h // 8, w // 8)).astype(np.float32)
    import jax

    img = jax.image.resize(jnp.asarray(base), (h, w), "cubic")
    return np.asarray(img)


def test_fast_detects_square_corners():
    img, corners = squares_image()
    score = np.asarray(fast_ops.fast_score(jnp.asarray(img), 20.0))
    ys, xs = np.nonzero(score)
    assert len(ys) > 20  # plenty of corner responses
    # Every response should be near (within 3px of) a true square corner.
    pts = np.stack([ys, xs], 1)
    d = np.abs(pts[:, None, :] - corners[None, :, :]).max(-1).min(axis=1)
    assert np.percentile(d, 95) <= 3
    # And most true corners should produce a response.
    d2 = np.abs(corners[:, None, :] - pts[None, :, :]).max(-1).min(axis=1)
    assert (d2 <= 2).mean() > 0.9


def test_fast_flat_image_no_corners():
    img = np.full((120, 160), 128.0, np.float32)
    score = np.asarray(fast_ops.fast_score(jnp.asarray(img), 20.0))
    assert (score == 0).all()


def test_fast_agrees_with_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = textured_image(rng)
    ours = np.asarray(fast_ops.fast_nms(fast_ops.fast_score(jnp.asarray(img), 20.0)))
    kps = cv2.FastFeatureDetector_create(threshold=20).detect(
        img.astype(np.uint8), None
    )
    cv_pts = np.array([k.pt for k in kps]) if kps else np.zeros((0, 2))
    ys, xs = np.nonzero(ours)
    assert len(ys) > 0 and len(cv_pts) > 0
    # Most of our corners lie within 2px of a cv2 corner.
    d = np.abs(cv_pts[None, :, :] - np.stack([xs, ys], 1)[:, None, :]).max(-1)
    frac_near = (d.min(axis=1) <= 2).mean()
    assert frac_near > 0.7


def test_detect_grid_topk_budget_and_validity(rng):
    img = textured_image(rng)
    yx, resp, valid = fast_ops.detect_grid_topk(jnp.asarray(img), 20.0, 7.0, 16, 200, 19)
    yx, resp, valid = map(np.asarray, (yx, resp, valid))
    assert yx.shape == (200, 2)
    n_valid = valid.sum()
    assert n_valid > 50
    # All valid keypoints respect the border margin.
    assert (yx[valid, 0] >= 19).all() and (yx[valid, 0] < 240 - 19).all()
    assert (yx[valid, 1] >= 19).all() and (yx[valid, 1] < 320 - 19).all()
    # No duplicate coordinates among valid.
    flat = yx[valid, 0] * 1000 + yx[valid, 1]
    assert len(np.unique(flat)) == n_valid


def test_ic_angle_rotation_equivariance():
    # A patch with a bright blob offset in +x: angle ~ 0. Rotate 90deg: ~pi/2.
    img = np.zeros((64, 64), np.float32)
    img[30:35, 40:45] = 255.0  # blob right of center (32, 32)
    ang0 = float(orb.ic_angles(jnp.asarray(img), jnp.array([[32, 32]]))[0])
    assert abs(ang0) < 0.25
    img_rot = np.rot90(img, k=-1).copy()  # +90deg: blob moves below center
    ang90 = float(orb.ic_angles(jnp.asarray(img_rot), jnp.array([[32, 32]]))[0])
    assert abs(ang90 - np.pi / 2) < 0.25


def test_brief_descriptor_determinism_and_variation(rng):
    img = textured_image(rng)
    blur = gaussian_blur(jnp.asarray(img))
    yx = jnp.array([[50, 50], [50, 50], [100, 200]], dtype=jnp.int32)
    ang = jnp.array([0.3, 0.3, 1.0])
    d = orb.brief_descriptors(blur, yx, ang)
    d = np.asarray(d)
    assert d.shape == (3, 8) and d.dtype == np.uint32
    assert (d[0] == d[1]).all()  # deterministic
    assert (d[0] != d[2]).any()  # different patch -> different descriptor


def test_extract_orb_shapes_and_rotation_matching(rng):
    cfg = OrbConfig(n_features=300, n_levels=4)
    img = textured_image(rng)
    feats = orb.extract_orb(jnp.asarray(img), cfg, 512)
    assert feats.uv.shape == (512, 2)
    n_valid = int(np.asarray(feats.valid).sum())
    assert n_valid > 150
    # Rotate image 90deg; descriptors should still match (steered BRIEF).
    img_r = np.rot90(img, k=-1).copy()
    feats_r = orb.extract_orb(jnp.asarray(img_r), cfg, 512)
    dist = np.asarray(hamming.hamming_matrix(feats.desc, feats_r.desc))
    mask = np.asarray(feats.valid)[:, None] & np.asarray(feats_r.valid)[None, :]
    # Ground-truth correspondence: (x, y) -> (h - 1 - y, x) for k=-1 rot90.
    h = img.shape[0]
    uv = np.asarray(feats.uv)
    uv_r = np.asarray(feats_r.uv)
    gt_uv = np.stack([h - 1 - uv[:, 1], uv[:, 0]], axis=1)
    # For each valid kp with a spatial counterpart, check descriptor NN is it.
    good, total = 0, 0
    d = np.where(mask, dist, 999)
    for i in np.nonzero(np.asarray(feats.valid))[0]:
        sp = np.abs(uv_r - gt_uv[i]).max(axis=1)
        cand = np.nonzero((sp < 3) & np.asarray(feats_r.valid))[0]
        if len(cand) == 0:
            continue
        total += 1
        nn = d[i].argmin()
        if np.abs(uv_r[nn] - gt_uv[i]).max() < 4:
            good += 1
    assert total > 30
    assert good / total > 0.6, f"rotation matching rate {good}/{total}"


def test_hamming_matrix_matches_pairwise(rng):
    a = rng.integers(0, 2**32, size=(16, 8), dtype=np.uint32)
    b = rng.integers(0, 2**32, size=(24, 8), dtype=np.uint32)
    D = np.asarray(hamming.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    # Reference popcount.
    bits_a = np.unpackbits(a.view(np.uint8), axis=1)
    bits_b = np.unpackbits(b.view(np.uint8), axis=1)
    D_ref = (bits_a[:, None, :] != bits_b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(D, D_ref)
    # identity
    Daa = np.asarray(hamming.hamming_matrix(jnp.asarray(a), jnp.asarray(a)))
    assert (np.diag(Daa) == 0).all()


def test_rotation_consistency_mask(rng):
    n = 100
    ang_a = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    # 80 matches share a consistent rotation of 0.5 rad; 20 are random.
    ang_b = ang_a - 0.5
    ang_b[80:] = rng.uniform(0, 2 * np.pi, 20)
    ok = np.ones(n, bool)
    kept = np.asarray(
        hamming.rotation_consistency_mask(
            jnp.asarray(ang_a), jnp.asarray(ang_b), jnp.asarray(ok)
        )
    )
    assert kept[:80].all()
    assert kept[80:].sum() < 10


def test_pyramid_shapes():
    img = jnp.zeros((480, 640), jnp.float32)
    pyr = build_pyramid(img, 8, 1.2)
    assert len(pyr) == 8
    assert pyr[0].shape == (480, 640)
    assert pyr[1].shape == (400, 533)
    assert all(p.ndim == 2 for p in pyr)
