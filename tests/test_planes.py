import jax.numpy as jnp
import numpy as np

from hfvo_tpu.config import tum3_config
from hfvo_tpu.geometry import se3
from hfvo_tpu.ops import planes
from hfvo_tpu.testing import synthetic

INTR = tum3_config().camera


def test_single_wall_plane():
    depth = np.full((480, 640), 3.0, np.float32)
    seg = planes.segment_planes(jnp.asarray(depth), INTR)
    v = np.asarray(seg.valid)
    assert v.sum() == 1, f"{v.sum()} planes on a single wall"
    pl = np.asarray(seg.planes)[0]
    # Fronto-parallel wall at z=3: normal (0,0,-1) (towards camera), d=3.
    assert abs(abs(pl[2]) - 1.0) < 1e-3
    np.testing.assert_allclose(abs(pl[3]), 3.0, atol=0.01)
    # Supports nearly the whole image.
    assert float(np.asarray(seg.counts)[0]) > 0.9 * 480 * 640


def test_two_walls():
    # Left half near wall, right half far wall (depth step).
    depth = np.full((480, 640), 2.0, np.float32)
    depth[:, 320:] = 4.0
    seg = planes.segment_planes(jnp.asarray(depth), INTR)
    v = np.asarray(seg.valid)
    assert v.sum() == 2
    ds = sorted(np.abs(np.asarray(seg.planes)[v][:, 3]))
    np.testing.assert_allclose(ds, [2.0, 4.0], atol=0.02)


def test_noisy_plane_and_min_support(rng):
    depth = (2.5 + rng.normal(size=(480, 640)) * 0.004).astype(np.float32)
    seg = planes.segment_planes(jnp.asarray(depth), INTR)
    v = np.asarray(seg.valid)
    assert v.sum() >= 1
    pl = np.asarray(seg.planes)[0]
    np.testing.assert_allclose(abs(pl[3]), 2.5, atol=0.02)


def test_no_planes_without_depth():
    depth = np.zeros((480, 640), np.float32)
    seg = planes.segment_planes(jnp.asarray(depth), INTR)
    assert int(np.asarray(seg.valid).sum()) == 0


def test_room_planes_match_walls():
    """Rendered room: detected planes must coincide with true wall planes."""
    T_wc, grays, depths = synthetic.render_sequence(n=1, seed=0)
    seg = planes.segment_planes(jnp.asarray(depths[0]), INTR)
    v = np.asarray(seg.valid)
    assert v.sum() >= 1
    P = np.asarray(seg.planes)[v]
    R = T_wc[0][:3, :3]
    t = T_wc[0][:3, 3]
    for n_c, d_c in zip(P[:, :3], P[:, 3]):
        n_w = R @ n_c
        d_w = d_c - t @ n_w
        # Wall planes have axis-aligned world normals and |d| in {3, 2, 3}.
        ax = np.argmax(np.abs(n_w))
        assert np.abs(n_w)[ax] > 0.99, n_w
        expect = {0: 3.0, 1: 2.0, 2: 3.0}[ax]
        np.testing.assert_allclose(abs(d_w), expect, atol=0.05)


def test_normals_on_wall():
    depth = np.full((480, 640), 3.0, np.float32)
    n, ok = planes.compute_normals(jnp.asarray(depth), INTR)
    n, ok = np.asarray(n), np.asarray(ok)
    assert ok.mean() > 0.8
    # Normal towards camera: (0, 0, -1).
    nz = n[ok][:, 2]
    assert (np.abs(nz + 1) < 1e-2).mean() > 0.95


def test_normals_in_room():
    T_wc, grays, depths = synthetic.render_sequence(n=1, seed=0)
    n, ok = planes.compute_normals(jnp.asarray(depths[0]), INTR)
    n, ok = np.asarray(n), np.asarray(ok)
    R = T_wc[0][:3, :3]
    n_w = n[ok] @ R.T
    # In the axis-aligned room nearly all normals align with a world axis.
    ax_align = np.max(np.abs(n_w), axis=1)
    assert (ax_align > 0.95).mean() > 0.85
