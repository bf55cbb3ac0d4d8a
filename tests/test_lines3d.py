import jax.numpy as jnp
import numpy as np

from hfvo_tpu.config import tum3_config
from hfvo_tpu.geometry import camera, se3
from hfvo_tpu.ops import lines, lines3d
from hfvo_tpu.testing import synthetic

INTR = tum3_config().camera


def test_fit_plane_wall_line():
    """A synthetic vertical wall at z=3: a 2D segment there must fit a 3D
    line on the wall with correct endpoints."""
    depth = np.full((480, 640), 3.0, np.float32)
    p0 = jnp.asarray(np.array([[100.0, 100.0]], np.float32))
    p1 = jnp.asarray(np.array([[500.0, 100.0]], np.float32))
    res = lines3d.fit_lines_3d(jnp.asarray(depth), INTR, p0, p1, jnp.ones((1,), bool))
    assert bool(res.valid[0])
    X0, X1 = np.asarray(res.X0_c)[0], np.asarray(res.X1_c)[0]
    assert abs(X0[2] - 3.0) < 1e-3 and abs(X1[2] - 3.0) < 1e-3
    # Reprojection of endpoints lands back on the 2D segment line (y=100).
    uv0 = np.asarray(camera.project(INTR, jnp.asarray(X0)))
    uv1 = np.asarray(camera.project(INTR, jnp.asarray(X1)))
    assert abs(uv0[1] - 100) < 1.5 and abs(uv1[1] - 100) < 1.5
    # Endpoints span approximately the sampled extent.
    assert min(uv0[0], uv1[0]) < 130 and max(uv0[0], uv1[0]) > 470


def test_fit_rejects_depth_discontinuity(rng):
    """Samples split across two walls (jump in depth) -> RANSAC keeps the
    dominant side or (if balanced) the fit fails the support ratio."""
    depth = np.full((480, 640), 2.0, np.float32)
    depth[:, 320:] = 5.0  # sharp depth edge at u=320
    # Segment with 70% on the near wall.
    p0 = jnp.asarray(np.array([[100.0, 200.0]], np.float32))
    p1 = jnp.asarray(np.array([[420.0, 200.0]], np.float32))
    res = lines3d.fit_lines_3d(jnp.asarray(depth), INTR, p0, p1, jnp.ones((1,), bool))
    assert bool(res.valid[0])
    X0, X1 = np.asarray(res.X0_c)[0], np.asarray(res.X1_c)[0]
    assert abs(X0[2] - 2.0) < 0.02 and abs(X1[2] - 2.0) < 0.02  # near side only


def test_fit_no_depth_invalid():
    depth = np.zeros((480, 640), np.float32)
    p0 = jnp.asarray(np.array([[100.0, 100.0]], np.float32))
    p1 = jnp.asarray(np.array([[500.0, 100.0]], np.float32))
    res = lines3d.fit_lines_3d(jnp.asarray(depth), INTR, p0, p1, jnp.ones((1,), bool))
    assert not bool(res.valid[0])


def test_room_stripes_produce_3d_lines_on_walls():
    """End to end: detect lines in the rendered room, fit 3D, and verify the
    3D endpoints lie on the room walls (exact scene geometry)."""
    T_wc, grays, depths = synthetic.render_sequence(n=1, seed=0)
    lf = lines.detect_lines(jnp.asarray(grays[0]))
    res = lines3d.fit_lines_3d(
        jnp.asarray(depths[0]), INTR, lf.p0, lf.p1, lf.valid
    )
    v = np.asarray(res.valid)
    assert v.sum() >= 8, f"only {v.sum()} 3D lines"
    X0 = np.asarray(res.X0_c)[v]
    X1 = np.asarray(res.X1_c)[v]
    Xw0 = np.asarray(se3.transform(jnp.asarray(T_wc[0]), jnp.asarray(X0)))
    Xw1 = np.asarray(se3.transform(jnp.asarray(T_wc[0]), jnp.asarray(X1)))

    def on_wall(X):
        return (
            (np.abs(np.abs(X[:, 0]) - 3.0) < 0.05)
            | (np.abs(np.abs(X[:, 1]) - 2.0) < 0.05)
            | (np.abs(np.abs(X[:, 2]) - 3.0) < 0.05)
        )

    assert on_wall(Xw0).mean() > 0.9
    assert on_wall(Xw1).mean() > 0.9
