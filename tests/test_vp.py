import jax.numpy as jnp
import numpy as np

from hfvo_tpu.config import tum3_config
from hfvo_tpu.geometry import camera, se3
from hfvo_tpu.ops import lines, vp
from hfvo_tpu.testing import synthetic

INTR = tum3_config().camera


def project_segments(T_cw, X0, X1):
    q0 = np.array(camera.project(INTR, se3.transform(jnp.asarray(T_cw), jnp.asarray(X0))))
    q1 = np.array(camera.project(INTR, se3.transform(jnp.asarray(T_cw), jnp.asarray(X1))))
    return q0.astype(np.float32), q1.astype(np.float32)


def test_vp_from_synthetic_axis_lines(rng):
    """3D lines along world x/y axes: their VPs must equal the rotated axis
    directions."""
    T_cw = np.asarray(se3.exp_se3(jnp.asarray(np.array([0.1, 0, 0, 0.1, 0.2, 0.05], np.float32))))
    X0, X1 = [], []
    for axis in (np.array([1.0, 0, 0]), np.array([0, 1.0, 0])):
        for _ in range(12):
            base = np.array([rng.uniform(-1.5, 1.5), rng.uniform(-1, 1), rng.uniform(3, 6)])
            X0.append(base)
            X1.append(base + axis * rng.uniform(0.5, 1.5))
    X0 = np.array(X0, np.float32)
    X1 = np.array(X1, np.float32)
    p0, p1 = project_segments(T_cw, X0, X1)
    res = vp.estimate_vps(INTR, jnp.asarray(p0), jnp.asarray(p1), jnp.ones((len(p0),), bool))
    assert bool(res.ok)
    vps = np.asarray(res.vps)
    # Expected VP directions: R_cw @ axis.
    R = T_cw[:3, :3]
    for axis in (np.array([1.0, 0, 0]), np.array([0, 1.0, 0])):
        d = R @ axis
        align = np.abs(vps @ d).max()
        assert align > 0.999, (axis, align)
    # Lines assigned consistently: first 12 share one VP, next 12 another.
    lv = np.asarray(res.line_vp)
    assert (lv[:12] == lv[0]).mean() > 0.8 and lv[0] >= 0
    assert (lv[12:] == lv[12]).mean() > 0.8 and lv[12] >= 0
    assert lv[0] != lv[12]


def test_vp_on_room_stripes():
    """Detected stripe lines in the rendered room produce VPs aligned with
    the world axes."""
    T_wc, grays, depths = synthetic.render_sequence(n=1, seed=0)
    lf = lines.detect_lines(jnp.asarray(grays[0]))
    res = vp.estimate_vps(INTR, lf.p0, lf.p1, lf.valid)
    assert bool(res.ok)
    vps = np.asarray(res.vps)
    R_cw = np.linalg.inv(T_wc[0])[:3, :3]
    # At least two VPs align with world axes (the stripes run along axes).
    aligned = 0
    for a in np.eye(3):
        if np.abs(vps @ (R_cw @ a)).max() > 0.995:
            aligned += 1
    assert aligned >= 2, vps


def test_vp_unstructured_declines(rng):
    p0 = rng.uniform([0, 0], [640, 480], size=(40, 2)).astype(np.float32)
    ang = rng.uniform(0, np.pi, 40)
    d = np.stack([np.cos(ang), np.sin(ang)], 1).astype(np.float32) * 60
    res = vp.estimate_vps(INTR, jnp.asarray(p0), jnp.asarray(p0 + d), jnp.ones((40,), bool))
    # Random lines: weak consensus; most lines unassigned.
    lv = np.asarray(res.line_vp)
    assert (lv >= 0).mean() < 0.5
