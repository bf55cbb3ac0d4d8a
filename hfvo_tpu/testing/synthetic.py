"""Synthetic textured-room RGB-D renderer with exact ground truth.

The reference validates only end-to-end on TUM/ICL sequences (SURVEY.md §4);
no dataset ships with this environment, so this module provides the
equivalent substrate: a box room with procedural textures (smooth noise +
high-contrast blobs + dark stripes), ray-cast per pixel under any camera
pose. Output gray/depth images have exact GT depth, GT trajectory, GT planes
(the 6 faces) and GT 3D lines (the stripe borders), which the unit and
integration tests and the benchmark all build on.

Rendering is jitted JAX: ray-plane intersection against the 6 axis-aligned
faces, nearest positive hit, bilinear texture lookup.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3
from ..geometry.camera import Intrinsics

# Room half-extents (meters): x in [-HX, HX], y in [-HY, HY], z in [-HZ, HZ].
HX, HY, HZ = 3.0, 2.0, 3.0
TEX = 512  # texture resolution per face

# Face table: (axis, sign). Plane equation: X[axis] = sign * extent.
_FACES = [(0, +1), (0, -1), (1, +1), (1, -1), (2, +1), (2, -1)]
_EXTENT = [HX, HX, HY, HY, HZ, HZ]
# In-plane texture axes for each face (the other two axes).
_UVAXES = [(1, 2), (1, 2), (0, 2), (0, 2), (0, 1), (0, 1)]
_UVSPAN = [(HY, HZ), (HY, HZ), (HX, HZ), (HX, HZ), (HX, HY), (HX, HY)]


def make_room_textures(
    seed: int = 0, stripes: bool = True, low_texture: bool = False
) -> np.ndarray:
    """(6, TEX, TEX) float32 textures in [0, 255].

    low_texture=True emulates the reference's target regime (fr3 structure/
    notexture): near-uniform walls with only the structural stripes — few
    FAST corners, so tracking must lean on lines/planes/Manhattan.
    """
    rng = np.random.RandomState(seed)
    texs = []
    for f in range(6):
        if low_texture:
            # Gentle large-scale shading only: almost no corners.
            coarse = rng.uniform(120, 150, size=(4, 4)).astype(np.float32)
            t = np.asarray(
                jax.image.resize(jnp.asarray(coarse), (TEX, TEX), "cubic")
            ).copy()
        else:
            coarse = rng.uniform(60, 200, size=(TEX // 32, TEX // 32)).astype(np.float32)
            t = np.asarray(
                jax.image.resize(jnp.asarray(coarse), (TEX, TEX), "cubic")
            ).copy()
            # High-contrast blobs: strong FAST corners everywhere.
            for _ in range(120):
                cy, cx = rng.randint(8, TEX - 8, size=2)
                s = rng.randint(3, 9)
                val = rng.choice([15.0, 240.0])
                t[cy : cy + s, cx : cx + s] = val
        if stripes:
            # Dark stripes parallel to texture axes -> straight 3D lines on
            # the face, for the line-feature pipeline.
            for _ in range(6):
                pos = rng.randint(30, TEX - 30)
                wdt = rng.randint(4, 8)
                if rng.rand() < 0.5:
                    t[pos : pos + wdt, :] = 20.0
                else:
                    t[:, pos : pos + wdt] = 20.0
        texs.append(np.clip(t, 0, 255))
    return np.stack(texs).astype(np.float32)


class RoomScene(NamedTuple):
    textures: jnp.ndarray  # (6, TEX, TEX)
    # Optional slanted quads (non-Manhattan structure): center, edge vectors
    # (the quad spans center +- e_u +- e_v), and per-quad textures. Empty
    # (0, ...) arrays disable them; counts are static so render stays jitted.
    quad_c: jnp.ndarray = jnp.zeros((0, 3), jnp.float32)
    quad_eu: jnp.ndarray = jnp.zeros((0, 3), jnp.float32)
    quad_ev: jnp.ndarray = jnp.zeros((0, 3), jnp.float32)
    quad_tex: jnp.ndarray = jnp.zeros((0, TEX, TEX), jnp.float32)
    # Optional textured spheres (curved clutter): center + radius.
    sphere_c: jnp.ndarray = jnp.zeros((0, 3), jnp.float32)
    sphere_r: jnp.ndarray = jnp.zeros((0,), jnp.float32)


def make_room(
    seed: int = 0, stripes: bool = True, low_texture: bool = False
) -> RoomScene:
    return RoomScene(
        textures=jnp.asarray(make_room_textures(seed, stripes, low_texture))
    )


def make_quad_texture(seed: int = 0, stripes: bool = True) -> np.ndarray:
    """Texture for a slanted quad: noise + stripes along the quad's own
    (slanted) axes -> non-Manhattan 3D lines."""
    rng = np.random.RandomState(seed)
    coarse = rng.uniform(70, 190, size=(TEX // 32, TEX // 32)).astype(np.float32)
    t = np.asarray(jax.image.resize(jnp.asarray(coarse), (TEX, TEX), "cubic")).copy()
    for _ in range(40):
        cy, cx = rng.randint(8, TEX - 8, size=2)
        s = rng.randint(3, 9)
        t[cy : cy + s, cx : cx + s] = rng.choice([20.0, 235.0])
    if stripes:
        for _ in range(4):
            pos = rng.randint(30, TEX - 30)
            wdt = rng.randint(4, 8)
            if rng.rand() < 0.5:
                t[pos : pos + wdt, :] = 25.0
            else:
                t[:, pos : pos + wdt] = 25.0
    return np.clip(t, 0, 255).astype(np.float32)


def make_adversarial_room(
    seed: int = 0,
    n_slanted: int = 2,
    n_spheres: int = 3,
    low_texture: bool = False,
) -> RoomScene:
    """Room + slanted striped quads (non-Manhattan lines/planes the
    Manhattan machinery must NOT force onto its axes) + textured spheres
    (curved clutter that breaks local planarity)."""
    rng = np.random.RandomState(seed + 77)
    base = make_room(seed, stripes=True, low_texture=low_texture)
    qc, qu, qv, qt = [], [], [], []
    for i in range(n_slanted):
        # A quad leaning against the +z wall region, tilted ~30-45 deg.
        cx = rng.uniform(-1.5, 1.5)
        tilt = rng.uniform(0.5, 0.8)  # rad
        c = np.array([cx, 0.0, HZ - 0.9], np.float32)
        e_u = np.array([np.cos(tilt), np.sin(tilt), 0.0], np.float32) * 0.9
        e_v = np.array(
            [-np.sin(tilt) * 0.3, np.cos(tilt) * 0.8, -0.25], np.float32
        )
        qc.append(c)
        qu.append(e_u)
        qv.append(e_v)
        qt.append(make_quad_texture(seed + i, stripes=True))
    sc, sr = [], []
    for i in range(n_spheres):
        sc.append(
            np.array(
                [rng.uniform(-2.0, 2.0), rng.uniform(-1.2, 1.2),
                 rng.uniform(0.5, HZ - 0.8)],
                np.float32,
            )
        )
        sr.append(np.float32(rng.uniform(0.25, 0.55)))
    return RoomScene(
        textures=base.textures,
        quad_c=jnp.asarray(np.stack(qc)) if qc else jnp.zeros((0, 3), jnp.float32),
        quad_eu=jnp.asarray(np.stack(qu)) if qu else jnp.zeros((0, 3), jnp.float32),
        quad_ev=jnp.asarray(np.stack(qv)) if qv else jnp.zeros((0, 3), jnp.float32),
        quad_tex=jnp.asarray(np.stack(qt)) if qt else jnp.zeros((0, TEX, TEX), jnp.float32),
        sphere_c=jnp.asarray(np.stack(sc)) if sc else jnp.zeros((0, 3), jnp.float32),
        sphere_r=jnp.asarray(np.stack(sr)) if sr else jnp.zeros((0,), jnp.float32),
    )


def corrupt_depth(
    depth: np.ndarray,
    rng: np.random.Generator,
    quad_sigma: float = 0.01,
    n_holes: int = 12,
    hole_size: int = 28,
) -> np.ndarray:
    """Kinect-style depth corruption: quadratic-in-z noise
    (sigma = quad_sigma * z^2, the standard structured-light error model)
    plus elliptical dropout holes (occlusion shadows / absorbing surfaces).
    """
    d = np.asarray(depth).copy()
    h, w = d.shape
    z = d
    noise = rng.standard_normal(d.shape).astype(np.float32) * quad_sigma * z * z
    d = np.where(z > 0, np.maximum(z + noise, 0.0), 0.0)
    for _ in range(n_holes):
        cy = rng.integers(0, h)
        cx = rng.integers(0, w)
        ry = rng.integers(hole_size // 3, hole_size)
        rx = rng.integers(hole_size // 3, hole_size)
        yy, xx = np.ogrid[:h, :w]
        mask = ((yy - cy) / max(ry, 1)) ** 2 + ((xx - cx) / max(rx, 1)) ** 2 <= 1.0
        d[mask] = 0.0
    return d.astype(np.float32)


def render(
    scene: RoomScene, intr: Intrinsics, T_wc: jnp.ndarray,
    distort: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render (gray (H, W), depth (H, W)) for camera-to-world pose T_wc.

    With `distort`, the image is formed through the intrinsics' radtan
    model: each pixel's ray comes from iteratively undistorting its
    normalized coordinates (the exact inverse of the projection the VO's
    `camera.undistort_points` applies), so a tum1-style configuration is
    exercised end-to-end."""
    h, w = intr.height, intr.width
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    if distort and intr.has_distortion:
        from ..geometry import camera as camera_mod

        uv = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=1)
        und = camera_mod.undistort_points(intr, uv)
        xn = ((und[:, 0] - intr.cx) / intr.fx).reshape(h, w)
        yn = ((und[:, 1] - intr.cy) / intr.fy).reshape(h, w)
    else:
        xn = (xx - intr.cx) / intr.fx
        yn = (yy - intr.cy) / intr.fy
    d_c = jnp.stack(
        [xn, yn, jnp.ones_like(xx)],
        axis=-1,
    )  # (H, W, 3), z-normalized so hit lambda == camera depth
    R = T_wc[:3, :3]
    o = T_wc[:3, 3]
    d_w = jnp.einsum("ij,hwj->hwi", R, d_c)

    best_lam = jnp.full((h, w), jnp.inf)
    best_val = jnp.zeros((h, w))
    for fid, (axis, sign) in enumerate(_FACES):
        ext = sign * _EXTENT[fid]
        denom = d_w[..., axis]
        lam = (ext - o[axis]) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
        hit = o[None, None, :] + lam[..., None] * d_w
        ua, va = _UVAXES[fid]
        su, sv = _UVSPAN[fid]
        inside = (
            (lam > 0.05)
            & (jnp.abs(hit[..., ua]) <= su + 1e-4)
            & (jnp.abs(hit[..., va]) <= sv + 1e-4)
        )
        tu = (hit[..., ua] + su) / (2 * su) * (TEX - 1)
        tv = (hit[..., va] + sv) / (2 * sv) * (TEX - 1)
        tex = scene.textures[fid]
        # Bilinear sample.
        x0 = jnp.clip(jnp.floor(tu).astype(jnp.int32), 0, TEX - 2)
        y0 = jnp.clip(jnp.floor(tv).astype(jnp.int32), 0, TEX - 2)
        fx = jnp.clip(tu - x0, 0.0, 1.0)
        fy = jnp.clip(tv - y0, 0.0, 1.0)
        val = (
            tex[y0, x0] * (1 - fx) * (1 - fy)
            + tex[y0, x0 + 1] * fx * (1 - fy)
            + tex[y0 + 1, x0] * (1 - fx) * fy
            + tex[y0 + 1, x0 + 1] * fx * fy
        )
        closer = inside & (lam < best_lam)
        best_lam = jnp.where(closer, lam, best_lam)
        best_val = jnp.where(closer, val, best_val)

    # Slanted quads (ray-parallelogram intersection).
    for q in range(scene.quad_c.shape[0]):
        c = scene.quad_c[q]
        eu = scene.quad_eu[q]
        ev = scene.quad_ev[q]
        n = jnp.cross(eu, ev)
        denom = jnp.einsum("hwi,i->hw", d_w, n)
        lam = jnp.einsum("i,i->", c - o, n) / jnp.where(
            jnp.abs(denom) > 1e-9, denom, 1e-9
        )
        hit = o[None, None, :] + lam[..., None] * d_w
        rel = hit - c[None, None, :]
        # Coordinates in the (eu, ev) frame via the 2x2 Gram solve.
        guu = jnp.dot(eu, eu)
        gvv = jnp.dot(ev, ev)
        guv = jnp.dot(eu, ev)
        bu = jnp.einsum("hwi,i->hw", rel, eu)
        bv = jnp.einsum("hwi,i->hw", rel, ev)
        det = guu * gvv - guv * guv
        a_u = (bu * gvv - bv * guv) / det
        a_v = (bv * guu - bu * guv) / det
        inside = (lam > 0.05) & (jnp.abs(a_u) <= 1.0) & (jnp.abs(a_v) <= 1.0)
        tu = (a_u + 1.0) * 0.5 * (TEX - 1)
        tv = (a_v + 1.0) * 0.5 * (TEX - 1)
        tex = scene.quad_tex[q]
        x0 = jnp.clip(jnp.floor(tu).astype(jnp.int32), 0, TEX - 2)
        y0 = jnp.clip(jnp.floor(tv).astype(jnp.int32), 0, TEX - 2)
        fx = jnp.clip(tu - x0, 0.0, 1.0)
        fy = jnp.clip(tv - y0, 0.0, 1.0)
        val = (
            tex[y0, x0] * (1 - fx) * (1 - fy)
            + tex[y0, x0 + 1] * fx * (1 - fy)
            + tex[y0 + 1, x0] * (1 - fx) * fy
            + tex[y0 + 1, x0 + 1] * fx * fy
        )
        closer = inside & (lam < best_lam)
        best_lam = jnp.where(closer, lam, best_lam)
        best_val = jnp.where(closer, val, best_val)

    # Spheres (curved clutter; banded procedural shading).
    for s in range(scene.sphere_c.shape[0]):
        c = scene.sphere_c[s]
        r = scene.sphere_r[s]
        oc = o - c
        # |o + lam d - c|^2 = r^2 with d z-normalized (|d| != 1): solve the
        # quadratic in lam directly.
        A = jnp.einsum("hwi,hwi->hw", d_w, d_w)
        B = 2.0 * jnp.einsum("hwi,i->hw", d_w, oc)
        Cc = jnp.dot(oc, oc) - r * r
        disc = B * B - 4.0 * A * Cc
        ok = disc > 0
        lam = (-B - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2.0 * A)
        hit = o[None, None, :] + lam[..., None] * d_w
        nrm = (hit - c[None, None, :]) / r
        # Latitude bands + a longitudinal wobble: texture without corners
        # that would be easy FAST targets, plus Lambert shading.
        lat = jnp.arcsin(jnp.clip(nrm[..., 1], -1.0, 1.0))
        lon = jnp.arctan2(nrm[..., 2], nrm[..., 0])
        bands = 120.0 + 70.0 * jnp.sin(lat * 9.0 + jnp.sin(lon * 3.0))
        light = jnp.clip(
            jnp.einsum("hwi,i->hw", nrm, jnp.asarray([0.4, -0.6, -0.7])), 0.2, 1.0
        )
        val = jnp.clip(bands * light + 40.0, 0.0, 255.0)
        closer = ok & (lam > 0.05) & (lam < best_lam)
        best_lam = jnp.where(closer, lam, best_lam)
        best_val = jnp.where(closer, val, best_val)

    depth = jnp.where(jnp.isfinite(best_lam), best_lam, 0.0)
    return best_val, depth


render_jit = jax.jit(render, static_argnums=(1, 3))


def orbit_trajectory(
    n: int,
    radius: float = 0.6,
    yaw_amp: float = 0.35,
    center: Tuple[float, float, float] = (0.0, 0.0, -0.8),
    step: float = 0.3 * np.pi / 24.0,
) -> np.ndarray:
    """Smooth camera path inside the room -> (n, 4, 4) T_wc (camera to world).

    The camera translates on a horizontal arc and yaws, always looking
    roughly at the +z wall. Per-frame arc `step` is constant regardless of
    n, keeping motion at the 1-3 cm / <1 deg scale of a 30 fps handheld
    sequence (large inter-frame jumps defeat window-based matching in any
    VO, including the reference's)."""
    out = []
    for i in range(n):
        ang = step * i
        t = np.array(
            [
                center[0] + radius * np.sin(ang),
                center[1] + 0.15 * np.sin(2 * ang),
                center[2] + 0.3 * np.sin(ang * 0.5),
            ],
            np.float32,
        )
        yaw = yaw_amp * np.sin(ang)
        pitch = 0.08 * np.sin(2 * ang)
        Rz = np.asarray(se3.exp_so3(jnp.array([0.0, yaw, 0.0], dtype=jnp.float32)))
        Rx = np.asarray(se3.exp_so3(jnp.array([pitch, 0.0, 0.0], dtype=jnp.float32)))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rz @ Rx
        T[:3, 3] = t
        out.append(T)
    return np.stack(out)


def render_sequence(
    n: int = 30,
    intr: Intrinsics | None = None,
    seed: int = 0,
    stripes: bool = True,
    scene: RoomScene | None = None,
    distort: bool = False,
):
    """Convenience: (T_wc (n,4,4), grays list, depths list) on default path."""
    from ..config import tum3_config

    intr = intr or tum3_config().camera
    scene = scene if scene is not None else make_room(seed, stripes)
    T_wc = orbit_trajectory(n)
    grays, depths = [], []
    for i in range(n):
        g, d = render_jit(scene, intr, jnp.asarray(T_wc[i]), distort)
        grays.append(np.asarray(g))
        depths.append(np.asarray(d))
    return T_wc, grays, depths
