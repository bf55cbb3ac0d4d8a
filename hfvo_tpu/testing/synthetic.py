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


def make_room(
    seed: int = 0, stripes: bool = True, low_texture: bool = False
) -> RoomScene:
    return RoomScene(
        textures=jnp.asarray(make_room_textures(seed, stripes, low_texture))
    )


def render(
    scene: RoomScene, intr: Intrinsics, T_wc: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render (gray (H, W), depth (H, W)) for camera-to-world pose T_wc."""
    h, w = intr.height, intr.width
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    d_c = jnp.stack(
        [(xx - intr.cx) / intr.fx, (yy - intr.cy) / intr.fy, jnp.ones_like(xx)],
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
    depth = jnp.where(jnp.isfinite(best_lam), best_lam, 0.0)
    return best_val, depth


render_jit = jax.jit(render, static_argnums=(1,))


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
):
    """Convenience: (T_wc (n,4,4), grays list, depths list) on default path."""
    from ..config import tum3_config

    intr = intr or tum3_config().camera
    scene = make_room(seed, stripes)
    T_wc = orbit_trajectory(n)
    grays, depths = [], []
    for i in range(n):
        g, d = render_jit(scene, intr, jnp.asarray(T_wc[i]))
        grays.append(np.asarray(g))
        depths.append(np.asarray(d))
    return T_wc, grays, depths
