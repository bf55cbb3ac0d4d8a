"""Per-frame feature container + extraction orchestration.

The reference's `Frame` constructor runs ORB/LSD/plane extraction in parallel
CPU threads (reference: src/Frame.cc:208-228). Here extraction is one jitted
program per modality; XLA overlaps them on-device. Round 1 covers points;
lines/planes/normals plug into the same container as they land.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import VOConfig
from ..geometry import camera
from ..ops import orb


class FrameFeatures(NamedTuple):
    """Fixed-capacity per-frame features (all jnp arrays)."""

    uv: jnp.ndarray  # (N, 2) float32 undistorted pixel coords
    obs: jnp.ndarray  # (N, 3) float32 (u, v, u_r); u_r valid iff has_depth
    desc: jnp.ndarray  # (N, 8) uint32
    angle: jnp.ndarray  # (N,)
    octave: jnp.ndarray  # (N,) int32
    response: jnp.ndarray  # (N,)
    depth: jnp.ndarray  # (N,) float32 (<= 0 means no depth)
    valid: jnp.ndarray  # (N,) bool
    inv_sigma2: jnp.ndarray  # (N,) information scale 1/1.2^(2*octave)


def _sample_depth(depth_img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Depth at (rounded) keypoint locations; 0 where out of bounds."""
    h, w = depth_img.shape
    x = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, h - 1)
    return depth_img[y, x]


def extract_frame(
    gray: jnp.ndarray, depth_img: jnp.ndarray, cfg: VOConfig
) -> FrameFeatures:
    """ORB + depth association for one RGB-D frame (jit-compatible).

    Mirrors `Frame::Frame` RGB-D (reference: src/Frame.cc:150) +
    `ComputeStereoFromRGBD` (src/Frame.cc:1940): u_r = u - bf/d.
    """
    feats = orb.extract_orb(gray, cfg.orb, cfg.cap.keypoints)
    uv = feats.uv
    if cfg.camera.has_distortion:
        uv = camera.undistort_points(cfg.camera, uv)
    d = _sample_depth(depth_img, feats.uv)  # sample at raw (distorted) coords
    has_d = d > 1e-3
    ur = jnp.where(has_d, uv[:, 0] - cfg.camera.bf / jnp.where(has_d, d, 1.0), -1.0)
    obs = jnp.concatenate([uv, ur[:, None]], axis=1)
    inv_sigma2 = 1.0 / cfg.orb.scale_factor ** (2.0 * feats.octave.astype(jnp.float32))
    return FrameFeatures(
        uv=uv,
        obs=obs,
        desc=feats.desc,
        angle=feats.angle,
        octave=feats.octave,
        response=feats.response,
        depth=jnp.where(has_d, d, 0.0),
        valid=feats.valid,
        inv_sigma2=inv_sigma2,
    )


extract_frame_jit = jax.jit(extract_frame, static_argnums=(2,))
