"""Device-time breakdown of the fused per-frame program's major stages.

Times each stage as its own jitted program on the real chip (median of
repeated dispatch+block loops after warmup) to locate the hot spots that
set the ~13 ms/frame device ceiling. Not part of the test suite; a dev
tool kept at repo root alongside bench.py.
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from hfvo_tpu.config import tum3_config
from hfvo_tpu.testing import synthetic
from hfvo_tpu.tracking import frontend
from hfvo_tpu.ops import orb, lines as line_ops, planes as plane_ops
from hfvo_tpu.ops import manhattan as manh_ops


def timeit(name, fn, *args, n=60):
    """Per-call device time with the transport RTT amortized: queue `n`
    async dispatches back-to-back, block once. Over the dev tunnel a
    single dispatch+block pays a ~25 ms round trip regardless of the
    program, so per-dispatch timing measures the transport, not the op."""
    out = fn(*args)
    jax.block_until_ready(out)
    reps = 3
    meds = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        meds.append((time.perf_counter() - t0) / n)
    med = float(np.median(meds)) * 1e3
    print(f"{name:34s} {med:8.3f} ms/call   (min {min(meds)*1e3:.3f})")
    return med


def main():
    cfg = tum3_config()
    T_wc, grays, depths = synthetic.render_sequence(n=3, seed=0)
    gray = jnp.asarray(np.clip(np.rint(grays[0]), 0, 255).astype(np.uint8))
    depth16 = jnp.asarray(
        np.clip(depths[0] * 1000.0, 0, 65535).astype(np.uint16)
    )

    f32 = jax.jit(lambda g, d: (g.astype(jnp.float32),
                                d.astype(jnp.float32) * 1e-3))
    grayf, depthf = f32(gray, depth16)
    jax.block_until_ready((grayf, depthf))

    timeit("cast u8/u16 -> f32", f32, gray, depth16)

    ex = jax.jit(lambda g, d: frontend.extract_frame(g, d, cfg))
    timeit("extract_frame (ORB total)", ex, grayf, depthf)

    exorb = jax.jit(lambda g: orb.extract_orb(g, cfg.orb, cfg.cap.keypoints))
    timeit("  extract_orb", exorb, grayf)

    ln = jax.jit(lambda g: line_ops.detect_lines(g))
    try:
        timeit("detect_lines", ln, grayf)
    except Exception as e:
        print("detect_lines: skip", e)

    nrm = jax.jit(lambda d: plane_ops.compute_normals(
        d, cfg.camera, stride=8))
    timeit("compute_normals s8", nrm, depthf)

    # Manhattan refine
    normals, n_ok = nrm(depthf)
    R = jnp.eye(3)
    mr = jax.jit(lambda R, nn, ok: manh_ops.refine_axes(
        R, nn, ok.astype(jnp.float32),
        cone=cfg.manhattan.normal_cone,
        kernel=cfg.manhattan.meanshift_kernel))
    timeit("manhattan refine_axes", mr, R, normals, n_ok)

    # Full fused step with realistic tracker state (populated local map).
    from hfvo_tpu.tracking.tracker import (
        Tracker, fused_track_step, lk_recover_program,
    )

    n = 10
    T_wc, grays, depths = synthetic.render_sequence(n=n, seed=0)
    grays_u8 = [np.clip(np.rint(g), 0, 255).astype(np.uint8) for g in grays]
    depths_u16 = [
        np.clip(d * 1000.0, 0, 65535).astype(np.uint16) for d in depths
    ]
    tr = Tracker(cfg, use_local_ba=False, use_loop_closing=False)
    for i in range(n):
        tr.track_rgbd(grays_u8[i], depths_u16[i],
                      T_cw_init=np.linalg.inv(T_wc[0]))

    g_dev = jnp.asarray(grays_u8[-1])
    d_dev = jnp.asarray(tr._depth_host_u16(depths_u16[-1]))
    T_pred = np.asarray(tr.T_cw, np.float32)
    args = tr.prepare_step_args(g_dev, d_dev, T_pred)
    jax.block_until_ready(args)

    def full(*a):
        return fused_track_step(cfg, *a)[0]

    timeit("FULL fused_track_step", full, *args, n=40)

    feed = tr._prev_line_feed
    if feed and feed.get("dev"):
        p0_d, p1_d, desc_d, valid_d = feed["dev"]
        prev_gray = feed["gray"]
        if not isinstance(prev_gray, jax.Array):
            prev_gray = jnp.asarray(prev_gray)
        Tp = jnp.asarray(T_pred)
        Tpb = jnp.asarray(np.linalg.inv(T_pred).astype(np.float32))
        timeit("lk_recover_program", lambda: lk_recover_program(
            cfg, g_dev, prev_gray, p0_d, p1_d, valid_d, Tp, Tpb, Tp), n=40)


if __name__ == "__main__":
    main()


def orb_breakdown():
    from hfvo_tpu.ops import fast as fast_ops
    from hfvo_tpu.ops.image import build_pyramid, gaussian_blur, extract_patches
    from hfvo_tpu.ops.orb import (
        PATCH_R, ic_angles_from_patches, brief_from_patches, level_budgets,
    )

    cfg = tum3_config()
    T_wc, grays, depths = synthetic.render_sequence(n=2, seed=0)
    grayf = jnp.asarray(grays[0].astype(np.float32))
    ocfg = cfg.orb

    pyr_f = jax.jit(lambda g: build_pyramid(g, ocfg.n_levels, ocfg.scale_factor))
    pyr = pyr_f(grayf)
    timeit("pyramid", pyr_f, grayf)

    def scores(g):
        pyr = build_pyramid(g, ocfg.n_levels, ocfg.scale_factor)
        outs = []
        for img_l in pyr:
            if jax.default_backend() == "tpu":
                from hfvo_tpu.ops.pallas_fast import fast_score_pallas
                outs.append(fast_score_pallas(img_l, float(ocfg.min_th_fast)))
                outs.append(fast_score_pallas(img_l, float(ocfg.ini_th_fast)))
            else:
                outs.append(fast_ops.fast_score(img_l, ocfg.min_th_fast))
        return outs
    timeit("pyr + 2x fast_score all levels", jax.jit(scores), grayf)

    def st(g):
        pyr = build_pyramid(g, ocfg.n_levels, ocfg.scale_factor)
        return [fast_ops.shi_tomasi_min_eig(i) for i in pyr]
    timeit("pyr + shi_tomasi all levels", jax.jit(st), grayf)

    def detect_all(g):
        pyr = build_pyramid(g, ocfg.n_levels, ocfg.scale_factor)
        budgets = level_budgets(ocfg.n_features, ocfg.n_levels, ocfg.scale_factor)
        return [
            fast_ops.detect_grid_topk(
                i, float(ocfg.ini_th_fast), float(ocfg.min_th_fast),
                ocfg.grid_cell, b, ocfg.edge_threshold)
            for i, b in zip(pyr, budgets) if b > 0
        ]
    timeit("pyr + detect_grid_topk all", jax.jit(detect_all), grayf)

    def desc_path(g):
        pyr = build_pyramid(g, ocfg.n_levels, ocfg.scale_factor)
        budgets = level_budgets(ocfg.n_features, ocfg.n_levels, ocfg.scale_factor)
        outs = []
        for img_l, b in zip(pyr, budgets):
            if b == 0:
                continue
            yx = jnp.zeros((b, 2), jnp.int32) + 40
            blur = gaussian_blur(img_l, 2.0, 3)
            patches = extract_patches(blur, yx, PATCH_R)
            ang = ic_angles_from_patches(patches)
            outs.append(brief_from_patches(patches, ang))
        return outs
    timeit("blur+patches+angles+brief all", jax.jit(desc_path), grayf)


if __name__ == "__main__" and os.environ.get("ORB_BREAKDOWN"):
    orb_breakdown()
