"""Back-half profile of the fused step (dev tool)."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from hfvo_tpu.config import tum3_config
from hfvo_tpu.testing import synthetic
from hfvo_tpu.tracking import matcher
from hfvo_tpu.ops import planes as plane_ops, lines3d as line3d_ops
from hfvo_tpu.solve.lm import pose_optimization, PoseObs
from hfvo_tpu.bow.vocab import compute_words
from hfvo_tpu.utils import pack as pack_utils


def timeit(name, fn, *args, n=60):
    out = fn(*args)
    jax.block_until_ready(out)
    meds = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        meds.append((time.perf_counter() - t0) / n)
    print(f"{name:34s} {float(np.median(meds))*1e3:8.3f} ms")


def main():
    cfg = tum3_config()
    T_wc, grays, depths = synthetic.render_sequence(n=2, seed=0)
    depthf = jnp.asarray(depths[0].astype(np.float32))
    rng = np.random.default_rng(0)

    L = 2048  # local map snapshot size (capacity)
    N = cfg.cap.keypoints
    map_X = jnp.asarray(rng.normal(size=(L, 3)).astype(np.float32) + [0, 0, 3])
    map_desc = jnp.asarray(rng.integers(0, 2**32, size=(L, 8), dtype=np.uint64).astype(np.uint32))
    map_valid = jnp.ones((L,), bool)
    map_oct = jnp.zeros((L,), jnp.int32)
    map_ang = jnp.zeros((L,), jnp.float32)
    map_nrm = jnp.zeros((L, 3), jnp.float32)
    kp_uv = jnp.asarray(rng.uniform(0, 640, size=(N, 2)).astype(np.float32))
    kp_desc = jnp.asarray(rng.integers(0, 2**32, size=(N, 8), dtype=np.uint64).astype(np.uint32))
    kp_oct = jnp.zeros((N,), jnp.int32)
    kp_val = jnp.ones((N,), bool)
    T = jnp.eye(4)

    sbp = jax.jit(lambda *a: matcher.search_by_projection(
        *a, radius=15.0, check_octave=True,
        map_angle=map_ang, kp_angle=jnp.zeros((N,), jnp.float32),
        map_normal=map_nrm, view_cos_limit=0.5))
    timeit(f"search_by_projection L={L} N={N}", sbp,
           map_X, map_desc, map_valid, jnp.arange(L, dtype=jnp.int32),
           map_oct, kp_uv, kp_desc, kp_oct, kp_val, T, cfg.camera)

    timeit("compute_words", jax.jit(compute_words), kp_desc)

    sp = jax.jit(lambda d: plane_ops.segment_planes(
        d, cfg.camera, max_planes=cfg.cap.planes))
    timeit("segment_planes", sp, depthf)

    p0 = jnp.asarray(rng.uniform(50, 600, size=(cfg.cap.lines, 2)).astype(np.float32))
    p1 = p0 + 40
    lval = jnp.ones((cfg.cap.lines,), bool)
    fl3 = jax.jit(lambda d, a, b, v: line3d_ops.fit_lines_3d(
        d, cfg.camera, a, b, v,
        min_valid=cfg.lines.min_valid_depth_samples,
        min_length=cfg.lines.min_length_3d))
    timeit("fit_lines_3d", fl3, depthf, p0, p1, lval)

    # pose LM with realistic counts
    X_w = map_X[:N]
    obs = jnp.concatenate([kp_uv, -jnp.ones((N, 1))], axis=1)
    pts = PoseObs(X_w=X_w, obs=obs, is_stereo=jnp.zeros((N,), bool),
                  inv_sigma2=jnp.ones((N,)), valid=kp_val)
    lm = jax.jit(lambda T0, p: pose_optimization(T0, p, cfg.camera))
    timeit("pose_optimization pts-only", lm, T, pts)


if __name__ == "__main__":
    main()


def lm_scaling():
    cfg = tum3_config()
    rng = np.random.default_rng(0)
    N = cfg.cap.keypoints
    # Consistent geometry: observations projected from a true pose with
    # pixel noise, T0 slightly off — the steady-tracking regime where the
    # early-exit matters (random obs never converge and never exit early).
    Xw_np = rng.normal(size=(N, 3)).astype(np.float32) * [1.5, 1.0, 1.0] + [0, 0, 4]
    intr = cfg.camera
    u = intr.fx * Xw_np[:, 0] / Xw_np[:, 2] + intr.cx
    v = intr.fy * Xw_np[:, 1] / Xw_np[:, 2] + intr.cy
    uvn = np.stack([u, v], 1) + rng.normal(size=(N, 2)).astype(np.float32) * 0.5
    X_w = jnp.asarray(Xw_np)
    obs = jnp.concatenate([jnp.asarray(uvn), -jnp.ones((N, 1))], axis=1)
    pts = PoseObs(X_w=X_w, obs=obs, is_stereo=jnp.zeros((N,), bool),
                  inv_sigma2=jnp.ones((N,)), valid=jnp.ones((N,), bool))
    T = jnp.asarray(np.array([
        [1, 0, 0.003, 0.01], [0, 1, 0, -0.005],
        [-0.003, 0, 1, 0.01], [0, 0, 0, 1]], np.float32))
    for rounds, iters in [(1, 1), (1, 10), (2, 10), (4, 10), (4, 5), (4, 2)]:
        lm = jax.jit(lambda T0, p, r=rounds, i=iters: pose_optimization(
            T0, p, cfg.camera, n_rounds=r, n_iters=i))
        timeit(f"LM rounds={rounds} iters={iters}", lm, T, pts)


if __name__ == "__main__":
    import os as _os
    if _os.environ.get("LM_SCALING"):
        lm_scaling()
