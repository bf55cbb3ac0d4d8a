"""Scaling curves for the distributed optimizers on a virtual device mesh.

Measures wall time per step for (a) the landmark-block sharded distributed
local BA (`parallel/dist_ba.py` — Schur partial products psum-reduced over
the 'edge' mesh axis) and (b) the sequence-parallel + edge-sharded pose LM
(`parallel/dist_lm.py`) at 1/2/4/8 devices on a FIXED problem size, and
reports scaling efficiency t(1) / (n * t(n)).

IMPORTANT CAVEAT (printed with the results): without real multi-chip
hardware in this environment, devices are XLA host-platform virtual
devices (`--xla_force_host_platform_device_count=8`) sharing one CPU's
cores — compute does NOT speed up with device count, so absolute
efficiency is meaningless here. What the numbers DO indicate is the
communication/partition overhead the sharding adds (a partition-efficient
program shows per-step time roughly flat as devices increase on a fixed
shared-core budget; pathological collectives/layouts blow it up). The same
script runs unchanged on a real TPU slice, where the efficiency column
becomes the ≥70%-to-2-hosts acceptance number (BASELINE.json north star).

Usage: python scaling_bench.py [--iters 5] [--out SCALING.md]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

_ON_TPU = "--tpu" in sys.argv
if not _ON_TPU:
    # Must precede the first jax import anywhere.
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ON_TPU:
    # The harness pins another platform via sitecustomize (see
    # tests/conftest.py); env vars alone don't stick — re-update before any
    # backend initializes.
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402


def _median_time(fn, iters: int) -> float:
    import jax

    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_dist_ba(ndev: int, iters: int) -> float:
    from hfvo_tpu.config import tum3_config
    from hfvo_tpu.parallel.dist_ba import (
        dist_local_bundle_adjustment,
        shard_ba_problem,
    )
    from hfvo_tpu.parallel.mesh import make_mesh
    from hfvo_tpu.testing.ba_fixture import synthetic_ba_problem

    intr = tum3_config().camera
    # Fixed problem regardless of ndev: 4096 landmarks (divisible by 8),
    # 6 keyframes, ~20k exact stereo edges — local-BA scale (Capacities
    # local_points=8192, ba_edges=16384).
    prob, _T_gt = synthetic_ba_problem(intr, 8, pts_per_block=512)
    mesh = make_mesh(n_edge=ndev, n_seq=1)
    sp = shard_ba_problem(prob, ndev)
    run = lambda: dist_local_bundle_adjustment(mesh, sp, intr)  # noqa: E731
    run()  # compile
    return _median_time(run, iters)


def bench_dist_pose_lm(ndev: int, iters: int) -> float:
    import jax.numpy as jnp

    from hfvo_tpu.config import tum3_config
    from hfvo_tpu.geometry import camera, se3
    from hfvo_tpu.parallel.dist_lm import dist_pose_step
    from hfvo_tpu.parallel.mesh import make_mesh

    intr = tum3_config().camera
    rng = np.random.default_rng(0)
    # Fixed problem: 8 sequences x 4096 stereo edges each.
    S, E = 8, 4096
    X = np.stack(
        [rng.uniform(-2, 2, (S, E)), rng.uniform(-1.5, 1.5, (S, E)),
         rng.uniform(2, 6, (S, E))], axis=-1,
    ).astype(np.float32)
    xi_gt = rng.normal(size=(S, 6)).astype(np.float32) * 0.05
    T_gt = np.asarray(se3.exp_se3(jnp.asarray(xi_gt)))
    X_c = np.asarray(se3.transform(jnp.asarray(T_gt)[:, None], jnp.asarray(X)))
    obs = np.asarray(camera.project_stereo(intr, jnp.asarray(X_c)))
    w = np.ones((S, E), np.float32)
    T0 = jnp.broadcast_to(jnp.eye(4), (S, 4, 4))
    n_seq = 2 if ndev >= 2 else 1
    mesh = make_mesh(n_edge=ndev // n_seq, n_seq=n_seq)
    run = lambda: dist_pose_step(  # noqa: E731
        mesh, T0, jnp.asarray(X), jnp.asarray(obs), jnp.asarray(w), intr,
        n_iters=10,
    )
    run()  # compile
    return _median_time(run, iters)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--tpu", action="store_true",
                    help="run the SAME fixed problems on the real chip with "
                    "a 1-device mesh: the absolute ms/step anchor for the "
                    "virtual-mesh overhead curve (SCALING.md real-chip "
                    "column; VERDICT r4 #7)")
    args = ap.parse_args()

    import jax

    if args.tpu:
        assert jax.default_backend() == "tpu", jax.default_backend()
        print("| Optimizer | devices | ms/step (real TPU v5e) |")
        print("|---|---|---|")
        for name, fn in (
            ("dist local BA (landmark-sharded Schur)", bench_dist_ba),
            ("dist pose LM (seq x edge sharded)", bench_dist_pose_lm),
        ):
            t = fn(1, args.iters)
            print(f"| {name} | 1 | {t * 1000:.1f} |")
        return

    assert jax.default_backend() == "cpu" and len(jax.devices()) == 8

    devs = [1, 2, 4, 8]
    print("| Optimizer | devices | ms/step | t1/tn | eff = t1/(n*tn) |")
    print("|---|---|---|---|---|")
    for name, fn in (("dist local BA (landmark-sharded Schur)", bench_dist_ba),
                     ("dist pose LM (seq x edge sharded)", bench_dist_pose_lm)):
        ts = {n: fn(n, args.iters) for n in devs}
        for n in devs:
            print(f"| {name} | {n} | {ts[n] * 1000:.1f} | "
                  f"{ts[1] / ts[n]:.2f} | {ts[1] / (n * ts[n]):.2f} |")


if __name__ == "__main__":
    main()
