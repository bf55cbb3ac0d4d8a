"""MFU / roofline audit of the fused per-frame step (dev tool).

Captures a real XLA op-level trace of `fused_track_step` (and the chained
`lk_recover_program`) on the TPU, aggregates device time per HLO op, and
joins it with XLA's own cost analysis (FLOPs / bytes accessed) to place the
step on the chip's roofline. Publishes the numbers BENCH_NOTES.md cites.

Usage:  python mfu_audit.py [--top 40] [--batch 8]

Peak numbers used (TPU v5e / "v5 lite", per chip):
  bf16 MXU        197 TFLOP/s
  f32  (MXU pass) ~49 TFLOP/s (bf16x3-style decomposition; conservative)
  HBM             819 GB/s
"""
from __future__ import annotations

import argparse
import collections
import glob
import re
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

PEAK_BF16 = 197e12
PEAK_F32 = 49e12
PEAK_HBM = 819e9


def build_step():
    """Tracker with realistic populated-map state; returns (fn, args, meta)."""
    from hfvo_tpu.config import tum3_config
    from hfvo_tpu.testing import synthetic
    from hfvo_tpu.tracking.tracker import Tracker, fused_track_step

    cfg = tum3_config()
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

    def step(*a):
        return fused_track_step(cfg, *a)

    return step, args, cfg


def aggregate_trace(trace_dir: str):
    """Parse the xplane trace -> (module_times, per-op rows)."""
    from jax.profiler import ProfileData

    files = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    ops = collections.defaultdict(lambda: [0, 0.0])  # name -> [calls, ps]
    modules = collections.defaultdict(lambda: [0, 0.0])
    full_name = {}
    for f in files:
        pd = ProfileData.from_file(f)
        for plane in pd.planes:
            if not plane.name.startswith("/device:TPU"):
                continue
            for line in plane.lines:
                if line.name == "XLA Modules":
                    for ev in line.events:
                        d = dict(ev.stats).get("device_duration_ps", 0)
                        m = re.sub(r"\(\d+\)$", "", ev.name)
                        modules[m][0] += 1
                        modules[m][1] += d
                elif line.name == "XLA Ops":
                    for ev in line.events:
                        d = dict(ev.stats).get("device_duration_ps", 0)
                        # "%opname = type[shape] opcode(...)" -> key on the
                        # instruction name; keep the full text for shapes.
                        m = re.match(r"%(\S+) =", ev.name)
                        key = m.group(1) if m else ev.name[:60]
                        ops[key][0] += 1
                        ops[key][1] += d
                        full_name.setdefault(key, ev.name)
    return modules, ops, full_name


def classify(key: str, text: str) -> str:
    t = text
    if " fusion(" in t:
        kind = re.search(r"kind=k(\w+)", t)
        return f"fusion:{kind.group(1) if kind else '?'}"
    m = re.search(r"= \S+ (\w[\w-]*)\(", t)
    return m.group(1) if m else "?"


def scope_of(op_name: str) -> str:
    """'jit(x)/jit(fused_track_step)/jit(detect_lines)/while/...' ->
    'detect_lines'. Ops directly in the fused step body -> 'step_glue'."""
    parts = [p[4:-1] for p in op_name.split("/") if p.startswith("jit(")]
    # parts like ['<lambda>', 'fused_track_step', 'detect_lines', ...]
    for p in parts:
        if p in ("<lambda>", "fused_track_step", "_fused_track_step_impl"):
            continue
        return p
    return "step_glue"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--reps", type=int, default=30)
    args_cli = ap.parse_args()

    step, args, cfg = build_step()

    # AOT-compile ONE executable and trace exactly it, so trace op names
    # join 1:1 with this executable's HLO metadata (jit-cache executables
    # number instructions differently).
    from hfvo_tpu.tracking.tracker import fused_track_step
    compiled = jax.jit(
        lambda *a: fused_track_step(cfg, *a)
    ).lower(*args).compile()
    hlo_txt = compiled.as_text()
    op_scope = {}
    for m in re.finditer(
        r"%(\S+) = [^\n]*op_name=\"([^\"]+)\"", hlo_txt
    ):
        op_scope[m.group(1)] = m.group(2)

    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args_cli.reps):
        out = compiled(*args)
    jax.block_until_ready(out)
    wall_ms = (time.perf_counter() - t0) / args_cli.reps * 1e3
    print(f"fused step amortized wall: {wall_ms:.2f} ms/frame")

    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = cost.get("flops", 0.0)
    bytes_acc = cost.get("bytes accessed", 0.0)
    print(f"XLA cost analysis: {flops/1e9:.2f} GFLOP, "
          f"{bytes_acc/1e6:.1f} MB accessed")

    d = tempfile.mkdtemp(prefix="hfvo_trace_")
    with jax.profiler.trace(d):
        for _ in range(args_cli.reps):
            out = compiled(*args)
        jax.block_until_ready(out)

    modules, ops, full_name = aggregate_trace(d)

    print("\n== device time by subsystem (joined via HLO op_name) ==")
    sub = collections.defaultdict(float)
    unattributed = 0.0
    for key, (calls, ps) in ops.items():
        sc = op_scope.get(key)
        if sc is None:
            unattributed += ps
            sub["(no metadata)"] += ps
        else:
            sub[scope_of(sc)] += ps
    for name, ps in sorted(sub.items(), key=lambda kv: -kv[1]):
        ms = ps / 1e9 / args_cli.reps
        print(f"{name:44s} {ms:8.3f} ms/frame")
    print(f"\n== XLA modules (over {args_cli.reps} dispatches) ==")
    total_dev_ms = 0.0
    for name, (calls, ps) in sorted(modules.items(), key=lambda kv: -kv[1][1]):
        ms = ps / 1e9 / args_cli.reps
        total_dev_ms += ms
        print(f"{name[:60]:60s} {calls:4d} calls  {ms:8.3f} ms/frame")
    print(f"{'TOTAL device':60s}       {total_dev_ms:8.3f} ms/frame")

    print(f"\n== top {args_cli.top} XLA ops by device time ==")
    rows = sorted(ops.items(), key=lambda kv: -kv[1][1])
    cum = 0.0
    for key, (calls, ps) in rows[: args_cli.top]:
        us = ps / 1e6 / args_cli.reps
        cum += us
        cat = classify(key, full_name[key])
        # First ~100 chars of the HLO text shows output shape.
        shape = re.search(r"= (\S+)", full_name[key])
        print(f"{us:9.1f} us  {calls/args_cli.reps:5.1f}x  {cat:18s} "
              f"{key[:46]:46s} {shape.group(1)[:42] if shape else ''}")
    step_ps = sum(ps for _, ps in ops.values())
    print(f"cumulative top-{args_cli.top}: {cum/1e3:.3f} ms "
          f"of {step_ps/1e9/args_cli.reps:.3f} ms total op time")

    # Roofline placement.
    t_dev = total_dev_ms / 1e3
    print("\n== roofline ==")
    print(f"achieved FLOP/s: {flops / t_dev / 1e12:.3f} TFLOP/s "
          f"({100 * flops / t_dev / PEAK_F32:.1f}% of f32 peak, "
          f"{100 * flops / t_dev / PEAK_BF16:.1f}% of bf16 peak)")
    print(f"achieved bytes/s: {bytes_acc / t_dev / 1e9:.1f} GB/s "
          f"({100 * bytes_acc / t_dev / PEAK_HBM:.1f}% of HBM peak)")
    print(f"ideal compute-bound time: {flops / PEAK_F32 * 1e3:.3f} ms (f32)")
    print(f"ideal memory-bound time:  {bytes_acc / PEAK_HBM * 1e3:.3f} ms")
    print(f"trace dir: {d}")


if __name__ == "__main__":
    main()
