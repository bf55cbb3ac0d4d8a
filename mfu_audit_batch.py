"""MFU audit of the BATCHED (vmap) fused step — where does batch-8 lose its
amortization? (dev tool, companion to mfu_audit.py)"""
from __future__ import annotations

import argparse
import collections
import re
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import mfu_audit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    args_cli = ap.parse_args()
    B = args_cli.batch

    step, args, cfg = mfu_audit.build_step()
    bargs = [
        jnp.tile(a, (B,) + (1,) * a.ndim) .reshape((B,) + tuple(a.shape))
        for a in args
    ]
    jax.block_until_ready(bargs)

    from hfvo_tpu.tracking.tracker import fused_track_step

    def one(*a):
        return fused_track_step(cfg, *a)

    compiled = jax.jit(jax.vmap(one)).lower(*bargs).compile()
    hlo_txt = compiled.as_text()
    op_scope = {}
    for m in re.finditer(
        r"%(\S+) = [^\n]*op_name=\"([^\"]+)\""
        r"(?:[^\n]*source_file=\"([^\"]+)\" source_line=(\d+))?",
        hlo_txt,
    ):
        name, scope, sf, sl = m.groups()
        if sf:
            scope = f"{scope} @{sf.split('/')[-1]}:{sl}"
        op_scope[name] = scope

    out = compiled(*bargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args_cli.reps):
        out = compiled(*bargs)
    jax.block_until_ready(out)
    wall_ms = (time.perf_counter() - t0) / args_cli.reps * 1e3
    print(f"batched step (B={B}) wall: {wall_ms:.2f} ms/step = "
          f"{wall_ms / B:.2f} ms/frame")

    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    print(f"XLA cost: {cost.get('flops', 0)/1e9:.2f} GFLOP, "
          f"{cost.get('bytes accessed', 0)/1e6:.1f} MB")

    d = tempfile.mkdtemp(prefix="hfvo_btrace_")
    with jax.profiler.trace(d):
        for _ in range(args_cli.reps):
            out = compiled(*bargs)
        jax.block_until_ready(out)

    modules, ops, full_name = mfu_audit.aggregate_trace(d)
    print("\n== device time by subsystem (per step) ==")
    sub = collections.defaultdict(float)
    for key, (calls, ps) in ops.items():
        sc = op_scope.get(key)
        sub[mfu_audit.scope_of(sc) if sc else "(no metadata)"] += ps
    for name, ps in sorted(sub.items(), key=lambda kv: -kv[1]):
        ms = ps / 1e9 / args_cli.reps
        if ms > 0.005:
            print(f"{name:44s} {ms:8.3f} ms/step  ({ms/B:.3f} ms/frame)")

    total = 0.0
    for name, (calls, ps) in sorted(modules.items(), key=lambda kv: -kv[1][1]):
        ms = ps / 1e9 / args_cli.reps
        total += ms
        print(f"module {name[:50]:50s} {ms:8.3f} ms/step")

    print(f"\n== top {args_cli.top} ops ==")
    rows = sorted(ops.items(), key=lambda kv: -kv[1][1])
    for key, (calls, ps) in rows[: args_cli.top]:
        us = ps / 1e6 / args_cli.reps
        cat = mfu_audit.classify(key, full_name[key])
        shape = re.search(r"= (\S+)", full_name[key])
        sc = op_scope.get(key, "")
        src = sc.split("@")[-1] if "@" in sc else "?"
        print(f"{us:9.1f} us  {calls/args_cli.reps:5.1f}x  {cat:16s} "
              f"{key[:32]:32s} {(shape.group(1)[:30] if shape else ''):30s} "
              f"{src}")
    print(f"trace dir: {d}")


if __name__ == "__main__":
    main()
