"""CLI driver for TUM/ICL RGB-D sequences.

Equivalent of the reference's `rgbd_tum` example (reference:
Examples/RGB-D/rgbd_tum.cc:37-207): load the association file, feed frames
to the system, print the mean tracking time at exit, save the trajectory.

Usage:
    python -m hfvo_tpu.cli SETTINGS_YAML SEQUENCE_DIR ASSOCIATION_FILE \
        [--out traj.txt] [--kf-out kf_traj.txt] [--ply map.ply] [--max-frames N]

(The reference also takes a vocabulary blob; relocalization here uses the
in-map descriptor index, so no vocabulary file is needed.)
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("settings", help="settings YAML (reference format)")
    ap.add_argument("sequence", help="sequence directory")
    ap.add_argument("association", help="association file")
    ap.add_argument("--out", default="CameraTrajectory.txt")
    ap.add_argument("--kf-out", default=None)
    ap.add_argument("--ply", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--no-ba", action="store_true")
    ap.add_argument(
        "--loader", choices=["auto", "native", "python"], default="auto",
        help="sequence loader: native C++ prefetcher or pure Python",
    )
    ap.add_argument(
        "--profile-dir", default=None,
        help="capture a jax.profiler trace of the run into this directory "
        "(the TPU replacement for the reference's chrono stage timers, "
        "SURVEY.md §5.1)",
    )
    ap.add_argument("--checkpoint-out", default=None, help="save the final map state (npz)")
    ap.add_argument("--checkpoint-in", default=None, help="resume from a saved map state")
    ap.add_argument(
        "--vocabulary", default=None,
        help="trained DBoW2 text vocabulary (ORBvoc.txt); default: LSH bank",
    )
    ap.add_argument(
        "--viewer", action="store_true",
        help="spawn the live HTTP viewer (reference: Pangolin Viewer thread, "
        "src/System.cc:108-113)",
    )
    ap.add_argument("--viewer-port", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    try:
        # TPU only: CPU AOT cache entries can carry machine-feature flags,
        # and a cache write from a forced-multi-device CPU client can abort
        # the process (observed under the 8-device test mesh).
        if jax.default_backend() == "tpu":
            jax.config.update(
                "jax_compilation_cache_dir", "/root/repo/.jax_cache"
            )
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from .io import tum
    from .system import VOSystem

    system = VOSystem(
        settings_yaml=args.settings, use_local_ba=not args.no_ba,
        vocabulary_path=args.vocabulary,
        use_viewer=args.viewer, viewer_port=args.viewer_port,
    )
    factor = system.cfg.tracking.depth_map_factor

    frames = None
    if args.loader in ("auto", "native"):
        from . import native

        if native.native_available():
            frames = native.NativeSequenceLoader(
                args.sequence, args.association, factor,
                max_hw=(system.cfg.camera.height, system.cfg.camera.width),
            )
        elif args.loader == "native":
            raise SystemExit(f"native loader unavailable: {native.build_error()}")
    if frames is None:
        frames = tum.iterate_sequence(args.sequence, args.association, factor)

    if args.checkpoint_in:
        from .vomap.checkpoint import load_checkpoint

        load_checkpoint(args.checkpoint_in, system.tracker)

    profiling = False
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
        profiling = True

    n = 0
    t_start = time.perf_counter()
    try:
        for ts, gray, depth in frames:
            res = system.track_rgbd(gray, depth, ts)
            n += 1
            if n % 50 == 0:
                print(f"frame {n}: state={res.state.name} matches={res.n_matches}")
            if args.max_frames and n >= args.max_frames:
                break
    finally:
        if profiling:
            jax.profiler.stop_trace()
            print(f"profiler trace written to {args.profile_dir}")
    wall = time.perf_counter() - t_start

    system.shutdown()
    if args.checkpoint_out:
        from .vomap.checkpoint import save_checkpoint

        save_checkpoint(args.checkpoint_out, system.tracker)
    system.save_trajectory_tum(args.out)
    if args.kf_out:
        system.save_keyframe_trajectory_tum(args.kf_out)
    if args.ply:
        system.save_point_cloud_ply(args.ply)

    print(system.extract_times())
    print(f"processed {n} frames in {wall:.1f}s ({n / max(wall, 1e-9):.1f} fps)")
    print(f"trajectory saved to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
