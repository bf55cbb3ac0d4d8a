"""Accuracy benchmark: the evo protocol on the rendered benchmark suite.

No TUM/ICL data is fetchable in this environment (zero egress; the
reference snapshot ships association files but no images), so this runs
the reference's acceptance protocol — ATE RMSE via origin-aligned APE,
`/root/reference/utils/EVO_APE.sh:2` `evo_ape tum <gt> <traj> -p
--align_origin` — on high-fidelity rendered analogs of the four
BASELINE.json benchmark configurations:

  1. textured+structured scene, points-only tracking, pose-only LM
     (the "fr3_structure_texture_far, PR1" row);
  2. textured UNstructured scene (slanted quads + spheres, no usable
     Manhattan structure), ORB+lines, point-line local BA
     (the "fr3_nostructure_texture" row);
  3. low-texture structured scene, full point+line+plane hybrid with
     Manhattan constraints (the "fr3_structure_notexture" row — the
     reference's headline regime);
  4. plane-heavy full orbit with loop closing + global BA
     (the "ICL-NUIM living room" row).

Sensor model on every sequence: uint8 gray quantization + Kinect-style
depth corruption (quadratic-in-z axial noise at the published Kinect
magnitude — Nguyen/Izadi/Lovell 2012, ~1.8 cm at z=3 m — plus elliptical
dropout holes, `testing/synthetic.corrupt_depth`) + uint16 millimeter
depth quantization — the disk format the reference consumes
(rgbd_tum.cc:144).

Usage: python accuracy_bench.py [--frames N] [--out results.md]
Prints a markdown table; the committed numbers live in BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _sensorize(gray, depth, rng, noisy=True):
    g = np.clip(np.rint(np.asarray(gray)), 0, 255).astype(np.uint8)
    d = np.asarray(depth)
    if noisy:
        from hfvo_tpu.testing.synthetic import corrupt_depth

        # quad_sigma = 0.002: the published Kinect axial noise model
        # (Nguyen/Izadi/Lovell 2012: sigma_z = 0.0012 + 0.0019 (z-0.4)^2 m,
        # ~1.4 cm at z=3 m). The corrupt_depth default (0.01 z^2) is a ~6x
        # harsher stress model used by the adversarial robustness tests;
        # this benchmark models the real sensor.
        d = corrupt_depth(d, rng, quad_sigma=0.002)
    d = np.clip(d * 1000.0, 0, 65535).astype(np.uint16)
    return g, d


def run_sequence(cfg, scene, T_wc, use_local_ba, use_loop_closing, noisy=True,
                 seed=0, drift_win: int = 0):
    import jax.numpy as jnp

    from hfvo_tpu.io import evaluate
    from hfvo_tpu.testing import synthetic
    from hfvo_tpu.tracking.tracker import Tracker, TrackState

    rng = np.random.default_rng(seed)
    tr = Tracker(cfg, use_local_ba=use_local_ba,
                 use_loop_closing=use_loop_closing)
    n_lost = 0
    t0 = time.perf_counter()
    for i in range(len(T_wc)):
        g, d = synthetic.render_jit(scene, cfg.camera, jnp.asarray(T_wc[i]))
        g, d = _sensorize(np.asarray(g), np.asarray(d), rng, noisy)
        res = tr.track_rgbd(g, d, T_cw_init=np.linalg.inv(T_wc[0]))
        if res.state is not TrackState.OK:
            n_lost += 1
    wall = time.perf_counter() - t0
    est = tr.get_trajectory()
    n = len(est)
    ts = np.arange(n) / 30.0
    ape = evaluate.ate(ts, T_wc[:n], ts, est, align="origin")
    out = dict(ate_rmse=float(ape.rmse), n_frames=n, n_lost=n_lost,
               wall_s=wall, n_kf_total=int(tr.vomap.kf_order_counter),
               n_kf_live=int(tr.vomap.n_keyframes()))
    if drift_win:
        # Per-window drift: origin-align each `drift_win`-frame window
        # independently — the ATE accumulated WITHIN the window, i.e. the
        # local drift rate, independent of earlier trajectory error.
        drift = []
        for s in range(0, n - drift_win + 1, drift_win):
            e = slice(s, s + drift_win)
            w_ape = evaluate.ate(ts[e], T_wc[:n][e], ts[e], est[e],
                                 align="origin")
            drift.append(round(float(w_ape.rmse), 4))
        out["drift_per_window"] = drift
    return out


def run_endurance(frames: int = 300):
    """300+-frame FULL-stack endurance (VERDICT r4 #3): multi-orbit revisit
    paths exercising KF churn, culling, slot recycling and repeated loop
    closures, on both the textured and the low-texture (headline-regime)
    room. Reports total ATE + per-100-frame drift windows."""
    from hfvo_tpu.config import tum3_config
    from hfvo_tpu.testing import synthetic

    cfg = tum3_config()
    # step 2pi/100: `frames`/100 full orbits -> constant revisits.
    T_wc = synthetic.orbit_trajectory(frames, step=2 * np.pi / 100.0)
    rows = []
    for name, scene in (
        ("textured orbit", synthetic.make_room(0, stripes=True)),
        ("low-texture orbit", synthetic.make_room(0, low_texture=True)),
    ):
        r = run_sequence(cfg, scene, T_wc, use_local_ba=True,
                         use_loop_closing=True, drift_win=100)
        rows.append((f"endurance {frames}f full hybrid + loop: {name}", r))
    return rows


def run_ablation(frames: int = 40):
    """Error budget of the headline str_notex number (VERDICT r4 #4): one
    knob off at a time from the full-hybrid operating point."""
    from hfvo_tpu.config import tum3_config
    from hfvo_tpu.testing import synthetic

    cfg = tum3_config()
    T_wc = synthetic.orbit_trajectory(frames)
    lowtex = synthetic.make_room(0, low_texture=True)
    variants = [
        ("full hybrid (headline op point)", cfg, True, False, True),
        ("noise-free sensors", cfg, True, False, False),
        ("lines OFF", cfg.replace(use_lines=False), True, False, True),
        ("planes OFF", cfg.replace(use_planes=False), True, False, True),
        ("Manhattan OFF", cfg.replace(use_manhattan=False), True, False, True),
        ("loop closing ON", cfg, True, True, True),
        ("local BA OFF", cfg, False, False, True),
    ]
    rows = []
    for name, c, ba, loop, noisy in variants:
        r = run_sequence(c, lowtex, T_wc, use_local_ba=ba,
                         use_loop_closing=loop, noisy=noisy)
        rows.append((f"str_notex ablation: {name}", r))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default (TPU) backend; default forces "
                    "CPU — every config compiles its own program variant "
                    "and first compiles over a remote-compile tunnel cost "
                    "10+ minutes each")
    ap.add_argument("--json", action="store_true",
                    help="print one JSON line instead of markdown")
    ap.add_argument("--endurance", action="store_true",
                    help="300-frame full-stack endurance + drift windows")
    ap.add_argument("--ablate", action="store_true",
                    help="error-budget ablation of the str_notex headline")
    args = ap.parse_args()

    if not args.tpu:
        # The harness may pin another platform via sitecustomize; env vars
        # alone don't stick (see tests/conftest.py).
        import jax

        jax.config.update("jax_platforms", "cpu")

    from hfvo_tpu.config import tum3_config
    from hfvo_tpu.testing import synthetic

    if args.endurance or args.ablate:
        rows = []
        if args.endurance:
            rows += run_endurance(max(args.frames, 300))
        if args.ablate:
            rows += run_ablation(min(args.frames, 40))
        if args.json:
            print(json.dumps({name: r for name, r in rows}))
        else:
            print("| Config | frames | ATE RMSE (m) | lost | "
                  "drift/100f (m) |")
            print("|---|---|---|---|---|")
            for name, r in rows:
                drift = r.get("drift_per_window")
                ds = " / ".join(f"{d:.3f}" for d in drift) if drift else "—"
                print(f"| {name} | {r['n_frames']} | {r['ate_rmse']:.4f} | "
                      f"{r['n_lost']} | {ds} |")
        return

    n = args.frames
    cfg = tum3_config()
    T_wc = synthetic.orbit_trajectory(n)

    textured = synthetic.make_room(0, stripes=True)
    lowtex = synthetic.make_room(0, low_texture=True)
    # Unstructured: slanted quads + spheres break Manhattan regularity.
    unstruct = synthetic.make_adversarial_room(0, n_slanted=2, n_spheres=3)

    rows = []

    # 1. PR1 analog: points-only, pose-only LM (no BA).
    c1 = cfg.replace(use_lines=False, use_planes=False, use_manhattan=False)
    rows.append(("str_tex_far analog: points-only, pose-only LM",
                 run_sequence(c1, textured, T_wc, False, False)))

    # 2. nostructure_texture analog: points+lines, point-line local BA.
    c2 = cfg.replace(use_planes=False, use_manhattan=False)
    rows.append(("nstr_tex analog: ORB+lines, point-line local BA",
                 run_sequence(c2, unstruct, T_wc, True, False)))

    # 3. structure_notexture analog: full hybrid + Manhattan (headline).
    rows.append(("str_notex analog: full hybrid + Manhattan",
                 run_sequence(cfg, lowtex, T_wc, True, False)))
    # 3b. the ablation the reference's paper positions itself against.
    rows.append(("str_notex analog: points-only (ablation)",
                 run_sequence(c1, lowtex, T_wc, True, False)))

    # 4. ICL analog: plane-heavy full orbit with loop closing + GBA.
    T_orbit = synthetic.orbit_trajectory(max(n, 60))
    rows.append(("ICL analog: full hybrid + loop closing, full orbit",
                 run_sequence(cfg, textured, T_orbit, True, True)))

    if args.json:
        print(json.dumps({name: r for name, r in rows}))
        return
    print("| Config (rendered analog) | frames | ATE RMSE (m) | lost |")
    print("|---|---|---|---|")
    for name, r in rows:
        print(f"| {name} | {r['n_frames']} | {r['ate_rmse']:.4f} | "
              f"{r['n_lost']} |")


if __name__ == "__main__":
    main()
