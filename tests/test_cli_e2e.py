"""CLI end-to-end on a TUM-format on-disk sequence through the native
loader (reference protocol: Examples/RGB-D/rgbd_tum.cc + utils/EVO_APE.sh:
run the binary on a sequence dir + association file, evaluate the saved
trajectory)."""
import os

import numpy as np
import pytest
from PIL import Image

from hfvo_tpu import cli, native
from hfvo_tpu.io import evaluate, trajectory
from hfvo_tpu.testing import synthetic

N_FRAMES = 16

SETTINGS = """%YAML:1.0
Camera.fx: 535.4
Camera.fy: 539.2
Camera.cx: 320.1
Camera.cy: 247.6
Camera.width: 640
Camera.height: 480
Camera.fps: 30.0
Camera.bf: 40.0
DepthMapFactor: 5000.0
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


@pytest.fixture(scope="module")
def tum_sequence(tmp_path_factory):
    """Rendered synthetic sequence written as a real TUM-format dataset:
    rgb/ + 16-bit depth/ PNGs + association file + settings YAML."""
    d = tmp_path_factory.mktemp("tum_seq")
    os.makedirs(d / "rgb")
    os.makedirs(d / "depth")
    T_wc, grays, depths = synthetic.render_sequence(n=N_FRAMES, seed=11)
    lines = []
    for i in range(N_FRAMES):
        ts = i / 30.0
        g8 = np.clip(grays[i], 0, 255).astype(np.uint8)
        rgb = np.stack([g8, g8, g8], axis=-1)
        Image.fromarray(rgb).save(d / "rgb" / f"{ts:.6f}.png")
        d16 = np.clip(depths[i] * 5000.0, 0, 65535).astype(np.uint16)
        Image.fromarray(d16).save(d / "depth" / f"{ts:.6f}.png")
        lines.append(f"{ts:.6f} rgb/{ts:.6f}.png {ts:.6f} depth/{ts:.6f}.png")
    (d / "assoc.txt").write_text("\n".join(lines) + "\n")
    (d / "settings.yaml").write_text(SETTINGS)
    return str(d), T_wc


def test_cli_native_loader_end_to_end(tum_sequence, tmp_path):
    seq_dir, T_wc = tum_sequence
    if not native.native_available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")
    out = str(tmp_path / "traj.txt")
    kf_out = str(tmp_path / "kf.txt")
    rc = cli.main(
        [
            os.path.join(seq_dir, "settings.yaml"),
            seq_dir,
            os.path.join(seq_dir, "assoc.txt"),
            "--loader", "native",
            "--out", out,
            "--kf-out", kf_out,
        ]
    )
    assert rc == 0
    assert os.path.exists(out) and os.path.exists(kf_out)
    ts, T_est = trajectory.load_tum(out)
    assert len(ts) == N_FRAMES
    gt_ts = np.arange(N_FRAMES) / 30.0
    ape = evaluate.ate(gt_ts, T_wc, np.asarray(ts), np.asarray(T_est), align="origin")
    assert ape.rmse < 0.03, f"CLI end-to-end ATE {ape.rmse:.4f} m"
