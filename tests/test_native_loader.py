import os

import numpy as np
import pytest
from PIL import Image

from hfvo_tpu import native
from hfvo_tpu.io import tum


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Tiny TUM-format dataset on disk: 8-bit RGB + 16-bit depth PNGs."""
    d = tmp_path_factory.mktemp("seq")
    os.makedirs(d / "rgb")
    os.makedirs(d / "depth")
    rng = np.random.default_rng(0)
    lines = []
    frames = []
    for i in range(4):
        ts = i / 30.0
        rgb = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
        depth_m = rng.uniform(0.5, 4.0, (120, 160)).astype(np.float32)
        Image.fromarray(rgb).save(d / "rgb" / f"{ts:.6f}.png")
        Image.fromarray((depth_m * 5000).astype(np.uint16)).save(
            d / "depth" / f"{ts:.6f}.png"
        )
        lines.append(f"{ts:.6f} rgb/{ts:.6f}.png {ts:.6f} depth/{ts:.6f}.png")
        frames.append((ts, rgb, depth_m))
    (d / "assoc.txt").write_text("\n".join(lines) + "\n")
    return str(d), frames


def test_native_loader_builds():
    assert native.native_available(), native.build_error()


def test_native_matches_python_loader(dataset):
    seq_dir, frames = dataset
    if not native.native_available():
        pytest.skip("native loader unavailable")
    nl = native.NativeSequenceLoader(
        seq_dir, os.path.join(seq_dir, "assoc.txt"), 5000.0, max_hw=(120, 160)
    )
    assert len(nl) == 4
    got = list(nl)
    nl.close()
    assert len(got) == 4
    py = list(
        tum.iterate_sequence(seq_dir, os.path.join(seq_dir, "assoc.txt"), 5000.0)
    )
    for (ts_n, g_n, d_n), (ts_p, g_p, d_p), (ts_gt, rgb, dep) in zip(got, py, frames):
        assert abs(ts_n - ts_gt) < 1e-6
        # Depth decodes identically (both divide the same uint16 by 5000).
        np.testing.assert_allclose(d_n, d_p, atol=1e-6)
        # Gray conversions use the same BT.601 weights (PIL rounds; allow 1).
        assert np.abs(g_n - g_p).max() <= 1.0
        assert abs(float(np.mean(g_n)) - float(np.mean(g_p))) < 0.2


def test_native_loader_missing_assoc(tmp_path):
    if not native.native_available():
        pytest.skip("native loader unavailable")
    with pytest.raises(RuntimeError):
        native.NativeSequenceLoader(str(tmp_path), str(tmp_path / "nope.txt"))
