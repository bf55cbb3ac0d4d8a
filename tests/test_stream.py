"""Live-stream ingest: approximate-time sync + socket driver.

(reference: Examples/ROS/ORB_SLAM2/src/ros_rgbd.cc — message_filters
ApproximateTime(10) synchronizer over the RGB/depth topics feeding
System::TrackRGBD, ros_rgbd.cc:66-75,112.)
"""
import socket
import threading

import numpy as np
import pytest

from hfvo_tpu.io.stream import (
    CH_DEPTH,
    CH_EOF,
    CH_RGB,
    ApproximateTimeSync,
    FrameStreamServer,
    send_frame,
)


def collect_sync(**kw):
    out = []
    sync = ApproximateTimeSync(
        lambda ts, a, b: out.append((ts, a, b)), **kw
    )
    return sync, out


def test_sync_in_order_identical_stamps():
    sync, out = collect_sync()
    for i in range(10):
        t = i / 30.0
        sync.push_rgb(t, np.array([i]))
        sync.push_depth(t, np.array([100 + i]))
    sync.flush()
    assert len(out) == 10
    for i, (ts, a, b) in enumerate(out):
        assert ts == pytest.approx(i / 30.0)
        assert a[0] == i and b[0] == 100 + i


def test_sync_jittered_stamps_pair_nearest():
    """Depth arrives ~5 ms late — each RGB pairs with its own depth, not a
    neighbor's (the ApproximateTime nearest-pairing property)."""
    sync, out = collect_sync()
    rng = np.random.default_rng(0)
    for i in range(12):
        t = i / 30.0
        sync.push_rgb(t, np.array([i]))
        sync.push_depth(t + 0.005 + rng.uniform(-2e-3, 2e-3), np.array([i]))
    sync.flush()
    assert len(out) == 12
    assert all(a[0] == b[0] for _, a, b in out)


def test_sync_dropped_depth_frame():
    """A missing depth frame drops its RGB (never mismatched to a
    neighbor's depth when the gap exceeds the natural spacing)."""
    sync, out = collect_sync(max_interval=0.016)
    for i in range(10):
        t = i / 30.0
        sync.push_rgb(t, np.array([i]))
        if i != 4:
            sync.push_depth(t + 0.001, np.array([i]))
    sync.flush()
    paired = [(a[0], b[0]) for _, a, b in out]
    assert (4, 4) not in paired and all(a == b for a, b in paired)
    assert len(out) == 9


def test_sync_out_of_order_within_channel():
    sync, out = collect_sync()
    order = [0, 2, 1, 3, 5, 4, 6, 7]
    for i in order:
        sync.push_rgb(i / 30.0, np.array([i]))
    for i in range(8):
        sync.push_depth(i / 30.0 + 0.002, np.array([i]))
    sync.flush()
    assert all(a[0] == b[0] for _, a, b in out)
    assert len(out) >= 6  # reordered heads may be dropped, the rest pair up
    ts = [t for t, _, _ in out]
    assert ts == sorted(ts)  # monotonic emission


def test_sync_queue_eviction_bounds_memory():
    sync, out = collect_sync(queue_size=4)
    for i in range(50):  # RGB only — no partner ever arrives
        sync.push_rgb(i / 30.0, np.array([i]))
    assert len(sync._q[0]) == 4 and sync.n_dropped == 46
    sync.push_depth(49 / 30.0, np.array([49]))
    sync.flush()
    assert [a[0] for _, a, _ in out] == [49]


def test_socket_roundtrip_and_eof():
    got = []
    server = FrameStreamServer(
        lambda ts, rgb, d: got.append((ts, rgb.shape, rgb.dtype, d.dtype))
    )
    sock = socket.create_connection(("127.0.0.1", server.port), timeout=10)
    rng = np.random.default_rng(1)
    for i in range(5):
        t = i / 30.0
        rgb = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        depth = rng.integers(0, 5000, (48, 64), dtype=np.uint16)
        send_frame(sock, CH_RGB, t, rgb)
        send_frame(sock, CH_DEPTH, t, depth)
    send_frame(sock, CH_EOF, 0.0, None)
    assert server.wait(timeout=20)
    sock.close()
    assert len(got) == 5
    ts, shape, rdt, ddt = got[0]
    assert shape == (48, 64, 3) and rdt == np.uint8 and ddt == np.uint16


def test_stream_cli_end_to_end(tmp_path):
    """Full driver: stream a synthetic sequence over a socket into
    stream_cli.main and check the saved keyframe trajectory (reference:
    node shutdown saves KeyFrameTrajectory.txt, ros_rgbd.cc:81-83)."""
    from hfvo_tpu import stream_cli
    from hfvo_tpu.testing import synthetic

    T_wc, grays, depths = synthetic.render_sequence(n=6, seed=2)
    kf_out = str(tmp_path / "kf.txt")
    out = str(tmp_path / "traj.txt")
    yaml = str(tmp_path / "settings.yaml")
    with open(yaml, "w") as f:
        f.write("%YAML:1.0\nDepthMapFactor: 1000.0\n")

    # Pre-pick a free port so the publisher knows where to connect.
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    rc = {}

    def run():
        rc["rc"] = stream_cli.main(
            [yaml, "--port", str(port), "--kf-out", kf_out, "--out", out,
             "--no-ba"]
        )

    th = threading.Thread(target=run, daemon=True)
    th.start()

    deadline = 120
    sock = None
    import time

    t0 = time.time()
    while time.time() - t0 < deadline:
        try:
            sock = socket.create_connection(("127.0.0.1", port), timeout=5)
            break
        except OSError:
            time.sleep(0.2)
    assert sock is not None, "driver never started listening"
    for i, (g, d) in enumerate(zip(grays, depths)):
        gu8 = np.clip(np.rint(g), 0, 255).astype(np.uint8)
        du16 = np.clip(d * 1000.0, 0, 65535).astype(np.uint16)
        send_frame(sock, CH_RGB, i / 30.0, gu8)
        send_frame(sock, CH_DEPTH, i / 30.0 + 0.002, du16)
    send_frame(sock, CH_EOF, 0.0, None)
    sock.close()
    th.join(timeout=300)
    assert not th.is_alive() and rc.get("rc") == 0
    kf = np.loadtxt(kf_out)
    traj = np.loadtxt(out)
    assert traj.shape == (6, 8)  # every frame tracked
    assert kf.ndim == 2 and kf.shape[1] == 8 and len(kf) >= 1
