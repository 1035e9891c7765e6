"""Component tests: k-means, color state, config hot-reload, UDP tracking +
clock sync, NV12 conversions, RTP packetizer, snapshot writer."""
import time

import numpy as np
import pytest
import yaml

from vision_processor_tpu.models.colors import ColorState
from vision_processor_tpu.models.kmeans import kmeans2


# -- kmeans -----------------------------------------------------------------


def test_kmeans_splits_clear_clusters():
    vals = [np.array(v) for v in [[10, 10, 10], [12, 9, 11], [200, 50, 60], [205, 52, 58]]]
    ok, c1, c2 = kmeans2(
        np.array([120, 120, 120]), vals, np.array([0, 0, 0]), np.array([255, 80, 80])
    )
    assert ok
    # c1 seeded dark, c2 seeded red-ish
    np.testing.assert_array_equal(c1, [11, 9, 10])
    np.testing.assert_array_equal(c2, [202, 51, 59])


def test_kmeans_refuses_tight_group():
    # contrast much closer than any in-group pair -> refuse
    vals = [np.array(v) for v in [[10, 10, 10], [200, 200, 200]]]
    ok, c1, c2 = kmeans2(
        np.array([11, 10, 10]), vals, np.array([0, 0, 0]), np.array([255, 255, 255])
    )
    assert not ok


def test_kmeans_needs_two_values():
    ok, *_ = kmeans2(np.zeros(3), [np.array([1, 2, 3])], np.zeros(3), np.ones(3))
    assert not ok


def test_kmeans_restores_on_degenerate():
    vals = [np.array([50, 50, 50])] * 3 + [np.array([52, 50, 50])]
    c1_in, c2_in = np.array([10, 10, 10]), np.array([90, 90, 90])
    ok, c1, c2 = kmeans2(np.array([200, 200, 200]), vals, c1_in, c2_in)
    # split of a near-uniform cluster must be rejected with originals returned
    assert not ok
    np.testing.assert_array_equal(c1, c1_in)
    np.testing.assert_array_equal(c2, c2_in)


# -- color state ------------------------------------------------------------


class _FakeBot:
    def __init__(self, bot_id, colors):
        self.bot_id = bot_id
        self.blob_colors = colors


class _FakeBall:
    def __init__(self, center):
        self.blob_center = np.asarray(center)
        self.blob_color = np.asarray(center)


def test_color_update_blend():
    state = ColorState(reference_force=0.0, history_force=0.0)
    # bot id 0 has pattern 0b0100: slot2 green, others pink
    bot = _FakeBot(
        0,
        [
            np.array([250, 200, 30]),  # center (yellowish)
            np.array([250, 10, 120]),  # pink slot
            np.array([10, 250, 130]),  # green slot
            np.array([240, 20, 110]),  # pink
            np.array([245, 15, 125]),  # pink
        ],
    )
    state.update([bot], [])
    np.testing.assert_array_equal(state.green, [10, 250, 130])
    np.testing.assert_array_equal(state.pink, (np.array([250, 10, 120]) + [240, 20, 110] + [245, 15, 125]) // 3)


def test_color_update_history_blend():
    state = ColorState(reference_force=0.0, history_force=0.5)
    old_pink = state.pink.copy()
    bot = _FakeBot(0, [None, np.array([100, 0, 100])] + [None] * 3)
    state.update([bot], [])
    expected = (0.5 * old_pink + 0.5 * np.array([100, 0, 100])).astype(int)
    np.testing.assert_array_equal(state.pink, expected)


def test_field_line_color_needs_three():
    state = ColorState()
    before = state.field_line.copy()
    state.update_field_line([np.array([9, 9, 9])] * 2)
    np.testing.assert_array_equal(state.field_line, before)
    state.update_field_line([np.array([9, 9, 9])] * 3)
    np.testing.assert_array_equal(state.field_line, [9, 9, 9])


# -- config -----------------------------------------------------------------


def test_config_defaults_and_load(tmp_path):
    from vision_processor_tpu.utils.config import VisionConfig

    path = tmp_path / "config.yml"
    path.write_text(
        yaml.dump(
            {
                "cam_id": 3,
                "thresholds": {"circularity": 25.0, "blobs": 500},
                "tracking": {"max_bot_acceleration": 5.0},
                "color": {"orange": [1, 2, 3]},
            }
        )
    )
    cfg = VisionConfig.load(path)
    assert cfg.cam_id == 3
    assert cfg.min_circularity == 25.0
    assert cfg.max_blobs == 500
    assert cfg.max_bot_acceleration == 5000.0
    np.testing.assert_array_equal(cfg.orange_reference, [1, 2, 3])
    # untouched defaults
    assert cfg.min_confidence == 0.2
    assert cfg.stream_url().endswith("224.5.23.103:10100")
    assert cfg.stream_bitrate_kbps == 0  # rate control off by default

    path.write_text(yaml.dump(
        {"cam_id": 3, "stream": {"qp": 20, "bitrate_kbps": 3500, "gop": 1}}))
    cfg = VisionConfig.load(path)
    assert cfg.stream_qp == 20
    assert cfg.stream_bitrate_kbps == 3500
    assert cfg.stream_gop == 1  # all-intra stream (UDP loss recovery)


def test_stream_gop_config_reaches_encoder(tmp_path, monkeypatch):
    """The stream: gop knob must configure the native encoder's IDR
    interval (env VPTPU_GOP still overrides, matching VPTPU_KBPS)."""
    import vision_processor_tpu.io.rtp as rtp

    captured = {}

    class FakeEncoder:
        def __init__(self, qp=None, gop=None, target_kbps=None,
                     framerate=30.0):
            captured["gop"] = gop
            self.framerate = framerate
            self.target_kbps = target_kbps

    import vision_processor_tpu.io.native as native

    monkeypatch.setattr(native, "H264Encoder", FakeEncoder)
    monkeypatch.delenv("VPTPU_GOP", raising=False)
    rtp.RTPStreamer(False, "rtp://224.99.0.1:10100", gop=5)
    assert captured["gop"] == 5
    # config default (0) falls back to 30
    rtp.RTPStreamer(False, "rtp://224.99.0.1:10100", gop=0)
    assert captured["gop"] == 30
    # env override wins, like VPTPU_KBPS over bitrate_kbps
    monkeypatch.setenv("VPTPU_GOP", "7")
    rtp.RTPStreamer(False, "rtp://224.99.0.1:10100", gop=5)
    assert captured["gop"] == 7


def test_config_hot_reload(tmp_path):
    from vision_processor_tpu.utils.config import VisionConfig

    path = tmp_path / "config.yml"
    path.write_text(yaml.dump({"thresholds": {"circularity": 10.0}}))
    cfg = VisionConfig.load(path)
    assert cfg.min_circularity == 10.0

    path.write_text(yaml.dump({"thresholds": {"circularity": 33.0}}))
    cfg._last_check = 0.0  # bypass the 0.5 s poll interval
    assert cfg.reload_if_changed()
    assert cfg.min_circularity == 33.0

    # malformed yaml keeps previous values
    path.write_text("thresholds: [unclosed")
    cfg._last_check = 0.0
    cfg._mtime = 0
    assert not cfg.reload_if_changed()
    assert cfg.min_circularity == 33.0


def test_config_invalid_cam_id(tmp_path):
    from vision_processor_tpu.utils.config import VisionConfig

    path = tmp_path / "config.yml"
    path.write_text(yaml.dump({"cam_id": 9}))
    with pytest.raises(ValueError):
        VisionConfig.load(path)


# -- UDP sockets ------------------------------------------------------------


def test_vision_socket_tracking_and_clock():
    from vision_processor_tpu.net.udp import VisionSocket
    from vision_processor_tpu.proto import SSL_WrapperPacket

    recv = VisionSocket("224.99.99.21", 17373, cam_id=1, default_bot_height=145.0)
    send = VisionSocket("224.99.99.21", 17373, cam_id=0, default_bot_height=145.0)
    try:
        for i, (x, y) in enumerate([(100.0, 200.0), (160.0, 280.0)]):
            wrapper = SSL_WrapperPacket()
            det = wrapper.detection
            det.frame_number = i + 1
            det.t_capture = 10.0 + i * 0.1
            det.t_sent = 10.0 + i * 0.1
            det.camera_id = 0
            bot = det.robots_yellow.add()
            bot.confidence = 0.9
            bot.robot_id = 4
            bot.x, bot.y = x, y
            bot.orientation = 0.5
            bot.pixel_x = bot.pixel_y = 0.0
            ball = det.balls.add()
            ball.confidence = 0.8
            ball.x, ball.y = -500.0 - 50 * i, 0.0
            ball.pixel_x = ball.pixel_y = 0.0
            send.send(wrapper)
            time.sleep(0.15)

        tracked = recv.get_tracked_objects()
        assert 0 in tracked
        objs = {t.id: t for t in tracked[0]}
        assert 4 in objs and -1 in objs
        bot = objs[4]
        assert bot.x == pytest.approx(160.0)
        # finite-difference velocity: 60mm / 0.1s = 600 mm/s
        assert bot.vx == pytest.approx(600.0, rel=1e-3)
        assert bot.age == 2
        ball = objs[-1]
        assert ball.vx == pytest.approx(-500.0, rel=1e-3)

        offsets = recv.get_received_offsets()
        assert len(offsets) >= 1  # sender cam 0 recorded
    finally:
        recv.close()
        send.close()


def test_geometry_adoption_via_socket(divb_field):
    from vision_processor_tpu.net.udp import VisionSocket

    recv = VisionSocket("224.99.99.22", 17474, cam_id=0, default_bot_height=145.0)
    send = VisionSocket("224.99.99.22", 17474, cam_id=1, default_bot_height=145.0)
    try:
        send.send(divb_field)
        time.sleep(0.2)
        assert recv.geometry_version == 0
        recv.geometry_check()
        assert recv.geometry_version == 1
        assert recv.geometry.field.field_length == 9000
        # same geometry again: no version bump
        recv.geometry_check()
        assert recv.geometry_version == 1
    finally:
        recv.close()
        send.close()


# -- NV12 -------------------------------------------------------------------


def test_nv12_roundtrip():
    from vision_processor_tpu.ops.nv12 import nv12_to_rgb, rgb_to_nv12

    # smooth gradient: 4:2:0 chroma subsampling stays accurate
    gx, gy = np.meshgrid(np.linspace(40, 200, 48), np.linspace(60, 180, 32))
    rgb = np.stack([gx, gy, (gx + gy) / 2], axis=-1).astype(np.float32)
    nv12 = np.asarray(rgb_to_nv12(rgb))
    assert nv12.shape == (48, 48)
    back = nv12_to_rgb(nv12, 48, 32)
    assert np.abs(back - rgb).mean() < 4


def test_f32_nv12():
    from vision_processor_tpu.ops.nv12 import f32_to_nv12

    img = np.zeros((16, 16), dtype=np.float32)
    img[4, 4] = 100.0
    nv12 = np.asarray(f32_to_nv12(img))
    assert nv12[4, 4] == 227
    assert nv12[0, 0] == 127


# -- RTP packetizer ---------------------------------------------------------


def test_rtp_jpeg_stream_smoke():
    import socket as pysocket

    from vision_processor_tpu.io.rtp import RTPStreamer

    recv = pysocket.socket(pysocket.AF_INET, pysocket.SOCK_DGRAM)
    recv.setsockopt(pysocket.SOL_SOCKET, pysocket.SO_REUSEADDR, 1)
    recv.bind(("127.0.0.1", 19999))
    recv.settimeout(2.0)

    # force the JPEG fallback path; the default cascade now picks the
    # native H.264 encoder (covered by tests/test_h264.py)
    streamer = RTPStreamer(
        True, "rtp://127.0.0.1:19999", framerate=30.0, codec="jpeg"
    )
    try:
        frame = np.zeros((64, 96, 3), dtype=np.uint8)
        frame[:, :48] = [255, 0, 0]
        streamer.send_frame(frame)
        packet = recv.recv(2048)
        # RTP header: version 2, payload type 26 (JPEG)
        assert packet[0] >> 6 == 2
        assert packet[1] & 0x7F == 26
        # JPEG payload header: first fragment offset 0
        assert packet[13:16] == b"\x00\x00\x00"
    finally:
        streamer.close()
        recv.close()


# -- snapshot writer --------------------------------------------------------


def test_snapshot_writer(tmp_path):
    from vision_processor_tpu.io.snapshot import SnapshotWriter

    writer = SnapshotWriter()
    img = np.full((16, 16, 3), 128, dtype=np.uint8)
    out = tmp_path / "img" / "0.raw.jpg"
    writer.offer(img, str(out))
    deadline = time.time() + 3.0
    while not out.exists() and time.time() < deadline:
        time.sleep(0.05)
    writer.close()
    assert out.exists()
    assert out.read_bytes()[:2] == b"\xff\xd8"


def test_processor_apply_tunables():
    from vision_processor_tpu.app.processor import Processor
    from vision_processor_tpu.utils.config import VisionConfig

    cfg = VisionConfig()
    proc = Processor(cfg)
    cfg.orange_reference = np.array([11, 22, 33])
    cfg.reference_force = 0.25
    proc.apply_tunables()
    np.testing.assert_array_equal(proc.colors.orange_ref, [11, 22, 33])
    assert proc.colors.reference_force == 0.25


def test_vision_socket_survives_malformed_packets(divb_field):
    """The receiver thread must outlive garbage datagrams (reference
    udpsocket.cpp's parser is similarly fire-and-forget): a malformed
    packet is logged and dropped, and the next valid geometry packet is
    still absorbed."""
    import time as _time

    from vision_processor_tpu.net.udp import UDPSocket, VisionSocket

    group, port = "224.99.99.61", 18061
    rx = VisionSocket(group, port, 0, 150.0)
    tx = UDPSocket.__new__(UDPSocket)  # bare sender on the same group
    UDPSocket.__init__(tx, group, port)
    try:
        for payload in (b"\x00", b"not-a-proto" * 50, b"\xff" * 2048):
            tx.sock.sendto(payload, (group, port))
        _time.sleep(0.3)
        assert rx.geometry_version == 0

        wrapper_bytes = None
        from vision_processor_tpu.proto import SSL_WrapperPacket

        wrapper = SSL_WrapperPacket()
        wrapper.geometry.CopyFrom(divb_field.geometry)
        wrapper_bytes = wrapper.SerializeToString()
        tx.sock.sendto(wrapper_bytes, (group, port))
        deadline = _time.time() + 3.0
        while _time.time() < deadline:
            rx.geometry_check()
            if rx.geometry_version:
                break
            _time.sleep(0.05)
        assert rx.geometry_version == 1, (
            "receiver thread died on malformed input"
        )
    finally:
        rx.close()
        tx.close()
