"""Codec-roundtrip validation (VERDICT r2 item 9): the input pixels cross
a real codec boundary before detection. Frames are rendered, ENCODED to an
on-disk H.264 stream with the native CAVLC tier, DECODED back with the
stock decoder (cv2/ffmpeg), re-mosaiced to Bayer and fed through the FULL
production App loop — a renderer-independent transform of every pixel
(quantization, chroma subsampling, two colorspace conversions). The
detections on the multicast wire must still be correct.

This is the sandbox's closest analogue to running the harness on real
recorded footage (no camera, no egress here): the pixel statistics have
been laundered through an independent codec implementation, so any
accidental coupling between the renderer and the detector's thresholds
would surface as recall loss.
"""
import threading
import time

import numpy as np
import pytest
import yaml

cv2 = pytest.importorskip("cv2")


def _roundtrip_rgb(rgb_frames, qp, path):
    """Encode RGB frames to an annex-B file with the native CAVLC tier,
    decode with cv2's ffmpeg, return the decoded RGB frames."""
    from vision_processor_tpu.io.native import H264Encoder

    try:
        enc = H264Encoder(qp=qp)
    except RuntimeError:
        pytest.skip("native library unavailable")

    h, w = rgb_frames[0].shape[:2]
    with open(path, "wb") as fh:
        for rgb in rgb_frames:
            fh.write(enc.encode_rgb(rgb))

    cap = cv2.VideoCapture(str(path))
    out = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        out.append(f[:h, :w, ::-1].copy())  # BGR -> RGB, unpad
    cap.release()
    assert len(out) == len(rgb_frames), (
        f"decoded {len(out)}/{len(rgb_frames)} frames"
    )
    return out


def test_codec_roundtrip_detection(tmp_path, divb_field, overhead_model):
    from vision_processor_tpu.app.main import App
    from vision_processor_tpu.io.camera import (
        CameraDriver, RawFrame, register_driver,
    )
    from vision_processor_tpu.io.synthetic import (
        Scene, SceneBall, SceneBot, render_rgb, rgb_to_bayer,
    )
    from vision_processor_tpu.net.udp import UDPSocket
    from vision_processor_tpu.proto import SSL_WrapperPacket

    group, port = "224.99.99.61", 18161
    field = divb_field.geometry.field
    scene = Scene(
        bots=[SceneBot(5, "yellow", -2600.0, 400.0, 1.1),
              SceneBot(2, "blue", -1800.0, -300.0, -0.4)],
        balls=[SceneBall(-3200.0, -1100.0)],
        noise_sigma=1.5,
    )

    # render 4 frames, push them through the real on-disk codec stream
    rgb_frames = [render_rgb(overhead_model, field, scene) for _ in range(4)]
    decoded = _roundtrip_rgb(rgb_frames, 24, str(tmp_path / "run.h264"))
    # sanity: the codec really changed the pixels (not a no-op path)
    delta = np.abs(decoded[0].astype(int) - rgb_frames[0].astype(int))
    assert delta.max() > 0 and delta.mean() > 0.1, "codec was a no-op?"

    class CodecDriver(CameraDriver):
        def __init__(self):
            self._idx = 0

        @property
        def fmt(self):
            return "RGGB"

        def expected_frametime(self):
            return 1.0 / 100.0

        def get_time(self):
            return self._idx / 100.0

        def read_image(self):
            if self._idx >= len(decoded):
                return None
            raw = rgb_to_bayer(decoded[self._idx], "RGGB")
            self._idx += 1
            w, h = int(overhead_model.size[0]), int(overhead_model.size[1])
            return RawFrame(data=raw, fmt="RGGB", width=w, height=h)

    register_driver("CODEC_RT", lambda cam_cfg: CodecDriver())

    config = {
        "cam_id": 0,
        "bot_heights_file": str(tmp_path / "heights.yml"),
        "camera": {"driver": "CODEC_RT"},
        "network": {"vision_ip": group, "vision_port": port,
                    "gc_ip": "224.99.99.62", "gc_port": 18162},
        "stream": {"active": False},
        "debug": {"wait_for_geometry": True},
        "thresholds": {"blobs": 128},
    }
    cfg_path = tmp_path / "config.yml"
    cfg_path.write_text(yaml.dump(config))
    (tmp_path / "heights.yml").write_text(
        yaml.dump({"TeamA": 143.0, "TeamB": 147.0}))

    geometry = divb_field
    geometry.geometry.ClearField("calib")
    geometry.geometry.calib.append(overhead_model.to_proto(0))

    sender = type("S", (UDPSocket,), {"_parse": lambda self, d: None})(
        group, port)
    stop = threading.Event()

    def publish():
        while not stop.is_set():
            sender.send(geometry)
            time.sleep(0.05)

    thread = threading.Thread(target=publish, daemon=True)
    thread.start()

    received = []

    class Recorder(UDPSocket):
        def _parse(self, data):
            wrapper = SSL_WrapperPacket()
            wrapper.ParseFromString(data)
            if wrapper.HasField("detection"):
                received.append(wrapper.detection)

    recorder = Recorder(group, port)
    try:
        app = App(str(cfg_path))
        app.run()
        time.sleep(0.3)
    finally:
        stop.set()
        thread.join()
        recorder.close()
        sender.close()

    assert len(received) == 4, f"got {len(received)} detection frames"
    last = received[-1]
    assert len(last.robots_yellow) == 1
    assert len(last.robots_blue) == 1
    by, bb = last.robots_yellow[0], last.robots_blue[0]
    # codec quantization may cost a little position accuracy; the bars
    # match the perturbation suite's light profile
    assert by.robot_id == 5 and abs(by.x - -2600.0) < 30 and abs(by.y - 400.0) < 30
    assert bb.robot_id == 2 and abs(bb.x - -1800.0) < 30 and abs(bb.y - -300.0) < 30
    assert len(last.balls) == 1 and abs(last.balls[0].x - -3200.0) < 40
