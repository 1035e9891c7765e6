"""Full lifecycle in one App run: geometry without calibration arrives ->
frame 1 auto-calibrates and broadcasts the camera model -> the multicast
loopback delivers it back -> subsequent frames run the detection path."""
import threading
import time

import numpy as np
import pytest
import yaml


def test_calibrate_then_detect(tmp_path, divb_field, overhead_model):
    from vision_processor_tpu.app.main import App
    from vision_processor_tpu.io.camera import SyntheticDriver, register_driver
    from vision_processor_tpu.io.synthetic import Scene, SceneBot
    from vision_processor_tpu.models.camera import (
        visible_field_extent_estimation,
    )
    from vision_processor_tpu.net.udp import UDPSocket
    from vision_processor_tpu.proto import SSL_WrapperPacket

    group, port = "224.99.99.71", 18081
    field = divb_field.geometry.field

    # line corners for the corner calibration, from the true model
    lo, hi = visible_field_extent_estimation(0, 4, field, False)
    corners = [
        [lo[0], lo[1]], [lo[0], hi[1]], [hi[0], hi[1]], [hi[0], lo[1]],
    ]
    corner_px = [
        [float(v) for v in overhead_model.field2image(np.array([c[0], c[1], 0.0]))]
        for c in corners
    ]

    config = {
        "cam_id": 0,
        "bot_heights_file": str(tmp_path / "none.yml"),
        "camera": {"driver": "SYNTHETIC"},
        "geometry": {
            "camera_amount": 4,
            "camera_height": float(overhead_model.pos[2]),
            "line_corners": corner_px,
        },
        "network": {
            "vision_ip": group, "vision_port": port,
            "gc_ip": "224.99.99.72", "gc_port": 18082,
        },
        "stream": {"active": False},
        "debug": {"wait_for_geometry": True},
        "thresholds": {"blobs": 128},
    }
    cfg_path = tmp_path / "config.yml"
    cfg_path.write_text(yaml.dump(config))

    scene = Scene(
        bots=[SceneBot(6, "yellow", -2700.0, 300.0, 0.9)],
        balls=[],
        noise_sigma=1.0,
    )
    register_driver(
        "SYNTHETIC",
        lambda cam_cfg: SyntheticDriver(
            overhead_model, field, scene, fmt="RGGB", fps=100.0, frames=5,
        ),
    )

    # publisher starts with geometry WITHOUT calibration and absorbs the
    # processor's calibration broadcasts, like geom_publisher.py
    bare = SSL_WrapperPacket()
    bare.geometry.field.CopyFrom(field)

    class Sender(UDPSocket):
        def _parse(self, data):
            wrapper = SSL_WrapperPacket()
            wrapper.ParseFromString(data)
            if wrapper.HasField("geometry"):
                for calib in wrapper.geometry.calib:
                    for mine in bare.geometry.calib:
                        if mine.camera_id == calib.camera_id:
                            mine.CopyFrom(calib)
                            break
                    else:
                        bare.geometry.calib.append(calib)

    sender = Sender(group, port)
    stop = threading.Event()

    def publish():
        while not stop.is_set():
            sender.send(bare)
            time.sleep(0.05)

    thread = threading.Thread(target=publish, daemon=True)
    thread.start()

    received_detections = []
    received_calibs = []

    class Recorder(UDPSocket):
        def _parse(self, data):
            wrapper = SSL_WrapperPacket()
            wrapper.ParseFromString(data)
            if wrapper.HasField("detection"):
                received_detections.append(wrapper.detection)
            if wrapper.HasField("geometry") and len(wrapper.geometry.calib):
                received_calibs.append(wrapper.geometry.calib[0])

    recorder = Recorder(group, port)
    import os

    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)  # calibration diagnostics land in tmp img/
        app = App(str(cfg_path))
        app.run()
        time.sleep(0.3)
    finally:
        os.chdir(cwd)
        stop.set()
        thread.join()
        sender.close()
        recorder.close()

    # the processor broadcast its own calibration...
    assert received_calibs, "no calibration broadcast"
    calib = received_calibs[0]
    assert calib.camera_id == 0
    # ...with a model close to the true camera
    from vision_processor_tpu.models.camera import CameraModel

    fitted = CameraModel.from_proto(calib)
    pts = np.array([[-3000.0, 0.0, 0.0], [-2000.0, 1000.0, 0.0]])
    err = np.linalg.norm(
        fitted.field2image(pts) - overhead_model.field2image(pts), axis=-1
    )
    assert np.max(err) < 5.0, err

    # ...and detected the robot on the remaining frames
    assert received_detections, "no detections after calibration"
    last = received_detections[-1]
    assert len(last.robots_yellow) == 1
    assert last.robots_yellow[0].robot_id == 6
    assert abs(last.robots_yellow[0].x - -2700.0) < 40
