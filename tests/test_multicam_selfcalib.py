"""MultiCamApp self-calibration: geometry WITHOUT camera calibrations
arrives -> the batched app bootstraps every camera through the
single-camera auto-calibration path (instead of stalling) -> the broadcast
calibs loop back -> the batched detection pipeline compiles and emits
detections for both cameras (reference src/main.cpp:404-406 behavior in
the per-process loop, reproduced for the one-chip fleet)."""
import os
import threading
import time

import numpy as np
import pytest
import yaml


def test_multicam_app_self_calibrates(tmp_path, divb_field):
    from vision_processor_tpu.app.multicam_app import MultiCamApp
    from vision_processor_tpu.io.camera import SyntheticDriver, register_driver
    from vision_processor_tpu.io.synthetic import Scene, SceneBot
    from vision_processor_tpu.models.camera import (
        CameraModel,
        visible_field_extent_estimation,
    )
    from vision_processor_tpu.net.udp import UDPSocket
    from vision_processor_tpu.proto import SSL_WrapperPacket

    group, port = "224.99.99.73", 18281
    field = divb_field.geometry.field
    n_cams = 2

    models, corner_px = [], []
    for cam_id in range(n_cams):
        lo, hi = visible_field_extent_estimation(cam_id, n_cams, field, False)
        center = (lo + hi) / 2
        model = CameraModel(
            focal_length=900.0,
            principal_point=np.array([480.0, 270.0]),
            distortion_k2=0.0,
            pos=np.array([center[0], center[1], 4500.0]),
            size=np.array([960, 540]),
        )
        models.append(model)
        corners = [
            [lo[0], lo[1]], [lo[0], hi[1]], [hi[0], hi[1]], [hi[0], lo[1]],
        ]
        corner_px.append([
            [float(v) for v in model.field2image(np.array([c[0], c[1], 0.0]))]
            for c in corners
        ])

    scenes = [
        Scene(bots=[SceneBot(4, "yellow", float(models[0].pos[0]),
                             float(models[0].pos[1]), 0.4)],
              balls=[], noise_sigma=1.0),
        Scene(bots=[SceneBot(11, "blue", float(models[1].pos[0]),
                             float(models[1].pos[1]), -0.8)],
              balls=[], noise_sigma=1.0),
    ]

    def factory(cam_cfg):
        c = int(cam_cfg.path or 0)
        return SyntheticDriver(
            models[c], field, scenes[c], fmt="RGGB", fps=100.0, frames=6,
        )

    register_driver("SYNTHETIC_MC", factory)

    cfg_paths = []
    for cam_id in range(n_cams):
        config = {
            "cam_id": cam_id,
            "bot_heights_file": str(tmp_path / "none.yml"),
            "camera": {"driver": "SYNTHETIC_MC", "path": str(cam_id)},
            "geometry": {
                "camera_amount": n_cams,
                "camera_height": 4500.0,
                "line_corners": corner_px[cam_id],
            },
            "network": {
                "vision_ip": group, "vision_port": port,
                "gc_ip": "224.99.99.74", "gc_port": 18282,
            },
            "stream": {"active": False},
            "debug": {"wait_for_geometry": True},
            "thresholds": {"blobs": 128},
        }
        p = tmp_path / f"config{cam_id}.yml"
        p.write_text(yaml.dump(config))
        cfg_paths.append(str(p))

    # geometry WITHOUT calib: the app must self-calibrate both cameras
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
                received_calibs.extend(wrapper.geometry.calib)

    recorder = Recorder(group, port)
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)  # calibration diagnostics land in tmp img/
        app = MultiCamApp(cfg_paths)
        app.run()
        time.sleep(0.3)
    finally:
        os.chdir(cwd)
        stop.set()
        thread.join()
        sender.close()
        recorder.close()

    # both cameras broadcast their own calibration...
    calib_cams = {c.camera_id for c in received_calibs}
    assert calib_cams == {0, 1}, f"calibrated cams: {calib_cams}"
    for c in received_calibs:
        fitted = CameraModel.from_proto(c)
        true = models[c.camera_id]
        pts = np.array([[true.pos[0], true.pos[1], 0.0],
                        [true.pos[0] - 800.0, true.pos[1] + 500.0, 0.0]])
        err = np.linalg.norm(
            fitted.field2image(pts) - true.field2image(pts), axis=-1
        )
        assert np.max(err) < 5.0, err

    # ...and the batched pipeline then detected both robots
    by_cam = {}
    for det in received_detections:
        by_cam.setdefault(det.camera_id, []).append(det)
    assert set(by_cam) == {0, 1}, f"detection cams: {set(by_cam)}"
    last0 = by_cam[0][-1]
    last1 = by_cam[1][-1]
    assert len(last0.robots_yellow) == 1
    assert last0.robots_yellow[0].robot_id == 4
    assert len(last1.robots_blue) == 1
    assert last1.robots_blue[0].robot_id == 11


def test_multicam_app_idle_streams_raw(tmp_path, divb_field):
    """No geometry on the bus at all: the batched app must not stall or
    crash — each frame-set it renders one camera's raw demosaic for the
    debug side channel (the single-camera App's idle path) so the
    operator can aim the cameras."""
    from vision_processor_tpu.app.multicam_app import MultiCamApp
    from vision_processor_tpu.io.camera import SyntheticDriver, register_driver
    from vision_processor_tpu.io.synthetic import Scene
    from vision_processor_tpu.models.camera import CameraModel

    field = divb_field.geometry.field
    model = CameraModel(
        focal_length=900.0,
        principal_point=np.array([480.0, 270.0]),
        distortion_k2=0.0,
        pos=np.array([-2250.0, 0.0, 4500.0]),
        size=np.array([960, 540]),
    )

    def factory(cam_cfg):
        return SyntheticDriver(
            model, field, Scene(bots=[], balls=[], noise_sigma=1.0),
            fmt="RGGB", fps=100.0, frames=4,
        )

    register_driver("SYNTHETIC_IDLE", factory)

    cfg_paths = []
    for cam_id in range(2):
        config = {
            "cam_id": cam_id,
            "bot_heights_file": str(tmp_path / "none.yml"),
            "camera": {"driver": "SYNTHETIC_IDLE"},
            "network": {
                "vision_ip": "224.99.99.77", "vision_port": 18293,
                "gc_ip": "224.99.99.78", "gc_port": 18294,
            },
            "stream": {"active": False},
            # no geometry section, wait_for_geometry off -> idle path
            "debug": {"wait_for_geometry": False,
                      "debug_stream_interval_ms": 1},
            "thresholds": {"blobs": 128},
        }
        p = tmp_path / f"config{cam_id}.yml"
        p.write_text(yaml.dump(config))
        cfg_paths.append(str(p))

    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        app = MultiCamApp(cfg_paths)
        app.run()
        time.sleep(0.3)
    finally:
        os.chdir(cwd)

    for cam_id in range(2):
        raw = tmp_path / "img" / f"{cam_id}.raw.jpg"
        assert raw.exists(), f"missing idle snapshot {raw}"
        assert raw.read_bytes()[:2] == b"\xff\xd8"
