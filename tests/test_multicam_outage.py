"""Camera-outage resilience for the production multi-camera mode: one
dead or hiccuping camera must not take down the fleet. The reference's
process-per-camera model gets this for free (each process owns one
camera, reference src/main.cpp per-process loop); the batched MultiCamApp
must degrade gracefully instead — reuse the failed camera's last frame to
keep the batched program's shape, suppress its detections on the wire,
and resume it when frames flow again.
"""
import os
import threading
import time

import numpy as np
import pytest
import yaml

from vision_processor_tpu.io.camera import SyntheticDriver, register_driver
from vision_processor_tpu.io.synthetic import Scene, SceneBot
from vision_processor_tpu.models.camera import CameraModel
from vision_processor_tpu.net.geometry_io import geometry_from_dict
from vision_processor_tpu.net.udp import UDPSocket
from vision_processor_tpu.proto import SSL_WrapperPacket

pytestmark = pytest.mark.skipif(
    os.environ.get("VPTPU_SKIP_SLOW") == "1", reason="slow integration"
)


def _field():
    return geometry_from_dict({"field": {
        "field_length": 9000, "field_width": 6000, "goal_width": 1000,
        "goal_depth": 180, "penalty_area_depth": 1000,
        "penalty_area_width": 2000, "boundary_width": 300,
        "center_circle_radius": 500, "line_thickness": 10,
        "ball_radius": 21.5, "max_robot_radius": 90.0,
    }}).geometry.field


class OutageDriver(SyntheticDriver):
    """Synthetic camera that blacks out for a window of frame indices:
    the underlying frame is consumed (time advances) but read_image
    returns None, like a live camera timing out."""

    def __init__(self, *args, outage=(), **kw):
        super().__init__(*args, **kw)
        self._outage = set(outage)
        self._i = 0

    def read_image(self):
        frame = super().read_image()
        i = self._i
        self._i += 1
        return None if i in self._outage else frame


def test_one_camera_outage_keeps_fleet_alive(tmp_path):
    field = _field()
    group, port = "224.99.99.77", 18391
    n_cams, n_frames = 2, 8
    outage = (3, 4)   # camera 1 delivers nothing for two frame-sets

    models = [
        CameraModel.initial_guess(
            np.array([960, 720]), cam_id, n_cams, 4500.0, field)
        for cam_id in range(n_cams)
    ]
    scenes = [
        Scene(bots=[SceneBot(3, "blue", float(models[0].pos[0]), -500.0,
                             1.2)], balls=[], noise_sigma=1.0),
        Scene(bots=[SceneBot(9, "yellow", float(models[1].pos[0]), 600.0,
                             -0.7)], balls=[], noise_sigma=1.0),
    ]

    def factory(cam_cfg):
        c = int(cam_cfg.path or 0)
        return OutageDriver(
            models[c], field, scenes[c], fmt="RGGB", fps=100.0,
            frames=n_frames, outage=outage if c == 1 else (),
        )

    register_driver("SYNTHETIC_OUTAGE", factory)

    cfg_paths = []
    for cam_id in range(n_cams):
        config = {
            "cam_id": cam_id,
            "bot_heights_file": str(tmp_path / "none.yml"),
            "camera": {"driver": "SYNTHETIC_OUTAGE", "path": str(cam_id)},
            "geometry": {"camera_amount": n_cams},
            "network": {
                "vision_ip": group, "vision_port": port,
                "gc_ip": "224.99.99.78", "gc_port": 18392,
            },
            "stream": {"active": False},
            "debug": {"wait_for_geometry": True},
            "thresholds": {"blobs": 128},
        }
        p = tmp_path / f"config{cam_id}.yml"
        p.write_text(yaml.dump(config))
        cfg_paths.append(str(p))

    wrapper = SSL_WrapperPacket()
    wrapper.geometry.field.CopyFrom(field)
    for cam_id, m in enumerate(models):
        wrapper.geometry.calib.append(m.to_proto(cam_id))

    by_cam = {0: [], 1: []}

    class Bus(UDPSocket):
        def _parse(self, data):
            got = SSL_WrapperPacket()
            got.ParseFromString(data)
            if got.HasField("detection"):
                by_cam[got.detection.camera_id].append(got.detection)

    bus = Bus(group, port)
    stop = threading.Event()

    def publish():
        while not stop.is_set():
            bus.send(wrapper)
            time.sleep(0.05)

    thread = threading.Thread(target=publish, daemon=True)
    thread.start()

    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        from vision_processor_tpu.app.multicam_app import MultiCamApp

        app = MultiCamApp(cfg_paths)
        app.run()
        time.sleep(0.3)
    finally:
        os.chdir(cwd)
        stop.set()
        thread.join()
        bus.close()

    # the healthy camera saw every frame-set despite camera 1's outage
    assert len(by_cam[0]) == n_frames, (
        f"fleet stalled: cam0 emitted {len(by_cam[0])}/{n_frames}"
    )
    # the failed camera emitted nothing during the outage window, exactly
    assert len(by_cam[1]) == n_frames - len(outage), by_cam[1]
    # and kept detecting its robot after recovery (last emitted frame)
    assert any(len(d.robots_yellow) for d in by_cam[1][-2:]), (
        "camera 1 never recovered detections after the outage"
    )
    # suppressed frame-sets are absent, not re-sent later: frame numbers
    # jump over the outage window for camera 1 but stay contiguous for 0
    fn0 = [d.frame_number for d in by_cam[0]]
    assert fn0 == sorted(fn0) and len(set(fn0)) == n_frames
