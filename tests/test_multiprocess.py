"""Production-topology integration: two vision_processor OS processes (cam 0
and cam 1) + a geometry publisher on one multicast group, detections from
both cameras recorded on the shared bus — the reference's decentralized
multi-camera architecture end to end."""
import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

import numpy as np
import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(
    os.environ.get("VPTPU_SKIP_SLOW") == "1", reason="slow integration"
)


def test_two_processors_shared_bus(tmp_path):
    sys.path.insert(0, str(REPO / "python"))
    from make_dataset import main as make_dataset_main  # noqa: F401

    group, port = "224.99.99.61", 17979

    # dataset with 2 cameras
    subprocess.run(
        [
            sys.executable, str(REPO / "python" / "make_dataset.py"),
            "--out", str(tmp_path / "data"), "--cams", "2", "--frames", "4",
        ],
        check=True,
        cwd=str(REPO / "python"),
        env={**os.environ, "PYTHONPATH": str(REPO)},
        capture_output=True,
    )

    configs = []
    for cam in range(2):
        folder = tmp_path / "data" / "synthetic" / f"cam{cam}"
        cfg_file = folder / "ssl-vision-config" / "config.yml"
        cfg = yaml.safe_load(cfg_file.read_text())
        cfg["camera"]["path"] = str(folder / "scene0.mp4")
        cfg["network"] = {"vision_ip": group, "vision_port": port,
                          "gc_ip": "224.99.99.62", "gc_port": 17980}
        cfg["stream"] = {"active": False}
        cfg["debug"] = {"wait_for_geometry": True}
        cfg["thresholds"] = {"blobs": 128}
        cfg_file.write_text(yaml.dump(cfg))
        configs.append(cfg_file)

    # merged geometry with both calibrations
    from vision_processor_tpu.net.geometry_io import load_geometry
    from vision_processor_tpu.net.udp import UDPSocket
    from vision_processor_tpu.proto import SSL_WrapperPacket

    merged = load_geometry(tmp_path / "data" / "synthetic" / "cam0" / "geometry.yml")
    other = load_geometry(tmp_path / "data" / "synthetic" / "cam1" / "geometry.yml")
    merged.geometry.calib.append(other.geometry.calib[0])

    class Bus(UDPSocket):
        def __init__(self, *a):
            self.detections = []
            super().__init__(*a)

        def _parse(self, data):
            wrapper = SSL_WrapperPacket()
            wrapper.ParseFromString(data)
            if wrapper.HasField("detection"):
                self.detections.append(wrapper.detection)

    bus = Bus(group, port)
    stop = threading.Event()

    def publish():
        while not stop.is_set():
            bus.send(merged)
            time.sleep(0.1)

    publisher = threading.Thread(target=publish, daemon=True)
    publisher.start()

    env = {**os.environ, "PYTHONPATH": str(REPO), "JAX_PLATFORMS": "cpu"}
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "vision_processor_tpu.app.main", str(cfg)],
            env=env, cwd=str(REPO),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        for cfg in configs
    ]
    try:
        for proc in procs:
            assert proc.wait(timeout=420) == 0
        time.sleep(0.5)
    finally:
        stop.set()
        publisher.join()
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
        bus.close()

    by_cam = {}
    for det in bus.detections:
        by_cam.setdefault(det.camera_id, []).append(det)
    assert set(by_cam) == {0, 1}, f"cams seen: {set(by_cam)}"
    assert len(by_cam[0]) == 4
    assert len(by_cam[1]) == 4
    # both cameras produced robot detections on the shared bus
    for cam, dets in by_cam.items():
        total = sum(
            len(d.robots_yellow) + len(d.robots_blue) for d in dets
        )
        assert total > 0, f"cam {cam} never detected a robot"
    # clock-sync offsets flow between processors
    assert any(len(d.t_offsets) > 0 for d in bus.detections)
