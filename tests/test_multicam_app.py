"""Production multi-camera mode integration: one MultiCamApp process driving
two cameras through the batched one-chip pipeline (parallel/multicam), with
per-camera sockets, geometry and host finishing — detections for both camera
ids recorded on the shared multicast bus (the chip-native re-expression of
tests/test_multiprocess.py's two-process topology)."""
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(
    os.environ.get("VPTPU_SKIP_SLOW") == "1", reason="slow integration"
)


def test_multicam_app_two_cameras(tmp_path):
    group, port = "224.99.99.71", 17991

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
                          "gc_ip": "224.99.99.72", "gc_port": 17992}
        cfg["stream"] = {"active": False}
        cfg["debug"] = {"wait_for_geometry": True,
                        "debug_stream_interval_ms": 1}
        cfg["thresholds"] = {"blobs": 128}
        cfg_file.write_text(yaml.dump(cfg))
        configs.append(cfg_file)

    from vision_processor_tpu.net.geometry_io import load_geometry
    from vision_processor_tpu.net.udp import UDPSocket
    from vision_processor_tpu.proto import SSL_WrapperPacket

    merged = load_geometry(
        tmp_path / "data" / "synthetic" / "cam0" / "geometry.yml")
    other = load_geometry(
        tmp_path / "data" / "synthetic" / "cam1" / "geometry.yml")
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
    # ONE process, TWO configs -> MultiCamApp batched path
    proc = subprocess.Popen(
        [sys.executable, "-m", "vision_processor_tpu.app.main",
         str(configs[0]), str(configs[1])],
        env=env, cwd=str(tmp_path),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        assert proc.wait(timeout=420) == 0
        time.sleep(0.5)
    finally:
        stop.set()
        publisher.join()
        if proc.poll() is None:
            proc.kill()
        bus.close()

    by_cam = {}
    for det in bus.detections:
        by_cam.setdefault(det.camera_id, []).append(det)
    assert set(by_cam) == {0, 1}, f"cams seen: {set(by_cam)}"
    assert len(by_cam[0]) == 4
    assert len(by_cam[1]) == 4
    for cam, dets in by_cam.items():
        total = sum(
            len(d.robots_yellow) + len(d.robots_blue) for d in dets
        )
        assert total > 0, f"cam {cam} never detected a robot"
    # frame numbers advance per camera independently
    for cam, dets in by_cam.items():
        assert [d.frame_number for d in dets] == [1, 2, 3, 4]

    # the round-robin debug side channel wrote snapshots for both cameras
    for cam in (0, 1):
        raw = tmp_path / "img" / f"{cam}.raw.jpg"
        assert raw.exists(), f"missing snapshot {raw}"
        assert raw.read_bytes()[:2] == b"\xff\xd8"
