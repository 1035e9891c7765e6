"""In-process application integration test: synthetic camera + geometry
publisher + App loop + detection recorder over an isolated multicast group.
"""
import threading
import time

import numpy as np
import pytest
import yaml


@pytest.fixture
def app_env(tmp_path, divb_field, overhead_model):
    """Config file + geometry publisher on an isolated multicast group."""
    from vision_processor_tpu.net.udp import UDPSocket

    group, port = "224.99.99.33", 17575

    config = {
        "cam_id": 0,
        "bot_heights_file": str(tmp_path / "heights.yml"),
        "camera": {"driver": "SYNTHETIC"},
        "network": {
            "vision_ip": group, "vision_port": port,
            "gc_ip": "224.99.99.34", "gc_port": 17576,
        },
        "stream": {"active": False},
        "debug": {"wait_for_geometry": True},
        "thresholds": {"blobs": 128},
    }
    cfg_path = tmp_path / "config.yml"
    cfg_path.write_text(yaml.dump(config))
    (tmp_path / "heights.yml").write_text(
        yaml.dump({"TeamA": 143.0, "TeamB": 147.0})
    )

    geometry = divb_field
    geometry.geometry.ClearField("calib")
    geometry.geometry.calib.append(overhead_model.to_proto(0))

    class Sender(UDPSocket):
        def _parse(self, data):
            pass

    sender = Sender(group, port)
    stop = threading.Event()

    def publish():
        while not stop.is_set():
            sender.send(geometry)
            time.sleep(0.05)

    thread = threading.Thread(target=publish, daemon=True)
    thread.start()
    yield cfg_path, group, port
    stop.set()
    thread.join()
    sender.close()


def test_app_full_loop(app_env, divb_field, overhead_model, monkeypatch):
    from vision_processor_tpu.app.main import App
    from vision_processor_tpu.io.camera import SyntheticDriver, register_driver
    from vision_processor_tpu.io.synthetic import Scene, SceneBall, SceneBot
    from vision_processor_tpu.net.udp import UDPSocket
    from vision_processor_tpu.proto import SSL_WrapperPacket

    cfg_path, group, port = app_env

    scene = Scene(
        bots=[SceneBot(5, "yellow", -2600.0, 400.0, 1.1)],
        balls=[SceneBall(-3200.0, -1100.0)],
        noise_sigma=1.0,
    )
    register_driver(
        "SYNTHETIC",
        lambda cam_cfg: SyntheticDriver(
            overhead_model, divb_field.geometry.field, scene,
            fmt="RGGB", fps=100.0, frames=4,
        ),
    )

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
        recorder.close()

    assert len(received) == 4, f"got {len(received)} detection frames"
    last = received[-1]
    assert len(last.robots_yellow) == 1
    bot = last.robots_yellow[0]
    assert bot.robot_id == 5
    assert abs(bot.x - -2600.0) < 30
    assert abs(bot.y - 400.0) < 30
    # bot height from the GC default (mean of heights.yml)
    assert bot.height == pytest.approx(145.0, abs=1.0)
    assert len(last.balls) == 1
    assert abs(last.balls[0].x - -3200.0) < 40
    assert last.frame_number == 4
    # file time = frames-read / fps (deterministic replay clock)
    assert last.t_capture == pytest.approx(4 / 100.0, abs=1e-6)


def test_app_pipelined_mode(app_env, divb_field, overhead_model, monkeypatch):
    """One-frame device/host overlap still emits every frame (flush at end)."""
    from vision_processor_tpu.app.main import App
    from vision_processor_tpu.io.camera import SyntheticDriver, register_driver
    from vision_processor_tpu.io.synthetic import Scene, SceneBall, SceneBot
    from vision_processor_tpu.net.udp import UDPSocket
    from vision_processor_tpu.proto import SSL_WrapperPacket

    monkeypatch.setenv("VPTPU_PIPELINE", "1")
    cfg_path, group, port = app_env

    scene = Scene(
        bots=[SceneBot(2, "blue", -1800.0, -300.0, -0.4)],
        balls=[SceneBall(-3000.0, 900.0)],
    )
    register_driver(
        "SYNTHETIC",
        lambda cam_cfg: SyntheticDriver(
            overhead_model, divb_field.geometry.field, scene,
            fmt="RGGB", fps=100.0, frames=3,
        ),
    )

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
        assert app.pipeline
        app.run()
        import time as _t

        _t.sleep(0.3)
    finally:
        recorder.close()

    assert len(received) == 3
    assert sorted(d.frame_number for d in received) == [1, 2, 3]
    last = max(received, key=lambda d: d.frame_number)
    assert len(last.robots_blue) == 1
    assert last.robots_blue[0].robot_id == 2
