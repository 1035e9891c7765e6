"""Coverage for the remaining small components: line intersections, outer
edge search, debug views, the replay script's packet generation."""
import json

import numpy as np
import pytest


def test_line_intersections_and_outer_edges():
    from vision_processor_tpu.calib.lines import (
        find_outer_edges,
        line_intersections,
        line_line_intersection,
    )

    a = (np.array([0.0, 0.0]), np.array([10.0, 0.0]))
    b = (np.array([5.0, -5.0]), np.array([5.0, 5.0]))
    p = line_line_intersection(a, b)
    np.testing.assert_allclose(p, [5.0, 0.0])

    # parallel lines -> infinity
    c = (np.array([0.0, 1.0]), np.array([10.0, 1.0]))
    p = line_line_intersection(a, c)
    assert not np.isfinite(p).all()

    lines = [
        (np.array([0.0, 0.0]), np.array([100.0, 0.0])),
        (np.array([0.0, 80.0]), np.array([100.0, 80.0])),
        (np.array([0.0, 0.0]), np.array([0.0, 80.0])),
        (np.array([100.0, 0.0]), np.array([100.0, 80.0])),
    ]
    pts = line_intersections(lines, 100, 80, 1.0)
    assert len(pts) == 4

    edges = find_outer_edges(pts)
    assert len(edges) == 4
    xs = sorted(round(p[0]) for p in edges)
    assert xs == [0, 0, 100, 100]


def test_debug_views(divb_field, overhead_model):
    from vision_processor_tpu.app.processor import Processor
    from vision_processor_tpu.io.synthetic import Scene, SceneBot, render_raw
    from vision_processor_tpu.utils.config import VisionConfig

    cfg = VisionConfig()
    cfg.max_blobs = 64
    proc = Processor(cfg)
    geometry = divb_field.geometry
    geometry.ClearField("calib")
    geometry.calib.append(overhead_model.to_proto(0))
    proc.geometry_check(960, 720, geometry=geometry, version=1)

    scene = Scene(bots=[SceneBot(0, "yellow", -2500.0, 0.0, 0.0)], balls=[])
    raw = render_raw(proc.perspective.model, geometry.field, scene, "RGGB")
    proc._ensure_step("RGGB", raw.shape)

    views = proc.debug_views(raw, "RGGB")
    hf = int(proc.perspective.reprojected_field_size[1])
    wf = int(proc.perspective.reprojected_field_size[0])
    assert views["raw_rgb"].shape == (720, 960, 3)
    assert views["flat_rgb"].shape == (hf, wf, 3)
    assert views["grad_rgb"].shape == (hf, wf, 3)
    assert views["circ_rgb"].shape == (hf, wf, 3)
    for v in views.values():
        assert v.dtype == np.uint8


def test_replay_packets(tmp_path):
    """replay.py's core: JSON detection dicts -> wrapper packets on the bus."""
    import sys

    sys.path.insert(0, "python")
    import time

    from visionsocket import VisionRecorder, VisionSocket

    detections = [
        {
            "frame_number": 1, "t_capture": 0.0, "t_sent": 0.0, "camera_id": 0,
            "balls": [
                {"confidence": 0.9, "x": 100.0, "y": 200.0,
                 "pixel_x": 10.0, "pixel_y": 20.0}
            ],
        },
        {
            "frame_number": 2, "t_capture": 0.01, "t_sent": 0.01, "camera_id": 0,
            "robots_yellow": [
                {"confidence": 0.8, "robot_id": 7, "x": -1.0, "y": -2.0,
                 "orientation": 0.5, "pixel_x": 1.0, "pixel_y": 2.0}
            ],
        },
    ]
    path = tmp_path / "scene.vision.json"
    path.write_text(json.dumps(detections))

    from google.protobuf.json_format import ParseDict

    from vision_processor_tpu.proto import SSL_DetectionFrame, SSL_WrapperPacket

    recorder = VisionRecorder(vision_ip="224.99.99.51", vision_port=17878)
    sender = VisionSocket(vision_ip="224.99.99.51", vision_port=17878)
    with recorder:
        for det in json.loads(path.read_text()):
            wrapper = SSL_WrapperPacket()
            wrapper.detection.CopyFrom(ParseDict(det, SSL_DetectionFrame()))
            sender.send(wrapper)
        time.sleep(0.3)
    frames = recorder.subfield("detection")
    assert len(frames) == 2
    assert frames[0].balls[0].x == 100.0
    assert frames[1].robots_yellow[0].robot_id == 7


def test_vendor_drivers_require_sdk():
    from vision_processor_tpu.io.vendor import MVImpactDriver, SpinnakerDriver
    from vision_processor_tpu.utils.config import CameraSection

    with pytest.raises(RuntimeError, match="Spinnaker"):
        SpinnakerDriver(CameraSection(driver="SPINNAKER"))
    with pytest.raises(RuntimeError, match="mvIMPACT"):
        MVImpactDriver(CameraSection(driver="MVIMPACT"))


def test_open_camera_unknown_driver():
    from vision_processor_tpu.io.camera import open_camera
    from vision_processor_tpu.utils.config import CameraSection

    with pytest.raises(ValueError):
        open_camera(CameraSection(driver="NOPE"))


def test_genicam_driver_requires_aravis():
    from vision_processor_tpu.io.genicam import AravisDriver
    from vision_processor_tpu.utils.config import CameraSection

    with pytest.raises(RuntimeError, match="Aravis"):
        AravisDriver(CameraSection(driver="GENICAM"))


def test_open_camera_routes_genicam():
    from vision_processor_tpu.io.camera import open_camera
    from vision_processor_tpu.utils.config import CameraSection

    # without libaravis the driver must raise its clear gating error (not
    # an unknown-driver ValueError) for both aliases
    for name in ("GENICAM", "ARAVIS"):
        with pytest.raises(RuntimeError, match="Aravis"):
            open_camera(CameraSection(driver=name))
