"""Mid-run geometry updates: a changed calibration arriving on the bus must
be adopted, recompile the pipeline for the new flat grid, and keep
detections flowing."""
import numpy as np

from vision_processor_tpu.app.processor import Processor
from vision_processor_tpu.io.camera import RawFrame
from vision_processor_tpu.io.synthetic import Scene, SceneBot, render_raw
from vision_processor_tpu.models.camera import CameraModel
from vision_processor_tpu.utils.config import VisionConfig

MAXH = 150.0


def test_recalibration_recompiles_and_detects(divb_field, overhead_model):
    cfg = VisionConfig()
    cfg.max_blobs = 128
    proc = Processor(cfg)
    geometry = divb_field.geometry
    geometry.ClearField("calib")
    geometry.calib.append(overhead_model.to_proto(0))
    proc.geometry_check(960, 720, geometry=geometry, version=1)

    scene = Scene(bots=[SceneBot(8, "yellow", -2700.0, 400.0, 0.3)], balls=[])
    raw = render_raw(overhead_model, geometry.field, scene, "RGGB")
    wrapper, _, _ = proc.process_frame(
        RawFrame(raw, "RGGB", 960, 720, 0.0), tracked_by_cam={}, now=0.0
    )
    assert len(wrapper.detection.robots_yellow) == 1
    key1 = proc._geom_key
    assert key1 is not None

    # new calibration: camera moved and zoomed -> different flat grid
    moved = CameraModel(
        focal_length=1000.0,
        principal_point=np.array([470.0, 350.0]),
        distortion_k2=0.01,
        pos=np.array([-2100.0, 150.0, 4200.0]),
        size=np.array([960, 720]),
    )
    geometry.ClearField("calib")
    geometry.calib.append(moved.to_proto(0))
    proc.geometry_check(960, 720, geometry=geometry, version=2)
    assert proc.perspective.geometry_version == 2

    raw2 = render_raw(moved, geometry.field, scene, "RGGB")
    wrapper2, _, _ = proc.process_frame(
        RawFrame(raw2, "RGGB", 960, 720, 0.0), tracked_by_cam={}, now=0.02
    )
    assert proc._geom_key != key1, "pipeline was not recompiled"
    det = wrapper2.detection
    assert len(det.robots_yellow) == 1
    bot = det.robots_yellow[0]
    assert bot.robot_id == 8
    assert abs(bot.x - -2700.0) < 30
    assert abs(bot.y - 400.0) < 30


def test_cleared_calibration_triggers_recalibration_state(divb_field, overhead_model):
    cfg = VisionConfig()
    proc = Processor(cfg)
    geometry = divb_field.geometry
    geometry.ClearField("calib")
    geometry.calib.append(overhead_model.to_proto(0))
    proc.geometry_check(960, 720, geometry=geometry, version=1)
    assert proc.perspective.geometry_version == 1

    # calibration cleared on the bus (operator reset) -> version drops to 0,
    # which sends the app into the calibration path
    geometry.ClearField("calib")
    proc.geometry_check(960, 720, geometry=geometry, version=2)
    assert proc.perspective.geometry_version == 0
