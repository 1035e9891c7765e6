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


def test_resample_grid_cache_keyed_on_projection_inputs(
    divb_field, overhead_model
):
    """The cached sampling geometry must be invalidated by ANY projection
    input change — including a field-offset/bot-height shift that leaves
    the rounded flat-grid shape (and thus the compile key) unchanged
    (regression: the key once omitted field_scale/offset)."""
    import numpy as np

    from vision_processor_tpu.app.processor import Processor
    from vision_processor_tpu.utils.config import VisionConfig

    cfg = VisionConfig()
    cfg.max_blobs = 64
    proc = Processor(cfg)
    geometry = divb_field.geometry
    geometry.ClearField("calib")
    geometry.calib.append(overhead_model.to_proto(0))
    proc.geometry_check(960, 720, geometry=geometry, version=1)
    proc._ensure_step("RGGB", (1440, 1920))

    g1 = proc._resample_grid()
    assert proc._resample_grid() is g1  # cached

    # same calibration, different bot height -> projection changes
    class FakeGC:
        max_bot_height = 160.0
        yellow_bot_height = 150.0
        blue_bot_height = 150.0

    proc.gc_socket = FakeGC()
    g2 = proc._resample_grid()
    assert g2 is not g1
    assert not np.array_equal(np.asarray(g1["idx"]), np.asarray(g2["idx"]))

    # a changed BlobMachineConfig value (e.g. field offset) re-keys even
    # when object identity of the compile key parts stays similar
    from dataclasses import replace

    proc._bm_cfg = replace(
        proc._bm_cfg,
        field_offset=(proc._bm_cfg.field_offset[0] + 100.0,
                      proc._bm_cfg.field_offset[1]),
    )
    g3 = proc._resample_grid()
    assert g3 is not g2
    assert not np.array_equal(np.asarray(g2["idx"]), np.asarray(g3["idx"]))
