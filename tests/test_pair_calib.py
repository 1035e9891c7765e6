"""Two-camera height calibration (roadmap item 8).

The single-camera focal/height ambiguity is exact for a straight-down
camera (scaling both leaves the field-plane projection invariant), so no
amount of line evidence fixes the rig height — probe test below. What
does: the same ROBOT (known height) observed by both cameras of a pair in
their overlap region; a wrong rig height shifts each camera's
parallax-corrected ground position toward its own nadir, in opposite
directions (reference src/calib/GeomModel.cpp:426-503 calib_height is the
single-camera branch; the pair solver extends it with the dual-view
evidence the reference rigs exchange via the tracker).
"""
import numpy as np
import pytest

from vision_processor_tpu.calib.pair import (
    apply_height,
    height_from_shared_objects,
    observations_from_detections,
)
from vision_processor_tpu.models.camera import (
    CameraModel,
    visible_field_extent_estimation,
)
from vision_processor_tpu.net.geometry_io import geometry_from_dict

TRUE_H = 4500.0
BOT_Z = 143.0


def _field():
    field_cfg = {"field": {
        "field_length": 9000, "field_width": 6000, "goal_width": 1000,
        "goal_depth": 180, "penalty_area_depth": 1000,
        "penalty_area_width": 2000, "boundary_width": 300,
        "center_circle_radius": 500, "line_thickness": 10,
        "ball_radius": 21.5, "max_robot_radius": 90.0,
    }}
    return geometry_from_dict(field_cfg).geometry.field


def _true_models(field, n_cams=2):
    models = []
    for cam_id in range(n_cams):
        lo, hi = visible_field_extent_estimation(cam_id, n_cams, field, False)
        center = (lo + hi) / 2
        models.append(CameraModel(
            focal_length=900.0,
            principal_point=np.array([480.0, 270.0]),
            distortion_k2=0.0,
            pos=np.array([center[0], center[1], TRUE_H]),
            size=np.array([960, 540]),
        ))
    return models


def _wrong_guess(model, h_wrong):
    """Focal/height-compensated wrong model: the exact ambiguous direction
    a single camera (or any number of plane observations) cannot fix."""
    return CameraModel(
        focal_length=model.focal_length * h_wrong / model.pos[2],
        principal_point=model.principal_point.copy(),
        distortion_k2=model.distortion_k2,
        pos=np.array([model.pos[0], model.pos[1], h_wrong]),
        quat=model.quat.copy(),
        size=model.size.copy(),
    )


def test_single_camera_height_ambiguity_is_real():
    """The compensated wrong-height model projects the field plane
    near-identically (max error far under a line width): line evidence —
    however much — cannot recover height for a nadir camera."""
    field = _field()
    model = _true_models(field)[0]
    wrong = _wrong_guess(model, 3600.0)   # 20% height error
    lo, hi = visible_field_extent_estimation(0, 2, field, True)
    gx, gy = np.meshgrid(np.linspace(lo[0], hi[0], 24),
                         np.linspace(lo[1], hi[1], 24))
    pts = np.stack([gx.reshape(-1), gy.reshape(-1),
                    np.zeros(gx.size)], axis=-1)
    err = np.linalg.norm(model.field2image(pts) - wrong.field2image(pts),
                         axis=-1)
    assert np.max(err) < 1.0, (
        f"ambiguity probe: compensated model differs by {np.max(err):.2f} px"
    )


def test_pair_calibration_recovers_height():
    rng = np.random.default_rng(4)
    field = _field()
    true_models = _true_models(field)
    wrong = [_wrong_guess(m, 3600.0) for m in true_models]

    # robots in the overlap strip between the two camera cells, observed
    # by both true cameras (center pixel at robot-top height), +-0.3 px
    # detection noise
    dets = {0: [], 1: []}
    for k, (bx, by) in enumerate([(0.0, -1800.0), (150.0, 0.0),
                                  (-120.0, 1500.0), (60.0, 800.0)]):
        p = np.array([bx, by, BOT_Z])
        for cam in (0, 1):
            px = true_models[cam].field2image(p[None, :])[0]
            px = px + rng.normal(0.0, 0.3, 2)
            dets[cam].append((k, px, BOT_Z))

    obs = observations_from_detections(dets, wrong)
    assert len(obs) == 4, f"expected 4 dual-view observations, got {len(obs)}"

    h = height_from_shared_objects(wrong, obs)
    assert h is not None
    assert abs(h - TRUE_H) < 0.03 * TRUE_H, (
        f"recovered height {h:.0f} vs true {TRUE_H:.0f}"
    )

    # applying the fitted height restores bot-height unprojection accuracy
    apply_height(wrong, h)
    p = np.array([[0.0, -1800.0, BOT_Z]])
    for cam in (0, 1):
        px = true_models[cam].field2image(p)
        ground_true = true_models[cam].image2field(px, BOT_Z)[0]
        ground_fit = wrong[cam].image2field(px, BOT_Z)[0]
        err = np.linalg.norm(ground_true[:2] - ground_fit[:2])
        assert err < 10.0, f"cam {cam}: residual parallax error {err:.1f} mm"


def test_pair_calibration_rejects_empty():
    field = _field()
    wrong = [_wrong_guess(m, 3600.0) for m in _true_models(field)]
    assert height_from_shared_objects(wrong, []) is None


def test_pair_calibration_trusted_camera_pins_height():
    """Mixed rig: cam1 has an operator-measured (correct) height and is
    NOT in `free`; cam0 sits on the wrong manifold. The solver must keep
    cam1 fixed in the cost and recover cam0's true height from the
    dual-view observations alone."""
    rng = np.random.default_rng(11)
    field = _field()
    true_models = _true_models(field)
    models = [_wrong_guess(true_models[0], 3600.0), true_models[1]]

    dets = {0: [], 1: []}
    for k, (bx, by) in enumerate([(0.0, -1800.0), (150.0, 0.0),
                                  (-120.0, 1500.0), (60.0, 800.0)]):
        p = np.array([bx, by, BOT_Z])
        for cam in (0, 1):
            px = true_models[cam].field2image(p[None, :])[0]
            dets[cam].append((k, px + rng.normal(0.0, 0.3, 2), BOT_Z))

    obs = observations_from_detections(dets, models)
    assert len(obs) == 4
    h = height_from_shared_objects(models, obs, free={0})
    assert h is not None
    assert abs(h - TRUE_H) < 0.03 * TRUE_H, (
        f"recovered height {h:.0f} vs true {TRUE_H:.0f}"
    )
    # the trusted camera's model was never modified by the solve
    assert models[1].pos[2] == TRUE_H
    assert models[1].focal_length == true_models[1].focal_length


def test_free_height_camera_selection():
    """The production trust set: only operator-MEASURED nonzero heights
    anchor the rig solve. Explicit 0.0 (calibrate me) and an omitted
    camera_height (arbitrary manifold height from the degenerate
    single-camera fit) are both free to move."""
    from types import SimpleNamespace

    from vision_processor_tpu.app.multicam_app import free_height_cameras

    cfgs = [
        SimpleNamespace(camera_height=0.0, camera_height_set=True),
        SimpleNamespace(camera_height=3900.0, camera_height_set=True),
        SimpleNamespace(camera_height=0.0, camera_height_set=False),
    ]
    assert free_height_cameras(cfgs) == {0, 2}


def test_pair_calibration_all_trusted_is_no_information():
    """Observations between two trusted cameras carry no information
    about h (their models do not move with it) — the solver must refuse
    rather than return an arbitrary optimum."""
    field = _field()
    models = _true_models(field)
    p = np.array([0.0, -1800.0, BOT_Z])
    obs = [(0, models[0].field2image(p[None, :])[0],
            1, models[1].field2image(p[None, :])[0], BOT_Z)]
    assert height_from_shared_objects(models, obs, free=set()) is None


def test_multicam_app_pair_height_refinement(tmp_path):
    """Production integration of the pair solver (reference config.yml
    `camera_height: 0.0` = automated height calibration, extended to the
    nadir-degenerate case): MultiCamApp accumulates dual-view robot
    observations from the overlap region, solves the rig height, and
    re-broadcasts plane-consistent refined calibs. The published calibs
    start on the ambiguity manifold at a 20% WRONG height; the app must
    broadcast corrected ones near the true height."""
    import os
    import threading
    import time

    from vision_processor_tpu.app.multicam_app import MultiCamApp
    from vision_processor_tpu.io.camera import (
        SyntheticDriver,
        register_driver,
    )
    from vision_processor_tpu.io.synthetic import Scene, SceneBot
    from vision_processor_tpu.net.udp import UDPSocket
    from vision_processor_tpu.proto import SSL_WrapperPacket

    field = _field()
    group, port = "224.99.99.75", 18291
    n_cams = 2

    true_models = [
        CameraModel.initial_guess(
            np.array([960, 720]), cam_id, n_cams, TRUE_H, field
        )
        for cam_id in range(n_cams)
    ]

    # published calibs: plane-consistent WRONG height (0.8x) — the exact
    # manifold a degenerate single-camera height fit can land on
    wrong_models = []
    for m in true_models:
        w = CameraModel(
            focal_length=m.focal_length * 0.8,
            principal_point=m.principal_point.copy(),
            distortion_k2=m.distortion_k2,
            pos=np.array([m.pos[0], m.pos[1], m.pos[2] * 0.8]),
            quat=m.quat.copy(),
            size=m.size.copy(),
        )
        wrong_models.append(w)

    # one shared robot in the ~800 mm overlap strip, one private per cam
    shared = SceneBot(7, "yellow", 0.0, 300.0, 0.5)
    scenes = [
        Scene(bots=[shared,
                    SceneBot(3, "blue", float(true_models[0].pos[0]),
                             -500.0, 1.2)],
              balls=[], noise_sigma=1.0),
        Scene(bots=[shared,
                    SceneBot(9, "blue", float(true_models[1].pos[0]),
                             600.0, -0.7)],
              balls=[], noise_sigma=1.0),
    ]

    def factory(cam_cfg):
        c = int(cam_cfg.path or 0)
        return SyntheticDriver(
            true_models[c], field, scenes[c], fmt="RGGB", fps=100.0,
            frames=14,
        )

    register_driver("SYNTHETIC_PAIRH", factory)

    cfg_paths = []
    for cam_id in range(n_cams):
        config = {
            "cam_id": cam_id,
            "bot_heights_file": str(tmp_path / "none.yml"),
            "camera": {"driver": "SYNTHETIC_PAIRH", "path": str(cam_id)},
            # camera_height 0.0 = automated height calibration
            "geometry": {"camera_amount": n_cams, "camera_height": 0.0},
            "network": {
                "vision_ip": group, "vision_port": port,
                "gc_ip": "224.99.99.76", "gc_port": 18292,
            },
            "stream": {"active": False},
            "debug": {"wait_for_geometry": True},
            "thresholds": {"blobs": 128},
        }
        p = tmp_path / f"config{cam_id}.yml"
        p.write_text(yaml_dump(config))
        cfg_paths.append(str(p))

    wrapper = SSL_WrapperPacket()
    wrapper.geometry.field.CopyFrom(field)
    for cam_id, w in enumerate(wrong_models):
        wrapper.geometry.calib.append(w.to_proto(cam_id))

    refined_calibs = []

    class Publisher(UDPSocket):
        def _parse(self, data):
            got = SSL_WrapperPacket()
            got.ParseFromString(data)
            if got.HasField("geometry") and len(got.geometry.calib):
                # absorb calib broadcasts like geom_publisher.py
                for calib in got.geometry.calib:
                    refined_calibs.append(calib)
                    for mine in wrapper.geometry.calib:
                        if mine.camera_id == calib.camera_id:
                            mine.CopyFrom(calib)
                            break

    publisher_sock = Publisher(group, port)
    stop = threading.Event()

    def publish():
        while not stop.is_set():
            publisher_sock.send(wrapper)
            time.sleep(0.05)

    thread = threading.Thread(target=publish, daemon=True)
    thread.start()

    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        app = MultiCamApp(cfg_paths)
        assert app._pair_height_active
        app._height_obs_target = 8
        app.run()
        time.sleep(0.3)
    finally:
        os.chdir(cwd)
        stop.set()
        thread.join()
        publisher_sock.close()

    assert refined_calibs, "no refined calibration was broadcast"
    by_cam = {}
    for c in refined_calibs:
        by_cam[c.camera_id] = c  # keep the last per camera
    assert set(by_cam) == {0, 1}
    for cam_id, calib in by_cam.items():
        got = CameraModel.from_proto(calib)
        assert abs(got.pos[2] - TRUE_H) < 0.05 * TRUE_H, (
            f"cam {cam_id}: refined height {got.pos[2]:.0f} "
            f"vs true {TRUE_H:.0f}"
        )
        # plane-consistency: z=0 projections match the wrong model's
        # (the refinement moves along the ambiguity manifold)
        w = wrong_models[cam_id]
        pts = np.array([[w.pos[0], w.pos[1], 0.0],
                        [w.pos[0] - 700.0, w.pos[1] + 400.0, 0.0]])
        err = np.linalg.norm(
            got.field2image(pts) - w.field2image(pts), axis=-1)
        assert np.max(err) < 2.0, err


def yaml_dump(obj):
    import yaml

    return yaml.dump(obj)
