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
