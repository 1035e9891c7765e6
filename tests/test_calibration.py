"""Auto-calibration tests: synthetic field image -> fitted camera model.

Renders an empty field through a known camera, then checks the full
calibration chain (ridge threshold, LSD segments, grouping, distortion LM,
corner-permutation pose fit, direct refinement) recovers a model whose
reprojection error is small.
"""
import numpy as np
import pytest

from vision_processor_tpu.calib import geometry as G
from vision_processor_tpu.calib import lines as L
from vision_processor_tpu.calib.distortion import calibrate_distortion
from vision_processor_tpu.io.synthetic import Scene, render_rgb
from vision_processor_tpu.models.camera import (
    CameraModel,
    visible_field_extent_estimation,
)
from vision_processor_tpu.utils.config import VisionConfig


@pytest.fixture(scope="module")
def true_model():
    return CameraModel(
        focal_length=950.0,
        principal_point=np.array([470.0, 365.0]),
        distortion_k2=0.03,
        pos=np.array([-2150.0, 80.0, 4300.0]),
        size=np.array([960, 720]),
    )


@pytest.fixture(scope="module")
def field_image(true_model, divb_field):
    # 4-camera rig -> this camera sees quadrant 0
    scene = Scene(bots=[], balls=[], noise_sigma=1.0)
    return render_rgb(true_model, divb_field.geometry.field, scene)


def test_threshold_image_finds_lines(field_image):
    import cv2

    gray = cv2.cvtColor(field_image, cv2.COLOR_RGB2GRAY)
    thresh = L.threshold_image(gray, 2, 5)
    assert (thresh > 0).sum() > 500


def test_segments_and_grouping(field_image):
    import cv2

    gray = cv2.cvtColor(field_image, cv2.COLOR_RGB2GRAY)
    thresh = L.threshold_image(gray, 2, 5)
    segs = L.detect_segments(thresh, 10.0)
    assert len(segs) >= 6
    groups = L.group_line_segments(segs, np.deg2rad(3.0), 10.0)
    merged = L.merge_line_segments(groups)
    assert len(merged) <= len(segs)
    # the long touch/goal lines must survive as long merged lines
    lengths = sorted(
        (np.linalg.norm(b - a) for a, b in merged), reverse=True
    )
    assert lengths[0] > 300


def test_distortion_calibration_improves(field_image, true_model, divb_field):
    import cv2

    gray = cv2.cvtColor(field_image, cv2.COLOR_RGB2GRAY)
    thresh = L.threshold_image(gray, 2, 5)
    segs = L.detect_segments(thresh, 10.0)
    groups = L.group_line_segments(segs, np.deg2rad(3.0), 10.0)
    merged = L.merge_line_segments(groups)
    pixels = L.get_line_pixels(thresh)

    merged_pixels = []
    for group, (a, b) in zip(groups, merged):
        if np.linalg.norm(b - a) < gray.shape[0] / 2:
            continue
        sel = np.zeros(len(pixels), dtype=bool)
        for seg in group:
            v = seg[1] - seg[0]
            vv = float(v @ v)
            if vv == 0:
                continue
            w = pixels - seg[0]
            t = np.clip((w @ v) / vv, 0.0, 1.0)
            d2 = np.sum((w - t[:, None] * v) ** 2, axis=-1)
            sel |= d2 <= 4.0
        if sel.sum() > 10:
            merged_pixels.append(pixels[sel])
    assert len(merged_pixels) >= 2

    model = CameraModel(
        focal_length=true_model.focal_length,
        principal_point=true_model.principal_point.copy(),
        distortion_k2=0.0,
        pos=true_model.pos.copy(),
        quat=true_model.quat.copy(),
        size=true_model.size.copy(),
    )
    ok = calibrate_distortion(merged_pixels, model)
    assert ok
    # recovered k2 moves towards the true value
    assert abs(model.distortion_k2 - 0.03) < abs(0.0 - 0.03)


@pytest.fixture(scope="module")
def calibrated(field_image, true_model, divb_field):
    field = divb_field.geometry.field
    cfg = VisionConfig()
    cfg.cam_id = 0
    cfg.camera_amount = 4
    # a near-perpendicular view cannot resolve the focal/height ambiguity
    # (documented limitation of automatic height calibration in the
    # reference config.yml), so the rig provides the mount height
    cfg.camera_height = 4300.0

    lo, hi = visible_field_extent_estimation(0, 4, field, False)
    corners_field = [
        [lo[0], lo[1]], [lo[0], hi[1]], [hi[0], hi[1]], [hi[0], lo[1]],
    ]
    corners_px = [
        true_model.field2image(np.array([c[0], c[1], 0.0])) for c in corners_field
    ]
    # config order: first corner = min-x/min-y field corner; give the rest
    # shuffled to exercise the permutation search
    cfg.line_corners = [
        corners_px[0], corners_px[2], corners_px[1], corners_px[3]
    ]
    model = G.geometry_calibration(cfg, field, field_image, out_dir="/tmp/calib_img")
    return model


def test_geometry_calibration_accuracy(calibrated, true_model, divb_field):
    model = calibrated
    assert model is not None
    # reprojection agreement with the true model across the visible quadrant
    pts = []
    for x in np.linspace(-4400, -100, 8):
        for y in np.linspace(-2900, 2900, 8):
            pts.append([x, y, 0.0])
    pts = np.array(pts)
    true_px = true_model.field2image(pts)
    got_px = model.field2image(pts)
    inside = (
        (true_px[:, 0] > 0) & (true_px[:, 0] < 960)
        & (true_px[:, 1] > 0) & (true_px[:, 1] < 720)
    )
    err = np.linalg.norm(true_px[inside] - got_px[inside], axis=-1)
    assert np.median(err) < 5.0, f"median reprojection error {np.median(err):.2f} px"


def test_model_error_metric(calibrated, field_image, divb_field):
    import cv2

    field = divb_field.geometry.field
    gray = cv2.cvtColor(field_image, cv2.COLOR_RGB2GRAY)
    thresh = L.threshold_image(gray, 2, 5)
    pixels = L.get_line_pixels(thresh)
    err = G.model_error(field, calibrated, pixels)
    rate = err / len(pixels)
    assert rate < 0.3, f"model error rate {rate:.3f}"


# -- wide-angle identifiability ---------------------------------------------


def _line_pixel_groups(field_image):
    """Detected long-line pixel groups, as the calibration orchestration
    builds them (shared by the distortion tests)."""
    import cv2

    gray = cv2.cvtColor(field_image, cv2.COLOR_RGB2GRAY)
    thresh = L.threshold_image(gray, 2, 5)
    segs = L.detect_segments(thresh, 10.0)
    groups = L.group_line_segments(segs, np.deg2rad(3.0), 10.0)
    merged = L.merge_line_segments(groups)
    pixels = L.get_line_pixels(thresh)

    merged_pixels = []
    for group, (a, b) in zip(groups, merged):
        if np.linalg.norm(b - a) < gray.shape[0] / 2:
            continue
        sel = np.zeros(len(pixels), dtype=bool)
        for seg in group:
            v = seg[1] - seg[0]
            vv = float(v @ v)
            if vv == 0:
                continue
            w = pixels - seg[0]
            t = np.clip((w @ v) / vv, 0.0, 1.0)
            d2 = np.sum((w - t[:, None] * v) ** 2, axis=-1)
            sel |= d2 <= 4.0
        if sel.sum() > 10:
            merged_pixels.append(pixels[sel])
    return merged_pixels


def test_wide_angle_principal_point_identifiable(divb_field):
    """k2 ~ 0.12 rig: strong curvature makes the distortion center
    identifiable, and the joint (k2, principal point) stage must recover
    both from a wrong initial principal point (ROADMAP item: wide-angle
    distortion identifiability)."""
    true_k2 = 0.12
    true_pp = np.array([505.0, 330.0])
    wide_model = CameraModel(
        focal_length=560.0,  # short focal = wide angle
        principal_point=true_pp.copy(),
        distortion_k2=true_k2,
        pos=np.array([-2150.0, 80.0, 3400.0]),
        size=np.array([960, 720]),
    )
    scene = Scene(bots=[], balls=[], noise_sigma=1.0)
    img = render_rgb(wide_model, divb_field.geometry.field, scene)
    groups = _line_pixel_groups(img)
    assert len(groups) >= 2

    fit = CameraModel(
        focal_length=wide_model.focal_length,
        principal_point=np.array([480.0, 360.0]),  # image center, wrong
        distortion_k2=0.0,
        pos=wide_model.pos.copy(),
        quat=wide_model.quat.copy(),
        size=wide_model.size.copy(),
    )
    ok = calibrate_distortion(groups, fit, fit_principal_point=True)
    assert ok
    assert abs(fit.distortion_k2 - true_k2) < 0.05, fit.distortion_k2
    # principal point moves toward the truth from the center guess
    err0 = np.linalg.norm(np.array([480.0, 360.0]) - true_pp)
    err1 = np.linalg.norm(fit.principal_point - true_pp)
    assert err1 < err0, (fit.principal_point, err0, err1)
