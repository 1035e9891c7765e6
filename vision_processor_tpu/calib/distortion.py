"""Radial distortion calibration from detected field-line pixel sets.

Levenberg-Marquardt over (k2, principal point) minimizing the point-to-
fitted-line error of undistorted line pixels — the Thormählen-style
line-based single-view method the reference uses
(reference src/calib/Distortion.cpp:105-125). The total-least-squares line
fit and residuals are vectorized numpy; scipy provides the LM loop (the
reference uses Eigen LM with numerical differentiation).
"""
from __future__ import annotations

import numpy as np
from scipy.optimize import least_squares

from ..models.camera import CameraModel
from ..utils.log import get_logger

log = get_logger(__name__)


def line_tls_residuals(undistorted: np.ndarray) -> np.ndarray:
    """Signed distances of points to their own total-least-squares line
    (reference src/calib/Distortion.cpp:21-69)."""
    ex, ey = undistorted.mean(axis=0)
    exx, eyy = (undistorted**2).mean(axis=0)
    exy = (undistorted[:, 0] * undistorted[:, 1]).mean()

    if exx - ex * ex >= eyy - ey * ey:
        a = (exy - ex * ey) / (exx - ex * ex)
        b = (exx * ey - ex * exy) / (exx - ex * ex)
        norm = np.sqrt(a * a + 1)
        n = np.array([-a / norm, 1 / norm])
        d0 = b / norm
    else:
        c = (exy - ex * ey) / (eyy - ey * ey)
        d = (eyy * ex - ey * exy) / (eyy - ey * ey)
        norm = np.sqrt(c * c + 1)
        n = np.array([1 / norm, -c / norm])
        d0 = d / norm
    return undistorted @ n - d0


def _normalize_undistort(points, focal, pp, k2):
    n = (points - pp) / focal
    r2 = np.sum(n * n, axis=-1, keepdims=True)
    return n * (1.0 + k2 * r2)


def calibrate_distortion(line_pixel_groups: list[np.ndarray], model: CameraModel) -> bool:
    """Fit (k2, principal point) in place; returns False when the solution
    leaves the image (reference src/calib/Distortion.cpp:105-125)."""
    groups = [np.asarray(g, dtype=np.float64) for g in line_pixel_groups if len(g) >= 2]
    if not groups:
        return False

    focal = model.focal_length

    def residuals(x):
        k2, px, py = x
        pp = np.array([px, py])
        out = []
        for g in groups:
            u = _normalize_undistort(g, focal, pp, k2)
            out.append(line_tls_residuals(u))
        return np.concatenate(out)

    x0 = np.array(
        [model.distortion_k2, model.principal_point[0], model.principal_point[1]]
    )
    res = least_squares(residuals, x0, method="lm", max_nfev=200)
    k2, px, py = res.x

    if not (0.0 <= px < model.size[0] and 0.0 <= py < model.size[1]):
        log.info("Principal point outside of image, aborting distortion fit")
        return False

    model.distortion_k2 = float(k2)
    model.principal_point = np.array([px, py])
    return True
