#!/usr/bin/env python3
"""Pipeline-independent ball detectability analysis for perturbed footage.

Answers "could ANY implementation of the reference's ball scoring detect
the ball in this footage?" without running the pipeline: at the TRUE ball
position (ground truth projected through the dataset's calibration), sample
the disc-mean color straight from the decoded video pixels, convert to
dRGB, and evaluate the reference's exact ball color score
(reference src/blobs/hypothesis.cpp:83-94):

    score = 1 - |c - orange|^2 / |c - field|^2,  zeroed when the field or
    field-line color is closer than orange

with the reference-bootstrap color table (config defaults, reference
src/Resources.cpp:89-95). A score <= min_confidence (0.2) at the true
position means the reference's own formula rejects the ball there — the
recall floor is inherent to the scoring at that blur level, not an
implementation gap. The pipeline's ADAPTIVE color chain can only do better
than this static analysis (and measurably does: tests/test_perturbation.py).

Measured on the 6-frame gate scenes (tests/test_ball_detectability.py):
light 4/6 frames above 0.2, moderate >=3/6, medium 0/6 — which is why the
medium profile's ball bar is loss-only and the moderate profile carries
the meaningful (>=0.5) gate.

Usage:
    python python/ball_detectability.py --data <perturbed-tree> [--cam 0]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import cv2
import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def drgb(rgb: np.ndarray) -> np.ndarray:
    """Differential color space of the resampling kernel
    (reference kernel/resampling.cl:88-94)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return np.stack(
        [(2 * r - g - b + 510) * 0.25,
         (2 * g - b - r + 510) * 0.25,
         (2 * b - r - g + 510) * 0.25], axis=-1,
    )


def ball_scores_for_scene(folder: Path, disc_radius_px: int = 2,
                          min_confidence: float = 0.2):
    """Per-frame reference ball color score at the true ball position.

    Returns (scores, n_above) for every ground-truth frame with a ball.
    """
    from vision_processor_tpu.models.camera import CameraModel
    from vision_processor_tpu.models.colors import ColorState
    from vision_processor_tpu.net.geometry_io import load_geometry

    truth = json.loads((folder / "scene0.manual.json").read_text())
    geom = load_geometry(folder / "geometry.yml")
    cam_id = int(folder.name.replace("cam", ""))
    calib = [c for c in geom.geometry.calib if c.camera_id == cam_id][0]
    model = CameraModel.from_proto(calib)

    colors = ColorState().packed().astype(np.float32)
    orange_ref, field_ref, line_ref = colors[0], colors[1], colors[6]

    cap = cv2.VideoCapture(str(folder / "scene0.mp4"))
    scores = []
    fi = 0
    while True:
        ok, bgr = cap.read()
        if not ok:
            break
        gt = truth[fi]
        fi += 1
        if not gt.get("balls"):
            continue
        b = gt["balls"][0]
        px = model.field2image(np.array([b["x"], b["y"], 21.5]))
        x, y = int(round(px[0])), int(round(px[1]))
        r = disc_radius_px
        patch = bgr[max(0, y - r):y + r + 1,
                    max(0, x - r):x + r + 1, ::-1].astype(np.float32)
        if patch.size == 0:
            continue
        d = drgb(patch.reshape(-1, 3).mean(axis=0))
        o = float(np.sum((d - orange_ref) ** 2))
        f = float(np.sum((d - field_ref) ** 2))
        li = float(np.sum((d - line_ref) ** 2))
        s = 0.0 if (f <= o or li <= o) else 1.0 - o / max(f, 1e-9)
        scores.append(s)
    cap.release()
    return scores, sum(s > min_confidence for s in scores)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True,
                    help="perturbed dataset tree (perturb.py output)")
    ap.add_argument("--cam", type=int, default=0)
    args = ap.parse_args()

    root = Path(args.data)
    for field_dir in sorted(root.iterdir()):
        folder = field_dir / f"cam{args.cam}"
        if not (folder / "scene0.mp4").exists():
            continue
        scores, n_above = ball_scores_for_scene(folder)
        print(
            f"{field_dir.name}/cam{args.cam}: reference ball color score "
            f"at TRUE position per frame: "
            f"{['%.2f' % s for s in scores]}  above 0.2: "
            f"{n_above}/{len(scores)}"
        )


if __name__ == "__main__":
    main()
