#!/usr/bin/env python3
"""Diagnose the medium-profile ball recall collapse (VERDICT r3 item 4).

Builds the same perturbed dataset the gate test uses
(tests/test_perturbation.py medium profile), then runs the device pipeline
frame by frame and reports, for the blob nearest the true ball position:
circularity, extraction score, disc-mean/center color distances to the
color table, the ball color score, and WHICH gate removes it
(min_circularity at extraction, min_score, color score <= min_confidence,
field/field-line veto, camera-edge cut).

Usage: python experiments/ball_medium_diag.py [--profile medium] \
            [--factor 1.0] [--circularity 8.0]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="medium")
    ap.add_argument("--factor", type=float, default=1.0)
    ap.add_argument("--circularity", type=float, default=8.0)
    ap.add_argument("--frames", type=int, default=6)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    tmp = Path(tempfile.mkdtemp(prefix="balldiag"))
    subprocess.run(
        [sys.executable, str(REPO / "python" / "make_dataset.py"),
         "--out", str(tmp / "data"), "--cams", "2", "--frames", str(args.frames)],
        check=True, cwd=str(REPO / "python"),
        env={**os.environ, "PYTHONPATH": str(REPO)}, capture_output=True,
    )
    subprocess.run(
        [sys.executable, str(REPO / "python" / "perturb.py"),
         "--data", str(tmp / "data"), "--out", str(tmp / "pert"),
         "--profile", args.profile],
        check=True, cwd=str(REPO / "python"),
        env={**os.environ, "PYTHONPATH": str(REPO)}, capture_output=True,
    )
    folder = tmp / "pert" / "synthetic" / "cam0"
    truth = json.loads((folder / "scene0.manual.json").read_text())

    import yaml

    from vision_processor_tpu.app.processor import Processor, TrackedArrays
    from vision_processor_tpu.models.colors import ColorState
    from vision_processor_tpu.net.geometry_io import load_geometry
    from vision_processor_tpu.io.camera import OpenCVDriver
    from vision_processor_tpu.utils.config import CameraSection, VisionConfig

    cfg_raw = yaml.safe_load(
        (folder / "ssl-vision-config" / "config.yml").read_text()
    )
    vc = VisionConfig()
    vc.cam_id = 0
    vc.max_blobs = 128
    vc.min_circularity = args.circularity
    vc.resampling_factor = args.factor

    geometry = load_geometry(folder / "geometry.yml")

    class NullSock:
        geometry_version = 1

        def get_tracked_objects(self):
            return {}

    proc = Processor(vc, None, None)
    cam = OpenCVDriver(CameraSection(
        driver="OPENCV", path=str(folder / "scene0.mp4"),
    ))
    first = cam.read_image()
    proc.geometry_check(first.width, first.height,
                        geometry=geometry.geometry, version=1)

    colors = ColorState()
    frame_i = 0
    frame = first
    while frame is not None:
        gt = truth[frame_i]
        ball_gt = gt.get("balls", [])
        tracked = TrackedArrays.build({}, 0.0, proc.det_cfg.max_tracked)
        out = proc.device_step(frame.data, frame.fmt, tracked)
        wrapper, blobs, det = proc.finish_frame(out, 0.0, 0.0)
        if not ball_gt:
            frame_i += 1
            frame = cam.read_image()
            continue
        bx, by = ball_gt[0]["x"], ball_gt[0]["y"]
        pos = np.asarray(blobs["field_pos"])
        valid = np.asarray(blobs["valid"])
        got_balls = len(wrapper.detection.balls)
        if not valid.any():
            print(f"frame {frame_i}: NO valid blobs at all")
            frame_i += 1
            frame = cam.read_image()
            continue
        d = np.linalg.norm(pos - [bx, by], axis=-1)
        d = np.where(valid, d, np.inf)
        j = int(np.argmin(d))
        circ = float(np.asarray(blobs["circ"])[j])
        score = float(np.asarray(blobs["score"])[j])
        col = np.asarray(blobs["color"])[j]
        center = np.asarray(blobs["center"])[j]
        ctab = proc.colors.packed().astype(np.float32)
        names = ["orange", "field", "yellow", "blue", "green", "pink",
                 "line"]
        dists = {n: float(np.sum((col - c) ** 2))
                 for n, c in zip(names, ctab)}
        orange = dists["orange"]
        false_orange = dists["field"]
        line = dists["line"]
        cscore = (0.0 if false_orange <= orange or line <= orange
                  else 1.0 - orange / max(false_orange, 1e-9))
        print(
            f"frame {frame_i}: ball gt=({bx:.0f},{by:.0f}) nearest blob "
            f"{d[j]:.1f} mm away | circ={circ:.1f} score={score:.2f} "
            f"color_score={cscore:.3f} emitted_balls={got_balls}"
        )
        print(f"    disc-mean dists: " + ", ".join(
            f"{n}={v:.0f}" for n, v in dists.items()))
        gates = []
        if d[j] > 100:
            gates.append("NOT EXTRACTED (no blob near ball)")
        if score <= float(vc.min_score):
            gates.append(f"min_score ({score:.2f} <= {vc.min_score})")
        if cscore <= float(vc.min_confidence):
            gates.append(f"color score ({cscore:.3f} <= {vc.min_confidence})")
        print(f"    gates: {gates or 'none — ball should be emitted'}")
        frame_i += 1
        frame = cam.read_image()


if __name__ == "__main__":
    main()
