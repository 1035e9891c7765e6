#!/usr/bin/env python3
"""Generate synthetic recorded datasets in the harness layout.

The reference repo ships no `test-data/`; this generator produces compatible
dataset trees with exact ground truth:

    test-data/<field>/cam<N>/
        field.png            empty-field calibration frame
        geometry.yml         field dimensions + camera calibration
        scene0.mp4           animated robots + ball
        scene0.vision.json   exact per-frame ground truth (record format)
        scene0.manual.json   same, as human-label stand-in
        ssl-vision-config/config.yml

Usage: python python/make_dataset.py [--out test-data] [--cams 2] [--frames 60]
"""
from __future__ import annotations

import argparse
import json
import math
from pathlib import Path

import cv2
import numpy as np
import yaml

from visionsocket import VisionSocket  # noqa: F401  (path bootstrap)
from vision_processor_tpu.io.synthetic import (
    Scene,
    SceneBall,
    SceneBot,
    render_rgb,
)
from vision_processor_tpu.models.camera import (
    CameraModel,
    visible_field_extent_estimation,
)
from vision_processor_tpu.net.geometry_io import geometry_from_dict

FIELD_CFG = {
    "field_length": 9000,
    "field_width": 6000,
    "goal_width": 1000,
    "goal_depth": 180,
    "goal_height": 160,
    "penalty_area_depth": 1000,
    "penalty_area_width": 2000,
    "goal_center_to_penalty_mark": 6000,
    "boundary_width": 300,
    "boundary_width_goal_line": 300,
    "center_circle_radius": 500,
    "line_thickness": 10,
    "ball_radius": 21.5,
    "max_robot_radius": 90.0,
}


def make_camera(cam_id: int, cam_amount: int, field, width=960, height=720):
    lo, hi = visible_field_extent_estimation(cam_id, cam_amount, field, False)
    model = CameraModel.initial_guess(
        np.array([width, height]), cam_id, cam_amount, 4500.0, field
    )
    model.distortion_k2 = 0.02
    return model, (lo, hi)


def animate(scene: Scene, t: float, lo, hi):
    """Move robots on small circles and roll the ball."""
    for i, bot in enumerate(scene.bots):
        cx = bot._cx + 200 * math.cos(0.8 * t + i)
        cy = bot._cy + 200 * math.sin(0.8 * t + i)
        bot.x, bot.y = cx, cy
        bot.orientation = bot._w0 + 0.5 * t
    for ball in scene.balls:
        ball.x = ball._cx + 400 * math.cos(0.5 * t)
        ball.y = ball._cy + 400 * math.sin(0.5 * t)


def ground_truth_frame(model, scene: Scene, frame_number: int, t: float,
                       cam_id: int, ball_radius: float) -> dict:
    frame = {
        "frame_number": frame_number,
        "t_capture": t,
        "t_sent": t,
        "camera_id": cam_id,
        "balls": [],
        "robots_yellow": [],
        "robots_blue": [],
    }
    for ball in scene.balls:
        px = model.field2image(np.array([ball.x, ball.y, 0.0]))
        frame["balls"].append(
            {
                "confidence": 1.0,
                "x": float(ball.x),
                "y": float(ball.y),
                "pixel_x": float(px[0]),
                "pixel_y": float(px[1]),
            }
        )
    for bot in scene.bots:
        px = model.field2image(np.array([bot.x, bot.y, bot.height]))
        entry = {
            "confidence": 1.0,
            "robot_id": bot.bot_id,
            "x": float(bot.x),
            "y": float(bot.y),
            "orientation": float(bot.orientation),
            "pixel_x": float(px[0]),
            "pixel_y": float(px[1]),
            "height": float(bot.height),
        }
        key = "robots_yellow" if bot.team == "yellow" else "robots_blue"
        frame[key].append(entry)
    return frame


def main():
    parser = argparse.ArgumentParser(prog="make_dataset")
    parser.add_argument("--out", default="test-data", type=Path)
    parser.add_argument("--field_name", default="synthetic")
    parser.add_argument("--cams", default=2, type=int)
    parser.add_argument("--frames", default=60, type=int)
    parser.add_argument("--fps", default=30.0, type=float)
    parser.add_argument("--scenes", default=1, type=int)
    parser.add_argument("--image_scenes", default=0, type=int,
                        help="additional single-frame PNG scenes")
    parser.add_argument("--seed", default=0, type=int)
    args = parser.parse_args()

    geometry = geometry_from_dict({"field": FIELD_CFG}).geometry
    field = geometry.field
    rng = np.random.default_rng(args.seed)

    for cam_id in range(args.cams):
        model, (lo, hi) = make_camera(cam_id, args.cams, field)
        folder = args.out / args.field_name / f"cam{cam_id}"
        folder.mkdir(parents=True, exist_ok=True)

        # geometry.yml: field + this camera's calibration
        calib = model.to_proto(cam_id)
        geo_yaml = {
            "field": dict(FIELD_CFG),
            "calib": [
                {
                    "camera_id": cam_id,
                    "focal_length": float(calib.focal_length),
                    "principal_point_x": float(calib.principal_point_x),
                    "principal_point_y": float(calib.principal_point_y),
                    "distortion": float(calib.distortion),
                    "q0": float(calib.q0),
                    "q1": float(calib.q1),
                    "q2": float(calib.q2),
                    "q3": float(calib.q3),
                    "tx": float(calib.tx),
                    "ty": float(calib.ty),
                    "tz": float(calib.tz),
                    "derived_camera_world_tx": float(calib.derived_camera_world_tx),
                    "derived_camera_world_ty": float(calib.derived_camera_world_ty),
                    "derived_camera_world_tz": float(calib.derived_camera_world_tz),
                    "pixel_image_width": int(calib.pixel_image_width),
                    "pixel_image_height": int(calib.pixel_image_height),
                }
            ],
        }
        (folder / "geometry.yml").write_text(yaml.dump(geo_yaml, sort_keys=False))

        # field.png: empty field for calibration
        empty = render_rgb(model, field, Scene(noise_sigma=1.0, seed=cam_id))
        cv2.imwrite(str(folder / "field.png"), empty[..., ::-1])

        (folder / "ssl-vision-config").mkdir(exist_ok=True)
        # per-dataset processor config: the calibration inputs the reference
        # requires operators to measure by hand (extent corner pixels, mount
        # height) come straight from the true model here
        lo_nb, hi_nb = visible_field_extent_estimation(
            cam_id, args.cams, field, False
        )
        corners = [
            [lo_nb[0], lo_nb[1]], [lo_nb[0], hi_nb[1]],
            [hi_nb[0], hi_nb[1]], [hi_nb[0], lo_nb[1]],
        ]
        corner_px = [
            [float(v) for v in model.field2image(np.array([c[0], c[1], 0.0]))]
            for c in corners
        ]
        (folder / "ssl-vision-config" / "config.yml").write_text(
            yaml.dump(
                {
                    "cam_id": cam_id,
                    "camera": {"driver": "OPENCV"},
                    "geometry": {
                        "camera_amount": args.cams,
                        "camera_height": 4500.0,
                        "line_corners": corner_px,
                    },
                },
                sort_keys=False,
            )
        )

        for scene_idx in range(args.scenes):
            n_bots = int(rng.integers(2, 5))
            bots = []
            for i in range(n_bots):
                bot = SceneBot(
                    bot_id=int(rng.integers(0, 16)),
                    team="yellow" if i % 2 == 0 else "blue",
                    x=float(rng.uniform(lo[0] + 600, hi[0] - 600)),
                    y=float(rng.uniform(lo[1] + 600, hi[1] - 600)),
                    orientation=float(rng.uniform(-3, 3)),
                )
                bot._cx, bot._cy, bot._w0 = bot.x, bot.y, bot.orientation
                bots.append(bot)
            ball = SceneBall(
                x=float((lo[0] + hi[0]) / 2), y=float((lo[1] + hi[1]) / 2)
            )
            ball._cx, ball._cy = ball.x, ball.y
            scene = Scene(bots=bots, balls=[ball], noise_sigma=1.5, seed=cam_id)

            video_path = folder / f"scene{scene_idx}.mp4"
            writer = cv2.VideoWriter(
                str(video_path),
                cv2.VideoWriter_fourcc(*"mp4v"),
                args.fps,
                (int(model.size[0]), int(model.size[1])),
            )
            truth = []
            for f in range(args.frames):
                t = f / args.fps
                animate(scene, t, lo, hi)
                rgb = render_rgb(model, field, scene)
                writer.write(rgb[..., ::-1])
                truth.append(
                    ground_truth_frame(
                        model, scene, f + 1, t, cam_id, field.ball_radius
                    )
                )
            writer.release()

            for suffix in ("vision", "manual"):
                with video_path.with_suffix(f".{suffix}.json").open("w") as fh:
                    json.dump(truth, fh)
            print(f"wrote {video_path} ({args.frames} frames, {n_bots} bots)")

    # shared single-frame scenes: one world scene per still index, with the
    # objects placed in the multi-camera overlap strip and rendered through
    # every camera — the input the cross-camera overlap benchmark needs
    for img_idx in range(args.image_scenes):
        n_bots = int(rng.integers(2, 4))
        bots = []
        ids = rng.permutation(16)
        for i in range(n_bots):
            bots.append(
                SceneBot(
                    bot_id=int(ids[i]),
                    team="yellow" if i % 2 == 0 else "blue",
                    x=float(rng.uniform(-200, 200)),
                    y=float(rng.uniform(-2000, 2000)),
                    orientation=float(rng.uniform(-3, 3)),
                )
            )
        ball = SceneBall(
            x=float(rng.uniform(-200, 200)), y=float(rng.uniform(-2000, 2000))
        )
        scene = Scene(bots=bots, balls=[ball], noise_sigma=1.5, seed=img_idx)
        for cam_id in range(args.cams):
            model, _ = make_camera(cam_id, args.cams, field)
            folder = args.out / args.field_name / f"cam{cam_id}"
            rgb = render_rgb(model, field, scene)
            img_path = folder / f"still{img_idx}.png"
            cv2.imwrite(str(img_path), rgb[..., ::-1])
            truth = [
                ground_truth_frame(model, scene, 1, 0.0, cam_id, field.ball_radius)
            ]
            for suffix in ("vision", "manual"):
                with img_path.with_suffix(f".{suffix}.json").open("w") as fh:
                    json.dump(truth, fh)
            print(f"wrote {img_path} ({n_bots} bots, shared scene)")


if __name__ == "__main__":
    main()
