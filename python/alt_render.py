#!/usr/bin/env python3
"""Independent scene renderer for renderer-independent validation.

`vision_processor_tpu.io.synthetic` renders by INVERSE mapping: every image
pixel is projected onto the z-planes and painted by exact membership tests,
with flat colors and iid Gaussian noise. Every quality gate in the repo
ultimately consumed those pixels (the perturbation suite degrades them, the
codec round-trip re-encodes them — but shapes, edges and color statistics
still came from the same rasterizer).

This module is a second renderer, built the opposite way, so no pixel
statistic is shared with the primary one:

- FORWARD painting: the field (z=0) and each robot cover (z=height) are
  painted onto their own planar canvases with OpenCV's anti-aliased
  primitives, then pulled into the camera through bilinear `cv2.remap`
  along the exact camera model. Edges are soft and resampled, not exact
  per-pixel set membership.
- Scene statistics: mottled carpet texture (spatially correlated, not iid),
  per-blob color and radius jitter, radially shaded ball and cover, soft
  contact shadows under robots.
- Photometrics: directional illumination gradient across the field,
  cos^4-style vignette, optics blur, Poisson shot noise (signal-dependent,
  not additive Gaussian), and a slightly different base palette.

The CLI emits the standard dataset layout (make_dataset.py's), so the whole
evaluation harness — record.py -> detection_benchmark.py / blob_benchmark.py
— runs unchanged on footage the primary renderer never touched.

Usage: python python/alt_render.py [--out test-data-alt] [--cams 2]
                                   [--frames 40]
"""
from __future__ import annotations

import argparse
import json
import math
from pathlib import Path

import cv2
import numpy as np
import yaml

from make_dataset import (
    FIELD_CFG,
    animate,
    ground_truth_frame,
    make_camera,
)
from visionsocket import VisionSocket  # noqa: F401  (path bootstrap)
from vision_processor_tpu.io.synthetic import Scene, SceneBall, SceneBot
from vision_processor_tpu.models.camera import (
    visible_field_extent_estimation,
)
from vision_processor_tpu.models.pattern import (
    CENTER_BLOB_RADIUS,
    PATTERNS,
    PATTERN_POS,
    SIDE_BLOB_RADIUS,
)
from vision_processor_tpu.net.geometry_io import geometry_from_dict

# Palette intentionally NOT identical to io/synthetic.py's — the adaptive
# color update must absorb it from the references, like on a real field.
CARPET = (45, 105, 50)
LINE = (192, 196, 188)
BALL = (238, 118, 38)
COVER = (28, 28, 30)
YELLOW = (222, 188, 42)
BLUE = (44, 84, 218)
GREEN = (52, 208, 122)
PINK = (226, 82, 152)

CANVAS_RES = 2.5  # field-canvas mm per px
BOT_RES = 1.0  # robot-canvas mm per px
BOT_MARGIN = 110.0  # mm around the bot center kept on its canvas


def _col(color) -> tuple:
    """OpenCV color tuple from any array-like (cv2 rejects numpy scalars)."""
    return tuple(float(c) for c in color)


def _jitter(rng, color, sigma=5.0):
    return tuple(
        float(np.clip(c + rng.normal(0.0, sigma), 0, 255)) for c in color
    )


def _field_canvas(field, scene: Scene, rng) -> tuple[np.ndarray, float, float]:
    """Paint the z=0 plane: textured carpet, AA markings, shaded ball,
    contact shadows. Returns (canvas f32 RGB, x0, y0) with canvas[i, j]
    covering field point (x0 + j*CANVAS_RES, y0 + i*CANVAS_RES)."""
    margin = 700.0
    x0 = -(field.field_length / 2 + margin)
    y0 = -(field.field_width / 2 + margin)
    w = int(round(-2 * x0 / CANVAS_RES))
    h = int(round(-2 * y0 / CANVAS_RES))

    # carpet: base + low-frequency mottling + fiber grain (correlated)
    canvas = np.empty((h, w, 3), np.float32)
    canvas[:] = CARPET
    mottle = cv2.resize(
        rng.normal(0.0, 9.0, (h // 64 + 2, w // 64 + 2)).astype(np.float32),
        (w, h), interpolation=cv2.INTER_CUBIC,
    )
    grain = cv2.GaussianBlur(
        rng.normal(0.0, 3.0, (h, w)).astype(np.float32), (0, 0), 1.2
    )
    canvas += (mottle + grain)[..., None]

    def to_px(p):
        return (
            int(round((p[0] - x0) / CANVAS_RES)),
            int(round((p[1] - y0) / CANVAS_RES)),
        )

    thick = max(1, int(round(field.line_thickness / CANVAS_RES)))
    for line in field.field_lines:
        cv2.line(canvas, to_px((line.p1.x, line.p1.y)),
                 to_px((line.p2.x, line.p2.y)), LINE, thick, cv2.LINE_AA)
    for arc in field.field_arcs:
        c = to_px((arc.center.x, arc.center.y))
        r = int(round(arc.radius / CANVAS_RES))
        cv2.ellipse(canvas, c, (r, r), 0.0, math.degrees(arc.a1),
                    math.degrees(arc.a2), LINE, thick, cv2.LINE_AA)

    # soft contact shadow under every robot (painted before the ball so a
    # nearby ball stays bright)
    shadow = np.zeros((h, w), np.float32)
    for bot in scene.bots:
        cv2.circle(shadow, to_px((bot.x, bot.y)),
                   int(round(105.0 / CANVAS_RES)), 0.35, -1, cv2.LINE_AA)
    shadow = cv2.GaussianBlur(shadow, (0, 0), 3.0)
    canvas *= (1.0 - shadow)[..., None]

    # ball: radially shaded sphere + its own soft shadow
    for ball in scene.balls:
        bx, by = to_px((ball.x, ball.y))
        r = max(2, int(round(ball.radius / CANVAS_RES)))
        sh = np.zeros((h, w), np.float32)
        cv2.circle(sh, (bx + r // 2, by + r // 2), r + 1, 0.3, -1,
                   cv2.LINE_AA)
        canvas *= (1.0 - cv2.GaussianBlur(sh, (0, 0), 1.5))[..., None]
        base = np.asarray(_jitter(rng, BALL), np.float32)
        # darker rim, brighter offset core: three AA circles
        cv2.circle(canvas, (bx, by), r, _col(base * 0.72), -1, cv2.LINE_AA)
        cv2.circle(canvas, (bx, by), max(1, int(r * 0.8)), _col(base), -1,
                   cv2.LINE_AA)
        cv2.circle(canvas, (bx - r // 3, by - r // 3), max(1, int(r * 0.45)),
                   _col(np.minimum(base * 1.18, 255.0)), -1, cv2.LINE_AA)

    return canvas, x0, y0


def _bot_canvas(bot: SceneBot, rng) -> tuple[np.ndarray, np.ndarray]:
    """Paint one robot's cover plane (z=height) on a local canvas.
    Returns (rgb f32, alpha f32) with canvas center at the bot center and
    +x/+y in FIELD axes (orientation already applied to the blobs)."""
    n = int(round(2 * BOT_MARGIN / BOT_RES))
    rgb = np.zeros((n, n, 3), np.float32)
    alpha = np.zeros((n, n), np.float32)
    c = n // 2

    def to_px(dx, dy):
        return (int(round(c + dx / BOT_RES)), int(round(c + dy / BOT_RES)))

    cover_r = int(round(90.0 / BOT_RES))
    cv2.circle(alpha, (c, c), cover_r, 1.0, -1, cv2.LINE_AA)
    cv2.circle(rgb, (c, c), cover_r, _jitter(rng, COVER, 2.0), -1,
               cv2.LINE_AA)
    # radial shading: slightly brighter center (matte plastic under hall
    # lights), brushed angular streaks
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    rr = np.sqrt((xx - c) ** 2 + (yy - c) ** 2) * (BOT_RES / 90.0)
    shade = 1.0 + 0.25 * np.clip(1.0 - rr, 0.0, 1.0) ** 2
    streak = 1.0 + 0.03 * np.sin(np.arctan2(yy - c, xx - c) * 9.0)
    rgb *= (shade * streak)[..., None]

    rot = np.array(
        [
            [math.cos(bot.orientation), -math.sin(bot.orientation)],
            [math.sin(bot.orientation), math.cos(bot.orientation)],
        ]
    )
    pattern = int(PATTERNS[bot.bot_id])
    center_color = YELLOW if bot.team == "yellow" else BLUE
    blobs = [(np.zeros(2), CENTER_BLOB_RADIUS, center_color)]
    for slot in range(1, 5):
        color = GREEN if (pattern >> (4 - slot)) & 1 else PINK
        blobs.append((rot @ PATTERN_POS[slot], SIDE_BLOB_RADIUS, color))
    for off, radius, color in blobs:
        r_px = max(1, int(round(radius * rng.uniform(0.93, 1.05) / BOT_RES)))
        base = np.asarray(_jitter(rng, color), np.float32)
        p = to_px(off[0], off[1])
        cv2.circle(rgb, p, r_px, _col(base * 0.9), -1, cv2.LINE_AA)
        cv2.circle(rgb, p, max(1, int(r_px * 0.78)), _col(base), -1,
                   cv2.LINE_AA)
    return rgb, alpha


def alt_render_rgb(model, field, scene: Scene, rng=None) -> np.ndarray:
    """Render the scene to (H, W, 3) uint8 RGB with the independent
    forward-painting pipeline (module docstring)."""
    if rng is None:
        rng = np.random.default_rng(scene.seed)
    w, h = int(model.size[0]), int(model.size[1])
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    px = np.stack([xs, ys], axis=-1)

    canvas, x0, y0 = _field_canvas(field, scene, rng)
    ground = model.image2field(px, 0.0)[..., :2]
    bad = ~np.isfinite(ground[..., 0])
    g = np.nan_to_num(ground, nan=1e7)
    map_x = ((g[..., 0] - x0) / CANVAS_RES).astype(np.float32)
    map_y = ((g[..., 1] - y0) / CANVAS_RES).astype(np.float32)
    img = cv2.remap(canvas, map_x, map_y, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_CONSTANT, borderValue=(68, 70, 72))
    img[bad] = (68, 70, 72)

    # robot covers: composite through each bot's plane with AA alpha
    heights = sorted({bot.height for bot in scene.bots})
    planes = {
        hh: np.nan_to_num(model.image2field(px, hh)[..., :2], nan=1e7)
        for hh in heights
    }
    for bot in scene.bots:
        plane = planes[bot.height]
        rel_x = (plane[..., 0] - bot.x).astype(np.float32)
        rel_y = (plane[..., 1] - bot.y).astype(np.float32)
        # cheap bounding box in image space to keep remap local
        inside = (np.abs(rel_x) < BOT_MARGIN) & (np.abs(rel_y) < BOT_MARGIN)
        if not inside.any():
            continue
        ii, jj = np.nonzero(inside)
        r0, r1 = ii.min(), ii.max() + 1
        c0, c1 = jj.min(), jj.max() + 1
        brgb, balpha = _bot_canvas(bot, rng)
        n = balpha.shape[0]
        mx = (rel_x[r0:r1, c0:c1] + BOT_MARGIN) / BOT_RES
        my = (rel_y[r0:r1, c0:c1] + BOT_MARGIN) / BOT_RES
        patch_rgb = cv2.remap(brgb, mx, my, cv2.INTER_LINEAR)
        patch_a = cv2.remap(balpha, mx, my, cv2.INTER_LINEAR)[..., None]
        img[r0:r1, c0:c1] = (
            patch_a * patch_rgb + (1.0 - patch_a) * img[r0:r1, c0:c1]
        )

    # directional hall lighting across the field + lens vignette
    illum = 1.0 + 0.07 * np.tanh(g[..., 0] / (field.field_length / 2 + 1.0))
    cx, cy = float(model.principal_point[0]), float(model.principal_point[1])
    r2 = ((xs - cx) ** 2 + (ys - cy) ** 2) / (cx * cx + cy * cy)
    vignette = 1.0 - 0.18 * r2
    img *= (illum * vignette).astype(np.float32)[..., None]

    # optics blur + signal-dependent shot noise
    img = cv2.GaussianBlur(img, (0, 0), 0.55)
    electrons = np.maximum(img, 0.0) * 4.0
    img = rng.poisson(electrons).astype(np.float32) / 4.0
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    parser = argparse.ArgumentParser(prog="alt_render")
    parser.add_argument("--out", default="test-data-alt", type=Path)
    parser.add_argument("--field_name", default="altsynth")
    parser.add_argument("--cams", default=2, type=int)
    parser.add_argument("--frames", default=40, type=int)
    parser.add_argument("--fps", default=30.0, type=float)
    parser.add_argument("--image_scenes", default=2, type=int)
    parser.add_argument("--seed", default=0, type=int)
    args = parser.parse_args()

    geometry = geometry_from_dict({"field": FIELD_CFG}).geometry
    field = geometry.field
    rng = np.random.default_rng(args.seed)

    for cam_id in range(args.cams):
        model, (lo, hi) = make_camera(cam_id, args.cams, field)
        folder = args.out / args.field_name / f"cam{cam_id}"
        folder.mkdir(parents=True, exist_ok=True)

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
                    "derived_camera_world_tx": float(
                        calib.derived_camera_world_tx),
                    "derived_camera_world_ty": float(
                        calib.derived_camera_world_ty),
                    "derived_camera_world_tz": float(
                        calib.derived_camera_world_tz),
                    "pixel_image_width": int(calib.pixel_image_width),
                    "pixel_image_height": int(calib.pixel_image_height),
                }
            ],
        }
        (folder / "geometry.yml").write_text(
            yaml.dump(geo_yaml, sort_keys=False))

        empty = alt_render_rgb(model, field, Scene(seed=cam_id), rng)
        cv2.imwrite(str(folder / "field.png"), empty[..., ::-1])

        (folder / "ssl-vision-config").mkdir(exist_ok=True)
        # calibration inputs the reference requires operators to measure by
        # hand (extent corner pixels, mount height) come from the true model,
        # like make_dataset.py — so geometry_record.py runs on this footage
        lo_nb, hi_nb = visible_field_extent_estimation(
            cam_id, args.cams, field, False
        )
        corners = [
            [lo_nb[0], lo_nb[1]], [lo_nb[0], hi_nb[1]],
            [hi_nb[0], hi_nb[1]], [hi_nb[0], lo_nb[1]],
        ]
        corner_px = [
            [float(v)
             for v in model.field2image(np.array([c[0], c[1], 0.0]))]
            for c in corners
        ]
        (folder / "ssl-vision-config" / "config.yml").write_text(
            yaml.dump(
                {
                    "cam_id": cam_id,
                    "camera": {"driver": "OPENCV"},
                    "geometry": {
                        "camera_amount": args.cams,
                        "camera_height": float(model.pos[2]),
                        "line_corners": corner_px,
                    },
                },
                sort_keys=False,
            )
        )

        n_bots = int(rng.integers(2, 5))
        bots = []
        # distinct ids per team: duplicate ids make the ground truth
        # ambiguous (and never occur in a real SSL game)
        id_pool = {"yellow": list(rng.permutation(16)),
                   "blue": list(rng.permutation(16))}
        for i in range(n_bots):
            team = "yellow" if i % 2 == 0 else "blue"
            bot = SceneBot(
                bot_id=int(id_pool[team].pop()),
                team=team,
                x=float(rng.uniform(lo[0] + 600, hi[0] - 600)),
                y=float(rng.uniform(lo[1] + 600, hi[1] - 600)),
                orientation=float(rng.uniform(-3, 3)),
            )
            bot._cx, bot._cy, bot._w0 = bot.x, bot.y, bot.orientation
            bots.append(bot)
        ball = SceneBall(x=float((lo[0] + hi[0]) / 2),
                         y=float((lo[1] + hi[1]) / 2))
        ball._cx, ball._cy = ball.x, ball.y
        scene = Scene(bots=bots, balls=[ball], seed=cam_id)

        video_path = folder / "scene0.mp4"
        writer = cv2.VideoWriter(
            str(video_path), cv2.VideoWriter_fourcc(*"mp4v"), args.fps,
            (int(model.size[0]), int(model.size[1])),
        )
        truth = []
        for f in range(args.frames):
            t = f / args.fps
            animate(scene, t, lo, hi)
            rgb = alt_render_rgb(model, field, scene, rng)
            writer.write(rgb[..., ::-1])
            truth.append(
                ground_truth_frame(model, scene, f + 1, t, cam_id,
                                   field.ball_radius)
            )
        writer.release()
        for suffix in ("vision", "manual"):
            with video_path.with_suffix(f".{suffix}.json").open("w") as fh:
                json.dump(truth, fh)
        print(f"wrote {video_path} ({args.frames} frames, {n_bots} bots, "
              "independent renderer)")

    # shared single-frame scenes in the multi-camera overlap strip,
    # rendered through every camera — the cross-camera overlap
    # benchmark's input (mirrors make_dataset.py's still scenes)
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
            x=float(rng.uniform(-200, 200)),
            y=float(rng.uniform(-2000, 2000)),
        )
        scene = Scene(bots=bots, balls=[ball], seed=img_idx)
        for cam_id in range(args.cams):
            model, _ = make_camera(cam_id, args.cams, field)
            folder = args.out / args.field_name / f"cam{cam_id}"
            rgb = alt_render_rgb(model, field, scene)
            img_path = folder / f"still{img_idx}.png"
            cv2.imwrite(str(img_path), rgb[..., ::-1])
            truth = [
                ground_truth_frame(model, scene, 1, 0.0, cam_id,
                                   field.ball_radius)
            ]
            for suffix in ("vision", "manual"):
                with img_path.with_suffix(f".{suffix}.json").open("w") as fh:
                    json.dump(truth, fh)
            print(f"wrote {img_path} ({n_bots} bots, shared scene)")


if __name__ == "__main__":
    main()
