#!/usr/bin/env python3
"""Multi-camera geometric consistency benchmark.

Runs the same single-frame scenes through two cameras' geometries, pairs
balls by mutual-nearest association and robots by id, and reports the mm
offsets plus the calibration model score
(reference python/overlap_benchmark.py:59-168).
"""
from __future__ import annotations

import argparse
import itertools
import json
import math
from collections import defaultdict
from pathlib import Path

from binary import parser_binary, run_binary
from blob_benchmark import AvgValue
from dataset import Dataset, iterate_field, parser_test_data
from visionsocket import VisionRecorder, parser_vision_network
from vision_processor_tpu.net.geometry_io import load_geometry


def shared_files(a: Path, b: Path, glob: str) -> set[str]:
    names = {p.name for p in a.glob(glob)}
    return {p.name for p in b.glob(glob) if p.name in names}


def is_video(path: Path) -> bool:
    with path.open() as fh:
        return len(json.load(fh)) > 1


def reproject(args, recorder, dataset: Dataset, geometry_name: str,
              detections_name: str):
    """Run the geometry benchmark binary against the dataset's field frame
    with the chosen geometry; returns (balls, yellow, blue, model_score)."""
    score = [1.0]

    def scan(line: str):
        if line.startswith("[Model score]"):
            score[0] = float(line.split(" ")[2].strip())
            print(dataset.folder.name, score, line, end="")

    run_binary(
        args.binary, recorder, dataset, dataset.field,
        geometry=load_geometry(dataset.folder / geometry_name),
        ground_truth=dataset.folder / detections_name,
        stdoutconsumer=scan,
    )
    detections = recorder.subfield("detection")
    if not detections:
        return [], [], [], score[0]
    det = detections[0]
    return list(det.balls), list(det.robots_yellow), list(det.robots_blue), score[0]


def pair_bots(a, b):
    by_id = {bot.robot_id: bot for bot in b}
    return [(bot, by_id[bot.robot_id]) for bot in a if bot.robot_id in by_id]


def mutual_nearest_balls(a_balls, b_balls):
    pairs = []
    for a_ball in a_balls:
        nearest_b = min(
            b_balls,
            key=lambda b: math.hypot(b.x - a_ball.x, b.y - a_ball.y),
            default=None,
        )
        if nearest_b is None:
            continue
        nearest_a = min(
            a_balls,
            key=lambda a2: math.hypot(nearest_b.x - a2.x, nearest_b.y - a2.y),
        )
        if nearest_a is a_ball:
            pairs.append((a_ball, nearest_b))
    return pairs


def main():
    parser = parser_test_data(
        parser_vision_network(
            parser_binary(
                argparse.ArgumentParser(prog="overlap benchmark"),
                default="vision_processor_tpu.app.geometry_benchmark",
            )
        )
    )
    parser.add_argument("--suffix", default="vision", help="Dataset suffix")
    args = parser.parse_args()

    recorder = VisionRecorder(args=args)
    score = defaultdict(lambda: defaultdict(float))
    elements = defaultdict(lambda: defaultdict(int))
    offset = defaultdict(lambda: defaultdict(lambda: [0.0, 0.0]))
    bot_error = defaultdict(lambda: defaultdict(float))
    bots_n = defaultdict(lambda: defaultdict(int))
    ball_error = defaultdict(lambda: defaultdict(float))
    balls_n = defaultdict(lambda: defaultdict(int))

    for field in args.data_folder.iterdir():
        if not field.is_dir():
            continue
        datasets = list(iterate_field(field))
        if len(datasets) < 2:
            continue
        print(f"Processing {field}")
        for a, b in itertools.combinations(datasets, 2):
            geometries = shared_files(a.folder, b.folder, "geometry*.yml")
            shared = shared_files(a.folder, b.folder, f"*.{args.suffix}.json")
            shared -= {f"geometry.{args.suffix}.json"}
            for det_name in shared:
                if is_video(a.folder / det_name) or is_video(b.folder / det_name):
                    continue
                for geom_name in geometries:
                    print(f"Overlapping {det_name}: {geom_name}")
                    da = reproject(args, recorder, a, geom_name, det_name)
                    db = reproject(args, recorder, b, geom_name, det_name)
                    score[geom_name][field] += da[3] + db[3]
                    elements[geom_name][field] += 2

                    b_err, b_off = 0.0, [0.0, 0.0]
                    n_balls = 0
                    for a_ball, b_ball in mutual_nearest_balls(da[0], db[0]):
                        dx, dy = a_ball.x - b_ball.x, a_ball.y - b_ball.y
                        b_err += math.hypot(dx, dy)
                        b_off[0] += dx
                        b_off[1] += dy
                        n_balls += 1
                    print(
                        f"  {b_err / n_balls if n_balls else math.nan: .2f} mm "
                        f"for {n_balls} balls"
                    )
                    if n_balls:
                        ball_error[geom_name][field] += b_err
                        offset[geom_name][field][0] += b_off[0]
                        offset[geom_name][field][1] += b_off[1]
                        balls_n[geom_name][field] += n_balls

                    r_err, r_off = 0.0, [0.0, 0.0]
                    n_bots = 0
                    for a_bot, b_bot in pair_bots(da[1], db[1]) + pair_bots(da[2], db[2]):
                        dx, dy = a_bot.x - b_bot.x, a_bot.y - b_bot.y
                        r_err += math.hypot(dx, dy)
                        r_off[0] += dx
                        r_off[1] += dy
                        n_bots += 1
                    print(
                        f"  {r_err / n_bots if n_bots else math.nan: .2f} mm "
                        f"for {n_bots} bots"
                    )
                    if n_bots:
                        bot_error[geom_name][field] += r_err
                        offset[geom_name][field][0] += r_off[0]
                        offset[geom_name][field][1] += r_off[1]
                        bots_n[geom_name][field] += n_bots

    for geom_name in offset:
        print(f"\n{geom_name}")
        g_bot = AvgValue()
        g_ball = AvgValue()
        g_score = AvgValue(True)
        for field in bot_error[geom_name]:
            be = bot_error[geom_name][field] / max(bots_n[geom_name][field], 1)
            le = ball_error[geom_name][field] / max(balls_n[geom_name][field], 1)
            total_n = bots_n[geom_name][field] + balls_n[geom_name][field]
            off = math.hypot(
                offset[geom_name][field][0] / max(total_n, 1),
                offset[geom_name][field][1] / max(total_n, 1),
            )
            sc = 1 - score[geom_name][field] / max(elements[geom_name][field], 1)
            print(
                f"  {field.name: >20}: {be: .2f} mm for "
                f"{bots_n[geom_name][field]: >3} bots {le: .2f} mm for "
                f"{balls_n[geom_name][field]: >3} balls, offset: {off: .2f} mm, "
                f"score {sc: .4f}"
            )
            g_bot += be
            g_ball += le
            g_score += sc
        print(f"Total: {g_bot} mm bots {g_ball} mm balls {g_score} score")


if __name__ == "__main__":
    main()
