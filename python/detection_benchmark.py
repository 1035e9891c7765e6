#!/usr/bin/env python3
"""Recall/precision evaluation of recorded detection JSONs.

Ground truth is the `manual` record when present; otherwise visibility is
derived by hysteresis voting across all recorded binaries (±15 counter,
reference python/detection_benchmark.py:26-228). Reports per-dataset, per
video-vs-image breakdowns and the worst video/type.
"""
from __future__ import annotations

import argparse
import json
import math
from collections import defaultdict
from statistics import fmean

from dataset import Dataset, parser_test_data, threaded_field_iter

ALL_TYPES = {"ball"} | {f"y{i}" for i in range(16)} | {f"b{i}" for i in range(16)}


def frame_objects(frame: dict, as_set=True):
    objects = []
    if frame.get("balls"):
        objects.append("ball")
    for bot in frame.get("robots_yellow", []) or []:
        objects.append("y" + str(bot.get("robot_id", 0)))
    for bot in frame.get("robots_blue", []) or []:
        objects.append("b" + str(bot.get("robot_id", 0)))
    return set(objects) if as_set else objects


def nanmean(values):
    values = [v for v in values if not (isinstance(v, float) and math.isnan(v))]
    return fmean(values) if values else math.nan


def main():
    args = parser_test_data(
        argparse.ArgumentParser(prog="detection benchmark")
    ).parse_args()

    # [binary][dataset-dir] scalars, [binary][dataset][cam][video][type] counts
    frametimes = defaultdict(lambda: defaultdict(float))
    frames = defaultdict(lambda: defaultdict(int))
    tp = defaultdict(lambda: defaultdict(lambda: defaultdict(lambda: defaultdict(lambda: defaultdict(int)))))
    fp = defaultdict(lambda: defaultdict(lambda: defaultdict(lambda: defaultdict(lambda: defaultdict(int)))))
    fn = defaultdict(lambda: defaultdict(lambda: defaultdict(lambda: defaultdict(lambda: defaultdict(int)))))

    def consumer(dataset: Dataset):
        for video in dataset.images():
            print(f"Processing {video}")
            records = {}
            for path in video.parent.glob(video.stem + ".*.json"):
                binary = path.stem.split(".")[-1]
                with path.open() as fh:
                    records[binary] = json.load(fh)
            if not records:
                continue

            for binary, recs in records.items():
                frames[binary][dataset.folder.parent] += len(recs)
                for det in recs:
                    frametimes[binary][dataset.folder.parent] += float(
                        det.get("t_sent", 0)
                    ) - float(det.get("t_capture", 0))

            n_frames = max(len(r) for r in records.values())
            binaries = set(records)
            c_tp = defaultdict(lambda: defaultdict(int))
            c_fp = defaultdict(lambda: defaultdict(int))
            c_fn = defaultdict(lambda: defaultdict(int))

            if "manual" in records:
                for i in range(n_frames):
                    for binary in binaries:
                        visible = frame_objects(records["manual"][i], as_set=False)
                        detected = frame_objects(records[binary][i], as_set=False)
                        for obj in detected:
                            if obj in visible:
                                visible.remove(obj)
                                c_tp[binary][obj] += 1
                            else:
                                c_fp[binary][obj] += 1
                        for obj in visible:
                            c_fn[binary][obj] += 1
            else:
                # consensus: an object is "visible" while its hysteresis
                # counter is positive; every binary's detections vote
                visibility = defaultdict(int)
                for i in range(n_frames):
                    visible = {k for k, v in visibility.items() if v > 0}
                    union = set()
                    for binary in binaries:
                        objects = frame_objects(records[binary][i])
                        for obj in visible & objects:
                            c_tp[binary][obj] += 1
                        for obj in visible - objects:
                            c_fn[binary][obj] += 1
                        for obj in objects - visible:
                            c_fp[binary][obj] += 1
                        union |= objects
                    for obj in ALL_TYPES:
                        delta = 1 if obj in union else -1
                        visibility[obj] = min(max(visibility[obj] + delta, -15), 15)

            for binary in binaries:
                for obj in ALL_TYPES:
                    for counter, store in ((c_tp, tp), (c_fp, fp), (c_fn, fn)):
                        if counter[binary][obj]:
                            store[binary][dataset.folder.parent][
                                dataset.folder.name
                            ][video][obj] = counter[binary][obj]

    try:
        threaded_field_iter(args.data_folder, consumer, 1, field_filter=args.field)
    except KeyboardInterrupt:
        pass

    def count(tree, video_filter=None, object_filter=None):
        total = 0
        for videos in tree.values():
            for video, objects in videos.items():
                if video_filter is not None and video != video_filter:
                    continue
                for obj, n in objects.items():
                    if object_filter is None or obj == object_filter:
                        total += n
        return total

    def rate(binary, other, dataset_filter=None, video_filter=None, object_filter=None):
        """mean over datasets of tp / (tp + other)."""
        values = []
        keys = set(tp[binary]) | set(other[binary])
        for ds in keys:
            if dataset_filter is not None and ds != dataset_filter:
                continue
            t = count(tp[binary][ds], video_filter, object_filter)
            o = count(other[binary][ds], video_filter, object_filter)
            if t + o:
                values.append(t / (t + o))
        return nanmean(values)

    for binary in tp:
        print(f"--- {binary} ---")
        print(
            f"Total Recall {rate(binary, fn): .4f} "
            f"Precision {rate(binary, fp): .4f}"
        )
        img_r, img_p, vid_r, vid_p = [], [], [], []
        for ds in tp[binary]:
            recall = rate(binary, fn, ds)
            precision = rate(binary, fp, ds)
            if not list(ds.glob("*/*.mp4")):
                img_r.append(recall)
                img_p.append(precision)
            else:
                vid_r.append(recall)
                vid_p.append(precision)
            try:
                ft = 1000 * frametimes[binary][ds] / frames[binary][ds]
            except ZeroDivisionError:
                ft = math.nan
            print(
                f"  Dataset {ds.name: >11} Recall {recall: .4f} "
                f"Precision {precision: .4f} Frametime {ft: .2f}ms"
            )
        print(f"Video Recall {nanmean(vid_r): .4f} Precision {nanmean(vid_p): .4f}")
        print(f"Image Recall {nanmean(img_r): .4f} Precision {nanmean(img_p): .4f}")

        worst_video = (None, 1.0)
        for ds in tp[binary]:
            for cam in tp[binary][ds]:
                for video in tp[binary][ds][cam]:
                    r = rate(binary, fn, ds, video)
                    if not math.isnan(r) and r < worst_video[1]:
                        worst_video = (video, r)
        print(f"Worst video {worst_video[0]} Recall {worst_video[1]: .4f}")

        worst_type = (None, 1.0)
        seen_types = {
            obj
            for cams in tp[binary].values()
            for videos in cams.values()
            for objects in videos.values()
            for obj in objects
        }
        for obj in seen_types:
            r = rate(binary, fn, object_filter=obj)
            if not math.isnan(r) and r < worst_type[1]:
                worst_type = (obj, r)
        print(f"Worst type {worst_type[0]} Recall {worst_type[1]: .4f}")
        print()


if __name__ == "__main__":
    main()
