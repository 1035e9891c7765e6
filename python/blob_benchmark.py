#!/usr/bin/env python3
"""Aggregate [BlobMachine] lines from the blob benchmark over datasets.

Reports per-dataset and total blob/ball/bot position error ±stddev, the
worst-blob/percentile ratio (PPR), the error-to-field-scale ratio (EFSR) and
frame time (reference python/blob_benchmark.py:50-147).
"""
from __future__ import annotations

import argparse
import math
import sys
from collections import defaultdict
from pathlib import Path

from binary import parser_binary, run_binary
from dataset import parser_test_data, threaded_field_iter
from record import thread_local_ip
from visionsocket import VisionRecorder

BLOB_BENCHMARK_ENTRY = Path("vision_processor_tpu.app.blob_benchmark")


class AvgValue:
    def __init__(self, four_digits=False):
        self.total = 0.0
        self.count = 0
        self.four = four_digits

    def __iadd__(self, value):
        if not math.isnan(value):
            self.total += value
            self.count += 1
        return self

    def __str__(self):
        if self.count == 0:
            return " nan "
        v = self.total / self.count
        return f"{v: .4f}" if self.four else f"{v: .2f}"


def main():
    parser = parser_test_data(
        parser_binary(
            argparse.ArgumentParser(prog="blob benchmark"),
            default="vision_processor_tpu.app.blob_benchmark",
        )
    )
    parser.add_argument("--scenes_per_field", default=None, type=int)
    args = parser.parse_args()

    fields = [
        "frames", "blobs", "error", "sq_error", "worst_blob", "percentile",
        "balls", "ball_error", "ball_sq", "bots", "bot_error", "bot_sq",
        "field_scale", "processing_time",
    ]
    stats = {f: defaultdict(float) for f in fields}

    def consumer(dataset):
        print(f"Recording {dataset} blob benchmark")
        recorder = VisionRecorder(vision_ip=thread_local_ip())
        key = dataset.folder.parent.name

        def stdoutprocessor(line: str):
            if not line.startswith("[BlobMachine]"):
                return
            values = line.strip().split(" ")[1:]
            for name, value in zip(fields, values):
                stats[name][key] += float(value)

        limit = args.scenes_per_field or 10**9
        for video, _ in zip(dataset.images(), range(limit)):
            print(f"Processing {video}")
            run_binary(
                Path(str(args.binary)), recorder, dataset, video,
                stdoutconsumer=stdoutprocessor,
            )

    threaded_field_iter(args.data_folder, consumer, field_filter=args.field)

    def err_stddev(error, sq, n):
        try:
            return error / n, math.sqrt(n * sq - error**2) / n
        except (ZeroDivisionError, ValueError):
            return math.nan, math.nan

    totals = {
        name: AvgValue(name in ("ppr", "efsr"))
        for name in (
            "error", "stddev", "ball_error", "ball_stddev",
            "bot_error", "bot_stddev", "ppr", "efsr", "frametime",
        )
    }
    for key in stats["blobs"]:
        n = stats["blobs"][key]
        error, stddev = err_stddev(stats["error"][key], stats["sq_error"][key], n)
        ball_e, ball_s = err_stddev(
            stats["ball_error"][key], stats["ball_sq"][key], stats["balls"][key]
        )
        bot_e, bot_s = err_stddev(
            stats["bot_error"][key], stats["bot_sq"][key], stats["bots"][key]
        )
        denom = abs(stats["worst_blob"][key]) + abs(stats["percentile"][key])
        ppr = stats["worst_blob"][key] / denom if denom else math.nan
        efsr = (
            stats["error"][key] / stats["field_scale"][key]
            if stats["field_scale"][key] else math.nan
        )
        frametime = (
            1000 * stats["processing_time"][key] / stats["frames"][key]
            if stats["frames"][key] else math.nan
        )
        print(
            f"  {key: >11} blobs: {error: .2f}±{stddev: .2f} "
            f"balls: {ball_e: .2f}±{ball_s: .2f} bots: {bot_e: .2f}±{bot_s: .2f} "
            f"PPR {ppr: .4f} EFSR {efsr: .4f} Time {frametime: .2f}"
        )
        for name, value in (
            ("error", error), ("stddev", stddev), ("ball_error", ball_e),
            ("ball_stddev", ball_s), ("bot_error", bot_e),
            ("bot_stddev", bot_s), ("ppr", ppr), ("efsr", efsr),
            ("frametime", frametime),
        ):
            totals[name] += value

    print(
        f"Total blobs: {totals['error']}±{totals['stddev']} "
        f"balls: {totals['ball_error']}±{totals['ball_stddev']} "
        f"bots: {totals['bot_error']}±{totals['bot_stddev']} "
        f"PPR {totals['ppr']} EFSR {totals['efsr']} Time {totals['frametime']}"
    )


if __name__ == "__main__":
    sys.exit(main())
