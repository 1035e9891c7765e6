"""Record detections per scene to `<scene>.<binary>.json`.

Re-runs a scene until the recorded detection count matches the video frame
count; isolates concurrent field evaluations with thread-local multicast
groups 224.83.83.<n> (reference python/record.py:30-82).
"""
from __future__ import annotations

import argparse
import json
import sys
import threading

import cv2

from binary import parser_binary, run_binary
from dataset import parser_test_data, threaded_field_iter
from visionsocket import VisionRecorder

_counter_lock = threading.RLock()
_counter = [1]
_local = threading.local()


def thread_local_ip() -> str:
    if not hasattr(_local, "ip"):
        with _counter_lock:
            _local.ip = f"224.83.83.{_counter[0]}"
            _counter[0] += 1
    return _local.ip


def main():
    parser = parser_test_data(parser_binary(argparse.ArgumentParser(prog="record")))
    parser.add_argument("--scenes_per_field", default=None, type=int)
    parser.add_argument("--out", default=None, help="Output name")
    parser.add_argument("--max_retries", default=5, type=int)
    args = parser.parse_args()
    out_name = args.out or args.binary.name

    def consumer(dataset):
        recorder = VisionRecorder(vision_ip=thread_local_ip())
        limit = args.scenes_per_field or 10**9
        for video, _ in zip(dataset.images(), range(limit)):
            print(f"Recording {video}")
            if video.suffix == ".mp4":
                cap = cv2.VideoCapture(str(video))
                frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
                upscale = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 1224
                cap.release()
            else:
                frames = 1
                upscale = False

            detections = []
            for _attempt in range(args.max_retries):
                run_binary(args.binary, recorder, dataset, video, upscale=upscale)
                detections = recorder.dict_subfield("detection")
                if len(detections) == frames:
                    break
                print(
                    f"{video}: detection count mismatch "
                    f"(expected {frames}, got {len(detections)}), retrying",
                    file=sys.stderr,
                )

            with video.with_suffix(f".{out_name}.json").open("w") as fh:
                json.dump(detections, fh)

    threaded_field_iter(args.data_folder, consumer, field_filter=args.field)


if __name__ == "__main__":
    main()
