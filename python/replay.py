#!/usr/bin/env python3
"""Replay recorded detection JSON + geometry to the multicast bus with
original timing (reference python/replay.py)."""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

from google.protobuf.json_format import ParseDict

from visionsocket import VisionSocket, parser_vision_network
from vision_processor_tpu.net.geometry_io import load_geometry
from vision_processor_tpu.proto import SSL_DetectionFrame, SSL_WrapperPacket


def main():
    parser = parser_vision_network(argparse.ArgumentParser(prog="replay"))
    parser.add_argument("geometry", help="Geometry configuration file")
    parser.add_argument("speed", type=float, help="Replay speed factor")
    parser.add_argument("detections", help="Vision detections JSON file")
    args = parser.parse_args()

    with open(args.detections) as fh:
        detections = json.load(fh)

    sock = VisionSocket(args=args)
    sock.send(load_geometry(Path(args.geometry)))

    timestamp = 0.0
    for det in detections:
        wrapper = SSL_WrapperPacket()
        wrapper.detection.CopyFrom(ParseDict(det, SSL_DetectionFrame()))
        sock.send(wrapper)
        next_time = float(det["t_capture"])
        time.sleep(max(0.0, (next_time - timestamp) * args.speed))
        timestamp = next_time


if __name__ == "__main__":
    main()
