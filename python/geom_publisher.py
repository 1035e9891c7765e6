#!/usr/bin/env python3
"""Publish field geometry on the vision bus at 1 Hz and absorb camera
calibrations broadcast by the processors (reference python/geom_publisher.py).

Usage: python python/geom_publisher.py geometry.yml
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

from visionsocket import VisionSocket, parser_vision_network  # noqa: F401
from vision_processor_tpu.net.geometry_io import load_geometry, yaml_load
from vision_processor_tpu.proto import SSL_SOURCE_VISION_PROCESSOR


def main():
    parser = argparse.ArgumentParser(prog="geometry publisher")
    parser.add_argument("config", default="geometry.yml",
                        help="Geometry configuration file")
    args = parser.parse_args()

    wrapper = load_geometry(Path(args.config))
    wrapper.source = SSL_SOURCE_VISION_PROCESSOR
    calib = wrapper.geometry.calib

    config = yaml_load(Path(args.config))
    sock = VisionSocket(
        vision_ip=config.get("vision_ip", "224.5.23.2"),
        vision_port=config.get("vision_port", 10006),
    )

    def absorb(received):
        if not received.HasField("geometry"):
            return
        for camera in received.geometry.calib:
            for existing in calib:
                if existing.camera_id == camera.camera_id:
                    if existing.SerializeToString(
                        deterministic=True
                    ) != camera.SerializeToString(deterministic=True):
                        existing.CopyFrom(camera)
                        print(f"Updated camera {camera.camera_id} calibration")
                    break
            else:
                calib.append(camera)
                print(f"Added camera {camera.camera_id} calibration")

    sock.consume = absorb
    with sock:
        while True:
            sock.send(wrapper)
            time.sleep(1.0)


if __name__ == "__main__":
    main()
