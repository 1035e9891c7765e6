#!/usr/bin/env python3
"""Run auto-calibration per dataset and save the broadcast calibration to
`geometry.<binary>.yml` (reference python/geometry_record.py)."""
from __future__ import annotations

import argparse
import sys

import yaml
from google.protobuf.json_format import MessageToDict

from binary import parser_binary, run_binary
from dataset import parser_test_data, threaded_field_iter
from record import thread_local_ip
from visionsocket import VisionRecorder


def main():
    parser = parser_test_data(
        parser_binary(argparse.ArgumentParser(prog="geometry recorder"))
    )
    parser.add_argument("--scenes_per_field", default=None, type=int)
    args = parser.parse_args()

    def consumer(dataset):
        print(f"Recording {dataset} geometry")
        recorder = VisionRecorder(vision_ip=thread_local_ip())

        reference = dataset.reference_geometry
        del reference.geometry.calib[:]  # force recalibration

        run_binary(
            args.binary, recorder, dataset, dataset.field,
            geometry=reference,
            stdoutconsumer=lambda line: print(line, end=""),
        )

        geometries = [
            g for g in recorder.subfield("geometry") if len(g.calib) > 0
        ]
        if not geometries:
            print("No calibration received!", file=sys.stderr)
            return
        out = dataset.folder / f"geometry.{args.binary.name}.yml"
        with out.open("w") as fh:
            yaml.dump(
                MessageToDict(geometries[-1], preserving_proto_field_name=True),
                fh,
            )

    threaded_field_iter(args.data_folder, consumer, 1, field_filter=args.field)


if __name__ == "__main__":
    main()
