"""Subprocess drivers for the vision binaries under evaluation.

Runs either this framework's processor (a python entry point), the reference
vision_processor, or ssl-vision against one recorded scene with a rewritten
per-dataset config and a 10 Hz geometry sender thread
(reference python/binary.py:32-94).
"""
from __future__ import annotations

import argparse
import subprocess
import sys
import threading
import time
from pathlib import Path

from dataset import Dataset
from visionsocket import VisionRecorder
from vision_processor_tpu.proto import SSL_WrapperPacket

PROCESSOR_ENTRY = [sys.executable, "-m", "vision_processor_tpu.app.main"]
REPO_ROOT = str(Path(__file__).resolve().parent.parent)


def _subprocess_env() -> dict:
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + ":" + env.get("PYTHONPATH", "")
    return env


def parser_binary(parser: argparse.ArgumentParser, default="vision_processor_tpu"):
    parser.add_argument("--binary", default=default, type=Path,
                        help="Vision binary (or 'vision_processor_tpu')")
    return parser


def binary_command(binary: Path, config: Path) -> list[str]:
    name = str(binary)
    if name in ("vision_processor_tpu", "tpu"):
        return PROCESSOR_ENTRY + [str(config)]
    if name.startswith("vision_processor_tpu."):
        return [sys.executable, "-m", name, str(config)]
    if name.endswith(".py"):
        return [sys.executable, name, str(config)]
    return [str(binary.absolute()), str(config)]


def run_ssl_vision(binary: Path, recorder: VisionRecorder, dataset: Dataset,
                   image: Path, upscale: bool = False):
    """Drive the original ssl-vision binary through its XML config."""
    tree = dataset.read_ssl_config()
    tree.find(".//Var[@name='camera index']").text = str(dataset.cam_id)
    tree.find(".//Var[@name='Video']/Var[@name='file']").text = str(
        image.relative_to(dataset.config_dir, walk_up=True)
    )
    tree.find(".//Var[@name='Video']/Var[@name='upscale']").text = str(
        upscale
    ).lower()
    for addr in tree.findall(".//Var[@name='Multicast Address']"):
        addr.text = recorder.address[0]
    tree.find(".//Var[@name='Multicast Port']").text = str(recorder.address[1])
    dataset.write_ssl_config(tree)

    with recorder:
        with subprocess.Popen(
            [str(binary.absolute()), "-s", "-c", "1"],
            cwd=str(dataset.config_dir),
            stdout=subprocess.PIPE,
            env={"QT_QPA_PLATFORM": "offscreen"},
        ) as proc:
            while True:
                line = proc.stdout.readline().decode()
                if line == "End of video stream reached\n" or not line:
                    break
            proc.terminate()
            proc.wait()
            if proc.returncode != 0:
                print(f"Nonzero return code: {proc.returncode}", file=sys.stderr)


def run_processor(binary: Path, recorder: VisionRecorder, dataset: Dataset,
                  image: Path, geometry: SSL_WrapperPacket | None = None,
                  ground_truth: Path | None = None,
                  stdoutconsumer=lambda line: None):
    dataset.update_processor_config(
        camera={"path": str(image)},
        debug={
            "wait_for_geometry": True,
            "ground_truth": str(
                image.with_suffix(".vision.json")
                if ground_truth is None
                else ground_truth
            ),
        },
        network={
            "vision_ip": recorder.address[0],
            "vision_port": recorder.address[1],
        },
        stream={"active": False},
        color=(
            {"reference_force": 0.3333, "history_force": 0.0}
            if dataset.is_image_dataset()
            else {}
        ),
    )

    if geometry is None:
        geometry = dataset.reference_geometry

    stop = threading.Event()

    def geometry_sender():
        while not stop.is_set():
            recorder.send(geometry)
            time.sleep(0.1)

    with recorder:
        with subprocess.Popen(
            binary_command(binary, dataset.processor_config),
            stdout=subprocess.PIPE,
            env=_subprocess_env(),
        ) as proc:
            sender = threading.Thread(target=geometry_sender)
            sender.start()
            while proc.poll() is None:
                stdoutconsumer(proc.stdout.readline().decode())
            stop.set()
            sender.join()
            if proc.returncode != 0:
                print(f"Nonzero return code: {proc.returncode}", file=sys.stderr)


def run_binary(binary: Path, recorder: VisionRecorder, dataset: Dataset,
               image: Path, upscale: bool = False, geometry=None,
               ground_truth=None, stdoutconsumer=lambda line: None):
    if binary.name == "vision":
        run_ssl_vision(binary, recorder, dataset, image, upscale=upscale)
    else:
        run_processor(
            binary, recorder, dataset, image,
            geometry=geometry, ground_truth=ground_truth,
            stdoutconsumer=stdoutconsumer,
        )
