"""Recorded-dataset model for the evaluation harness.

Dataset layout (compatible with the reference's test-data tree,
reference python/dataset.py:44-139):

    test-data/<field>/cam<N>/
        field.png          calibration frame
        geometry.yml       field geometry (+ camera calib for synthetic sets)
        <scene>.mp4/.png   recorded scenes
        <scene>.<binary>.json  recorded detections
        ssl-vision-config/config.yml  per-dataset processor config
"""
from __future__ import annotations

import argparse
import concurrent.futures
import multiprocessing
import sys
from pathlib import Path
from typing import Iterable
from xml.etree import ElementTree

import yaml

from visionsocket import VisionSocket  # noqa: F401  (path bootstrap)
from vision_processor_tpu.net.geometry_io import load_geometry
from vision_processor_tpu.proto import SSL_WrapperPacket


def parser_test_data(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    parser.add_argument("--data_folder", default="test-data", type=Path,
                        help="Data folder")
    parser.add_argument("--field", default="*", help="Field filter")
    return parser


def _merge(dst: dict, src: dict) -> None:
    for key, value in src.items():
        if key in dst and isinstance(value, dict) and isinstance(dst[key], dict):
            _merge(dst[key], value)
        else:
            dst[key] = value


class Dataset:
    def __init__(self, folder: Path):
        self.folder = Path(folder)

    @property
    def cam_id(self) -> int:
        try:
            return int(self.folder.name[3:])
        except ValueError:
            print(
                "[Dataset] cannot parse cam_id from folder name, using 0",
                file=sys.stderr,
            )
            return 0

    @property
    def field(self) -> Path:
        return self.folder / "field.png"

    @property
    def reference_geometry(self) -> SSL_WrapperPacket:
        return load_geometry(self.folder / "geometry.yml")

    @property
    def config_dir(self) -> Path:
        return self.folder / "ssl-vision-config"

    @property
    def ssl_config(self) -> Path:
        return self.config_dir / "robocup-ssl.xml"

    @property
    def processor_config(self) -> Path:
        return self.config_dir / "config.yml"

    def read_ssl_config(self) -> ElementTree.ElementTree:
        return ElementTree.parse(str(self.ssl_config))

    def write_ssl_config(self, tree: ElementTree.ElementTree) -> None:
        tree.write(str(self.ssl_config))

    def update_processor_config(self, **options) -> None:
        if self.processor_config.exists():
            config = yaml.safe_load(self.processor_config.read_text()) or {}
        else:
            config = {}
        _merge(config, options)
        config.setdefault("camera", {})
        config["cam_id"] = self.cam_id
        config["camera"]["driver"] = "OPENCV"
        self.processor_config.parent.mkdir(parents=True, exist_ok=True)
        with self.processor_config.open("w") as fh:
            yaml.dump(config, fh)

    def images(self) -> Iterable[Path]:
        yield from sorted(self.folder.glob("*.mp4"))
        for image in sorted(self.folder.glob("*.png")):
            if image != self.field:
                yield image

    def is_image_dataset(self) -> bool:
        return not any(self.folder.glob("*.mp4"))

    def __str__(self) -> str:
        return str(self.folder)


def iterate_field(field: Path) -> Iterable[Dataset]:
    for sub in field.iterdir():
        if sub.is_dir():
            yield Dataset(sub)


def iterate_fields(root: Path, field_filter: str = "*") -> Iterable[Dataset]:
    for field in root.glob(field_filter):
        if field.is_dir():
            yield from iterate_field(field)


def threaded_field_iter(root: Path, consumer, workers=None, field_filter="*"):
    """Run `consumer` over datasets, one thread per field
    (reference python/dataset.py:124-139)."""
    if workers == 1:
        for dataset in iterate_fields(root, field_filter):
            consumer(dataset)
        return
    if workers is None:
        workers = multiprocessing.cpu_count()
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=workers)
    futures = [
        pool.submit(consumer, dataset)
        for dataset in iterate_fields(root, field_filter)
    ]
    concurrent.futures.wait(futures)
    for fut in futures:
        exc = fut.exception()
        if exc is not None:
            raise exc
