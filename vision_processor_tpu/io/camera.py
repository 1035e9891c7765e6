"""Camera drivers: frame sources for the pipeline.

Driver surface mirrors the reference CameraDriver interface
(reference src/driver/cameradriver.h:35-47): read_image / format /
expected_frametime / get_time, with get_time virtualized for file replay so
recorded runs are deterministic (reference src/driver/opencvdriver.cpp:82-89).

Drivers:
* OpenCVDriver  — video files, image files, v4l2 devices (BGR or re-mosaiced
                  Bayer for parity with recorded datasets).
* SyntheticDriver — renders scenes on the fly (the dataset-free oracle).
* Vendor SDK drivers (Spinnaker / mvIMPACT) are site-specific native
  dependencies; the driver registry accepts external registrations for them.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from ..utils.config import CameraSection
from ..utils.log import get_logger
from .synthetic import Scene, render_raw

log = get_logger(__name__)


@dataclass
class RawFrame:
    data: np.ndarray  # (2H, 2W) bayer uint8 or (H, W, 3) bgr uint8
    fmt: str  # RGGB / GRBG / BGR
    width: int  # camera-model (half for bayer) resolution
    height: int
    timestamp: float = 0.0  # camera hardware timestamp, 0 if unsupported


class CameraDriver:
    def read_image(self) -> RawFrame | None:
        raise NotImplementedError

    @property
    def fmt(self) -> str:
        raise NotImplementedError

    def expected_frametime(self) -> float:
        return 1.0 / 30.0

    def get_time(self) -> float:
        from ..net.udp import get_real_time

        return get_real_time()

    def close(self) -> None:
        pass


class OpenCVDriver(CameraDriver):
    """File replay (video/image) and v4l2 capture via OpenCV.

    File time is frame_index / fps for reproducible replays. Frames are
    delivered as BGR; the camera model then runs at full file resolution.
    """

    def __init__(self, cfg: CameraSection):
        import cv2

        self._cv2 = cv2
        self._image = None
        self._cap = None
        self._frame_idx = 0
        self._fps = 30.0
        self._is_file = False

        path = cfg.path
        if path is not None and Path(path).suffix.lower() in (
            ".png", ".jpg", ".jpeg", ".bmp",
        ):
            self._image = cv2.imread(str(path), cv2.IMREAD_COLOR)
            if self._image is None:
                raise FileNotFoundError(path)
            self._is_file = True
        else:
            self._cap = cv2.VideoCapture(path if path is not None else cfg.id)
            if not self._cap.isOpened():
                raise RuntimeError(f"cannot open camera source {path or cfg.id}")
            fps = self._cap.get(cv2.CAP_PROP_FPS)
            if fps and fps > 0:
                self._fps = fps
            self._is_file = path is not None
            if cfg.width:
                self._cap.set(cv2.CAP_PROP_FRAME_WIDTH, cfg.width)
            if cfg.height:
                self._cap.set(cv2.CAP_PROP_FRAME_HEIGHT, cfg.height)

    @property
    def fmt(self) -> str:
        return "BGR"

    def expected_frametime(self) -> float:
        return 1.0 / self._fps

    def get_time(self) -> float:
        if self._is_file:
            return self._frame_idx / self._fps
        return super().get_time()

    def read_image(self) -> RawFrame | None:
        if self._image is not None:
            # image files replay exactly one frame (single-frame datasets)
            if self._frame_idx >= 1:
                return None
            self._frame_idx += 1
            frame = self._image
        else:
            self._frame_idx += 1
            ok, frame = self._cap.read()
            if not ok:
                return None
        h, w = frame.shape[:2]
        return RawFrame(data=frame, fmt="BGR", width=w, height=h)

    def close(self) -> None:
        if self._cap is not None:
            self._cap.release()


class SyntheticDriver(CameraDriver):
    """Renders a (possibly animated) synthetic scene each frame."""

    def __init__(
        self,
        model,
        field,
        scene: Scene,
        fmt: str = "RGGB",
        fps: float = 100.0,
        frames: int | None = None,
        animate=None,
    ):
        self.model = model
        self.field = field
        self.scene = scene
        self._fmt = fmt
        self._fps = fps
        self._frames = frames
        self._animate = animate
        self._idx = 0

    @property
    def fmt(self) -> str:
        return self._fmt

    def expected_frametime(self) -> float:
        return 1.0 / self._fps

    def get_time(self) -> float:
        return self._idx / self._fps

    def read_image(self) -> RawFrame | None:
        if self._frames is not None and self._idx >= self._frames:
            return None
        if self._animate is not None:
            self._animate(self.scene, self._idx / self._fps)
        raw = render_raw(self.model, self.field, self.scene, self._fmt)
        self._idx += 1
        w, h = int(self.model.size[0]), int(self.model.size[1])
        return RawFrame(data=raw, fmt=self._fmt, width=w, height=h)


_DRIVERS = {}


def register_driver(name: str, factory) -> None:
    """External registration point for vendor SDK drivers."""
    _DRIVERS[name.upper()] = factory


def open_camera(cfg: CameraSection) -> CameraDriver:
    """Driver factory (reference src/driver/cameradriver.cpp:74-89)."""
    name = (cfg.driver or "OPENCV").upper()
    if name in _DRIVERS:
        return _DRIVERS[name](cfg)
    if name == "OPENCV":
        return OpenCVDriver(cfg)
    if name == "V4L2":
        from . import native  # registers the driver

        return _DRIVERS["V4L2"](cfg)
    if name in ("SPINNAKER", "MVIMPACT"):
        from . import vendor  # registers both; raises without the SDK

        return _DRIVERS[name](cfg)
    if name in ("GENICAM", "ARAVIS"):
        from . import genicam  # registers both; raises without libaravis

        return _DRIVERS[name](cfg)
    raise ValueError(f"unknown camera driver {cfg.driver}")
