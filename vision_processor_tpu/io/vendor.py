"""Vendor camera SDK drivers (FLIR Spinnaker, Balluff/MATRIX VISION mvIMPACT).

The reference ships native drivers for both SDKs (reference
src/driver/spinnakerdriver.cpp:39-180, src/driver/mvimpactdriver.cpp:29-116).
These SDKs are proprietary and not present in every deployment, so this
module binds them lazily through their official Python bindings (PySpin /
mvIMPACT.acquire) when installed, applying the same acquisition policy:

* BayerRG8 / Mono8-GRBG pixel formats feeding the raw pipeline at half
  (true-color) model resolution
* newest-frame-only buffer handling (stale frames dropped)
* exposure / gain / gamma / white-balance setup from the camera config
  (0 = automatic, OUTDOOR/INDOOR auto white-balance profiles)
* camera hardware timestamps surfaced on every frame

Without the SDK the constructor raises a clear error; `open_camera` keeps
working for OPENCV/V4L2/SYNTHETIC sources.
"""
from __future__ import annotations

import numpy as np

from ..utils.config import CameraSection
from ..utils.log import get_logger
from .camera import CameraDriver, RawFrame, register_driver

log = get_logger(__name__)


class SpinnakerDriver(CameraDriver):
    """FLIR cameras via PySpin (GenICam)."""

    def __init__(self, cfg: CameraSection):
        try:
            import PySpin  # type: ignore
        except ImportError as exc:
            raise RuntimeError(
                "SPINNAKER driver requires the FLIR Spinnaker SDK "
                "(PySpin python bindings)"
            ) from exc
        self._spin = PySpin
        self._system = PySpin.System.GetInstance()
        cams = self._system.GetCameras()
        if cams.GetSize() <= cfg.id:
            cams.Clear()
            raise RuntimeError(f"Spinnaker camera {cfg.id} not found")
        self._cam = cams.GetByIndex(cfg.id)
        cams.Clear()
        self._cam.Init()
        self._configure(cfg)
        self._cam.BeginAcquisition()
        self._fps = float(self._cam.AcquisitionFrameRate.GetValue())

    def _configure(self, cfg: CameraSection) -> None:
        spin = self._spin
        cam = self._cam
        # raw Bayer feeding the demosaic-free pipeline
        cam.PixelFormat.SetValue(spin.PixelFormat_BayerRG8)
        # newest-only buffer handling
        s_node = cam.TLStream
        s_node.StreamBufferHandlingMode.SetValue(
            spin.StreamBufferHandlingMode_NewestOnly
        )
        if cfg.width:
            cam.Width.SetValue(cfg.width)
        if cfg.height:
            cam.Height.SetValue(cfg.height)
        if cfg.exposure > 0:
            cam.ExposureAuto.SetValue(spin.ExposureAuto_Off)
            cam.ExposureTime.SetValue(cfg.exposure * 1000.0)
        else:
            cam.ExposureAuto.SetValue(spin.ExposureAuto_Continuous)
        if cfg.gain > 0:
            cam.GainAuto.SetValue(spin.GainAuto_Off)
            cam.Gain.SetValue(cfg.gain)
        else:
            cam.GainAuto.SetValue(spin.GainAuto_Continuous)
        if cfg.gamma != 1.0:
            cam.GammaEnable.SetValue(True)
            cam.Gamma.SetValue(cfg.gamma)
        wb = cfg.white_balance
        if isinstance(wb, dict):
            cam.BalanceWhiteAuto.SetValue(spin.BalanceWhiteAuto_Off)
            cam.BalanceRatioSelector.SetValue(spin.BalanceRatioSelector_Red)
            cam.BalanceRatio.SetValue(float(wb.get("red", 1.0)))
            cam.BalanceRatioSelector.SetValue(spin.BalanceRatioSelector_Blue)
            cam.BalanceRatio.SetValue(float(wb.get("blue", 1.0)))
        else:
            cam.BalanceWhiteAuto.SetValue(spin.BalanceWhiteAuto_Continuous)
            profile = getattr(
                spin,
                "BalanceWhiteAutoProfile_"
                + ("Outdoor" if str(wb).upper() == "OUTDOOR" else "Indoor"),
                None,
            )
            if profile is not None:
                cam.BalanceWhiteAutoProfile.SetValue(profile)

    @property
    def fmt(self) -> str:
        return "RGGB"

    def expected_frametime(self) -> float:
        return 1.0 / max(self._fps, 1.0)

    def read_image(self) -> RawFrame | None:
        img = self._cam.GetNextImage(1000)
        try:
            if img.IsIncomplete():
                return None
            data = np.array(img.GetNDArray(), dtype=np.uint8, copy=True)
            ts = img.GetTimeStamp() / 1e9
        finally:
            img.Release()
        h, w = data.shape
        return RawFrame(data, "RGGB", w // 2, h // 2, ts)

    def close(self) -> None:
        try:
            self._cam.EndAcquisition()
            self._cam.DeInit()
            del self._cam
            self._system.ReleaseInstance()
        except Exception:  # pragma: no cover - SDK teardown
            pass


class MVImpactDriver(CameraDriver):
    """Balluff/MATRIX VISION (Bluefox3) cameras via mvIMPACT.acquire."""

    def __init__(self, cfg: CameraSection):
        try:
            from mvIMPACT import acquire  # type: ignore
        except ImportError as exc:
            raise RuntimeError(
                "MVIMPACT driver requires the mvIMPACT Acquire SDK"
            ) from exc
        self._acquire = acquire
        mgr = acquire.DeviceManager()
        if mgr.deviceCount() <= cfg.id:
            raise RuntimeError(f"mvIMPACT camera {cfg.id} not found")
        self._dev = mgr.getDevice(cfg.id)
        self._dev.open()
        self._fi = acquire.FunctionInterface(self._dev)
        settings = acquire.SettingsBlueDevice(self._dev)
        # raw Mono8 carrying the GRBG mosaic, like the reference driver
        settings.imageDestination.pixelFormat.writeS("Mono8")
        if cfg.exposure > 0:
            settings.cameraSettings.exposeUsec.write(int(cfg.exposure * 1000))
        if cfg.gain > 0:
            settings.cameraSettings.gain_dB.write(cfg.gain)
        for _ in range(4):
            self._fi.imageRequestSingle()
        self._fps = 50.0

    @property
    def fmt(self) -> str:
        return "GRBG"

    def expected_frametime(self) -> float:
        return 1.0 / self._fps

    def read_image(self) -> RawFrame | None:
        fi = self._fi
        req_nr = fi.imageRequestWaitFor(1000)
        if not fi.isRequestNrValid(req_nr):
            return None
        req = fi.getRequest(req_nr)
        # skip to the newest completed request
        while True:
            nxt = fi.imageRequestWaitFor(0)
            if not fi.isRequestNrValid(nxt):
                break
            req.unlock()
            fi.imageRequestSingle()
            req = fi.getRequest(nxt)
        try:
            buf = req.getImageBufferDesc().getBuffer()
            h = req.imageHeight.read()
            w = req.imageWidth.read()
            data = np.frombuffer(buf, dtype=np.uint8, count=h * w).reshape(h, w).copy()
            ts = req.infoTimeStamp_us.read() / 1e6
        finally:
            req.unlock()
            fi.imageRequestSingle()
        return RawFrame(data, "GRBG", w // 2, h // 2, ts)

    def close(self) -> None:
        try:
            self._dev.close()
        except Exception:  # pragma: no cover - SDK teardown
            pass


register_driver("SPINNAKER", SpinnakerDriver)
register_driver("MVIMPACT", MVImpactDriver)
