"""Mock-SDK tests for the vendor camera drivers.

The Spinnaker / mvIMPACT / Aravis drivers are hardware-gated (no camera,
no SDK in this environment), so their acquisition-policy logic — the part
the reference implements natively (reference
src/driver/spinnakerdriver.cpp:39-180, src/driver/mvimpactdriver.cpp:29-116)
— is exercised here against faithful fakes of the official binding
surfaces: newest-frame-only draining, failed/incomplete frame handling,
buffer requeue accounting, config parameter setup, and hardware-timestamp
unit conversion.  These fakes mimic call/return conventions only; any
behavioral divergence of a real SDK still needs hardware, but logic bugs
(the only kind fixable here) are caught.
"""
from __future__ import annotations

import ctypes
import sys
import types

import numpy as np
import pytest

from vision_processor_tpu.utils.config import CameraSection


# ---------------------------------------------------------------------------
# Fake PySpin
# ---------------------------------------------------------------------------

class _Node:
    """Records SetValue calls; GetValue returns a preset."""

    def __init__(self, value=None):
        self.value = value
        self.set_calls = []

    def SetValue(self, v):
        self.set_calls.append(v)
        self.value = v

    def GetValue(self):
        return self.value


class _FakeSpinImage:
    def __init__(self, arr, ts_ns, incomplete=False):
        self._arr = arr
        self._ts = ts_ns
        self._incomplete = incomplete
        self.released = False

    def IsIncomplete(self):
        return self._incomplete

    def GetNDArray(self):
        return self._arr

    def GetTimeStamp(self):
        return self._ts

    def Release(self):
        self.released = True


class _FakeSpinCamera:
    def __init__(self, images):
        self._images = list(images)
        self.inited = False
        self.acquiring = False
        self.deinited = False
        self.PixelFormat = _Node()
        self.TLStream = types.SimpleNamespace(StreamBufferHandlingMode=_Node())
        self.Width = _Node()
        self.Height = _Node()
        self.ExposureAuto = _Node()
        self.ExposureTime = _Node()
        self.GainAuto = _Node()
        self.Gain = _Node()
        self.GammaEnable = _Node()
        self.Gamma = _Node()
        self.BalanceWhiteAuto = _Node()
        self.BalanceRatioSelector = _Node()
        self.BalanceRatio = _Node()
        self.BalanceWhiteAutoProfile = _Node()
        self.AcquisitionFrameRate = _Node(125.0)

    def Init(self):
        self.inited = True

    def BeginAcquisition(self):
        self.acquiring = True

    def EndAcquisition(self):
        self.acquiring = False

    def GetNextImage(self, timeout_ms):
        assert self.acquiring, "GetNextImage before BeginAcquisition"
        return self._images.pop(0)

    def DeInit(self):
        self.deinited = True


class _FakeCamList:
    def __init__(self, cams):
        self._cams = cams
        self.cleared = False

    def GetSize(self):
        return len(self._cams)

    def GetByIndex(self, i):
        return self._cams[i]

    def Clear(self):
        self.cleared = True


class _FakeSpinSystem:
    def __init__(self, cams):
        self._list = _FakeCamList(cams)
        self.released = False

    def GetCameras(self):
        return self._list

    def ReleaseInstance(self):
        self.released = True


def _fake_pyspin(cams):
    mod = types.ModuleType("PySpin")
    system = _FakeSpinSystem(cams)
    mod.System = types.SimpleNamespace(GetInstance=lambda: system)
    # enum constants — distinct sentinels so SetValue calls are checkable
    for name in (
        "PixelFormat_BayerRG8",
        "StreamBufferHandlingMode_NewestOnly",
        "ExposureAuto_Off",
        "ExposureAuto_Continuous",
        "GainAuto_Off",
        "GainAuto_Continuous",
        "BalanceWhiteAuto_Off",
        "BalanceWhiteAuto_Continuous",
        "BalanceRatioSelector_Red",
        "BalanceRatioSelector_Blue",
        "BalanceWhiteAutoProfile_Outdoor",
        "BalanceWhiteAutoProfile_Indoor",
    ):
        setattr(mod, name, "enum:" + name)
    mod._system = system
    return mod


@pytest.fixture
def spin_env(monkeypatch):
    def make(images, cfg):
        cam = _FakeSpinCamera(images)
        mod = _fake_pyspin([cam])
        monkeypatch.setitem(sys.modules, "PySpin", mod)
        from vision_processor_tpu.io.vendor import SpinnakerDriver

        return SpinnakerDriver(cfg), cam, mod

    return make


def test_spinnaker_configures_acquisition_policy(spin_env):
    cfg = CameraSection(
        driver="SPINNAKER", id=0, width=1920, height=1080,
        exposure=6.0, gain=4.0, gamma=1.2,
        white_balance={"red": 1.3, "blue": 0.8},
    )
    drv, cam, mod = spin_env([], cfg)
    # raw Bayer into the demosaic-free pipeline; newest-only buffers
    # (reference spinnakerdriver.cpp:58-66)
    assert cam.PixelFormat.value == mod.PixelFormat_BayerRG8
    assert (cam.TLStream.StreamBufferHandlingMode.value
            == mod.StreamBufferHandlingMode_NewestOnly)
    assert cam.Width.value == 1920 and cam.Height.value == 1080
    # manual exposure is milliseconds in config, microseconds at the SDK
    assert cam.ExposureAuto.value == mod.ExposureAuto_Off
    assert cam.ExposureTime.value == pytest.approx(6000.0)
    assert cam.GainAuto.value == mod.GainAuto_Off
    assert cam.Gain.value == pytest.approx(4.0)
    assert cam.GammaEnable.value is True
    assert cam.Gamma.value == pytest.approx(1.2)
    # manual white balance writes both ratios through the selector
    assert cam.BalanceWhiteAuto.value == mod.BalanceWhiteAuto_Off
    assert cam.BalanceRatioSelector.set_calls == [
        mod.BalanceRatioSelector_Red, mod.BalanceRatioSelector_Blue]
    assert cam.BalanceRatio.set_calls == [pytest.approx(1.3),
                                          pytest.approx(0.8)]
    assert cam.inited and cam.acquiring
    assert drv.fmt == "RGGB"
    assert drv.expected_frametime() == pytest.approx(1.0 / 125.0)


def test_spinnaker_auto_modes_and_outdoor_profile(spin_env):
    cfg = CameraSection(driver="SPINNAKER", exposure=0.0, gain=0.0,
                        white_balance="OUTDOOR")
    _, cam, mod = spin_env([], cfg)
    assert cam.ExposureAuto.value == mod.ExposureAuto_Continuous
    assert cam.GainAuto.value == mod.GainAuto_Continuous
    assert cam.BalanceWhiteAuto.value == mod.BalanceWhiteAuto_Continuous
    assert (cam.BalanceWhiteAutoProfile.value
            == mod.BalanceWhiteAutoProfile_Outdoor)
    # gamma 1.0 (default) must NOT enable the gamma block
    assert cam.GammaEnable.set_calls == []


def test_spinnaker_read_image_frame_and_timestamp(spin_env):
    arr = np.arange(8 * 12, dtype=np.uint8).reshape(8, 12)
    img = _FakeSpinImage(arr, ts_ns=2_500_000_000)
    drv, _, _ = spin_env([img], CameraSection(driver="SPINNAKER"))
    frame = drv.read_image()
    assert frame is not None
    np.testing.assert_array_equal(frame.data, arr)
    assert frame.data is not arr  # copied out before Release
    assert (frame.width, frame.height) == (6, 4)  # half (true-color) res
    assert frame.fmt == "RGGB"
    assert frame.timestamp == pytest.approx(2.5)  # ns -> s
    assert img.released


def test_spinnaker_incomplete_frame_returns_none_and_releases(spin_env):
    img = _FakeSpinImage(np.zeros((4, 4), np.uint8), 0, incomplete=True)
    drv, _, _ = spin_env([img], CameraSection(driver="SPINNAKER"))
    assert drv.read_image() is None
    assert img.released  # leaked SDK images stall the NewestOnly ring


def test_spinnaker_close_releases_sdk(spin_env):
    drv, cam, mod = spin_env([], CameraSection(driver="SPINNAKER"))
    drv.close()
    assert not cam.acquiring and cam.deinited
    assert mod._system.released


def test_spinnaker_missing_camera_raises_and_clears(monkeypatch):
    mod = _fake_pyspin([])
    monkeypatch.setitem(sys.modules, "PySpin", mod)
    from vision_processor_tpu.io.vendor import SpinnakerDriver

    with pytest.raises(RuntimeError, match="not found"):
        SpinnakerDriver(CameraSection(driver="SPINNAKER", id=0))
    assert mod._system.GetCameras().cleared


# ---------------------------------------------------------------------------
# Fake mvIMPACT.acquire
# ---------------------------------------------------------------------------

class _FakeRequest:
    def __init__(self, arr, ts_us):
        self._arr = arr
        self._ts = ts_us
        self.unlocked = False
        h, w = arr.shape
        self.imageHeight = types.SimpleNamespace(read=lambda: h)
        self.imageWidth = types.SimpleNamespace(read=lambda: w)
        self.infoTimeStamp_us = types.SimpleNamespace(read=lambda: ts_us)

    def getImageBufferDesc(self):
        return types.SimpleNamespace(getBuffer=lambda: self._arr.tobytes())

    def unlock(self):
        self.unlocked = True


class _FakeFunctionInterface:
    """Completed requests wait FIFO; imageRequestSingle refills capacity."""

    def __init__(self, dev):
        self._completed: list[int] = []
        self._requests: dict[int, _FakeRequest] = {}
        self.queued = 0  # outstanding capture capacity

    def feed(self, req):
        nr = len(self._requests)
        self._requests[nr] = req
        self._completed.append(nr)

    def imageRequestSingle(self):
        self.queued += 1

    def imageRequestWaitFor(self, timeout_ms):
        if self._completed:
            return self._completed.pop(0)
        return -1

    def isRequestNrValid(self, nr):
        return nr >= 0

    def getRequest(self, nr):
        return self._requests[nr]


def _fake_mvimpact(device_count=1):
    pkg = types.ModuleType("mvIMPACT")
    acq = types.ModuleType("mvIMPACT.acquire")
    pkg.acquire = acq

    class _Dev:
        def __init__(self):
            self.opened = False
            self.closed = False

        def open(self):
            self.opened = True

        def close(self):
            self.closed = True

    devices = [_Dev() for _ in range(device_count)]
    acq.DeviceManager = lambda: types.SimpleNamespace(
        deviceCount=lambda: len(devices),
        getDevice=lambda i: devices[i],
    )
    fis = []

    def _fi(dev):
        fi = _FakeFunctionInterface(dev)
        fis.append(fi)
        return fi

    acq.FunctionInterface = _fi

    class _Prop:
        def __init__(self):
            self.written = None

        def writeS(self, v):
            self.written = v

        def write(self, v):
            self.written = v

    settings = types.SimpleNamespace(
        imageDestination=types.SimpleNamespace(pixelFormat=_Prop()),
        cameraSettings=types.SimpleNamespace(exposeUsec=_Prop(),
                                             gain_dB=_Prop()),
    )
    acq.SettingsBlueDevice = lambda dev: settings
    acq._devices = devices
    acq._fis = fis
    acq._settings = settings
    return pkg, acq


@pytest.fixture
def mv_env(monkeypatch):
    def make(cfg, device_count=1):
        pkg, acq = _fake_mvimpact(device_count)
        monkeypatch.setitem(sys.modules, "mvIMPACT", pkg)
        monkeypatch.setitem(sys.modules, "mvIMPACT.acquire", acq)
        from vision_processor_tpu.io.vendor import MVImpactDriver

        drv = MVImpactDriver(cfg)
        return drv, acq

    return make


def test_mvimpact_setup_and_request_priming(mv_env):
    cfg = CameraSection(driver="MVIMPACT", exposure=6.0, gain=2.5)
    drv, acq = mv_env(cfg)
    assert acq._devices[0].opened
    # raw Mono8 carrying the GRBG mosaic (reference mvimpactdriver.cpp:57)
    assert acq._settings.imageDestination.pixelFormat.written == "Mono8"
    assert acq._settings.cameraSettings.exposeUsec.written == 6000
    assert acq._settings.cameraSettings.gain_dB.written == pytest.approx(2.5)
    # 4 requests primed so capture never starves (reference :74-78)
    assert acq._fis[0].queued == 4
    assert drv.fmt == "GRBG"


def test_mvimpact_newest_frame_drain_and_requeue(mv_env):
    drv, acq = mv_env(CameraSection(driver="MVIMPACT"))
    fi = acq._fis[0]
    fi.queued = 0  # count only requeues from this read
    reqs = [
        _FakeRequest(np.full((4, 6), i, np.uint8), ts_us=1_000_000 * (i + 1))
        for i in range(3)
    ]
    for r in reqs:
        fi.feed(r)
    frame = drv.read_image()
    assert frame is not None
    # newest of the 3 stale frames wins (reference mvimpactdriver.cpp:97-101)
    np.testing.assert_array_equal(frame.data,
                                  np.full((4, 6), 2, np.uint8))
    assert frame.timestamp == pytest.approx(3.0)  # us -> s
    assert (frame.width, frame.height) == (3, 2)
    # every consumed request was unlocked and its slot requeued
    assert all(r.unlocked for r in reqs)
    assert fi.queued == 3


def test_mvimpact_timeout_returns_none(mv_env):
    drv, acq = mv_env(CameraSection(driver="MVIMPACT"))
    assert drv.read_image() is None


def test_mvimpact_missing_device_raises(monkeypatch):
    pkg, acq = _fake_mvimpact(device_count=0)
    monkeypatch.setitem(sys.modules, "mvIMPACT", pkg)
    monkeypatch.setitem(sys.modules, "mvIMPACT.acquire", acq)
    from vision_processor_tpu.io.vendor import MVImpactDriver

    with pytest.raises(RuntimeError, match="not found"):
        MVImpactDriver(CameraSection(driver="MVIMPACT", id=0))


# ---------------------------------------------------------------------------
# Fault paths (VERDICT r3 item 8): mid-acquisition disconnect, timestamp
# discontinuity, partial frames — a camera fault must yield None frames
# (the outage semantics the apps degrade on), never an exception that
# takes down the camera loop, and a long failure streak must re-arm the
# acquisition stream.
# ---------------------------------------------------------------------------


class _DisconnectError(Exception):
    pass


def test_spinnaker_disconnect_returns_none_and_rearms(spin_env):
    from vision_processor_tpu.io import vendor

    drv, cam, _ = spin_env([], CameraSection(driver="SPINNAKER"))

    calls = {"n": 0}

    def raising(timeout_ms):
        calls["n"] += 1
        raise _DisconnectError("device removed")

    cam.GetNextImage = raising
    begin_count = {"n": 0}
    orig_begin = cam.BeginAcquisition

    def counting_begin():
        begin_count["n"] += 1
        orig_begin()

    cam.BeginAcquisition = counting_begin

    # every failing read is a None frame, not an exception
    for _ in range(vendor._REARM_AFTER):
        assert drv.read_image() is None
    # the streak re-armed the acquisition stream exactly once
    assert begin_count["n"] == 1
    assert cam.acquiring
    # recovery: frames flow again and the streak resets
    arr = np.zeros((4, 4), np.uint8)
    imgs = [_FakeSpinImage(arr, ts_ns=10_000_000_000)]
    cam.GetNextImage = lambda t: imgs.pop(0)
    frame = drv.read_image()
    assert frame is not None
    assert drv._fail_streak == 0


def test_spinnaker_timestamp_discontinuity_stays_monotonic(spin_env):
    arr = np.zeros((4, 4), np.uint8)
    # hardware clock re-arms mid-run: 5.0 s, 5.008 s, then 0.1 s, 0.108 s
    seq = [5.0, 5.008, 0.1, 0.108]
    imgs = [_FakeSpinImage(arr, ts_ns=int(t * 1e9)) for t in seq]
    drv, cam, _ = spin_env(imgs, CameraSection(driver="SPINNAKER"))
    period = drv.expected_frametime()
    t0 = drv.read_image().timestamp
    t1 = drv.read_image().timestamp
    t2 = drv.read_image().timestamp
    t3 = drv.read_image().timestamp
    assert (t0, t1) == (pytest.approx(5.0), pytest.approx(5.008))
    # the backwards jump is replaced by a monotonic estimate...
    assert t2 == pytest.approx(5.008 + period)
    # ...and the still-backwards follow-up keeps stepping forward
    assert t3 == pytest.approx(t2 + period)
    assert t0 < t1 < t2 < t3


def test_spinnaker_zero_timestamp_passthrough(spin_env):
    """Cameras without hardware timestamps report 0; the guard must not
    invent a clock for them (0 is the 'unsupported' wire convention)."""
    arr = np.zeros((4, 4), np.uint8)
    imgs = [_FakeSpinImage(arr, ts_ns=0), _FakeSpinImage(arr, ts_ns=0)]
    drv, _, _ = spin_env(imgs, CameraSection(driver="SPINNAKER"))
    assert drv.read_image().timestamp == 0.0
    assert drv.read_image().timestamp == 0.0


def test_mvimpact_partial_frame_requeued_not_delivered(mv_env):
    drv, acq = mv_env(CameraSection(driver="MVIMPACT"))
    fi = acq._fis[0]
    fi.queued = 0
    bad = _FakeRequest(np.zeros((4, 6), np.uint8), ts_us=1_000_000)
    bad.requestResult = types.SimpleNamespace(readS=lambda: "Incomplete")
    good = _FakeRequest(np.full((4, 6), 7, np.uint8), ts_us=2_000_000)
    good.requestResult = types.SimpleNamespace(readS=lambda: "OK")
    fi.feed(bad)
    frame = drv.read_image()
    assert frame is None                # partial frame never delivered
    assert bad.unlocked and fi.queued == 1  # but its buffer was requeued
    fi.feed(good)
    frame = drv.read_image()
    assert frame is not None
    np.testing.assert_array_equal(frame.data, np.full((4, 6), 7, np.uint8))
    assert drv._fail_streak == 0


def test_mvimpact_disconnect_returns_none_and_reprimes(mv_env):
    from vision_processor_tpu.io import vendor

    drv, acq = mv_env(CameraSection(driver="MVIMPACT"))
    fi = acq._fis[0]

    def raising(timeout_ms):
        raise _DisconnectError("bus reset")

    fi.imageRequestWaitFor = raising
    fi.queued = 0
    for _ in range(vendor._REARM_AFTER):
        assert drv.read_image() is None
    # the streak re-primed the request queue (4 fresh requests)
    assert fi.queued == 4


def test_mvimpact_timestamp_discontinuity_stays_monotonic(mv_env):
    drv, acq = mv_env(CameraSection(driver="MVIMPACT"))
    fi = acq._fis[0]
    for t_us in (4_000_000, 4_020_000, 500_000):
        fi.feed(_FakeRequest(np.zeros((4, 6), np.uint8), ts_us=t_us))
        # drain one per read (no newest-frame skip across feeds)
        frame = drv.read_image()
        assert frame is not None
        last = frame.timestamp
    assert last == pytest.approx(4.02 + 1.0 / 50.0)


# ---------------------------------------------------------------------------
# Aravis (GenICam) newest-SUCCESS drain — fake ctypes lib surface
# ---------------------------------------------------------------------------

class _FakeArvStream:
    """Output queue of completed buffers + input queue of requeued ones."""

    def __init__(self):
        self.out: list[int] = []
        self.requeued: list[int] = []


class _FakeAravis:
    def __init__(self, stream, buffers):
        self._stream = stream
        # handle -> (np.ndarray | None, status, ts_ns)
        self._buffers = buffers

    def arv_stream_timeout_pop_buffer(self, stream, timeout_us):
        return stream.out.pop(0) if stream.out else 0

    def arv_stream_try_pop_buffer(self, stream):
        return stream.out.pop(0) if stream.out else 0

    def arv_stream_push_buffer(self, stream, buf):
        stream.requeued.append(buf)

    def arv_buffer_get_status(self, buf):
        return self._buffers[buf][1]

    def arv_buffer_get_data(self, buf, sizeref):
        arr = self._buffers[buf][0]
        sizeref._obj.value = arr.nbytes
        return arr.ctypes.data_as(ctypes.c_void_p).value

    def arv_buffer_get_image_width(self, buf):
        return self._buffers[buf][0].shape[1]

    def arv_buffer_get_image_height(self, buf):
        return self._buffers[buf][0].shape[0]

    def arv_buffer_get_timestamp(self, buf):
        return self._buffers[buf][2]


def _aravis_driver(buffers, order):
    """AravisDriver with a fake lib, bypassing the hardware __init__."""
    from vision_processor_tpu.io.genicam import AravisDriver

    drv = AravisDriver.__new__(AravisDriver)
    stream = _FakeArvStream()
    stream.out = list(order)
    drv._lib = _FakeAravis(stream, buffers)
    drv._stream = stream
    drv._fps = 100.0
    return drv, stream


SUCCESS, FAILED = 0, 2


def test_aravis_drain_keeps_newest_success_buffer():
    a = np.full((4, 6), 1, np.uint8)
    b = np.full((4, 6), 2, np.uint8)
    c = np.full((4, 6), 3, np.uint8)
    drv, stream = _aravis_driver(
        {1: (a, SUCCESS, 1_000_000_000),
         2: (b, SUCCESS, 2_000_000_000),
         3: (c, SUCCESS, 3_000_000_000)},
        order=[1, 2, 3],
    )
    frame = drv.read_image()
    np.testing.assert_array_equal(frame.data, c)
    assert frame.timestamp == pytest.approx(3.0)
    # all three buffers back in the capture ring, exactly once each
    assert sorted(stream.requeued) == [1, 2, 3]


def test_aravis_failed_newest_keeps_older_success():
    """ADVICE r2: a failed newest transfer must not discard an older good
    frame — the drain skips FAILED buffers instead of blindly keeping the
    newest."""
    good = np.full((4, 6), 7, np.uint8)
    bad = np.zeros((4, 6), np.uint8)
    drv, stream = _aravis_driver(
        {1: (good, SUCCESS, 5_000_000_000), 2: (bad, FAILED, 6_000_000_000)},
        order=[1, 2],
    )
    frame = drv.read_image()
    assert frame is not None
    np.testing.assert_array_equal(frame.data, good)
    assert sorted(stream.requeued) == [1, 2]


def test_aravis_all_failed_returns_none_and_requeues():
    bad = np.zeros((4, 6), np.uint8)
    drv, stream = _aravis_driver({1: (bad, FAILED, 0)}, order=[1])
    assert drv.read_image() is None
    assert stream.requeued == [1]
