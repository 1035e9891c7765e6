"""Native library tests: build, multicast loopback, clock. V4L2 capture is
exercised only when a /dev/video* device exists."""
import os

import pytest

from vision_processor_tpu.io.native import (
    NativeMulticast,
    V4L2Driver,
    load_native,
)


@pytest.fixture(scope="module")
def lib():
    lib = load_native()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_monotonic_clock(lib):
    t0 = lib.vptpu_monotonic_us()
    t1 = lib.vptpu_monotonic_us()
    assert t1 >= t0


def test_multicast_roundtrip(lib):
    a = NativeMulticast("224.99.99.7", 17272)
    b = NativeMulticast("224.99.99.7", 17272)
    try:
        a.send(b"\x01\x02\x03frame")
        got = b.recv(500)
        assert got == b"\x01\x02\x03frame"
        # timeout path
        assert b.recv(10) is None
    finally:
        a.close()
        b.close()


def test_v4l2_driver(lib):
    if not os.path.exists("/dev/video0"):
        pytest.skip("no camera device")
    from vision_processor_tpu.utils.config import CameraSection

    drv = V4L2Driver(CameraSection(driver="V4L2", path="/dev/video0"))
    try:
        frame = drv.read_image()
        assert frame is None or frame.data.size > 0
    finally:
        drv.close()
