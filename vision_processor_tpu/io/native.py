"""ctypes bindings for the native host runtime (native/libvptpu_native.so).

Provides the V4L2 camera driver (registered as driver "V4L2") and a native
multicast socket. The library is built on demand with `make -C native`;
without a C++ toolchain everything degrades gracefully to the Python paths.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

from ..utils.log import get_logger
from .camera import CameraDriver, RawFrame, register_driver

log = get_logger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libvptpu_native.so"

_lib = None


def load_native(build: bool = True):
    """Load (building if needed) the native library; None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and build:
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as exc:
            log.warning("native build failed: %s", exc)
            return None
    if not _LIB_PATH.exists():
        return None

    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.vptpu_v4l2_open.restype = ctypes.c_void_p
    lib.vptpu_v4l2_open.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.c_uint32,
    ]
    for fn in ("width", "height", "pixelformat", "bytesperline"):
        getattr(lib, f"vptpu_v4l2_{fn}").restype = ctypes.c_uint32
        getattr(lib, f"vptpu_v4l2_{fn}").argtypes = [ctypes.c_void_p]
    lib.vptpu_v4l2_read.restype = ctypes.c_int64
    lib.vptpu_v4l2_read.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.vptpu_v4l2_close.argtypes = [ctypes.c_void_p]

    lib.vptpu_mc_open.restype = ctypes.c_void_p
    lib.vptpu_mc_open.argtypes = [ctypes.c_char_p, ctypes.c_uint16]
    lib.vptpu_mc_send.restype = ctypes.c_int64
    lib.vptpu_mc_send.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64
    ]
    lib.vptpu_mc_recv.restype = ctypes.c_int64
    lib.vptpu_mc_recv.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.c_int,
    ]
    lib.vptpu_mc_close.argtypes = [ctypes.c_void_p]
    lib.vptpu_monotonic_us.restype = ctypes.c_int64

    lib.vptpu_h264_ipcm_encode.restype = ctypes.c_long
    lib.vptpu_h264_ipcm_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
    ]
    lib.vptpu_h264_cavlc_encode.restype = ctypes.c_long
    lib.vptpu_h264_cavlc_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    # slice-parallel form (absent in stale prebuilt libraries)
    if hasattr(lib, "vptpu_h264_cavlc_encode_mt"):
        lib.vptpu_h264_cavlc_encode_mt.restype = ctypes.c_long
        lib.vptpu_h264_cavlc_encode_mt.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]

    if hasattr(lib, "vptpu_h264_cavlc_encode_p"):
        lib.vptpu_h264_cavlc_encode_p.restype = ctypes.c_long
        lib.vptpu_h264_cavlc_encode_p.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]

    _lib = lib
    return lib


class H264Encoder:
    """In-process H.264 encoder (native, two tiers).

    The reference auto-picks a hardware/x264 libav encoder
    (reference src/rtpstreamer.cpp:62-93); this build carries its own
    encoders in native/:

    * ``qp=None`` — all-I_PCM baseline (vptpu_native.cpp): lossless,
      ~12 bits/px; for capture/archival.
    * ``qp=<10..29>`` — CAVLC all-intra (h264_cavlc.cpp): the compressed
      LAN debug tier, ~0.3-2 bits/px; per-MB Intra_4x4 (all 9 prediction
      modes, SAD+rate decision, flat-MB screen) with an Intra_16x16-DC
      fallback — ~30% fewer bits than I_16x16-only at equal PSNR on field
      content (VPTPU_I4=0 restores pure I_16x16). Decoder output is
      bit-exactly the encoder's spec-math reconstruction (deblocking
      signalled off).

    ``gop=N`` (CAVLC tier only) additionally enables the inter tier:
    one IDR every N frames, the rest P pictures coding only macroblocks
    whose motion-compensated residual against the previous
    reconstruction survives quantization (P_Skip runs elsewhere) — on
    mostly-static field content the stream shrinks by roughly the GOP
    length. Moving content is chased by a block-matching search with
    spec median MV prediction (VPTPU_ME sets the range in px, default
    24; 0 restores the zero-motion tier bit-for-bit) plus SATD-decided
    quarter-pel refinement on coded macroblocks (VPTPU_SUBPEL=0/1/2,
    default 2), cutting panning-content P frames a further 3-8x and
    fractional-motion content ~2.5x more. The reference's
    x264 path emits inter frames for the same reason (reference
    src/rtpstreamer.cpp:62-93).

    ``target_kbps`` (CAVLC tiers) enables frame-level rate control: the
    per-frame QP walks inside [10, 29] to hold the stream near the
    target, via a one-second virtual buffer (the reference pins its
    libav codec at 3.5 Mb/s the same way, reference
    src/rtpstreamer.cpp:70; per-frame QP is stream-legal because every
    slice carries its own slice_qp_delta). Default None = fixed QP.

    All tiers emit fully standard annex-B baseline bitstreams. Frames are
    padded to multiples of 16.
    """

    def __init__(self, qp: int | None = None, n_slices: int | None = None,
                 gop: int | None = None, target_kbps: float | None = None,
                 framerate: float = 30.0):
        self._lib = load_native()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._scratch = None
        self._out = None
        self._idr = 0
        self.qp = qp
        self.gop = int(gop) if gop and qp is not None and int(gop) > 1 else None
        if self.gop and not hasattr(self._lib, "vptpu_h264_cavlc_encode_p"):
            self.gop = None
        self._gop_idx = 0       # frame index within the current GOP
        self._frame_num = 0     # 4-bit H.264 reference frame counter
        self._ref = None        # previous frame's reconstruction planes
        self._new = None        # scratch recon planes for the current frame
        # frame-level rate control state (virtual buffer, 1 s capacity);
        # a negative target would pin the controller at QP 29 — reject it
        self.target_kbps = (float(target_kbps)
                            if target_kbps and float(target_kbps) > 0
                            and qp is not None else None)
        self.framerate = float(framerate) if framerate > 0 else 30.0
        self._rc_debt = 0.0     # bits spent above budget so far
        # slice-parallel CAVLC: one thread per horizontal slice band. The
        # default leaves headroom for the per-camera host finishing threads
        # (the encoder runs on the debug path, not the detection path).
        if n_slices is None:
            n_slices = max(1, min(8, (os.cpu_count() or 2) // 2))
        self.n_slices = int(n_slices)

    def _rc_update(self, frame_bits: float) -> None:
        """Walk the QP toward the bitrate target: a leaky virtual buffer
        (capacity = one second of target bits) absorbs the IDR spikes of
        the GOP structure; persistent over/undershoot steps the QP."""
        if self.target_kbps is None:
            return
        budget = self.target_kbps * 1000.0 / self.framerate
        cap = self.target_kbps * 1000.0
        self._rc_debt = max(-cap, min(cap, self._rc_debt
                                      + frame_bits - budget))
        if self._rc_debt > 0.6 * cap:
            self.qp = min(29, self.qp + 2)
            self._rc_debt -= 0.15 * cap   # don't re-step on the same spike
        elif self._rc_debt > 0.25 * cap:
            self.qp = min(29, self.qp + 1)
            self._rc_debt -= 0.05 * cap
        elif self._rc_debt < -0.25 * cap:
            self.qp = max(10, self.qp - 1)
            self._rc_debt += 0.05 * cap

    def _cavlc(self, y, u, v, w, h, ry=None, ru=None, rv=None):
        args = (
            y.ctypes.data, u.ctypes.data, v.ctypes.data, w, h,
            int(self.qp), self._idr,
        )
        tail = (
            self._scratch.ctypes.data, self._scratch.size,
            self._out.ctypes.data, self._out.size,
            None if ry is None else ry.ctypes.data,
            None if ru is None else ru.ctypes.data,
            None if rv is None else rv.ctypes.data,
        )
        if self.n_slices > 1 and hasattr(self._lib, "vptpu_h264_cavlc_encode_mt"):
            return self._lib.vptpu_h264_cavlc_encode_mt(
                *args, self.n_slices, *tail
            )
        return self._lib.vptpu_h264_cavlc_encode(*args, *tail)

    def encode_i420(self, y: np.ndarray, u: np.ndarray, v: np.ndarray) -> bytes:
        h, w = y.shape
        assert w % 16 == 0 and h % 16 == 0, "pad to multiples of 16 first"
        need = w * h * 2 + 131072
        if self._scratch is None or self._scratch.size < need:
            self._scratch = np.zeros(need, np.uint8)
            self._out = np.zeros(need + need // 64, np.uint8)
        y = np.ascontiguousarray(y)
        u = np.ascontiguousarray(u)
        v = np.ascontiguousarray(v)
        if self.qp is None:
            n = self._lib.vptpu_h264_ipcm_encode(
                y.ctypes.data, u.ctypes.data, v.ctypes.data, w, h, self._idr,
                self._scratch.ctypes.data, self._scratch.size,
                self._out.ctypes.data, self._out.size,
            )
        elif self.gop:
            return self._encode_gop(y, u, v, w, h)
        else:
            n = self._cavlc(y, u, v, w, h)
            if n > 0:
                self._rc_update(n * 8.0)
        if n <= 0:
            raise RuntimeError(f"h264 encode failed ({n})")
        self._idr ^= 1
        return self._out[:n].tobytes()

    def _encode_gop(self, y, u, v, w, h) -> bytes:
        """IDR/P sequencing for the inter tier: the previous frame's
        spec-exact reconstruction (double-buffered — the native P encoder
        requires ref and recon to be distinct) is the L0 reference."""
        if self._ref is None or self._ref[0].shape != y.shape:
            make = lambda: (np.zeros_like(y), np.zeros_like(u),
                            np.zeros_like(v))
            self._ref, self._new = make(), make()
            self._gop_idx = 0
        ny, nu, nv = self._new
        if self._gop_idx == 0:
            n = self._cavlc(y, u, v, w, h, ny, nu, nv)
            self._idr ^= 1
            self._frame_num = 0
        else:
            ry, ru, rv = self._ref
            self._frame_num = (self._frame_num + 1) & 15
            n = self._lib.vptpu_h264_cavlc_encode_p(
                y.ctypes.data, u.ctypes.data, v.ctypes.data, w, h,
                int(self.qp), self._frame_num, self.n_slices,
                ry.ctypes.data, ru.ctypes.data, rv.ctypes.data,
                self._out.ctypes.data, self._out.size,
                ny.ctypes.data, nu.ctypes.data, nv.ctypes.data,
            )
        if n <= 0:
            raise RuntimeError(f"h264 encode failed ({n})")
        self._rc_update(n * 8.0)
        self._ref, self._new = self._new, self._ref
        self._gop_idx = (self._gop_idx + 1) % self.gop
        return self._out[:n].tobytes()

    @property
    def last_recon(self):
        """Reconstruction planes of the most recent GOP-mode frame —
        exactly what a conforming decoder outputs (test hook)."""
        return self._ref

    def encode_i420_recon(self, y, u, v):
        """encode_i420 + the spec-exact reconstruction planes a conforming
        decoder will output (CAVLC tier only; test/validation hook)."""
        assert self.qp is not None
        h, w = y.shape
        need = w * h * 2 + 131072
        if self._scratch is None or self._scratch.size < need:
            self._scratch = np.zeros(need, np.uint8)
            self._out = np.zeros(need + need // 64, np.uint8)
        y = np.ascontiguousarray(y)
        u = np.ascontiguousarray(u)
        v = np.ascontiguousarray(v)
        ry, ru, rv = np.zeros_like(y), np.zeros_like(u), np.zeros_like(v)
        n = self._cavlc(y, u, v, w, h, ry, ru, rv)
        if n <= 0:
            raise RuntimeError(f"h264 encode failed ({n})")
        self._idr ^= 1
        return self._out[:n].tobytes(), ry, ru, rv

    def encode_rgb(self, rgb: np.ndarray) -> bytes:
        """(H, W, 3) uint8 RGB -> one annex-B access unit (SPS+PPS+IDR)."""
        import cv2

        h, w = rgb.shape[:2]
        wp, hp = -(-w // 16) * 16, -(-h // 16) * 16
        if (wp, hp) != (w, h):
            rgb = np.pad(rgb, ((0, hp - h), (0, wp - w), (0, 0)), mode="edge")
        i420 = cv2.cvtColor(rgb[..., ::-1], cv2.COLOR_BGR2YUV_I420)
        y = i420[:hp]
        u = i420[hp:hp + hp // 4].reshape(hp // 2, wp // 2)
        v = i420[hp + hp // 4:].reshape(hp // 2, wp // 2)
        return self.encode_i420(y, u, v)


def fourcc(code: str) -> int:
    a, b, c, d = (ord(ch) for ch in code)
    return a | (b << 8) | (c << 16) | (d << 24)


_FOURCC_TO_FMT = {
    fourcc("RGGB"): ("RGGB", 1),
    fourcc("GRBG"): ("GRBG", 1),
    fourcc("YUYV"): ("YUYV", 2),
    fourcc("MJPG"): ("MJPG", 0),
    fourcc("BGR3"): ("BGR", 3),
}


class V4L2Driver(CameraDriver):
    """Native mmap-ring V4L2 capture with newest-frame-only delivery."""

    def __init__(self, cfg):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native library unavailable for V4L2 driver")
        self._lib = lib
        device = cfg.path or f"/dev/video{cfg.id}"
        self._cam = lib.vptpu_v4l2_open(
            device.encode(), cfg.width or 0, cfg.height or 0, 0, 4
        )
        if not self._cam:
            raise RuntimeError(f"cannot open V4L2 device {device}")
        self._width = lib.vptpu_v4l2_width(self._cam)
        self._height = lib.vptpu_v4l2_height(self._cam)
        pix = lib.vptpu_v4l2_pixelformat(self._cam)
        self._fmt, bpp = _FOURCC_TO_FMT.get(pix, ("YUYV", 2))
        cap = self._width * self._height * max(bpp, 3)
        self._buf = np.empty(cap, dtype=np.uint8)
        self._fps = 30.0

    @property
    def fmt(self) -> str:
        # the pipeline receives BGR after host conversion for packed formats
        return "BGR" if self._fmt in ("YUYV", "MJPG", "BGR") else self._fmt

    def expected_frametime(self) -> float:
        return 1.0 / self._fps

    def read_image(self) -> RawFrame | None:
        ts = ctypes.c_int64(0)
        n = self._lib.vptpu_v4l2_read(
            self._cam,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._buf.size,
            1000,
            ctypes.byref(ts),
        )
        if n <= 0:
            return None
        data = self._buf[: int(n)]
        w, h = self._width, self._height
        if self._fmt == "YUYV":
            import cv2

            yuyv = data.reshape(h, w, 2)
            bgr = cv2.cvtColor(yuyv, cv2.COLOR_YUV2BGR_YUY2)
            return RawFrame(bgr, "BGR", w, h, ts.value / 1e6)
        if self._fmt == "MJPG":
            import cv2

            bgr = cv2.imdecode(data, cv2.IMREAD_COLOR)
            if bgr is None:
                return None
            return RawFrame(bgr, "BGR", w, h, ts.value / 1e6)
        if self._fmt == "BGR":
            return RawFrame(
                data.reshape(h, w, 3).copy(), "BGR", w, h, ts.value / 1e6
            )
        # raw bayer: model resolution is half-res
        return RawFrame(
            data.reshape(h, w).copy(), self._fmt, w // 2, h // 2, ts.value / 1e6
        )

    def close(self) -> None:
        if self._cam:
            self._lib.vptpu_v4l2_close(self._cam)
            self._cam = None


class NativeMulticast:
    """Native multicast socket (send + timeout recv)."""

    def __init__(self, group: str, port: int):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._sock = lib.vptpu_mc_open(group.encode(), port)
        if not self._sock:
            raise RuntimeError(f"cannot open multicast {group}:{port}")
        self._buf = np.empty(65536, dtype=np.uint8)

    def send(self, data: bytes) -> int:
        arr = np.frombuffer(data, dtype=np.uint8)
        return int(
            self._lib.vptpu_mc_send(
                self._sock,
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                arr.size,
            )
        )

    def recv(self, timeout_ms: int = 100) -> bytes | None:
        n = self._lib.vptpu_mc_recv(
            self._sock,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._buf.size,
            timeout_ms,
        )
        if n <= 0:
            return None
        return bytes(self._buf[: int(n)])

    def close(self) -> None:
        if self._sock:
            self._lib.vptpu_mc_close(self._sock)
            self._sock = None


register_driver("V4L2", V4L2Driver)
