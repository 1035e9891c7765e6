"""In-process H.264: the native all-I_PCM baseline encoder must produce a
standard bitstream that a stock decoder plays back losslessly, and the RTP
streamer's emitted packet stream must depacketize (RFC 6184) and decode
(VERDICT r1 item 9; reference src/rtpstreamer.cpp:29-198).
"""
import socket
import struct
import time

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _test_image(w=320, h=240):
    bgr = np.zeros((h, w, 3), np.uint8)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    bgr[..., 0] = (xx * 255 // w).astype(np.uint8)
    bgr[..., 1] = (yy * 255 // h).astype(np.uint8)
    bgr[..., 2] = 96
    bgr[40:90, 50:120] = (30, 200, 40)
    bgr[130:200, 180:290] = (200, 50, 220)
    return bgr


def _decode_annexb(path):
    cap = cv2.VideoCapture(str(path))
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return frames


def test_native_encoder_lossless_decode(tmp_path):
    from vision_processor_tpu.io.native import H264Encoder

    try:
        enc = H264Encoder()
    except RuntimeError:
        pytest.skip("native library unavailable")

    bgr = _test_image()
    h, w = bgr.shape[:2]
    i420 = cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)
    y = i420[:h]
    u = i420[h:h + h // 4].reshape(h // 2, w // 2)
    v = i420[h + h // 4:].reshape(h // 2, w // 2)

    path = tmp_path / "stream.h264"
    with path.open("wb") as fh:
        for _ in range(3):
            fh.write(enc.encode_i420(y, u, v))

    frames = _decode_annexb(path)
    assert len(frames) == 3
    # I_PCM carries the samples verbatim; the residual <=2 is the decoder's
    # own YUV->BGR->YUV rounding, not coding loss
    got = cv2.cvtColor(frames[0], cv2.COLOR_BGR2YUV_I420)
    assert np.abs(got[:h].astype(int) - y.astype(int)).max() <= 2


def test_rtp_stream_decodes(tmp_path):
    """Capture the streamer's real UDP output, reassemble per RFC 6184,
    decode, compare against what was offered."""
    from vision_processor_tpu.io.rtp import RTPStreamer, depacketize_h264

    group, port = "224.99.99.98", 18061
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    # one I_PCM access unit is a ~120 KB burst of datagrams
    rx.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4 * 1024 * 1024)
    rx.bind(("", port))
    rx.setsockopt(
        socket.IPPROTO_IP, socket.IP_ADD_MEMBERSHIP,
        struct.pack("4s4s", socket.inet_aton(group), socket.inet_aton("0.0.0.0")),
    )
    rx.settimeout(2.0)

    streamer = RTPStreamer(True, f"rtp://{group}:{port}", framerate=30.0)
    if streamer.codec != "h264-native":
        streamer.close()
        rx.close()
        pytest.skip(f"native H.264 unavailable (codec {streamer.codec})")

    bgr = _test_image()
    rgb = bgr[..., ::-1].copy()
    packets = []
    deadline = time.time() + 5.0
    try:
        streamer.send_frame(rgb)
        while time.time() < deadline:
            try:
                pkt, _ = rx.recvfrom(65536)
            except socket.timeout:
                break
            packets.append(pkt)
            if pkt[1] & 0x80:  # marker: end of access unit
                break
    finally:
        streamer.close()
        rx.close()

    assert packets, "no RTP packets on the wire"
    annexb = depacketize_h264(packets)
    path = tmp_path / "cap.h264"
    path.write_bytes(annexb)
    frames = _decode_annexb(path)
    assert frames, "captured stream did not decode"
    # compare via the shared YUV conversion (gamut-valid test image)
    h, w = bgr.shape[:2]
    want = cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)[:h]
    got = cv2.cvtColor(frames[0][:h, :w], cv2.COLOR_BGR2YUV_I420)[:h]
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 2
