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


def test_cavlc_multislice_decode(tmp_path):
    """Slice-parallel CAVLC: the 4-slice bitstream decodes to exactly the
    encoder's reconstruction (decoder-output parity holds per slice), and
    differs from the 1-slice decode only through slice-boundary prediction
    (bounded, small)."""
    from vision_processor_tpu.io.native import H264Encoder

    try:
        enc4 = H264Encoder(qp=24, n_slices=4)
        enc1 = H264Encoder(qp=24, n_slices=1)
    except RuntimeError:
        pytest.skip("native library unavailable")

    bgr = _test_image()
    h, w = bgr.shape[:2]
    i420 = cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)
    y = i420[:h]
    u = i420[h:h + h // 4].reshape(h // 2, w // 2)
    v = i420[h + h // 4:].reshape(h // 2, w // 2)

    data4, ry, ru, rv = enc4.encode_i420_recon(y, u, v)
    p4 = tmp_path / "s4.h264"
    p4.write_bytes(data4)
    frames = _decode_annexb(p4)
    assert len(frames) == 1
    got = cv2.cvtColor(frames[0], cv2.COLOR_BGR2YUV_I420)
    # recon parity through the decoder's YUV->BGR->YUV rounding (<=2, as
    # in the lossless test) plus chroma upsample/downsample error on the
    # roundtrip; luma is the tight channel
    assert np.abs(got[:h].astype(int) - ry.astype(int)).max() <= 2

    data1 = enc1.encode_i420(y, u, v)
    assert data1 != data4  # more slices, different (slightly larger) stream
    assert len(data4) < len(data1) * 1.05


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
    # the default debug tier is CAVLC qp=24 (lossy): compare the decoded
    # luma against the encoder's own spec-math reconstruction (what a
    # conforming decoder must output), via the shared YUV conversion
    from vision_processor_tpu.io.native import H264Encoder

    h, w = bgr.shape[:2]
    i420 = cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)
    y = i420[:h]
    u = i420[h:h + h // 4].reshape(h // 2, w // 2)
    v = i420[h + h // 4:].reshape(h // 2, w // 2)
    _, ry, _, _ = H264Encoder(qp=24).encode_i420_recon(y, u, v)
    got = cv2.cvtColor(frames[0][:h, :w], cv2.COLOR_BGR2YUV_I420)[:h]
    assert np.abs(got.astype(int) - ry.astype(int)).max() <= 2


def _decode_raw_luma(path, h):
    """Decode annex-B and return raw luma planes (no colorspace roundtrip):
    CAP_PROP_CONVERT_RGB=0 makes cv2's ffmpeg hand back the Y plane."""
    cap = cv2.VideoCapture(str(path))
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    planes = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        planes.append(f.reshape(-1, f.shape[-1] if f.ndim == 2 else f.shape[1])[:h])
    cap.release()
    return planes


def test_cavlc_encoder_bitexact_luma(tmp_path):
    """The CAVLC intra tier (VERDICT r2 item 7) must produce a standard
    bitstream whose decode equals the encoder's own spec-math
    reconstruction BIT-EXACTLY (deblocking disabled in-stream). Random
    noise at several QPs exercises every coeff_token context (incl. the
    nC>=8 FLC), total_zeros and run_before table region."""
    from vision_processor_tpu.io.native import H264Encoder

    rng = np.random.default_rng(11)
    for qp in (10, 18, 24, 29):
        try:
            enc = H264Encoder(qp=qp)
        except RuntimeError:
            pytest.skip("native library unavailable")
        h, w = 64, 80
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        bs, ry, ru, rv = enc.encode_i420_recon(y, u, v)
        path = tmp_path / f"cavlc{qp}.h264"
        path.write_bytes(bs)
        lumas = _decode_raw_luma(path, h)
        assert lumas, f"qp{qp}: stream did not decode"
        assert np.array_equal(lumas[0], ry), (
            f"qp{qp}: decoded luma differs from spec reconstruction "
            f"(max {np.abs(lumas[0].astype(int) - ry.astype(int)).max()})"
        )
        # chroma VALUE check needs gamut-valid content (cv2 only hands
        # back BGR; out-of-gamut YUV clips differently in ffmpeg's and
        # cv2's converters). Chroma BITSTREAM errors are already covered
        # above: a mis-coded chroma block desyncs the bit position and
        # corrupts the NEXT macroblock's bit-exact luma. Here: RGB noise
        # (valid gamut) encoded, decoded BGR vs the same conversion of
        # the reconstruction — a real chroma recon bug shifts whole 4x4
        # blocks by tens of levels, conversion rounding costs a few.
        bgr_src = cv2.GaussianBlur(
            rng.integers(0, 256, (h, w, 3)).astype(np.uint8), (3, 3), 0)
        i420 = cv2.cvtColor(bgr_src, cv2.COLOR_BGR2YUV_I420)
        bs2, ry2, ru2, rv2 = enc.encode_i420_recon(
            i420[:h],
            i420[h:h + h // 4].reshape(h // 2, w // 2),
            i420[h + h // 4:].reshape(h // 2, w // 2),
        )
        path2 = tmp_path / f"cavlc_rgb{qp}.h264"
        path2.write_bytes(bs2)
        frames = _decode_annexb(path2)
        assert frames, f"qp{qp}: gamut-valid stream did not decode"
        recon_i420 = np.concatenate(
            [ry2, ru2.reshape(h // 4, w), rv2.reshape(h // 4, w)], axis=0)
        want_bgr = cv2.cvtColor(recon_i420, cv2.COLOR_YUV2BGR_I420)
        d = np.abs(frames[0].astype(int) - want_bgr.astype(int)).max()
        assert d <= 4, f"qp{qp}: decoded BGR vs recon BGR max diff {d}"


def test_cavlc_quality_and_lan_bitrate(tmp_path):
    """On realistic camera content (the synthetic field renderer with
    sensor noise) the qp=24 debug tier must fit a LAN: <50 Mb/s at
    1080p30 (reference src/rtpstreamer.cpp streams through a real encoder;
    I_PCM is ~750 Mb/s). Quality gate: reconstruction PSNR >= 36 dB."""
    import numpy as np
    from vision_processor_tpu.io.native import H264Encoder
    from vision_processor_tpu.io.synthetic import (
        Scene, SceneBall, SceneBot, render_rgb,
    )
    from vision_processor_tpu.models.camera import CameraModel
    from vision_processor_tpu.net.geometry_io import geometry_from_dict

    field_cfg = {"field": {
        "field_length": 9000, "field_width": 6000, "goal_width": 1000,
        "goal_depth": 180, "penalty_area_depth": 1000,
        "penalty_area_width": 2000, "boundary_width": 300,
        "center_circle_radius": 500, "line_thickness": 10,
        "ball_radius": 21.5, "max_robot_radius": 90.0,
    }}
    geometry = geometry_from_dict(field_cfg).geometry
    model = CameraModel(
        focal_length=1300.0, principal_point=np.array([960.0, 540.0]),
        distortion_k2=0.02, pos=np.array([-2250.0, 0.0, 4500.0]),
        size=np.array([1920, 1080]),
    )
    scene = Scene(
        bots=[SceneBot(3, "yellow", -2600.0, 400.0, 1.0),
              SceneBot(9, "blue", -1800.0, -500.0, -0.7)],
        balls=[SceneBall(-3000.0, -900.0)],
        noise_sigma=1.5,
    )
    rgb = render_rgb(model, geometry.field, scene)
    h, w = rgb.shape[:2]
    hp = -(-h // 16) * 16
    if hp != h:   # 1080 -> 1088: pad like the streamer does
        rgb = np.pad(rgb, ((0, hp - h), (0, 0), (0, 0)), mode="edge")
        h = hp
    i420 = cv2.cvtColor(rgb[..., ::-1], cv2.COLOR_BGR2YUV_I420)
    y = i420[:h]
    u = i420[h:h + h // 4].reshape(h // 2, w // 2)
    v = i420[h + h // 4:].reshape(h // 2, w // 2)

    try:
        enc = H264Encoder(qp=24)
    except RuntimeError:
        pytest.skip("native library unavailable")
    bs, ry, _, _ = enc.encode_i420_recon(y, u, v)

    mbps_at_30fps = len(bs) * 8 * 30 / 1e6
    assert mbps_at_30fps < 50.0, (
        f"debug tier too fat for a LAN: {mbps_at_30fps:.1f} Mb/s at 30 fps"
    )
    mse = np.mean((y.astype(float) - ry.astype(float)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr >= 36.0, f"debug tier quality too low: {psnr:.1f} dB"


def test_cavlc_fuzz_bitexact(tmp_path):
    """Randomized bit-exactness sweep across the content classes that
    historically exposed VLC-table bugs: full-range noise (high
    TotalCoeff, FLC context), blurred noise (sparse mid tables), and
    field-like line art (high total_zeros rows). Every stream must decode
    to EXACTLY the encoder's reconstruction."""
    from vision_processor_tpu.io.native import H264Encoder

    rng = np.random.default_rng(29)
    try:
        H264Encoder(qp=20)
    except RuntimeError:
        pytest.skip("native library unavailable")

    for trial in range(24):
        qp = int(rng.integers(10, 30))
        mbw, mbh = int(rng.integers(1, 5)), int(rng.integers(1, 4))
        h, w = mbh * 16, mbw * 16
        kind = trial % 3
        if kind == 0:
            y = rng.integers(0, 256, (h, w)).astype(np.uint8)
            u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
            v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        elif kind == 1:
            y = cv2.GaussianBlur(
                rng.integers(0, 256, (h, w)).astype(np.uint8), (3, 3), 0)
            u = cv2.GaussianBlur(
                rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
                (3, 3), 0)
            v = u.copy()
        else:
            yf = np.full((h, w), 90, np.float64)
            for _ in range(4):
                if rng.random() < 0.5:
                    r = int(rng.integers(0, h)); yf[r:r + 2, :] = 230
                else:
                    c = int(rng.integers(0, w)); yf[:, c:c + 2] = 230
            y = np.clip(yf + rng.normal(0, 1.5, (h, w)), 0, 255).astype(np.uint8)
            u = np.clip(np.full((h // 2, w // 2), 80.0)
                        + rng.normal(0, 1.5, (h // 2, w // 2)),
                        0, 255).astype(np.uint8)
            v = np.clip(np.full((h // 2, w // 2), 90.0)
                        + rng.normal(0, 1.5, (h // 2, w // 2)),
                        0, 255).astype(np.uint8)
        enc = H264Encoder(qp=qp)
        bs, ry, _, _ = enc.encode_i420_recon(y, u, v)
        path = tmp_path / "fz.h264"
        path.write_bytes(bs)
        lumas = _decode_raw_luma(path, h)
        assert lumas, f"trial {trial} qp{qp} {w}x{h}: did not decode"
        assert np.array_equal(lumas[0], ry), f"trial {trial} qp{qp} {w}x{h}"


def test_cavlc_ipcm_fallback(tmp_path, monkeypatch):
    """Per-MB I_PCM fallback: any MB whose CAVLC coding costs more than
    the raw samples is rewound and sent verbatim (spec 7.3.5/8.3.5),
    bounding the worst-case MB at ~390 bytes regardless of content
    (reference encoders do the same; cf. reference src/rtpstreamer.cpp
    codec tiers). Checks the forced path is lossless through a stock
    decoder (neighbor nC=16 and DC-mode contexts included), that auto
    mode engages on pathological content and shrinks the stream, and
    that mixed PCM/coded streams stay decode-exact."""
    from vision_processor_tpu.io.native import H264Encoder

    try:
        enc = H264Encoder(qp=24)
    except RuntimeError:
        pytest.skip("native library unavailable")

    h, w = 64, 64
    yy, xx = np.mgrid[0:h, 0:w]
    checker_y = (((yy + xx) & 1) * 255).astype(np.uint8)
    checker_c = (((yy[: h // 2, : w // 2] + xx[: h // 2, : w // 2]) & 1)
                 * 255).astype(np.uint8)
    flat_u = np.full((h // 2, w // 2), 200, np.uint8)
    flat_v = np.full((h // 2, w // 2), 60, np.uint8)

    # 1. forced I_PCM: the decoded luma equals the SOURCE exactly
    monkeypatch.setenv("VPTPU_PCM", "force")
    bs, ry, _, _ = enc.encode_i420_recon(checker_y, flat_u, flat_v)
    assert np.array_equal(ry, checker_y)
    p = tmp_path / "pcm_force.h264"
    p.write_bytes(bs)
    lum = _decode_raw_luma(p, h)
    assert lum and np.array_equal(lum[0], checker_y)

    # 2. auto engages on a full-range checkerboard at qp 10 and beats
    #    the PCM-off stream; the worst case is bounded near raw size
    enc10 = H264Encoder(qp=10)
    monkeypatch.setenv("VPTPU_PCM", "0")
    bs_off, *_ = enc10.encode_i420_recon(checker_y, checker_c,
                                         255 - checker_c)
    monkeypatch.setenv("VPTPU_PCM", "1")
    bs_auto, ry2, _, _ = enc10.encode_i420_recon(checker_y, checker_c,
                                                 255 - checker_c)
    n_mbs = (h // 16) * (w // 16)
    assert len(bs_auto) < len(bs_off)
    assert len(bs_auto) <= n_mbs * 392 + 512  # 384 B raw + header + NALs
    p2 = tmp_path / "pcm_auto.h264"
    p2.write_bytes(bs_auto)
    lum2 = _decode_raw_luma(p2, h)
    assert lum2 and np.array_equal(lum2[0], ry2)

    # 3. mixed coded/PCM frame (noise rows + checkerboard rows): the
    #    PCM<->coded neighbor prediction contexts must stay decode-exact
    rng = np.random.default_rng(7)
    y_mix = rng.integers(0, 256, (h, w)).astype(np.uint8)
    y_mix[:32] = checker_y[:32]
    u_mix = checker_c.copy()
    u_mix[16:] = 128
    bs3, ry3, _, _ = enc10.encode_i420_recon(y_mix, u_mix, flat_v)
    p3 = tmp_path / "pcm_mix.h264"
    p3.write_bytes(bs3)
    lum3 = _decode_raw_luma(p3, h)
    assert lum3 and np.array_equal(lum3[0], ry3)
