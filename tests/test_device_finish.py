"""Parity of the in-graph finisher (models/device_finish.py) against the
host finishing path (models/host_detect.py) — same scenes, both paths,
compared on the emitted SSL wire content and the evolved color state.

The host path is authoritative (it mirrors the reference's finishing order,
reference src/main.cpp:320-371); the fused path must reproduce it up to
float32 projection precision.
"""
import numpy as np
import pytest

from vision_processor_tpu.app.processor import Processor
from vision_processor_tpu.io.camera import RawFrame
from vision_processor_tpu.io.synthetic import (
    Scene,
    SceneBall,
    SceneBot,
    render_raw,
)
from vision_processor_tpu.models.device_finish import masked_kmeans2
from vision_processor_tpu.models.kmeans import kmeans2
from vision_processor_tpu.net.udp import TrackingState
from vision_processor_tpu.utils.config import VisionConfig


def _make_processor(divb_field, overhead_model, device_finish):
    cfg = VisionConfig()
    cfg.max_blobs = 256
    cfg.device_finish = device_finish
    proc = Processor(cfg)
    geometry = divb_field.geometry
    geometry.ClearField("calib")
    geometry.calib.append(overhead_model.to_proto(0))
    proc.geometry_check(
        int(overhead_model.size[0]),
        int(overhead_model.size[1]),
        geometry=geometry,
        version=1,
    )
    return proc


@pytest.fixture(scope="module")
def scene():
    return Scene(
        bots=[
            SceneBot(3, "yellow", -2800.0, 600.0, 0.7),
            SceneBot(7, "blue", -1500.0, -900.0, -1.9),
            SceneBot(12, "yellow", -3600.0, -400.0, 2.4),
            SceneBot(9, "blue", -3900.0, 1200.0, 0.1),
        ],
        balls=[SceneBall(-3400.0, -1500.0), SceneBall(-800.0, 300.0)],
        noise_sigma=1.5,
    )


def _bot_map(detection):
    out = {}
    for bot in detection.robots_yellow:
        out[("yellow", bot.robot_id)] = bot
    for bot in detection.robots_blue:
        out[("blue", bot.robot_id)] = bot
    return out


def test_fused_matches_host_over_frames(divb_field, overhead_model, scene):
    """Run the same 3-frame sequence (untracked, then tracked) through both
    finishing paths; the wire content and color evolution must agree."""
    host = _make_processor(divb_field, overhead_model, device_finish=False)
    fused = _make_processor(divb_field, overhead_model, device_finish=True)

    raw = render_raw(
        host.perspective.model, divb_field.geometry.field, scene, "RGGB"
    )
    frame = RawFrame(data=raw, fmt="RGGB", width=960, height=720)
    tracked = {
        0: [
            TrackingState(
                id=3, timestamp=0.99, x=-2805.0, y=597.0, z=143.0, w=0.69,
                vx=0.0, vy=0.0, vz=0.0, vw=0.0, confidence=0.9, age=5,
            ),
            TrackingState(
                id=16 + 7, timestamp=0.99, x=-1504.0, y=-897.0, z=143.0,
                w=-1.88, vx=0.0, vy=0.0, vz=0.0, vw=0.0, confidence=0.9,
                age=5,
            ),
        ]
    }

    for frame_no, priors in enumerate(({}, tracked, {})):
        wh, _, _ = host.process_frame(frame, tracked_by_cam=priors, now=1.0)
        wf, _, _ = fused.process_frame(frame, tracked_by_cam=priors, now=1.0)
        dh, df = wh.detection, wf.detection

        bh, bf = _bot_map(dh), _bot_map(df)
        assert set(bh) == set(bf), (frame_no, set(bh), set(bf))
        for key, hbot in bh.items():
            fbot = bf[key]
            assert abs(hbot.x - fbot.x) < 1.0, (frame_no, key)
            assert abs(hbot.y - fbot.y) < 1.0, (frame_no, key)
            assert abs(hbot.orientation - fbot.orientation) < 1e-4
            assert abs(hbot.confidence - fbot.confidence) < 1e-3
            assert abs(hbot.pixel_x - fbot.pixel_x) < 0.5
            assert abs(hbot.pixel_y - fbot.pixel_y) < 0.5
            assert abs(hbot.height - fbot.height) < 1.0

        assert len(dh.balls) == len(df.balls), frame_no
        hb = sorted(dh.balls, key=lambda b: (b.x, b.y))
        fb = sorted(df.balls, key=lambda b: (b.x, b.y))
        for a, b in zip(hb, fb):
            assert abs(a.x - b.x) < 1.0
            assert abs(a.y - b.y) < 1.0
            assert abs(a.confidence - b.confidence) < 5e-3

        # color state evolves identically up to the f32 blend truncation
        ch = host.colors.packed().astype(np.int64)
        cf = fused.colors.packed().astype(np.int64)
        assert np.abs(ch - cf).max() <= 2, (frame_no, ch - cf)


def test_batched_finisher_matches_per_camera():
    """The vmapped camera-batched finisher (the batched-step fast path)
    must produce exactly what the per-camera finisher produces."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_setup
    from vision_processor_tpu.models.colors import ColorState
    from vision_processor_tpu.models.device_finish import (
        finish_on_device,
        pack_field_marks,
    )
    from vision_processor_tpu.parallel.multicam import (
        MultiCamConfig,
        batched_step_host_tracked,
        params_for_cam,
    )
    from vision_processor_tpu.app.processor import TrackedArrays

    geometry, cams, bm_cfg, det_cfg, params = _build_setup(n_cams=2)
    cfg = MultiCamConfig(bm=bm_cfg, det=det_cfg, n_cams=2)

    rng = np.random.default_rng(3)
    raws = rng.integers(0, 255, (2,) + bm_cfg.raw_shape, dtype=np.uint8)
    packed = np.stack([m.packed() for m, _ in cams])
    scales = np.array([p.field_scale for _, p in cams], dtype=np.float32)
    offsets = np.stack([
        np.array([p.visible_field_extent[0], p.visible_field_extent[2]],
                 dtype=np.float32)
        for _, p in cams
    ])
    colors = np.stack([ColorState().packed() for _ in range(2)])
    refs = np.stack([ColorState().packed_refs() for _ in range(2)])
    marks_one = pack_field_marks(geometry.field, 10.0)
    marks = jax.tree.map(
        lambda *xs: jnp.asarray(np.stack(xs)), *([marks_one] * 2)
    )
    tracked = TrackedArrays.build({}, 0.0, det_cfg.max_tracked).as_dict()

    step = batched_step_host_tracked(cfg)
    blobs, det, fin = step(
        jnp.asarray(raws), jnp.asarray(packed), jnp.asarray(scales),
        jnp.asarray(offsets), jnp.asarray(colors), tracked, params,
        None, jnp.asarray(refs), marks,
    )

    for c in range(2):
        ref_fin = finish_on_device(
            {k: v[c] for k, v in blobs.items()},
            {k: v[c] for k, v in det.items()},
            jnp.asarray(colors[c]),
            jnp.asarray(refs[c]),
            jnp.asarray(packed[c]),
            jax.tree.map(lambda x: x[c], marks),
            params_for_cam(params, c),
        )
        for k, v in ref_fin.items():
            got = np.asarray(fin[k][c])
            want = np.asarray(v)
            if k == "colors7":
                # the blend's float32 sum sits on integer-truncation
                # boundaries; batched vs unrolled compilation may round
                # the last ulp differently (same class of boundary effect
                # as the documented +-2 host/device color tolerance)
                assert np.abs(got - want).max() <= 1.0, (k, got - want)
            elif k in ("ball_score", "bot_score"):
                # scores are ratios of squared distances to the updated
                # colors, so a residual +-1 color difference between the
                # two compilations amplifies to a few percent here
                assert np.allclose(got, want, rtol=1e-5, atol=5e-2,
                                   equal_nan=True), k
            elif np.issubdtype(want.dtype, np.floating):
                assert np.allclose(got, want, rtol=1e-5, atol=5e-3,
                                   equal_nan=True), k
            else:
                assert np.array_equal(got, want), k


def test_masked_kmeans_matches_host_kmeans2():
    """The in-graph masked guarded 2-means must reproduce the host scalar
    kmeans2 (same guards, same integer means) on random masked sets."""
    rng = np.random.default_rng(7)
    for trial in range(40):
        n = 16
        vals = rng.integers(0, 256, size=(n, 3)).astype(np.int64)
        mask = rng.random(n) < rng.uniform(0.1, 1.0)
        contrast = rng.integers(0, 256, size=3).astype(np.int64)
        c1 = rng.integers(0, 256, size=3).astype(np.int64)
        c2 = rng.integers(0, 256, size=3).astype(np.int64)

        ok_h, h1, h2 = kmeans2(contrast, list(vals[mask]), c1, c2)

        import jax.numpy as jnp

        ok_d, d1, d2 = masked_kmeans2(
            jnp.asarray(contrast, jnp.int32),
            jnp.asarray(vals, jnp.int32),
            jnp.asarray(mask),
            jnp.asarray(c1, jnp.int32),
            jnp.asarray(c2, jnp.int32),
        )
        assert bool(ok_d) == ok_h, trial
        assert np.array_equal(np.asarray(d1), h1), trial
        assert np.array_equal(np.asarray(d2), h2), trial
