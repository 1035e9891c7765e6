"""Additional coverage: GC referee heights, device-resident rollout loop,
timing utilities, in-graph bot id estimation."""
import time

import jax.numpy as jnp
import numpy as np
import pytest


def test_gc_socket_heights():
    from vision_processor_tpu.net.udp import GCSocket
    from vision_processor_tpu.proto import Referee

    heights = {"Alpha": 150.0, "Beta": 120.0, "Gamma": 141.0}
    recv = GCSocket("224.99.99.41", 17771, heights)
    send = GCSocket("224.99.99.41", 17771, heights)
    try:
        assert recv.max_bot_height == 150.0
        assert recv.default_bot_height == pytest.approx(137.0)

        ref = Referee()
        ref.yellow.name = "Beta"
        ref.blue.name = "Unknown Team"
        send.send(ref)
        time.sleep(0.2)
        assert recv.yellow_bot_height == 120.0
        assert recv.blue_bot_height == pytest.approx(137.0)  # unchanged
    finally:
        recv.close()
        send.close()


def test_estimate_bot_ids():
    from vision_processor_tpu.models.colors import ColorState
    from vision_processor_tpu.models.detector import estimate_bot_ids
    from vision_processor_tpu.models.pattern import PATTERNS, PATTERN_LUT

    colors = jnp.asarray(ColorState().packed())
    yellow, blue = np.array([255, 128, 0]), np.array([0, 128, 255])
    green, pink = np.array([0, 255, 128]), np.array([255, 0, 128])

    # construct blob colors for bot id 6 (pattern 0b1011), team blue
    pattern = int(PATTERNS[6])
    blob_color = np.zeros((8, 3), np.float32)
    blob_color[0] = blue
    for slot in range(1, 5):
        blob_color[slot] = green if (pattern >> (4 - slot)) & 1 else pink
    det = {
        "bot_blob_idx": jnp.asarray([[0, 1, 2, 3, 4]], jnp.int32),
        "bot_tracked_id": jnp.asarray([-1], jnp.int32),
    }
    ids = np.asarray(estimate_bot_ids(det, jnp.asarray(blob_color), colors))
    assert ids[0] == 16 + 6

    # tracked bots keep their id
    det["bot_tracked_id"] = jnp.asarray([3], jnp.int32)
    ids = np.asarray(estimate_bot_ids(det, jnp.asarray(blob_color), colors))
    assert ids[0] == 3


def test_make_rollout_device_loop(divb_field):
    """Device-resident N-frame loop: distinct frames from a bank, feedback
    through the tracking summaries."""
    import jax

    from tests.test_multicam import build_cfg, make_rig, params
    from vision_processor_tpu.io.synthetic import Scene, SceneBot, render_raw
    from vision_processor_tpu.parallel import multicam as M

    cams = make_rig(divb_field, 2)
    raws = []
    for cam_id, (model, persp) in enumerate(cams):
        lo = persp.visible_field_extent
        scene = Scene(
            bots=[SceneBot(cam_id, "yellow",
                           (lo[0] + lo[1]) / 2, (lo[2] + lo[3]) / 2, 0.5)],
            balls=[],
        )
        raws.append(render_raw(model, divb_field.geometry.field, scene, "RGGB"))
    raws = np.stack(raws)
    cfg = build_cfg(cams, 2, raws.shape[1:])
    step = M.batched_step(cfg)
    bank = jnp.asarray(np.stack([raws, np.roll(raws, (2, 2), axis=(1, 2))]))
    packed = jnp.asarray(np.stack([m.packed() for m, _ in cams]))
    scales = jnp.asarray(
        np.array([p.field_scale for _, p in cams], np.float32)
    )
    offsets = jnp.asarray(
        np.stack(
            [
                np.array([p.visible_field_extent[0], p.visible_field_extent[2]],
                         np.float32)
                for _, p in cams
            ]
        )
    )
    from vision_processor_tpu.models.colors import ColorState

    colors = jnp.asarray(np.stack([ColorState().packed()] * 2))

    roll = M.make_rollout(cfg, step, 4)
    (_, summary), compact = roll(bank, packed, scales, offsets, colors, params())
    jax.block_until_ready(compact)
    valid = np.asarray(compact["bot_valid"])  # (4 frames, 2 cams, B)
    assert valid.shape[0] == 4
    assert (valid.sum(axis=-1) == 1).all()  # one bot per cam every frame
    ids = np.asarray(summary["id"])
    assert set(ids[ids >= 0]) == {0, 1}


def test_stage_timer_and_frame_stats():
    import jax.numpy as jnp

    from vision_processor_tpu.utils.timing import FrameStats, StageTimer

    timer = StageTimer()
    out = timer.measure("double", lambda x: x * 2, jnp.ones(8))
    assert float(out[0]) == 2.0
    assert timer.counts["double"] == 1
    timer.print_runtimes()
    timer.clear()
    assert not timer.totals

    stats = FrameStats(window=4)
    assert not stats.add(0.001, budget=0.01)
    assert stats.add(0.02, budget=0.01)
    assert stats.overruns == 1
    assert stats.percentile(50) > 0
    assert "overruns=1" in stats.summary()
