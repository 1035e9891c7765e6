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

        # a FULL Referee packet per the complete GC schema, including a
        # game event (reference proto/ssl_gc_referee_message.proto)
        ref = Referee()
        ref.packet_timestamp = 1_700_000_000_000_000
        ref.stage = Referee.NORMAL_FIRST_HALF
        ref.command = Referee.FORCE_START
        ref.command_counter = 17
        ref.command_timestamp = 1_700_000_000_000_000
        for team, name in ((ref.yellow, "Beta"), (ref.blue, "Unknown Team")):
            team.name = name
            team.score = 2
            team.red_cards = 0
            team.yellow_cards = 1
            team.yellow_card_times.append(30_000_000)
            team.timeouts = 4
            team.timeout_time = 300_000_000
            team.goalkeeper = 0
            team.max_allowed_bots = 11
        ref.blue_team_on_positive_half = True
        ev = ref.game_events.add()
        ev.type = ev.GOAL
        ev.goal.by_team = 1  # YELLOW
        ev.goal.kicking_bot = 7
        ev.goal.location.x = 4.5
        ev.goal.location.y = 0.25
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
    (_, summary, _prev, _colors), compact = roll(
        bank, packed, scales, offsets, colors, params()
    )
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


def test_tracked_vision_protos_roundtrip():
    """Full tracked-vision wire schema round-trips (reference
    proto/ssl_vision_detection_tracked.proto, ssl_vision_wrapper_tracked)."""
    from vision_processor_tpu.proto import (
        TrackedFrame,
        TrackerWrapperPacket,
    )

    pkt = TrackerWrapperPacket()
    pkt.uuid = "6f2b8e00-1111-2222-3333-444455556666"
    pkt.source_name = "vision-processor-tpu"
    fr = pkt.tracked_frame
    fr.frame_number = 42
    fr.timestamp = 1234.5
    ball = fr.balls.add()
    ball.pos.x, ball.pos.y, ball.pos.z = 1.0, -2.0, 0.02
    ball.vel.x, ball.vel.y, ball.vel.z = 0.5, 0.0, 0.0
    ball.visibility = 0.9
    bot = fr.robots.add()
    bot.robot_id.id = 7
    bot.robot_id.team = 2  # BLUE
    bot.pos.x, bot.pos.y = -1.5, 0.75
    bot.orientation = 1.2
    bot.visibility = 1.0
    fr.capabilities.append(2)  # CAPABILITY_DETECT_MULTIPLE_BALLS
    kb = fr.kicked_ball
    kb.pos.x, kb.pos.y = 0.0, 0.0
    kb.vel.x, kb.vel.y, kb.vel.z = 3.0, 1.0, 0.0
    kb.start_timestamp = 1234.0

    wire = pkt.SerializeToString()
    back = TrackerWrapperPacket()
    back.ParseFromString(wire)
    assert back.tracked_frame.robots[0].robot_id.id == 7
    assert back.tracked_frame.balls[0].pos.y == -2.0
    assert back.tracked_frame.kicked_ball.vel.x == 3.0


def test_tracked_arrays_dedupe_across_cameras():
    """A robot seen by several cameras occupies ONE tracked slot (freshest
    estimate wins), so a legal 22-robot scene fits the 32 slots even with
    heavy camera overlap."""
    from types import SimpleNamespace

    from vision_processor_tpu.app.processor import TrackedArrays

    def obj(i, ts, x):
        return SimpleNamespace(
            id=i, x=x, y=0.0, z=0.0, w=0.0, vx=0.0, vy=0.0, vw=0.0,
            timestamp=ts,
        )

    tracked_by_cam = {
        0: [obj(3, 10.0, 100.0), obj(4, 10.0, 200.0)],
        1: [obj(3, 11.0, 105.0)],  # newer estimate of robot 3
        2: [obj(3, 9.0, 90.0), obj(7, 10.0, 300.0)],
    }
    arr = TrackedArrays.build(tracked_by_cam, now=12.0, slots=8)
    ids = arr.id[arr.valid].tolist()
    assert sorted(ids) == [3, 4, 7]
    i3 = arr.id.tolist().index(3)
    assert arr.x[i3] == 105.0  # freshest wins
    assert arr.time_delta[i3] == pytest.approx(1.0)
