"""End-to-end detection tests: synthetic scene -> Processor -> SSL protobuf.

Covers the vectorized hypothesis search (detection + tracked paths), id
assignment, color update, clipping NMS, and ball detection.
"""
import numpy as np
import pytest

from vision_processor_tpu.app.processor import Processor, TrackedArrays
from vision_processor_tpu.io.camera import RawFrame
from vision_processor_tpu.io.synthetic import (
    Scene,
    SceneBall,
    SceneBot,
    render_raw,
)
from vision_processor_tpu.net.udp import TrackingState
from vision_processor_tpu.utils.config import VisionConfig

MAXH = 150.0


@pytest.fixture(scope="module")
def processor(divb_field, overhead_model):
    cfg = VisionConfig()
    cfg.max_blobs = 256
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
    assert proc.perspective.geometry_version == 1
    return proc


@pytest.fixture(scope="module")
def scene():
    return Scene(
        bots=[
            SceneBot(3, "yellow", -2800.0, 600.0, 0.7),
            SceneBot(7, "blue", -1500.0, -900.0, -1.9),
            SceneBot(12, "yellow", -3600.0, -400.0, 2.4),
        ],
        balls=[SceneBall(-3400.0, -1500.0)],
        noise_sigma=1.5,
    )


@pytest.fixture(scope="module")
def detection(processor, scene, divb_field):
    raw = render_raw(processor.perspective.model, divb_field.geometry.field, scene, "RGGB")
    frame = RawFrame(data=raw, fmt="RGGB", width=960, height=720)
    wrapper, blobs, det = processor.process_frame(frame, tracked_by_cam={}, now=1.0)
    return wrapper.detection


def test_all_bots_detected(detection, scene):
    got = {}
    for bot in detection.robots_yellow:
        got[("yellow", bot.robot_id)] = bot
    for bot in detection.robots_blue:
        got[("blue", bot.robot_id)] = bot
    for sbot in scene.bots:
        key = (sbot.team, sbot.bot_id)
        assert key in got, f"bot {key} missing; got {list(got)}"
        bot = got[key]
        assert abs(bot.x - sbot.x) < 30, (bot.x, sbot.x)
        assert abs(bot.y - sbot.y) < 30, (bot.y, sbot.y)
        # orientation wrap-aware comparison
        d = (bot.orientation - sbot.orientation + np.pi) % (2 * np.pi) - np.pi
        assert abs(d) < 0.12, (bot.orientation, sbot.orientation)
        assert bot.confidence > 0.2


def test_bot_count_exact(detection, scene):
    assert len(detection.robots_yellow) == 2
    assert len(detection.robots_blue) == 1


def test_ball_detected(detection, scene):
    assert len(detection.balls) >= 1
    ball = max(detection.balls, key=lambda b: b.confidence)
    assert abs(ball.x - scene.balls[0].x) < 40
    assert abs(ball.y - scene.balls[0].y) < 40
    assert ball.confidence > 0.2


def test_no_spurious_bots(detection):
    assert len(detection.robots_yellow) + len(detection.robots_blue) == 3


def test_tracked_path(processor, scene, divb_field):
    """With tracking priors the same bots must be found via the tracked
    search (and not duplicated by the NMS)."""
    raw = render_raw(processor.perspective.model, divb_field.geometry.field, scene, "RGGB")
    frame = RawFrame(data=raw, fmt="RGGB", width=960, height=720)
    tracked = {
        0: [
            TrackingState(
                id=3, timestamp=0.99, x=-2805.0, y=597.0, z=143.0, w=0.69,
                vx=0.0, vy=0.0, vz=0.0, vw=0.0, confidence=0.9, age=5,
            ),
            TrackingState(
                id=16 + 7, timestamp=0.99, x=-1504.0, y=-897.0, z=143.0, w=-1.88,
                vx=0.0, vy=0.0, vz=0.0, vw=0.0, confidence=0.9, age=5,
            ),
        ]
    }
    wrapper, blobs, det = processor.process_frame(frame, tracked_by_cam=tracked, now=1.0)
    detection = wrapper.detection
    ids_y = sorted(b.robot_id for b in detection.robots_yellow)
    ids_b = sorted(b.robot_id for b in detection.robots_blue)
    assert ids_y == [3, 12]
    assert ids_b == [7]


def test_tracked_arrays_build():
    tracked = {
        0: [TrackingState(-1, 0.0, 0, 0, 21.5, 0, 0, 0, 0, 0, 0.9, 1),
            TrackingState(4, 0.5, 100, 200, 143, 1.0, 10, 20, 0, 0.1, 0.8, 3)],
        1: [TrackingState(17, 0.6, -100, -200, 148, -1.0, 0, 0, 0, 0, 0.7, 2)],
    }
    arrs = TrackedArrays.build(tracked, 1.0, 8)
    assert arrs.valid.sum() == 2  # ball skipped
    assert set(arrs.id[arrs.valid]) == {4, 17}
    i = list(arrs.id).index(4)
    assert arrs.time_delta[i] == pytest.approx(0.5)


def test_iter_top_k_matches_lax():
    """iter_top_k: values always match lax.top_k; indices match wherever the
    selected value is finite (all--inf slots are masked invalid downstream,
    so their index order is immaterial — argmax repeats slot 0 there)."""
    import jax
    import jax.numpy as jnp

    from vision_processor_tpu.models.detector import iter_top_k

    rng = np.random.default_rng(5)
    x = rng.normal(size=(64, 500)).astype(np.float32)
    # inject ties and -inf rows
    x[:, 100] = x[:, 200]
    x[3, :] = -np.inf
    v1, i1 = jax.lax.top_k(jnp.asarray(x), 8)
    v2, i2 = jax.jit(lambda a: iter_top_k(a, 8))(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    finite = np.isfinite(np.asarray(v1))
    np.testing.assert_array_equal(
        np.asarray(i1)[finite], np.asarray(i2)[finite]
    )


def test_sparse_ring_not_inflated_by_padding():
    """Anchors with <4 in-radius blobs must stay rejected: iter_top_k pads
    exhausted slots with repeated index 0, and validity must come from the
    selected values, not a re-gathered in-radius mask (regression — with
    blob 0 in radius the padding used to inflate ring_count past the
    reference's >=4-blob gate, reference src/main.cpp:63-75)."""
    import jax.numpy as jnp

    from vision_processor_tpu.models.detector import (
        DetectorConfig,
        detection_hypotheses,
    )

    n = 32
    pos = np.full((n, 2), 1e6, dtype=np.float32)  # far away padding
    # blobs 0, 5, 9 clustered (anchor 0 has only 3 in-radius incl. itself)
    pos[0] = [0.0, 0.0]
    pos[5] = [40.0, 10.0]
    pos[9] = [-30.0, 35.0]
    valid = np.zeros(n, dtype=bool)
    valid[[0, 5, 9]] = True

    cfg = DetectorConfig(max_blobs=n, max_anchors=n)
    out = detection_hypotheses(
        cfg, jnp.asarray(pos), jnp.asarray(valid), jnp.float32(90.0)
    )
    assert not bool(np.asarray(out["valid"]).any()), np.asarray(out["score"])
