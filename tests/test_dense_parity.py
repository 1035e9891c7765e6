"""Dense-scene parity: the detector's static caps (ring_size=8,
tracked_candidates=3) vs an UNCAPPED host-side oracle implementing the
reference's enumeration exactly (reference src/main.cpp:63-75: every
4-subset of ALL in-radius blobs in every cyclic rotation; src/main.cpp:
101-133: full cross product of ALL per-slot candidates for tracked bots).

The adversarial scene floods robot radii with hundreds of spurious blobs —
including off-color noise INSIDE every robot's radius and a few green/pink
impostors — with the spurious blobs packed into the LOWEST slots so
extraction-score ordering cannot save the ring. The color-plausibility ring
ranking must keep the true pattern blobs, and the capped search must return
exactly the oracle's best hypothesis for every robot.
"""
import math
from itertools import combinations, product

import numpy as np
import pytest

from vision_processor_tpu.models.colors import ColorState
from vision_processor_tpu.models.detector import (
    DetectorConfig,
    detect,
    detection_hypotheses,
    tracked_hypotheses,
)
from vision_processor_tpu.models.pattern import PATTERNS, PATTERN_ANGLES_B2B, PATTERN_POS

MAX_ROBOT_RADIUS = 90.0

_PAIRS = [(a, b) for a in range(5) for b in range(a + 1, 5)]
_PAIR_ANGLE = np.asarray(PATTERN_ANGLES_B2B).reshape(5, 5)[
    [p[1] for p in _PAIRS], [p[0] for p in _PAIRS]
]


def score5(pos5: np.ndarray, valid5=None):
    """Reference BotHypothesis scoring (hypothesis.cpp:156-205), numpy."""
    if valid5 is None:
        valid5 = np.ones(5, dtype=bool)
    pa = pos5[[p[0] for p in _PAIRS]]
    pb = pos5[[p[1] for p in _PAIRS]]
    pv = valid5[[p[0] for p in _PAIRS]] & valid5[[p[1] for p in _PAIRS]]
    d = pb - pa
    delta = np.arctan2(d[:, 1], d[:, 0]) - _PAIR_ANGLE
    o_sin = np.sum(np.where(pv, np.sin(delta), 0.0))
    o_cos = np.sum(np.where(pv, np.cos(delta), 0.0))
    amount = int(valid5.sum())
    orientation = math.atan2(o_sin, o_cos) if amount > 1 else 0.0
    c, s = math.cos(orientation), math.sin(orientation)
    rot = np.asarray(PATTERN_POS) @ np.array([[c, s], [-s, c]])
    offsets = pos5 - rot
    pos = np.sum(np.where(valid5[:, None], offsets, 0.0), axis=0) / max(amount, 1)
    slot_off = (pos5 - (pos + rot)) / 10.0
    slot_score = 1.0 / (1.0 + np.sum(slot_off**2, axis=-1))
    kept = slot_score[valid5]
    offset_score = float(np.min(kept)) if len(kept) else 1.0
    return orientation, pos, offset_score, amount


def oracle_detection(blob_pos, blob_valid, anchors):
    """Uncapped reference enumeration: per anchor, every cyclic rotation of
    every 4-subset of ALL in-radius blobs."""
    best = {}
    valid_idx = np.flatnonzero(blob_valid)
    for a in anchors:
        diffs = blob_pos[valid_idx] - blob_pos[a]
        inr = valid_idx[np.sum(diffs**2, axis=-1) <= MAX_ROBOT_RADIUS**2]
        ring = sorted(
            inr,
            key=lambda j: math.atan2(*(blob_pos[j] - blob_pos[a])[::-1][::1][::-1])
            if False else math.atan2(blob_pos[j][1] - blob_pos[a][1],
                                     blob_pos[j][0] - blob_pos[a][0]),
        )
        best_score, best_hyp = 0.0, None
        for subset in combinations(range(len(ring)), 4):
            for r in range(4):
                sides = [ring[subset[(j + r) % 4]] for j in range(4)]
                pos5 = np.stack([blob_pos[a]] + [blob_pos[j] for j in sides])
                orientation, pos, score, _ = score5(pos5)
                if score > best_score:
                    best_score = score
                    best_hyp = (orientation, pos, sides)
        best[a] = (best_score, best_hyp)
    return best


def build_scene(rng, n_bots=8, n_spurious=520, impostors=4):
    colors = ColorState()
    packed = colors.packed().astype(np.float32)
    green, pink = packed[4], packed[5]
    yellow, blue = packed[2], packed[3]

    bot_truth = []
    real_pos, real_col = [], []
    for b in range(n_bots):
        bot_id = b % 16
        team_blue = b >= n_bots // 2
        cx = -4000.0 + (b % 4) * 1200.0
        cy = -2300.0 + (b // 4) * 1800.0
        w = float(rng.uniform(-math.pi, math.pi))
        c, s = math.cos(w), math.sin(w)
        rot = np.asarray(PATTERN_POS) @ np.array([[c, s], [-s, c]])
        center = np.array([cx, cy])
        pat = int(PATTERNS[bot_id])
        bot_truth.append((bot_id + (16 if team_blue else 0), center, w))
        for slot in range(5):
            real_pos.append(center + rot[slot])
            if slot == 0:
                col = blue if team_blue else yellow
            else:
                col = green if (pat >> (4 - slot)) & 1 else pink
            real_col.append(col + rng.normal(0, 2, 3).astype(np.float32))

    # spurious: noise-colored, most scattered, ~8 INSIDE each robot radius
    sp_pos, sp_col = [], []
    for b in range(n_bots):
        center = bot_truth[b][1]
        for _ in range(8):
            ang = rng.uniform(0, 2 * math.pi)
            rad = rng.uniform(25.0, MAX_ROBOT_RADIUS - 1.0)
            sp_pos.append(center + rad * np.array([math.cos(ang), math.sin(ang)]))
            sp_col.append(rng.uniform(90, 170, 3).astype(np.float32))
    # green/pink impostors inside two robots' radii
    for b in range(impostors):
        center = bot_truth[b % n_bots][1]
        ang = rng.uniform(0, 2 * math.pi)
        sp_pos.append(center + 60.0 * np.array([math.cos(ang), math.sin(ang)]))
        sp_col.append((green if b % 2 else pink) + rng.normal(0, 2, 3))
    while len(sp_pos) < n_spurious:
        sp_pos.append(np.array([rng.uniform(-4500, 0), rng.uniform(-2800, 0)]))
        sp_col.append(rng.uniform(80, 180, 3).astype(np.float32))

    # adversarial slot order: spurious blobs FIRST (highest "extraction
    # score" rank), real pattern blobs last
    pos = np.asarray(sp_pos + real_pos, dtype=np.float32)
    col = np.asarray(sp_col + real_col, dtype=np.float32)
    n = len(pos)
    valid = np.ones(n, dtype=bool)
    anchors = list(range(len(sp_pos), n, 5))  # center-blob indices
    return packed, pos, col, valid, anchors, bot_truth


def test_detection_caps_match_uncapped_oracle():
    rng = np.random.default_rng(42)
    packed_colors, pos, col, valid, anchors, bot_truth = build_scene(rng)
    n = len(pos)

    cfg = DetectorConfig(max_blobs=n, max_anchors=n)
    det = detection_hypotheses(
        cfg, pos, valid, np.float32(MAX_ROBOT_RADIUS),
        blob_color=col, colors=packed_colors[:6],
    )
    det = {k: np.asarray(v) for k, v in det.items()}

    oracle = oracle_detection(pos, valid, anchors)
    for a in anchors:
        o_score, o_hyp = oracle[a]
        assert o_score > 0.5, "oracle must find every planted robot"
        d_score = float(det["score"][a])
        assert d_score == pytest.approx(o_score, rel=1e-4), (
            f"anchor {a}: capped score {d_score} vs oracle {o_score}"
        )
        o_orient, o_pos, o_sides = o_hyp
        assert float(det["orientation"][a]) == pytest.approx(o_orient, abs=1e-4)
        assert np.allclose(det["pos"][a], o_pos, atol=0.1)
        assert sorted(int(j) for j in det["blob_idx"][a][1:]) == sorted(o_sides)


def test_full_detect_finds_all_bots_in_dense_scene():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    packed_colors, pos, col, valid, anchors, bot_truth = build_scene(rng)
    n = len(pos)

    cfg = DetectorConfig(max_blobs=n, max_anchors=n)
    blobs = {
        "field_pos": jnp.asarray(pos),
        "color": jnp.asarray(col),
        "valid": jnp.asarray(valid),
    }
    tracked = {
        "id": jnp.full(cfg.max_tracked, -1, jnp.int32),
        "x": jnp.zeros(cfg.max_tracked), "y": jnp.zeros(cfg.max_tracked),
        "z": jnp.zeros(cfg.max_tracked), "w": jnp.zeros(cfg.max_tracked),
        "vx": jnp.zeros(cfg.max_tracked), "vy": jnp.zeros(cfg.max_tracked),
        "vw": jnp.zeros(cfg.max_tracked),
        "time_delta": jnp.zeros(cfg.max_tracked),
        "valid": jnp.zeros(cfg.max_tracked, bool),
    }
    params = {
        "max_bot_height": jnp.float32(150.0),
        "max_robot_radius": jnp.float32(MAX_ROBOT_RADIUS),
        "min_tracking_radius": jnp.float32(20.0),
        "max_bot_acceleration": jnp.float32(6500.0),
        "min_confidence": jnp.float32(0.2),
        "clipping_tolerance": jnp.float32(10.0),
        "ball_radius": jnp.float32(21.5),
    }
    cam = np.zeros(18, dtype=np.float32)
    cam[0] = 900.0
    cam[4] = 1.0  # identity-ish quaternion slot; projection unused w/o tracked
    out = detect(cfg, blobs, tracked, jnp.asarray(packed_colors[:6]), cam, params)
    kept_pos = np.asarray(out["bot_pos"])[np.asarray(out["bot_valid"])]
    assert len(kept_pos) == len(bot_truth), (
        f"{len(kept_pos)} bots kept, expected {len(bot_truth)}"
    )
    for _, center, _ in bot_truth:
        d = np.min(np.linalg.norm(kept_pos - center, axis=-1))
        assert d < 5.0, f"robot at {center} missing (nearest kept {d:.1f} mm)"


def test_detection_parity_with_production_anchor_cap_binding():
    """The production max_anchors=512 cap, actually BINDING (1600 blobs),
    against the uncapped oracle. The scene packs 1560 spurious blobs into
    the highest extraction-score slots — under the old score-order anchor
    window, ZERO true robot centers would be anchored and the untracked
    path would find nothing. Anchor ranking by center-color plausibility
    must keep every true center in the window and reproduce the oracle's
    best hypothesis exactly (reference src/main.cpp:63-75 anchors every
    blob)."""
    rng = np.random.default_rng(11)
    packed_colors, pos, col, valid, anchors, bot_truth = build_scene(
        rng, n_bots=8, n_spurious=1560
    )
    n = len(pos)
    cfg = DetectorConfig(max_blobs=n)  # max_anchors stays at the default
    assert cfg.max_anchors == 512 < n, "cap must bind for this test"
    assert min(anchors) >= cfg.max_anchors, (
        "every true center must sit beyond the naive anchor window"
    )

    det = detection_hypotheses(
        cfg, pos, valid, np.float32(MAX_ROBOT_RADIUS),
        blob_color=col, colors=packed_colors[:6],
    )
    det = {k: np.asarray(v) for k, v in det.items()}

    # map global blob index -> anchor row
    row_of = {int(g): r for r, g in enumerate(det["blob_idx"][:, 0])}
    oracle = oracle_detection(pos, valid, anchors)
    for a in anchors:
        o_score, o_hyp = oracle[a]
        assert o_score > 0.5, "oracle must find every planted robot"
        assert a in row_of, (
            f"true center blob {a} was not selected as an anchor"
        )
        r = row_of[a]
        d_score = float(det["score"][r])
        assert d_score == pytest.approx(o_score, rel=1e-4), (
            f"anchor {a}: capped score {d_score} vs oracle {o_score}"
        )
        o_orient, o_pos, o_sides = o_hyp
        assert float(det["orientation"][r]) == pytest.approx(o_orient, abs=1e-4)
        assert np.allclose(det["pos"][r], o_pos, atol=0.1)
        assert sorted(int(j) for j in det["blob_idx"][r][1:]) == sorted(o_sides)


def test_full_detect_at_production_caps_dense_scene():
    """End-to-end detect() at FULL production defaults (max_anchors=512
    binding, max_blobs=2000-scale scene): all planted robots must survive
    score filtering and clipping NMS (perfect recall), and every OTHER
    emitted bot must be a legitimate reference-semantics hypothesis — a
    blob constellation whose reference score5 matches the emitted score.
    (1560 random blobs genuinely contain pattern-shaped noise clusters;
    the reference's geometric-only detection scoring emits those too,
    reference src/main.cpp:143-241 — no color gate on the untracked path —
    so asserting zero false positives would be stricter than the
    reference, not parity with it.)"""
    import jax.numpy as jnp

    rng = np.random.default_rng(23)
    packed_colors, pos, col, valid, anchors, bot_truth = build_scene(
        rng, n_bots=8, n_spurious=1560
    )
    n = len(pos)
    cfg = DetectorConfig(max_blobs=n)
    assert cfg.max_anchors < n

    blobs = {
        "field_pos": jnp.asarray(pos),
        "color": jnp.asarray(col),
        "valid": jnp.asarray(valid),
    }
    tracked = {
        "id": jnp.full(cfg.max_tracked, -1, jnp.int32),
        "x": jnp.zeros(cfg.max_tracked), "y": jnp.zeros(cfg.max_tracked),
        "z": jnp.zeros(cfg.max_tracked), "w": jnp.zeros(cfg.max_tracked),
        "vx": jnp.zeros(cfg.max_tracked), "vy": jnp.zeros(cfg.max_tracked),
        "vw": jnp.zeros(cfg.max_tracked),
        "time_delta": jnp.zeros(cfg.max_tracked),
        "valid": jnp.zeros(cfg.max_tracked, bool),
    }
    params = {
        "max_bot_height": jnp.float32(150.0),
        "max_robot_radius": jnp.float32(MAX_ROBOT_RADIUS),
        "min_tracking_radius": jnp.float32(20.0),
        "max_bot_acceleration": jnp.float32(6500.0),
        "min_confidence": jnp.float32(0.2),
        "clipping_tolerance": jnp.float32(10.0),
        "ball_radius": jnp.float32(21.5),
    }
    cam = np.zeros(18, dtype=np.float32)
    cam[0] = 900.0
    cam[4] = 1.0
    out = detect(cfg, blobs, tracked, jnp.asarray(packed_colors[:6]), cam, params)
    kept = np.asarray(out["bot_valid"])
    kept_pos = np.asarray(out["bot_pos"])[kept]
    kept_score = np.asarray(out["bot_score"])[kept]
    kept_idx = np.asarray(out["bot_blob_idx"])[kept]
    assert len(kept_pos) >= len(bot_truth)
    # perfect recall: every planted robot present
    for _, center, _ in bot_truth:
        d = np.min(np.linalg.norm(kept_pos - center, axis=-1))
        assert d < 5.0, f"robot at {center} missing (nearest kept {d:.1f} mm)"
    # reference-parity precision: every emitted bot (incl. noise-cluster
    # false positives the reference would emit too) scores identically
    # under the reference's own hypothesis scoring
    for r in range(len(kept_pos)):
        pos5 = pos[kept_idx[r]]
        _, o_pos, o_score, _ = score5(pos5)
        assert kept_score[r] == pytest.approx(o_score, rel=1e-3), (
            f"kept bot {r}: score {kept_score[r]} vs reference {o_score}"
        )
        assert np.allclose(kept_pos[r], o_pos, atol=0.2)
        assert o_score > float(params["min_confidence"])


def oracle_tracked(blob_pos, blob_valid, blob_color, packed_colors,
                   pred_xy, pred_w, bot_id, search_radius):
    """Uncapped tracked search: full cross product of ALL in-radius
    candidates per pattern slot incl. the null option
    (reference src/main.cpp:101-133, hypothesis.cpp:230-271)."""
    c, s = math.cos(pred_w), math.sin(pred_w)
    rot = np.asarray(PATTERN_POS) @ np.array([[c, s], [-s, c]])
    slots = pred_xy + rot
    valid_idx = np.flatnonzero(blob_valid)
    cands = []
    for k in range(5):
        d2 = np.sum((blob_pos[valid_idx] - slots[k]) ** 2, axis=-1)
        cands.append([int(j) for j in valid_idx[d2 <= search_radius**2]] + [None])

    yellow, blue, green, pink = (packed_colors[i] for i in (2, 3, 4, 5))
    pat = int(PATTERNS[bot_id % 16])
    best_score, best = 0.0, None
    for choice in product(*cands):
        picked = [j for j in choice if j is not None]
        if len(picked) != len(set(picked)) or len(picked) < 2:
            continue
        valid5 = np.array([j is not None for j in choice])
        pos5 = np.stack([
            blob_pos[j] if j is not None else np.zeros(2) for j in choice
        ])
        veto = False
        for k, j in enumerate(choice):
            if j is None:
                continue
            if k == 0:
                exp = blue if bot_id >= 16 else yellow
                opp = yellow if bot_id >= 16 else blue
            else:
                g = (pat >> (4 - k)) & 1
                exp = green if g else pink
                opp = pink if g else green
            bc = blob_color[j]
            if np.sum((bc - opp) ** 2) - np.sum((bc - exp) ** 2) <= 0:
                veto = True
                break
        if veto:
            continue
        orientation, pos, offset_score, amount = score5(pos5, valid5)
        rot_off = math.remainder(orientation - pred_w, 2 * math.pi) / math.pi
        delta = (pos - pred_xy) / 10.0
        score = offset_score / (1.0 + float(delta @ delta) + rot_off * rot_off)
        score = score * amount / 5.0
        if score > best_score:
            best_score, best = score, (orientation, pos, choice)
    return best_score, best


def test_tracked_caps_match_uncapped_oracle():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    colors = ColorState()
    packed_colors = colors.packed().astype(np.float32)
    green, pink = packed_colors[4], packed_colors[5]
    yellow = packed_colors[2]

    bot_id = 9
    center = np.array([-1000.0, -800.0])
    w = 0.7
    c, s = math.cos(w), math.sin(w)
    rot = np.asarray(PATTERN_POS) @ np.array([[c, s], [-s, c]])
    pat = int(PATTERNS[bot_id])

    pos_list, col_list = [], []
    for slot in range(5):
        pos_list.append(center + rot[slot] + rng.normal(0, 1.5, 2))
        if slot == 0:
            col_list.append(yellow + rng.normal(0, 2, 3))
        else:
            col_list.append(
                (green if (pat >> (4 - slot)) & 1 else pink) + rng.normal(0, 2, 3)
            )
    # two spurious blobs NEARER to pattern slots than the true blobs
    for slot in (1, 3):
        pos_list.append(center + rot[slot] + rng.normal(0, 0.5, 2))
        col_list.append(rng.uniform(90, 170, 3))
    # scattered clutter inside the search radius
    for _ in range(6):
        pos_list.append(center + rng.uniform(-60, 60, 2))
        col_list.append(rng.uniform(90, 170, 3))

    pos = np.asarray(pos_list, dtype=np.float32)
    col = np.asarray(col_list, dtype=np.float32)
    n = len(pos)
    valid = np.ones(n, dtype=bool)

    cfg = DetectorConfig(max_blobs=n, max_tracked=4, tracked_candidates=3)
    T = cfg.max_tracked
    tracked = {
        "id": jnp.asarray([bot_id] + [-1] * (T - 1), jnp.int32),
        "x": jnp.asarray([center[0]] + [0.0] * (T - 1), jnp.float32),
        "y": jnp.asarray([center[1]] + [0.0] * (T - 1), jnp.float32),
        "z": jnp.full(T, 0.0, jnp.float32),
        "w": jnp.asarray([w] + [0.0] * (T - 1), jnp.float32),
        "vx": jnp.zeros(T), "vy": jnp.zeros(T), "vw": jnp.zeros(T),
        "time_delta": jnp.zeros(T),
        "valid": jnp.asarray([True] + [False] * (T - 1)),
    }
    # real camera straight above the tracked bot: reprojection round-trip
    # through z=150 keeps pred_xy at the bot position
    from vision_processor_tpu.models.camera import CameraModel

    cam = CameraModel(
        focal_length=900.0, principal_point=np.array([480.0, 270.0]),
        distortion_k2=0.0, pos=np.array([center[0], center[1], 4000.0]),
        size=np.array([960, 540]),
    ).packed()

    out = tracked_hypotheses(
        cfg, jnp.asarray(pos), jnp.asarray(col), jnp.asarray(valid),
        tracked, jnp.asarray(packed_colors[:6]), jnp.asarray(cam),
        jnp.float32(150.0), jnp.float32(40.0), jnp.float32(6500.0),
    )
    out = {k: np.asarray(v) for k, v in out.items()}

    # search radius matches the device computation: accel*dt^2 + min_radius
    o_score, o_best = oracle_tracked(
        pos, valid, col, packed_colors, center, w, bot_id, 40.0)
    assert o_score > 0.3
    assert float(out["score"][0]) == pytest.approx(o_score, rel=1e-3), (
        f"capped tracked score {float(out['score'][0])} vs oracle {o_score}"
    )
    assert float(out["orientation"][0]) == pytest.approx(o_best[0], abs=1e-3)
    assert np.allclose(out["pos"][0], o_best[1], atol=0.2)


def test_tracked_tier_semantically_equivalent():
    """Occupancy-adaptive tracked window (DetectorConfig.max_tracked_tier):
    (a) when every tracked robot fits the tier window the tiered search
    must match the untiered one on all slots (small path taken);
    (b) a single qualifying slot beyond the tier forces the full window
    (exact condition, not a prefix assumption — a ball entry (id -1)
    inside the window must not count as qualifying)."""
    import jax.numpy as jnp

    from vision_processor_tpu.models.camera import CameraModel

    rng = np.random.default_rng(17)
    colors = ColorState()
    packed_colors = colors.packed().astype(np.float32)

    # blobs: 6 real robots' constellations + clutter
    packed, pos, col, valid, anchors, bot_truth = build_scene(
        rng, n_bots=6, n_spurious=80)
    n = len(pos)
    cam = CameraModel(
        focal_length=900.0, principal_point=np.array([480.0, 270.0]),
        distortion_k2=0.0, pos=np.array([-2000.0, -1200.0, 4000.0]),
        size=np.array([960, 540]),
    ).packed()

    def tracked_for(ids_at):
        """Tracked dict with robot entries at the given slot indices
        (predicted at the true bot positions) and a ball (-1) at slot 2."""
        T = 32
        d = {
            "id": np.full(T, -1, np.int32),
            "x": np.zeros(T, np.float32), "y": np.zeros(T, np.float32),
            "z": np.full(T, 150.0, np.float32),
            "w": np.zeros(T, np.float32),
            "vx": np.zeros(T, np.float32), "vy": np.zeros(T, np.float32),
            "vw": np.zeros(T, np.float32),
            "time_delta": np.zeros(T, np.float32),
            "valid": np.zeros(T, bool),
        }
        for slot, b in zip(ids_at, range(len(bot_truth))):
            bid, center, w = bot_truth[b]
            d["id"][slot] = bid
            d["x"][slot], d["y"][slot] = center
            d["w"][slot] = w
            d["valid"][slot] = True
        d["valid"][2] = True  # ball entry: valid but id -1, never qualifies
        return {k: jnp.asarray(v) for k, v in d.items()}

    def run(cfg, tracked):
        out = tracked_hypotheses(
            cfg, jnp.asarray(pos), jnp.asarray(col), jnp.asarray(valid),
            tracked, jnp.asarray(packed_colors[:6]), jnp.asarray(cam),
            jnp.float32(150.0), jnp.float32(40.0), jnp.float32(6500.0),
        )
        return {k: np.asarray(v) for k, v in out.items()}

    cfg_tier = DetectorConfig(max_blobs=n, max_tracked=32,
                              max_tracked_tier=16)
    cfg_full = DetectorConfig(max_blobs=n, max_tracked=32,
                              max_tracked_tier=0)

    # (a) all robots inside the tier (slots 0,1,3,4,5,6 — ball at 2)
    trk = tracked_for([0, 1, 3, 4, 5, 6])
    a = run(cfg_tier, trk)
    b = run(cfg_full, trk)
    assert a["valid"].any(), "tracked search must match the planted bots"
    np.testing.assert_array_equal(a["valid"], b["valid"])
    np.testing.assert_array_equal(a["blob_idx"], b["blob_idx"])
    np.testing.assert_array_equal(a["tracked_id"], b["tracked_id"])
    np.testing.assert_allclose(a["score"], b["score"], atol=1e-5)
    np.testing.assert_allclose(a["pos"], b["pos"], atol=1e-2)
    np.testing.assert_allclose(a["orientation"], b["orientation"],
                               atol=1e-5)
    # padded tier slots are inert
    assert not a["valid"][16:].any()
    assert (a["score"][16:] == 0.0).all()

    # (b) one robot at slot 20 (beyond the tier): full window taken, all
    # six robots still found identically
    trk = tracked_for([0, 1, 3, 4, 5, 20])
    a = run(cfg_tier, trk)
    b = run(cfg_full, trk)
    assert a["valid"][20] and b["valid"][20], "slot-20 robot must be found"
    np.testing.assert_array_equal(a["valid"], b["valid"])
    np.testing.assert_array_equal(a["blob_idx"], b["blob_idx"])
    np.testing.assert_allclose(a["score"], b["score"], atol=1e-5)


def test_anchor_tier_semantically_equivalent_when_not_binding():
    """Occupancy-adaptive anchor tier (DetectorConfig.max_anchors_tier):
    when every valid blob fits the small window, the tiered search must
    produce the same hypotheses as the untiered full window on every
    VALID anchor slot (scores/positions within fp-reassociation
    tolerance — the smaller matmul tiles reassociate differently — and
    identical winning constellations), and padded slots must be inert
    (score 0, valid False). Sparse scene: all planted robots among the
    first 128 slots."""
    rng = np.random.default_rng(5)
    packed_colors, pos, col, valid, anchors, bot_truth = build_scene(
        rng, n_bots=6, n_spurious=60
    )
    n = len(pos)
    n_valid = int(np.sum(valid))
    pad_n = 600  # slot budget well beyond the tier
    pos_p = np.zeros((pad_n, 2), np.float32)
    pos_p[:n] = pos
    col_p = np.zeros((pad_n, 3), np.float32)
    col_p[:n] = col
    valid_p = np.zeros(pad_n, bool)
    valid_p[:n] = valid

    cfg_tier = DetectorConfig(max_blobs=pad_n, max_anchors=512,
                              max_anchors_tier=128)
    cfg_full = DetectorConfig(max_blobs=pad_n, max_anchors=512,
                              max_anchors_tier=0)
    assert n_valid <= cfg_tier.max_anchors_tier, "scene must fit the tier"

    dt = detection_hypotheses(
        cfg_tier, pos_p, valid_p, np.float32(MAX_ROBOT_RADIUS),
        blob_color=col_p, colors=packed_colors[:6],
    )
    df = detection_hypotheses(
        cfg_full, pos_p, valid_p, np.float32(MAX_ROBOT_RADIUS),
        blob_color=col_p, colors=packed_colors[:6],
    )
    dt = {k: np.asarray(v) for k, v in dt.items()}
    df = {k: np.asarray(v) for k, v in df.items()}

    assert dt["score"].shape == df["score"].shape == (512,)
    live = df["score"] > 0.0
    assert live.any() and not live[128:].any()
    np.testing.assert_allclose(dt["score"][live], df["score"][live],
                               rtol=1e-4)
    np.testing.assert_allclose(dt["pos"][live], df["pos"][live], atol=0.05)
    np.testing.assert_allclose(dt["orientation"][live],
                               df["orientation"][live], atol=1e-4)
    assert np.array_equal(dt["blob_idx"][live], df["blob_idx"][live])
    # padded tier slots are inert
    assert not dt["valid"][128:].any()
    assert (dt["score"][128:] == 0.0).all()
    # every planted robot found by both
    found = set(dt["blob_idx"][live][:, 0].tolist())
    assert set(anchors) <= found


def test_anchor_tier_boundary_occupancies():
    """The tier cond boundary: (a) a mid-occupancy scene (tier <
    n_valid <= max_anchors) must take the FULL window in both configs —
    outputs bit-identical, every planted robot found; (b) a scene with
    n_valid exactly == tier must take the small window and still match
    the untiered search on all valid slots."""
    rng = np.random.default_rng(11)
    pad_n = 600
    tier = 128

    def run(cfg, pos, col, valid, packed_colors):
        n = len(pos)
        pos_p = np.zeros((pad_n, 2), np.float32)
        pos_p[:n] = pos
        col_p = np.zeros((pad_n, 3), np.float32)
        col_p[:n] = col
        valid_p = np.zeros(pad_n, bool)
        valid_p[:n] = valid
        out = detection_hypotheses(
            cfg, pos_p, valid_p, np.float32(MAX_ROBOT_RADIUS),
            blob_color=col_p, colors=packed_colors[:6],
        )
        return {k: np.asarray(v) for k, v in out.items()}

    cfg_tier = DetectorConfig(max_blobs=pad_n, max_anchors=512,
                              max_anchors_tier=tier)
    cfg_full = DetectorConfig(max_blobs=pad_n, max_anchors=512,
                              max_anchors_tier=0)

    # (a) mid occupancy: 8 bots (40 pattern blobs) + 180 spurious = 220
    packed_colors, pos, col, valid, anchors, _ = build_scene(
        rng, n_bots=8, n_spurious=180
    )
    n_valid = int(np.sum(valid))
    assert tier < n_valid <= 512, "scene must straddle the tier"
    dt = run(cfg_tier, pos, col, valid, packed_colors)
    df = run(cfg_full, pos, col, valid, packed_colors)
    # both configs run the full window; the tiered program carries the
    # (untaken) small-window branch, which changes XLA fusion choices —
    # equality is to fp-reassociation tolerance, constellations identical
    assert np.array_equal(dt["blob_idx"], df["blob_idx"])
    assert np.array_equal(dt["valid"], df["valid"])
    np.testing.assert_allclose(dt["score"], df["score"], atol=2e-5)
    np.testing.assert_allclose(dt["pos"], df["pos"], atol=0.05)
    np.testing.assert_allclose(dt["orientation"], df["orientation"],
                               atol=1e-4)
    found = set(dt["blob_idx"][dt["score"] > 0.0][:, 0].tolist())
    assert set(anchors) <= found

    # (b) exactly at the tier: trim/grow the spurious count so
    # n_valid == tier (tier path taken, inclusive boundary)
    packed_colors, pos, col, valid, anchors, _ = build_scene(
        rng, n_bots=6, n_spurious=tier - 6 * 5
    )
    assert int(np.sum(valid)) == tier
    dt = run(cfg_tier, pos, col, valid, packed_colors)
    df = run(cfg_full, pos, col, valid, packed_colors)
    live = df["score"] > 0.0
    assert live.any() and not live[tier:].any()
    np.testing.assert_allclose(dt["score"][live], df["score"][live],
                               rtol=1e-4)
    np.testing.assert_allclose(dt["pos"][live], df["pos"][live], atol=0.05)
    assert np.array_equal(dt["blob_idx"][live], df["blob_idx"][live])
    found = set(dt["blob_idx"][live][:, 0].tolist())
    assert set(anchors) <= found
