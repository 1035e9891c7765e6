"""Sub-stage profile of the detector (hypothesis search) on the real TPU."""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vision_processor_tpu.models import detector as D


def timeit(fn, args, tag, n_lo=4, n_hi=16):
    def make(n):
        def scan_fn(x0, *rest):
            def body(carry, _):
                out = fn(carry, *rest)
                leaves = jax.tree.leaves(out)
                bump = sum(jnp.sum(jnp.asarray(l).astype(jnp.float32))
                           for l in leaves)
                nxt = carry + bump * 1e-20
                return nxt, bump
            return jax.lax.scan(body, x0, None, length=n)
        return jax.jit(scan_fn)

    times = {}
    for n in (n_lo, n_hi):
        f = make(n)
        out = f(*args); jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(*args); jax.block_until_ready(out)
        times[n] = time.perf_counter() - t0
    ms = (times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1e3
    print(f"{tag:52s} {ms:8.3f} ms")
    return ms


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    k = 2000
    cfg = D.DetectorConfig(max_blobs=k)
    blob_pos = jnp.asarray(rng.uniform(-4500, 0, (k, 2)).astype(np.float32))
    blob_color = jnp.asarray(rng.uniform(0, 255, (k, 3)).astype(np.float32))
    blob_valid = jnp.asarray(np.arange(k) < 600)
    colors = jnp.asarray(
        rng.uniform(0, 255, (6, 3)).astype(np.float32))
    packed_cam = jnp.asarray(
        np.concatenate([
            [800.0], [480.0, 270.0], [0.05],
            np.eye(3).reshape(-1), [0.0, 0.0, -3000.0], [960.0, 540.0],
        ]).astype(np.float32))
    t = cfg.max_tracked
    tracked = {
        "id": jnp.asarray((np.arange(t) % 32).astype(np.int32)),
        "x": jnp.asarray(rng.uniform(-4000, 0, t).astype(np.float32)),
        "y": jnp.asarray(rng.uniform(-2500, 0, t).astype(np.float32)),
        "z": jnp.zeros(t, jnp.float32),
        "w": jnp.zeros(t, jnp.float32),
        "vx": jnp.zeros(t, jnp.float32),
        "vy": jnp.zeros(t, jnp.float32),
        "vw": jnp.zeros(t, jnp.float32),
        "time_delta": jnp.full(t, 0.01, jnp.float32),
        "valid": jnp.asarray(np.arange(t) < 16),
    }

    # ---- detection sub-stages --------------------------------------------
    a = cfg.max_anchors
    kk = cfg.ring_size

    def stage_ring(p):
        anchor_pos = p[:a]
        diff = p[None, :, :] - anchor_pos[:, None, :]
        dist2 = jnp.sum(diff * diff, axis=-1)
        in_radius = (dist2 <= 90.0 ** 2) & blob_valid[None, :]
        rank = jnp.arange(p.shape[0], dtype=jnp.float32)
        sel_score = jnp.where(in_radius, -rank[None, :], -jnp.inf)
        _, sel_idx = jax.lax.top_k(sel_score, kk)
        return sel_idx

    def stage_sorted(p):
        anchor_pos = p[:a]
        diff = p[None, :, :] - anchor_pos[:, None, :]
        dist2 = jnp.sum(diff * diff, axis=-1)
        in_radius = (dist2 <= 90.0 ** 2) & blob_valid[None, :]
        rank = jnp.arange(p.shape[0], dtype=jnp.float32)
        sel_score = jnp.where(in_radius, -rank[None, :], -jnp.inf)
        _, sel_idx = jax.lax.top_k(sel_score, kk)
        sel_valid = jnp.take_along_axis(in_radius, sel_idx, axis=1)
        sel_diff = jnp.take_along_axis(diff, sel_idx[..., None], axis=1)
        angle = jnp.arctan2(sel_diff[..., 1], sel_diff[..., 0])
        order = jnp.argsort(jnp.where(sel_valid, angle, jnp.inf), axis=-1)
        ring_idx = jnp.take_along_axis(sel_idx, order, axis=1)
        return ring_idx

    def stage_expand(p):
        ring_idx = stage_sorted(p)
        combos = jnp.asarray(D.detection_combo_table(kk))
        ring_pos = p[ring_idx]
        side_pos = ring_pos[:, combos]
        return side_pos

    def stage_score(p):
        ring_idx = stage_sorted(p)
        combos = jnp.asarray(D.detection_combo_table(kk))
        ring_pos = p[ring_idx]
        side_pos = ring_pos[:, combos]
        center = jnp.broadcast_to(
            p[:a][:, None, None, :], side_pos[..., :1, :].shape)
        pos5 = jnp.concatenate([center, side_pos], axis=-2)
        valid5 = jnp.ones(pos5.shape[:-1], dtype=bool)
        return D.score_hypotheses(pos5, valid5)[3]

    timeit(stage_ring, (blob_pos,), "det: dist2 + top_k ring select")
    timeit(stage_sorted, (blob_pos,), "det: + angle sort")
    timeit(stage_expand, (blob_pos,), "det: + combo expansion (gathers)")
    timeit(stage_score, (blob_pos,), "det: + score_hypotheses")
    timeit(lambda p: D.detection_hypotheses(cfg, p, blob_valid, 90.0,
                                            blob_color, colors)["score"],
           (blob_pos,), "det: full detection_hypotheses")

    # ---- tracked sub-stages ----------------------------------------------
    def trk_full(p):
        return D.tracked_hypotheses(
            cfg, p, blob_color, blob_valid, tracked, colors, packed_cam,
            jnp.float32(150.0), jnp.float32(30.0), jnp.float32(6500.0),
        )["score"]

    def trk_cand(p):
        m = cfg.tracked_candidates
        slot_pos = jnp.zeros((t, 5, 2), jnp.float32) + p[:t, None, :]
        d2 = jnp.sum(
            (p[None, None, :, :] - slot_pos[:, :, None, :]) ** 2, axis=-1)
        cand_ok = (d2 <= 90.0 ** 2) & blob_valid[None, None, :]
        cand_score = jnp.where(cand_ok, -d2, -jnp.inf)
        _, cand_idx = jax.lax.top_k(cand_score, m)
        return cand_idx

    timeit(trk_cand, (blob_pos,), "trk: candidate d2 + top_k")
    timeit(trk_full, (blob_pos,), "trk: full tracked_hypotheses")

    # ---- merge + NMS -------------------------------------------------------
    def full(p):
        blobs = {"field_pos": p, "valid": blob_valid, "color": blob_color}
        params = {
            "max_robot_radius": jnp.float32(90.0),
            "max_bot_height": jnp.float32(150.0),
            "min_tracking_radius": jnp.float32(30.0),
            "max_bot_acceleration": jnp.float32(6500.0),
            "min_confidence": jnp.float32(0.1),
            "clipping_tolerance": jnp.float32(10.0),
            "ball_radius": jnp.float32(21.5),
        }
        return D.detect(cfg, blobs, tracked, colors, packed_cam, params)[
            "bot_score"]

    timeit(full, (blob_pos,), "full detect (incl. NMS + ball clip)")


if __name__ == "__main__":
    main()
