"""Round-3 detector sub-stage profile (current one-hot + query-select path).

Cumulative stages replicate models/detector.py detection_hypotheses /
tracked_hypotheses / detect at production shapes (A=512, k=2000, ring 8,
T=32, M=3) with realistic validity (~600 live blobs).

Run: python experiments/det_stage3.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vision_processor_tpu.models import detector as D
from vision_processor_tpu.ops.topk import query_select_topk


def timeit(fn, args, tag, n_lo=8, n_hi=40, reps=3):
    def make(n):
        def scan_fn(x0, *rest):
            def body(carry, _):
                out = fn(carry, *rest)
                bump = sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree.leaves(out))
                return carry + bump * 1e-20, bump
            return jax.lax.scan(body, x0, None, length=n)
        return jax.jit(scan_fn)

    fns = {n: make(n) for n in (n_lo, n_hi)}
    for n in (n_lo, n_hi):
        jax.block_until_ready(fns[n](*args))
    best = []
    for _ in range(reps):
        t = {}
        for n in (n_lo, n_hi):
            t0 = time.perf_counter()
            jax.block_until_ready(fns[n](*args))
            t[n] = time.perf_counter() - t0
        best.append((t[n_hi] - t[n_lo]) / (n_hi - n_lo) * 1e3)
    ms = min(best)
    print(f"{tag:52s} {ms:8.3f} ms   (runs: {', '.join(f'{b:.3f}' for b in best)})")
    return ms


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    k = 2000
    cfg = D.DetectorConfig(max_blobs=k)
    a, kk = cfg.max_anchors, cfg.ring_size
    blob_pos = jnp.asarray(rng.uniform(-4500, 0, (k, 2)).astype(np.float32))
    blob_color = jnp.asarray(rng.uniform(0, 255, (k, 3)).astype(np.float32))
    blob_valid = jnp.asarray(np.arange(k) < 600)
    colors = jnp.asarray(rng.uniform(0, 255, (6, 3)).astype(np.float32))
    packed_cam = jnp.asarray(np.concatenate([
        [800.0], [480.0, 270.0], [0.05],
        np.eye(3).reshape(-1), [0.0, 0.0, -3000.0], [960.0, 540.0],
    ]).astype(np.float32))
    t = cfg.max_tracked
    tracked = {
        "id": jnp.asarray((np.arange(t) % 32).astype(np.int32)),
        "x": jnp.asarray(rng.uniform(-4000, 0, t).astype(np.float32)),
        "y": jnp.asarray(rng.uniform(-2500, 0, t).astype(np.float32)),
        "z": jnp.full(t, 143.0, jnp.float32),
        "w": jnp.zeros(t, jnp.float32),
        "vx": jnp.zeros(t, jnp.float32),
        "vy": jnp.zeros(t, jnp.float32),
        "vw": jnp.zeros(t, jnp.float32),
        "time_delta": jnp.full(t, 0.01, jnp.float32),
        "valid": jnp.asarray(np.arange(t) < 16),
    }
    params = {
        "max_robot_radius": jnp.float32(90.0),
        "max_bot_height": jnp.float32(150.0),
        "min_tracking_radius": jnp.float32(30.0),
        "max_bot_acceleration": jnp.float32(6500.0),
        "min_confidence": jnp.float32(0.2),
        "clipping_tolerance": jnp.float32(10.0),
        "ball_radius": jnp.float32(21.5),
    }

    def s_anchor(p):
        yellow, blue = colors[2], colors[3]
        d_team = jnp.minimum(
            jnp.sum((blob_color - yellow) ** 2, axis=-1),
            jnp.sum((blob_color - blue) ** 2, axis=-1))
        other = jnp.min(jnp.stack([
            jnp.sum((blob_color - colors[i]) ** 2, axis=-1)
            for i in (0, 1, 4, 5)]), axis=0)
        a_rank = jnp.where(blob_valid, d_team - other, jnp.inf)
        anchor_idx = jnp.argsort(a_rank)[:a].astype(jnp.int32)
        return p[anchor_idx], anchor_idx

    def s_ring(p):
        anchor_pos, anchor_idx = s_anchor(p)
        green, pink = colors[4], colors[5]
        d_side = jnp.minimum(
            jnp.sum((blob_color - green) ** 2, axis=-1),
            jnp.sum((blob_color - pink) ** 2, axis=-1))
        rank = d_side + jnp.arange(k, dtype=jnp.float32) * 1e-6
        sel_val, sel_idx = query_select_topk(
            anchor_pos,
            jnp.broadcast_to(params["max_robot_radius"] ** 2, (a,)),
            p, jnp.where(blob_valid, rank, jnp.inf), m=kk, by_rank=True)
        return anchor_pos, sel_val, sel_idx

    def s_sorted(p):
        anchor_pos, sel_val, sel_idx = s_ring(p)
        sel_valid = sel_val > -jnp.inf
        sel_diff = p[sel_idx] - anchor_pos[:, None, :]
        angle = jnp.arctan2(sel_diff[..., 1], sel_diff[..., 0])
        order = jnp.argsort(jnp.where(sel_valid, angle, jnp.inf), axis=-1)
        ring_idx = jnp.take_along_axis(sel_idx, order, axis=1)
        return anchor_pos, ring_idx

    def s_det(p):
        return D.detection_hypotheses(
            cfg, p, blob_valid, params["max_robot_radius"],
            blob_color=blob_color, colors=colors)["score"]

    def s_trk(p):
        return D.tracked_hypotheses(
            cfg, p, blob_color, blob_valid, tracked, colors, packed_cam,
            params["max_bot_height"], params["min_tracking_radius"],
            params["max_bot_acceleration"])["score"]

    def s_full(p):
        blobs = {"field_pos": p, "valid": blob_valid, "color": blob_color}
        return D.detect(cfg, blobs, tracked, colors, packed_cam, params)

    timeit(s_anchor, (blob_pos,), "anchor rank + argsort(2000)")
    timeit(s_ring, (blob_pos,), "+ ring query select (A=512, m=8)")
    timeit(s_sorted, (blob_pos,), "+ angle sort")
    timeit(s_det, (blob_pos,), "detection_hypotheses total")
    timeit(s_trk, (blob_pos,), "tracked_hypotheses total")
    timeit(s_full, (blob_pos,), "detect() total (merge+NMS+ballclip)")


if __name__ == "__main__":
    main()
