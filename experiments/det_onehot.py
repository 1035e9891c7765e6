"""Detection hypothesis scoring via one-hot MXU contractions.

Replaces the (A, C, 4[, 2]) static-table gathers (side_pos/side_idx) and
the per-pair elementwise chain with small matmuls against static one-hot
matrices built from the combo table. Measured against the production
detection_hypotheses on bench blobs; exactness checked on the winner set.
"""
from __future__ import annotations

import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vision_processor_tpu.models import detector as D
from vision_processor_tpu.models.pattern import PATTERN_POS

A = 512
K = 8


def build_tables(k: int):
    combos = D.detection_combo_table(k)  # (C, 4) ring indices
    c = combos.shape[0]
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    angles = D._PAIR_ANGLE  # (10,)

    w_cos = np.zeros((c, 2 * 81), dtype=np.float32)
    w_sin = np.zeros((c, 2 * 81), dtype=np.float32)
    for ci in range(c):
        ring_of_slot = [0] + [int(combos[ci, s]) + 1 for s in range(4)]
        for p, (a, b) in enumerate(pairs):
            i, j = ring_of_slot[a], ring_of_slot[b]
            kk = i * 9 + j
            ca, sa = math.cos(angles[p]), math.sin(angles[p])
            # cos(theta - lam) = ux*ca + uy*sa; sin = uy*ca - ux*sa
            w_cos[ci, kk] += ca
            w_cos[ci, 81 + kk] += sa
            w_sin[ci, kk] += -sa
            w_sin[ci, 81 + kk] += ca

    count9 = np.zeros((c, 9), dtype=np.float32)  # sum over slots of ring9
    onehot_slot = np.zeros((4, c, 9), dtype=np.float32)
    for ci in range(c):
        count9[ci, 0] += 1.0
        for s in range(4):
            j = int(combos[ci, s]) + 1
            count9[ci, j] += 1.0
            onehot_slot[s, ci, j] = 1.0
    combo_max = combos.max(axis=-1)
    return combos, w_cos, w_sin, count9, onehot_slot, combo_max


def detection_onehot(cfg, blob_pos, blob_valid, max_robot_radius):
    k = cfg.ring_size
    a = min(cfg.max_anchors, blob_pos.shape[0])
    combos, w_cos, w_sin, count9, onehot_slot, combo_max = build_tables(k)
    w_cos = jnp.asarray(w_cos)
    w_sin = jnp.asarray(w_sin)
    count9_t = jnp.asarray(count9)
    onehot_t = jnp.asarray(onehot_slot)

    anchor_pos = blob_pos[:a]
    anchor_valid = blob_valid[:a]
    diff = blob_pos[None, :, :] - anchor_pos[:, None, :]
    dist2 = jnp.sum(diff * diff, axis=-1)
    in_radius = (
        (dist2 <= max_robot_radius * max_robot_radius)
        & blob_valid[None, :] & anchor_valid[:, None]
    )
    rank = jnp.arange(blob_pos.shape[0], dtype=jnp.float32)
    sel_score = jnp.where(in_radius, -rank[None, :], -jnp.inf)
    sel_val, sel_idx = D.iter_top_k(sel_score, k)
    sel_valid = sel_val > -jnp.inf
    sel_diff = jnp.take_along_axis(diff, sel_idx[..., None], axis=1)
    angle = jnp.arctan2(sel_diff[..., 1], sel_diff[..., 0])
    order = jnp.argsort(jnp.where(sel_valid, angle, jnp.inf), axis=-1)
    ring_idx = jnp.take_along_axis(sel_idx, order, axis=1)
    ring_valid = jnp.take_along_axis(sel_valid, order, axis=1)
    ring_count = jnp.sum(ring_valid, axis=-1)

    ring_pos = blob_pos[ring_idx]  # (A, K, 2)
    ring9 = jnp.concatenate([anchor_pos[:, None, :], ring_pos], axis=1)

    # ordered pair units at ring level: (A, 9, 9, 2) -> (A, 81)
    d9 = ring9[:, None, :, :] - ring9[:, :, None, :]
    r2 = jnp.sum(d9 * d9, axis=-1)
    inv = jnp.where(r2 > 0.0, jax.lax.rsqrt(r2), 0.0)
    ux = (d9[..., 0] * inv).reshape(a, 81)
    uy = (d9[..., 1] * inv).reshape(a, 81)
    u2 = jnp.concatenate([ux, uy], axis=-1)  # (A, 162)

    hi = jax.lax.Precision.HIGHEST
    o_cos = jax.lax.dot_general(
        u2, w_cos.T, (((1,), (0,)), ((), ())), precision=hi)  # (A, C)
    o_sin = jax.lax.dot_general(
        u2, w_sin.T, (((1,), (0,)), ((), ())), precision=hi)

    norm2 = o_cos * o_cos + o_sin * o_sin
    ok_n = norm2 > 0.0
    inv_n = jnp.where(ok_n, jax.lax.rsqrt(jnp.maximum(norm2, 1e-30)), 0.0)
    cc = jnp.where(ok_n, o_cos * inv_n, 1.0)
    ss = o_sin * inv_n

    # position: mean of (pos5_s - rotated_s)
    sum_x = jax.lax.dot_general(
        ring9[..., 0], count9_t.T, (((1,), (0,)), ((), ())), precision=hi)
    sum_y = jax.lax.dot_general(
        ring9[..., 1], count9_t.T, (((1,), (0,)), ((), ())), precision=hi)
    pat = np.asarray(PATTERN_POS)
    pbar = pat.sum(axis=0)  # (2,)
    rot_px = cc * pbar[0] - ss * pbar[1]
    rot_py = ss * pbar[0] + cc * pbar[1]
    pos_x = (sum_x - rot_px) / 5.0
    pos_y = (sum_y - rot_py) / 5.0

    # slot offsets -> min slot score
    slot_scores = []
    for s in range(5):
        if s == 0:
            p5x = anchor_pos[:, 0:1]
            p5y = anchor_pos[:, 1:2]
        else:
            oh = onehot_t[s - 1].T  # (9, C)
            p5x = jax.lax.dot_general(
                ring9[..., 0], oh, (((1,), (0,)), ((), ())), precision=hi)
            p5y = jax.lax.dot_general(
                ring9[..., 1], oh, (((1,), (0,)), ((), ())), precision=hi)
        rx = cc * pat[s, 0] - ss * pat[s, 1]
        ry = ss * pat[s, 0] + cc * pat[s, 1]
        dx = (p5x - (pos_x + rx)) / 10.0
        dy = (p5y - (pos_y + ry)) / 10.0
        slot_scores.append(1.0 / (1.0 + dx * dx + dy * dy))
    offset_score = jnp.minimum(
        jnp.minimum(jnp.minimum(slot_scores[0], slot_scores[1]),
                    jnp.minimum(slot_scores[2], slot_scores[3])),
        slot_scores[4],
    )

    combo_ok = (
        (jnp.asarray(combo_max)[None, :] < ring_count[:, None])
        & (ring_count[:, None] >= 4) & anchor_valid[:, None]
    )
    score = jnp.where(combo_ok, offset_score, 0.0)

    best = jnp.argmax(score, axis=-1)
    take = lambda arr: jnp.take_along_axis(arr, best[:, None], axis=1)[:, 0]
    best_score = take(score)
    best_orient = jnp.arctan2(take(ss), take(cc))
    best_pos = jnp.stack([take(pos_x), take(pos_y)], axis=-1)
    best_combo = jnp.asarray(combos)[best]  # (A, 4) ring slots
    best_sides = jnp.take_along_axis(ring_idx, best_combo, axis=1)
    anchor_ids = jnp.arange(a, dtype=jnp.int32)
    blob_idx5 = jnp.concatenate(
        [anchor_ids[:, None], best_sides.astype(jnp.int32)], axis=-1)
    return {
        "score": best_score,
        "orientation": best_orient,
        "pos": best_pos,
        "blob_idx": blob_idx5,
        "valid": best_score > 0.0,
    }


def timeit(fn, args, tag, n_lo=8, n_hi=40, reps=4):
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

    best = []
    fns = {n: make(n) for n in (n_lo, n_hi)}
    for n in (n_lo, n_hi):
        out = fns[n](*args); jax.block_until_ready(out)
    for _ in range(reps):
        times = {}
        for n in (n_lo, n_hi):
            t0 = time.perf_counter()
            out = fns[n](*args); jax.block_until_ready(out)
            times[n] = time.perf_counter() - t0
        best.append((times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1e3)
    ms = min(best)
    print(f"{tag:52s} {ms:8.3f} ms   ({', '.join(f'{b:.3f}' for b in best)})")
    return ms


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    n = 2000
    cfg = D.DetectorConfig(max_blobs=n)
    # clustered blobs: 16 bot-like constellations + scatter
    pts = []
    for i in range(16):
        cx, cy = rng.uniform(-4000, 0, 2)
        pts.append([cx, cy])
        for ang in np.linspace(0, 2 * np.pi, 4, endpoint=False):
            r = rng.uniform(50, 70)
            pts.append([cx + r * np.cos(ang), cy + r * np.sin(ang)])
    while len(pts) < 300:
        pts.append(rng.uniform(-4500, 0, 2))
    blob_pos = np.zeros((n, 2), np.float32)
    blob_pos[:300] = np.asarray(pts, dtype=np.float32)[:300]
    blob_pos[300:] = 1e6
    blob_valid = np.arange(n) < 300
    bp = jnp.asarray(blob_pos)
    bv = jnp.asarray(blob_valid)

    ref = jax.jit(lambda p, v: D.detection_hypotheses(cfg, p, v, 90.0))(bp, bv)
    new = jax.jit(lambda p, v: detection_onehot(cfg, p, v, 90.0))(bp, bv)
    rv = np.asarray(ref["valid"])
    nv = np.asarray(new["valid"])
    same_valid = np.array_equal(rv, nv)
    same_idx = np.array_equal(
        np.asarray(ref["blob_idx"])[rv], np.asarray(new["blob_idx"])[nv]
    ) if same_valid else False
    ds = np.max(np.abs(np.asarray(ref["score"]) - np.asarray(new["score"])))
    print(f"valid equal: {same_valid}  winner blobs equal: {same_idx}  "
          f"max score diff: {ds:.2e}")

    timeit(lambda p: D.detection_hypotheses(cfg, p, bv, 90.0)["score"],
           (bp,), "detection_hypotheses (current)")
    timeit(lambda p: detection_onehot(cfg, p, bv, 90.0)["score"],
           (bp,), "detection via one-hot MXU")


if __name__ == "__main__":
    main()
