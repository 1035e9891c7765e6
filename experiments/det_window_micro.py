"""Micro-profile of _window_hypotheses internals on the DENSE blob tensor.

Isolates the full-ranked-window (A=512) detector cost into: ranked-anchor
argsort, Pallas ring select, ring gather + angle sort + pair unit vectors,
one-hot MXU contractions, and the (A, C) elementwise score chain — to find
where the dense scene's +0.3 ms/camera actually goes (VERDICT r5 task 1).

Run on TPU: python experiments/det_window_micro.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import build_rig
from vision_processor_tpu.models import detector as D
from vision_processor_tpu.parallel import multicam as M


def timeit(fn, args, tag, n_lo=10, n_hi=50, reps=3):
    """Scan-differenced timing over a (pos, color, valid) blob tensor; the
    carry perturbs positions non-affinely (roll) so nothing folds."""
    def make(n):
        def scan_fn(pos0, col0, val0):
            def body(carry, _):
                pos, col = carry
                out = fn(pos, col, val0)
                leaves = jax.tree.leaves(out)
                bump = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
                return (jnp.roll(pos, 1, axis=0) + 1e-4,
                        jnp.roll(col, 1, axis=0)), bump
            return jax.lax.scan(body, (pos0, col0), None, length=n)
        return jax.jit(scan_fn)

    fns = {n: make(n) for n in (n_lo, n_hi)}
    for n in (n_lo, n_hi):
        out = fns[n](*args); jax.block_until_ready(out)
    best = []
    for _ in range(reps):
        times = {}
        for n in (n_lo, n_hi):
            t0 = time.perf_counter()
            out = fns[n](*args); jax.block_until_ready(out)
            times[n] = time.perf_counter() - t0
        best.append((times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1e3)
    ms = min(best)
    print(f"{tag:52s} {ms:8.3f} ms   "
          f"(runs: {', '.join(f'{b:.3f}' for b in best)})", flush=True)
    return ms


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)

    rig = build_rig(max_blobs=2000, dense=True, dense_blobs=1900,
                    resampling_factor=1.25)
    cfg, raws, packed, scales, offsets, colors, params = rig[:7]
    det_cfg = cfg.det
    bm = cfg.bm
    raw = jnp.asarray(raws[0])
    fs = jnp.float32(scales[0])
    fo = jnp.asarray(offsets[0])
    col = jnp.asarray(colors[0])[:6]
    cam = jnp.asarray(packed[0])
    grid = bm.make_resample_grid(np.asarray(packed[0]), 150.0,
                                 field_scale=fs, field_offset=fo)

    from vision_processor_tpu.ops.blob_pallas import blob_response_fused
    from vision_processor_tpu.ops import blob as B
    from vision_processor_tpu.ops import warp as W

    def pre(raw):
        flat = W.resample_flat_warp(raw, grid, bm.fmt, bm.flat_shape,
                                    bm.plane_shape)
        ms_, circ, mean, count = blob_response_fused(
            flat, params["min_circularity"], bm.grad_offset, bm.sat_radius,
            bm.disc_radius)
        return B.extract_blobs_scored(flat, circ, ms_, mean, count,
                                      max_blobs=bm.max_blobs)

    blobs = jax.device_get(jax.jit(pre)(raw))
    pos = jnp.asarray(blobs["pos"] * np.asarray(fs) + np.asarray(fo))
    colr = jnp.asarray(blobs["color"])
    val = jnp.asarray(blobs["valid"])
    print(f"dense blobs valid={int(np.asarray(val).sum())}", flush=True)

    a = det_cfg.max_anchors
    k = det_cfg.ring_size
    mrr = params["max_robot_radius"]

    def ranked(blob_pos, blob_color, blob_valid):
        yellow, blue = col[2], col[3]
        d_team = jnp.minimum(
            jnp.sum((blob_color - yellow) ** 2, axis=-1),
            jnp.sum((blob_color - blue) ** 2, axis=-1))
        other_idx = [i for i in range(col.shape[0]) if i not in (2, 3)]
        d_other = jnp.min(jnp.stack([
            jnp.sum((blob_color - col[i]) ** 2, axis=-1)
            for i in other_idx]), axis=0)
        a_rank = jnp.where(blob_valid, d_team - d_other, jnp.inf)
        return jnp.argsort(a_rank)[:a].astype(jnp.int32)

    def rank_only(blob_pos, blob_color, blob_valid):
        return ranked(blob_pos, blob_color, blob_valid)

    def ring_only(blob_pos, blob_color, blob_valid):
        anchor_idx = ranked(blob_pos, blob_color, blob_valid)
        anchor_pos = blob_pos[anchor_idx]
        green, pink = col[4], col[5]
        d_side = jnp.minimum(
            jnp.sum((blob_color - green) ** 2, axis=-1),
            jnp.sum((blob_color - pink) ** 2, axis=-1))
        rank = d_side + jnp.arange(pos.shape[0], dtype=jnp.float32) * 1e-6
        from vision_processor_tpu.ops.topk import query_select_topk

        return query_select_topk(
            anchor_pos, jnp.broadcast_to(mrr * mrr, (a,)), blob_pos,
            jnp.where(blob_valid, rank, jnp.inf), m=k, by_rank=True)

    def ring_sorted(blob_pos, blob_color, blob_valid):
        sel_val, sel_idx = ring_only(blob_pos, blob_color, blob_valid)
        anchor_idx = ranked(blob_pos, blob_color, blob_valid)
        anchor_pos = blob_pos[anchor_idx]
        sel_valid = sel_val > -jnp.inf
        sel_diff = blob_pos[sel_idx] - anchor_pos[:, None, :]
        angle = jnp.arctan2(sel_diff[..., 1], sel_diff[..., 0])
        order = jnp.argsort(jnp.where(sel_valid, angle, jnp.inf), axis=-1)
        ring_idx = jnp.take_along_axis(sel_idx, order, axis=1)
        ring_valid = jnp.take_along_axis(sel_valid, order, axis=1)
        ring_pos = blob_pos[ring_idx]
        ring9 = jnp.concatenate([anchor_pos[:, None, :], ring_pos], axis=1)
        d9 = ring9[:, None, :, :] - ring9[:, :, None, :]
        r2 = jnp.sum(d9 * d9, axis=-1)
        inv = jnp.where(r2 > 0.0, jax.lax.rsqrt(r2), 0.0)
        n9 = k + 1
        u2 = jnp.concatenate(
            [(d9[..., 0] * inv).reshape(a, n9 * n9),
             (d9[..., 1] * inv).reshape(a, n9 * n9)], axis=-1)
        return u2, ring9, ring_valid

    def full_hyp(blob_pos, blob_color, blob_valid):
        return D.detection_hypotheses(det_cfg, blob_pos, blob_valid, mrr,
                                      blob_color=blob_color, colors=col)

    args = (pos, colr, val)
    timeit(rank_only, args, "ranked-anchor argsort alone")
    timeit(ring_only, args, "+ Pallas ring select (512 q x 2000)")
    timeit(ring_sorted, args, "+ angle sort + ring gather + u2 pairs")
    timeit(full_hyp, args, "full detection_hypotheses (combos incl.)")


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def main2():
    """Split the combo stage: matmuls only vs full chain vs max-d2 reform."""
    _ = np.asarray(jnp.ones((8, 128)) * 2)

    rig = build_rig(max_blobs=2000, dense=True, dense_blobs=1900,
                    resampling_factor=1.25)
    cfg, raws, packed, scales, offsets, colors, params = rig[:7]
    det_cfg = cfg.det
    bm = cfg.bm
    raw = jnp.asarray(raws[0])
    fs = jnp.float32(scales[0])
    fo = jnp.asarray(offsets[0])
    col = jnp.asarray(colors[0])[:6]
    grid = bm.make_resample_grid(np.asarray(packed[0]), 150.0,
                                 field_scale=fs, field_offset=fo)

    from vision_processor_tpu.ops.blob_pallas import blob_response_fused
    from vision_processor_tpu.ops import blob as B
    from vision_processor_tpu.ops import warp as W

    def pre(raw):
        flat = W.resample_flat_warp(raw, grid, bm.fmt, bm.flat_shape,
                                    bm.plane_shape)
        ms_, circ, mean, count = blob_response_fused(
            flat, params["min_circularity"], bm.grad_offset, bm.sat_radius,
            bm.disc_radius)
        return B.extract_blobs_scored(flat, circ, ms_, mean, count,
                                      max_blobs=bm.max_blobs)

    blobs = jax.device_get(jax.jit(pre)(raw))
    pos = jnp.asarray(blobs["pos"] * np.asarray(fs) + np.asarray(fo))
    colr = jnp.asarray(blobs["color"])
    val = jnp.asarray(blobs["valid"])

    a = det_cfg.max_anchors
    k = det_cfg.ring_size
    mrr = params["max_robot_radius"]

    from vision_processor_tpu.models.detector import (
        _detection_onehot_tables, PATTERN_POS)

    def common(blob_pos, blob_color, blob_valid):
        yellow, blue = col[2], col[3]
        d_team = jnp.minimum(
            jnp.sum((blob_color - yellow) ** 2, axis=-1),
            jnp.sum((blob_color - blue) ** 2, axis=-1))
        other_idx = [i for i in range(col.shape[0]) if i not in (2, 3)]
        d_other = jnp.min(jnp.stack([
            jnp.sum((blob_color - col[i]) ** 2, axis=-1)
            for i in other_idx]), axis=0)
        a_rank = jnp.where(blob_valid, d_team - d_other, jnp.inf)
        anchor_idx = jnp.argsort(a_rank)[:a].astype(jnp.int32)
        anchor_pos = blob_pos[anchor_idx]
        green, pink = col[4], col[5]
        d_side = jnp.minimum(
            jnp.sum((blob_color - green) ** 2, axis=-1),
            jnp.sum((blob_color - pink) ** 2, axis=-1))
        rank = d_side + jnp.arange(pos.shape[0], dtype=jnp.float32) * 1e-6
        from vision_processor_tpu.ops.topk import query_select_topk

        sel_val, sel_idx = query_select_topk(
            anchor_pos, jnp.broadcast_to(mrr * mrr, (a,)), blob_pos,
            jnp.where(blob_valid, rank, jnp.inf), m=k, by_rank=True)
        sel_valid = (sel_val > -jnp.inf)
        sel_diff = blob_pos[sel_idx] - anchor_pos[:, None, :]
        angle = jnp.arctan2(sel_diff[..., 1], sel_diff[..., 0])
        order = jnp.argsort(jnp.where(sel_valid, angle, jnp.inf), axis=-1)
        ring_idx = jnp.take_along_axis(sel_idx, order, axis=1)
        ring_valid = jnp.take_along_axis(sel_valid, order, axis=1)
        ring_count = jnp.sum(ring_valid, axis=-1)
        ring_pos = blob_pos[ring_idx]
        ring9 = jnp.concatenate([anchor_pos[:, None, :], ring_pos], axis=1)
        n9 = k + 1
        d9 = ring9[:, None, :, :] - ring9[:, :, None, :]
        r2 = jnp.sum(d9 * d9, axis=-1)
        inv = jnp.where(r2 > 0.0, jax.lax.rsqrt(r2), 0.0)
        u2 = jnp.concatenate(
            [(d9[..., 0] * inv).reshape(a, n9 * n9),
             (d9[..., 1] * inv).reshape(a, n9 * n9)], axis=-1)
        return u2, ring9, ring_count, anchor_pos

    combos_np, w_cos, w_sin, count9, onehot_slot, combo_max = (
        _detection_onehot_tables(k))
    hi = jax.lax.Precision.HIGHEST

    def matmuls_only(blob_pos, blob_color, blob_valid):
        u2, ring9, ring_count, anchor_pos = common(
            blob_pos, blob_color, blob_valid)
        dot = lambda x, w: jax.lax.dot_general(
            x, jnp.asarray(w), (((1,), (0,)), ((), ())), precision=hi)
        o_cos = dot(u2, w_cos)
        o_sin = dot(u2, w_sin)
        sum_x = dot(ring9[..., 0], count9)
        sum_y = dot(ring9[..., 1], count9)
        outs = [o_cos, o_sin, sum_x, sum_y]
        for s5 in range(1, 5):
            outs.append(dot(ring9[..., 0], onehot_slot[s5 - 1].T))
            outs.append(dot(ring9[..., 1], onehot_slot[s5 - 1].T))
        return sum(jnp.sum(o) for o in outs)

    def full_hyp(blob_pos, blob_color, blob_valid):
        return D.detection_hypotheses(det_cfg, blob_pos, blob_valid, mrr,
                                      blob_color=blob_color, colors=col)

    args = (pos, colr, val)
    timeit(lambda *a_: common(*a_), args, "common (rank+ring+u2)")
    timeit(matmuls_only, args, "+ 12 one-hot matmuls (no chain)")
    timeit(full_hyp, args, "full detection_hypotheses")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "2":
    main2()


def main3():
    """max-d2 restructured chain vs current, pure XLA (both full hyp)."""
    _ = np.asarray(jnp.ones((8, 128)) * 2)

    rig = build_rig(max_blobs=2000, dense=True, dense_blobs=1900,
                    resampling_factor=1.25)
    cfg, raws, packed, scales, offsets, colors, params = rig[:7]
    det_cfg = cfg.det
    bm = cfg.bm
    raw = jnp.asarray(raws[0])
    fs = jnp.float32(scales[0])
    fo = jnp.asarray(offsets[0])
    col = jnp.asarray(colors[0])[:6]
    grid = bm.make_resample_grid(np.asarray(packed[0]), 150.0,
                                 field_scale=fs, field_offset=fo)

    from vision_processor_tpu.ops.blob_pallas import blob_response_fused
    from vision_processor_tpu.ops import blob as B
    from vision_processor_tpu.ops import warp as W
    from vision_processor_tpu.models.detector import (
        _detection_onehot_tables, PATTERN_POS)

    def pre(raw):
        flat = W.resample_flat_warp(raw, grid, bm.fmt, bm.flat_shape,
                                    bm.plane_shape)
        ms_, circ, mean, count = blob_response_fused(
            flat, params["min_circularity"], bm.grad_offset, bm.sat_radius,
            bm.disc_radius)
        return B.extract_blobs_scored(flat, circ, ms_, mean, count,
                                      max_blobs=bm.max_blobs)

    blobs = jax.device_get(jax.jit(pre)(raw))
    pos = jnp.asarray(blobs["pos"] * np.asarray(fs) + np.asarray(fo))
    colr = jnp.asarray(blobs["color"])
    val = jnp.asarray(blobs["valid"])

    a = det_cfg.max_anchors
    k = det_cfg.ring_size
    mrr = params["max_robot_radius"]
    combos_np, w_cos, w_sin, count9, onehot_slot, combo_max = (
        _detection_onehot_tables(k))
    hi = jax.lax.Precision.HIGHEST
    pat = np.asarray(PATTERN_POS, dtype=np.float32)
    pbar = pat.sum(axis=0)

    def common(blob_pos, blob_color, blob_valid):
        yellow, blue = col[2], col[3]
        d_team = jnp.minimum(
            jnp.sum((blob_color - yellow) ** 2, axis=-1),
            jnp.sum((blob_color - blue) ** 2, axis=-1))
        other_idx = [i for i in range(col.shape[0]) if i not in (2, 3)]
        d_other = jnp.min(jnp.stack([
            jnp.sum((blob_color - col[i]) ** 2, axis=-1)
            for i in other_idx]), axis=0)
        a_rank = jnp.where(blob_valid, d_team - d_other, jnp.inf)
        anchor_idx = jnp.argsort(a_rank)[:a].astype(jnp.int32)
        anchor_pos = blob_pos[anchor_idx]
        green, pink = col[4], col[5]
        d_side = jnp.minimum(
            jnp.sum((blob_color - green) ** 2, axis=-1),
            jnp.sum((blob_color - pink) ** 2, axis=-1))
        rank = d_side + jnp.arange(pos.shape[0], dtype=jnp.float32) * 1e-6
        from vision_processor_tpu.ops.topk import query_select_topk

        sel_val, sel_idx = query_select_topk(
            anchor_pos, jnp.broadcast_to(mrr * mrr, (a,)), blob_pos,
            jnp.where(blob_valid, rank, jnp.inf), m=k, by_rank=True)
        sel_valid = (sel_val > -jnp.inf)
        sel_diff = blob_pos[sel_idx] - anchor_pos[:, None, :]
        angle = jnp.arctan2(sel_diff[..., 1], sel_diff[..., 0])
        order = jnp.argsort(jnp.where(sel_valid, angle, jnp.inf), axis=-1)
        ring_idx = jnp.take_along_axis(sel_idx, order, axis=1)
        ring_valid = jnp.take_along_axis(sel_valid, order, axis=1)
        ring_count = jnp.sum(ring_valid, axis=-1)
        ring_pos = blob_pos[ring_idx]
        ring9 = jnp.concatenate([anchor_pos[:, None, :], ring_pos], axis=1)
        n9 = k + 1
        d9 = ring9[:, None, :, :] - ring9[:, :, None, :]
        r2 = jnp.sum(d9 * d9, axis=-1)
        inv = jnp.where(r2 > 0.0, jax.lax.rsqrt(r2), 0.0)
        u2 = jnp.concatenate(
            [(d9[..., 0] * inv).reshape(a, n9 * n9),
             (d9[..., 1] * inv).reshape(a, n9 * n9)], axis=-1)
        return u2, ring9, ring_count, anchor_pos, ring_idx

    def maxd2_hyp(blob_pos, blob_color, blob_valid):
        u2, ring9, ring_count, anchor_pos, ring_idx = common(
            blob_pos, blob_color, blob_valid)
        dot = lambda x, w: jax.lax.dot_general(
            x, jnp.asarray(w), (((1,), (0,)), ((), ())), precision=hi)
        o_cos = dot(u2, w_cos)
        o_sin = dot(u2, w_sin)
        norm2 = o_cos * o_cos + o_sin * o_sin
        ok_n = norm2 > 0.0
        inv_n = jnp.where(ok_n, jax.lax.rsqrt(jnp.maximum(norm2, 1e-30)), 0.0)
        cc = jnp.where(ok_n, o_cos * inv_n, 1.0)
        ss = o_sin * inv_n
        sum_x = dot(ring9[..., 0], count9)
        sum_y = dot(ring9[..., 1], count9)
        pos_x = (sum_x - (cc * pbar[0] - ss * pbar[1])) / 5.0
        pos_y = (sum_y - (ss * pbar[0] + cc * pbar[1])) / 5.0
        maxd2 = None
        for s5 in range(5):
            if s5 == 0:
                p5x = anchor_pos[:, 0:1]
                p5y = anchor_pos[:, 1:2]
            else:
                p5x = dot(ring9[..., 0], onehot_slot[s5 - 1].T)
                p5y = dot(ring9[..., 1], onehot_slot[s5 - 1].T)
            dx = (p5x - (pos_x + (cc * pat[s5, 0] - ss * pat[s5, 1]))) / 10.0
            dy = (p5y - (pos_y + (ss * pat[s5, 0] + cc * pat[s5, 1]))) / 10.0
            d2 = dx * dx + dy * dy
            maxd2 = d2 if maxd2 is None else jnp.maximum(maxd2, d2)
        offset_score = 1.0 / (1.0 + maxd2)
        combo_ok = jnp.asarray(combo_max)[None, :] < ring_count[:, None]
        combo_ok &= (ring_count[:, None] >= 4)
        score = jnp.where(combo_ok, offset_score, 0.0)
        best = jnp.argmax(score, axis=-1)
        take = lambda arr: jnp.take_along_axis(arr, best[:, None], axis=1)[:, 0]
        return take(score), take(cc), take(ss), take(pos_x), take(pos_y)

    def full_hyp(blob_pos, blob_color, blob_valid):
        return D.detection_hypotheses(det_cfg, blob_pos, blob_valid, mrr,
                                      blob_color=blob_color, colors=col)

    args = (pos, colr, val)
    timeit(full_hyp, args, "current chain (min of slot scores)")
    timeit(maxd2_hyp, args, "max-d2 chain (single reciprocal)")


if len(sys.argv) > 1 and sys.argv[1] == "3":
    main3()
