"""Dense-scene (worst-case-load) stage decomposition of the production step.

VERDICT r4 item 1: the dense frame-set (~1430 real blobs/camera, anchor
cap binding) misses the 5 ms device budget (5.416 ms at factor 1.25).
This profile measures WHERE the extra ~1.2 ms over the sparse scene goes,
per camera, on the same cumulative-stage ladder as prod_stage_profile.py
plus detector sub-stages (ranked-anchor argsort, ring selection, combo
scoring, tracked search), so the optimization (or the floor proof) is
data-driven.

Run: python experiments/dense_profile.py [factor]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import build_rig
from vision_processor_tpu.models import detector as D
from vision_processor_tpu.models.detector import DetectorConfig, detect
from vision_processor_tpu.ops import blob as B
from vision_processor_tpu.parallel import multicam as M

FACTOR = float(sys.argv[1]) if len(sys.argv) > 1 else 1.25


def timeit(fn, args, tag, n_lo=8, n_hi=40, reps=3):
    def make(n):
        def scan_fn(raw0, *rest):
            def body(carry, _):
                out = fn(carry, *rest)
                leaves = jax.tree.leaves(out)
                bump = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
                nxt = jnp.roll(carry, 2, axis=0)
                return nxt, bump
            return jax.lax.scan(body, raw0, None, length=n)
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
    print(f"{tag:56s} {ms:8.3f} ms   "
          f"(runs: {', '.join(f'{b:.3f}' for b in best)})", flush=True)
    return ms


def blob_precursor(cfg, params, grid):
    """raw -> blobs dict (the full blob machine, score-first chain)."""
    bm = cfg.bm

    def fn(raw):
        from vision_processor_tpu.ops.blob_pallas import blob_response_fused

        if "pos1" in grid:
            from vision_processor_tpu.ops import warp as W

            flat = W.resample_flat_warp(raw, grid, bm.fmt, bm.flat_shape,
                                        bm.plane_shape)
        else:
            from vision_processor_tpu.ops import frame as F

            flat = F.resample_flat_grid_raw(raw, grid, bm.fmt)
        ms_, circ, mean, count = blob_response_fused(
            flat, params["min_circularity"], bm.grad_offset, bm.sat_radius,
            bm.disc_radius)
        return B.extract_blobs_scored(flat, circ, ms_, mean, count,
                                      max_blobs=bm.max_blobs)
    return fn


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)

    for dense in (False, True):
        rig = build_rig(max_blobs=2000, dense=dense, dense_blobs=1900,
                        resampling_factor=FACTOR)
        cfg, raws, packed, scales, offsets, colors, params = rig[:7]
        bm, det_cfg = cfg.bm, cfg.det
        raw = jnp.asarray(raws[0])
        cam = jnp.asarray(packed[0])
        fs = jnp.float32(scales[0])
        fo = jnp.asarray(offsets[0])
        col = jnp.asarray(colors[0])[:6]
        grid = bm.make_resample_grid(np.asarray(packed[0]), 150.0,
                                     field_scale=fs, field_offset=fo)
        pre = blob_precursor(cfg, params, grid)
        tracked = M.tracked_from_summaries(
            det_cfg, M.empty_summary(cfg), params["tracked_time_delta"])

        blobs0 = jax.jit(pre)(raw)
        n_valid = int(np.asarray(blobs0["valid"]).sum())
        print(f"\n=== {'DENSE' if dense else 'sparse'} factor={FACTOR} "
              f"valid_blobs={n_valid} ===", flush=True)

        def with_fieldpos(blobs):
            return {**blobs, "field_pos": blobs["pos"] * fs + fo}

        def s_blobs(raw):
            return pre(raw)

        def s_det(raw):
            return detect(det_cfg, with_fieldpos(pre(raw)), tracked, col,
                          cam, params)

        # detector sub-stages on the dense blob tensor
        def s_det_hyp(raw):
            blobs = with_fieldpos(pre(raw))
            return D.detection_hypotheses(
                det_cfg, blobs["field_pos"], blobs["valid"],
                params["max_robot_radius"], blob_color=blobs["color"],
                colors=col)

        def s_det_ring_only(raw):
            """Anchor ranking + ring selection, no combo scoring."""
            blobs = with_fieldpos(pre(raw))
            blob_pos = blobs["field_pos"]
            blob_valid = blobs["valid"]
            blob_color = blobs["color"]
            k_all = blob_pos.shape[0]
            a = min(det_cfg.max_anchors, k_all)
            green, pink = col[4], col[5]
            d_side = jnp.minimum(
                jnp.sum((blob_color - green) ** 2, axis=-1),
                jnp.sum((blob_color - pink) ** 2, axis=-1))
            rank = d_side + jnp.arange(k_all, dtype=jnp.float32) * 1e-6
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
            from vision_processor_tpu.ops.topk import query_select_topk

            sel_val, sel_idx = query_select_topk(
                anchor_pos,
                jnp.broadcast_to(
                    params["max_robot_radius"] * params["max_robot_radius"],
                    (a,)),
                blob_pos, jnp.where(blob_valid, rank, jnp.inf),
                m=det_cfg.ring_size, by_rank=True)
            return sel_val, sel_idx, anchor_idx

        def s_det_tracked(raw):
            blobs = with_fieldpos(pre(raw))
            return D.tracked_hypotheses(
                det_cfg, blobs["field_pos"], blobs["color"], blobs["valid"],
                tracked, col, cam, params["max_bot_height"],
                params["min_tracking_radius"],
                params["max_bot_acceleration"])

        base = timeit(s_blobs, (raw,), "blob machine (resample..extraction)")
        timeit(s_det_ring_only, (raw,), "+ anchor rank + ring select only")
        timeit(s_det_hyp, (raw,), "+ detection_hypotheses (full)")
        timeit(s_det_tracked, (raw,), "+ tracked_hypotheses only")
        timeit(s_det, (raw,), "+ full detect (merge+topk, no NMS batch)")


if __name__ == "__main__":
    main()
