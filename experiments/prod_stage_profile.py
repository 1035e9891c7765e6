"""Tight cumulative per-stage profile of the production (grid-cached) step."""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import build_rig
from vision_processor_tpu.models.detector import detect
from vision_processor_tpu.ops import blob as B
from vision_processor_tpu.ops import frame as F
from vision_processor_tpu.parallel import multicam as M


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
    print(f"{tag:52s} {ms:8.3f} ms   (runs: {', '.join(f'{b:.3f}' for b in best)})")
    return ms


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)

    cfg, raws, packed, scales, offsets, colors, params = build_rig(
        max_blobs=2000, resampling_factor=float(__import__('os').environ.get('PROF_FACTOR', '1.0')))[:7]
    bm = cfg.bm
    det_cfg = cfg.det
    raw = jnp.asarray(raws[0])
    cam = jnp.asarray(packed[0])
    fs = jnp.float32(scales[0])
    fo = jnp.asarray(offsets[0])
    col = jnp.asarray(colors[0])
    grid = bm.make_resample_grid(np.asarray(packed[0]), 150.0,
                                 field_scale=fs, field_offset=fo)
    print(f"--- grid-cached production stages, max_blobs={bm.max_blobs}, "
          f"resample_mode={bm.resample_mode} ---")

    def s_resample(raw):
        if "pos1" in grid:
            from vision_processor_tpu.ops import warp as W

            return W.resample_flat_warp(raw, grid, bm.fmt, bm.flat_shape,
                                        bm.plane_shape)
        return F.resample_flat_grid_raw(raw, grid, bm.fmt)

    def s_response(raw):
        from vision_processor_tpu.ops.blob_pallas import blob_response_fused

        flat = s_resample(raw)
        return blob_response_fused(flat, params["min_circularity"],
                                   bm.grad_offset, bm.sat_radius,
                                   bm.disc_radius)

    def s_extract_scored(raw):
        from vision_processor_tpu.ops.blob_pallas import blob_response_fused

        flat = s_resample(raw)
        ms, circ, mean, count = blob_response_fused(
            flat, params["min_circularity"], bm.grad_offset, bm.sat_radius,
            bm.disc_radius)
        return B.extract_blobs_scored(flat, circ, ms, mean, count,
                                      max_blobs=bm.max_blobs)

    def s_full_scored(raw):
        blobs = s_extract_scored(raw)
        blobs = {**blobs, "field_pos": blobs["pos"] * fs + fo}
        tracked = M.tracked_from_summaries(
            det_cfg, M.empty_summary(cfg), params["tracked_time_delta"])
        return detect(det_cfg, blobs, tracked, col[:6], cam, params)

    def s_grad(raw):
        return B.gradient_dot(s_resample(raw), bm.grad_offset)

    def s_sat(raw):
        return B.summed_area_table(s_grad(raw))

    def s_circ(raw):
        return B.circularity(s_sat(raw), bm.sat_radius)

    def s_blobs(raw):
        flat = s_resample(raw)
        grad = B.gradient_dot(flat, bm.grad_offset)
        circ = B.circularity(B.summed_area_table(grad), bm.sat_radius)
        return B.extract_blobs(flat, circ, params["min_circularity"],
                               jnp.float32(0.0), radius=bm.disc_radius,
                               max_blobs=bm.max_blobs)

    def s_full(raw):
        blobs = s_blobs(raw)
        blobs = {**blobs, "field_pos": blobs["pos"] * fs + fo}
        tracked = M.tracked_from_summaries(
            det_cfg, M.empty_summary(cfg), params["tracked_time_delta"])
        return detect(det_cfg, blobs, tracked, col[:6], cam, params)

    timeit(s_resample, (raw,), "resample (cached grid)")
    timeit(s_response, (raw,), "+ fused blob response (score-first)")
    timeit(s_extract_scored, (raw,), "+ scored extraction")
    timeit(s_full_scored, (raw,), "+ detector (score-first chain)")
    timeit(s_blobs, (raw,), "[old] extract_blobs chain")
    timeit(s_full, (raw,), "[old] + detector")


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def main_extract():
    """Sub-stages inside extract_blobs (grid-cached pipeline context)."""
    _ = np.asarray(jnp.ones((8, 128)) * 2)

    cfg, raws, packed, scales, offsets, colors, params = build_rig(
        max_blobs=2000, resampling_factor=float(__import__('os').environ.get('PROF_FACTOR', '1.0')))[:7]
    bm = cfg.bm
    raw = jnp.asarray(raws[0])
    fs = jnp.float32(scales[0])
    fo = jnp.asarray(offsets[0])
    grid = bm.make_resample_grid(np.asarray(packed[0]), 150.0,
                                 field_scale=fs, field_offset=fo)
    print(f"--- extract_blobs sub-stages, max_blobs={bm.max_blobs}, "
          f"disc_radius={bm.disc_radius} ---")

    def s_circ(raw):
        if "pos1" in grid:
            from vision_processor_tpu.ops import warp as W

            flat = W.resample_flat_warp(raw, grid, bm.fmt, bm.flat_shape,
                                        bm.plane_shape)
        else:
            flat = F.resample_flat_grid_raw(raw, grid, bm.fmt)
        grad = B.gradient_dot(flat, bm.grad_offset)
        return flat, B.circularity(B.summed_area_table(grad), bm.sat_radius)

    def s_mask(raw):
        # production order: threshold + local-max on circ only
        flat, circ = s_circ(raw)
        valid = (circ >= params["min_circularity"]) & B.local_max_mask(circ)
        return jnp.where(valid, circ, -jnp.inf), flat

    def s_rowtopk(raw):
        masked, flat = s_mask(raw)
        m = min(masked.shape[1], max(16, -(-4 * bm.max_blobs // masked.shape[0])))
        return jax.lax.top_k(masked, m)

    def s_fulltopk(raw):
        masked, flat = s_mask(raw)
        h, w = masked.shape
        m = min(w, max(16, -(-4 * bm.max_blobs // h)))
        row_scores, row_idx = jax.lax.top_k(masked, m)
        cand_idx = (row_idx + (jnp.arange(h) * w)[:, None]).reshape(-1)
        top_scores, ci = jax.lax.top_k(row_scores.reshape(-1), bm.max_blobs)
        return top_scores, cand_idx[ci]

    def s_discat(raw):
        masked, flat = s_mask(raw)
        h, w = masked.shape
        m = min(w, max(16, -(-4 * bm.max_blobs // h)))
        row_scores, row_idx = jax.lax.top_k(masked, m)
        cand_idx = (row_idx + (jnp.arange(h) * w)[:, None]).reshape(-1)
        top_scores, ci = jax.lax.top_k(row_scores.reshape(-1), bm.max_blobs)
        idx = cand_idx[ci]
        iy = idx // w
        ix = idx % w
        return B.disc_stats_at(flat, iy, ix, bm.disc_radius)[:2]

    def s_extract(raw):
        flat, circ = s_circ(raw)
        return B.extract_blobs(flat, circ, params["min_circularity"],
                               jnp.float32(0.0), radius=bm.disc_radius,
                               max_blobs=bm.max_blobs)

    timeit(s_circ, (raw,), "to circularity")
    timeit(s_mask, (raw,), "+ threshold/local-max mask")
    timeit(s_rowtopk, (raw,), "+ row top_k")
    timeit(s_fulltopk, (raw,), "+ global top_k")
    timeit(s_discat, (raw,), "+ disc_stats_at (candidate gathers)")
    timeit(s_extract, (raw,), "+ score/order/slot gathers (full extract)")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "extract":
    main_extract()


def main_barrier():
    """Does materializing flat/circ with optimization_barrier stop XLA from
    duplicating the resample chain into every consumer?"""
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    cfg, raws, packed, scales, offsets, colors, params = build_rig(
        max_blobs=2000, resampling_factor=float(__import__('os').environ.get('PROF_FACTOR', '1.0')))[:7]
    bm = cfg.bm
    det_cfg = cfg.det
    raw = jnp.asarray(raws[0])
    cam = jnp.asarray(packed[0])
    fs = jnp.float32(scales[0])
    fo = jnp.asarray(offsets[0])
    col = jnp.asarray(colors[0])
    grid = bm.make_resample_grid(np.asarray(packed[0]), 150.0,
                                 field_scale=fs, field_offset=fo)

    def s_full(raw, barrier):
        flat = F.resample_flat_grid_raw(raw, grid, bm.fmt)
        if barrier:
            flat = jax.lax.optimization_barrier(flat)
        grad = B.gradient_dot(flat, bm.grad_offset)
        circ = B.circularity(B.summed_area_table(grad), bm.sat_radius)
        if barrier:
            circ = jax.lax.optimization_barrier(circ)
        blobs = B.extract_blobs(flat, circ, params["min_circularity"],
                                jnp.float32(0.0), radius=bm.disc_radius,
                                max_blobs=bm.max_blobs)
        blobs = {**blobs, "field_pos": blobs["pos"] * fs + fo}
        tracked = M.tracked_from_summaries(
            det_cfg, M.empty_summary(cfg), params["tracked_time_delta"])
        return detect(det_cfg, blobs, tracked, col[:6], cam, params)

    timeit(lambda r: s_full(r, False), (raw,), "full step, no barriers")
    timeit(lambda r: s_full(r, True), (raw,), "full step, flat+circ barriers")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "barrier":
    main_barrier()
