"""Per-stage profile of the full pipeline on the real TPU.

Times cumulative prefixes of the per-camera graph plus the detector, at
both max_blobs=256 (old bench) and 2000 (reference default).
"""
from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import build_rig
from vision_processor_tpu.models.detector import (
    DetectorConfig, detect, estimate_bot_ids)
from vision_processor_tpu.ops import blob as B
from vision_processor_tpu.ops import frame as F
from vision_processor_tpu.ops.pipeline import blob_machine
from vision_processor_tpu.parallel import multicam as M


def timeit(fn, args, tag, n_lo=4, n_hi=16):
    def make(n):
        def scan_fn(raw0, *rest):
            def body(carry, _):
                out = fn(carry, *rest)
                leaves = jax.tree.leaves(out)
                bump = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
                nxt = jnp.roll(carry, 2, axis=0)  # new frame each iter
                return nxt, bump
            return jax.lax.scan(body, raw0, None, length=n)
        return jax.jit(scan_fn)

    times = {}
    for n in (n_lo, n_hi):
        f = make(n)
        out = f(*args); jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(*args); jax.block_until_ready(out)
        times[n] = time.perf_counter() - t0
    ms = (times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1e3
    print(f"{tag:46s} {ms:8.3f} ms")
    return ms


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)  # force eager

    for max_blobs in (256, 2000):
        cfg, raws, packed, scales, offsets, colors, params = build_rig(
            max_blobs=max_blobs)[:7]
        bm = cfg.bm
        det_cfg = cfg.det
        raw = jnp.asarray(raws[0])
        cam = jnp.asarray(packed[0])
        fs = jnp.float32(scales[0])
        fo = jnp.asarray(offsets[0])
        col = jnp.asarray(colors[0])
        print(f"--- max_blobs={max_blobs} (flat {bm.flat_shape}) ---")

        def stage_resample(raw):
            pp = F.raw2planes_packed(raw, bm.fmt)
            return F.resample_flat_packed(
                pp, cam, params["max_bot_height"], fs, fo,
                bm.flat_shape, bm.fmt)

        grid0 = bm.make_resample_grid(np.asarray(cam), 150.0,
                                      field_scale=fs, field_offset=fo)

        def stage_resample_grid(raw, grid=grid0):
            pp = F.raw2planes_packed(raw, bm.fmt)
            return F.resample_flat_grid(pp, grid, bm.fmt)

        def stage_grad(raw):
            return B.gradient_dot(stage_resample(raw), bm.grad_offset)

        def stage_sat_circ(raw):
            return B.circularity(B.summed_area_table(stage_grad(raw)),
                                 bm.sat_radius)

        def stage_blobs(raw):
            flat = stage_resample(raw)
            grad = B.gradient_dot(flat, bm.grad_offset)
            circ = B.circularity(B.summed_area_table(grad), bm.sat_radius)
            return B.extract_blobs(flat, circ, params["min_circularity"],
                                   jnp.float32(0.0), radius=bm.disc_radius,
                                   max_blobs=bm.max_blobs)

        def stage_full(raw):
            blobs = blob_machine(bm, raw, cam, params["max_bot_height"],
                                 params["min_circularity"], fs, fo)
            tracked = M.tracked_from_summaries(
                det_cfg, M.empty_summary(cfg), params["tracked_time_delta"])
            d = detect(det_cfg, blobs, tracked, col[:6], cam, params)
            return d

        timeit(stage_resample, (raw,), "resample (incl. stack build)")
        timeit(stage_resample_grid, (raw,), "resample via cached grid")
        timeit(stage_grad, (raw,), "+ gradient_dot")
        timeit(stage_sat_circ, (raw,), "+ SAT + circularity")
        timeit(stage_blobs, (raw,), "+ extract_blobs (disc stats, top_k)")
        timeit(stage_full, (raw,), "+ detector (hyp search, NMS)")
        if max_blobs == 256:
            # detection-only on fixed blobs
            blobs0 = jax.jit(stage_blobs)(raw)
            blobs0 = {**blobs0}
            blobs0["field_pos"] = blobs0["pos"] * fs + fo

            def det_only(pos, blobs0=blobs0):
                b = {**blobs0, "field_pos": pos}
                tracked = M.tracked_from_summaries(
                    det_cfg, M.empty_summary(cfg),
                    params["tracked_time_delta"])
                return detect(det_cfg, b, tracked, col[:6], cam, params)
            timeit(det_only, (blobs0["field_pos"],), "detector only")


if __name__ == "__main__":
    main()
