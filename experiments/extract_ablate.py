"""Ablate extract_blobs' sub-stages on the TPU (production shapes).

Copies ops/blob.extract_blobs with switches that drop one sub-stage at a
time; the cost of a stage is the full-pipeline delta, measured on the
warp+fused-circ production front end so XLA fusion context matches.

Run: python experiments/extract_ablate.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import build_rig
from vision_processor_tpu.ops import blob as B
from vision_processor_tpu.ops import warp as W
from vision_processor_tpu.ops.blob_pallas import circularity_fused


def timeit(fn, args, tag, n_lo=8, n_hi=40, reps=3):
    def make(n):
        def scan_fn(x0, *rest):
            def body(carry, _):
                out = fn(carry, *rest)
                bump = sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree.leaves(out))
                return jnp.roll(carry, 1, axis=0), bump
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
    print(f"{tag:46s} {ms:7.3f} ms (runs {', '.join(f'{b:.3f}' for b in best)})")
    return ms


def extract_ablated(flat, circ, circ_threshold, radius, max_blobs,
                    *, row_stage=True, disc=True, order=True, subpix=True):
    h, w = circ.shape
    valid = (circ >= circ_threshold) & B.local_max_mask(circ)
    count = jnp.sum(valid, dtype=jnp.int32)
    masked = jnp.where(valid, circ, -jnp.inf)
    if row_stage:
        m = min(w, max(16, -(-4 * max_blobs // h)))
        row_scores, row_idx = jax.lax.top_k(masked, m)
        cand_idx = (row_idx + (jnp.arange(h) * w)[:, None]).reshape(-1)
        top_circ, ci = jax.lax.top_k(row_scores.reshape(-1), max_blobs)
        idx = cand_idx[ci]
    else:
        # single-stage global top_k over the full map (the round-2
        # before state, for reference)
        top_circ, idx = jax.lax.top_k(masked.reshape(-1), max_blobs)
    slot_valid = top_circ > -jnp.inf
    iy = idx // w
    ix = idx % w

    if disc:
        s1, s2, n = B.disc_stats_at(flat, iy, ix, radius)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        stddev_sum = jnp.sum(jnp.sqrt(var), axis=-1)
    else:
        mean = jnp.zeros((max_blobs, 3), jnp.float32)
        stddev_sum = jnp.ones((max_blobs,), jnp.float32)
    c0 = jnp.where(slot_valid, top_circ, 0.0)
    score = c0 / jnp.maximum(stddev_sum, 1e-12)

    def gather2d(img, yy, xx):
        return img.reshape(-1, *img.shape[2:])[yy * w + xx]

    if subpix == "one":
        flatc = circ.reshape(-1)
        nidx = jnp.stack([
            iy * w + jnp.maximum(ix - 1, 0),
            iy * w + jnp.minimum(ix + 1, w - 1),
            jnp.maximum(iy - 1, 0) * w + ix,
            jnp.minimum(iy + 1, h - 1) * w + ix,
        ], axis=-1)  # (K, 4)
        nv = flatc[nidx.reshape(-1)].reshape(-1, 4)
        px = ix.astype(jnp.float32) + B.subpixel_peak(nv[:, 0], c0, nv[:, 1])
        py = iy.astype(jnp.float32) + B.subpixel_peak(nv[:, 2], c0, nv[:, 3])
    elif subpix:
        cnx = gather2d(circ, iy, jnp.maximum(ix - 1, 0))
        cpx = gather2d(circ, iy, jnp.minimum(ix + 1, w - 1))
        cny = gather2d(circ, jnp.maximum(iy - 1, 0), ix)
        cpy = gather2d(circ, jnp.minimum(iy + 1, h - 1), ix)
        px = ix.astype(jnp.float32) + B.subpixel_peak(cnx, c0, cpx)
        py = iy.astype(jnp.float32) + B.subpixel_peak(cny, c0, cpy)
    else:
        px = ix.astype(jnp.float32)
        py = iy.astype(jnp.float32)

    if order:
        sort_score, o_ = jax.lax.top_k(
            jnp.where(slot_valid, score, -jnp.inf), max_blobs)
        slot_valid = sort_score > -jnp.inf
        return {
            "pos": jnp.stack([px, py], -1)[o_],
            "color": mean[o_],
            "center": gather2d(flat, iy, ix)[o_],
            "circ": c0[o_],
            "score": jnp.where(slot_valid, sort_score, 0.0),
            "valid": slot_valid,
            "count": count,
        }
    return {
        "pos": jnp.stack([px, py], -1),
        "color": mean,
        "center": gather2d(flat, iy, ix),
        "circ": c0,
        "score": score,
        "valid": slot_valid,
        "count": count,
    }


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    cfg, raws, packed, scales, offsets, colors, params = build_rig(
        max_blobs=2000, resampling_factor=1.25)[:7]
    bm = cfg.bm
    raw = jnp.asarray(raws[0])
    grid = bm.make_resample_grid(np.asarray(packed[0]), 150.0,
                                 field_scale=jnp.float32(scales[0]),
                                 field_offset=jnp.asarray(offsets[0]))

    def front(raw):
        flat = W.resample_flat_warp(raw, grid, bm.fmt, bm.flat_shape,
                                    bm.plane_shape)
        return flat, circularity_fused(flat, bm.grad_offset, bm.sat_radius)

    def run(raw, **kw):
        flat, circ = front(raw)
        return extract_ablated(flat, circ, params["min_circularity"],
                               bm.disc_radius, bm.max_blobs, **kw)

    timeit(lambda r: front(r), (raw,), "front (warp + fused circ)")
    base = timeit(lambda r: run(r), (raw,), "full extract")
    timeit(lambda r: run(r, order=False), (raw,), "- final score ordering")
    timeit(lambda r: run(r, disc=False), (raw,), "- disc stats gathers")
    timeit(lambda r: run(r, subpix=False), (raw,), "- subpixel neighbor gathers")
    timeit(lambda r: run(r, subpix="one"), (raw,), "subpixel via ONE merged gather")
    timeit(lambda r: run(r, subpix=False, disc=False), (raw,), "- subpix - disc")
    timeit(lambda r: run(r, row_stage=False), (raw,), "single-stage 333k top_k (ref)")


if __name__ == "__main__":
    main()
