"""Micro-profile of extract_blobs_scored's selection sub-steps on TPU.

The score-first extraction costs ~0.55 ms/camera at factor 1.0
(experiments/prod_stage_profile.py). Its work is: row top-k (m=16 over
the 540x962 masked score map), a global top_k(8640 -> 2000) with index
payload, ~5 small gathers, and the count reduction. This isolates each.

Run: python experiments/extract_scored_micro.py

Measured (TPU v5e via relay): row lax.top_k m=16 0.183 ms, row iterative
argmax 0.106 ms, global top_k/sort/packed variants all at the noise
floor (<0.03 ms), extract_blobs_scored full 0.272 ms. The isolated row
win does NOT compose: swapping iter_top_k into extract_blobs_scored
leaves the sustained 4-camera frame-set neutral-to-worse (4.80-4.83 vs
4.72-4.79 ms at factor 1.25; 5.54 vs 5.48 at 1.0) — XLA hides the row
sort under neighbouring stages. Reverted; kept here as the measured
dead end.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


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
    print(f"{tag:52s} {ms:7.3f} ms (runs {', '.join(f'{b:.3f}' for b in best)})")
    return ms


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    h, w, k = 540, 962, 2000
    m = 16
    rng = np.random.default_rng(0)
    score = np.full((h, w), -np.inf, np.float32)
    # ~1400 survivors like the dense rig
    ys = rng.integers(0, h, 1400)
    xs = rng.integers(0, w, 1400)
    score[ys, xs] = rng.random(1400).astype(np.float32) * 10
    masked = jnp.asarray(score)

    # 0. baseline: count only
    timeit(lambda s: (jnp.sum(s > -jnp.inf, dtype=jnp.int32),),
           (masked,), "count reduction only")

    # 1. row top_k (sort-lowered)
    timeit(lambda s: jax.lax.top_k(s, m), (masked,), "row lax.top_k m=16")

    # 1b. row top_k via iterative argmax
    def row_iter_topk(s):
        vals, idxs = [], []
        cur = s
        for _ in range(m):
            i = jnp.argmax(cur, axis=-1)
            v = jnp.take_along_axis(cur, i[:, None], axis=-1)[:, 0]
            vals.append(v)
            idxs.append(i.astype(jnp.int32))
            cur = jnp.where(
                jax.nn.one_hot(i, s.shape[-1], dtype=bool), -jnp.inf, cur)
        return jnp.stack(vals, -1), jnp.stack(idxs, -1)
    timeit(row_iter_topk, (masked,), "row iterative argmax m=16")

    # 2. global top_k over the 8640 row winners (payload sort)
    rs, ri = jax.jit(lambda s: jax.lax.top_k(s, m))(masked)
    rs = rs.reshape(-1)
    def glob(s):
        return jax.lax.top_k(s, k)
    timeit(glob, (rs,), "global top_k 8640->2000 (value only)")

    def glob_payload(s):
        ci = jnp.arange(s.shape[0], dtype=jnp.int32)
        v, i = jax.lax.sort_key_val(-s, ci)
        return -v[:k], i[:k]
    timeit(glob_payload, (rs,), "global sort_key_val 8640 + slice")

    # 2b. single-key packed sort: quantized score in high bits, candidate
    # rank in low 13 bits (exact index recovery, ~11-bit score mantissa)
    def glob_packed(s):
        bits = jax.lax.bitcast_convert_type(s, jnp.uint32)
        # monotone map: flip sign bit for positives, invert negatives
        mono = jnp.where(
            (bits >> 31) == 0, bits | jnp.uint32(1 << 31), ~bits)
        ci = jnp.arange(s.shape[0], dtype=jnp.uint32)
        packed = (mono & jnp.uint32(0xFFFFE000)) | (jnp.uint32(8191) - ci)
        topv = jax.lax.top_k(packed.astype(jnp.int32).astype(jnp.float32), k)
        return topv
    timeit(glob_packed, (rs,), "global packed single-key top_k")

    # 3. full current extract path for reference
    from vision_processor_tpu.ops import blob as B
    flat = jnp.asarray(rng.random((h, w, 3)).astype(np.float32))
    mean = jnp.asarray(rng.random((h, w, 3)).astype(np.float32))
    circ = jnp.asarray(rng.random((h, w)).astype(np.float32))
    cnt = jnp.int32(1400)
    timeit(lambda s: B.extract_blobs_scored(flat, circ, s, mean, cnt,
                                            max_blobs=k),
           (masked,), "extract_blobs_scored full")


if __name__ == "__main__":
    main()
