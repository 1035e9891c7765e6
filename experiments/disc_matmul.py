"""Disc stats via banded MXU matmuls: span sums as (H*6, Wp) @ (Wp, W)
banded matrices (one per distinct half-width), accumulated over row
shifts. Measures speed in the real pipeline context and accuracy vs the
exact f32 cumsum path at several matmul precisions.
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
from vision_processor_tpu.ops import frame as F


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
    print(f"{tag:56s} {ms:8.3f} ms   ({', '.join(f'{b:.3f}' for b in best)})")
    return ms


def band_matrix(w: int, hw: int) -> np.ndarray:
    """(W, W) f32: out[x] = clamp-to-edge sum over [x-hw, x+hw]."""
    m = np.zeros((w, w), dtype=np.float32)
    for x in range(w):
        for d in range(-hw, hw + 1):
            m[min(max(x + d, 0), w - 1), x] += 1.0
    return m


def disc_stats_matmul(flat, radius, precision):
    r = radius
    offs = B.disc_offsets(r)
    n = len(offs)
    half_w = {int(dy): int(np.max(offs[offs[:, 0] == dy, 1]))
              for dy in range(-r, r + 1)}
    h, w = flat.shape[:2]
    p = jnp.pad(flat, ((r, r), (0, 0), (0, 0)), mode="edge")  # rows only
    both = jnp.concatenate([p, p * p], axis=-1)  # (H+2r, W, 6)
    x = jnp.moveaxis(both, -1, 1).reshape((h + 2 * r) * 6, w)  # rows x W

    spans = {}
    for hw in sorted(set(half_w.values())):
        bm = jnp.asarray(band_matrix(w, hw))
        s = jax.lax.dot_general(
            x, bm, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        ).reshape(h + 2 * r, 6, w)
        spans[hw] = s

    acc = None
    for dy in range(-r, r + 1):
        sl = spans[half_w[dy]][r + dy: r + dy + h]
        acc = sl if acc is None else acc + sl
    acc = jnp.moveaxis(acc, 1, -1)  # (H, W, 6)
    return acc[..., :3], acc[..., 3:], n


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    cfg, raws, packed, scales, offsets, colors, params = build_rig(
        max_blobs=2000)[:7]
    bm = cfg.bm
    raw = jnp.asarray(raws[0])
    fs = jnp.float32(scales[0])
    fo = jnp.asarray(offsets[0])
    grid = bm.make_resample_grid(np.asarray(packed[0]), 150.0,
                                 field_scale=fs, field_offset=fo)
    r = bm.disc_radius

    def upstream(raw):
        flat = F.resample_flat_grid_raw(raw, grid, bm.fmt)
        grad = B.gradient_dot(flat, bm.grad_offset)
        circ = B.circularity(B.summed_area_table(grad), bm.sat_radius)
        return flat, circ

    def consume(flat, circ, s1, s2, n):
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        stddev_sum = jnp.sum(jnp.sqrt(var), axis=-1)
        score = circ / jnp.maximum(stddev_sum, 1e-12)
        masked = jnp.where(
            (circ >= params["min_circularity"]) & B.local_max_mask(circ),
            score, -jnp.inf)
        rs, _ = jax.lax.top_k(masked, 16)
        return jax.lax.top_k(rs.reshape(-1), bm.max_blobs)[0], mean

    def path_cumsum(raw):
        flat, circ = upstream(raw)
        s1, s2, n = B.disc_stats_sat(flat, r)
        return consume(flat, circ, s1, s2, n)

    def make_path(precision):
        def path(raw):
            flat, circ = upstream(raw)
            s1, s2, n = disc_stats_matmul(flat, r, precision)
            return consume(flat, circ, s1, s2, n)
        return path

    # accuracy
    flat, circ = jax.jit(upstream)(raw)
    s1e, s2e, n = jax.jit(lambda f: B.disc_stats_sat(f, r))(flat)
    for prec in (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST):
        s1m, s2m, _ = jax.jit(
            lambda f, p=prec: disc_stats_matmul(f, r, p))(flat)
        e1 = np.max(np.abs(np.asarray(s1e) - np.asarray(s1m)))
        e2 = np.max(np.abs(np.asarray(s2e) - np.asarray(s2m)))
        rel2 = np.max(np.abs(np.asarray(s2e) - np.asarray(s2m)) /
                      np.maximum(np.abs(np.asarray(s2e)), 1.0))
        print(f"precision {prec}: max|s1 err| {e1:.4f}  max|s2 err| {e2:.1f}"
              f"  max rel s2 {rel2:.2e}")

    timeit(path_cumsum, (raw,), "disc stats via cumsum+spans (current)")
    timeit(make_path(jax.lax.Precision.DEFAULT), (raw,),
           "disc stats via banded matmul (bf16 in)")
    timeit(make_path(jax.lax.Precision.HIGHEST), (raw,),
           "disc stats via banded matmul (HIGHEST)")


if __name__ == "__main__":
    main()
