"""Channel-planar disc stats: (6, H, W) so span shifts slide the lane dim.

Consumed through the real top_k path so XLA cannot algebraically fold the
sums (the trap that made disc_split.py report ~0 ms).
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


def disc_stats_planar(flat, radius):
    """disc_stats_sat with channel-planar layout: (H, W, C) -> planar
    (2C, Hp, Wp), lane-dim cumsum + lane-dim span slices."""
    r = radius
    offs = B.disc_offsets(r)
    n = len(offs)
    half_w = {
        int(dy): int(np.max(offs[offs[:, 0] == dy, 1])) for dy in range(-r, r + 1)
    }
    h, w = flat.shape[:2]
    p = jnp.moveaxis(flat, -1, 0)  # (3, H, W)
    p = jnp.pad(p, ((0, 0), (r, r), (r, r + 1)), mode="edge")
    both = jnp.concatenate([p, p * p], axis=0)  # (6, H+2r, W+2r+1)
    csum = jnp.cumsum(both, axis=2)
    zeros = jnp.zeros_like(csum[:, :, :1])
    csum = jnp.concatenate([zeros, csum], axis=2)

    acc = None
    for dy in range(-r, r + 1):
        hw = half_w[dy]
        rows = csum[:, r + dy : r + dy + h]
        hi = rows[:, :, r + hw + 1 : r + hw + 1 + w]
        lo = rows[:, :, r - hw : r - hw + w]
        span = hi - lo
        acc = span if acc is None else acc + span
    return acc[:3], acc[3:], n


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

    def upstream(raw):
        flat = F.resample_flat_grid_raw(raw, grid, bm.fmt)
        grad = B.gradient_dot(flat, bm.grad_offset)
        circ = B.circularity(B.summed_area_table(grad), bm.sat_radius)
        return flat, circ

    m = 16

    def consume(score_map, circ):
        masked = jnp.where(
            (circ >= params["min_circularity"]) & B.local_max_mask(circ),
            score_map, -jnp.inf)
        rs, ri = jax.lax.top_k(masked, m)
        ts, ci = jax.lax.top_k(rs.reshape(-1), bm.max_blobs)
        return ts, ci

    def path_current(raw):
        flat, circ = upstream(raw)
        s1, s2, n = B.disc_stats_sat(flat, bm.disc_radius)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        stddev_sum = jnp.sum(jnp.sqrt(var), axis=-1)
        return consume(circ / jnp.maximum(stddev_sum, 1e-12), circ)

    def path_planar(raw):
        flat, circ = upstream(raw)
        s1, s2, n = disc_stats_planar(flat, bm.disc_radius)
        mean = s1 / n  # (3, H, W)
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        stddev_sum = jnp.sum(jnp.sqrt(var), axis=0)
        return consume(circ / jnp.maximum(stddev_sum, 1e-12), circ)

    def path_none(raw):
        flat, circ = upstream(raw)
        return consume(circ, circ)

    a = jax.jit(path_current)(raw)
    b = jax.jit(path_planar)(raw)
    print("scores equal:", np.allclose(np.asarray(a[0]), np.asarray(b[0]),
                                       rtol=1e-6, atol=1e-6))

    timeit(path_none, (raw,), "no disc stats (circ-ranked)")
    timeit(path_current, (raw,), "disc stats (H, W, 6) [current]")
    timeit(path_planar, (raw,), "disc stats planar (6, H, W)")


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def main_cand():
    """Candidate-only disc stats: circ-ranked row top-k, then gather span
    sums from the row cumsum at the h*m candidates only."""
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
    offs = B.disc_offsets(r)
    n_disc = len(offs)
    half_w = {int(dy): int(np.max(offs[offs[:, 0] == dy, 1]))
              for dy in range(-r, r + 1)}

    def upstream(raw):
        flat = F.resample_flat_grid_raw(raw, grid, bm.fmt)
        grad = B.gradient_dot(flat, bm.grad_offset)
        circ = B.circularity(B.summed_area_table(grad), bm.sat_radius)
        return flat, circ

    m = 16

    def path_cand(raw):
        flat, circ = upstream(raw)
        h, w = circ.shape
        valid = (circ >= params["min_circularity"]) & B.local_max_mask(circ)
        masked = jnp.where(valid, circ, -jnp.inf)
        row_c, row_x = jax.lax.top_k(masked, m)  # (h, m)
        cy = jnp.broadcast_to(jnp.arange(h)[:, None], (h, m)).reshape(-1)
        cx = row_x.reshape(-1)
        cand_ok = (row_c > -jnp.inf).reshape(-1)

        padded = jnp.pad(flat, ((r, r), (r, r + 1), (0, 0)), mode="edge")
        both = jnp.concatenate([padded, padded * padded], axis=-1)
        csum = jnp.cumsum(both, axis=1)
        zeros = jnp.zeros_like(csum[:, :1])
        csum = jnp.concatenate([zeros, csum], axis=1)  # (H+2r, Wp, 6)
        wp = csum.shape[1]
        flatc = csum.reshape(-1, 6)

        acc = jnp.zeros((h * m, 6), jnp.float32)
        for dy in range(-r, r + 1):
            hw = half_w[dy]
            row = (cy + r + dy) * wp
            hi = jnp.take(flatc, row + (r + hw + 1) + cx, axis=0)
            lo = jnp.take(flatc, row + (r - hw) + cx, axis=0)
            acc = acc + (hi - lo)
        mean = acc[:, :3] / n_disc
        var = jnp.maximum(acc[:, 3:] / n_disc - mean * mean, 0.0)
        stddev_sum = jnp.sum(jnp.sqrt(var), axis=-1)
        score = row_c.reshape(-1) / jnp.maximum(stddev_sum, 1e-12)
        score = jnp.where(cand_ok, score, -jnp.inf)
        ts, ci = jax.lax.top_k(score, bm.max_blobs)
        return ts, ci, mean

    def path_current(raw):
        flat, circ = upstream(raw)
        s1, s2, n = B.disc_stats_sat(flat, bm.disc_radius)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        stddev_sum = jnp.sum(jnp.sqrt(var), axis=-1)
        score_map = circ / jnp.maximum(stddev_sum, 1e-12)
        masked = jnp.where(
            (circ >= params["min_circularity"]) & B.local_max_mask(circ),
            score_map, -jnp.inf)
        rs, ri = jax.lax.top_k(masked, m)
        ts, ci = jax.lax.top_k(rs.reshape(-1), bm.max_blobs)
        return ts, ci

    timeit(path_current, (raw,), "full-map disc stats (current)")
    timeit(path_cand, (raw,), "candidate-only disc stats (18 gathers)")
    timeit(path_current, (raw,), "full-map disc stats (again)")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "cand":
    main_cand()


def main_pad8():
    """6 -> 8 channel padding for the disc-stats cumsum (lane alignment)."""
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

    def disc8(flat, radius):
        offs = B.disc_offsets(radius)
        n = len(offs)
        half_w = {int(dy): int(np.max(offs[offs[:, 0] == dy, 1]))
                  for dy in range(-radius, radius + 1)}
        rr = radius
        padded = jnp.pad(flat, ((rr, rr), (rr, rr + 1), (0, 0)), mode="edge")
        zero2 = jnp.zeros_like(padded[..., :1])
        both = jnp.concatenate(
            [padded, padded * padded, zero2, zero2], axis=-1)  # (.., 8)
        csum = jnp.cumsum(both, axis=1)
        zeros = jnp.zeros_like(csum[:, :1])
        csum = jnp.concatenate([zeros, csum], axis=1)
        h, w = flat.shape[:2]
        acc = None
        for dy in range(-rr, rr + 1):
            hw = half_w[dy]
            rows = csum[rr + dy: rr + dy + h]
            span = rows[:, rr + hw + 1: rr + hw + 1 + w] - \
                rows[:, rr - hw: rr - hw + w]
            acc = span if acc is None else acc + span
        return acc[..., :3], acc[..., 3:6], n

    def consume(flat, circ, s1, s2, n):
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        stddev_sum = jnp.sum(jnp.sqrt(var), axis=-1)
        score = circ / jnp.maximum(stddev_sum, 1e-12)
        masked = jnp.where(
            (circ >= params["min_circularity"]) & B.local_max_mask(circ),
            score, -jnp.inf)
        rs, _ = jax.lax.top_k(masked, 16)
        return jax.lax.top_k(rs.reshape(-1), bm.max_blobs)[0]

    def p_cur(raw):
        flat, circ = upstream(raw)
        s1, s2, n = B.disc_stats_sat(flat, r)
        return consume(flat, circ, s1, s2, n)

    def p_pad8(raw):
        flat, circ = upstream(raw)
        s1, s2, n = disc8(flat, r)
        return consume(flat, circ, s1, s2, n)

    a = np.asarray(jax.jit(p_cur)(raw))
    b = np.asarray(jax.jit(p_pad8)(raw))
    print("pad8 equal:", np.array_equal(a, b))
    timeit(p_cur, (raw,), "disc stats 6ch (current)")
    timeit(p_pad8, (raw,), "disc stats 8ch padded")
    timeit(p_cur, (raw,), "disc stats 6ch (again)")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "pad8":
    main_pad8()
