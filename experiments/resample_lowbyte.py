"""Low-byte resample variants: trade sub-cell interpolation for gather
bytes.

PERFORMANCE.md's gather facts: cost is ~proportional to bytes fetched per
index row (16 B/output px today). The flat grid at factor >= 1.25 is
COARSER than the Bayer cell grid, so cross-cell bilinear contributes
little beyond anti-jitter — candidates:

  v16: current — 16 B/px (4 cells), full per-plane bilinear (baseline)
  v8:  8 B/px (horizontal cell pair), horizontal lerp exact, vertical
       nearest (cell chosen by rounding v)
  v4:  4 B/px (single nearest cell), pure nearest per plane, gathered
       straight from the u32 bitcast of the raw frame (no stack build)

Run: python experiments/resample_lowbyte.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vision_processor_tpu.ops import frame as F

H, W = 720, 960      # Bayer cell grid of a 1440x1920 raw
HF, WF = 432, 770    # flat grid at factor 1.25


def timeit(fn, args, tag, n_lo=8, n_hi=40, reps=3):
    def make(n):
        def scan_fn(x0, *rest):
            def body(carry, _):
                out = fn(carry, *rest)
                bump = jnp.sum(out.astype(jnp.float32))
                nxt = jnp.roll(carry, 2, axis=0)
                return nxt, bump
            return jax.lax.scan(body, x0, None, length=n)
        return jax.jit(scan_fn)

    fns = {n: make(n) for n in (n_lo, n_hi)}
    for n in (n_lo, n_hi):
        out = fns[n](*args); jax.block_until_ready(out)
    best = []
    for _ in range(reps):
        t = {}
        for n in (n_lo, n_hi):
            t0 = time.perf_counter()
            out = fns[n](*args); jax.block_until_ready(out)
            t[n] = time.perf_counter() - t0
        best.append((t[n_hi] - t[n_lo]) / (n_hi - n_lo) * 1e3)
    ms = min(best)
    print(f"{tag:58s} {ms:8.3f} ms")
    return ms


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (2 * H, 2 * W), dtype=np.uint8))

    # synthetic but realistic grid state (smooth map, like the projection)
    u = rng.uniform(0.5, W - 1.5, (HF, WF)).astype(np.float32)
    v = rng.uniform(0.5, H - 1.5, (HF, WF)).astype(np.float32)
    x0 = np.floor(u).astype(np.int32)
    y0 = np.floor(v).astype(np.int32)
    ub = jnp.asarray(u - x0)
    vb = jnp.asarray(v - y0)
    grid16 = {"idx": jnp.asarray(y0 * W + x0), "ub": ub, "vb": vb}

    # v8: nearest row (vertical round), horizontal pair
    yn = np.clip(np.round(v).astype(np.int32), 0, H - 1)
    idx8 = jnp.asarray(yn * W + x0)
    vb8 = jnp.asarray(v - yn)  # in [-0.5, 0.5]

    # v4: nearest cell
    xn = np.clip(np.round(u).astype(np.int32), 0, W - 1)
    idx4 = jnp.asarray(yn * W + xn)

    offs = jnp.asarray(F._PLANE_OFFSETS["RGGB"], dtype=jnp.float32)

    def v16(r):
        return F.resample_flat_grid_raw(r, grid16, "RGGB")

    def pair_stack_u32(r):
        h2, w2 = r.shape[0] // 2, r.shape[1] // 2
        r4 = r.reshape(h2, 2, r.shape[1])
        top16 = jax.lax.bitcast_convert_type(
            r4[:, 0].reshape(h2, w2, 2), jnp.uint16)
        bot16 = jax.lax.bitcast_convert_type(
            r4[:, 1].reshape(h2, w2, 2), jnp.uint16)
        w32 = top16.astype(jnp.uint32) | (bot16.astype(jnp.uint32) << 16)
        right = jnp.concatenate([w32[:, 1:], w32[:, -1:]], axis=1)
        s = jnp.stack([w32, right], axis=-1)  # (H, W, 2) u32
        return jax.lax.bitcast_convert_type(s, jnp.uint8).reshape(-1, 8)

    def v8(r):
        st = pair_stack_u32(r)
        g = jnp.take(st, idx8, axis=0).astype(jnp.float32)
        g0, g1 = g[..., 0:4], g[..., 4:8]
        fx = jnp.clip(ub[..., None] + offs[:, 0], 0.0, 1.0)
        fy = jnp.clip(vb8[..., None] + offs[:, 1], 0.0, 1.0)
        # vertical: only within-cell quarter-pixel blend survives (fy acts
        # on the plane offsets, cross-cell part clipped)
        s = (g0 * (1 - fx) + g1 * fx)
        r_, gg, b = F.combine_planes(s, "RGGB")
        del fy
        return F.rgb_to_drgb(r_, gg, b)

    def cell_u32(r):
        h2, w2 = r.shape[0] // 2, r.shape[1] // 2
        r4 = r.reshape(h2, 2, r.shape[1])
        top16 = jax.lax.bitcast_convert_type(
            r4[:, 0].reshape(h2, w2, 2), jnp.uint16)
        bot16 = jax.lax.bitcast_convert_type(
            r4[:, 1].reshape(h2, w2, 2), jnp.uint16)
        return (top16.astype(jnp.uint32)
                | (bot16.astype(jnp.uint32) << 16)).reshape(-1)

    def v4(r):
        w32 = cell_u32(r)
        g = jnp.take(w32, idx4)
        s = jnp.stack(
            [(g & 0xFF), (g >> 8) & 0xFF, (g >> 16) & 0xFF, (g >> 24)],
            axis=-1,
        ).astype(jnp.float32)
        r_, gg, b = F.combine_planes(s, "RGGB")
        return F.rgb_to_drgb(r_, gg, b)

    def v4b(r):
        # 4B rows as 4 u8 lanes (no shift-unpack) — does lane count or the
        # unpack arithmetic matter at 4 B?
        st = jax.lax.bitcast_convert_type(
            cell_u32(r).reshape(-1, 1), jnp.uint8
        ).reshape(-1, 4)
        s = jnp.take(st, idx4, axis=0).astype(jnp.float32)
        r_, gg, b = F.combine_planes(s, "RGGB")
        return F.rgb_to_drgb(r_, gg, b)

    timeit(v16, (raw,), "v16) current: stack build + 16B gather + bilinear")
    timeit(v8, (raw,), "v8)  pair stack + 8B gather + horizontal lerp")
    timeit(v4, (raw,), "v4)  no stack, 4B u32 gather + shift unpack")
    timeit(v4b, (raw,), "v4b) u8x4-lane stack + 4B gather")


if __name__ == "__main__":
    main()
