"""Gather-structure variants for the cached-grid resample on the real TPU.

a) current: build (H,W,16) u8 corner stack per frame + one 16B-row gather
b) 4 gathers of 4B rows from the packed planes with precomputed clamped
   corner indices (no per-frame stack build)
c) 2 gathers of 8B rows (one horizontal-pair concat per frame)
d) like (b) but gathering from a (H*W,) u32 bitcast (4 lanes packed in one
   u32 word), unpacked with shifts
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vision_processor_tpu.ops import frame as F

H, W = 540, 960
HF, WF = 540, 962


def timeit(fn, args, tag, n_lo=4, n_hi=20):
    def make(n):
        def scan_fn(x0, *rest):
            def body(carry, _):
                out = fn(carry, *rest)
                leaves = jax.tree.leaves(out)
                bump = sum(jnp.sum(jnp.asarray(l).astype(jnp.float32))
                           for l in leaves)
                nxt = jnp.roll(carry, 1, axis=0)
                return nxt, bump
            return jax.lax.scan(body, x0, None, length=n)
        return jax.jit(scan_fn)

    times = {}
    for n in (n_lo, n_hi):
        f = make(n)
        out = f(*args); jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(*args); jax.block_until_ready(out)
        times[n] = time.perf_counter() - t0
    ms = (times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1e3
    print(f"{tag:56s} {ms:8.3f} ms")
    return ms


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (2 * H, 2 * W), dtype=np.uint8))

    x0 = rng.integers(0, W - 1, (HF, WF)).astype(np.int32)
    y0 = rng.integers(0, H - 1, (HF, WF)).astype(np.int32)
    ub = jnp.asarray(rng.uniform(0, 1, (HF, WF)).astype(np.float32))
    vb = jnp.asarray(rng.uniform(0, 1, (HF, WF)).astype(np.float32))
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    idx00 = jnp.asarray(y0 * W + x0)
    idx01 = jnp.asarray(y0 * W + x1)
    idx10 = jnp.asarray(y1 * W + x0)
    idx11 = jnp.asarray(y1 * W + x1)
    grid = {"idx": idx00, "ub": ub, "vb": vb}

    offs = jnp.asarray(F._PLANE_OFFSETS["RGGB"], dtype=jnp.float32)

    def weights():
        fx = jnp.clip(ub[..., None] + offs[:, 0], 0.0, 1.0)
        fy = jnp.clip(vb[..., None] + offs[:, 1], 0.0, 1.0)
        return fx, fy

    def finish(g00, g01, g10, g11):
        fx, fy = weights()
        top = g00 * (1 - fx) + g01 * fx
        bot = g10 * (1 - fx) + g11 * fx
        s = top * (1 - fy) + bot * fy
        r_, gg, b = F.combine_planes(s, "RGGB")
        return F.rgb_to_drgb(r_, gg, b)

    def variant_a(r):
        return F.resample_flat_grid(F.raw2planes_packed(r, "RGGB"), grid, "RGGB")

    def variant_b(r):
        p = F.raw2planes_packed(r, "RGGB").astype(jnp.uint8).reshape(-1, 4)
        g00 = jnp.take(p, idx00, axis=0).astype(jnp.float32)
        g01 = jnp.take(p, idx01, axis=0).astype(jnp.float32)
        g10 = jnp.take(p, idx10, axis=0).astype(jnp.float32)
        g11 = jnp.take(p, idx11, axis=0).astype(jnp.float32)
        return finish(g00, g01, g10, g11)

    def variant_c(r):
        p = F.raw2planes_packed(r, "RGGB").astype(jnp.uint8)
        right = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)
        pair = jnp.concatenate([p, right], axis=-1).reshape(-1, 8)
        gtop = jnp.take(pair, idx00, axis=0).astype(jnp.float32)
        gbot = jnp.take(pair, idx10, axis=0).astype(jnp.float32)
        return finish(gtop[..., :4], gtop[..., 4:], gbot[..., :4], gbot[..., 4:])

    def variant_d(r):
        p = F.raw2planes_packed(r, "RGGB").astype(jnp.uint8).reshape(-1, 4)
        w32 = jax.lax.bitcast_convert_type(p, jnp.uint32).reshape(-1)

        def unpack(w):
            return jnp.stack([
                (w & 0xFF), (w >> 8) & 0xFF, (w >> 16) & 0xFF, (w >> 24)
            ], axis=-1).astype(jnp.float32)

        g00 = unpack(jnp.take(w32, idx00))
        g01 = unpack(jnp.take(w32, idx01))
        g10 = unpack(jnp.take(w32, idx10))
        g11 = unpack(jnp.take(w32, idx11))
        return finish(g00, g01, g10, g11)

    timeit(variant_a, (raw,), "a) corner stack + 1x16B gather (current)")
    timeit(variant_b, (raw,), "b) 4x 4B-row gathers, precomputed corner idx")
    timeit(variant_c, (raw,), "c) 2x 8B-row gathers, horizontal pair concat")
    timeit(variant_d, (raw,), "d) 4x u32 scalar gathers + shift unpack")

    x = np.asarray(variant_a(raw))
    for name, v in (("b", variant_b), ("c", variant_c), ("d", variant_d)):
        err = np.max(np.abs(np.asarray(v(raw)) - x))
        print(f"   max|{name} - a| = {err}")


if __name__ == "__main__":
    main()


def main2():
    """u32-granularity stack build vs the u8 build."""
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (2 * H, 2 * W), dtype=np.uint8))
    x0 = rng.integers(0, W - 1, (HF, WF)).astype(np.int32)
    y0 = rng.integers(0, H - 1, (HF, WF)).astype(np.int32)
    idx = jnp.asarray(y0 * W + x0)

    def stack_u8(r):
        return F.corner_stack(F.raw2planes_packed(r, "RGGB"))

    def stack_u32(r):
        p = F.raw2planes_packed(r, "RGGB").astype(jnp.uint8)
        w = jax.lax.bitcast_convert_type(p, jnp.uint32)  # (H, W)
        right = jnp.concatenate([w[:, 1:], w[:, -1:]], axis=1)
        down = jnp.concatenate([w[1:], w[-1:]], axis=0)
        down_right = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
        s = jnp.stack([w, right, down, down_right], axis=-1)  # (H, W, 4) u32
        return jax.lax.bitcast_convert_type(s, jnp.uint8).reshape(H, W, 16)

    def gather_u8(r):
        s = stack_u8(r).reshape(-1, 16)
        return jnp.take(s, idx, axis=0).astype(jnp.float32)

    def gather_u32_rows(r):
        p = F.raw2planes_packed(r, "RGGB").astype(jnp.uint8)
        w = jax.lax.bitcast_convert_type(p, jnp.uint32)  # (H, W)
        right = jnp.concatenate([w[:, 1:], w[:, -1:]], axis=1)
        down = jnp.concatenate([w[1:], w[-1:]], axis=0)
        down_right = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
        s = jnp.stack([w, right, down, down_right], axis=-1).reshape(-1, 4)
        g32 = jnp.take(s, idx, axis=0)  # (HF, WF, 4) u32 rows = 16B
        return jax.lax.bitcast_convert_type(g32, jnp.uint8).reshape(
            HF, WF, 16).astype(jnp.float32)

    timeit(stack_u8, (raw,), "stack build u8 (current)")
    timeit(stack_u32, (raw,), "stack build via u32 bitcast")
    timeit(gather_u8, (raw,), "u8 stack + gather + widen")
    timeit(gather_u32_rows, (raw,), "u32 stack + u32x4 gather + bitcast + widen")
    a = np.asarray(gather_u8(raw))
    b = np.asarray(gather_u32_rows(raw))
    print("   max diff:", np.max(np.abs(a - b)))


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "2":
    main2()
