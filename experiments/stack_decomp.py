"""Decompose the corner-stack cost: shifts vs interleave vs gather unpack.

Also tests a u32-native pipeline: build packed u32 cells from raw without
the (H, W, 4) u8 intermediate, stack at u32 lane granularity, gather 4xu32
rows, unpack with shifts (no bitcast relayout after the gather).
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


def timeit(fn, args, tag, n_lo=4, n_hi=20, reps=2):
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
    print(f"{tag:56s} {ms:8.3f} ms")
    return ms


def raw_to_p32(r):
    """raw (2H, 2W) u8 -> (H, W) u32, one Bayer cell per word (row-major
    cell bytes, little-endian)."""
    r4 = r.reshape(H, 2, 2 * W)
    top = r4[:, 0]  # (H, 2W)
    bot = r4[:, 1]
    top16 = jax.lax.bitcast_convert_type(top.reshape(H, W, 2), jnp.uint16)
    bot16 = jax.lax.bitcast_convert_type(bot.reshape(H, W, 2), jnp.uint16)
    return top16.astype(jnp.uint32) | (bot16.astype(jnp.uint32) << 16)


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (2 * H, 2 * W), dtype=np.uint8))
    x0 = rng.integers(0, W - 1, (HF, WF)).astype(np.int32)
    y0 = rng.integers(0, H - 1, (HF, WF)).astype(np.int32)
    idx = jnp.asarray(y0 * W + x0)
    ub = jnp.asarray(rng.uniform(0, 1, (HF, WF)).astype(np.float32))
    vb = jnp.asarray(rng.uniform(0, 1, (HF, WF)).astype(np.float32))
    grid = {"idx": idx, "ub": ub, "vb": vb}

    def shifts_only(r):
        p = F.raw2planes_packed(r, "RGGB").astype(jnp.uint8)
        right = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)
        down = jnp.concatenate([p[1:], p[-1:]], axis=0)
        down_right = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
        return right, down, down_right

    shifted = jax.jit(shifts_only)(raw)
    shifted = jax.tree.map(jnp.asarray, shifted)

    def interleave_only(p0, parts=shifted):
        return jnp.concatenate([p0, *parts], axis=-1)

    timeit(shifts_only, (raw,), "shifts only (3 u8 concats)")
    timeit(interleave_only,
           (jax.jit(lambda r: F.raw2planes_packed(r, "RGGB").astype(jnp.uint8))(raw),),
           "interleave only (4->16 lane concat)")

    # u32-native path
    def p32_build(r):
        return raw_to_p32(r)

    def stack32(r):
        w = raw_to_p32(r)
        right = jnp.concatenate([w[:, 1:], w[:, -1:]], axis=1)
        down = jnp.concatenate([w[1:], w[-1:]], axis=0)
        dr = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
        return jnp.stack([w, right, down, dr], axis=-1)  # (H, W, 4) u32

    def full_u32(r):
        s = stack32(r).reshape(-1, 4)
        g = jnp.take(s, grid["idx"], axis=0)  # (HF, WF, 4) u32 rows (16B)
        # unpack channels with shifts: (HF, WF, 4corner) -> per channel
        gs = [(g >> (8 * c)).astype(jnp.uint8).astype(jnp.float32)
              for c in range(4)]
        gf = jnp.stack(gs, axis=-1)  # (HF, WF, 4corner, 4ch)
        g00, g01, g10, g11 = gf[..., 0, :], gf[..., 1, :], gf[..., 2, :], gf[..., 3, :]
        offs = jnp.asarray(F._PLANE_OFFSETS["RGGB"], dtype=jnp.float32)
        fx = jnp.clip(grid["ub"][..., None] + offs[:, 0], 0.0, 1.0)
        fy = jnp.clip(grid["vb"][..., None] + offs[:, 1], 0.0, 1.0)
        top = g00 * (1 - fx) + g01 * fx
        bot = g10 * (1 - fx) + g11 * fx
        s4 = top * (1 - fy) + bot * fy
        r_, gg, b = F.combine_planes(s4, "RGGB")
        return F.rgb_to_drgb(r_, gg, b)

    def full_u8(r):
        return F.resample_flat_grid(F.raw2planes_packed(r, "RGGB"), grid, "RGGB")

    a = np.asarray(jax.jit(full_u8)(raw))
    b = np.asarray(jax.jit(full_u32)(raw))
    print("u32 path max diff:", np.max(np.abs(a - b)))

    timeit(p32_build, (raw,), "raw -> p32 (u16 bitcasts + widen/or)")
    timeit(stack32, (raw,), "+ u32 4-lane stack")
    timeit(full_u32, (raw,), "full resample via u32 rows + shift unpack")
    timeit(full_u8, (raw,), "full resample via u8 stack (current)")


if __name__ == "__main__":
    main()


def main2():
    """Scalarized 2D unpack+lerp after the u32-row gather."""
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (2 * H, 2 * W), dtype=np.uint8))
    x0 = rng.integers(0, W - 1, (HF, WF)).astype(np.int32)
    y0 = rng.integers(0, H - 1, (HF, WF)).astype(np.int32)
    idx = jnp.asarray(y0 * W + x0)
    ub = jnp.asarray(rng.uniform(0, 1, (HF, WF)).astype(np.float32))
    vb = jnp.asarray(rng.uniform(0, 1, (HF, WF)).astype(np.float32))
    grid = {"idx": idx, "ub": ub, "vb": vb}

    def stack32(r):
        w = raw_to_p32(r)
        right = jnp.concatenate([w[:, 1:], w[:, -1:]], axis=1)
        down = jnp.concatenate([w[1:], w[-1:]], axis=0)
        dr = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
        return jnp.stack([w, right, down, dr], axis=-1)  # (H, W, 4) u32

    offs = np.asarray(F._PLANE_OFFSETS["RGGB"], dtype=np.float32)

    def full_u32_2d(r):
        s = stack32(r).reshape(-1, 4)
        g = jnp.take(s, grid["idx"], axis=0)  # (HF, WF, 4corner) u32
        corners = [g[..., c] for c in range(4)]  # 2D u32 each

        def ch(word, c):
            return ((word >> (8 * c)) & 0xFF).astype(jnp.float32)

        # per-plane lerp, all 2D elementwise (fusion-friendly)
        planes = []
        for c in range(4):
            fx = jnp.clip(ub + offs[c, 0], 0.0, 1.0)
            fy = jnp.clip(vb + offs[c, 1], 0.0, 1.0)
            top = ch(corners[0], c) * (1 - fx) + ch(corners[1], c) * fx
            bot = ch(corners[2], c) * (1 - fx) + ch(corners[3], c) * fx
            planes.append(top * (1 - fy) + bot * fy)

        r_ = planes[0]
        gg = 0.5 * planes[1] + 0.5 * planes[2]
        b = planes[3]
        return F.rgb_to_drgb(r_, gg, b)

    def full_u8(r):
        return F.resample_flat_grid(F.raw2planes_packed(r, "RGGB"), grid, "RGGB")

    a = np.asarray(jax.jit(full_u8)(raw))
    b = np.asarray(jax.jit(full_u32_2d)(raw))
    print("u32-2d path max diff:", np.max(np.abs(a - b)))
    timeit(full_u32_2d, (raw,), "full resample u32 rows, 2D scalarized unpack")
    timeit(full_u8, (raw,), "full resample u8 stack (current)")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "2":
    main2()


def main3():
    """u32 build (free) + bitcast to u8 + the fast u8 16B-row gather."""
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (2 * H, 2 * W), dtype=np.uint8))
    x0 = rng.integers(0, W - 1, (HF, WF)).astype(np.int32)
    y0 = rng.integers(0, H - 1, (HF, WF)).astype(np.int32)
    grid = {
        "idx": jnp.asarray(y0 * W + x0),
        "ub": jnp.asarray(rng.uniform(0, 1, (HF, WF)).astype(np.float32)),
        "vb": jnp.asarray(rng.uniform(0, 1, (HF, WF)).astype(np.float32)),
    }

    def stack_u8_via_u32(r):
        w = raw_to_p32(r)
        right = jnp.concatenate([w[:, 1:], w[:, -1:]], axis=1)
        down = jnp.concatenate([w[1:], w[-1:]], axis=0)
        dr = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
        s32 = jnp.stack([w, right, down, dr], axis=-1)  # (H, W, 4) u32
        return jax.lax.bitcast_convert_type(s32, jnp.uint8).reshape(H, W, 16)

    ref = np.asarray(jax.jit(
        lambda r: F.corner_stack(F.raw2planes_packed(r, "RGGB")))(raw))
    got = np.asarray(jax.jit(stack_u8_via_u32)(raw))
    print("stack equal:", np.array_equal(ref, got))

    def full_hybrid(r):
        stacked = stack_u8_via_u32(r).reshape(-1, 16)
        g = jnp.take(stacked, grid["idx"], axis=0).astype(jnp.float32)
        g00, g01, g10, g11 = g[..., 0:4], g[..., 4:8], g[..., 8:12], g[..., 12:16]
        offs = jnp.asarray(F._PLANE_OFFSETS["RGGB"], dtype=jnp.float32)
        fx = jnp.clip(grid["ub"][..., None] + offs[:, 0], 0.0, 1.0)
        fy = jnp.clip(grid["vb"][..., None] + offs[:, 1], 0.0, 1.0)
        top = g00 * (1 - fx) + g01 * fx
        bot = g10 * (1 - fx) + g11 * fx
        s = top * (1 - fy) + bot * fy
        r_, gg, b = F.combine_planes(s, "RGGB")
        return F.rgb_to_drgb(r_, gg, b)

    def full_u8(r):
        return F.resample_flat_grid(F.raw2planes_packed(r, "RGGB"), grid, "RGGB")

    a = np.asarray(jax.jit(full_u8)(raw))
    b = np.asarray(jax.jit(full_hybrid)(raw))
    print("hybrid max diff:", np.max(np.abs(a - b)))
    timeit(stack_u8_via_u32, (raw,), "stack build u32->bitcast u8")
    timeit(full_hybrid, (raw,), "full resample, u32-built u8 stack")
    timeit(full_u8, (raw,), "full resample, current u8 stack")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "3":
    main3()
