"""Two-pass separable warp prototype: replace the resample gather with
dense banded 1-D resamples (no gathers).

Finding that motivates this (resample_lowbyte.py): the flat-grid gather is
INDEX-RATE-bound (~3 ns/index) — fetching 4 B/px costs the same as
16 B/px, so the only way below ~1 ms is to not gather. Catmull-Smith
two-pass warp: pass 1 resamples the u axis, pass 2 the v axis; each is a
banded 2-tap linear interp along one axis, computed as dense
shifted-window multiplies over row blocks (dynamic_slice + hat weights),
zero gathers.

LAYOUT IS EVERYTHING here: with channels last — (rows, cols, 4) — every
tap op runs on (8, 770, 4) tiles whose lane dim is the 4-channel axis:
4/128 lanes used, measured 5.6 ms (5x WORSE than the gather). With
channels on sublanes — (rows, 4, cols) — the same math runs on
(8*4, 770) tiles: full lanes.

Run: python experiments/warp2pass.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

H, W = 720, 960      # source cell grid (1440x1920 Bayer)
HF, WF = 432, 770    # flat grid, factor 1.25
BLK = 8              # output rows per block


def banded_pass(src, pos, r0, n_out, win, blk=BLK):
    """1-D linear resample along axis 0 of a (R, ch, C) array, banded.

    src (R, ch, C) f32; pos (ceil(n_out/blk)*blk, C) f32 source positions;
    r0 (ceil(n_out/blk),) i32 window starts with pos[y] - r0[block(y)] in
    [0, win-2] guaranteed by the host precompute (pad rows repeat a valid
    row). Returns (n_out, ch, C).
    """
    n_blocks = -(-n_out // blk)
    pos_b = pos[: n_blocks * blk].reshape(n_blocks, blk, pos.shape[1])

    def one_block(_, inp):
        r0b, posb = inp
        window = jax.lax.dynamic_slice_in_dim(src, r0b, win, axis=0)
        p = posb[:, None, :] - r0b.astype(jnp.float32)
        out = jnp.zeros((blk,) + src.shape[1:], src.dtype)
        for k in range(win):
            w = jnp.maximum(0.0, 1.0 - jnp.abs(p - k))  # (blk, 1, C)
            out = out + w * window[k][None]             # (blk, ch, C)
        return _, out

    _, outs = jax.lax.scan(one_block, 0, (r0, pos_b))
    return outs.reshape(n_blocks * blk, *src.shape[1:])[:n_out]


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


def make_positions(n_out, n_src, n_other, curve=6.0, seed=0):
    """Smooth monotone positions pos[yo, other] spanning [1, n_src-2],
    with a gentle cross-axis curve like a projective+distortion map."""
    base = np.linspace(1.0, n_src - 2.0, n_out)
    bend = np.sin(np.linspace(0, np.pi, n_other)) * curve
    pos = base[:, None] + bend[None, :] * (base[:, None] / n_src - 0.5)
    return np.clip(pos, 1.0, n_src - 2.0).astype(np.float32)


def pad_pos(pos, blk=BLK):
    n_out = pos.shape[0]
    pad = (-n_out) % blk
    if pad:
        pos = np.concatenate([pos, np.repeat(pos[-1:], pad, axis=0)])
    return pos


def block_starts(pos, win, n_src, blk=BLK):
    pos = pad_pos(pos, blk)
    n_blocks = pos.shape[0] // blk
    r0 = np.empty(n_blocks, np.int32)
    for b in range(n_blocks):
        lo = int(np.floor(pos[b * blk:(b + 1) * blk].min()))
        hi = int(np.ceil(pos[b * blk:(b + 1) * blk].max()))
        assert hi - lo <= win - 2, (b, lo, hi)
        r0[b] = min(max(lo, 0), n_src - win)
    return r0


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (2 * H, 2 * W), dtype=np.uint8))

    pos1 = make_positions(WF, W, H, seed=1)       # (WF, H)
    pos2 = make_positions(HF, H, WF, seed=2)      # (HF, WF)
    WIN1, WIN2 = 24, 32
    r01 = jnp.asarray(block_starts(pos1, WIN1, W))
    r02 = jnp.asarray(block_starts(pos2, WIN2, H))
    pos1j = jnp.asarray(pad_pos(pos1))
    pos2j = jnp.asarray(pad_pos(pos2))

    def cells_chfirst(r):
        """(H, 4, W) f32 cell planes from the raw Bayer frame."""
        h2, w2 = r.shape[0] // 2, r.shape[1] // 2
        return (
            r.reshape(h2, 2, w2, 2)
            .transpose(0, 1, 3, 2)
            .reshape(h2, 4, w2)
            .astype(jnp.float32)
        )

    def two_pass(r):
        src = cells_chfirst(r)                     # (H, 4, W)
        src_t = jnp.transpose(src, (2, 1, 0))      # (W, 4, H)
        mid = banded_pass(src_t, pos1j, r01, WF, WIN1)   # (WF, 4, H)
        mid_t = jnp.transpose(mid, (2, 1, 0))      # (H, 4, WF)
        out = banded_pass(mid_t, pos2j, r02, HF, WIN2)   # (HF, 4, WF)
        return out

    def pass2_only(r):
        src = cells_chfirst(r)[:, :, :WF]
        return banded_pass(src, pos2j, r02, HF, WIN2)

    def transposes_only(r):
        src = cells_chfirst(r)
        return jnp.transpose(jnp.transpose(src, (2, 1, 0)), (2, 1, 0))

    t_all = timeit(two_pass, (raw,), "two-pass warp (ch-on-sublanes, both transposes)")
    timeit(pass2_only, (raw,), "single banded pass (HFxWF out)")
    timeit(transposes_only, (raw,), "cells->f32 + 2 transposes only")

    # numerics vs direct 2-tap separable sampling at the same positions
    out = np.asarray(jax.jit(two_pass)(raw))
    src = np.asarray(jax.jit(cells_chfirst)(raw))  # (H, 4, W)
    i1 = np.floor(pos1).astype(np.int32)
    f1 = pos1 - i1
    src_t = src.transpose(2, 1, 0)  # (W, 4, H)
    g0 = src_t[i1, :, np.arange(H)[None, :]]          # (WF, H, 4)
    g1 = src_t[np.minimum(i1 + 1, W - 1), :, np.arange(H)[None, :]]
    mid_ref = g0 * (1 - f1[..., None]) + g1 * f1[..., None]  # (WF, H, 4)
    i2 = np.floor(pos2).astype(np.int32)
    f2 = pos2 - i2
    mid_t = mid_ref.transpose(1, 0, 2)  # (H, WF, 4)
    h0 = mid_t[i2, np.arange(WF)[None, :]]
    h1 = mid_t[np.minimum(i2 + 1, H - 1), np.arange(WF)[None, :]]
    ref = h0 * (1 - f2[..., None]) + h1 * f2[..., None]  # (HF, WF, 4)
    err = np.abs(out.transpose(0, 2, 1) - ref).max()
    print(f"max abs error vs direct separable 2-tap: {err:.5f}")
    print(f"two-pass total: {t_all:.3f} ms vs ~1.03 ms gather baseline")


if __name__ == "__main__":
    main()
