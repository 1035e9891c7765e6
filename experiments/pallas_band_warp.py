"""Pallas banded 1-D warp pass: the two-pass separable resample's inner
loop as a TPU kernel.

Design (vs the failed experiments):
* resample_lowbyte.py: the XLA flat-grid gather is INDEX-RATE-bound
  (~3 ns/index) — byte reduction does not help; only not-gathering does.
* warp2pass.py: the same banded pass as dense jnp ops costs 2.5 ms — the
  per-block scan pays ~30 us/iteration of dispatch + dynamic_slice
  overhead, and unrolled blocks explode compile time.
* ops/pallas_resample.py (round 1): manual row-wise DMA failed to lower
  on the relay's remote Mosaic compiler. THIS kernel needs no manual
  DMA: the source column strip arrives via a regular BlockSpec (reloaded
  only when the col-tile grid index changes) and the per-block window is
  a pl.ds dynamic slice WITHIN VMEM.

Kernel: grid (ch, col_tiles, row_blocks); per program, slice a
(WIN, 128) window from the resident (R, 128) strip at a scalar-prefetched
start row, then accumulate WIN hat-weighted rows into an (8, 128) output
block. pos carries the per-channel quarter-pixel plane offsets.

Run: python experiments/pallas_band_warp.py [interpret]
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 8     # output rows per block
LAN = 128   # lane tile


def _band_kernel(r0_ref, src_ref, pos_ref, out_ref, *, win: int):
    ct = pl.program_id(1)
    rb = pl.program_id(2)
    r0 = r0_ref[rb, ct]
    window = src_ref[0, pl.ds(r0, win), :]            # (win, 128)
    p = pos_ref[0] - r0.astype(jnp.float32)           # (8, 128)
    acc = jnp.zeros((BLK, LAN), jnp.float32)
    for k in range(win):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(p - k))
        acc = acc + w * window[k, :][None, :]
    out_ref[0] = acc


def band_warp_pallas(src, pos, r0, win: int, interpret: bool = False):
    """1-D linear resample along axis 1 of src (ch, R, C) at positions
    pos (ch, n_out_pad, C) with window starts r0 (n_blocks, n_coltiles).

    C and n_out_pad must be multiples of 128 / BLK; host precompute
    guarantees pos[y] - r0[block(y), coltile] in [0, win-2] (window fully
    covers every 2-tap stencil in the block x tile).
    """
    ch, R, C = src.shape
    n_out = pos.shape[1]
    grid = (ch, C // LAN, n_out // BLK)
    return pl.pallas_call(
        functools.partial(_band_kernel, win=win),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, R, LAN), lambda c, ct, rb, r0: (c, 0, ct)),
                pl.BlockSpec((1, BLK, LAN), lambda c, ct, rb, r0: (c, rb, ct)),
            ],
            out_specs=pl.BlockSpec(
                (1, BLK, LAN), lambda c, ct, rb, r0: (c, rb, ct)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((ch, n_out, C), jnp.float32),
        interpret=interpret,
    )(r0, src, pos)


# ---------------------------------------------------------------------------
# host-side precompute + reference
# ---------------------------------------------------------------------------


def pad_to(x, m):
    return ((x + m - 1) // m) * m


def block_starts_2d(pos, win, n_src):
    """(n_blocks, n_coltiles) i32 window starts covering every 2-tap
    stencil of the (BLK, LAN) block; asserts the window suffices."""
    n_out, c = pos.shape
    nb, nt = n_out // BLK, c // LAN
    p = pos.reshape(nb, BLK, nt, LAN)
    lo = np.floor(p.min(axis=(1, 3))).astype(np.int64)
    hi = np.ceil(p.max(axis=(1, 3))).astype(np.int64) + 1
    span = int((hi - lo).max())
    assert span <= win - 1, f"window {win} too small for span {span}+1"
    return np.clip(lo, 0, n_src - win).astype(np.int32)


def reference(src, pos):
    """Direct 2-tap resample (numpy)."""
    ch, R, C = src.shape
    i = np.clip(np.floor(pos).astype(np.int64), 0, R - 2)
    f = (pos - i).astype(np.float32)
    cc = np.arange(C)[None, :]
    out = np.empty((ch, pos.shape[1], C), np.float32)
    for c in range(ch):
        g0 = src[c][i[c], cc]
        g1 = src[c][i[c] + 1, cc]
        out[c] = g0 * (1 - f[c]) + f[c] * g1
    return out


def timeit(fn, args, tag, n_lo=8, n_hi=40, reps=3):
    def make(n):
        def scan_fn(x0, *rest):
            def body(carry, _):
                out = fn(carry, *rest)
                # abs-sum consumption: the warp is LINEAR in the input, so
                # a plain scalar-sum readout lets XLA fold the whole
                # pipeline into a precomputed weight map (the documented
                # measurement trap — see experiments/disc_planar.py); abs
                # is nonlinear and forces every element to materialize
                bump = jnp.sum(jnp.abs(out))
                nxt = jnp.roll(carry, 2, axis=1)
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
    interpret = len(sys.argv) > 1 and sys.argv[1] == "interpret"
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)

    # pass-2 shape: (4, 720, 896) -> (4, 440, 896), factor-1.25 camera
    CH, R, C = 4, 720, pad_to(770, LAN)
    NOUT = pad_to(432, BLK)
    WIN = 16

    src = rng.integers(0, 256, (CH, R, C)).astype(np.float32)
    base = np.linspace(1.0, R - 3.0, NOUT)
    bend = np.sin(np.linspace(0, np.pi, C)) * 4.0
    pos = np.clip(
        base[:, None] + bend[None, :] * (base[:, None] / R - 0.5),
        1.0, R - 3.0,
    ).astype(np.float32)
    # per-channel plane offsets (vertical): R/G1 rows at +0, G2/B at +0.25
    pos4 = np.stack([pos, pos, pos + 0.25, pos + 0.25]).astype(np.float32)
    r0 = block_starts_2d(pos, WIN, R)  # offsets < 1 don't change the span bound
    srcj = jnp.asarray(src)
    posj = jnp.asarray(pos4)
    r0j = jnp.asarray(r0)

    if interpret:
        out = np.asarray(band_warp_pallas(srcj, posj, r0j, WIN, interpret=True))
        ref = reference(src, pos4)
        err = np.abs(out - ref).max()
        print(f"interpret max abs err: {err:.5f}")
        return

    fn = lambda s: band_warp_pallas(s, posj, r0j, WIN)
    out = np.asarray(jax.jit(fn)(srcj))
    ref = reference(src, pos4)
    err = np.abs(out - ref).max()
    print(f"max abs err vs direct 2-tap: {err:.5f}")
    timeit(fn, (srcj,), f"pallas banded pass (4,{R},{C})->(4,{NOUT},{C}) win={WIN}")

    # --- full two-pass chain on a raw Bayer frame, production shapes ---
    H, W = 720, 960          # cell grid of a 1440x1920 raw
    HF, WF = 432, 770        # factor 1.25 flat grid
    Hp, WFp = pad_to(H, LAN), pad_to(WF, LAN)
    NO1, NO2 = pad_to(WF, BLK), pad_to(HF, BLK)
    raw = jnp.asarray(rng.integers(0, 256, (2 * H, 2 * W), dtype=np.uint8))

    # synthetic smooth separable maps (timing-shape realistic)
    b1 = np.linspace(1.0, W - 3.0, NO1)
    pos1 = np.clip(
        b1[:, None] + (np.sin(np.linspace(0, np.pi, Hp)) * 4.0)[None, :]
        * (b1[:, None] / W - 0.5), 1.0, W - 3.0).astype(np.float32)
    b2 = np.linspace(1.0, H - 3.0, NO2)
    pos2 = np.clip(
        b2[:, None] + (np.sin(np.linspace(0, np.pi, WFp)) * 4.0)[None, :]
        * (b2[:, None] / H - 0.5), 1.0, H - 3.0).astype(np.float32)
    pos1_4 = jnp.asarray(np.stack([pos1, pos1 + 0.25, pos1, pos1 + 0.25]))
    pos2_4 = jnp.asarray(np.stack([pos2, pos2, pos2 + 0.25, pos2 + 0.25]))
    r01 = jnp.asarray(block_starts_2d(pos1, WIN, W))
    r02 = jnp.asarray(block_starts_2d(pos2, WIN, H))

    def cells_chfirst_t(r):
        """(4, W, Hp) f32: channel-first cells, transposed for pass 1.

        Naive u8 reshape/transpose costs 1.4 ms (u8 minor-dim relayout
        pathology); this packs each Bayer cell into one u32 word first
        (cheap bitcasts, like frame.corner_stack_u32), transposes at u32
        granularity, and byte-unpacks with shifts after."""
        h2, w2 = r.shape[0] // 2, r.shape[1] // 2
        r4 = r.reshape(h2, 2, r.shape[1])
        top16 = jax.lax.bitcast_convert_type(
            r4[:, 0].reshape(h2, w2, 2), jnp.uint16)
        bot16 = jax.lax.bitcast_convert_type(
            r4[:, 1].reshape(h2, w2, 2), jnp.uint16)
        w32 = top16.astype(jnp.uint32) | (bot16.astype(jnp.uint32) << 16)
        w32t = jnp.pad(w32.T, ((0, 0), (0, Hp - h2)))  # (W, Hp) u32
        return jnp.stack(
            [
                (w32t & 0xFF),
                ((w32t >> 8) & 0xFF),
                ((w32t >> 16) & 0xFF),
                (w32t >> 24),
            ]
        ).astype(jnp.float32)

    def two_pass_full(r):
        src1 = cells_chfirst_t(r)                      # (4, W, Hp)
        mid = band_warp_pallas(src1, pos1_4, r01, WIN)  # (4, NO1, Hp)
        mid_t = jnp.transpose(mid, (0, 2, 1))[:, :H]    # (4, H, NO1)
        mid_t = jnp.pad(mid_t, ((0, 0), (0, 0), (0, WFp - NO1)))
        out = band_warp_pallas(mid_t, pos2_4, r02, WIN)  # (4, NO2, WFp)
        # dRGB like rgb_to_drgb: r-g, b-g, (r+b)/2 - g on the RGGB planes
        rr, g1, g2, bb = out[0], out[1], out[2], out[3]
        g = (g1 + g2) * 0.5
        return jnp.stack([rr - g, bb - g, (rr + bb) * 0.5 - g], axis=-1)[
            :HF, :WF
        ]

    timeit(two_pass_full, (raw,),
           "FULL two-pass: cells+transposes+2 pallas passes+dRGB")
    timeit(cells_chfirst_t, (raw,), "  cells_chfirst_t alone")


if __name__ == "__main__":
    main()
