"""Pallas corner-stack build: can a VMEM kernel beat XLA's concat relayout?

The per-frame corner stack (ops/frame.corner_stack) costs ~0.8-1.0 ms/cam
in XLA: three u8 concats + a 4->16 lane relayout, all via HBM round trips.
A Pallas kernel does the shifts/interleave in VMEM with one HBM read and
one write.

Run: python experiments/pallas_stack.py [interpret]
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

from vision_processor_tpu.ops import frame as F

H, W = 540, 960
INTERPRET = len(sys.argv) > 1 and sys.argv[1] == "interpret"


def _kernel_rows(p_ref, pnext_ref, o_ref, *, last_block_rows):
    """Row-blocked: p_ref (B, 4W) u8 block i, pnext_ref = block i+1 (clamped).

    o_ref (B, 16W) u8: per cell x, lanes [cell, right, down, down-right]x4.
    The last grid block may be partial (rows >= last_block_rows are padding,
    masked on write): its down-shift replicates the final REAL row.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    a = p_ref[...]  # (B, 4W)
    b_first = pnext_ref[0:1, :]  # first row of the next block
    is_last = i == n - 1
    edge_row = a[last_block_rows - 1 : last_block_rows, :]
    next_row = jnp.where(is_last, edge_row, b_first)

    def xshift(v):
        return jnp.concatenate([v[:, 4:], v[:, -4:]], axis=1)

    down = jnp.concatenate([a[1:, :], next_row], axis=0)
    # in the (padded) last block, the final real row's down-shift must
    # replicate itself, not read the padding row after it
    row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    down = jnp.where(is_last & (row == last_block_rows - 1), edge_row, down)
    right = xshift(a)
    down_right = xshift(down)

    bb = a.shape[0]
    quad = jnp.stack(
        [
            a.reshape(bb, W, 4),
            right.reshape(bb, W, 4),
            down.reshape(bb, W, 4),
            down_right.reshape(bb, W, 4),
        ],
        axis=-2,
    )  # (B, W, 4, 4)
    o_ref[...] = quad.reshape(bb, 16 * W)


def corner_stack_pallas(packed2d: jnp.ndarray, block_rows: int = 64):
    """packed2d: (H, 4W) u8 -> (H, 16W) u8 corner stack."""
    h = packed2d.shape[0]
    n = -(-h // block_rows)
    last_rows = h - (n - 1) * block_rows
    kern = functools.partial(_kernel_rows, last_block_rows=last_rows)
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((block_rows, 4 * W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 4 * W),
                         lambda i: (jnp.minimum(i + 1, n - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, 16 * W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, 16 * W), jnp.uint8),
        interpret=INTERPRET,
    )(packed2d, packed2d)


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
    if INTERPRET:
        jax.config.update("jax_platforms", "cpu")
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (2 * H, 2 * W), dtype=np.uint8))

    packed = F.raw2planes_packed(raw, "RGGB").astype(jnp.uint8)
    p2d = packed.reshape(H, 4 * W)

    ref = np.asarray(F.corner_stack(packed)).reshape(H, 16 * W)
    got = np.asarray(corner_stack_pallas(p2d))
    err = np.max(np.abs(ref.astype(np.int32) - got.astype(np.int32)))
    print("correctness max diff:", err)
    assert err == 0

    if INTERPRET:
        print("interpret-mode semantics OK")
        return

    timeit(lambda r: F.corner_stack(F.raw2planes_packed(r, "RGGB")), (raw,),
           "XLA corner_stack")
    timeit(lambda r: corner_stack_pallas(
        F.raw2planes_packed(r, "RGGB").astype(jnp.uint8).reshape(H, 4 * W)),
        (raw,), "pallas corner_stack")

    # and the full cached-grid resample with the pallas stack
    x0 = rng.integers(0, W - 1, (H, 962)).astype(np.int32)
    y0 = rng.integers(0, H - 1, (H, 962)).astype(np.int32)
    grid = {
        "idx": jnp.asarray(y0 * W + x0),
        "ub": jnp.asarray(rng.uniform(0, 1, (H, 962)).astype(np.float32)),
        "vb": jnp.asarray(rng.uniform(0, 1, (H, 962)).astype(np.float32)),
    }

    def full_pallas(r):
        p = F.raw2planes_packed(r, "RGGB").astype(jnp.uint8)
        stacked = corner_stack_pallas(p.reshape(H, 4 * W)).reshape(-1, 16)
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

    def full_xla(r):
        return F.resample_flat_grid(F.raw2planes_packed(r, "RGGB"), grid, "RGGB")

    a = np.asarray(full_xla(raw))
    b = np.asarray(full_pallas(raw))
    print("full-path max diff:", np.max(np.abs(a - b)))
    timeit(full_xla, (raw,), "full cached resample, XLA stack")
    timeit(full_pallas, (raw,), "full cached resample, pallas stack")


if __name__ == "__main__":
    main()
