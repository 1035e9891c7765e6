"""XLA gather lowering micro-variants: can we beat 7ns/index?"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

H, W = 540, 960
N = 540 * 962  # index count (one per flat pixel)


def timeit(fn, args, tag, n_lo=5, n_hi=25):
    def make(n):
        def scan_fn(*a):
            # carry = the index array; rotate it each step so the gather
            # cannot be hoisted or folded
            def body(idx, _):
                out = fn(a[0], idx)
                bump = jnp.sum(out.astype(jnp.float32))
                nxt = jax.tree.map(
                    lambda i: (i + 1) % jnp.asarray(7, i.dtype) + i // jnp.asarray(7, i.dtype) * 0 + (i & 0) + (i * 0 + 1) * (i % jnp.asarray(997, i.dtype)), idx)
                return nxt, bump
            return jax.lax.scan(body, a[1], None, length=n)
        return jax.jit(scan_fn)

    times = {}
    for n in (n_lo, n_hi):
        f = make(n)
        out = f(*args); jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(*args); jax.block_until_ready(out)
        times[n] = time.perf_counter() - t0
    ms = (times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1e3
    print(f"{tag:44s} {ms:8.3f} ms")
    return ms


def main():
    # force the relay out of deferred mode with one real fetch
    _ = np.asarray(jnp.ones((8, 128)) * 2.0)
    rng = np.random.default_rng(0)
    stacked = jnp.asarray(
        rng.integers(0, 256, (H, W, 16)).astype(np.float32), jnp.bfloat16)
    # smooth, monotone index maps like real reprojection
    jj = (np.arange(962) * 0.997).astype(np.int32) % (W - 1)
    ii = (np.arange(540) * 0.999).astype(np.int32) % (H - 1)
    y0 = jnp.asarray(np.broadcast_to(ii[:, None], (540, 962)).copy())
    x0 = jnp.asarray(np.broadcast_to(jj[None, :], (540, 962)).copy())
    lin = (y0 * W + x0).reshape(-1)

    flat2 = stacked.reshape(-1, 16)

    timeit(lambda s, i: jnp.take(s, i, axis=0), (flat2, lin),
           "take rows (H*W,16) bf16 [current]")
    timeit(lambda s, i: jnp.take(s, i, axis=0),
           (stacked.reshape(-1, 16).astype(jnp.float32), lin),
           "take rows (H*W,16) f32")
    timeit(lambda s, i: jnp.take(s, i, axis=0),
           (stacked.reshape(-1, 16).astype(jnp.int8), lin),
           "take rows (H*W,16) int8")
    timeit(lambda s, i: jnp.take(s.reshape(-1, 4), i, axis=0),
           (stacked[..., :4].reshape(-1, 4), lin), "take rows (H*W,4) bf16")
    timeit(lambda s, i: jnp.take(s.reshape(-1), i, axis=0),
           (stacked[..., 0].reshape(-1), lin), "take scalar (H*W,) bf16")
    timeit(lambda s, i: jnp.take(s, i, axis=0),
           (stacked.reshape(-1, 128)[: H * W // 8],
            (lin // 8)), "take rows (H*W/8,128) bf16 (8px-packed)")

    # 2D gather via lax.gather with slice (1,1,16)
    def g2d(s, yx):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0, 1),
            start_index_map=(0, 1))
        return jax.lax.gather(s, yx, dn, slice_sizes=(1, 1, 16),
                              mode=jax.lax.GatherScatterMode.CLIP)
    yx = jnp.stack([y0.reshape(-1), x0.reshape(-1)], axis=-1)
    timeit(g2d, (stacked, yx), "lax.gather 2D idx slice (1,1,16) bf16")

    n8 = H * W
    si8 = stacked.astype(jnp.int8)
    timeit(lambda s, i: jnp.take(s, i, axis=0),
           (si8.reshape(-1, 16)[: n8 // 2].reshape(-1, 32), lin // 2),
           "take rows (H*W/2,32) int8 (2px packed)")
    timeit(lambda s, i: jnp.take(s, i, axis=0),
           (si8.reshape(-1, 16)[: n8 // 4].reshape(-1, 64), lin // 4),
           "take rows (H*W/4,64) int8 (4px packed)")
    timeit(lambda s, i: jnp.take(s, i, axis=0),
           (si8.reshape(-1, 16)[: n8 // 8].reshape(-1, 128), lin // 8),
           "take rows (H*W/8,128) int8 (8px packed)")
    timeit(lambda s, i: jnp.take(s, i, axis=0),
           (jax.lax.bitcast_convert_type(
                si8.reshape(-1, 4, 4), jnp.int32).reshape(-1, 4), lin),
           "take rows (H*W,4) u32-bitcast-packed")
    timeit(lambda s, i: jnp.take(s, i, axis=0),
           (si8.reshape(-1, 8), jnp.concatenate([lin * 2, lin * 2 + 1])),
           "2x indices (H*W,8) int8 (split gather)")

    # one-hot matmul row-gather per flat row: out[i, j] = img[y, x0[j]] ...
    # full-row interpretation: for each flat row, gather row y0 then shift?
    # (row-gather: 540 indices only, then per-row lane shifts via onehot mm)
    def rowgather(s, y_rows):
        # gather the needed image rows (540 idx): (540, W*16)
        rows = jnp.take(s.reshape(H, W * 16), y_rows, axis=0)
        return rows  # stop here: row gather cost only
    timeit(rowgather, (stacked, jnp.asarray(ii)),
           "row gather only (540 idx of 15360 lanes)")


if __name__ == "__main__":
    main()
