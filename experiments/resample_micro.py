"""Micro-profile of the cached-grid resample sub-stages on the real TPU."""
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
    print(f"{tag:52s} {ms:8.3f} ms")
    return ms


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (2 * H, 2 * W), dtype=np.uint8))
    idx = jnp.asarray(
        rng.integers(0, H * W, (HF, WF)).astype(np.int32))
    ub = jnp.asarray(rng.uniform(0, 1, (HF, WF)).astype(np.float32))
    vb = jnp.asarray(rng.uniform(0, 1, (HF, WF)).astype(np.float32))
    grid = {"idx": idx, "ub": ub, "vb": vb}

    timeit(lambda r: F.raw2planes_packed(r, "RGGB"), (raw,),
           "raw2planes_packed (reshape+transpose)")
    timeit(lambda r: F.corner_stack(F.raw2planes_packed(r, "RGGB")), (raw,),
           "+ corner_stack (u8, 16 lanes)")

    def gather_only(r):
        stacked = F.corner_stack(F.raw2planes_packed(r, "RGGB")).reshape(-1, 16)
        return jnp.take(stacked, idx, axis=0)

    timeit(gather_only, (raw,), "+ gather (u8x16, 519k idx)")

    def gather_f32(r):
        return gather_only(r).astype(jnp.float32)

    timeit(gather_f32, (raw,), "+ widen f32")

    timeit(lambda r: F.resample_flat_grid(
        F.raw2planes_packed(r, "RGGB"), grid, "RGGB"), (raw,),
        "+ lerp + combine + dRGB (full cached)")

    # variant: fold the 0.5 g-plane average into the lerp weights? baseline:
    # lerp in bf16 (weights+samples), output f32
    def lerp_bf16(r):
        stacked = F.corner_stack(F.raw2planes_packed(r, "RGGB")).reshape(-1, 16)
        g = jnp.take(stacked, idx, axis=0).astype(jnp.bfloat16)
        g00, g01, g10, g11 = g[..., 0:4], g[..., 4:8], g[..., 8:12], g[..., 12:16]
        offs = jnp.asarray(F._PLANE_OFFSETS["RGGB"], dtype=jnp.float32)
        fx = jnp.clip(ub[..., None] + offs[:, 0], 0.0, 1.0).astype(jnp.bfloat16)
        fy = jnp.clip(vb[..., None] + offs[:, 1], 0.0, 1.0).astype(jnp.bfloat16)
        top = g00 * (1 - fx) + g01 * fx
        bot = g10 * (1 - fx) + g11 * fx
        s = (top * (1 - fy) + bot * fy).astype(jnp.float32)
        r_, gg, b = F.combine_planes(s, "RGGB")
        return F.rgb_to_drgb(r_, gg, b)

    timeit(lerp_bf16, (raw,), "full cached, bf16 lerp")


if __name__ == "__main__":
    main()
