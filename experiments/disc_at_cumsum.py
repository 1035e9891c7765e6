"""disc_stats_at variants: per-tap gathers vs row-cumsum span taps.

The candidate-local disc statistics (ops/blob.py disc_stats_at) gather all
~|disc| taps per candidate: K=2000, r=4 -> 69 taps -> 138k gather rows of
12 B. TPU gather cost is ~3 ns/index regardless of row bytes
(experiments/resample_lowbyte.py), so this stage is index-rate-bound at
~0.4 ms/camera.

Variant B exploits the disc's row decomposition (like disc_stats_sat, but
candidate-local): one row-cumsum pass over [flat, flat^2] (6 channels,
edge-padded), then each disc row costs TWO taps (hi - lo) -> 2 * (2r+1)
rows * K = 36k gather rows of 24 B. Same math, exact same sums up to fp
associativity of the cumsum (the span sum becomes a difference of two
prefix sums instead of |row| adds).

Run: python experiments/disc_at_cumsum.py

MEASURED (TPU v5e via relay, 432x770x3, K=2000, r=4): per-tap gathers
0.504 ms; row-cumsum variant 1.017 ms — the full-map 6-channel padded
cumsum costs more than the 100k extra gather indices it saves. NEGATIVE
RESULT: disc_stats_at keeps the per-tap form.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vision_processor_tpu.ops import blob as B


def timeit(fn, args, tag, n_lo=8, n_hi=40, reps=3):
    def make(n):
        def scan_fn(x0, *rest):
            def body(carry, _):
                out = fn(carry, *rest)
                bump = sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree.leaves(out))
                return carry + bump * 1e-20, bump
            return jax.lax.scan(body, x0, None, length=n)
        return jax.jit(scan_fn)

    fns = {n: make(n) for n in (n_lo, n_hi)}
    for n in (n_lo, n_hi):
        jax.block_until_ready(fns[n](*args))
    best = []
    for _ in range(reps):
        t = {}
        for n in (n_lo, n_hi):
            t0 = time.perf_counter()
            jax.block_until_ready(fns[n](*args))
            t[n] = time.perf_counter() - t0
        best.append((t[n_hi] - t[n_lo]) / (n_hi - n_lo) * 1e3)
    ms = min(best)
    print(f"{tag:48s} {ms:8.3f} ms   (runs: {', '.join(f'{b:.3f}' for b in best)})")
    return ms


def disc_stats_at_cumsum(flat, iy, ix, radius: int):
    """Row-cumsum variant of disc_stats_at (see module docstring)."""
    r = radius
    h, w = flat.shape[:2]
    offs = B.disc_offsets(r)
    n = len(offs)
    half_w = {int(dy): int(np.max(offs[offs[:, 0] == dy, 1]))
              for dy in range(-r, r + 1)}

    padded = jnp.pad(flat, ((r, r), (r, r + 1), (0, 0)), mode="edge")
    both = jnp.concatenate([padded, padded * padded], axis=-1)  # (.., 6)
    csum = jnp.cumsum(both, axis=1)
    zeros = jnp.zeros_like(csum[:, :1])
    csum = jnp.concatenate([zeros, csum], axis=1)  # (h+2r, w+2r+2, 6)
    wp = csum.shape[1]
    flatc = csum.reshape(-1, 6)

    hws = np.array([half_w[dy] for dy in range(-r, r + 1)], dtype=np.int32)
    dys = np.arange(-r, r + 1, dtype=np.int32)
    yy = iy[:, None] + (dys + r)[None, :]              # (K, 2r+1) padded rows
    hi = (ix[:, None] + (r + hws + 1)[None, :])        # (K, 2r+1)
    lo = (ix[:, None] + (r - hws)[None, :])
    vhi = flatc[(yy * wp + hi).reshape(-1)].reshape(iy.shape[0], 2 * r + 1, 6)
    vlo = flatc[(yy * wp + lo).reshape(-1)].reshape(iy.shape[0], 2 * r + 1, 6)
    acc = jnp.sum(vhi - vlo, axis=1)                   # (K, 6)
    return acc[..., :3], acc[..., 3:], n


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)  # eager poke
    rng = np.random.default_rng(0)
    h, w, k, r = 432, 770, 2000, 4
    flat = jnp.asarray(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))
    iy = jnp.asarray(rng.integers(0, h, k).astype(np.int32))
    ix = jnp.asarray(rng.integers(0, w, k).astype(np.int32))

    # parity
    s1a, s2a, n = jax.jit(B.disc_stats_at, static_argnames="radius")(
        flat, iy, ix, radius=r)
    s1b, s2b, n2 = jax.jit(disc_stats_at_cumsum, static_argnames="radius")(
        flat, iy, ix, radius=r)
    assert n == n2
    e1 = float(jnp.max(jnp.abs(s1a - s1b) / jnp.maximum(jnp.abs(s1a), 1.0)))
    e2 = float(jnp.max(jnp.abs(s2a - s2b) / jnp.maximum(jnp.abs(s2a), 1.0)))
    print(f"rel err s1 {e1:.2e}  s2 {e2:.2e}  (cumsum reassociation)")

    def run_taps(flat, iy, ix):
        return B.disc_stats_at(flat, iy, ix, r)[:2]

    def run_cumsum(flat, iy, ix):
        return disc_stats_at_cumsum(flat, iy, ix, r)[:2]

    timeit(run_taps, (flat, iy, ix), f"per-tap gathers ({k}x{len(B.disc_offsets(r))})")
    timeit(run_cumsum, (flat, iy, ix), f"row-cumsum + 2x{2*r+1} taps")


if __name__ == "__main__":
    main()
