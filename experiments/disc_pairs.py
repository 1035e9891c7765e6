"""disc_stats_at with pair-packed gather rows: 29 -> 18 indices/candidate.

If TPU gather cost is index-rate-bound (~3 ns/index), fetching TWO
adjacent pixels per index via an (H, W/2, 6) pair view should cut the
candidate disc-statistics cost ~1.6x at r=3. Each disc row's span
[x-hw, x+hw] (odd width) is covered by hw+1 pairs with exactly one
surplus pixel — the last pair's second pixel when the span starts even,
the first pair's first pixel when odd — subtracted after the gather.
Counter-signal: the round-2 resampling experiments saw NO gain from
8-px-packed rows (PERFORMANCE.md "gather lowering facts"), so this
measures whether small-row gathers behave differently.

Run: python experiments/disc_pairs.py

MEASURED (TPU v5e via relay, K=2000): r=3 per-tap 0.26 ms vs pair-packed
0.94 ms; r=4 per-tap 0.54 vs 1.50. NEGATIVE RESULT by 3.5x — wider
(24-byte, 6-channel) gather rows cost far more than the halved index
count saves, consistent with round 2's "8-px-packed rows: no gain". The
12-byte per-tap row is the sweet spot; disc_stats_at stays as is.
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
    print(f"{tag:52s} {ms:8.3f} ms   (runs: {', '.join(f'{b:.3f}' for b in best)})")
    return ms


def disc_stats_at_pairs(flat, iy, ix, radius: int):
    """Pair-packed variant of B.disc_stats_at (same results, fp-exact for
    s1; s2 differs only by subtraction of the surplus square, exact)."""
    r = radius
    h, w = flat.shape[:2]
    offs = B.disc_offsets(r)
    n = len(offs)
    half_w = {int(dy): int(np.max(offs[offs[:, 0] == dy, 1]))
              for dy in range(-r, r + 1)}
    pad = r + 1 + ((w + 2 * (r + 1)) % 2)  # left pad; keep padded width even
    padded = jnp.pad(flat, ((r, r), (pad, pad + 2), (0, 0)), mode="edge")
    wp = padded.shape[1]
    wp2 = wp // 2
    pairs = padded.reshape(h + 2 * r, wp2, 6)
    pflat = pairs.reshape(-1, 6)

    kcand = iy.shape[0]
    s1 = jnp.zeros((kcand, 3), jnp.float32)
    s2 = jnp.zeros((kcand, 3), jnp.float32)
    for dy in range(-r, r + 1):
        hw = half_w[dy]
        yy = iy + (dy + r)
        s = ix - hw + pad                     # padded start, >= 1
        ps = s // 2
        even = (s % 2) == 0
        base = yy * wp2
        acc1 = jnp.zeros((kcand, 3), jnp.float32)
        acc2 = jnp.zeros((kcand, 3), jnp.float32)
        first = last = None
        for j in range(hw + 1):
            v = pflat[base + ps + j]          # (K, 6): [even px, odd px]
            if j == 0:
                first = v
            if j == hw:
                last = v
            acc1 = acc1 + v[:, :3] + v[:, 3:]
            acc2 = acc2 + v[:, :3] ** 2 + v[:, 3:] ** 2
        surplus = jnp.where(even[:, None], last[:, 3:], first[:, :3])
        s1 = s1 + acc1 - surplus
        s2 = s2 + acc2 - surplus**2
    return s1, s2, n


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    for (h, w, r) in ((432, 770, 3), (540, 962, 4)):
        kcand = 2000
        flat = jnp.asarray(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))
        iy = jnp.asarray(rng.integers(0, h, kcand).astype(np.int32))
        ix = jnp.asarray(rng.integers(0, w, kcand).astype(np.int32))

        s1a, s2a, n = jax.jit(B.disc_stats_at, static_argnames="radius")(
            flat, iy, ix, radius=r)
        s1b, s2b, n2 = jax.jit(disc_stats_at_pairs, static_argnames="radius")(
            flat, iy, ix, radius=r)
        assert n == n2
        e1 = float(jnp.max(jnp.abs(s1a - s1b)))
        e2 = float(jnp.max(jnp.abs(s2a - s2b) / jnp.maximum(jnp.abs(s2a), 1.0)))
        print(f"h={h} w={w} r={r}: abs err s1 {e1:.2e}, rel err s2 {e2:.2e}")

        taps = len(B.disc_offsets(r))
        pairs = sum(int(np.max(B.disc_offsets(r)[B.disc_offsets(r)[:, 0] == dy, 1])) + 1
                    for dy in range(-r, r + 1))
        timeit(lambda f, a, b: B.disc_stats_at(f, a, b, r)[:2],
               (flat, iy, ix), f"per-tap ({kcand}x{taps})")
        timeit(lambda f, a, b: disc_stats_at_pairs(f, a, b, r)[:2],
               (flat, iy, ix), f"pair-packed ({kcand}x{pairs})")


if __name__ == "__main__":
    main()
