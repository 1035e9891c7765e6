"""Candidate-neighbor fetch alternatives for scored extraction.

The final-build dense trace attributes 0.067 ms/camera to the 10k-index
circ neighbor gather (5 cross taps x 2000 candidates,
ops/blob.extract_blobs_scored) — the largest single fusion left in the
program. Gather cost on TPU scales with INDEX COUNT (PERFORMANCE.md
gather facts), so the candidates are:

  a) current: one gather of 10k scalar f32 taps;
  b) row-fetch: gather 4-lane f32 rows at (y, x-1) from a (H, W) map —
     one index covers x-1..x+2, so the horizontal taps collapse and the
     vertical taps are 2 more gathers: 6k indices, 16B rows;
  c) 3-row fetch from an (H, W, 4)-lane pre-window: pure index-count
     probe for the floor;
  d) in-kernel emission: extend blob_response_fused to also write
     subpixel dx/dy maps (neighbors are already VMEM-resident in the
     band kernel) and gather 2 maps x 2k indices = 4k taps. Estimated
     here by timing (a)'s pattern with 4k indices.

Run on TPU: python experiments/neighbor_gather.py

Result (TPU v5e, 2026-08-20, matches the traced 0.067 ms for (a)):

  (a) 5 scalar taps, 10k indices      0.069 ms
  (b) 3x 4-lane rows, 6k indices      0.023 ms
  (d) 2 maps x 2k taps, 4k indices    0.016 ms

Either restructure is worth ~0.05 ms/camera (~0.2 ms/frame-set); (d)
additionally moves the subpixel-peak math into the band kernel where the
neighbors are already VMEM-resident. Left for the next round so the
round-5 benchmark series stays on one build.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(fn, args, tag, n_lo=10, n_hi=50, reps=3):
    def make(n):
        def scan_fn(idx0, *rest):
            def body(carry, _):
                out = fn(carry, *rest)
                bump = sum(jnp.sum(o.astype(jnp.float32))
                           for o in jax.tree.leaves(out))
                return (carry + 37) % (rest[-1]), bump
            return jax.lax.scan(body, idx0, None, length=n)
        return jax.jit(scan_fn)

    fns = {n: make(n) for n in (n_lo, n_hi)}
    for n in (n_lo, n_hi):
        jax.block_until_ready(fns[n](*args))
    best = []
    for _ in range(reps):
        ts = {}
        for n in (n_lo, n_hi):
            t0 = time.perf_counter()
            jax.block_until_ready(fns[n](*args))
            ts[n] = time.perf_counter() - t0
        best.append((ts[n_hi] - ts[n_lo]) / (n_hi - n_lo) * 1e3)
    ms = min(best)
    print(f"{tag:52s} {ms:8.3f} ms  "
          f"(runs: {', '.join(f'{b:.3f}' for b in best)})", flush=True)
    return ms


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    h, w, k = 432, 770, 2000
    circ = jnp.asarray(rng.normal(size=(h, w)), jnp.float32)
    flat = circ.reshape(-1)
    n_flat = jnp.int32(h * w - 2 * w - 2)

    idx0 = jnp.asarray(rng.integers(w + 1, h * w - w - 1, k), jnp.int32)

    def taps5(idx, circm, nf):
        iy = idx // w
        ix = idx % w
        nidx = jnp.stack([
            iy * w + ix,
            iy * w + jnp.maximum(ix - 1, 0),
            iy * w + jnp.minimum(ix + 1, w - 1),
            jnp.maximum(iy - 1, 0) * w + ix,
            jnp.minimum(iy + 1, h - 1) * w + ix,
        ], axis=-1)
        return circm.reshape(-1)[nidx.reshape(-1)].reshape(-1, 5)

    # (b) row fetch: (H, W) viewed as rows; slice_sizes>1 gathers are
    # catastrophic on TPU (PERFORMANCE.md), so emulate via a (H*W//4, 4)
    # lane view with aligned starts — an index-count probe, not exact taps
    lanes4 = circ.reshape(h * w // 4, 4)

    def rows3(idx, _circm, nf):
        base = idx // 4
        up = jnp.maximum(base - w // 4, 0)
        dn = jnp.minimum(base + w // 4, h * w // 4 - 1)
        g = jnp.concatenate([lanes4[base], lanes4[up], lanes4[dn]], axis=-1)
        return g

    def taps2(idx, circm, nf):
        iy = idx // w
        ix = idx % w
        nidx = jnp.stack([iy * w + ix,
                          jnp.maximum(iy - 1, 0) * w + ix], axis=-1)
        return circm.reshape(-1)[nidx.reshape(-1)].reshape(-1, 2)

    timeit(taps5, (idx0, circ, n_flat), "(a) 5 scalar taps, 10k indices")
    timeit(rows3, (idx0, circ, n_flat), "(b/c) 3x 4-lane rows, 6k indices")
    timeit(taps2, (idx0, circ, n_flat), "(d) 2 maps x 2k taps (4k indices)")


if __name__ == "__main__":
    main()
