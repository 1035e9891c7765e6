"""Split disc_stats_sat cost: lane cumsum vs span adds vs stat maps."""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vision_processor_tpu.ops import blob as B

H, W = 540, 962
R = 4


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


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
    grad = jnp.asarray(rng.normal(0, 100, (H, W)).astype(np.float32))

    def pad_both(f):
        p = jnp.pad(f, ((R, R), (R, R + 1), (0, 0)), mode="edge")
        return jnp.concatenate([p, p * p], axis=-1)

    def cumsum_only(f):
        return jnp.cumsum(pad_both(f), axis=1)

    def full(f):
        return B.disc_stats_sat(f, R)

    def cumsum_axis0(f):
        # same data volume, scan on the sublane dim for comparison
        return jnp.cumsum(pad_both(f), axis=0)

    def grad_sat(g):
        return B.summed_area_table(g)

    def grad_sat_axis0_only(g):
        return jnp.cumsum(g, axis=0)

    def grad_sat_axis1_only(g):
        return jnp.cumsum(g, axis=1)

    timeit(pad_both, (flat,), "pad + square + concat (6ch)")
    timeit(cumsum_only, (flat,), "+ lane-dim cumsum (axis=1)")
    timeit(cumsum_axis0, (flat,), "+ sublane cumsum (axis=0) [alt]")
    timeit(full, (flat,), "full disc_stats_sat")
    timeit(grad_sat, (grad,), "gradient SAT (both cumsums, 1ch)")
    timeit(grad_sat_axis0_only, (grad,), "gradient cumsum axis=0 only")
    timeit(grad_sat_axis1_only, (grad,), "gradient cumsum axis=1 only")


if __name__ == "__main__":
    main()
