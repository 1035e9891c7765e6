"""Micro-profile finalize_batched's sub-steps on the real TPU.

setcost_ablate.py prices finalize_batched at ~0.83 ms/frame-set (factor
1.0, 4 cameras) — the largest per-set fixed cost. This splits it:

  nms        : vmapped greedy clipping_nms (sequential fori_loop)
  ballclip   : vmapped bot_ball_clipping + mask
  ids        : vmap(estimate_bot_ids) (24-iter unrolled guarded 2-means)
  summary    : the summary dict construction

Shapes mirror the production config (n_cams=4, max_bots=64,
max_blobs=2000) with a realistic validity pattern (16 valid bots).

Run: python experiments/finalize_micro.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vision_processor_tpu.models import detector as D
    from vision_processor_tpu.models.colors import ColorState

    _ = np.asarray(jnp.ones((8, 128)) * 2.0)

    n_cams, b, k = 4, 64, 2000
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.uniform(-3000, 3000, (n_cams, b, 2)).astype(np.float32))
    orient = jnp.asarray(rng.uniform(-3, 3, (n_cams, b)).astype(np.float32))
    score = jnp.asarray(
        np.sort(rng.uniform(0, 5, (n_cams, b)).astype(np.float32))[:, ::-1].copy()
    )
    valid = jnp.asarray(np.arange(b)[None, :] < 16).astype(bool) & jnp.ones(
        (n_cams, 1), bool
    )
    bpos = jnp.asarray(rng.uniform(-3000, 3000, (n_cams, k, 2)).astype(np.float32))
    bvalid = jnp.asarray(np.arange(k)[None, :] < 120) & jnp.ones((n_cams, 1), bool)
    bcolor = jnp.asarray(rng.uniform(0, 255, (n_cams, k, 3)).astype(np.float32))
    blob_idx = jnp.asarray(
        rng.integers(0, 120, (n_cams, b, 5)).astype(np.int32)
    )
    colors7 = jnp.asarray(np.stack([ColorState().packed()] * n_cams))
    tol = jnp.full((n_cams,), 10.0, jnp.float32)
    rad = jnp.full((n_cams,), 21.5, jnp.float32)

    def scan_time(fn, args, tag, n_lo=20, n_hi=100):
        def make(n):
            def sf(a0, *rest):
                def body(c, _):
                    out = fn(c, *rest)
                    bump = sum(
                        jnp.sum(l.astype(jnp.float32))
                        for l in jax.tree.leaves(out)
                    )
                    return c + bump * 1e-20, bump
                return jax.lax.scan(body, a0, None, length=n)
            return jax.jit(sf)
        fns = {n: make(n) for n in (n_lo, n_hi)}
        for n in (n_lo, n_hi):
            jax.block_until_ready(fns[n](*args))
        best = []
        for _ in range(3):
            ts = {}
            for n in (n_lo, n_hi):
                t0 = time.perf_counter()
                jax.block_until_ready(fns[n](*args))
                ts[n] = time.perf_counter() - t0
            best.append((ts[n_hi] - ts[n_lo]) / (n_hi - n_lo) * 1e3)
        print(f"{tag:44s} {min(best):7.3f} ms  "
              f"(runs: {', '.join(f'{x:.3f}' for x in best)})")

    def nms(seed, pos, orient, score, valid, tol):
        return jax.vmap(D.clipping_nms)(pos + seed * 0, orient, score, valid, tol)

    def ballclip(seed, pos, orient, bpos, rad, tol):
        def one(p, o, bp, r, t):
            return D.bot_ball_clipping(p, o, bp, r, t)
        return jax.vmap(one)(pos + seed * 0, orient, bpos, rad, tol)

    def ids(seed, blob_idx, bcolor, colors7):
        det = {"bot_blob_idx": blob_idx,
               "bot_tracked_id": jnp.full((n_cams, b), -1, jnp.int32),
               "bot_valid": valid}
        return jax.vmap(D.estimate_bot_ids)(
            jax.tree.map(lambda x: x, det), bcolor + seed * 0, colors7
        )

    seed = jnp.float32(0.0)
    scan_time(nms, (seed, pos, orient, score, valid, tol), "vmapped clipping_nms")
    scan_time(ballclip, (seed, pos, orient, bpos, rad, tol), "vmapped bot_ball_clipping")
    scan_time(ids, (seed, blob_idx, bcolor, colors7), "vmap(estimate_bot_ids)")


if __name__ == "__main__":
    main()
