"""A/B: query_select_topk Pallas kernel vs XLA fallback at the DENSE
full-window shapes (A=512 anchors x 2000 blobs, m=8; tracked 160 x 2000,
m=3). The round-3 aggregate verdict (Pallas topk OFF by default) was
measured on the sparse path where the anchor tier keeps A=128; the dense
window re-reads a 4 MB score map per argmax pass, which is where a fused
kernel should win.

Run: python experiments/ring_select_ab.py
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
        def scan_fn(q0, *rest):
            def body(carry, _):
                out = fn(carry, *rest)
                bump = sum(jnp.sum(o.astype(jnp.float32))
                           for o in jax.tree.leaves(out))
                return jnp.roll(carry, 1, axis=0) + 1e-3, bump
            return jax.lax.scan(body, q0, None, length=n)
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
    print(f"{tag:56s} {ms:8.3f} ms  "
          f"(runs: {', '.join(f'{b:.3f}' for b in best)})", flush=True)
    return ms


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    from vision_processor_tpu.ops import topk as T

    rng = np.random.default_rng(0)
    k = 2000
    blob_xy = jnp.asarray(rng.uniform(-4500, 4500, (k, 2)), jnp.float32)
    rank = jnp.asarray(rng.uniform(0, 1000, (k,)), jnp.float32)

    for q, m, by_rank, tag in ((512, 8, True, "ring A=512"),
                               (160, 3, False, "tracked T*5=160")):
        qxy = jnp.asarray(rng.uniform(-4500, 4500, (q, 2)), jnp.float32)
        r2 = jnp.broadcast_to(jnp.float32(90.0 * 90.0), (q,))

        def xla(qv, bxy, rk):
            return T.query_select_topk(qv, r2, bxy, rk, m=m,
                                       by_rank=by_rank)

        def pallas(qv, bxy, rk):
            return T.query_select_topk(qv, r2, bxy, rk, m=m,
                                       by_rank=by_rank, interpret=False,
                                       force_pallas=True)

        # correctness first
        v1, i1 = jax.device_get(jax.jit(xla)(qxy, blob_xy, rank))
        v2, i2 = jax.device_get(jax.jit(pallas)(qxy, blob_xy, rank))
        ok = np.array_equal(v1, v2)
        idx_ok = np.array_equal(
            np.where(v1 > -np.inf, i1, -1), np.where(v2 > -np.inf, i2, -1))
        print(f"{tag}: values equal={ok} indices equal={idx_ok}")
        assert ok and idx_ok

        timeit(xla, (qxy, blob_xy, rank), f"{tag} XLA fallback")
        timeit(pallas, (qxy, blob_xy, rank), f"{tag} Pallas fused")


if __name__ == "__main__":
    main()
