"""Parity + timing for the Pallas masked row top-m kernels (ops/topk.py).

Compares on the real TPU:
* row_topk vs lax.top_k on the extract_blobs row-compaction shape;
* query_select_topk vs the materialize-then-iter_top_k formulation it
  replaces in the detector (ring select A=512 m=8, tracked T*5=160 m=3).

Run: python experiments/topk_pallas.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vision_processor_tpu.models.detector import iter_top_k
from vision_processor_tpu.ops import topk as T


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
    print(f"{tag:56s} {ms:8.3f} ms   (runs: {', '.join(f'{b:.3f}' for b in best)})")
    return ms


def check_row(h=432, w=770, m=19):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(h, w)).astype(np.float32)
    x[rng.uniform(size=(h, w)) < 0.97] = -np.inf  # sparse like the mask
    x[5] = -np.inf  # one exhausted row
    x[7, 10] = x[7, 40] = 3.25  # a tie
    xj = jnp.asarray(x)
    rv, ri = jax.jit(lambda a: T.row_topk(a, m))(xj)
    lv, li = jax.jit(lambda a: jax.lax.top_k(a, m))(xj)
    assert np.array_equal(np.asarray(rv), np.asarray(lv)), "row values differ"
    valid = np.asarray(lv) > -np.inf
    assert np.array_equal(np.asarray(ri)[valid], np.asarray(li)[valid]), \
        "row indices differ on valid slots"
    print(f"row_topk parity ok ({h}x{w}, m={m}, valid slots "
          f"{int(valid.sum())})")
    return xj


def check_query(q=512, k=2000, m=8, by_rank=True, seed=2):
    rng = np.random.default_rng(seed)
    qxy = jnp.asarray(rng.uniform(-4500, 4500, (q, 2)).astype(np.float32))
    bxy = jnp.asarray(rng.uniform(-4500, 4500, (k, 2)).astype(np.float32))
    r2 = jnp.asarray(
        rng.uniform(200.0, 500.0, (q,)).astype(np.float32) ** 2
    )
    rank = rng.uniform(0, 100, (k,)).astype(np.float32)
    rank[rng.uniform(size=k) < 0.1] = np.inf
    rank = jnp.asarray(rank)

    def ref(qxy, r2, bxy, rank):
        diff = bxy[None, :, :] - qxy[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        ok = (d2 <= r2[:, None]) & (rank[None, :] < jnp.inf)
        score = jnp.where(ok, -rank[None, :] if by_rank else -d2, -jnp.inf)
        return iter_top_k(score, m)

    pv, pi = jax.jit(lambda *a: T.query_select_topk(*a, m=m, by_rank=by_rank))(
        qxy, r2, bxy, rank)
    rv, ri = jax.jit(ref)(qxy, r2, bxy, rank)
    assert np.allclose(np.asarray(pv), np.asarray(rv), equal_nan=True), \
        "query values differ"
    valid = np.asarray(rv) > -np.inf
    assert np.array_equal(np.asarray(pi)[valid], np.asarray(ri)[valid]), \
        "query indices differ on valid slots"
    print(f"query_select parity ok (Q={q}, K={k}, m={m}, by_rank={by_rank}, "
          f"valid {int(valid.sum())})")
    return qxy, r2, bxy, rank, ref


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    xj = check_row()
    qargs = check_query(512, 2000, 8, True)
    targs = check_query(160, 2000, 3, False, seed=3)

    timeit(lambda a: jax.lax.top_k(a, 19)[0], (xj,), "lax.top_k rows (432x770, m=19)")
    timeit(lambda a: T.row_topk(a, 19)[0], (xj,), "pallas row_topk (432x770, m=19)")

    qxy, r2, bxy, rank, ref = qargs
    timeit(lambda *a: ref(*a)[0], (qxy, r2, bxy, rank),
           "materialize+iter_top_k ring (512x2000, m=8)")
    timeit(lambda *a: T.query_select_topk(*a, m=8, by_rank=True)[0],
           (qxy, r2, bxy, rank), "pallas query_select ring (512x2000, m=8)")

    qxy, r2, bxy, rank, ref = targs
    timeit(lambda *a: ref(*a)[0], (qxy, r2, bxy, rank),
           "materialize+iter_top_k tracked (160x2000, m=3)")
    timeit(lambda *a: T.query_select_topk(*a, m=3, by_rank=False)[0],
           (qxy, r2, bxy, rank), "pallas query_select tracked (160x2000, m=3)")


if __name__ == "__main__":
    main()
