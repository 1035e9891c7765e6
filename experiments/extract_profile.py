"""Profile extract_blobs internals + detector anchor scaling on TPU."""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vision_processor_tpu.ops import blob as B


def timeit(fn, args, tag, n_lo=4, n_hi=16):
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
    print(f"{tag:46s} {ms:8.3f} ms")
    return ms


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    H, W = 540, 962
    flat = jnp.asarray(rng.normal(128, 30, (H, W, 3)).astype(np.float32))
    circ = jnp.asarray(rng.normal(0, 30, (H, W)).astype(np.float32))

    timeit(lambda f: B.disc_stats_sat(f, 4), (flat,), "disc_stats_sat r=4")
    timeit(lambda c: B.local_max_mask(c), (circ,), "local_max_mask")
    timeit(lambda c: jax.lax.top_k(c.reshape(-1), 256)[0], (circ,),
           "top_k 519k -> 256")
    timeit(lambda c: jax.lax.top_k(c.reshape(-1), 2000)[0], (circ,),
           "top_k 519k -> 2000")

    def topk_2stage(c, k=2000, m=16):
        # per-row top-m (rows of 962), then global top-k of 540*m
        rows = jax.lax.top_k(c, m)  # (540, m) on last axis? c is (H, W)
        vals = rows[0].reshape(-1)
        idx = rows[1] + (jnp.arange(H) * W)[:, None]
        v, i = jax.lax.top_k(vals, k)
        return v, idx.reshape(-1)[i]
    timeit(lambda c: topk_2stage(c)[0], (circ,),
           "2-stage top_k (row top-16 -> 2000)")

    def topk_sort(c, k=2000):
        v = jnp.sort(c.reshape(-1))[-k:]
        return v
    timeit(lambda c: topk_sort(c), (circ,), "full sort -> top 2000")

    timeit(lambda f: B.extract_blobs(f, circ, jnp.float32(15.0),
                                     jnp.float32(0.0), radius=4,
                                     max_blobs=2000),
           (flat,), "extract_blobs full (2000)")

    # detector scaling with anchors
    from vision_processor_tpu.models.detector import DetectorConfig, detection_hypotheses
    blob_pos = jnp.asarray(rng.uniform(-4500, 0, (2000, 2)).astype(np.float32))
    blob_valid = jnp.asarray(np.arange(2000) < 600)
    for a in (256, 512, 1024, 2000):
        cfg = DetectorConfig(max_blobs=2000, max_anchors=a)
        timeit(lambda p, cfg=cfg: detection_hypotheses(
            cfg, p, blob_valid, jnp.float32(90.0))["score"],
            (blob_pos,), f"detection_hypotheses anchors={a}")


if __name__ == "__main__":
    main()
