"""Unrolled-per-camera vs camera-vmapped detect() on the real TPU.

The NMS/id batching (parallel/multicam.finalize_batched) won 0.65 ms per
4-camera frame-set by collapsing per-camera sequenced-op overhead. The
remaining detection core (detection_hypotheses + tracked_hypotheses +
merge/top_k) still runs unrolled per camera at ~0.38 ms each
(experiments/det_stage3.py) even though its gathers are tiny (~10k
indices/camera) — the same overhead argument applies. This measures
detect(with_nms=False) 4x unrolled vs once vmapped over a stacked
camera axis, and asserts bit-identical outputs.

Run: python experiments/det_batch.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vision_processor_tpu.models import detector as D


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


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    n, k = 4, 2000
    cfg = D.DetectorConfig(max_blobs=k)
    t = cfg.max_tracked

    blob_pos = jnp.asarray(rng.uniform(-4500, 0, (n, k, 2)).astype(np.float32))
    blob_color = jnp.asarray(
        rng.uniform(0, 255, (n, k, 3)).astype(np.float32))
    blob_valid = jnp.asarray(
        np.arange(k)[None, :] < np.array([600, 420, 380, 640])[:, None])
    colors = jnp.asarray(rng.uniform(0, 255, (n, 6, 3)).astype(np.float32))
    packed = np.concatenate([
        [800.0], [480.0, 270.0], [0.05],
        np.eye(3).reshape(-1), [0.0, 0.0, -3000.0], [960.0, 540.0],
    ]).astype(np.float32)
    packed_cam = jnp.asarray(np.stack([packed + i * 1e-3 for i in range(n)]))
    tracked = {
        "id": jnp.asarray((np.arange(t) % 32).astype(np.int32)),
        "x": jnp.asarray(rng.uniform(-4000, 0, t).astype(np.float32)),
        "y": jnp.asarray(rng.uniform(-2500, 0, t).astype(np.float32)),
        "z": jnp.full(t, 143.0, jnp.float32),
        "w": jnp.zeros(t, jnp.float32),
        "vx": jnp.zeros(t, jnp.float32),
        "vy": jnp.zeros(t, jnp.float32),
        "vw": jnp.zeros(t, jnp.float32),
        "time_delta": jnp.full(t, 0.01, jnp.float32),
        "valid": jnp.asarray(np.arange(t) < 16),
    }
    pscalar = {
        "max_robot_radius": 90.0,
        "max_bot_height": 150.0,
        "min_tracking_radius": 30.0,
        "max_bot_acceleration": 6500.0,
        "min_confidence": 0.2,
        "clipping_tolerance": 10.0,
        "ball_radius": 21.5,
    }
    params_n = {kk: jnp.full((n,), v, jnp.float32) for kk, v in
                pscalar.items()}
    params_1 = {kk: jnp.float32(v) for kk, v in pscalar.items()}

    def blobs_of(i_or_slice):
        return {
            "field_pos": blob_pos[i_or_slice],
            "valid": blob_valid[i_or_slice],
            "color": blob_color[i_or_slice],
        }

    def unrolled(p):
        outs = []
        for i in range(n):
            b = {"field_pos": p[i], "valid": blob_valid[i],
                 "color": blob_color[i]}
            outs.append(D.detect(cfg, b, tracked, colors[i], packed_cam[i],
                                 params_1, with_nms=False))
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    def vmapped(p):
        b = {"field_pos": p, "valid": blob_valid, "color": blob_color}
        return jax.vmap(
            lambda bb, cc, pc, pp: D.detect(cfg, bb, tracked, cc, pc, pp,
                                            with_nms=False),
        )(b, colors, packed_cam,
          {kk: params_n[kk] for kk in params_n})

    a = jax.jit(unrolled)(blob_pos)
    bv = jax.jit(vmapped)(blob_pos)
    jax.block_until_ready((a, bv))
    for key in a:
        av, bvv = np.asarray(a[key]), np.asarray(bv[key])
        same = np.array_equal(av, bvv)
        print(f"equal[{key}]: {same}")
        if not same:
            bad = np.argwhere(av != bvv)
            print("  first diffs:", bad[:5], av[tuple(bad[0])],
                  bvv[tuple(bad[0])])

    timeit(unrolled, (blob_pos,), "detect x4 unrolled (with_nms=False)")
    timeit(vmapped, (blob_pos,), "detect vmapped over 4-camera axis")


if __name__ == "__main__":
    main()
