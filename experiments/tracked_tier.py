"""Measure tracked_hypotheses cost at production shapes and the payoff of
an occupancy tier on the tracked-slot axis (T=32 slots vs the <=16
actually valid in any legal SSL frame — same prefix argument as the
anchor tier: tracked entries arrive top_k'd by score, so valid slots are
a prefix, and per-slot searches are independent)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vision_processor_tpu.models import detector as D
from vision_processor_tpu.models.camera import CameraModel


def timeit(fn, args, tag, n_lo=10, n_hi=50, reps=5):
    def make(n):
        def scan_fn(x0, *rest):
            def body(carry, _):
                out = fn(carry, *rest)
                leaves = jax.tree.leaves(out)
                bump = sum(jnp.sum(jnp.asarray(l).astype(jnp.float32))
                           for l in leaves)
                return jnp.roll(carry, 1, axis=0), bump
            return jax.lax.scan(body, x0, None, length=n)
        return jax.jit(scan_fn)

    fns = {n: make(n) for n in (n_lo, n_hi)}
    ests = []
    for _ in range(reps):
        ts = {}
        for n in (n_lo, n_hi):
            out = fns[n](*args)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = fns[n](*args)
            jax.block_until_ready(out)
            ts[n] = time.perf_counter() - t0
        ests.append((ts[n_hi] - ts[n_lo]) / (n_hi - n_lo) * 1e3)
    ms = float(np.median(ests))
    print(f"{tag:58s} {ms:8.3f} ms")
    return ms


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rng = np.random.default_rng(0)
    k = 2000
    blob_pos = jnp.asarray(rng.uniform(-4500, 0, (k, 2)).astype(np.float32))
    blob_color = jnp.asarray(rng.uniform(0, 255, (k, 3)).astype(np.float32))
    blob_valid = jnp.asarray(np.arange(k) < 120)
    colors = jnp.asarray(
        rng.uniform(0, 255, (6, 3)).astype(np.float32))
    cam = jnp.asarray(CameraModel(
        focal_length=900.0, principal_point=np.array([480.0, 270.0]),
        distortion_k2=0.02, pos=np.array([-2250.0, -1500.0, 4500.0]),
        size=np.array([960, 540]),
    ).packed())

    for t_slots, n_tracked in ((32, 16), (16, 16)):
        cfg = D.DetectorConfig(max_blobs=k, max_tracked=t_slots)
        tt = cfg.max_tracked
        tracked = {
            "id": jnp.asarray([i for i in range(n_tracked)]
                              + [-1] * (tt - n_tracked), jnp.int32),
            "x": jnp.asarray(rng.uniform(-4000, 0, tt).astype(np.float32)),
            "y": jnp.asarray(rng.uniform(-2500, 0, tt).astype(np.float32)),
            "z": jnp.full(tt, 143.0, jnp.float32),
            "w": jnp.zeros(tt, jnp.float32),
            "vx": jnp.zeros(tt, jnp.float32),
            "vy": jnp.zeros(tt, jnp.float32),
            "vw": jnp.zeros(tt, jnp.float32),
            "time_delta": jnp.full(tt, 0.005, jnp.float32),
            "valid": jnp.asarray([True] * n_tracked + [False] * (tt - n_tracked)),
        }

        def trk(bp):
            return D.tracked_hypotheses(
                cfg, bp, blob_color, blob_valid, tracked, colors, cam,
                jnp.float32(150.0), jnp.float32(20.0), jnp.float32(6500.0),
            )

        timeit(trk, (blob_pos,),
               f"tracked_hypotheses T={t_slots} (valid {n_tracked})")

    # detection side for context
    cfg = D.DetectorConfig(max_blobs=k)

    def det(bp):
        return D.detection_hypotheses(
            cfg, bp, blob_valid, np.float32(90.0),
            blob_color=blob_color, colors=colors)

    timeit(det, (blob_pos,), "detection_hypotheses (tier path)")


if __name__ == "__main__":
    main()
