"""Measure the in-graph finisher's device cost on the real TPU.

Scan-length differencing (10 vs 50 frames) of the production rollout with
and without the fused finisher — the difference prices color update +
id recalc + ball scoring/filters + emission projections per frame-set.

Run: python experiments/fused_finish_cost.py
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from vision_processor_tpu.models.colors import ColorState
    from vision_processor_tpu.models.device_finish import pack_field_marks
    from vision_processor_tpu.parallel import multicam as M

    rig = bench.build_rig(resampling_factor=1.25)
    cfg, raws, packed, scales, offsets, colors, params, geometry, cams = rig
    _ = np.asarray(jnp.ones((8, 128)) * 2.0)  # relay eager mode

    marks_one = pack_field_marks(cams[0][1].field, 10.0)
    marks = jax.tree.map(
        lambda *xs: jnp.asarray(np.stack(xs)), *([marks_one] * cfg.n_cams)
    )
    refs = jnp.asarray(np.stack([ColorState().packed_refs()] * cfg.n_cams))

    step = M.batched_step(cfg)
    rolls = {n: M.make_rollout(cfg, step, n) for n in (10, 50)}

    packed_d = jax.device_put(packed)
    scales_d = jax.device_put(scales)
    offsets_d = jax.device_put(offsets)
    colors_d = jax.device_put(colors)
    bank = jax.device_put(
        np.stack([np.roll(raws, (2 * i, 4 * i), axis=(1, 2)) for i in range(4)])
    )

    def measure(refs_a, marks_a, label):
        def time_roll(n):
            out = rolls[n](bank, packed_d, scales_d, offsets_d, colors_d,
                           params, refs_a, marks_a)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = rolls[n](bank, packed_d, scales_d, offsets_d, colors_d,
                           params, refs_a, marks_a)
            jax.block_until_ready(out)
            return time.perf_counter() - t0

        est = []
        for _ in range(3):
            t10 = time_roll(10)
            t50 = time_roll(50)
            est.append((t50 - t10) / 40.0)
        ms = float(np.median(est)) * 1e3
        print(f"{label}: {ms:.3f} ms/frameset")
        return ms

    base = measure(None, None, "without finisher")
    fused = measure(refs, marks, "with batched finisher")
    print(f"finisher device cost: {fused - base:.3f} ms/frameset "
          f"({(fused - base) / cfg.n_cams * 1e3:.0f} us/cam)")


if __name__ == "__main__":
    main()
