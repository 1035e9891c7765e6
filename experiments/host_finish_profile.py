"""Profile host finishing — the round-3 pipeline bottleneck (12.1 ms
pooled across 4 cameras vs 10.9 ms device).

Measures: per-stage cProfile of one camera's finish_frame on bench-shaped
outputs, serial per-camera cost, pooled 4-thread wall time (GIL
contention), and a 4-process comparison point.

Run CPU-only (the device step is irrelevant here):
  JAX_PLATFORMS=cpu python experiments/host_finish_profile.py
"""
import cProfile
import io
import pstats
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench
    from vision_processor_tpu.parallel.multicam import (
        batched_step_host_tracked, make_resample_grids,
    )

    rig = bench.build_rig(resampling_factor=1.25)
    cfg, raws, packed, scales, offsets, colors, params, geometry, cams = rig
    procs, socks = bench.build_processors(cfg, cams, geometry)
    step = batched_step_host_tracked(cfg)
    grids = make_resample_grids(
        cfg, packed, float(params["max_bot_height"]), scales, offsets
    )
    from vision_processor_tpu.app.processor import TrackedArrays
    from vision_processor_tpu.models.device_finish import pack_field_marks

    marks_one = pack_field_marks(
        procs[0].perspective.field, procs[0].config.geometry_tolerance
    )
    marks = jax.tree.map(
        lambda *xs: jnp.asarray(np.stack(xs)), *([marks_one] * len(procs))
    )
    refs = jnp.asarray(np.stack([p.colors.packed_refs() for p in procs]))

    tracked = TrackedArrays.build({}, 0.0, cfg.det.max_tracked).as_dict()
    out = step(jnp.asarray(raws), jnp.asarray(packed), jnp.asarray(scales),
               jnp.asarray(offsets), jnp.asarray(colors), tracked, params,
               grids, refs, marks)
    blobs, det, fin = jax.device_get(out)

    def one(c):
        per_cam = ({k: v[c] for k, v in blobs.items()},
                   {k: v[c] for k, v in det.items()},
                   {k: v[c] for k, v in fin.items()})
        wrapper, _, _ = procs[c].finish_frame(per_cam, 0.0, 0.0)
        wrapper.detection.t_sent = time.time()
        socks[c].send(wrapper)

    # warm
    for c in range(4):
        one(c)

    # serial single-camera
    reps = 30
    t0 = time.perf_counter()
    for _ in range(reps):
        one(0)
    serial_ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"single-camera serial: {serial_ms:.2f} ms")

    # pooled 4 threads
    pool = ThreadPoolExecutor(4)
    t0 = time.perf_counter()
    for _ in range(reps):
        list(pool.map(one, range(4)))
    pooled_ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"pooled 4-camera wall: {pooled_ms:.2f} ms "
          f"(GIL tax {pooled_ms / (serial_ms * 4):.0%} of serial x4)")

    # profile
    pr = cProfile.Profile()
    pr.enable()
    for _ in range(reps):
        one(0)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
    print(s.getvalue())

    for sk in socks:
        sk.close()


if __name__ == "__main__":
    main()
