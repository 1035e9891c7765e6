"""Profile host finishing (colors/ids/filters/protobuf/emit) per sub-stage.

Pure host work — runs on CPU without touching the TPU.
"""
from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

from vision_processor_tpu.utils import honor_platform_env

honor_platform_env()


def main():
    from bench import build_rig, build_processors, build_rollouts
    from vision_processor_tpu.app.processor import TrackedArrays
    from vision_processor_tpu.parallel.multicam import (
        batched_step_host_tracked, make_resample_grids)

    cfg, raws, packed, scales, offsets, colors, params, geometry, cams = build_rig(
        max_blobs=2000)
    step = batched_step_host_tracked(cfg)
    procs, socks = build_processors(cfg, cams, geometry, group="224.99.77.13",
                                    port=17773)
    grids = make_resample_grids(cfg, packed, 150.0, scales, offsets)
    tracked = TrackedArrays.build({}, 0.0, cfg.det.max_tracked)
    out = step(raws, packed, scales, offsets, colors, tracked.as_dict(),
               params, grids)
    blobs_h, det_h = jax.device_get(out)

    def finish_all():
        for c, proc in enumerate(procs):
            per_cam = ({k: v[c] for k, v in blobs_h.items()},
                       {k: v[c] for k, v in det_h.items()})
            wrapper, _, _ = proc.finish_frame(per_cam, 0.0, 0.0)
            wrapper.detection.t_sent = time.time()
            socks[c].send(wrapper)

    finish_all()  # warm

    reps = 30
    t0 = time.perf_counter()
    for _ in range(reps):
        finish_all()
    total = (time.perf_counter() - t0) / reps * 1e3
    print(f"host finishing per 4-cam frameset: {total:.3f} ms")

    pr = cProfile.Profile()
    pr.enable()
    for _ in range(reps):
        finish_all()
    pr.disable()
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()


def main_threaded():
    """Same measurement with the production thread-pool fan-out."""
    from concurrent.futures import ThreadPoolExecutor

    from bench import build_rig, build_processors
    from vision_processor_tpu.app.processor import TrackedArrays
    from vision_processor_tpu.parallel.multicam import (
        batched_step_host_tracked, make_resample_grids)

    cfg, raws, packed, scales, offsets, colors, params, geometry, cams = build_rig(
        max_blobs=2000)
    step = batched_step_host_tracked(cfg)
    procs, socks = build_processors(cfg, cams, geometry, group="224.99.77.14",
                                    port=17774)
    grids = make_resample_grids(cfg, packed, 150.0, scales, offsets)
    tracked = TrackedArrays.build({}, 0.0, cfg.det.max_tracked)
    out = step(raws, packed, scales, offsets, colors, tracked.as_dict(),
               params, grids)
    blobs_h, det_h = jax.device_get(out)
    pool = ThreadPoolExecutor(len(procs))

    def one(c):
        per_cam = ({k: v[c] for k, v in blobs_h.items()},
                   {k: v[c] for k, v in det_h.items()})
        wrapper, _, _ = procs[c].finish_frame(per_cam, 0.0, 0.0)
        wrapper.detection.t_sent = time.time()
        socks[c].send(wrapper)

    list(pool.map(one, range(len(procs))))  # warm
    reps = 30
    t0 = time.perf_counter()
    for _ in range(reps):
        list(pool.map(one, range(len(procs))))
    total = (time.perf_counter() - t0) / reps * 1e3
    print(f"host finishing per 4-cam frameset (threaded): {total:.3f} ms")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "threaded":
    main_threaded()
