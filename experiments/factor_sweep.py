"""resampling_factor quality/latency sweep on the real TPU.

factor > 1 coarsens the flat field grid (field_scale multiplies), which
shrinks every full-map stage ~quadratically. This measures the device
frame-set time AND the detection quality (bots found, mean position /
orientation error vs ground truth) at each factor, on the bench scenes.
"""
from __future__ import annotations

import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import build_rig, build_rollouts, measure_device_sustained
from vision_processor_tpu.app.processor import TrackedArrays
from vision_processor_tpu.parallel.multicam import (
    batched_step_host_tracked,
    make_resample_grids,
)
from vision_processor_tpu.models.host_detect import calc_bot_ids


def quality(cfg, raws, packed, scales, offsets, colors, params, scenes):
    """One production step -> (bots found/16, mean pos err mm, mean orient
    err rad, ball recall/4)."""
    step = batched_step_host_tracked(cfg)
    grids = make_resample_grids(
        cfg, packed, float(params["max_bot_height"]), scales, offsets)
    tracked = TrackedArrays.build({}, 0.0, cfg.det.max_tracked)
    blobs, det = jax.device_get(step(
        jnp.asarray(raws), packed, scales, offsets, colors,
        tracked.as_dict(), params, grids))

    found = 0
    pos_errs, ori_errs = [], []
    ball_found = 0
    for c, scene in enumerate(scenes):
        valid = det["bot_valid"][c]
        bots = det["bot_pos"][c][valid]
        oris = det["bot_orientation"][c][valid]
        for sbot in scene.bots:
            if len(bots) == 0:
                continue
            d = np.linalg.norm(bots - [sbot.x, sbot.y], axis=-1)
            j = int(np.argmin(d))
            if d[j] < 60.0:
                found += 1
                pos_errs.append(float(d[j]))
                do = (oris[j] - sbot.orientation + math.pi) % (2 * math.pi) - math.pi
                ori_errs.append(abs(float(do)))
        bl = blobs["field_pos"][c][
            blobs["valid"][c] & ~det["ball_clipped"][c]]
        truth = scene.balls[0]
        if len(bl) and np.min(
            np.linalg.norm(bl - [truth.x, truth.y], axis=-1)) < 60.0:
            ball_found += 1
    return found, float(np.mean(pos_errs)) if pos_errs else np.nan, \
        float(np.mean(ori_errs)) if ori_errs else np.nan, ball_found


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    print(f"{'factor':>7} {'flat grid':>12} {'ms/frameset':>12} "
          f"{'bots':>6} {'pos mm':>8} {'orient rad':>10} {'balls':>6}")
    for factor in (1.0, 1.25, 1.5, 2.0):
        rig = build_rig(resampling_factor=factor, return_scenes=True)
        cfg, raws, packed, scales, offsets, colors, params = rig[:7]
        scenes = rig[9]
        rolls = build_rollouts(cfg)
        dev_s, _, _ = measure_device_sustained(
            rolls, cfg, raws, packed, scales, offsets, colors, params)
        found, pos_err, ori_err, balls = quality(
            cfg, raws, packed, scales, offsets, colors, params, scenes)
        print(f"{factor:7.2f} {str(cfg.bm.flat_shape):>12} "
              f"{dev_s * 1e3:12.3f} {found:4d}/16 {pos_err:8.1f} "
              f"{ori_err:10.3f} {balls:4d}/4", flush=True)


if __name__ == "__main__":
    main()
