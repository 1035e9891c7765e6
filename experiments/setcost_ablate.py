"""Ablate the batched production step's per-SET fixed costs (real TPU).

prod_stage_profile.py prices one camera's chain (~1.16 ms at factor 1.0),
but the 4-camera sustained set measures ~5.7 ms — ~1 ms more than 4x the
chain. This experiment scan-differences rollout variants that peel off the
set-level stages one at a time to locate that gap:

  full        : production step (finalize + in-graph finisher, color chain)
  no_finish   : marks=None path (finalize_batched + summary, no finisher)
  no_finalize : per-camera chains only; constant summary feedback
  tracked_only: tracked_from_summaries alone (prices the prior build)

Run: python experiments/setcost_ablate.py            (factor 1.0)
     PROF_FACTOR=1.25 python experiments/setcost_ablate.py
"""
from __future__ import annotations

import os
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

    factor = float(os.environ.get("PROF_FACTOR", "1.0"))
    rig = bench.build_rig(resampling_factor=factor)
    cfg, raws, packed, scales, offsets, colors, params, geometry, cams = rig
    _ = np.asarray(jnp.ones((8, 128)) * 2.0)  # relay eager mode

    marks_one = pack_field_marks(cams[0][1].field, 10.0)
    marks = jax.tree.map(
        lambda *xs: jnp.asarray(np.stack(xs)), *([marks_one] * cfg.n_cams)
    )
    refs = jnp.asarray(np.stack([ColorState().packed_refs()] * cfg.n_cams))

    packed_d = jax.device_put(packed)
    scales_d = jax.device_put(scales)
    offsets_d = jax.device_put(offsets)
    colors_d = jax.device_put(colors)
    bank = jax.device_put(
        np.stack([np.roll(raws, (2 * i, 4 * i), axis=(1, 2)) for i in range(2)])
    )

    step = M.batched_step(cfg)

    def chains_only_step(raws_, packed_cams, field_scales, field_offsets,
                         colors7, prev_summary, params_, rs_grids=None,
                         prev_prev=None):
        tracked = M.tracked_from_summaries(
            cfg.det, prev_summary, params_["tracked_time_delta"],
            prev_summaries=prev_prev,
            bot_heights=params_.get("bot_heights_yb"),
        )
        outs = [
            M._single_cam_step(
                cfg, raws_[c], packed_cams[c], field_scales[c],
                field_offsets[c], colors7[c], tracked,
                M.params_for_cam(params_, c),
                rs_grid=None if rs_grids is None
                else jax.tree.map(lambda x: x[c], rs_grids),
                finalize=False,
            )
            for c in range(cfg.n_cams)
        ]
        blobs, det = (
            jax.tree.map(lambda *xs: jnp.stack(xs), *g) for g in zip(*outs)
        )
        # constant summary feedback: keeps the scan structure without
        # pricing finalize (summary would normally come from it)
        return blobs, det, M.empty_summary(cfg)

    def tracked_only_step(raws_, packed_cams, field_scales, field_offsets,
                          colors7, prev_summary, params_, rs_grids=None,
                          prev_prev=None):
        tracked = M.tracked_from_summaries(
            cfg.det, prev_summary, params_["tracked_time_delta"],
            prev_summaries=prev_prev,
            bot_heights=params_.get("bot_heights_yb"),
        )
        b = cfg.det.max_bots
        det = {
            "bot_valid": jnp.zeros((cfg.n_cams, b), bool)
            | (tracked["x"][0] > 1e30),
            "bot_pos": jnp.zeros((cfg.n_cams, b, 2), jnp.float32)
            + tracked["y"][0],
        }
        blobs = {"count": jnp.zeros(cfg.n_cams, jnp.int32)
                 + tracked["id"][0]}
        return blobs, det, M.empty_summary(cfg)

    variants = {
        "full (finalize + finisher + color chain)": (step, True),
        "no_finish (finalize, no finisher)": (step, False),
        "no_finalize (camera chains only)": (chains_only_step, False),
        "tracked_only (prior build)": (tracked_only_step, False),
    }

    for tag, (fn, with_marks) in variants.items():
        rolls = {n: M.make_rollout(cfg, fn, n) for n in (10, 50)}

        def run(n):
            args = [bank, packed_d, scales_d, offsets_d, colors_d, params]
            if with_marks:
                args += [refs, marks]
            out = rolls[n](*args)
            jax.block_until_ready(out)

        for n in (10, 50):
            run(n)
        best = []
        for _ in range(3):
            ts = {}
            for n in (10, 50):
                t0 = time.perf_counter()
                run(n)
                ts[n] = time.perf_counter() - t0
            best.append((ts[50] - ts[10]) / 40 * 1e3)
        print(f"{tag:46s} {min(best):7.3f} ms/set  "
              f"(runs: {', '.join(f'{b:.3f}' for b in best)})")


if __name__ == "__main__":
    main()
