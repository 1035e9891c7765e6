"""Item: serial glass-to-wire < 5 ms (VERDICT r3 item 2).

The corrected serial frameset latency is upload(2.07 est) + device(4.29)
+ host finishing — the batched program exposes the WHOLE upload and the
WHOLE host tail because all inputs must be resident before dispatch and
all outputs appear at program end. Splitting into 4 per-camera programs
would hide uploads 1-3 under compute 0-2 and all but the last camera's
host finishing under compute — IF the per-camera programs cost ~batched/4
each. This measures that: single-camera full-program device time (scan
differencing) x4 vs the batched 4-camera program.

Run: python experiments/split_serial.py [factor]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import build_rig, build_rollouts, measure_device_sustained


def main():
    factor = float(sys.argv[1]) if len(sys.argv) > 1 else 1.25
    _ = np.asarray(jnp.ones((8, 128)) * 2)

    rig = build_rig(resampling_factor=factor)
    cfg, raws, packed, scales, offsets, colors, params = rig[:7]
    cams = rig[8]

    from vision_processor_tpu.models.colors import ColorState
    from vision_processor_tpu.models.device_finish import pack_field_marks

    marks_one = pack_field_marks(cams[0][1].field, 10.0)
    marks = jax.tree.map(
        lambda *xs: jnp.asarray(np.stack(xs)), *([marks_one] * cfg.n_cams)
    )
    refs = jnp.asarray(np.stack([ColorState().packed_refs()] * cfg.n_cams))

    # batched reference number
    rolls = build_rollouts(cfg)
    dev_ms, _, _, _ = measure_device_sustained(
        rolls, cfg, raws, packed, scales, offsets, colors, params,
        refs, marks)
    print(f"batched 4-cam frame-set: {dev_ms*1e3:.3f} ms "
          f"({dev_ms*1e3/cfg.n_cams:.3f} ms/cam)")

    # single-camera full program (blob machine + detect + finisher),
    # same content as one camera of the batched step
    from dataclasses import replace

    from vision_processor_tpu.parallel import multicam as M

    cfg1 = replace(cfg, n_cams=1)
    step1 = M.batched_step_host_tracked(cfg1)
    grids1 = M.make_resample_grids(cfg1, packed[:1],
                                   float(params["max_bot_height"]),
                                   scales[:1], offsets[:1])
    from vision_processor_tpu.app.processor import TrackedArrays

    tracked = TrackedArrays.build({}, 0.0, cfg.det.max_tracked).as_dict()
    marks1 = jax.tree.map(lambda x: x[:1], marks)

    raw1 = jax.device_put(raws[:1])
    args1 = (jax.device_put(packed[:1]), jax.device_put(scales[:1]),
             jax.device_put(offsets[:1]), jax.device_put(colors[:1]))

    # scan-differenced single-cam sustained
    def make_roll(n):
        def scan_fn(raw0, packed1, scales1, offsets1, colors1):
            def body(carry, _):
                blobs, det, fin = step1(
                    carry, packed1, scales1, offsets1, colors1, tracked,
                    params, grids1, refs[:1], marks1,
                )
                bump = jnp.sum(det["bot_valid"])
                return jnp.roll(carry, 2, axis=1), (bump, fin["colors7"][0, 0, 0])
            return jax.lax.scan(body, raw0, None, length=n)
        return jax.jit(scan_fn)

    rolls1 = {n: make_roll(n) for n in (10, 50)}
    ests = []
    for _ in range(5):
        ts = {}
        for n in (10, 50):
            out = rolls1[n](raw1, *args1)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = rolls1[n](raw1, *args1)
            jax.block_until_ready(out)
            ts[n] = time.perf_counter() - t0
        ests.append((ts[50] - ts[10]) / 40.0)
    single_ms = float(np.median(ests)) * 1e3
    print(f"single-cam program: {single_ms:.3f} ms "
          f"(x{cfg.n_cams} = {single_ms*cfg.n_cams:.3f} ms; "
          f"batched = {dev_ms*1e3:.3f} ms; "
          f"split cost = {single_ms*cfg.n_cams - dev_ms*1e3:+.3f} ms)")


if __name__ == "__main__":
    main()
