"""Capture a jax.profiler trace of the sustained DENSE 4-camera scan and
dump the top device ops by total time — op-level ground truth for the
dense-budget work (differencing noise is ±0.05 ms; the trace is exact).

Run: python experiments/dense_trace.py [factor] ; output under
/tmp/dense_trace/ plus a parsed summary on stdout.
"""
from __future__ import annotations

import glob
import gzip
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import build_rig, build_rollouts

FACTOR = float(sys.argv[1]) if len(sys.argv) > 1 else 1.25


def main():
    _ = np.asarray(jnp.ones((8, 128)) * 2)
    rig = build_rig(max_blobs=2000, dense=True, dense_blobs=1900,
                    resampling_factor=FACTOR)
    cfg, raws, packed, scales, offsets, colors, params = rig[:7]
    cams = rig[8]

    from vision_processor_tpu.models.colors import ColorState
    from vision_processor_tpu.models.device_finish import pack_field_marks

    marks_one = pack_field_marks(cams[0][1].field, 10.0)
    marks = jax.tree.map(
        lambda *xs: jnp.asarray(np.stack(xs)), *([marks_one] * cfg.n_cams))
    refs = jnp.asarray(np.stack([ColorState().packed_refs()] * cfg.n_cams))

    rolls = build_rollouts(cfg)
    roll = rolls[10]
    bank = jax.device_put(np.stack(
        [np.roll(raws, (2 * i, 4 * i), axis=(1, 2)) for i in range(4)]))
    args = (jax.device_put(packed), jax.device_put(scales),
            jax.device_put(offsets), jax.device_put(colors), params,
            refs, marks)
    out = roll(bank, *args)
    jax.block_until_ready(out)

    outdir = "/tmp/dense_trace"
    with jax.profiler.trace(outdir):
        out = roll(bank, *args)
        jax.block_until_ready(out)
    print("trace captured", flush=True)

    # parse the trace-viewer json: sum device-op durations by name
    paths = sorted(glob.glob(
        outdir + "/**/*.trace.json.gz", recursive=True), reverse=True)
    if not paths:
        print("no trace json found; dir contents:",
              glob.glob(outdir + "/**", recursive=True)[:20])
        return
    with gzip.open(paths[0], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    # device lanes: pick pids whose thread names mention TPU/device XLA Ops
    name_by_pid = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name_by_pid[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in name_by_pid.items()
                if "TPU" in n or "/device" in n.lower()}
    tot = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            tot[e["name"]] = tot.get(e["name"], 0.0) + e.get("dur", 0.0)
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    total = sum(tot.values())
    print(f"pids: { {p: name_by_pid.get(p) for p in dev_pids} }")
    print(f"total device-op time {total/1e3:.3f} ms over 10 frame-sets "
          f"({total/1e4:.4f} ms/frameset-lane)")
    for name, dur in items[:45]:
        print(f"{dur/1e3:9.3f} ms  {100*dur/max(total,1):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
