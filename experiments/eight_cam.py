"""8 cameras on one chip: device-sustained rate when the field is split
into 8 cells (each 1080p camera covers half the area of the 4-cam rig).

Round-3 re-measure: full production device program (in-graph finisher,
device-carried colors), qualified resampling_factor=1.25 and factor 1.0.

Measured (TPU v5e via relay, scan-differenced):
  factor=1.25 n=4: 4.72 ms/frameset, 847.9 aggregate fps, bots 16/16
  factor=1.25 n=8: 9.74 ms/frameset, 821.0 aggregate fps, bots 31/32
  factor=1.00 n=4: 5.48 ms/frameset, 729.8 aggregate fps, bots 16/16
  factor=1.00 n=8: 11.02 ms/frameset, 726.1 aggregate fps, bots 31/32
Aggregate throughput is resolution-bound and nearly camera-count
invariant (~3.0x the round-2 ~270 fps plateau); the 8-cam rigs drop one
robot to the camera-edge cut at a cell seam (the production overlap of
a real rig hands it to the neighbouring camera).
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bench import build_rig, build_rollouts, measure_device_sustained
from vision_processor_tpu.models.colors import ColorState
from vision_processor_tpu.models.device_finish import pack_field_marks

_ = np.asarray(jnp.ones((8, 128)) * 2)
for factor in (1.25, 1.0):
    for n in (4, 8):
        rig = build_rig(n_cams=n, resampling_factor=factor)
        cfg, raws, packed, scales, offsets, colors, params = rig[:7]
        cams = rig[8]
        marks_one = pack_field_marks(cams[0][1].field, 10.0)
        marks = jax.tree.map(
            lambda *xs: jnp.asarray(np.stack(xs)), *([marks_one] * n)
        )
        refs = jnp.asarray(np.stack([ColorState().packed_refs()] * n))
        rolls = build_rollouts(cfg)
        dev_s, bots, blob_counts, _aux = measure_device_sustained(
            rolls, cfg, raws, packed, scales, offsets, colors, params,
            refs, marks)
        print(f"factor={factor} n_cams={n}: flat {cfg.bm.flat_shape}, "
              f"{dev_s*1e3:.2f} ms/frameset, {n/dev_s:.1f} aggregate fps, "
              f"bots {bots}/{n*4}, blobs {blob_counts}", flush=True)
