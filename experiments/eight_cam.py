"""8 cameras on one chip: device-sustained rate when the field is split
into 8 cells (each 1080p camera covers half the area of the 4-cam rig)."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from bench import build_rig, build_rollouts, measure_device_sustained

_ = np.asarray(jnp.ones((8, 128)) * 2)
for n in (4, 8):
    rig = build_rig(n_cams=n)
    cfg, raws, packed, scales, offsets, colors, params = rig[:7]
    rolls = build_rollouts(cfg)
    dev_s, bots, blob_counts = measure_device_sustained(
        rolls, cfg, raws, packed, scales, offsets, colors, params)
    print(f"n_cams={n}: flat {cfg.bm.flat_shape}, "
          f"{dev_s*1e3:.2f} ms/frameset, {n/dev_s:.1f} aggregate fps, "
          f"bots {bots}/{n*4}, blobs {blob_counts}", flush=True)
