"""Debug side channels shared by the single- and multi-camera apps.

The reference's per-process loop streams one of four cycling debug views
over RTP and dumps periodic JPEG snapshots for the wrapper UI (reference
src/main.cpp:377-403); both App and MultiCamApp emit exactly this, so the
view cycle, snapshot naming and interval predicate live here once.
"""
from __future__ import annotations

import numpy as np

DEBUG_VIEWS = ["raw_rgb", "flat_rgb", "grad_rgb", "circ_rgb"]


def snapshot_due(cfg, real_start: float, last_snapshot: float) -> bool:
    return (
        cfg.debug_stream_interval_ms > 0
        and (real_start - last_snapshot) * 1e3 >= cfg.debug_stream_interval_ms
    )


def emit_debug_views(processor, streamer, snapshots, cfg, frame,
                     view_time: float, real_start: float,
                     last_snapshot: float) -> float:
    """Render the four debug views for one camera and feed the stream
    (raw feed, or the 20 s view cycle) and/or the snapshot writer.
    Returns the updated last-snapshot timestamp."""
    want_stream = streamer.active
    want_snapshot = snapshot_due(cfg, real_start, last_snapshot)
    if not (want_stream or want_snapshot):
        return last_snapshot

    out = processor.debug_views(frame.data, frame.fmt)
    if want_stream:
        if cfg.raw_feed:
            view = out["raw_rgb"]
        else:
            # cycle the 4 debug views every 20 s like the reference
            view = out[DEBUG_VIEWS[int(view_time / 20.0) % 4]]
        streamer.send_frame(view)
    if want_snapshot:
        prefix = f"img/{cfg.cam_id}."
        snapshots.offer(out["raw_rgb"], prefix + "raw.jpg")
        snapshots.offer(out["flat_rgb"], prefix + "flat.jpg")
        snapshots.offer(out["grad_rgb"], prefix + "gradient.jpg")
        snapshots.offer(out["circ_rgb"], prefix + "blob.jpg")
        return real_start
    return last_snapshot


def emit_idle_raw(streamer, snapshots, cfg, frame, real_start: float,
                  last_snapshot: float, force_snapshot: bool = False) -> float:
    """Pre-calibration view: demosaic the raw frame, stream it so the
    operator can aim the camera, snapshot on interval (or forced).
    Returns the updated last-snapshot timestamp."""
    import jax.numpy as jnp

    from ..ops.frame import quad2rgba, raw2quad

    planes = raw2quad(jnp.asarray(frame.data), frame.fmt)
    rgb = np.asarray(quad2rgba(planes, frame.fmt))
    streamer.send_frame(rgb.astype(np.uint8))
    if force_snapshot or snapshot_due(cfg, real_start, last_snapshot):
        snapshots.offer(rgb, f"img/{cfg.cam_id}.raw.jpg")
        return real_start
    return last_snapshot
