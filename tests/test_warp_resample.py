"""Two-pass Pallas warp resample (ops/warp.py) vs the gather path.

The warp is sub-pixel-equivalent, not bit-identical (separable
decomposition + true-position plane offsets instead of the gather's
fixed-cell-pair clipped weights), so parity is asserted at the level that
matters: flat-grid pixels on smooth content, and emitted detections on a
rendered scene. On CPU the kernel runs in Pallas interpret mode.
"""
import numpy as np
import pytest


def _small_rig():
    import jax.numpy as jnp

    from __graft_entry__ import _build_setup

    geometry, cams, bm_cfg, det_cfg, params = _build_setup(size=(96, 72))
    return geometry, cams[0][0], bm_cfg, params


def test_warp_vs_gather_smooth():
    """On smooth image content the warp and gather flat grids agree to a
    couple of dRGB units (their sampling positions differ sub-pixel)."""
    import dataclasses

    import jax.numpy as jnp

    from vision_processor_tpu.ops.pipeline import blob_machine

    geometry, model, bm_cfg, params = _small_rig()
    h, w = bm_cfg.raw_shape
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    raw = (
        96.0
        + 64.0 * np.sin(xx / 37.0)
        + 48.0 * np.cos(yy / 29.0)
    ).astype(np.uint8)

    cfgs = {
        mode: dataclasses.replace(
            bm_cfg, debug_images=True, resample_mode=mode
        )
        for mode in ("gather", "warp")
    }
    flats = {}
    for mode, cfg in cfgs.items():
        grid = cfg.make_resample_grid(
            np.asarray(model.packed()), float(params["max_bot_height"])
        )
        out = blob_machine(
            cfg, jnp.asarray(raw), jnp.asarray(model.packed()),
            params["max_bot_height"], params["min_circularity"],
            rs_grid=grid,
        )
        flats[mode] = np.asarray(out["flat"])

    d = np.abs(flats["warp"] - flats["gather"])
    # interior only: border rows/cols clamp differently
    inner = d[2:-2, 2:-2]
    assert inner.mean() < 1.0, inner.mean()
    assert np.percentile(inner, 99) < 4.0, np.percentile(inner, 99)


def test_warp_vs_gather_smooth_bgr():
    """Same agreement on the BGR path (full-resolution planes, zero
    quarter-pixel offsets, u32 packing with a zero 4th byte)."""
    import dataclasses

    import jax.numpy as jnp

    from vision_processor_tpu.ops.pipeline import blob_machine

    geometry, model, bm_cfg, params = _small_rig()
    h, w = bm_cfg.raw_shape
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    raw = np.stack(
        [
            96.0 + 64.0 * np.sin(xx / 37.0) + 48.0 * np.cos(yy / 29.0),
            80.0 + 70.0 * np.cos(xx / 23.0),
            120.0 + 50.0 * np.sin((xx + yy) / 41.0),
        ],
        axis=-1,
    ).astype(np.uint8)

    flats = {}
    for mode in ("gather", "warp"):
        cfg = dataclasses.replace(
            bm_cfg, fmt="BGR", raw_shape=(h, w, 3), debug_images=True,
            resample_mode=mode,
        )
        grid = cfg.make_resample_grid(
            np.asarray(model.packed()), float(params["max_bot_height"])
        )
        out = blob_machine(
            cfg, jnp.asarray(raw), jnp.asarray(model.packed()),
            params["max_bot_height"], params["min_circularity"],
            rs_grid=grid,
        )
        flats[mode] = np.asarray(out["flat"])

    d = np.abs(flats["warp"] - flats["gather"])
    inner = d[2:-2, 2:-2]
    assert inner.mean() < 1.0, inner.mean()
    assert np.percentile(inner, 99) < 4.0, np.percentile(inner, 99)


def test_warp_fits_overhead(divb_field, overhead_model):
    from vision_processor_tpu.models.perspective import Perspective
    from vision_processor_tpu.ops.pipeline import BlobMachineConfig
    from vision_processor_tpu.ops.warp import warp_fits

    persp = Perspective(overhead_model, divb_field.geometry.field)
    cfg = BlobMachineConfig.from_perspective(persp, "RGGB", (1440, 1920))
    assert warp_fits(
        overhead_model, cfg.field_scale, cfg.field_offset,
        cfg.flat_shape, cfg.plane_shape, 150.0,
    )


def test_warp_fits_tie_semantics():
    """Exact v ties from clip saturation at the frame border are accepted
    (edge-replication, same clamp as the gather); an unsaturated interior
    fold is rejected (the per-column inversion would be ill-defined).
    Regression: the factor-1.0 bench rigs tie on row 0 and must fit."""
    import numpy as np

    from vision_processor_tpu.ops.warp import warp_fits

    class LinearModel:
        """v = a*y + b (projection linear in field coords), u = x/4."""

        def __init__(self, a, b):
            self.a, self.b = a, b

        def field2image(self, pts):
            u = pts[:, 0] / 4.0
            v = self.a * pts[:, 1] + self.b
            return np.stack([u, v], axis=-1)

    out_shape, plane_shape = (64, 128), (64, 128)
    # maps the first few output rows BELOW v=0 (clip ties at the border)
    sat = LinearModel(a=0.9, b=-2.0)
    assert warp_fits(sat, 1.0, (0.0, 0.0), out_shape, plane_shape, 150.0)

    class FoldModel(LinearModel):
        def field2image(self, pts):
            img = super().field2image(pts)
            img[:, 1] = np.where(
                pts[:, 1] < 32.0, img[:, 1], 0.9 * 32.0 - 2.0
            )  # interior plateau, then flat — unsaturated ties
            return img

    assert not warp_fits(
        FoldModel(a=0.9, b=-2.0), 1.0, (0.0, 0.0), out_shape, plane_shape,
        150.0,
    )


def test_warp_detection_parity(divb_field, overhead_model):
    """The full Processor path with the warp resample finds the same
    robots and ball at the same positions as the gather path."""
    from vision_processor_tpu.app.processor import Processor
    from vision_processor_tpu.io.camera import RawFrame
    from vision_processor_tpu.io.synthetic import (
        Scene, SceneBall, SceneBot, render_raw,
    )
    from vision_processor_tpu.utils.config import VisionConfig

    scene = Scene(
        bots=[
            SceneBot(5, "yellow", -2600.0, 400.0, 0.9),
            SceneBot(9, "blue", -1400.0, -700.0, -1.2),
        ],
        balls=[SceneBall(-3200.0, -1100.0)],
        noise_sigma=1.0,
    )
    raw = render_raw(
        overhead_model, divb_field.geometry.field, scene, "RGGB"
    )
    frame = RawFrame(data=raw, fmt="RGGB", width=960, height=720)

    results = {}
    for mode in ("gather", "warp"):
        cfg = VisionConfig()
        cfg.max_blobs = 256
        cfg.resample_mode = mode
        proc = Processor(cfg)
        geometry = divb_field.geometry
        geometry.ClearField("calib")
        geometry.calib.append(overhead_model.to_proto(0))
        proc.geometry_check(960, 720, geometry=geometry, version=1)
        wrapper, _, _ = proc.process_frame(frame, tracked_by_cam={}, now=1.0)
        results[mode] = wrapper.detection

    dg, dw = results["gather"], results["warp"]
    bots_g = {("y", b.robot_id): b for b in dg.robots_yellow}
    bots_g.update({("b", b.robot_id): b for b in dg.robots_blue})
    bots_w = {("y", b.robot_id): b for b in dw.robots_yellow}
    bots_w.update({("b", b.robot_id): b for b in dw.robots_blue})
    assert set(bots_g) == set(bots_w) and len(bots_g) == 2
    for key, bg in bots_g.items():
        bw = bots_w[key]
        assert abs(bg.x - bw.x) < 5.0, key
        assert abs(bg.y - bw.y) < 5.0, key
        assert abs(bg.orientation - bw.orientation) < 0.05, key
    assert len(dg.balls) == len(dw.balls) == 1
    assert abs(dg.balls[0].x - dw.balls[0].x) < 5.0
    assert abs(dg.balls[0].y - dw.balls[0].y) < 5.0


def test_warp_rollout_traced():
    """warp_grid is traceable: the multicam rollout compiles and runs with
    resample_mode='warp' (in-scan grids, interpret-mode kernel on CPU)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_setup
    from vision_processor_tpu.models.colors import ColorState
    from vision_processor_tpu.parallel import multicam as M

    geometry, cams, bm_cfg, det_cfg, params = _build_setup(
        size=(96, 72), n_cams=2
    )
    bm_cfg = dataclasses.replace(bm_cfg, resample_mode="warp")
    cfg = M.MultiCamConfig(bm=bm_cfg, det=det_cfg, n_cams=2)

    rng = np.random.default_rng(0)
    raws = rng.integers(0, 255, (2,) + bm_cfg.raw_shape, dtype=np.uint8)
    packed = np.stack([m.packed() for m, _ in cams])
    scales = np.array([p.field_scale for _, p in cams], dtype=np.float32)
    offsets = np.stack([
        np.array([p.visible_field_extent[0], p.visible_field_extent[2]],
                 dtype=np.float32)
        for _, p in cams
    ])
    colors = np.stack([ColorState().packed() for _ in range(2)])

    step = M.batched_step(cfg)
    roll = M.make_rollout(cfg, step, 3)
    bank = jnp.asarray(np.stack([raws, np.roll(raws, 2, axis=1)]))
    (_, summary, _prev, _colors), compact = roll(
        bank, jnp.asarray(packed), jnp.asarray(scales),
        jnp.asarray(offsets), jnp.asarray(colors), params,
    )
    jax.block_until_ready(compact)
    assert np.asarray(compact["count"]).shape[0] == 3
