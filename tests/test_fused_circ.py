"""Fused Pallas circularity (ops/blob_pallas.py) vs the XLA chain.

The production TPU path computes the blob response with the fused band
kernel; CPU keeps the XLA chain. These tests run the kernel through the
Pallas interpreter: interior values must match to f32 reassociation and
the DETECTIONS on a rendered scene must be identical (the warp-resample
equivalence standard; the border band is excluded by contract — see the
module docstring's clamp-vs-replicate note).
"""
from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from vision_processor_tpu.ops import blob as B
from vision_processor_tpu.ops.blob_pallas import circularity_fused


@pytest.mark.parametrize("h,w,o,r", [(64, 200, 2, 4), (40, 140, 1, 3),
                                     (33, 257, 3, 5)])
def test_interior_value_parity(h, w, o, r):
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))
    ref = np.asarray(
        B.circularity(B.summed_area_table(B.gradient_dot(flat, o)), r))
    got = np.asarray(circularity_fused(flat, o, r))
    assert got.shape == ref.shape
    m = r + 1
    scale = np.abs(ref[m:-m, m:-m]).max() + 1.0
    rel = np.abs(ref[m:-m, m:-m] - got[m:-m, m:-m]).max() / scale
    assert rel < 1e-5, f"interior relative error {rel:.2e}"


def test_r1_falls_back_exactly():
    rng = np.random.default_rng(1)
    flat = jnp.asarray(rng.uniform(0, 255, (24, 140, 3)).astype(np.float32))
    ref = np.asarray(
        B.circularity(B.summed_area_table(B.gradient_dot(flat, 2)), 1))
    got = np.asarray(circularity_fused(flat, 2, 1))
    np.testing.assert_array_equal(ref, got)


def test_detection_equivalence_on_scene(divb_field, overhead_model,
                                        monkeypatch):
    """Full blob machine with the fused kernel (interpreter) finds the
    same blobs as the XLA chain on a rendered scene."""
    from vision_processor_tpu.io.synthetic import Scene, SceneBall, SceneBot, render_raw
    from vision_processor_tpu.models.perspective import Perspective
    from vision_processor_tpu.ops.pipeline import BlobMachine, BlobMachineConfig
    from vision_processor_tpu.ops import pipeline as P

    geometry = divb_field.geometry
    geometry.ClearField("calib")
    geometry.calib.append(overhead_model.to_proto(0))
    persp = Perspective(cam_id=0)
    assert persp.update_geometry(geometry, 1, 960, 720, 150.0, 1.0)
    scene = Scene(
        bots=[SceneBot(4, "yellow", -2700.0, 500.0, 0.8)],
        balls=[SceneBall(-3100.0, -900.0)],
    )
    raw = render_raw(overhead_model, geometry.field, scene, "RGGB")
    cfg = BlobMachineConfig.from_perspective(
        persp, "RGGB", raw.shape, max_blobs=128)

    bm = BlobMachine(cfg)
    ref = bm(raw, overhead_model.packed(), 150.0, 15.0)

    import vision_processor_tpu.ops.blob_pallas as BP

    monkeypatch.setattr(BP, "use_fused_circ", lambda: True)
    bm2 = BlobMachine(cfg)
    got = bm2(raw, overhead_model.packed(), 150.0, 15.0)

    ref_valid = np.asarray(ref["valid"])
    got_valid = np.asarray(got["valid"])
    np.testing.assert_array_equal(ref_valid, got_valid)
    n = int(ref_valid.sum())
    assert n >= 6  # pattern blobs + ball landed
    # slot order may differ for near-tied scores; compare as sets by pos
    rp = np.asarray(ref["pos"])[:n]
    gp = np.asarray(got["pos"])[:n]
    order_r = np.lexsort(rp.T)
    order_g = np.lexsort(gp.T)
    np.testing.assert_allclose(gp[order_g], rp[order_r], atol=1e-2)
    # score = circ / sum(stddev): for near-uniform discs the variance
    # cancellation amplifies f32 reassociation noise unboundedly in the
    # score domain (both formulations suffer it; the reference's f32
    # OpenCL path does too) — compare in the stddev domain instead
    rs = np.asarray(ref["circ"])[:n][order_r] / np.maximum(
        np.asarray(ref["score"])[:n][order_r], 1e-9)
    gs = np.asarray(got["circ"])[:n][order_g] / np.maximum(
        np.asarray(got["score"])[:n][order_g], 1e-9)
    np.testing.assert_allclose(gs, rs, atol=0.05)
