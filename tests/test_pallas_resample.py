"""Semantic validation of the experimental Pallas resampling kernel in
interpreter mode (the Mosaic lowering is still being debugged; the
production pipeline uses the XLA gather)."""
import numpy as np
import pytest

from vision_processor_tpu.ops import pallas_resample as PR


def test_band_fits_near_nadir(divb_field, overhead_model):
    ok = PR.band_fits(
        overhead_model, 5.0, (-2300.0, -1700.0), (96, 128),
        overhead_model.size, 150.0,
    )
    assert ok


def test_gather_corners_interpret():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    h, w = 64, 256
    stacked = rng.integers(0, 255, (h, w, 16)).astype(np.float32)
    # near-identity map (the kernel's banding contract, checked by band_fits)
    hf, wf = 56, 248
    yy, xx = np.meshgrid(
        np.linspace(2, h - 4, hf), np.linspace(2, w - 4, wf), indexing="ij"
    )
    y0 = np.clip((yy + rng.uniform(-1, 1, yy.shape)).astype(np.int32), 0, h - 2)
    x0 = np.clip((xx + rng.uniform(-1, 1, xx.shape)).astype(np.int32), 0, w - 2)

    out = np.asarray(
        PR.gather_corners_pallas(
            jnp.asarray(stacked), jnp.asarray(y0), jnp.asarray(x0),
            interpret=True,
        )
    )
    ref = stacked[y0, x0]
    np.testing.assert_allclose(out, ref, atol=1e-3)
