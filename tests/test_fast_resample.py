"""Fast-path resampling parity: the packed single-cell sampler must match
the exact per-plane bilinear path closely, and the full pipeline must find
the same blobs either way."""
import numpy as np
import pytest

from vision_processor_tpu.io.synthetic import Scene, SceneBall, SceneBot, render_raw
from vision_processor_tpu.models.perspective import Perspective
from vision_processor_tpu.ops import frame as F
from vision_processor_tpu.ops.pipeline import BlobMachine, BlobMachineConfig

MAXH = 150.0


@pytest.fixture(scope="module")
def setup(divb_field, overhead_model):
    persp = Perspective(cam_id=0)
    geometry = divb_field.geometry
    geometry.ClearField("calib")
    geometry.calib.append(overhead_model.to_proto(0))
    assert persp.update_geometry(geometry, 1, 960, 720, MAXH, 1.0)
    scene = Scene(
        bots=[SceneBot(3, "yellow", -2800.0, 600.0, 0.7)],
        balls=[SceneBall(-3400.0, -1500.0)],
        noise_sigma=1.0,
    )
    raw = render_raw(persp.model, geometry.field, scene, "RGGB")
    return persp, raw


def test_flat_images_match(setup):
    persp, raw = setup
    import jax.numpy as jnp

    hf = int(persp.reprojected_field_size[1])
    wf = int(persp.reprojected_field_size[0])
    packed_cam = jnp.asarray(persp.model.packed())
    offset = (
        float(persp.visible_field_extent[0]),
        float(persp.visible_field_extent[2]),
    )

    planes = F.raw2quad(jnp.asarray(raw), "RGGB")
    exact = np.asarray(
        F.resample_flat(
            planes, packed_cam, jnp.float32(MAXH), persp.field_scale,
            offset, (hf, wf), "RGGB",
        )
    )
    packed = F.raw2planes_packed(jnp.asarray(raw), "RGGB")
    fast = np.asarray(
        F.resample_flat_packed(
            packed, packed_cam, jnp.float32(MAXH), persp.field_scale,
            offset, (hf, wf), "RGGB",
        )
    )
    diff = np.abs(exact - fast)
    # boundary-cell approximation: tiny on average, bounded in the tail
    assert diff.mean() < 1.0, diff.mean()
    assert np.percentile(diff, 99) < 8.0


def test_pipeline_blobs_match(setup):
    persp, raw = setup
    kwargs = dict(max_blobs=32)
    cfg_exact = BlobMachineConfig.from_perspective(persp, "RGGB", raw.shape, **kwargs)
    from dataclasses import replace

    out_e = BlobMachine(replace(cfg_exact, exact_resample=True))(
        raw, persp.model.packed(), MAXH, 15.0
    )
    out_f = BlobMachine(cfg_exact)(raw, persp.model.packed(), MAXH, 15.0)

    # compare the meaningful blobs (real pattern blobs score far above the
    # sampling noise floor); low-score noise duplicates may differ
    ve = np.asarray(out_e["valid"]) & (np.asarray(out_e["score"]) > 10)
    vf = np.asarray(out_f["valid"]) & (np.asarray(out_f["score"]) > 10)
    pe = np.asarray(out_e["field_pos"])[ve]
    pf = np.asarray(out_f["field_pos"])[vf]
    assert abs(int(ve.sum()) - int(vf.sum())) <= 1
    # 8 mm tolerance: the exact path can split one physical blob into two
    # adjacent local maxima that the fast path merges
    for p in pe:
        d = np.linalg.norm(pf - p, axis=-1).min()
        assert d < 8.0, (p, d)


def test_grid_cache_matches_packed(setup):
    """The cached-projection path must be (near-)bit-identical to the
    packed sampler: same gather indices, same weights up to fp op order."""
    persp, raw = setup
    import jax.numpy as jnp

    hf = int(persp.reprojected_field_size[1])
    wf = int(persp.reprojected_field_size[0])
    packed_cam = jnp.asarray(persp.model.packed())
    offset = (
        float(persp.visible_field_extent[0]),
        float(persp.visible_field_extent[2]),
    )

    packed = F.raw2planes_packed(jnp.asarray(raw), "RGGB")
    fast = np.asarray(
        F.resample_flat_packed(
            packed, packed_cam, jnp.float32(MAXH), persp.field_scale,
            offset, (hf, wf), "RGGB",
        )
    )
    grid = F.resample_grid(
        packed_cam, jnp.float32(MAXH), persp.field_scale, offset,
        (hf, wf), packed.shape[:2],
    )
    cached = np.asarray(F.resample_flat_grid(packed, grid, "RGGB"))
    assert np.max(np.abs(fast - cached)) < 1e-3


def test_grid_cache_through_blob_machine(setup):
    """blob_machine(rs_grid=...) finds identical blobs to the inline path."""
    persp, raw = setup
    import jax

    from vision_processor_tpu.ops.pipeline import blob_machine

    cfg = BlobMachineConfig.from_perspective(persp, "RGGB", raw.shape, max_blobs=32)
    packed_cam = persp.model.packed()
    grid = cfg.make_resample_grid(packed_cam, MAXH)

    import jax.numpy as jnp

    base = jax.jit(lambda r: blob_machine(
        cfg, r, jnp.asarray(packed_cam), jnp.float32(MAXH), jnp.float32(15.0)
    ))(raw)
    cached = jax.jit(lambda r, g: blob_machine(
        cfg, r, jnp.asarray(packed_cam), jnp.float32(MAXH), jnp.float32(15.0),
        rs_grid=g,
    ))(raw, grid)

    vb = np.asarray(base["valid"])
    vc = np.asarray(cached["valid"])
    assert (vb == vc).all()
    np.testing.assert_allclose(
        np.asarray(base["field_pos"])[vb],
        np.asarray(cached["field_pos"])[vc],
        atol=0.05,
    )


def test_corner_stack_u32_bit_exact(setup):
    """The u32-built corner stack must be byte-identical to the u8 build
    (guards the little-endian bitcast assumption on every platform)."""
    persp, raw = setup
    import jax.numpy as jnp

    packed = F.raw2planes_packed(jnp.asarray(raw), "RGGB")
    ref = np.asarray(F.corner_stack(packed))
    got = np.asarray(F.corner_stack_u32(jnp.asarray(raw), "RGGB"))
    np.testing.assert_array_equal(ref, got)

    # BGR path too
    rng = np.random.default_rng(0)
    bgr = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    packed_bgr = F.raw2planes_packed(jnp.asarray(bgr), "BGR")
    ref_b = np.asarray(F.corner_stack(packed_bgr))
    got_b = np.asarray(F.corner_stack_u32(jnp.asarray(bgr), "BGR"))
    np.testing.assert_array_equal(ref_b, got_b)


def test_resample_flat_grid_raw_matches(setup):
    persp, raw = setup
    import jax.numpy as jnp

    hf = int(persp.reprojected_field_size[1])
    wf = int(persp.reprojected_field_size[0])
    packed_cam = jnp.asarray(persp.model.packed())
    offset = (
        float(persp.visible_field_extent[0]),
        float(persp.visible_field_extent[2]),
    )
    packed = F.raw2planes_packed(jnp.asarray(raw), "RGGB")
    grid = F.resample_grid(
        packed_cam, jnp.float32(MAXH), persp.field_scale, offset,
        (hf, wf), packed.shape[:2],
    )
    a = np.asarray(F.resample_flat_grid(packed, grid, "RGGB"))
    b = np.asarray(F.resample_flat_grid_raw(jnp.asarray(raw), grid, "RGGB"))
    np.testing.assert_array_equal(a, b)
