"""Staggered per-camera dispatch plan == batched step, semantically.

The staggered serial pipeline (parallel/multicam.percam_core_step +
staggered_tail_step) exists to hide uploads and host finishing inside one
frame-set (bench.py measure_staggered_serial; VERDICT r3 item 2). It must
produce the same wire-visible results as the batched program it replaces:
identical constellations, ids, validity and ball sets; float scores equal
to cross-compilation reduction-order tolerance."""
import numpy as np
import pytest


def test_staggered_matches_batched():
    import jax
    import jax.numpy as jnp

    import bench
    from vision_processor_tpu.app.processor import TrackedArrays
    from vision_processor_tpu.models.colors import ColorState
    from vision_processor_tpu.models.device_finish import pack_field_marks
    from vision_processor_tpu.parallel import multicam as M

    rig = bench.build_rig(n_cams=2, max_blobs=600, resampling_factor=1.25,
                          resample_mode="gather")
    cfg, raws, packed, scales, offsets, colors, params = rig[:7]
    cams = rig[8]

    marks_one = pack_field_marks(cams[0][1].field, 10.0)
    marks = jax.tree.map(
        lambda *xs: jnp.asarray(np.stack(xs)), *([marks_one] * cfg.n_cams)
    )
    refs = jnp.asarray(
        np.stack([ColorState().packed_refs()] * cfg.n_cams))

    grids = M.make_resample_grids(
        cfg, packed, float(params["max_bot_height"]), scales, offsets)
    tracked = TrackedArrays.build({}, 0.0, cfg.det.max_tracked).as_dict()

    # batched reference
    step = M.batched_step_host_tracked(cfg)
    b_blobs, b_det, b_fin = jax.device_get(step(
        jnp.asarray(raws), packed, scales, offsets, colors, tracked,
        params, grids, refs, marks,
    ))

    # staggered: per-camera cores + one tail
    core = M.percam_core_step(cfg)
    outs = [
        core(jnp.asarray(raws[c]), jnp.asarray(packed[c]),
             jnp.float32(scales[c]), jnp.asarray(offsets[c]),
             jnp.asarray(colors[c]), tracked, M.params_for_cam(params, c),
             jax.tree.map(lambda x: x[c], grids))
        for c in range(cfg.n_cams)
    ]
    s_blobs, s_det = (jax.tree.map(lambda *xs: jnp.stack(xs), *grp)
                      for grp in zip(*outs))
    tail = M.staggered_tail_step(cfg)
    s_det, s_fin = jax.device_get(tail(
        s_blobs, s_det, jnp.asarray(colors), jnp.asarray(packed), params,
        refs, marks,
    ))
    s_blobs = jax.device_get(s_blobs)

    # extraction identical
    np.testing.assert_array_equal(b_blobs["count"], s_blobs["count"])
    np.testing.assert_array_equal(b_blobs["field_pos"], s_blobs["field_pos"])
    # wire-visible detections: discrete outputs exact, scores to
    # cross-compilation reduction-order tolerance
    np.testing.assert_array_equal(b_det["bot_valid"], s_det["bot_valid"])
    np.testing.assert_array_equal(b_det["bot_blob_idx"],
                                  s_det["bot_blob_idx"])
    np.testing.assert_allclose(b_det["bot_pos"], s_det["bot_pos"],
                               atol=1e-3)
    np.testing.assert_allclose(b_det["bot_score"], s_det["bot_score"],
                               atol=1e-4)
    np.testing.assert_array_equal(b_fin["bot_id"], s_fin["bot_id"])
    np.testing.assert_array_equal(b_fin["ball_valid"], s_fin["ball_valid"])
    np.testing.assert_array_equal(b_fin["colors7"], s_fin["colors7"])

    # real work flowed through both paths: every camera emitted robots
    # (the 2-camera harness rig is coarser than production — 6.07 mm/px —
    # so not all 4 planted bots per camera resolve; recall is gated by the
    # bench/dense tests, parity is what this file pins)
    per_cam = np.sum(b_det["bot_valid"], axis=1)
    assert (per_cam >= 1).all(), per_cam
