"""Device-loop id parity: the in-graph estimate_bot_ids (guarded 2-means,
used by the multi-camera device loops) must assign the same ids as the host
path (host_detect.calc_bot_id) — including under color drift, where the
guard/refinement behavior decides the outcome
(reference src/blobs/hypothesis.cpp:208-227, src/blobs/kmeans.cpp:20-90).
"""
import numpy as np
import pytest

from vision_processor_tpu.models.colors import ColorState
from vision_processor_tpu.models.detector import DetectorConfig, estimate_bot_ids
from vision_processor_tpu.models.host_detect import calc_bot_id
from vision_processor_tpu.models.pattern import PATTERNS


def make_bot_colors(rng, bot_id, colors, drift, noise):
    """Blob colors for a bot under a global color drift + per-blob noise."""
    packed = colors.packed().astype(np.float64)
    yellow, blue, green, pink = packed[2], packed[3], packed[4], packed[5]
    pat = int(PATTERNS[bot_id % 16])
    center = (blue if bot_id >= 16 else yellow) + drift + rng.normal(0, noise, 3)
    sides = []
    for slot in range(1, 5):
        g = (pat >> (4 - slot)) & 1
        base = green if g else pink
        sides.append(base + drift + rng.normal(0, noise, 3))
    return [center] + sides


@pytest.mark.parametrize("drift_vec,noise", [
    ((0.0, 0.0, 0.0), 2.0),          # clean
    ((25.0, -20.0, 15.0), 4.0),      # uniform illumination drift
    ((-35.0, 30.0, 0.0), 8.0),       # heavy drift + noise
])
def test_ids_match_host_under_drift(drift_vec, noise):
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    colors = ColorState()
    drift = np.asarray(drift_vec)

    n_bots = 32
    blob_colors_all = []
    bot_colors_lists = []
    blob_idx = np.zeros((n_bots, 5), dtype=np.int32)
    for b in range(n_bots):
        bot_id = rng.integers(0, 32)
        cols = make_bot_colors(rng, int(bot_id), colors, drift, noise)
        bot_colors_lists.append(cols)
        for s in range(5):
            blob_idx[b, s] = len(blob_colors_all)
            blob_colors_all.append(cols[s])

    blob_color = np.asarray(blob_colors_all, dtype=np.float32)
    det = {
        "bot_blob_idx": jnp.asarray(blob_idx),
        "bot_tracked_id": jnp.full(n_bots, -1, jnp.int32),
    }
    packed = jnp.asarray(colors.packed().astype(np.float32))
    got = np.asarray(estimate_bot_ids(det, jnp.asarray(blob_color), packed))

    for b in range(n_bots):
        want = calc_bot_id(colors, bot_colors_lists[b])
        assert int(got[b]) == want, (
            f"bot {b}: device id {int(got[b])} != host id {want} "
            f"(drift {drift_vec}, noise {noise})"
        )


def test_tracked_ids_passthrough():
    import jax.numpy as jnp

    colors = ColorState()
    det = {
        "bot_blob_idx": jnp.zeros((3, 5), jnp.int32),
        "bot_tracked_id": jnp.asarray([7, -1, 22], jnp.int32),
    }
    blob_color = jnp.asarray(np.tile(colors.packed()[4], (5, 1)).astype(np.float32))
    got = np.asarray(estimate_bot_ids(det, blob_color, jnp.asarray(
        colors.packed().astype(np.float32))))
    assert got[0] == 7
    assert got[2] == 22


def test_kmeans2_batch_matches_scalar():
    """Batched host 2-means must reproduce the scalar guarded semantics."""
    import numpy as np

    from vision_processor_tpu.models.kmeans import kmeans2, kmeans2_batch

    rng = np.random.default_rng(7)
    B = 300
    contrast = rng.integers(0, 256, (B, 3))
    vals = rng.integers(0, 256, (B, 4, 3))
    # include degenerate rows: all-equal values, duplicated points
    vals[0] = vals[0, 0]
    vals[1, 1] = vals[1, 0]
    c1 = np.array([0, 255, 128])
    c2 = np.array([255, 0, 128])

    ok_b, g_b, p_b = kmeans2_batch(contrast, vals, c1, c2)
    for i in range(B):
        ok_s, g_s, p_s = kmeans2(contrast[i], list(vals[i]), c1, c2)
        assert ok_s == bool(ok_b[i]), i
        np.testing.assert_array_equal(g_s, g_b[i], err_msg=f"row {i}")
        np.testing.assert_array_equal(p_s, p_b[i], err_msg=f"row {i}")


def test_calc_bot_ids_batch_matches_scalar():
    import numpy as np

    from vision_processor_tpu.models.colors import ColorState
    from vision_processor_tpu.models.host_detect import calc_bot_id, calc_bot_ids

    rng = np.random.default_rng(3)
    colors = ColorState()
    B = 64
    blob_colors = rng.integers(0, 256, (B, 5, 3))
    ids = calc_bot_ids(colors, blob_colors)
    for i in range(B):
        assert int(ids[i]) == calc_bot_id(colors, list(blob_colors[i])), i
