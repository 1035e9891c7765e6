"""Golden tests for the blob response chain against direct numpy
transcriptions of the reference OpenCL kernel semantics (clamp-to-edge
sampling, quadrant SAT reads, disc statistics, local-max compaction)."""
import numpy as np
import pytest

from vision_processor_tpu.ops import blob as B


def np_clamp_read(img, x, y):
    h, w = img.shape[:2]
    return img[np.clip(y, 0, h - 1), np.clip(x, 0, w - 1)]


def np_gradient_dot(flat, offset):
    h, w, _ = flat.shape
    out = np.zeros((h, w), dtype=np.float64)
    for y in range(h):
        for x in range(w):
            gx = np_clamp_read(flat, x + offset, y) - np_clamp_read(flat, x - offset, y)
            gy = np_clamp_read(flat, x, y + offset) - np_clamp_read(flat, x, y - offset)
            out[y, x] = np.sum(gx * gy)
    return out


def np_sat(img):
    return img.cumsum(axis=1).cumsum(axis=0)


def np_circularity(sat, r):
    h, w = sat.shape
    out = np.zeros((h, w))
    for y in range(h):
        for x in range(w):
            def rd(dx, dy):
                return np_clamp_read(sat, x + dx, y + dy)

            pp = rd(r, r) - rd(r, 1) - rd(1, r) + rd(1, 1)
            pn = rd(r, -r) - rd(r, -1) - rd(1, -r) + rd(1, -1)
            np_q = rd(-r, r) - rd(-r, 1) - rd(-1, r) + rd(-1, 1)
            nn = rd(-r, -r) - rd(-r, -1) - rd(-1, -r) + rd(-1, -1)
            out[y, x] = min(pp, nn, pn, np_q) / (r * r)
    return out


def np_disc_stats(flat, radius):
    h, w, c = flat.shape
    s1 = np.zeros((h, w, c))
    s2 = np.zeros((h, w, c))
    n = 0
    offs = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dx * dx + dy * dy <= radius * radius:
                offs.append((dy, dx))
    n = len(offs)
    for y in range(h):
        for x in range(w):
            for dy, dx in offs:
                v = np_clamp_read(flat, x + dx, y + dy)
                s1[y, x] += v
                s2[y, x] += v * v
    return s1, s2, n


@pytest.fixture(scope="module")
def flat_img():
    rng = np.random.default_rng(42)
    img = rng.uniform(60, 200, size=(24, 32, 3)).astype(np.float32)
    # paint a couple of bright discs to create real blobs
    for cx, cy in [(8, 8), (22, 14)]:
        for y in range(24):
            for x in range(32):
                if (x - cx) ** 2 + (y - cy) ** 2 <= 9:
                    img[y, x] = [240, 70, 70]
    return img


def test_gradient_dot_matches_numpy(flat_img):
    got = np.asarray(B.gradient_dot(flat_img, 2))
    want = np_gradient_dot(flat_img.astype(np.float64), 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_sat_matches_numpy(flat_img):
    g = np_gradient_dot(flat_img.astype(np.float64), 2)
    got = np.asarray(B.summed_area_table(g.astype(np.float32)))
    np.testing.assert_allclose(got, np_sat(g), rtol=1e-4, atol=0.5)


def test_circularity_matches_numpy(flat_img):
    g = np_gradient_dot(flat_img.astype(np.float64), 2).astype(np.float32)
    sat = np.asarray(B.summed_area_table(g))
    got = np.asarray(B.circularity(sat, 3))
    want = np_circularity(sat.astype(np.float64), 3)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=0.5)


def test_disc_stats_matches_numpy(flat_img):
    s1, s2, n = B.disc_stats(flat_img, 3)
    w1, w2, wn = np_disc_stats(flat_img.astype(np.float64), 3)
    assert n == wn
    np.testing.assert_allclose(np.asarray(s1), w1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), w2, rtol=1e-5)


def test_extract_blobs_finds_painted_discs(flat_img):
    g = B.gradient_dot(flat_img, 2)
    sat = B.summed_area_table(g)
    circ = np.asarray(B.circularity(sat, 3))

    out = B.extract_blobs(
        flat_img, circ, np.float32(15.0), np.float32(0.0), radius=3, max_blobs=8
    )
    valid = np.asarray(out["valid"])
    pos = np.asarray(out["pos"])[valid]
    assert valid.sum() >= 2
    # both painted disc centers recovered within 1.5 px
    for cx, cy in [(8, 8), (22, 14)]:
        d = np.linalg.norm(pos - [cx, cy], axis=-1).min()
        assert d < 1.5, (pos, (cx, cy))
    # scores sorted descending in the slots
    scores = np.asarray(out["score"])[valid]
    assert np.all(np.diff(scores) <= 1e-6)


def test_extract_blobs_subpixel_and_colors(flat_img):
    g = B.gradient_dot(flat_img, 2)
    sat = B.summed_area_table(g)
    circ = np.asarray(B.circularity(sat, 3))
    out = B.extract_blobs(
        flat_img, circ, np.float32(15.0), np.float32(0.0), radius=3, max_blobs=8
    )
    valid = np.asarray(out["valid"])
    centers = np.asarray(out["center"])[valid]
    colors = np.asarray(out["color"])[valid]
    pos = np.asarray(out["pos"])[valid]
    # center color at the painted blob is the painted color
    i = np.argmin(np.linalg.norm(pos - [8, 8], axis=-1))
    np.testing.assert_allclose(centers[i], [240, 70, 70], atol=1e-3)
    # disc mean color is a blend dominated by the paint
    assert colors[i][0] > 150

    # count matches the number of valid mask pixels
    s1, s2, n = np_disc_stats(flat_img.astype(np.float64), 3)
    mean = s1 / n
    std = np.sqrt(np.maximum(s2 / n - mean**2, 0)).sum(axis=-1)
    score = circ / np.maximum(std, 1e-12)
    lm = np.ones_like(circ, dtype=bool)
    h, w = circ.shape
    for y in range(h):
        for x in range(w):
            for dx, dy in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
                if np_clamp_read(circ, x + dx, y + dy) > circ[y, x]:
                    lm[y, x] = False
    want_count = int(((circ >= 15.0) & lm & (score >= 0.0)).sum())
    assert int(out["count"]) == want_count


def test_legacy_circularity_runs(flat_img):
    out = np.asarray(B.legacy_circularity(flat_img[..., 0], 3))
    assert out.shape == flat_img.shape[:2]
    assert np.isfinite(out).all()


def test_radius_helpers():
    assert B.gradient_offset(25.0, 5.0) == 1  # ceil(5)/3 = 1
    assert B.sat_radius(20.0, 5.0) == 4
    assert B.disc_radius(20.0, 5.0) == 4
    assert B.disc_radius(21.5, 5.0) == 4
    assert B.sat_radius(21.5, 5.0) == 5


def test_row_saturated_extraction_keeps_all_blobs():
    """A wall of blobs concentrated on ONE flat-grid row must not be
    clipped by the two-stage compaction's per-row window while the blob
    budget is free (the same quiet-cap genre as the detector's anchor
    window): the occupancy-adaptive cond must route such scenes through
    the exact flat-map top_k. 30 peaks on one row exceeds the m=16 row
    window at this shape; before the cond only 26 of 40 survived."""
    import jax.numpy as jnp

    h, w = 120, 200
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.normal(128, 5, (h, w, 3)).astype(np.float32))
    circ = np.zeros((h, w), np.float32)
    xs = np.arange(5, 5 + 30 * 6, 6)
    circ[60, xs] = 100.0 + np.arange(30)
    circ[20, np.arange(5, 65, 6)] = 50.0

    out = B.extract_blobs(flat, jnp.asarray(circ), circ_threshold=10.0,
                          radius=2, max_blobs=256, min_score=0.0)
    assert int(out["count"]) == 40
    assert int(out["valid"].sum()) == 40
    got_x = np.sort(np.asarray(out["pos"])[np.asarray(out["valid"]), 0])
    assert np.allclose(np.sort(np.concatenate(
        [xs, np.arange(5, 65, 6)])), np.round(got_x))

    # the score-first (fused-response) path takes the same cond
    masked, mean, cnt = B.blob_response(flat, jnp.asarray(circ), 10.0, 2)
    out2 = B.extract_blobs_scored(flat, jnp.asarray(circ), masked, mean,
                                  cnt, max_blobs=256)
    assert int(out2["valid"].sum()) == 40

    # sparse scenes stay on the two-stage path and remain exact
    circ2 = np.zeros((h, w), np.float32)
    ys = rng.integers(0, h, 60)
    xs2 = rng.integers(0, w, 60)
    circ2[ys, xs2] = rng.random(60) * 90 + 10
    o = B.extract_blobs(flat, jnp.asarray(circ2), 10.0, radius=2,
                        max_blobs=64, min_score=0.0)
    assert int(o["valid"].sum()) == int(o["count"])


def test_compact_masked_occupancy_tiers_are_exact():
    """The three occupancy tiers of the compaction (6-lane sparse row
    stage / m-lane row stage / flat-map fallback) must each return the
    EXACT flat top-k selection; the tier only changes how much work the
    device does, never the result."""
    import jax
    import jax.numpy as jnp

    h, w, max_blobs = 120, 200, 256
    rng = np.random.default_rng(7)

    def build(per_row_max, n):
        """n distinct-valued peaks, none exceeding per_row_max per row."""
        m = np.full((h, w), -np.inf, np.float32)
        placed = 0
        counts = np.zeros(h, int)
        while placed < n:
            y = int(rng.integers(0, h))
            if counts[y] >= per_row_max:
                continue
            x = int(rng.integers(0, w))
            if np.isfinite(m[y, x]):
                continue
            m[y, x] = 10.0 + placed  # distinct: no tie ambiguity
            counts[y] += 1
            placed += 1
        return m

    dense_row = np.full((h, w), -np.inf, np.float32)
    dense_row[60, np.arange(0, 30 * 6, 6)] = 100.0 + np.arange(30)

    for masked in (
        build(3, 40),          # tier 0: densest row <= m_small
        build(12, 300),        # tier 1: densest row <= m (=16)
        dense_row,             # tier 2: a 30-candidate row -> flat map
    ):
        vals, idx = jax.jit(
            lambda x: B._compact_masked(x, max_blobs)
        )(jnp.asarray(masked))
        ref_vals, ref_idx = jax.lax.top_k(
            jnp.asarray(masked).reshape(-1), max_blobs)
        np.testing.assert_array_equal(np.asarray(vals),
                                      np.asarray(ref_vals))
        ok = np.asarray(vals) > -np.inf
        np.testing.assert_array_equal(np.asarray(idx)[ok],
                                      np.asarray(ref_idx)[ok])
