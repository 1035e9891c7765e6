"""Kernel-logic equality of the fused combo-chain kernel
(ops/combo_pallas.py) against the XLA formulation it replaces
(models/detector._window_hypotheses' elementwise chain), in Pallas
interpret mode so it runs off-TPU. The kernel writes the exact op-for-op
arithmetic, so equality is exact (not approximate)."""
import numpy as np
import pytest


def _xla_chain(o_cos, o_sin, sum_x, sum_y, p5xs, p5ys, anchor_pos,
               ring_count, anchor_valid, combo_max, n_combos, pat, pbar):
    """The reference chain, lifted verbatim from the detector's XLA path
    (slot maps precomputed)."""
    import jax
    import jax.numpy as jnp

    c = n_combos
    o_cos = o_cos[:, :c]
    o_sin = o_sin[:, :c]
    norm2 = o_cos * o_cos + o_sin * o_sin
    ok_n = norm2 > 0.0
    inv_n = jnp.where(ok_n, jax.lax.rsqrt(jnp.maximum(norm2, 1e-30)), 0.0)
    cc = jnp.where(ok_n, o_cos * inv_n, 1.0)
    ss = o_sin * inv_n
    pos_x = (sum_x[:, :c] - (cc * pbar[0] - ss * pbar[1])) / 5.0
    pos_y = (sum_y[:, :c] - (ss * pbar[0] + cc * pbar[1])) / 5.0
    offset_score = None
    for s5 in range(5):
        if s5 == 0:
            p5x = anchor_pos[:, 0:1]
            p5y = anchor_pos[:, 1:2]
        else:
            p5x = p5xs[s5 - 1][:, :c]
            p5y = p5ys[s5 - 1][:, :c]
        dx = (p5x - (pos_x + (cc * pat[s5, 0] - ss * pat[s5, 1]))) / 10.0
        dy = (p5y - (pos_y + (ss * pat[s5, 0] + cc * pat[s5, 1]))) / 10.0
        sc = 1.0 / (1.0 + dx * dx + dy * dy)
        offset_score = sc if offset_score is None else jnp.minimum(
            offset_score, sc)
    combo_ok = jnp.asarray(combo_max)[None, :] < ring_count[:, None]
    combo_ok &= (ring_count[:, None] >= 4) & anchor_valid[:, None]
    score = jnp.where(combo_ok, offset_score, 0.0)
    best = jnp.argmax(score, axis=-1)
    take = lambda arr: jnp.take_along_axis(arr, best[:, None], axis=1)[:, 0]
    return (take(score), take(cc), take(ss), take(pos_x), take(pos_y),
            best.astype(np.int32))


def test_combo_chain_matches_xla_chain():
    import jax.numpy as jnp

    from vision_processor_tpu.models.detector import (
        PATTERN_POS,
        _detection_onehot_tables,
    )
    from vision_processor_tpu.ops.combo_pallas import combo_chain

    rng = np.random.default_rng(3)
    combos_np, w_cos, w_sin, count9, onehot_slot, combo_max = (
        _detection_onehot_tables(8))
    c = combos_np.shape[0]
    cp = -(-c // 128) * 128
    a = 24  # not a block multiple: exercises the pad path

    pat = np.asarray(PATTERN_POS, dtype=np.float32)
    pbar = pat.sum(axis=0)

    def maps():
        m = rng.normal(0, 50, (a, cp)).astype(np.float32)
        m[:, c:] = 0.0
        return jnp.asarray(m)

    o_cos, o_sin = maps(), maps()
    # some anchors with degenerate zero orientation accumulators
    o_cos = o_cos.at[3].set(0.0)
    o_sin = o_sin.at[3].set(0.0)
    sum_x, sum_y = maps() * 10, maps() * 10
    p5xs = [maps() * 10 for _ in range(4)]
    p5ys = [maps() * 10 for _ in range(4)]
    anchor_pos = jnp.asarray(
        rng.normal(0, 1000, (a, 2)).astype(np.float32))
    ring_count = jnp.asarray(
        rng.integers(0, 9, a).astype(np.int32))
    anchor_valid = jnp.asarray(rng.random(a) > 0.2)

    got = combo_chain(o_cos, o_sin, sum_x, sum_y, p5xs, p5ys, anchor_pos,
                      ring_count, anchor_valid, combo_max, c, pat, pbar,
                      interpret=True)
    want = _xla_chain(o_cos, o_sin, sum_x, sum_y, p5xs, p5ys, anchor_pos,
                      ring_count, anchor_valid, combo_max, c, pat, pbar)
    # equality contract: ulp-level (the kernel is compiled as one fused
    # jaxpr, the reference as a chain of ops — FMA contraction differs by
    # ~1 ulp); the winner index must agree wherever the score gap between
    # combos exceeds that ulp noise
    names = ["score", "cc", "ss", "pos_x", "pos_y"]
    score_w = np.asarray(want[0])
    best_g = np.asarray(got[5])
    best_w = np.asarray(want[5])
    same_winner = best_g == best_w
    for name, g, w in zip(names, got, want):
        g = np.asarray(g)
        w = np.asarray(w)
        comp = same_winner if name != "score" else slice(None)
        assert np.allclose(g[comp], w[comp], rtol=1e-5, atol=1e-7), (
            f"{name}: max|diff|="
            f"{np.max(np.abs(g.astype(np.float64) - w.astype(np.float64)))}"
        )
    # winners may differ only on ulp-level score ties
    flipped = ~same_winner & (score_w > 0)
    assert np.all(
        np.isclose(np.asarray(got[0])[flipped], score_w[flipped],
                   rtol=1e-5)
    ), "winner flipped on a non-tie"
    assert np.mean(~same_winner) < 0.2


def test_combo_chain_all_invalid_anchor():
    """Anchors with no qualifying combos must come back score 0 and the
    winner fields must be the combo-0 values (argmax tie rule)."""
    import jax.numpy as jnp

    from vision_processor_tpu.models.detector import (
        PATTERN_POS,
        _detection_onehot_tables,
    )
    from vision_processor_tpu.ops.combo_pallas import combo_chain

    combos_np, *_rest, combo_max = (
        _detection_onehot_tables(8)[0],
        *_detection_onehot_tables(8)[1:5],
        _detection_onehot_tables(8)[5],
    )
    c = combos_np.shape[0]
    cp = -(-c // 128) * 128
    a = 8
    pat = np.asarray(PATTERN_POS, dtype=np.float32)
    pbar = pat.sum(axis=0)
    z = jnp.zeros((a, cp), jnp.float32)
    one = jnp.ones((a, cp), jnp.float32)
    got = combo_chain(one, z, z, z, [z] * 4, [z] * 4,
                      jnp.zeros((a, 2), jnp.float32),
                      jnp.zeros(a, jnp.int32),  # ring_count 0: no combo ok
                      jnp.ones(a, bool), combo_max, c, pat, pbar,
                      interpret=True)
    assert np.all(np.asarray(got[0]) == 0.0)
    assert np.all(np.asarray(got[5]) == 0)
