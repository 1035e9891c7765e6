"""Fused per-combo score chain + winner argmax for the detection search.

The detection hypothesis search scores every (anchor, combo) pair of the
static cyclic-4-subset table (models/detector._window_hypotheses): after
the one-hot MXU contractions produce the per-combo orientation sums and
slot positions, a ~30-op elementwise chain over the (A, C) maps computes
the normalized orientation, the candidate position, the 5 slot offset
scores and their min, and an argmax reduces over combos. In XLA that
chain materializes a dozen (A, C) f32 maps in HBM between fusions —
measured ~0.13 ms/camera at the dense full window (A=512, C=280;
experiments/det_window_micro.py) with the matmuls themselves ~free.

This kernel keeps the whole chain in VMEM: the 12 matmul outputs are
read once per 64-anchor block, every intermediate lives in registers,
and only the per-anchor winner (score, orientation vector, position,
combo index) is written back. The arithmetic is the op-for-op sequence
of the XLA formulation (same divisions, same min-of-slot-score order,
argmax ties to the lowest combo index); scores agree to the ~1-ulp FMA
contraction difference between the fused kernel and the op chain, so
only exact near-ties between combos can pick a different rotation of
the same constellation — the same caveat the one-hot matmul
formulation already carries (models/detector.py). Kernel-logic
equality is pinned in interpret mode by tests/test_combo_pallas.py.

The matmul RHS tables are padded to a 128-multiple combo axis by the
caller (zero columns), so the maps arrive lane-aligned; padded lanes
carry combo_max=+inf and can never win.

Reference parity: this implements the same per-anchor argmax over the
reference's cyclic 4-subset enumeration (reference src/main.cpp:63-75,
scored per src/blobs/hypothesis.cpp:156-205); only the schedule is new.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

BLK_A = 64   # anchors per block
LAN = 128


def use_combo_kernel() -> bool:
    """Default OFF: measured on TPU v5e at both the dense (A=512) and
    sparse (A=128 tier) windows, the fused kernel runs ~0.06 ms per
    4-camera frame-set SLOWER than the XLA chain (5.02 vs 4.97 dense,
    3.70 vs 3.64 sparse, inner-band separated) — XLA already fuses the
    elementwise chain well, and the kernel pays aux packing, zero-padded
    tables and per-block dispatch instead. Kept as an opt-in
    (VPTPU_COMBO_KERNEL=1) for other TPU generations; the kernel logic
    stays pinned by tests/test_combo_pallas.py."""
    return (
        os.environ.get("VPTPU_COMBO_KERNEL", "0") == "1"
        and jax.default_backend() == "tpu"
    )


def _combo_chain_kernel(ocos_ref, osin_ref, sumx_ref, sumy_ref,
                        px1_ref, px2_ref, px3_ref, px4_ref,
                        py1_ref, py2_ref, py3_ref, py4_ref,
                        aux_ref, cmax_ref,
                        outf_ref, outi_ref, *, pat, pbar):
    oc = ocos_ref[:]
    os_ = osin_ref[:]
    norm2 = oc * oc + os_ * os_
    ok_n = norm2 > 0.0
    inv_n = jnp.where(ok_n, jax.lax.rsqrt(jnp.maximum(norm2, 1e-30)), 0.0)
    cc = jnp.where(ok_n, oc * inv_n, 1.0)
    ss = os_ * inv_n

    pos_x = (sumx_ref[:] - (cc * pbar[0] - ss * pbar[1])) / 5.0
    pos_y = (sumy_ref[:] - (ss * pbar[0] + cc * pbar[1])) / 5.0

    px = [None, px1_ref, px2_ref, px3_ref, px4_ref]
    py = [None, py1_ref, py2_ref, py3_ref, py4_ref]
    ax = aux_ref[:, 0:1]
    ay = aux_ref[:, 1:2]
    offset_score = None
    for s5 in range(5):
        if s5 == 0:
            p5x, p5y = ax, ay
        else:
            p5x, p5y = px[s5][:], py[s5][:]
        dx = (p5x - (pos_x + (cc * pat[s5, 0] - ss * pat[s5, 1]))) / 10.0
        dy = (p5y - (pos_y + (ss * pat[s5, 0] + cc * pat[s5, 1]))) / 10.0
        sc = 1.0 / (1.0 + dx * dx + dy * dy)
        offset_score = sc if offset_score is None else jnp.minimum(
            offset_score, sc)

    rc = aux_ref[:, 2:3]
    av = aux_ref[:, 3:4] > 0.0
    combo_ok = (cmax_ref[0:1, :] < rc) & (rc >= 4.0) & av
    score = jnp.where(combo_ok, offset_score, 0.0)

    rows, cp = score.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, cp), 1)
    best_v = jnp.max(score, axis=1, keepdims=True)
    best_i = jnp.min(
        jnp.where(score == best_v, iota, cp), axis=1, keepdims=True
    ).astype(jnp.int32)
    sel = iota == best_i
    pick = lambda t: jnp.sum(jnp.where(sel, t, 0.0), axis=1, keepdims=True)

    col = jax.lax.broadcasted_iota(jnp.int32, (rows, LAN), 1)
    outf = jnp.zeros((rows, LAN), jnp.float32)
    outf = jnp.where(col == 0, best_v, outf)
    outf = jnp.where(col == 1, pick(cc), outf)
    outf = jnp.where(col == 2, pick(ss), outf)
    outf = jnp.where(col == 3, pick(pos_x), outf)
    outf = jnp.where(col == 4, pick(pos_y), outf)
    outf_ref[:] = outf
    outi_ref[:] = jnp.where(col == 0, best_i, 0)


def combo_chain(o_cos, o_sin, sum_x, sum_y, p5xs, p5ys, anchor_pos,
                ring_count, anchor_valid, combo_max, n_combos: int,
                pat, pbar, interpret: bool = False):
    """Per-anchor winner over the combo maps.

    o_cos/o_sin/sum_x/sum_y: (A, CP) f32 matmul outputs (CP = combo axis
    padded to a 128 multiple via zero table columns); p5xs/p5ys: lists of
    4 (A, CP) slot position maps for slots 1..4; anchor_pos (A, 2);
    ring_count (A,) int; anchor_valid (A,) bool; combo_max (C,) static
    table; pat (5, 2) / pbar (2,) static pattern constants.

    Returns (best_score, cc, ss, pos_x, pos_y, best_idx), each (A,).
    """
    a, cp = o_cos.shape
    assert cp % LAN == 0, cp
    blk = min(BLK_A if not interpret else 8, a)
    ap = ((a + blk - 1) // blk) * blk

    def padA(x):
        return jnp.pad(x, ((0, ap - a), (0, 0))) if ap != a else x

    aux = jnp.zeros((ap, LAN), jnp.float32)
    aux = aux.at[:a, 0].set(anchor_pos[:, 0])
    aux = aux.at[:a, 1].set(anchor_pos[:, 1])
    aux = aux.at[:a, 2].set(ring_count.astype(jnp.float32))
    aux = aux.at[:a, 3].set(anchor_valid.astype(jnp.float32))

    cmax = np.full((8, cp), np.inf, np.float32)
    cmax[:, :n_combos] = np.asarray(combo_max, np.float32)[None, :]

    kern = functools.partial(
        _combo_chain_kernel,
        pat=np.asarray(pat, np.float32),
        pbar=np.asarray(pbar, np.float32),
    )
    spec_a = pl.BlockSpec((blk, cp), lambda i: (i, 0))
    outf, outi = pl.pallas_call(
        kern,
        grid=(ap // blk,),
        interpret=interpret,
        in_specs=[spec_a] * 12 + [
            pl.BlockSpec((blk, LAN), lambda i: (i, 0)),
            pl.BlockSpec((8, cp), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((blk, LAN), lambda i: (i, 0)),
            pl.BlockSpec((blk, LAN), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ap, LAN), jnp.float32),
            jax.ShapeDtypeStruct((ap, LAN), jnp.int32),
        ],
    )(padA(o_cos), padA(o_sin), padA(sum_x), padA(sum_y),
      *[padA(x) for x in p5xs], *[padA(y) for y in p5ys],
      aux, jnp.asarray(cmax))
    return (outf[:a, 0], outf[:a, 1], outf[:a, 2], outf[:a, 3],
            outf[:a, 4], outi[:a, 0])
