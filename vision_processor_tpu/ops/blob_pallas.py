"""Fused gradient→box-sum→circularity Pallas kernel.

The XLA chain materializes three full maps between the flat image and the
circularity response: gradient-dot (pad + 4 shifted slices), the SAT (two
global cumsums) and the 16-read quadrant circularity — ~0.14 ms/camera of
mostly HBM round-trips at factor 1.25. This kernel computes the response
in one pass over a band of rows held in VMEM: the three flat channels
stay resident across the grid (constant-index blocks, the ops/warp.py
pattern), each step loads a haloed row window with ``pl.ds``, forms the
gradient with lane rolls, replaces the global SAT with LOCAL
(r-1)x(r-1) box sums (the four quadrant reads of an inclusive SAT reduce
to one box array sampled at four offsets), and writes the per-row
circularity.

Semantics: the quadrant SUMS are mathematically identical to the SAT
formulation but accumulate in a different order (local adds vs global
cumsum differences), so values agree only to f32 rounding (~1e-5
relative — the SAT's large-minus-large cancellation is actually the less
accurate side). Like the warp resample, the fused path is
detection-equivalent, not bit-identical: production selects it on TPU
(VPTPU_FUSED_CIRC=0 opts out), every other backend keeps the XLA chain,
and tests pin both value tolerance and detection-level equality.

Correspondence: reference kernel/gradientDot.cl:22-30,
kernel/satHorizontal.cl + satVertical.cl, kernel/satBlobCenter.cl:34-45.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 16   # output rows per grid step
LAN = 128


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def use_fused_circ() -> bool:
    return (
        os.environ.get("VPTPU_FUSED_CIRC", "1") != "0"
        and jax.default_backend() == "tpu"
    )


def _roll(x, s: int):
    # pltpu.roll needs a non-negative shift; wrap negative shifts modulo
    # the (static) lane count — the wrap zone lies inside the crop margin
    return pltpu.roll(x, s % x.shape[1], 1)


def _kernel(c0_ref, c1_ref, c2_ref, out_ref, *, o: int, r: int, blk: int):
    """One band: output rows [i*blk, i*blk + blk) of the padded map."""
    i = pl.program_id(0)
    pad = o + r  # row halo on each side of the output band
    win = blk + 2 * pad

    def grad(ref):
        # gradient rows [o, win - o) of the window: needs rows +-o and
        # lanes +-o of the flat channel
        c = ref[pl.ds(i * blk, win), :]
        gx = _roll(c, -o) - _roll(c, o)  # c[x+o] - c[x-o]
        n = win - 2 * o
        gy = c[2 * o : 2 * o + n, :] - c[0:n, :]
        return gx[o : o + n, :] * gy

    g = grad(c0_ref) + grad(c1_ref) + grad(c2_ref)  # rows [yo=-r, blk+r)

    # local (r-1)x(r-1) box sums: B[y, x] = sum_{0<=a,b<r-1} G[y+a, x+b].
    # The four quadrant reads of the inclusive SAT reduce to this one box
    # array sampled at four offsets (derived from ops/blob.circularity's
    # read() algebra; G row index = output-relative yo + r):
    #   pp  =  B[yo+2,   x+2]      nn  =  B[yo-r+1, x-r+1]
    #   pn  = -B[yo-r+1, x+2]      np_ = -B[yo+2,   x-r+1]
    acc = g
    for b in range(1, r - 1):
        acc = acc + _roll(g, -b)
    rows_b = blk + r + 2  # B rows [0, blk+r+2) in G coordinates
    box = acc[0:rows_b, :]
    for a in range(1, r - 1):
        box = box + acc[a : a + rows_b, :]

    hi = box[r + 2 : r + 2 + blk, :]  # B at G row yo + r + 2  (pp / np_)
    lo = box[1 : 1 + blk, :]          # B at G row yo + 1      (nn / pn)
    # roll(x, s): value at lane i becomes x[i - s]
    pp = _roll(hi, -2)          # B[.., x+2]
    np_ = _roll(hi, r - 1)      # B[.., x-r+1], enters negated
    nn = _roll(lo, r - 1)
    pn = _roll(lo, -2)          # enters negated
    inv = 1.0 / float(r * r)
    out_ref[:, :] = (
        jnp.minimum(jnp.minimum(pp, nn), jnp.minimum(-pn, -np_)) * inv
    )


def _response_kernel(th_ref, c0_ref, c1_ref, c2_ref, ms_ref, circ_ref,
                     m0_ref, m1_ref, m2_ref, *, o: int, r: int, dr: int,
                     blk: int, spans, n_taps: int):
    """Band kernel for the full blob response (see blob_response_fused).

    Computes, per output band: circularity (as in _kernel) for rows
    yo-1..yo+blk (the extra rows feed the local-max test), the disc color
    mean/stddev from grouped row-span sums, the score and the
    threshold+local-max mask — masked score, circ and the three mean
    planes are written out.
    """
    i = pl.program_id(0)
    pad = o + r + 1
    win = blk + 2 * pad
    th = th_ref[0]

    cs = [c0_ref[pl.ds(i * blk, win), :], c1_ref[pl.ds(i * blk, win), :],
          c2_ref[pl.ds(i * blk, win), :]]

    # ---- circularity over rows [pad-1, pad+blk+1) of the window ----
    def grad(c):
        gx = _roll(c, -o) - _roll(c, o)
        n = win - 2 * o
        gy = c[2 * o : 2 * o + n, :] - c[0:n, :]
        return gx[o : o + n, :] * gy

    g = grad(cs[0]) + grad(cs[1]) + grad(cs[2])  # g-index = k - o
    acc = g
    for b in range(1, r - 1):
        acc = acc + _roll(g, -b)
    rows_b = blk + r + 4
    box = acc[0:rows_b, :]
    for a in range(1, r - 1):
        box = box + acc[a : a + rows_b, :]
    rows_c = blk + 2
    hi = box[r + 2 : r + 2 + rows_c, :]
    lo = box[1 : 1 + rows_c, :]
    pp = _roll(hi, -2)
    np_ = _roll(hi, r - 1)
    nn = _roll(lo, r - 1)
    pn = _roll(lo, -2)
    inv = 1.0 / float(r * r)
    circ3 = jnp.minimum(jnp.minimum(pp, nn), jnp.minimum(-pn, -np_)) * inv
    circ = circ3[1 : blk + 1, :]

    # local max (4-neighbor, <=) over the 3-row band
    lmax = (
        (_roll(circ, 1) <= circ)
        & (_roll(circ, -1) <= circ)
        & (circ3[0:blk, :] <= circ)
        & (circ3[2 : blk + 2, :] <= circ)
    )

    # ---- disc colour statistics at the output rows ----
    # spans: tuple of (hw, dys) groups — one lane-span width per group,
    # reused for every dy offset that shares it
    ssum = None
    for ci_, c in enumerate(cs):
        for sq in (False, True):
            x = c * c if sq else c
            w_by_hw = {}
            prev_hw, span = 0, x
            for hw, _dys in spans:
                for b in range(prev_hw + 1, hw + 1):
                    span = span + _roll(x, -b) + _roll(x, b)
                prev_hw = hw
                w_by_hw[hw] = span
            s = None
            for hw, dys in spans:
                sp = w_by_hw[hw]
                for dy in dys:
                    part = sp[pad + dy : pad + dy + blk, :]
                    s = part if s is None else s + part
            if ssum is None:
                ssum = []
            ssum.append(s)

    n_f = float(n_taps)
    std_sum = None
    means = []
    for ci_ in range(3):
        s1 = ssum[2 * ci_]
        s2 = ssum[2 * ci_ + 1]
        mean = s1 * (1.0 / n_f)
        var = jnp.maximum(s2 * (1.0 / n_f) - mean * mean, 0.0)
        sd = jnp.sqrt(var)
        std_sum = sd if std_sum is None else std_sum + sd
        means.append(mean)

    score = circ / jnp.maximum(std_sum, 1e-12)
    mask = (circ >= th) & lmax
    ms_ref[:, :] = jnp.where(mask, score, -jnp.inf)
    circ_ref[:, :] = circ
    m0_ref[:, :] = means[0]
    m1_ref[:, :] = means[1]
    m2_ref[:, :] = means[2]


@functools.partial(
    jax.jit, static_argnames=("grad_offset", "sat_radius", "disc_radius")
)
def blob_response_fused(flat, circ_threshold, grad_offset: int,
                        sat_radius: int, disc_radius: int):
    """flat (H, W, 3) -> (masked_score, circ, (mean0, mean1, mean2), count).

    The fused form of ops/blob.blob_response: one band pass produces the
    score-first extraction inputs. Same tolerance contract as
    circularity_fused (interior f32-reassociation parity; border band
    follows the replicate-at-flat edge policy).
    """
    import numpy as np

    o, r, dr = int(grad_offset), int(sat_radius), int(disc_radius)
    assert r >= 2 and dr <= o + r + 1, "caller gates on kernel_fits"
    h, w = flat.shape[:2]
    pad_y = o + r + 1
    pad_x = max(o + 2 * r + 4, dr + 2)
    hp = _pad_to(h, BLK)
    fp = jnp.pad(
        flat,
        ((pad_y, pad_y + (hp - h)), (pad_x, pad_x), (0, 0)),
        mode="edge",
    )
    wp = _pad_to(fp.shape[1], LAN)
    fp = jnp.pad(fp, ((0, 0), (0, wp - fp.shape[1]), (0, 0)), mode="edge")
    hp_in = fp.shape[0]
    chans = [fp[:, :, c] for c in range(3)]

    from .blob import disc_offsets

    offs = disc_offsets(dr)
    n_taps = len(offs)
    by_hw: dict = {}
    for dy in range(-dr, dr + 1):
        hw = int(np.max(offs[offs[:, 0] == dy, 1]))
        by_hw.setdefault(hw, []).append(dy)
    spans = tuple(sorted((hw, tuple(dys)) for hw, dys in by_hw.items()))

    outs = pl.pallas_call(
        functools.partial(_response_kernel, o=o, r=r, dr=dr, blk=BLK,
                          spans=spans, n_taps=n_taps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(hp // BLK,),
            in_specs=[
                pl.BlockSpec((hp_in, wp), lambda i, th: (0, 0)),
                pl.BlockSpec((hp_in, wp), lambda i, th: (0, 0)),
                pl.BlockSpec((hp_in, wp), lambda i, th: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((BLK, wp), lambda i, th: (i, 0))
                for _ in range(5)
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((hp, wp), jnp.float32)
                   for _ in range(5)],
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(circ_threshold, jnp.float32).reshape(1), *chans)
    ms, circ, m0, m1, m2 = outs
    sl = (slice(0, h), slice(pad_x, pad_x + w))
    ms = ms[sl]
    count = jnp.sum(ms > -jnp.inf, dtype=jnp.int32)
    return ms, circ[sl], (m0[sl], m1[sl], m2[sl]), count


def response_kernel_fits(grad_offset: int, sat_radius: int,
                         disc_radius: int) -> bool:
    return sat_radius >= 2 and disc_radius <= grad_offset + sat_radius + 1


@functools.partial(jax.jit, static_argnames=("grad_offset", "sat_radius"))
def circularity_fused(flat: jnp.ndarray, grad_offset: int, sat_radius: int):
    """flat (H, W, 3) f32 -> circularity (H, W), fused band kernel.

    Matches ops/blob.gradient_dot + summed_area_table + circularity up to
    f32 reassociation (see module docstring).
    """
    o, r = int(grad_offset), int(sat_radius)
    if r < 2:
        from . import blob as B

        return B.circularity(B.summed_area_table(
            B.gradient_dot(flat, o)), r)
    h, w = flat.shape[:2]
    pad_y = o + r
    pad_x = o + 2 * r + 2  # lane-roll wrap containment margin
    hp = _pad_to(h, BLK)
    # edge replication = the XLA chain's clamp-to-edge pads
    fp = jnp.pad(
        flat,
        ((pad_y, pad_y + (hp - h)), (pad_x, pad_x), (0, 0)),
        mode="edge",
    )
    wp = _pad_to(fp.shape[1], LAN)
    fp = jnp.pad(fp, ((0, 0), (0, wp - fp.shape[1]), (0, 0)), mode="edge")
    hp_in = fp.shape[0]
    chans = [fp[:, :, c] for c in range(3)]

    out = pl.pallas_call(
        functools.partial(_kernel, o=o, r=r, blk=BLK),
        grid=(hp // BLK,),
        in_specs=[
            pl.BlockSpec((hp_in, wp), lambda i: (0, 0)),
            pl.BlockSpec((hp_in, wp), lambda i: (0, 0)),
            pl.BlockSpec((hp_in, wp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BLK, wp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(*chans)
    return out[:h, pad_x : pad_x + w]
