"""Two-pass separable reprojection warp (Pallas): the gather-free resample.

The flat-grid resampling gather is INDEX-RATE-bound on this hardware
(~3 ns per index regardless of bytes fetched — experiments/
resample_lowbyte.py), which puts a hard ~1 ms/camera floor on the
pipeline's biggest stage. This module replaces the gather with a
Catmull-Smith style two-pass warp: pass 1 resamples the image u axis,
pass 2 the v axis; each pass is a banded 2-tap linear interpolation along
one axis, executed by a small Pallas kernel (scalar-prefetched window
starts, in-VMEM dynamic slices, hat-weight FMAs on (8, 128) tiles — no
gathers anywhere). Measured: 0.355 ms/frame for the full chain vs 1.03 ms
for the cached-grid gather (experiments/pallas_band_warp.py).

Correspondence: the reference runs the same projection per output pixel
per frame in OpenCL (reference kernel/resampling.cl:29-84); the map here
is frame-invariant and precomputed per calibration, split into the
separable form U1(xo, vs) / V2(yo, xo) by per-column monotone inversion.

Semantics vs the gather path: sub-pixel-equivalent, not bit-identical —
the separable decomposition evaluates the horizontal interpolation at
integer source rows (second-order difference from true bilinear), and the
per-plane quarter-pixel offsets are applied as true position shifts
instead of the gather's fixed-cell-pair clipped weights. `warp_fits`
checks per-geometry that the map is separable (per-column monotone v) and
the band windows suffice; non-conforming cameras fall back to the gather.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.camera import field2image_packed
from .frame import BGR, _PLANE_OFFSETS

BLK = 8     # output rows per kernel block
LAN = 128   # lane tile
WIN = 16    # source rows per window (fit-checked by warp_fits)


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# the banded-pass kernel
# ---------------------------------------------------------------------------


def _band_kernel(r0_ref, src_ref, pos_ref, out_ref, *, win: int):
    ct = pl.program_id(1)
    rb = pl.program_id(2)
    r0 = r0_ref[rb, ct]
    window = src_ref[0, pl.ds(r0, win), :]            # (win, 128)
    p = pos_ref[0] - r0.astype(jnp.float32)           # (8, 128)
    acc = jnp.zeros((BLK, LAN), jnp.float32)
    for k in range(win):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(p - k))
        acc = acc + w * window[k, :][None, :]
    out_ref[0] = acc


def band_pass(src, pos, r0, win: int = WIN, interpret: bool | None = None):
    """1-D linear resample along axis 1 of ``src`` (ch, R, C) at positions
    ``pos`` (ch, n_out, C), windows starting at ``r0`` (n_out/BLK, C/LAN).

    C must be a multiple of 128 and n_out of 8; the grid precompute
    guarantees pos - r0[block, tile] lies in [0, win-2].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ch, R, C = src.shape
    n_out = pos.shape[1]
    grid = (ch, C // LAN, n_out // BLK)
    return pl.pallas_call(
        functools.partial(_band_kernel, win=win),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, R, LAN), lambda c, ct, rb, r0: (c, 0, ct)),
                pl.BlockSpec((1, BLK, LAN), lambda c, ct, rb, r0: (c, rb, ct)),
            ],
            out_specs=pl.BlockSpec(
                (1, BLK, LAN), lambda c, ct, rb, r0: (c, rb, ct)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((ch, n_out, C), jnp.float32),
        interpret=interpret,
    )(r0, src, pos)


# ---------------------------------------------------------------------------
# grid precompute (traced; run once per calibration like frame.resample_grid)
# ---------------------------------------------------------------------------


def _block_starts(pos, win: int, n_src: int):
    """(n_blocks, n_tiles) i32 window starts covering every 2-tap stencil
    of each (BLK, LAN) block across all channels (traced)."""
    ch, n_out, c = pos.shape
    p = pos.reshape(ch, n_out // BLK, BLK, c // LAN, LAN)
    lo = jnp.floor(jnp.min(p, axis=(0, 2, 4)))
    return jnp.clip(lo, 0, n_src - win).astype(jnp.int32)


def warp_grid(
    packed_cam,
    max_bot_height,
    field_scale,
    field_offset,
    out_shape: tuple[int, int],
    plane_shape: tuple[int, int],
    fmt: str,
):
    """Separable warp geometry for ``resample_flat_warp`` (cf.
    frame.resample_grid for the gather path).

    Returns {"pos1": (4, WFp8, Hp), "r01", "pos2": (4, HFp8, WFp128),
    "r02"} — pass-1 positions U1(xo, vs) from per-column monotone
    inversion of the projection, pass-2 positions V2(yo, xo), both with
    the per-plane quarter-pixel offsets folded in as position shifts.
    """
    hf, wf = out_shape
    h, w = plane_shape
    hp = _pad_to(h, LAN)
    wfp = _pad_to(wf, LAN)
    no1 = _pad_to(wf, BLK)
    no2 = _pad_to(hf, BLK)

    field_offset = jnp.asarray(field_offset, dtype=jnp.float32)
    # edge-replicated padded output grid
    ys = jnp.minimum(jnp.arange(no2), hf - 1).astype(jnp.float32)
    xs = jnp.minimum(jnp.arange(no1), wf - 1).astype(jnp.float32)
    gy = ys * field_scale + field_offset[1]
    gx = xs * field_scale + field_offset[0]
    gxx, gyy = jnp.meshgrid(gx, gy)
    pts = jnp.stack(
        [gxx, gyy, jnp.full_like(gxx, 1.0) * max_bot_height], axis=-1
    )
    img = field2image_packed(packed_cam, pts)  # (no2, no1, 2)
    u = jnp.nan_to_num(img[..., 0] - 0.5, nan=0.0)
    v = jnp.nan_to_num(img[..., 1] - 0.5, nan=0.0)
    u = jnp.clip(u, 0.0, w - 1.0)
    v = jnp.clip(v, 0.0, h - 1.0)

    # pass 2: V2(yo, xo), edge-padded to lane width
    pos2_base = jnp.pad(v[:, :wf], ((0, 0), (0, wfp - wf)), mode="edge")

    # pass 1: U1(xo, vs) by per-column inversion of yo -> v (monotone;
    # warp_fits guarantees). A tiny index ramp keeps clipped/duplicate
    # entries strictly monotone for interp.
    vs = jnp.arange(hp, dtype=jnp.float32)
    ramp = jnp.arange(no2, dtype=jnp.float32) * 1e-4

    def invert_column(v_col, u_col):
        inc = v_col[-1] >= v_col[0]
        xp = jnp.where(inc, v_col + ramp, -v_col + ramp)
        q = jnp.where(inc, vs, -vs)
        return jnp.interp(q, xp, u_col)

    pos1_base = jax.vmap(invert_column, in_axes=(1, 1))(v, u)  # (no1, hp)

    offs = np.asarray(_PLANE_OFFSETS[fmt], dtype=np.float32)  # (4, 2) x,y
    pos1 = jnp.stack(
        [jnp.clip(pos1_base + offs[c, 0], 0.0, w - 1.001) for c in range(4)]
    )
    pos2 = jnp.stack(
        [jnp.clip(pos2_base + offs[c, 1], 0.0, h - 1.001) for c in range(4)]
    )
    return {
        "pos1": pos1.astype(jnp.float32),
        "r01": _block_starts(pos1, WIN, w),
        "pos2": pos2.astype(jnp.float32),
        "r02": _block_starts(pos2, WIN, h),
    }


def warp_fits(model, field_scale, field_offset, out_shape, plane_shape,
              max_bot_height: float) -> bool:
    """Host-side separability check at geometry time: per-column v strictly
    monotone over the visible grid, finite projections, and every
    (BLK, LAN) block's source span within WIN-1 rows for both passes.

    plane_shape: the half-resolution cell grid (h, w) for Bayer formats,
    the full image shape for BGR (cf. BlobMachineConfig.plane_shape)."""
    hf, wf = out_shape
    h2, w2 = int(plane_shape[0]), int(plane_shape[1])
    if h2 < WIN or w2 < WIN:
        # _block_starts clips window starts to [0, n_src - WIN]; a source
        # plane shorter than one window would invert that clip
        return False
    no1, no2 = _pad_to(wf, BLK), _pad_to(hf, BLK)
    ys = np.minimum(np.arange(no2), hf - 1) * field_scale + field_offset[1]
    xs = np.minimum(np.arange(no1), wf - 1) * field_scale + field_offset[0]
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx, gy, np.full_like(gx, max_bot_height)], axis=-1)
    img = model.field2image(pts.reshape(-1, 3)).reshape(gx.shape + (2,))
    if not np.isfinite(img).all():
        return False
    u = np.clip(img[..., 0] - 0.5, 0.0, w2 - 1.0)
    v = np.clip(img[..., 1] - 0.5, 0.0, h2 - 1.0)
    dv = np.diff(v[:hf], axis=0)
    if not ((dv >= 0).all() or (dv <= 0).all()):
        return False
    # exact ties are fine where the clip saturates (border rows replicate
    # the edge — the gather path clamps identically there; the inversion
    # ramp keeps interp well-defined); an UNsaturated tie means the map
    # genuinely folds and the column is not invertible
    sat = (v[:hf] <= 0.0) | (v[:hf] >= h2 - 1.0)
    if ((dv == 0) & ~(sat[:-1] | sat[1:])).any():
        return False

    def span_ok(pos):
        # window starts are clipped to [0, n_src - WIN] by _block_starts,
        # which only shifts windows (pos itself is already clipped into
        # the source plane) — the span bound is the sole fit criterion
        n_out, c = pos.shape
        cp = _pad_to(c, LAN)
        pos = np.pad(pos, ((0, 0), (0, cp - c)), mode="edge")
        p = pos.reshape(n_out // BLK, BLK, cp // LAN, LAN)
        span = np.ceil(p.max(axis=(1, 3))) - np.floor(p.min(axis=(1, 3)))
        # +0.5 for the plane offsets, +1 for the 2-tap stencil
        return (span + 1.5 <= WIN - 1).all()

    # pass-1 positions via the same inversion (numpy)
    vs = np.arange(_pad_to(h2, LAN), dtype=np.float64)
    pos1 = np.empty((no1, vs.shape[0]), np.float64)
    ramp = np.arange(no2) * 1e-4
    for c in range(no1):
        vc, uc = v[:, c], u[:, c]
        if vc[-1] >= vc[0]:
            pos1[c] = np.interp(vs, vc + ramp, uc)
        else:
            pos1[c] = np.interp(-vs, -vc + ramp, uc)
    return span_ok(pos1) and span_ok(v[:, :wf])


def cameras_fit_warp(entries, out_shape, plane_shape) -> bool:
    """warp_fits over a rig: entries are (model, field_scale,
    field_offset, max_bot_height) per camera; True iff EVERY camera's
    geometry admits the separable warp."""
    return all(
        warp_fits(model, scale, offset, out_shape, plane_shape, zmax)
        for model, scale, offset, zmax in entries
    )


def resolve_resample_mode(requested: str, entries, out_shape,
                          plane_shape) -> str:
    """The single auto-resolution used by Processor, MultiCamApp and the
    bench rig: "auto" becomes "warp" when running on TPU and every
    camera passes warp_fits, else the bit-exact "gather" (on CPU the
    Pallas kernel would run in interpret mode — tests and tooling keep
    the gather). Non-"auto" requests pass through unchanged."""
    if requested != "auto":
        return requested
    if jax.default_backend() != "tpu":
        return "gather"
    if cameras_fit_warp(entries, out_shape, plane_shape):
        return "warp"
    from ..utils.log import get_logger

    get_logger(__name__).info(
        "warp_fits rejected the geometry; gather resample")
    return "gather"


# ---------------------------------------------------------------------------
# device apply
# ---------------------------------------------------------------------------


def cells_chfirst_t(raw: jnp.ndarray, fmt: str, hp: int) -> jnp.ndarray:
    """(4, W, Hp) f32 channel-first transposed cell planes from the raw
    frame. u8 minor-dim transposes relayout pathologically (1.4 ms); this
    packs each cell into one u32 (cheap bitcasts, cf.
    frame.corner_stack_u32), transposes at u32 granularity (~0.12 ms) and
    byte-unpacks with shifts."""
    if fmt == BGR:
        p8 = jnp.concatenate(
            [raw.astype(jnp.uint8),
             jnp.zeros_like(raw[..., :1], dtype=jnp.uint8)],
            axis=-1,
        )
        w32 = jax.lax.bitcast_convert_type(p8, jnp.uint32)  # (H, W)
    else:
        h2, w2 = raw.shape[0] // 2, raw.shape[1] // 2
        r4 = raw.reshape(h2, 2, raw.shape[1])
        top16 = jax.lax.bitcast_convert_type(
            r4[:, 0].reshape(h2, w2, 2), jnp.uint16
        )
        bot16 = jax.lax.bitcast_convert_type(
            r4[:, 1].reshape(h2, w2, 2), jnp.uint16
        )
        w32 = top16.astype(jnp.uint32) | (bot16.astype(jnp.uint32) << 16)
    w32t = jnp.pad(w32.T, ((0, 0), (0, hp - w32.shape[0])))
    return jnp.stack(
        [
            w32t & 0xFF,
            (w32t >> 8) & 0xFF,
            (w32t >> 16) & 0xFF,
            w32t >> 24,
        ]
    ).astype(jnp.float32)


def resample_flat_warp(raw, wgrid, fmt: str, out_shape: tuple[int, int],
                       plane_shape: tuple[int, int]):
    """raw frame -> (Hf, Wf, 3) flat dRGB grid via the two-pass warp.

    Drop-in for frame.resample_flat_grid_raw where warp_fits approved the
    geometry (wgrid from warp_grid)."""
    hf, wf = out_shape
    h, w = plane_shape
    hp = _pad_to(h, LAN)
    wfp = _pad_to(wf, LAN)
    no1 = _pad_to(wf, BLK)

    src1 = cells_chfirst_t(raw, fmt, hp)                # (4, W, Hp)
    mid = band_pass(src1, wgrid["pos1"], wgrid["r01"])   # (4, no1, Hp)
    mid_t = jnp.transpose(mid, (0, 2, 1))[:, :h]         # (4, H, no1)
    mid_t = jnp.pad(mid_t, ((0, 0), (0, 0), (0, wfp - no1)))
    out = band_pass(mid_t, wgrid["pos2"], wgrid["r02"])  # (4, no2, WFp)

    from .frame import combine_planes, rgb_to_drgb

    samples = jnp.moveaxis(out, 0, -1)[:hf, :wf]         # (Hf, Wf, 4)
    r, g, b = combine_planes(samples, fmt)
    return rgb_to_drgb(r, g, b)
