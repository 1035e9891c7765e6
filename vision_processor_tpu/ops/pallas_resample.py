"""Pallas TPU kernel for the reprojection resampling gather.

XLA lowers the flat-grid sampling gather at ~7 ns per index; this kernel
replaces it with a banded fetch + MXU one-hot contraction:

* the output is tiled (TILE_H x TILE_W); the input pixels any tile needs lie
  in a small (BAND_H x BAND_W) window because the field->image map is smooth
  and near-identity in density (fieldScale is chosen to match the average
  pixel footprint, reference src/Perspective.cpp:72-92),
* per tile, the window of the corner-stacked image is DMA'd row-wise into a
  VMEM band laid out (elements, channels), using per-tile start offsets
  scalar-prefetched from device-computed index maps,
* the in-window gather out[p, ch] = band[idx[p], ch] runs as a one-hot
  bfloat16 3D dot_general on the MXU — exact for 8-bit camera data, since
  integers up to 256 are representable in bfloat16.

Cameras whose geometry warps any tile beyond the window (heavy rotation)
are detected by `band_fits` at geometry time and fall back to the XLA
gather path.

STATUS: experimental — the kernel is semantically validated in interpreter
mode; the Mosaic DMA lowering of the row-wise band fetch still fails on the
dev relay's remote compiler (HTTP 500 without diagnostics), so the
production pipeline keeps the XLA gather until it can be debugged on a
directly-attached TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
BAND_H = 16
BAND_W = 192
CH = 16  # corner-stacked channels (4 bilinear corners x 4 planes)


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def tile_starts(y0, x0, h: int, w: int):
    """Per-tile band start offsets from the integer index maps.

    y0/x0: (HFp, WFp) int32 (padded to tile multiples). Returns
    (row_start, col_start) of shape (n_tiles,) flattened row-major, clamped
    so the (BAND_H, BAND_W) window stays inside the (h, w) image.
    """
    hfp, wfp = y0.shape
    nty, ntx = hfp // TILE_H, wfp // TILE_W
    ty = y0.reshape(nty, TILE_H, ntx, TILE_W)
    tx = x0.reshape(nty, TILE_H, ntx, TILE_W)
    ry = jnp.min(ty, axis=(1, 3)).reshape(-1)
    rx = jnp.min(tx, axis=(1, 3)).reshape(-1)
    ry = jnp.clip(ry, 0, max(h - BAND_H, 0)).astype(jnp.int32)
    rx = jnp.clip(rx, 0, max(w - BAND_W, 0)).astype(jnp.int32)
    return ry, rx


def band_fits(model, field_scale, field_offset, out_shape, img_size,
              max_bot_height: float) -> bool:
    """Host-side check at geometry time: does every output tile's input
    window fit in (BAND_H, BAND_W)? (numpy, runs once per geometry)"""
    hf, wf = out_shape
    w2, h2 = int(img_size[0]), int(img_size[1])
    ys = np.arange(_pad_to(hf, TILE_H)) * field_scale + field_offset[1]
    xs = np.arange(_pad_to(wf, TILE_W)) * field_scale + field_offset[0]
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx, gy, np.full_like(gx, max_bot_height)], axis=-1)
    img = model.field2image(pts.reshape(-1, 3)).reshape(gx.shape + (2,))
    if not np.isfinite(img).all():
        return False
    x0 = np.clip(np.floor(img[..., 0] - 0.5), 0, w2 - 1)
    y0 = np.clip(np.floor(img[..., 1] - 0.5), 0, h2 - 1)
    nty, ntx = x0.shape[0] // TILE_H, x0.shape[1] // TILE_W
    xt = x0.reshape(nty, TILE_H, ntx, TILE_W)
    yt = y0.reshape(nty, TILE_H, ntx, TILE_W)
    x_range = (xt.max(axis=(1, 3)) - xt.min(axis=(1, 3))).max()
    y_range = (yt.max(axis=(1, 3)) - yt.min(axis=(1, 3))).max()
    # +1 for the bilinear corner reach
    return bool(x_range + 2 <= BAND_W and y_range + 2 <= BAND_H)


def _kernel(row_start_ref, col_start_ref, y0_ref, x0_ref, flat_hbm,
            out_ref, band, sems, w: int):
    t = pl.program_id(0)
    rs = row_start_ref[t]
    cs = col_start_ref[t]

    # row-wise DMAs: source rows live at (rs + r) * w + cs in the flattened
    # (H*W, CH) image; the band collects them contiguously as (E, CH)
    copies = []
    for r in range(BAND_H):
        copy = pltpu.make_async_copy(
            flat_hbm.at[pl.ds((rs + r) * w + cs, BAND_W)],
            band.at[pl.ds(r * BAND_W, BAND_W)],
            sems.at[r],
        )
        copy.start()
        copies.append(copy)

    y_local = y0_ref[:] - rs  # (TILE_H, TILE_W)
    x_local = x0_ref[:] - cs
    idx = jnp.clip(y_local * BAND_W + x_local, 0, BAND_H * BAND_W - 1)

    iota = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_W, BAND_H * BAND_W), 2
    )
    onehot = (iota == idx[..., None]).astype(jnp.bfloat16)

    for copy in copies:
        copy.wait()
    src = band[:].astype(jnp.bfloat16)  # (E, CH)
    gathered = jax.lax.dot_general(
        onehot, src,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE_H, TILE_W, CH)
    out_ref[:] = gathered


def gather_corners_pallas(stacked, y0, x0, interpret: bool = False):
    """out[i, j, :] = stacked[y0[i, j], x0[i, j], :] via the banded kernel.

    stacked: (H, W, 16) f32 corner-stacked planes, y0/x0: (HF, WF) int32
    (top-left bilinear corners, clipped to [0, size-2]). Returns
    (HF, WF, 16) f32.
    """
    from functools import partial

    h, w, ch = stacked.shape
    assert ch == CH
    hf, wf = y0.shape
    hfp, wfp = _pad_to(hf, TILE_H), _pad_to(wf, TILE_W)
    y0p = jnp.pad(y0, ((0, hfp - hf), (0, wfp - wf)), mode="edge")
    x0p = jnp.pad(x0, ((0, hfp - hf), (0, wfp - wf)), mode="edge")

    row_start, col_start = tile_starts(y0p, x0p, h, w)
    nty, ntx = hfp // TILE_H, wfp // TILE_W
    n_tiles = nty * ntx

    flat = stacked.reshape(h * w, CH)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (TILE_H, TILE_W),
                lambda t, rs, cs: (t // ntx, t % ntx),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_H, TILE_W),
                lambda t, rs, cs: (t // ntx, t % ntx),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (TILE_H, TILE_W, CH),
            lambda t, rs, cs: (t // ntx, t % ntx, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((BAND_H * BAND_W, CH), jnp.float32),
            pltpu.SemaphoreType.DMA((BAND_H,)),
        ],
    )

    out = pl.pallas_call(
        partial(_kernel, w=w),
        out_shape=jax.ShapeDtypeStruct((hfp, wfp, CH), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(row_start, col_start, y0p, x0p, flat)

    return out[:hf, :wf]
