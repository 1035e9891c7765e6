"""Micro-benchmark: reprojection resampling strategies on the real TPU.

Times, via relay-aware scan-length differencing:
  a) current production path: corner-stacked single-index gather
  b) grouped-slice gather: one (SY, SX, 4) slice per GYxGX output group,
     bilinear + per-plane quarter-pixel offsets folded into weight
     contractions (exact per-plane bilinear)
  c) pallas banded kernel (retry of the round-1 HTTP-500 compile)

Run: python experiments/resample_bench.py
"""
from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vision_processor_tpu.models.camera import CameraModel, field2image_packed
from vision_processor_tpu.ops import frame as F

H, W = 540, 960  # half-res Bayer plane size (1080p raw)
HF, WF = 540, 962  # flat grid (bench geometry)


def build_inputs():
    model = CameraModel(
        focal_length=900.0,
        principal_point=np.array([W / 2, H / 2]),
        distortion_k2=0.02,
        pos=np.array([-2250.0, -1500.0, 4500.0]),
        size=np.array([W, H]),
    )
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=(2 * H, 2 * W), dtype=np.uint8)
    packed_cam = model.packed()
    field_scale = 4.857
    field_offset = (-4587.0, -2810.0)
    return raw, packed_cam, field_scale, field_offset


def timeit(fn, args, n_lo=5, n_hi=25, tag=""):
    """Relay-aware: time lax.scan of two lengths, report the difference."""

    def make(n):
        def scan_fn(*a):
            def body(carry, _):
                # perturb one traced arg slightly so no iteration is hoisted
                out = fn(carry, *a[1:])
                nxt = a[0] + jnp.float32(1e-6) * jnp.sum(out[:1, :1])
                return nxt, jnp.sum(out)
            return jax.lax.scan(body, a[0], None, length=n)

        return jax.jit(scan_fn)

    times = {}
    for n in (n_lo, n_hi):
        f = make(n)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        times[n] = time.perf_counter() - t0
    ms = (times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1e3
    print(f"{tag:42s} {ms:8.3f} ms/frame")
    return ms


# --------------------------------------------------------------------------
# strategy A: current production path
# --------------------------------------------------------------------------


def current_path(rawf, packed_cam, field_scale, field_offset):
    packed = F.raw2planes_packed_from_f32(rawf)
    return F.resample_flat_packed(
        packed, packed_cam, jnp.float32(150.0), field_scale, field_offset,
        (HF, WF), "RGGB",
    )


# --------------------------------------------------------------------------
# strategy B: grouped-slice gather
# --------------------------------------------------------------------------

_PLANE_OFFSETS = np.asarray(F._PLANE_OFFSETS["RGGB"], dtype=np.float32)


def grouped_path(rawf, packed_cam, field_scale, field_offset,
                 gy=2, gx=8, sy=6, sx=16, dtype=jnp.float32):
    packed = F.raw2planes_packed_from_f32(rawf).astype(dtype)  # (H, W, 4)

    field_offset = jnp.asarray(field_offset, dtype=jnp.float32)
    hfp = -(-HF // gy) * gy
    wfp = -(-WF // gx) * gx
    ys = jnp.arange(hfp, dtype=jnp.float32) * field_scale + field_offset[1]
    xs = jnp.arange(wfp, dtype=jnp.float32) * field_scale + field_offset[0]
    gxx, gyy = jnp.meshgrid(xs, ys)
    fieldpos = jnp.stack([gxx, gyy, jnp.full_like(gxx, 150.0)], axis=-1)
    img = field2image_packed(packed_cam, fieldpos)
    px, py = img[..., 0], img[..., 1]

    offs = jnp.asarray(_PLANE_OFFSETS)
    u = px[..., None] + offs[:, 0] - 0.5  # (hfp, wfp, 4)
    v = py[..., None] + offs[:, 1] - 0.5
    x0 = jnp.clip(jnp.floor(u), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(v), 0, H - 2).astype(jnp.int32)
    fx = jnp.clip(u - x0, 0.0, 1.0)
    fy = jnp.clip(v - y0, 0.0, 1.0)

    ng_y, ng_x = hfp // gy, wfp // gx

    def group(a):  # (hfp, wfp, 4) -> (N, gy, gx, 4)
        return (
            a.reshape(ng_y, gy, ng_x, gx, 4)
            .transpose(0, 2, 1, 3, 4)
            .reshape(ng_y * ng_x, gy, gx, 4)
        )

    x0g, y0g = group(x0), group(y0)
    fxg, fyg = group(fx), group(fy)
    basex = jnp.clip(jnp.min(x0g, axis=(1, 2, 3)), 0, W - sx)
    basey = jnp.clip(jnp.min(y0g, axis=(1, 2, 3)), 0, H - sy)

    starts = jnp.stack([basey, basex], axis=-1)  # (N, 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    slices = jax.lax.gather(
        packed, starts, dn, slice_sizes=(sy, sx, 4),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (N, sy, sx, 4)

    ly = jnp.clip(y0g - basey[:, None, None, None], 0, sy - 2)
    lx = jnp.clip(x0g - basex[:, None, None, None], 0, sx - 2)

    ay = jnp.arange(sy)
    ax = jnp.arange(sx)
    wy = (
        jnp.where(ay == ly[..., None], 1.0 - fyg[..., None], 0.0)
        + jnp.where(ay == ly[..., None] + 1, fyg[..., None], 0.0)
    ).astype(dtype)  # (N, gy, gx, 4, sy)
    wx = (
        jnp.where(ax == lx[..., None], 1.0 - fxg[..., None], 0.0)
        + jnp.where(ax == lx[..., None] + 1, fxg[..., None], 0.0)
    ).astype(dtype)  # (N, gy, gx, 4, sx)

    tmp = jnp.einsum("nghcy,nyxc->nghcx", wy, slices)
    samples = jnp.einsum("nghcx,nghcx->nghc", wx, tmp).astype(jnp.float32)

    # ungroup -> (hfp, wfp, 4), crop
    samples = (
        samples.reshape(ng_y, ng_x, gy, gx, 4)
        .transpose(0, 2, 1, 3, 4)
        .reshape(hfp, wfp, 4)[:HF, :WF]
    )
    r, g, b = F.combine_planes(samples, "RGGB")
    return F.rgb_to_drgb(r, g, b)


# --------------------------------------------------------------------------


def main():
    # monkey-patch a raw-f32 entry so the scan carry can be float
    def raw2planes_packed_from_f32(rawf):
        h2, w2 = rawf.shape[0] // 2, rawf.shape[1] // 2
        x = rawf.reshape(h2, 2, w2, 2)
        return x.transpose(0, 2, 1, 3).reshape(h2, w2, 4)

    F.raw2planes_packed_from_f32 = raw2planes_packed_from_f32

    raw, packed_cam, field_scale, field_offset = build_inputs()
    rawf = jnp.asarray(raw, dtype=jnp.float32)
    cam = jnp.asarray(packed_cam, dtype=jnp.float32)

    # correctness check vs the exact path (on small crop, CPU-free check)
    exact = F.resample_flat(
        F.raw2quad(rawf, "RGGB"), cam, jnp.float32(150.0),
        field_scale, field_offset, (HF, WF), "RGGB",
    )
    got = grouped_path(rawf, cam, field_scale, field_offset)
    err = float(jnp.max(jnp.abs(exact - got)))
    print(f"grouped vs exact: max abs err = {err:.5f}")

    args = (rawf, cam)
    fs, fo = field_scale, field_offset

    timeit(lambda r, c: current_path(r, c, fs, fo), args,
           tag="A: current corner-stack gather")
    for (gy, gx, sy, sx) in [(1, 4, 4, 10), (1, 8, 4, 14), (2, 8, 6, 16),
                             (4, 8, 8, 16), (2, 16, 6, 24)]:
        timeit(
            lambda r, c, gy=gy, gx=gx, sy=sy, sx=sx: grouped_path(
                r, c, fs, fo, gy, gx, sy, sx),
            args, tag=f"B: grouped g=({gy},{gx}) s=({sy},{sx}) f32",
        )
    timeit(
        lambda r, c: grouped_path(r, c, fs, fo, 2, 8, 6, 16, jnp.bfloat16),
        args, tag="B: grouped g=(2,8) s=(6,16) bf16",
    )


if __name__ == "__main__":
    main()
