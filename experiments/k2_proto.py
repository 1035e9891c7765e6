"""Prototype of the K2 VMEM-resident resampling kernel.

Layout: packed planes (H, W, 4) -> (H*W32, 128) rows=(y, x//32),
lane = (x%32)*4 + plane. Whole image lives in VMEM (~4.2 MB bf16).
Per (8, 128) output tile:
  * read a (BH*BW, 128) window with BH dynamic row reads (rows
    (rs+ly)*W32+cs), plus the lane-shifted next-block copy C_next,
  * two one-hot bf16 matmuls (top/bottom bilinear rows) over the window,
  * 32-way in-lane select of the 4 corner values per plane,
  * per-plane quarter-pixel bilinear + dRGB, planar (8, 128) f32 outputs.

Validates vs sample_planes_packed in interpret mode, then compiles on TPU
and times it.
"""
from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vision_processor_tpu.models.camera import CameraModel, field2image_packed
from vision_processor_tpu.ops import frame as F

H, W = 540, 960
W32 = 32  # image padded to 32 blocks of 32 px (1024 px) per row
HF, WF = 540, 962
TILE_H, TILE_W = 8, 128
BH, BW = 16, 16  # BW=16 blocks + cs quantized to 8 => provable alignment
E = BH * BW

PLANE_OFF = np.asarray(F._PLANE_OFFSETS["RGGB"], dtype=np.float32)  # (4,2)


def _kernel(rs_ref, cs_ref, px_ref, py_ref, img_ref,
            dr_ref, dg_ref, db_ref, win_ref, *, n_tx):
    t = pl.program_id(0) * n_tx + pl.program_id(1)
    rs = rs_ref[t]
    cs = cs_ref[t]

    # window: rows (rs+ly)*32+cs .. +BW of the VMEM-resident image; the
    # offset is provably 8-aligned (32-row image rows, cs multiple of 8)
    for ly in range(BH):
        row = pl.multiple_of((rs + ly) * W32 + cs, 8)
        win_ref[ly * BW:(ly + 1) * BW, :] = img_ref[pl.ds(row, BW), :]

    win = win_ref[:]  # (E, 128) bf16
    # next-block copy: row e+1 (same ly, lxo+1), garbage at window edge
    # (excluded by the fit check)
    win_next = jnp.concatenate([win[1:], win[-1:]], axis=0)
    c2 = jnp.concatenate([win, win_next], axis=1)  # (E, 256)

    px = px_ref[:]  # (8, 128) f32
    py = py_ref[:]
    u = px - 0.5
    v = py - 0.5
    # production sampler clamps the shared cell to [0, size-1] and dedupes
    # the +1 corner at the edge; emulate with cell [0, size-2] + frac := 1
    x_edge = jnp.floor(u) >= W - 1
    y_edge = jnp.floor(v) >= H - 1
    x0 = jnp.clip(jnp.floor(u), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(v), 0, H - 2).astype(jnp.int32)

    ly0 = jnp.clip(y0 - rs, 0, BH - 2)
    lxo = jnp.clip(x0 // 32 - cs, 0, BW - 1)
    xi = x0 % 32  # (8, 128)

    e_top = ly0 * BW + lxo
    e_bot = e_top + BW

    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W, E), 2)
    oh_top = (iota == e_top[..., None]).astype(jnp.bfloat16)
    oh_bot = (iota == e_bot[..., None]).astype(jnp.bfloat16)

    dn = (((2,), (0,)), ((), ()))
    top = jax.lax.dot_general(oh_top, c2, dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
    bot = jax.lax.dot_general(oh_bot, c2, dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
    # top/bot: (8, 128, 256) = 64 pixel-slots x 4 planes

    # 32-way in-lane select of the 4 corners (self, right) per row
    zeros = jnp.zeros((TILE_H, TILE_W, 4), jnp.float32)
    tl = tr = bl = br = zeros
    for j in range(32):
        m = xi[..., None] == j
        tl = jnp.where(m, top[..., 4 * j:4 * j + 4], tl)
        tr = jnp.where(m, top[..., 4 * j + 4:4 * j + 8], tr)
        bl = jnp.where(m, bot[..., 4 * j:4 * j + 4], bl)
        br = jnp.where(m, bot[..., 4 * j + 4:4 * j + 8], br)

    x0f = x0.astype(jnp.float32)
    y0f = y0.astype(jnp.float32)
    s_planes = []
    for p in range(4):
        offx, offy = float(PLANE_OFF[p, 0]), float(PLANE_OFF[p, 1])
        fx = jnp.where(x_edge, 1.0, jnp.clip(u + offx - x0f, 0.0, 1.0))
        fy = jnp.where(y_edge, 1.0, jnp.clip(v + offy - y0f, 0.0, 1.0))
        t_ = tl[..., p] * (1 - fx) + tr[..., p] * fx
        b_ = bl[..., p] * (1 - fx) + br[..., p] * fx
        s_planes.append(t_ * (1 - fy) + b_ * fy)
    s = jnp.stack(s_planes, axis=-1)  # (8, 128, 4) plane samples

    r = s[..., 0]
    g = 0.5 * s[..., 1] + 0.5 * s[..., 2]
    b = s[..., 3]
    dr_ref[:] = (2 * r - g - b + 510) * 0.25
    dg_ref[:] = (2 * g - b - r + 510) * 0.25
    db_ref[:] = (2 * b - r - g + 510) * 0.25


def resample_k2(packed, px, py, interpret=False):
    """packed: (H, W, 4) u8/f32; px/py: (HF, WF) f32 image coords."""
    hf, wf = px.shape
    hfp = -(-hf // TILE_H) * TILE_H
    wfp = -(-wf // TILE_W) * TILE_W
    pxp = jnp.pad(px, ((0, hfp - hf), (0, wfp - wf)), mode="edge")
    pyp = jnp.pad(py, ((0, hfp - hf), (0, wfp - wf)), mode="edge")

    pimg = jnp.pad(packed, ((0, 0), (0, W32 * 32 - W), (0, 0)), mode="edge")
    img = pimg.astype(jnp.bfloat16).reshape(H * W32, 128)

    # per-tile window starts
    u = pxp - 0.5
    v = pyp - 0.5
    x0 = jnp.clip(jnp.floor(u), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(v), 0, H - 2).astype(jnp.int32)
    n_ty, n_tx = hfp // TILE_H, wfp // TILE_W
    yt = y0.reshape(n_ty, TILE_H, n_tx, TILE_W)
    xt = x0.reshape(n_ty, TILE_H, n_tx, TILE_W)
    rs = jnp.clip(jnp.min(yt, axis=(1, 3)), 0, H - BH).reshape(-1)
    cs = jnp.clip(
        (jnp.min(xt, axis=(1, 3)) // 32) & ~7, 0, W32 - BW
    ).reshape(-1)
    rs = rs.astype(jnp.int32)
    cs = cs.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_ty, n_tx),
        in_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, rs, cs: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, rs, cs: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole image resident
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, rs, cs: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, rs, cs: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, rs, cs: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((E, 128), jnp.bfloat16)],
    )
    out_shape = [jax.ShapeDtypeStruct((hfp, wfp), jnp.float32)] * 3
    dr, dg, db = pl.pallas_call(
        partial(_kernel, n_tx=n_tx),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(rs, cs, pxp, pyp, img)
    return jnp.stack([dr[:hf, :wf], dg[:hf, :wf], db[:hf, :wf]], axis=-1)


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
    return raw, model.packed()


def main():
    interpret_only = "--interpret" in sys.argv
    raw, packed_cam = build_inputs()
    cam = jnp.asarray(packed_cam, dtype=jnp.float32)
    field_scale = 4.857
    field_offset = (-4587.0, -2810.0)

    h2, w2 = H, W
    rawf = jnp.asarray(raw, jnp.float32)
    packed = rawf.reshape(h2, 2, w2, 2).transpose(0, 2, 1, 3).reshape(h2, w2, 4)

    ys = jnp.arange(HF, dtype=jnp.float32) * field_scale + field_offset[1]
    xs = jnp.arange(WF, dtype=jnp.float32) * field_scale + field_offset[0]
    gx, gy = jnp.meshgrid(xs, ys)
    fieldpos = jnp.stack([gx, gy, jnp.full_like(gx, 150.0)], axis=-1)
    img_xy = field2image_packed(cam, fieldpos)
    px, py = img_xy[..., 0], img_xy[..., 1]

    # reference: current production sampler + dRGB
    samples = F.sample_planes_packed(packed, px, py, "RGGB")
    r, g, b = F.combine_planes(samples, "RGGB")
    ref = F.rgb_to_drgb(r, g, b)

    if interpret_only:
        got = resample_k2(packed, px, py, interpret=True)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"interpret: max abs err vs production sampler = {err:.4f}")
        return

    got = resample_k2(packed, px, py)
    got.block_until_ready()
    err = float(jnp.max(jnp.abs(np.asarray(got) - np.asarray(ref))))
    print(f"tpu: max abs err vs production sampler = {err:.4f}")

    # timing: scan differencing
    def make(n):
        def scan_fn(p):
            def body(carry, _):
                out = resample_k2(carry, px, py)
                nxt = p + jnp.float32(1e-6) * out[0, 0, 0]
                return nxt, out[0, 0, 0]
            return jax.lax.scan(body, p, None, length=n)
        return jax.jit(scan_fn)

    times = {}
    for n in (5, 25):
        f = make(n)
        out = f(packed); jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(packed); jax.block_until_ready(out)
        times[n] = time.perf_counter() - t0
    ms = (times[25] - times[5]) / 20 * 1e3
    print(f"K2 kernel (incl. px/py reuse): {ms:.3f} ms/frame")


if __name__ == "__main__":
    main()
