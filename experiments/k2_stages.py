"""K2 resampling kernel — transpose-minimized formulation + timing."""
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
W32 = 32
HF, WF = 540, 962
TILE_H, TILE_W = 8, 128
BH, BW = 12, 16
E = BH * BW

PLANE_OFF = np.asarray(F._PLANE_OFFSETS["RGGB"], dtype=np.float32)


def _kernel(rs_ref, cs_ref, px_ref, py_ref, img_ref,
            dr_ref, dg_ref, db_ref, win_ref, *, n_tx):
    t = pl.program_id(0) * n_tx + pl.program_id(1)
    rs = rs_ref[t]
    cs = cs_ref[t]

    for ly in range(BH):
        row = pl.multiple_of((rs + ly) * W32 + cs, 8)
        win_ref[ly * BW:(ly + 1) * BW, :] = img_ref[pl.ds(row, BW), :]

    win = win_ref[:]  # (E, 128) bf16

    u = px_ref[:] - 0.5
    v = py_ref[:] - 0.5

    # only u and v cross the (8,128) -> (8,128,1) layout boundary;
    # x0/y0/xi/e/fractions/edges are re-derived on the far side.
    u3 = u[..., None]
    v3 = v[..., None]
    x_edge3 = jnp.floor(u3) >= W - 1
    y_edge3 = jnp.floor(v3) >= H - 1
    x03 = jnp.clip(jnp.floor(u3), 0, W - 2).astype(jnp.int32)
    y03 = jnp.clip(jnp.floor(v3), 0, H - 2).astype(jnp.int32)
    xi3 = x03 & 31
    e3 = (
        jnp.clip(y03 - rs, 0, BH - 2) * BW
        + jnp.clip((x03 >> 5) - cs, 0, BW - 1)
    )
    # edge marker 2.0: clip(2.0 +- 0.25, 0, 1) == 1 for every plane offset
    fxb3 = jnp.where(x_edge3, 2.0, u3 - x03.astype(jnp.float32))
    fyb3 = jnp.where(y_edge3, 2.0, v3 - y03.astype(jnp.float32))

    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W, E), 2)
    oh_top = (iota == e3).astype(jnp.bfloat16)
    oh_bot = (iota == e3 + BW).astype(jnp.bfloat16)
    oh_top1 = (iota == e3 + 1).astype(jnp.bfloat16)
    oh_bot1 = (iota == e3 + BW + 1).astype(jnp.bfloat16)

    dn = (((2,), (0,)), ((), ()))
    mm = partial(jax.lax.dot_general, dimension_numbers=dn,
                 preferred_element_type=jnp.float32)
    top_s = mm(oh_top, win)   # (8,128,128) self-block row
    bot_s = mm(oh_bot, win)
    top_r = mm(oh_top1, win)  # next-block row (for xi == 31)
    bot_r = mm(oh_bot1, win)

    # lane constants: lane = xi*4 + plane; RGGB quarter-pixel offsets
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W, 128), 2)
    lb = lane >> 2
    lp = lane & 3
    offx_l = jnp.where(lp % 2 == 0, 0.25, -0.25)
    offy_l = jnp.where(lp < 2, 0.25, -0.25)

    fx_l = jnp.clip(fxb3 + offx_l, 0.0, 1.0)
    fy_l = jnp.clip(fyb3 + offy_l, 0.0, 1.0)

    xw_s = jnp.where(lb == xi3, 1.0 - fx_l, 0.0) + jnp.where(
        lb == xi3 + 1, fx_l, 0.0)
    xw_r = jnp.where((lb == 0) & (xi3 == 31), fx_l, 0.0)

    mixed_s = top_s * (1.0 - fy_l) + bot_s * fy_l
    mixed_r = top_r * (1.0 - fy_l) + bot_r * fy_l
    pre = mixed_s * xw_s + mixed_r * xw_r  # (8,128,128)

    li = jax.lax.broadcasted_iota(jnp.int32, (128, 4), 0) % 4
    ci = jax.lax.broadcasted_iota(jnp.int32, (128, 4), 1)
    sel = (li == ci).astype(jnp.float32)
    s4 = jax.lax.dot_general(
        pre, sel, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (8,128,4)

    r = s4[..., 0]
    g = 0.5 * s4[..., 1] + 0.5 * s4[..., 2]
    b = s4[..., 3]
    dr_ref[:] = (2 * r - g - b + 510) * 0.25
    dg_ref[:] = (2 * g - b - r + 510) * 0.25
    db_ref[:] = (2 * b - r - g + 510) * 0.25


def resample_k2(packed, px, py, interpret=False):
    hf, wf = px.shape
    hfp = -(-hf // TILE_H) * TILE_H
    wfp = -(-wf // TILE_W) * TILE_W
    pxp = jnp.pad(px, ((0, hfp - hf), (0, wfp - wf)), mode="edge")
    pyp = jnp.pad(py, ((0, hfp - hf), (0, wfp - wf)), mode="edge")

    pimg = jnp.pad(packed, ((0, 0), (0, W32 * 32 - W), (0, 0)), mode="edge")
    img = pimg.astype(jnp.bfloat16).reshape(H * W32, 128)

    u = pxp - 0.5
    v = pyp - 0.5
    x0 = jnp.clip(jnp.floor(u), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(v), 0, H - 2).astype(jnp.int32)
    n_ty, n_tx = hfp // TILE_H, wfp // TILE_W
    yt = y0.reshape(n_ty, TILE_H, n_tx, TILE_W)
    xt = x0.reshape(n_ty, TILE_H, n_tx, TILE_W)
    rs = jnp.clip(jnp.min(yt, axis=(1, 3)), 0, H - BH).reshape(-1).astype(jnp.int32)
    cs = jnp.clip((jnp.min(xt, axis=(1, 3)) // 32) & ~7, 0, W32 - BW
                  ).reshape(-1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_ty, n_tx),
        in_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, rs, cs: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, rs, cs: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, rs, cs: (i, j),
                         memory_space=pltpu.VMEM)] * 3,
        scratch_shapes=[pltpu.VMEM((E, 128), jnp.bfloat16)],
    )
    out_shape = [jax.ShapeDtypeStruct((hfp, wfp), jnp.float32)] * 3
    dr, dg, db = pl.pallas_call(
        partial(_kernel, n_tx=n_tx),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(rs, cs, pxp, pyp, img)
    return jnp.stack([dr[:hf, :wf], dg[:hf, :wf], db[:hf, :wf]], axis=-1)


def main():
    model = CameraModel(
        focal_length=900.0, principal_point=np.array([W / 2, H / 2]),
        distortion_k2=0.02, pos=np.array([-2250.0, -1500.0, 4500.0]),
        size=np.array([W, H]))
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=(2 * H, 2 * W), dtype=np.uint8)
    cam = jnp.asarray(model.packed(), dtype=jnp.float32)
    field_scale, field_offset = 4.857, (-4587.0, -2810.0)

    rawf = jnp.asarray(raw, jnp.float32)
    packed = rawf.reshape(H, 2, W, 2).transpose(0, 2, 1, 3).reshape(H, W, 4)

    ys = jnp.arange(HF, dtype=jnp.float32) * field_scale + field_offset[1]
    xs = jnp.arange(WF, dtype=jnp.float32) * field_scale + field_offset[0]
    gx, gy = jnp.meshgrid(xs, ys)
    fieldpos = jnp.stack([gx, gy, jnp.full_like(gx, 150.0)], axis=-1)
    img_xy = field2image_packed(cam, fieldpos)
    px, py = img_xy[..., 0], img_xy[..., 1]

    samples = F.sample_planes_packed(packed, px, py, "RGGB")
    r, g, b = F.combine_planes(samples, "RGGB")
    ref = F.rgb_to_drgb(r, g, b)

    if "--interpret" in sys.argv:
        got = resample_k2(packed, px, py, interpret=True)
        print("interpret err:", float(jnp.max(jnp.abs(got - ref))))
        return

    got = resample_k2(packed, px, py)
    err = float(jnp.max(jnp.abs(np.asarray(got) - np.asarray(ref))))
    print("tpu err:", err)

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
    print(f"K2 kernel: {ms:.3f} ms/frame")


if __name__ == "__main__":
    main()
