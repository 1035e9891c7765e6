"""Colorspace conversions for the debug video stream.

Equivalents of the reference's NV12 packing kernels (reference
kernel/quad2nv12.cl:23-58, kernel/rgba2nv12.cl:20-31, kernel/f2nv12.cl:20-26):
RGB -> BT.601-style YUV with the same integer coefficient ratios, emitted as
an NV12 buffer (luma plane + interleaved half-res chroma). Computed in f32 on
the VPU and rounded at the end.
"""
from __future__ import annotations

import jax.numpy as jnp

from .frame import quad2rgba


def _sat_u8(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, 0, 255).astype(jnp.uint8)


def rgb_to_nv12(rgb: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) float RGB -> NV12 buffer (H * 3 // 2, W) uint8.

    H and W must be even. Chroma is subsampled by taking the top-left pixel
    of each 2x2 block, like the reference kernels' pos/2 indexing.
    """
    h, w, _ = rgb.shape
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = _sat_u8((66 * r + 129 * g + 25 * b) / 256 + 16)

    r2, g2, b2 = r[0::2, 0::2], g[0::2, 0::2], b[0::2, 0::2]
    u = _sat_u8((-38 * r2 - 74 * g2 + 112 * b2) / 256 + 128)
    v = _sat_u8((112 * r2 - 94 * g2 - 18 * b2) / 256 + 128)
    uv = jnp.stack([u, v], axis=-1).reshape(h // 2, w)
    return jnp.concatenate([y, uv], axis=0)


def quad_to_nv12(planes: jnp.ndarray, fmt: str) -> jnp.ndarray:
    """Demosaiced planes -> NV12 (debug raw-feed view)."""
    return rgb_to_nv12(quad2rgba(planes, fmt))


def f32_to_nv12(img: jnp.ndarray, offset: float = 127.0) -> jnp.ndarray:
    """(H, W) float map -> grayscale NV12 (value + offset as luma)."""
    h, w = img.shape
    y = _sat_u8(img + offset)
    uv = jnp.full((h // 2, w), 127, dtype=jnp.uint8)
    return jnp.concatenate([y, uv], axis=0)


def nv12_to_rgb(nv12, width: int, height: int):
    """Inverse transform for tests (numpy-compatible)."""
    import numpy as np

    nv12 = np.asarray(nv12)
    y = nv12[:height].astype(np.float32) - 16.0
    uv = nv12[height:].reshape(height // 2, width // 2, 2).astype(np.float32)
    u = (uv[..., 0] - 128.0).repeat(2, axis=0).repeat(2, axis=1)
    v = (uv[..., 1] - 128.0).repeat(2, axis=0).repeat(2, axis=1)
    y = y * 1.164  # BT.601 inverse luma scale
    r = y + 1.596 * v
    g = y - 0.392 * u - 0.813 * v
    b = y + 2.017 * u
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)
