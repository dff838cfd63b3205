"""Fused YUV420 -> RGB (+ crop / resize) epilogue in JAX.

This is the TPU analog of the reference's CUDA NV12->RGB kernel
(hwang/impls/nvidia/convert.cu:67-200): decoded frames are converted to
model-ready RGB tensors on-device so they land in HBM without a host
round-trip.

Conversion contract: exact integer limited-range BT.601

    R = clip((298*(Y-16)           + 409*(V-128) + 128) >> 8)
    G = clip((298*(Y-16) - 100*(U-128) - 208*(V-128) + 128) >> 8)
    B = clip((298*(Y-16) + 516*(U-128)            + 128) >> 8)

with nearest chroma co-siting (U/V sample (x//2, y//2)).  This is the
framework-standard RGB: deterministic, dither-free, and identical across
backends when requested as `rgb_exact`.  The SOFTWARE backend's default
"rgb" instead uses swscale for parity with the reference's output; YUV
output is bit-exact across ALL backends.
"""

from __future__ import annotations

import jax.numpy as jnp


def yuv420_to_rgb(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray
                  ) -> jnp.ndarray:
    """y: [..., H, W] uint8; u, v: [..., H/2, W/2] -> [..., H, W, 3] uint8."""
    H, W = y.shape[-2], y.shape[-1]
    up = jnp.repeat(jnp.repeat(u, 2, axis=-2), 2, axis=-1)[..., :H, :W]
    vp = jnp.repeat(jnp.repeat(v, 2, axis=-2), 2, axis=-1)[..., :H, :W]
    yy = 298 * (y.astype(jnp.int32) - 16)
    uu = up.astype(jnp.int32) - 128
    vv = vp.astype(jnp.int32) - 128
    r = jnp.clip((yy + 409 * vv + 128) >> 8, 0, 255)
    g = jnp.clip((yy - 100 * uu - 208 * vv + 128) >> 8, 0, 255)
    b = jnp.clip((yy + 516 * uu + 128) >> 8, 0, 255)
    return jnp.stack([r, g, b], axis=-1).astype(jnp.uint8)


def crop(frame: jnp.ndarray, left: int, top: int, width: int, height: int
         ) -> jnp.ndarray:
    """Crop [..., H, W, C] (or [..., H, W]) to the display rectangle."""
    return frame[..., top : top + height, left : left + width, :] \
        if frame.ndim >= 3 and frame.shape[-1] in (1, 3) \
        else frame[..., top : top + height, left : left + width]


def resize_bilinear_rgb(rgb: jnp.ndarray, out_h: int, out_w: int
                        ) -> jnp.ndarray:
    """Half-pel-centered bilinear resize of [..., H, W, 3] uint8 -> uint8.

    Fixed-point (x256) weights, round-half-up — deterministic across
    backends.
    """
    H, W = rgb.shape[-3], rgb.shape[-2]
    sy = H / out_h
    sx = W / out_w
    ys = (jnp.arange(out_h) + 0.5) * sy - 0.5
    xs = (jnp.arange(out_w) + 0.5) * sx - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = jnp.clip(jnp.round((ys - y0) * 256), 0, 256).astype(jnp.int32)
    wx = jnp.clip(jnp.round((xs - x0) * 256), 0, 256).astype(jnp.int32)
    a = rgb[..., y0, :, :][..., :, x0, :].astype(jnp.int32)
    b = rgb[..., y0, :, :][..., :, x1, :].astype(jnp.int32)
    c = rgb[..., y1, :, :][..., :, x0, :].astype(jnp.int32)
    d = rgb[..., y1, :, :][..., :, x1, :].astype(jnp.int32)
    wx_ = wx[:, None]
    top = a * (256 - wx_) + b * wx_
    bot = c * (256 - wx_) + d * wx_
    wy_ = wy[:, None, None]
    out = (top * (256 - wy_) + bot * wy_ + (1 << 15)) >> 16
    return jnp.clip(out, 0, 255).astype(jnp.uint8)

# ---------------------------------------------------------------------------
# numpy mirrors — used by the pipeline's host (latency) route so routed
# output is bit-identical to the device epilogue.  Kept in lockstep by
# tests/test_pipeline.py::test_yuv_numpy_mirrors_match_jax.
# ---------------------------------------------------------------------------


def yuv420_to_rgb_np(y, u, v):
    """numpy mirror of :func:`yuv420_to_rgb` (same exact integer BT.601)."""
    import numpy as np

    H, W = y.shape[-2], y.shape[-1]
    up = np.repeat(np.repeat(u, 2, axis=-2), 2, axis=-1)[..., :H, :W]
    vp = np.repeat(np.repeat(v, 2, axis=-2), 2, axis=-1)[..., :H, :W]
    yy = 298 * (y.astype(np.int32) - 16)
    uu = up.astype(np.int32) - 128
    vv = vp.astype(np.int32) - 128
    r = np.clip((yy + 409 * vv + 128) >> 8, 0, 255)
    g = np.clip((yy - 100 * uu - 208 * vv + 128) >> 8, 0, 255)
    b = np.clip((yy + 516 * uu + 128) >> 8, 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def resize_bilinear_rgb_np(rgb, out_h, out_w):
    """numpy mirror of :func:`resize_bilinear_rgb` (same fixed-point)."""
    import numpy as np

    H, W = rgb.shape[-3], rgb.shape[-2]
    sy = H / out_h
    sx = W / out_w
    ys = (np.arange(out_h) + 0.5) * sy - 0.5
    xs = (np.arange(out_w) + 0.5) * sx - 0.5
    y0 = np.clip(np.floor(ys), 0, H - 1).astype(np.int32)
    x0 = np.clip(np.floor(xs), 0, W - 1).astype(np.int32)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    wy = np.clip(np.round((ys - y0) * 256), 0, 256).astype(np.int32)
    wx = np.clip(np.round((xs - x0) * 256), 0, 256).astype(np.int32)
    a = rgb[..., y0, :, :][..., :, x0, :].astype(np.int32)
    b = rgb[..., y0, :, :][..., :, x1, :].astype(np.int32)
    c = rgb[..., y1, :, :][..., :, x0, :].astype(np.int32)
    d = rgb[..., y1, :, :][..., :, x1, :].astype(np.int32)
    wx_ = wx[:, None]
    top = a * (256 - wx_) + b * wx_
    bot = c * (256 - wx_) + d * wx_
    wy_ = wy[:, None, None]
    out = (top * (256 - wy_) + bot * wy_ + (1 << 15)) >> 16
    return np.clip(out, 0, 255).astype(np.uint8)
