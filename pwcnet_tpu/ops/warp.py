"""Flow-based feature warping (nearest & bilinear), TPU-first.

Behavioral contract (matches the reference exactly, incl. border handling):

- ``flow[..., 0]`` is the horizontal (x) displacement, ``flow[..., 1]``
  vertical (y) — reference /root/reference/modules.py:87-88,106.
- nearest: displacements are truncated toward zero (TF ``tf.cast`` to int32,
  modules.py:85), target coords clamped into bounds.
- bilinear: the four corner coordinates are clamped into bounds
  *independently* while the interpolation weights stay unclamped
  (modules.py:113-137) — this yields clamp-to-edge behavior at borders.

TPU design: the reference uses four `tf.gather_nd` calls over the full
feature map. Arbitrary per-pixel gathers do not vectorize on the VPU, so we
express the warp as `take_along_axis` over a flattened spatial axis, which
XLA lowers to its native TPU gather; feature maps at every pyramid level are
small enough that this is bandwidth-trivial next to the convs. The fused
Pallas warp+correlation path lives in `pwcnet_tpu.ops.pallas`.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["nearest_warp", "bilinear_warp", "warp"]


def _gather_2d(x: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, W, C); yi/xi: (B, H, W) int32 in-bounds -> (B, H, W, C)."""
    b, h, w, c = x.shape
    flat = x.reshape(b, h * w, c)
    idx = (yi * w + xi).reshape(b, h * w, 1)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape(b, h, w, c)


def nearest_warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor warp of ``x`` by ``flow`` (both NHWC / NHW2)."""
    b, h, w, _ = x.shape
    # Truncation toward zero, like TF's float->int32 cast.
    flow_i = flow.astype(jnp.int32)
    gy = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    gx = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    yi = jnp.clip(gy + flow_i[..., 1], 0, h - 1)
    xi = jnp.clip(gx + flow_i[..., 0], 0, w - 1)
    return _gather_2d(x, yi, xi)


def bilinear_warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Bilinear warp of ``x`` by ``flow``: out(p) = x(p + flow(p)).

    Corner coordinates clamp to the image bounds independently; weights are
    computed from the unclamped fractional flow (clamp-to-edge at borders).
    """
    b, h, w, _ = x.shape
    fdt = flow.dtype
    fx = flow[..., 0]
    fy = flow[..., 1]
    fx0 = jnp.floor(fx)
    fy0 = jnp.floor(fy)
    fx1 = fx0 + 1
    fy1 = fy0 + 1

    gy = jnp.arange(h, dtype=fdt)[None, :, None]
    gx = jnp.arange(w, dtype=fdt)[None, None, :]

    y0 = jnp.clip(gy + fy0, 0, h - 1).astype(jnp.int32)
    y1 = jnp.clip(gy + fy1, 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(gx + fx0, 0, w - 1).astype(jnp.int32)
    x1 = jnp.clip(gx + fx1, 0, w - 1).astype(jnp.int32)

    c00 = ((fy1 - fy) * (fx1 - fx))[..., None]
    c01 = ((fy1 - fy) * (fx - fx0))[..., None]
    c10 = ((fy - fy0) * (fx1 - fx))[..., None]
    c11 = ((fy - fy0) * (fx - fx0))[..., None]

    return (
        c00 * _gather_2d(x, y0, x0)
        + c01 * _gather_2d(x, y0, x1)
        + c10 * _gather_2d(x, y1, x0)
        + c11 * _gather_2d(x, y1, x1)
    )


def warp(x: jnp.ndarray, flow: jnp.ndarray, warp_type: str = "bilinear") -> jnp.ndarray:
    """Dispatching warp (the reference's WarpingLayer, modules.py:139-154)."""
    if warp_type == "nearest":
        return nearest_warp(x, flow)
    if warp_type == "bilinear":
        return bilinear_warp(x, flow)
    raise ValueError(f"warp_type must be 'nearest' or 'bilinear', got {warp_type!r}")
