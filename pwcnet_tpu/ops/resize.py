"""TF1-compatible image resizing (align_corners=False, no half-pixel centers).

The reference model's numerics depend on TF 1.8's default resize semantics
(`tf.image.resize_bilinear` / `resize_nearest_neighbor` with
``align_corners=False``; half-pixel centers did not exist yet):

- source coordinate for output index ``i`` is ``i * (in_size / out_size)``
  (float32 arithmetic, no +0.5 offset);
- bilinear: top index = floor(src), bottom index = min(ceil(src), in-1),
  lerp weight = src - floor(src);
- nearest: index = min(floor(src), in-1).

These appear in the reference at: inter-level flow/feature 2x upsampling
(/root/reference/modules.py:283-284), the final 4x flow upsampling
(/root/reference/model.py:127), and the loss-side nearest-neighbor ground
truth downsampling (/root/reference/losses.py:27).

Output sizes are static, so all index/weight tables are computed host-side
with NumPy and baked into the jitted graph as constants — the resize lowers
to two static `take`s plus fused multiply-adds (no dynamic gather on TPU).

Integer upscale factors (the model's 2x inter-level and 4x final
upsamplings) take a faster phase-interleave path: with TF1
align_corners=False semantics, output index ``f*k + p`` sources
``k + p/f``, so each output is a fixed-weight lerp of x and its
1-shifted copy, interleaved by reshape — pure elementwise + concat ops
that XLA fuses, measured ~4x faster than the take-based lowering on v5e
for the final 4x flow upsample.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "resize_bilinear",
    "resize_bilinear_mm",
    "resize_nearest",
    "upsample2x_bilinear",
    "upsample2x_bilinear_mm",
]


def _upsample_axis_int(x: jnp.ndarray, f: int, axis: int) -> jnp.ndarray:
    """TF1 bilinear upsampling by integer factor ``f`` along ``axis``."""
    if f == 1:
        return x
    n = x.shape[axis]
    # neighbor with clamped edge: min(k+1, n-1) — TF1's ceil clamp
    xn = jnp.concatenate(
        [
            lax.slice_in_dim(x, 1, n, axis=axis),
            lax.slice_in_dim(x, n - 1, n, axis=axis),
        ],
        axis,
    )
    phases = [x] + [x + (xn - x) * (p / f) for p in range(1, f)]
    y = jnp.stack(phases, axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= f
    return y.reshape(shape)


@functools.lru_cache(maxsize=None)
def _bilinear_table(in_size: int, out_size: int):
    """(low_idx, high_idx, lerp) tables for one axis, TF1 semantics."""
    scale = np.float32(in_size) / np.float32(out_size)
    src = np.arange(out_size, dtype=np.float32) * scale
    low = np.floor(src)
    high = np.minimum(np.ceil(src), in_size - 1)
    lerp = src - low
    return low.astype(np.int32), high.astype(np.int32), lerp.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _nearest_table(in_size: int, out_size: int):
    scale = np.float32(in_size) / np.float32(out_size)
    src = np.arange(out_size, dtype=np.float32) * scale
    return np.minimum(np.floor(src), in_size - 1).astype(np.int32)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC) ``x`` to spatial ``size=(H, W)``.

    Matches TF1 ``tf.image.resize_bilinear(..., align_corners=False)``.
    """
    out_h, out_w = int(size[0]), int(size[1])
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (out_h, out_w) == (in_h, in_w):
        return x
    if out_h % in_h == 0 and out_w % in_w == 0:
        y = _upsample_axis_int(x, out_h // in_h, x.ndim - 3)
        return _upsample_axis_int(y, out_w // in_w, x.ndim - 2)

    y_lo, y_hi, y_lerp = _bilinear_table(in_h, out_h)
    x_lo, x_hi, x_lerp = _bilinear_table(in_w, out_w)

    # Gather rows (axis -3) then columns (axis -2); indices are constants.
    top = jnp.take(x, y_lo, axis=-3)
    bot = jnp.take(x, y_hi, axis=-3)
    tl = jnp.take(top, x_lo, axis=-2)
    tr = jnp.take(top, x_hi, axis=-2)
    bl = jnp.take(bot, x_lo, axis=-2)
    br = jnp.take(bot, x_hi, axis=-2)

    wy = jnp.asarray(y_lerp, dtype=x.dtype)[:, None, None]
    wx = jnp.asarray(x_lerp, dtype=x.dtype)[:, None]
    t = tl + (tr - tl) * wx
    b = bl + (br - bl) * wx
    return t + (b - t) * wy


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) TF1-bilinear interpolation matrix.

    Row ``o`` holds ``1-lerp`` at ``low[o]`` and ``lerp`` at ``high[o]``
    from :func:`_bilinear_table` — the same tables as the take-based
    path, expressed as a matmul operand.
    """
    lo, hi, lerp = _bilinear_table(in_size, out_size)
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), lo] += 1.0 - lerp
    m[np.arange(out_size), hi] += lerp
    return m


def resize_bilinear_mm(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Matmul-formulated TF1 bilinear resize (same semantics as
    :func:`resize_bilinear`).

    Contracts the H then W axes against dense per-axis interpolation
    matrices (two einsums). The interpolation matrices are 2-banded so
    this does ~``in+out`` MACs per output element where the lerp path
    does ~2 — but on TPU the MXU makes those MACs free relative to the
    layout copies the phase-interleave/take formulations induce inside
    a larger fused graph (measured +2-3% end-to-end on the serving
    model at 448x1024; see PARITY.md §6). Accumulation is f32 with
    HIGHEST precision for f32 inputs, so it stays within a few ULP of
    the lerp path; for bf16 inputs the error is bf16-rounding-sized.
    Used on the serving path via ``PWCDCNet(mm_resize=True)``.
    """
    out_h, out_w = int(size[0]), int(size[1])
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (out_h, out_w) == (in_h, in_w):
        return x
    prec = lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    my = jnp.asarray(_interp_matrix(in_h, out_h), x.dtype)
    mx = jnp.asarray(_interp_matrix(in_w, out_w), x.dtype)
    y = jnp.einsum(
        "oh,...hwc->...owc", my, x,
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(x.dtype)
    y = jnp.einsum(
        "pw,...owc->...opc", mx, y,
        preferred_element_type=jnp.float32, precision=prec,
    )
    return y.astype(x.dtype)


def upsample2x_bilinear_mm(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsampling via the matmul formulation."""
    return resize_bilinear_mm(x, (2 * x.shape[-3], 2 * x.shape[-2]))


def resize_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize of NHWC (or HWC) ``x``; TF1 semantics."""
    out_h, out_w = int(size[0]), int(size[1])
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (out_h, out_w) == (in_h, in_w):
        return x
    y_idx = _nearest_table(in_h, out_h)
    x_idx = _nearest_table(in_w, out_w)
    return jnp.take(jnp.take(x, y_idx, axis=-3), x_idx, axis=-2)


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsampling (the inter-pyramid-level upsampler)."""
    return resize_bilinear(x, (2 * x.shape[-3], 2 * x.shape[-2]))
