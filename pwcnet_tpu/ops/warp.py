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
small enough that this is bandwidth-trivial next to the convs. For the hot
warp->correlation sequence, `pwcnet_tpu.ops.pallas.warped_cost_volume` fuses
the bilinear warp and the 81-tap correlation into one VMEM-resident Pallas
pass (no warped-feature HBM round trip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["nearest_warp", "bilinear_warp", "bilinear_warp_rows", "warp"]


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


def _warp_patches(x: jnp.ndarray, flow: jnp.ndarray):
    """Shared forward machinery: 2x2 corner patches + lerp weights.

    ``x`` is (B, Hf, W, C); ``flow`` is (B, Ho, W, 2) — output row r
    samples ``x`` at row ``r + flow_y(r)`` with independent corner
    clamping against Hf. The plain warp is the special case Ho == Hf;
    the spatially-sharded path passes Ho < Hf (the all-gathered frame
    with the shard's global row offset folded into ``flow[..., 1]``).

    Returns (patches (B,Ho,W,2,2,C), wy0, wy1, wx0, wx1 each (B,Ho,W,1),
    y0p, x0p padded top-left corner indices).
    """
    b, hf, w, c = x.shape
    ho = flow.shape[1]
    fdt = flow.dtype
    fx = flow[..., 0]
    fy = flow[..., 1]
    fx0 = jnp.floor(fx)
    fy0 = jnp.floor(fy)

    gy = jnp.arange(ho, dtype=fdt)[None, :, None]
    gx = jnp.arange(w, dtype=fdt)[None, None, :]

    # padded-coordinate top-left corner of the 2x2 patch
    y0p = (jnp.clip(gy + fy0, -1, hf - 1) + 1).astype(jnp.int32)
    x0p = (jnp.clip(gx + fx0, -1, w - 1) + 1).astype(jnp.int32)

    xe = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")

    starts = jnp.stack(
        [y0p.reshape(b, ho * w), x0p.reshape(b, ho * w)], axis=-1
    )  # (B, N, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patches = jax.lax.gather(
        xe,
        starts,
        dimension_numbers=dnums,
        slice_sizes=(1, 2, 2, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).reshape(b, ho, w, 2, 2, c)

    wy1 = (fy - fy0)[..., None]  # weight of the +1 row
    wy0 = 1.0 - wy1
    wx1 = (fx - fx0)[..., None]
    wx0 = 1.0 - wx1
    return patches, wy0, wy1, wx0, wx1, y0p, x0p


@jax.custom_vjp
def bilinear_warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Bilinear warp of ``x`` by ``flow``: out(p) = x(p + flow(p)).

    Corner coordinates clamp to the image bounds independently; weights are
    computed from the unclamped fractional flow (clamp-to-edge at borders).

    TPU formulation: instead of four separate whole-array gathers (the
    reference's 4x tf.gather_nd, modules.py:126-129), the 2x2 corner
    neighborhood is fetched with ONE patch gather from an edge-replicated
    copy of ``x``. With one pad row/col on every side, indexing at
    ``clamp(grid+floor(flow), -1, size-1) + 1`` and reading a 2-slice
    reproduces the reference's independent corner clamping exactly:
    - in-bounds: rows (y0, y0+1) as usual;
    - below -1: padded row 0 == row 0 == clamp of both corners;
    - at size-1: padded row size == row size-1 == clamp of the +1 corner.

    A custom VJP replaces the autodiff transpose of the patch gather —
    XLA lowers that to a (1,2,2,C)-slice scatter that is ~20x slower on
    TPU than the equivalent four row-scatters used here.
    """
    return _bilinear_warp_impl(x, flow)


def _bilinear_warp_impl(x, flow):
    patches, wy0, wy1, wx0, wx1, _, _ = _warp_patches(x, flow)
    top = patches[..., 0, 0, :] * wx0 + patches[..., 0, 1, :] * wx1
    bot = patches[..., 1, 0, :] * wx0 + patches[..., 1, 1, :] * wx1
    return top * wy0 + bot * wy1


def _bilinear_warp_fwd(x, flow):
    return _bilinear_warp_impl(x, flow), (x, flow)


def _bilinear_warp_bwd(res, g):
    """Exact gradients.

    - d/dflow goes through the lerp weights only (corner indices are
      integer casts, zero-gradient — TF semantics).
    - d/dx is the transpose of the patch gather: four row-scatters into
      the (H+2, W+2) padded grid, whose border rows/cols then fold back
      onto the edge rows/cols they replicate (exactly matching the
      forward's corner clamping).
    """
    x, flow = res
    b, h, w, c = x.shape
    patches, wy0, wy1, wx0, wx1, y0p, x0p = _warp_patches(x, flow)

    # -- dflow (B, H, W, 2)
    top_dx = patches[..., 0, 1, :] - patches[..., 0, 0, :]
    bot_dx = patches[..., 1, 1, :] - patches[..., 1, 0, :]
    dfx = jnp.sum(g * (wy0 * top_dx + wy1 * bot_dx), axis=-1)
    left_dy = patches[..., 1, 0, :] - patches[..., 0, 0, :]
    right_dy = patches[..., 1, 1, :] - patches[..., 0, 1, :]
    dfy = jnp.sum(g * (wx0 * left_dy + wx1 * right_dy), axis=-1)
    dflow = jnp.stack([dfx, dfy], axis=-1).astype(flow.dtype)

    # -- dx: scatter-add the four weighted corner contributions
    wp = w + 2
    batch_ix = jnp.arange(b, dtype=jnp.int32)[:, None]
    dxp = jnp.zeros((b, (h + 2) * wp, c), g.dtype)
    for di, dj, wgt in (
        (0, 0, wy0 * wx0),
        (0, 1, wy0 * wx1),
        (1, 0, wy1 * wx0),
        (1, 1, wy1 * wx1),
    ):
        idx = ((y0p + di) * wp + (x0p + dj)).reshape(b, h * w)
        dxp = dxp.at[batch_ix, idx].add(
            (wgt * g).reshape(b, h * w, c),
            mode="promise_in_bounds",
        )
    dxp = dxp.reshape(b, h + 2, wp, c)
    # fold replicated border rows/cols back onto the true edges
    rows = dxp[:, 1 : h + 1]
    rows = rows.at[:, 0].add(dxp[:, 0]).at[:, h - 1].add(dxp[:, h + 1])
    dx = rows[:, :, 1 : w + 1]
    dx = (
        dx.at[:, :, 0]
        .add(rows[:, :, 0])
        .at[:, :, w - 1]
        .add(rows[:, :, w + 1])
    ).astype(x.dtype)
    return dx, dflow


bilinear_warp.defvjp(_bilinear_warp_fwd, _bilinear_warp_bwd)


def bilinear_warp_rows(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Bilinear warp sampling a frame taller than the output.

    ``x`` is (B, Hf, W, C); ``flow`` is (B, Ho, W, 2) — the Ho < Hf case
    of `_warp_patches` (see its docstring; `bilinear_warp` is Ho == Hf).
    The row-offset fold is exact for integer offsets: floor/frac are
    shift-invariant. Plain autodiff (gather-transpose scatter) — this is
    the fallback for `ops.pallas.warped_cv`'s kernels, not a hot path,
    and the custom row-scatter VJP's index algebra assumes Ho == Hf."""
    return _bilinear_warp_impl(x, flow)


def warp(x: jnp.ndarray, flow: jnp.ndarray, warp_type: str = "bilinear") -> jnp.ndarray:
    """Dispatching warp (the reference's WarpingLayer, modules.py:139-154)."""
    if warp_type == "nearest":
        return nearest_warp(x, flow)
    if warp_type == "bilinear":
        return bilinear_warp(x, flow)
    raise ValueError(f"warp_type must be 'nearest' or 'bilinear', got {warp_type!r}")
