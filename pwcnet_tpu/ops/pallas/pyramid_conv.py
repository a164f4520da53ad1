"""Fused Pallas TPU kernel for one feature-pyramid level (3 convs).

The pyramid extractor's shallow levels are the worst-profiled part of the
XLA forward: at 448x1024 the finest level's three small-C convolutions
(3->16 stride 2, then 16->16, 16->16) run far below the MXU's N=16
ceiling and XLA surrounds them with a layout-copy storm (~1.2 ms of
{0,3,2,1}<->{1,3,2,0} transposes at 448x1024 b4 bf16 — see
docs/DESIGN.md "Round-2 device profile"). Reference architecture:
FeaturePyramidExtractor_custom, /root/reference/modules.py:42-71.

This kernel runs the whole level in one VMEM pass:

- The stride-2 first conv is made lane-friendly by a W-space-to-depth on
  the XLA side: input (B, H, W, Cin) -> (B, H, 2*Cin, W/2) so every
  horizontal tap of conv1 is a *static lane slice* at half resolution,
  and the 3x3 kernel is remapped to an equivalent 3x2 kernel over the
  doubled channels (`_remap_k1`).
- Each conv row is one MXU matmul: the (Cout, K) reshaped kernel hits a
  (K, W/2) patch matrix assembled in VMEM from static lane slices of the
  stripe (same trick as the cost-volume kernel). M=Cout=16 underfills
  the MXU rows, but K and the W lanes stream, and every intermediate
  stays in VMEM — zero HBM round trips and zero layout copies between
  the three convs.
- Intermediate activations round to the model dtype between convs
  (matching the XLA chain bit-for-bit up to dot ordering); matmuls take
  bf16 operands with f32 accumulation (preferred_element_type), like
  XLA's convolutions.
- bias + LeakyReLU(0.1) fuse after each matmul; SAME zero-padding is a
  zeroed 1-lane margin in the scratch stripes plus row-validity masks.
- The input frame stays in HBM (memory_space=ANY) and each grid step
  DMAs only its (2*TH + 10)-row window — the windowed-kernel recipe from
  ops/pallas/cost_volume.py (lane/sublane padded for aligned copies).

Backward (custom VJP) recomputes the level with the XLA convolutions and
differentiates those — identical math, so training is exact while
inference pays zero layout-copy cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pyramid_level_fused"]

_VMEM_BUDGET = 12 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _leaky(v):
    return jnp.where(v >= 0, v, v * jnp.asarray(0.1, v.dtype))


def _remap_k1(k1):
    """(3, 3, Cin, C) stride-2-in-W kernel -> (3, 2, 2*Cin, C) over the
    W-space-to-depth input. TF/XLA SAME with stride 2 on an even size
    pads only the high side, so output col x reads full-res cols
    2x = (x, sx=0), 2x+1 = (x, sx=1), 2x+2 = (x+1, sx=0)."""
    kh, kw, cin, cout = k1.shape
    assert (kh, kw) == (3, 3)
    k1p = jnp.zeros((3, 2, 2 * cin, cout), k1.dtype)
    k1p = k1p.at[:, 0, :cin, :].set(k1[:, 0])   # col' x,   sx=0  <- kw 0
    k1p = k1p.at[:, 0, cin:, :].set(k1[:, 1])   # col' x,   sx=1  <- kw 1
    k1p = k1p.at[:, 1, :cin, :].set(k1[:, 2])   # col' x+1, sx=0  <- kw 2
    return k1p


def _split_kernel(k, c_pad: int):
    """(KH, KW, Cin, Cout) -> (KW*Cout, KH*c_pad): the horizontal taps
    stacked along the matmul M dim (one dot computes all KW partials —
    M=KW*Cout fills the MXU 2-3x better than per-tap M=Cout dots), with
    the channels of every (dy) block zero-padded to ``c_pad`` sublanes
    to match the stripe concat."""
    kh, kw, cin, cout = k.shape
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, c_pad - cin), (0, 0)))
    return jnp.transpose(kp, (1, 3, 0, 2)).reshape(kw * cout, kh * c_pad)


def _plevel_kernel(
    x_any,
    k1_ref,
    k2_ref,
    k3_ref,
    bias_ref,
    out_ref,
    xw_ref,
    s1_ref,
    s2_ref,
    sem,
    *,
    th: int,
    hh: int,
    wh: int,
    interpret: bool,
):
    """One (batch, H-tile of TH half-res output rows) grid step.

    x_any:   (1, H+10, CINP, WL) HBM  W-s2d input: 4/6 zero rows top and
             bottom (so every window read is in-bounds without
             clamping), 1-col zero margin, lane/sublane padded
    k1_ref:  (2*C, 3*CINP) VMEM  conv1' kernel, dx taps stacked in M
    k2_ref:  (3*C, 3*C)     VMEM  conv2 kernel, dx taps stacked in M
    k3_ref:  (3*C, 3*C)     VMEM
    bias_ref:(3, C) f32     VMEM row biases
    out_ref: (1, TH, C, WH) VMEM tile
    xw_ref:  (1, 2*TH+10, CINP, WL) VMEM scratch — input row window
    s1_ref:  (TH+4, C, WL)  model-dtype scratch — conv1 rows, zero margin
    s2_ref:  (TH+2, C, WL)  model-dtype scratch — conv2 rows

    Per conv row: the three dy stripes are concatenated (all lane-offset
    0 — Mosaic cannot concat mismatched offsets) and hit with one matmul
    per horizontal tap; the f32 partial outputs are then lane-rotated
    into place. This keeps all VPU shuffling to <=2 static rolls per row
    while the MACs ride the MXU with f32 accumulation, exactly like
    XLA's convolutions.
    """
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    r0 = ti * th
    f32 = jnp.float32
    s1w = s1_ref.shape[2]
    c = bias_ref.shape[1]

    # conv1 rows g = r0-2+i (i in [0, th+4)) read padded full-res rows
    # 2g+4 .. 2g+6 = window rows 2i .. 2i+2 with the window starting at
    # absolute padded row 2*r0 (top pad is 4: SAME-stride-2 top tap is
    # full-res row 2g, which is padded row 2g+4).
    dma = pltpu.make_async_copy(
        x_any.at[pl.ds(bi, 1), pl.ds(2 * r0, 2 * th + 10)], xw_ref, sem
    )
    dma.start()
    dma.wait()

    def rolled(p32, shift):
        """Lane-rotate the f32 partial so out col x reads lane x+shift,
        then cut the zero margins."""
        if shift == 0:
            return p32[:, :wh]
        if interpret:
            return jnp.roll(p32, -shift, axis=1)[:, :wh]
        return pltpu.roll(p32, p32.shape[1] - shift, 1)[:, :wh]

    def pad_row(y, width):
        zc = jnp.zeros((y.shape[0], 1), y.dtype)
        zr = jnp.zeros((y.shape[0], width - y.shape[1] - 1), y.dtype)
        return jnp.concatenate([zc, y, zr], axis=1)

    # ---- conv1 (remapped 3x2 kernel over 2*Cin channels, H-stride 2)
    b1 = bias_ref[0, :].astype(f32)

    def row1(i, carry):
        g = r0 - 2 + i  # conv1 output row (half-res coords)
        x3 = jnp.concatenate(
            [xw_ref[0, pl.ds(2 * i + dy, 1), :, :][0] for dy in range(3)],
            axis=0,
        )  # (3*CINP, WL)
        # stacked partials P = [P_0; P_1], P_d[c'] = sum_dy K1'[dy, d] @
        # x[dy, c']; out col x = P_0[col' x] + P_1[col' x+1]; col' c sits
        # at lane c+1
        p = jax.lax.dot(k1_ref[...], x3, preferred_element_type=f32)
        y = _leaky(rolled(p[:c], 1) + rolled(p[c:], 2) + b1[:, None])
        valid = jnp.logical_and(g >= 0, g < hh)
        y = jnp.where(valid, y, jnp.zeros_like(y))
        s1_ref[pl.ds(i, 1), :, :] = pad_row(y, s1w)[None].astype(
            s1_ref.dtype
        )
        return carry

    jax.lax.fori_loop(0, th + 4, row1, 0)

    # ---- conv2 (3x3 over s1): out col x = sum_d P_d[col' x+d-1]
    b2 = bias_ref[1, :].astype(f32)

    def conv33_row(src_ref, j, k_ref, b_vec):
        x3 = jnp.concatenate(
            [src_ref[pl.ds(j + dy, 1), :, :][0] for dy in range(3)],
            axis=0,
        )  # (3*C, WL)
        p = jax.lax.dot(k_ref[...], x3, preferred_element_type=f32)
        return _leaky(
            rolled(p[:c], 0)
            + rolled(p[c : 2 * c], 1)
            + rolled(p[2 * c :], 2)
            + b_vec[:, None]
        )

    def row2(j, carry):
        g = r0 - 1 + j
        y = conv33_row(s1_ref, j, k2_ref, b2)
        valid = jnp.logical_and(g >= 0, g < hh)
        y = jnp.where(valid, y, jnp.zeros_like(y))
        s2_ref[pl.ds(j, 1), :, :] = pad_row(y, s1w)[None].astype(
            s2_ref.dtype
        )
        return carry

    jax.lax.fori_loop(0, th + 2, row2, 0)

    # ---- conv3 -> output tile
    b3 = bias_ref[2, :].astype(f32)

    def row3(j, carry):
        y = conv33_row(s2_ref, j, k3_ref, b3)
        out_ref[0, pl.ds(j, 1), :, :] = y[None].astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, th, row3, 0)


def _plevel_forward(x, k1, b1, k2, b2, k3, b3, *, th, interpret):
    b, h, w, cin = x.shape
    c = k1.shape[-1]
    hh, wh = h // 2, w // 2
    # bf16 sublane tiling is (16, 128): pad the doubled input channels
    # and lane-pad for aligned DMA windows.
    sub = 16 if jnp.dtype(x.dtype).itemsize == 2 else 8
    cin_p = _round_up(2 * cin, sub)
    wl = _round_up(wh + 2, 128)

    # W-space-to-depth + zero pads; layout (B, H+10, CINP, WL)
    xs = x.reshape(b, h, wh, 2 * cin)
    xs = jnp.transpose(xs, (0, 1, 3, 2))  # (B, H, 2Cin, WH)
    xs = jnp.pad(
        xs,
        ((0, 0), (4, 6), (0, cin_p - 2 * cin), (1, wl - wh - 1)),
    )

    k1m = _split_kernel(_remap_k1(k1), cin_p)  # (2C, 3*CINP)
    k2m = _split_kernel(k2, c)  # (3C, 3C)
    k3m = _split_kernel(k3, c)
    bias = jnp.stack([b1, b2, b3]).astype(jnp.float32)  # (3, C)

    out = pl.pallas_call(
        functools.partial(
            _plevel_kernel,
            th=th,
            hh=hh,
            wh=wh,
            interpret=interpret,
        ),
        grid=(b, hh // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                k1m.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                k2m.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                k3m.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                bias.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, c, wh),
            lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hh, c, wh), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, 2 * th + 10, cin_p, wl), x.dtype),
            pltpu.VMEM((th + 4, c, wl), x.dtype),
            pltpu.VMEM((th + 2, c, wl), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xs, k1m, k2m, k3m, bias)
    return jnp.transpose(out, (0, 1, 3, 2))  # NHWC (B, H/2, W/2, C)


def _xla_level(x, k1, b1, k2, b2, k3, b3):
    """Reference XLA formulation (used by the backward and as fallback)."""
    dn = ("NHWC", "HWIO", "NHWC")
    y = _leaky(
        lax.conv_general_dilated(x, k1, (2, 2), "SAME", dimension_numbers=dn)
        + b1
    )
    y = _leaky(
        lax.conv_general_dilated(y, k2, (1, 1), "SAME", dimension_numbers=dn)
        + b2
    )
    return _leaky(
        lax.conv_general_dilated(y, k3, (1, 1), "SAME", dimension_numbers=dn)
        + b3
    )


def _pick_tile(h, w, cin, c, itemsize):
    """Largest half-res row tile whose scratch fits the VMEM budget."""
    hh, wh = h // 2, w // 2
    sub = 16 if itemsize == 2 else 8
    cin_p = _round_up(2 * cin, sub)
    wl = _round_up(wh + 2, 128)
    for t in range(min(hh, 32), 0, -1):
        if hh % t:
            continue
        window = (2 * t + 10) * cin_p * wl * itemsize
        s1 = (t + 4) * c * wl * itemsize
        s2 = (t + 2) * c * wl * itemsize
        out_tile = 2 * t * c * _round_up(wh, 128) * itemsize
        # patch matrix + dot output + padded-row temporaries (f32)
        temps = (9 * c + 3 * c) * wl * 4
        if window + s1 + s2 + out_tile + temps <= _VMEM_BUDGET:
            return t
    return None


def pyramid_level_fused(
    x, k1, b1, k2, b2, k3, b3, tile_h: int | None = None,
    interpret: bool = False,
):
    """One fused pyramid level: conv(s2)+leaky, conv+leaky, conv+leaky.

    Drop-in for the XLA 3-conv chain (exact SAME-padding / LeakyReLU(0.1)
    semantics, f32 accumulation, model-dtype rounding between convs).
    Requires even H and W; falls back to the XLA formulation when no tile
    fits VMEM. Backward recomputes via the XLA convolutions (identical
    math)."""
    b, h, w, cin = x.shape
    if h % 2 or w % 2:
        return _xla_level(x, k1, b1, k2, b2, k3, b3)
    if not interpret and jax.default_backend() == "cpu":
        # No Mosaic on CPU — run the kernel in interpreter mode so tests
        # exercise the same code path the TPU compiles.
        interpret = True
    th = tile_h or _pick_tile(
        h, w, cin, k1.shape[-1], jnp.dtype(x.dtype).itemsize
    )
    if th is None:
        return _xla_level(x, k1, b1, k2, b2, k3, b3)
    return _plevel_vjp(x, k1, b1, k2, b2, k3, b3, th, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _plevel_vjp(x, k1, b1, k2, b2, k3, b3, tile_h, interpret):
    return _plevel_forward(
        x, k1, b1, k2, b2, k3, b3, th=tile_h, interpret=interpret
    )


def _plevel_fwd(x, k1, b1, k2, b2, k3, b3, tile_h, interpret):
    out = _plevel_forward(
        x, k1, b1, k2, b2, k3, b3, th=tile_h, interpret=interpret
    )
    return out, (x, k1, b1, k2, b2, k3, b3)


def _plevel_bwd(tile_h, interpret, res, g):
    _, vjp = jax.vjp(_xla_level, *res)
    return vjp(g)


_plevel_vjp.defvjp(_plevel_fwd, _plevel_bwd)
