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

Two kernel families share this recipe:

- the *row-loop* kernels (`_plevel_kernel` / `_plevel_bwd_kernel`): one
  matmul per output row, windowed HBM streaming — work for any shape
  that fits a tile in VMEM;
- the *banded* kernels (`_plevel_kernel_banded` /
  `_plevel_bwd_kernel_banded`): all tile rows batched into the lane
  dimension, 3 matmuls per tile total — preferred when C is
  sublane-aligned (the write-amplified stripe layout needs it).

Backward is a custom VJP driven by saved post-activation residuals
(banded or margin-lane layout; the gz chain runs in Pallas, dk/db via
XLA vjp on the residuals); the XLA-recompute VJP remains the last-resort
fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pyramid_level_fused"]

from pwcnet_tpu.ops.pallas import common
from pwcnet_tpu.ops.pallas.common import VMEM_BUDGET as _VMEM_BUDGET


from pwcnet_tpu.ops.pallas.common import round_up as _round_up  # noqa: E402


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
    s1x_ref,
    s2x_ref,
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
        # contiguous-rows load + leading-dim merge: free in Mosaic,
        # replaces a 3-copy concat
        cinp = xw_ref.shape[2]
        x3 = xw_ref[0, pl.ds(2 * i, 3), :, :].reshape(3 * cinp, -1)
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
        x3 = src_ref[pl.ds(j, 3), :, :].reshape(3 * c, -1)
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

    if s1x_ref is not None:
        # post-activation intermediates (margin-lane layout) for the
        # Pallas backward: VJP residuals instead of an XLA recompute
        s1x_ref[0] = s1_ref[2 : 2 + th, :, :]
        s2x_ref[0] = s2_ref[1 : 1 + th, :, :]


def _plevel_kernel_infer(
    x_any, k1_ref, k2_ref, k3_ref, bias_ref, out_ref,
    xw_ref, s1_ref, s2_ref, sem, **kw,
):
    _plevel_kernel(
        x_any, k1_ref, k2_ref, k3_ref, bias_ref, out_ref, None, None,
        xw_ref, s1_ref, s2_ref, sem, **kw,
    )


def _plevel_forward(
    x, k1, b1, k2, b2, k3, b3, *, th, interpret, save_acts=False
):
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

    kern = _plevel_kernel if save_acts else _plevel_kernel_infer
    out_specs = [
        pl.BlockSpec(
            (1, th, c, wh), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, hh, c, wh), x.dtype)]
    if save_acts:
        for _ in range(2):
            out_specs.append(
                pl.BlockSpec(
                    (1, th, c, wl), lambda bi, i: (bi, i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            out_shape.append(jax.ShapeDtypeStruct((b, hh, c, wl), x.dtype))
    res = pl.pallas_call(
        functools.partial(
            kern,
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
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((1, 2 * th + 10, cin_p, wl), x.dtype),
            pltpu.VMEM((th + 4, c, wl), x.dtype),
            pltpu.VMEM((th + 2, c, wl), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xs, k1m, k2m, k3m, bias)
    out = jnp.transpose(res[0], (0, 1, 3, 2))  # NHWC (B, H/2, W/2, C)
    if save_acts:
        return out, res[1], res[2]  # s1/s2 in (B, HH, C, WL) margin layout
    return out


def _pick_tile_banded(shape, c, itemsize, requested=None):
    """Row tile for the banded forward kernel; None -> row-loop kernel.

    A ``requested`` tile is honored when it divides the output height and
    fits the VMEM budget; otherwise auto-planning falls through (largest
    dividing tile that fits)."""
    b, h, w, cin = shape
    hh, wh = h // 2, w // 2
    sub = 16 if itemsize == 2 else 8
    if c % sub:
        # store-slot sublane offsets (dy * C) must be tile-aligned
        return None
    cin_p = _round_up(2 * cin, sub)
    wl = _round_up(wh + 2, 128)

    def fits(t):
        xw = 2 * cin_p * (t + 5) * wl * itemsize
        s1 = 3 * c * (t + 6) * wl * itemsize
        s2 = 3 * c * (t + 4) * wl * itemsize
        out_t = c * t * wl * itemsize
        # the two in-kernel f32 band masks ((t+4)+(t+2) row blocks)
        masks = (2 * t + 6) * wl * 4
        # f32 dot output + roll copies + pre-cast row block per conv
        temps = 6 * max(c, cin_p) * (t + 4) * wl * 4
        return xw + s1 + s2 + out_t + masks + temps <= _VMEM_BUDGET

    if requested and hh % requested == 0 and fits(requested):
        return requested
    for t in range(min(hh, 64), 0, -1):
        if hh % t == 0 and fits(t):
            return t
    return None


def _band_mask(r0, n_rows, off, hh, wh, wl):
    """(1, n_rows*wl) f32 band mask, computed IN-KERNEL per tile: row
    validity (band block i of the tile at half-res row offset ``r0`` is
    row r0 + i - off, valid iff in [0, hh)) times lane margins (data in
    lanes 1..wh).

    Rebuilt from a flat iota inside the kernel rather than streamed as a
    (nt, n_rows*wl) operand because Mosaic rejects the (1, n_rows*wl)
    per-tile block such an operand needs (a sublane block dim of 1 is
    neither divisible by 8 nor the full array dim); a handful of VPU
    int ops per tile is free next to the three MXU dots."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n_rows * wl), 1)
    blk = idx // wl
    lane = idx - blk * wl
    row = blk + (r0 - off)
    ok = (row >= 0) & (row < hh) & (lane >= 1) & (lane <= wh)
    return ok.astype(jnp.float32)


def _plevel_kernel_banded(
    x_any,
    k1a_ref,
    k1b_ref,
    k2_ref,
    k3_ref,
    bias_ref,
    out_ref,
    s1o_ref,
    s2o_ref,
    xw_ref,
    s1_ref,
    s2_ref,
    sem,
    *,
    th: int,
    hh: int,
    wh: int,
    wl: int,
    interpret: bool,
):
    """Banded (batched-rows) variant: one MXU matmul per conv per
    (batch, H-tile) grid step instead of one per output *row*.

    All rows live in the lane dimension: every stored row occupies one
    WL-lane block of a 2D (channels, rows*WL) array, so a conv's whole
    RHS patch is a static lane-slice and the per-row fori_loop (whose
    ~200 ns/row dispatch overhead dominated the row-loop kernel's
    profile) disappears. The dy taps are stacked along K by *write
    amplification*: each conv's output block is stored three times at
    lane offsets shifted by one row-block and sublane offsets dy*C, so
    the next conv reads a ready-made (3C, rows*WL) stripe — same K=3C
    MXU occupancy as the row-loop kernel, 3 dots per tile total.

    x_any: (B, 2*CINP, (HH+5)*WL) HBM — W-space-to-depth input further
        H-space-to-depth'd into the 2 DISTINCT row-phase planes (even
        plane row p = padded full-res row 2p, odd = 2p+1; the third dy
        tap, padded row 2p+2, is just the even plane shifted one row
        block, so materializing it as a third plane — as this kernel
        originally did — duplicates the frame 1.5x in HBM for nothing).
        conv1 contracts the dy=0,1 taps in one dot with K = 2*CINP
        (k1a) and the dy=2 tap in a second dot with K = CINP (k1b)
        whose RHS is the even channels of the SAME VMEM window at a
        one-row-block lane offset. Each grid step DMAs its
        (2*CINP, (TH+5)*WL) lane window — 2/3 the bytes of the 3-plane
        layout, and the XLA-side prep drops the 3x gather/concat
        (measured ~1 ms of copy fusions at 448x1024 b8 bf16).
    Band masks — row validity (vertical SAME zero padding) times lane
    margins (data in lanes 1..wh) — are rebuilt in-kernel per tile
    (`_band_mask`) and applied by one multiply.
    s1/s2_ref: (3C, rows*WL) model-dtype scratch, dy-block layout above.
    out_ref: (1, C, TH*WL) tile of the (B, C, HH*WL) output (margins
        stripped and transposed to NHWC on the XLA side).
    """
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    r0 = ti * th
    f32 = jnp.float32
    c = out_ref.shape[1]
    n1 = (th + 4) * wl
    n2 = (th + 2) * wl
    n3 = th * wl

    dma = pltpu.make_async_copy(
        x_any.at[pl.ds(bi, 1), :, pl.ds(r0 * wl, n1 + wl)], xw_ref, sem
    )
    dma.start()
    dma.wait()

    def lroll(v, s):
        """out lane l <- v[l + s]; cross-block wrap lands only in
        masked margin lanes."""
        if s == 0:
            return v
        if interpret:
            return jnp.roll(v, -s, axis=1)
        return pltpu.roll(v, v.shape[1] - s, 1)

    def rroll(v, s):
        if s == 0:
            return v
        if interpret:
            return jnp.roll(v, s, axis=1)
        return pltpu.roll(v, s, 1)

    m1 = _band_mask(r0, th + 4, 2, hh, wh, wl)
    m2 = _band_mask(r0, th + 2, 1, hh, wh, wl)

    # ---- conv1: all th+4 output rows in two dots (K = 2*CINP + CINP);
    # the dy=2 tap reads the even plane one row-block ahead — a static
    # lane slice of the window already in VMEM, not a third HBM plane
    cin_p = k1b_ref.shape[1]
    p = jax.lax.dot(
        k1a_ref[...], xw_ref[0, :, :n1], preferred_element_type=f32
    )
    p += jax.lax.dot(
        k1b_ref[...], xw_ref[0, :cin_p, wl : wl + n1],
        preferred_element_type=f32,
    )
    y = p[:c] + lroll(p[c:], 1)
    y = _leaky(y + bias_ref[0, :].astype(f32)[:, None]) * m1
    y = y.astype(s1_ref.dtype)
    if s1o_ref is not None:
        # exact rows r0..r0+th-1 = band blocks 2..th+1: post-activation
        # residual for the banded Pallas backward
        s1o_ref[0] = y[:, 2 * wl : (2 + th) * wl]
    for dy in range(3):
        s1_ref[dy * c : (dy + 1) * c, (2 - dy) * wl : (2 - dy) * wl + n1] = y

    # ---- conv2
    p = jax.lax.dot(
        k2_ref[...], s1_ref[:, 2 * wl : 2 * wl + n2],
        preferred_element_type=f32,
    )
    z = rroll(p[:c], 1) + p[c : 2 * c] + lroll(p[2 * c :], 1)
    y = _leaky(z + bias_ref[1, :].astype(f32)[:, None]) * m2
    y = y.astype(s2_ref.dtype)
    if s2o_ref is not None:
        # exact rows = band blocks 1..th
        s2o_ref[0] = y[:, 1 * wl : (1 + th) * wl]
    for dy in range(3):
        s2_ref[dy * c : (dy + 1) * c, (2 - dy) * wl : (2 - dy) * wl + n2] = y

    # ---- conv3 -> output tile (margin lanes carry roll garbage; the
    # XLA side strips them)
    p = jax.lax.dot(
        k3_ref[...], s2_ref[:, 2 * wl : 2 * wl + n3],
        preferred_element_type=f32,
    )
    z = rroll(p[:c], 1) + p[c : 2 * c] + lroll(p[2 * c :], 1)
    y = _leaky(z + bias_ref[2, :].astype(f32)[:, None])
    out_ref[0] = y.astype(out_ref.dtype)


def _plevel_kernel_banded_infer(
    x_any, k1a_ref, k1b_ref, k2_ref, k3_ref, bias_ref, out_ref,
    xw_ref, s1_ref, s2_ref, sem, **kw,
):
    _plevel_kernel_banded(
        x_any, k1a_ref, k1b_ref, k2_ref, k3_ref, bias_ref, out_ref,
        None, None, xw_ref, s1_ref, s2_ref, sem, **kw,
    )


def _plevel_forward_banded(
    x, k1, b1, k2, b2, k3, b3, *, th, interpret, save_acts=False
):
    b, h, w, cin = x.shape
    c = k1.shape[-1]
    hh, wh = h // 2, w // 2
    itemsize = jnp.dtype(x.dtype).itemsize
    sub = 16 if itemsize == 2 else 8
    cin_p = _round_up(2 * cin, sub)
    wl = _round_up(wh + 2, 128)
    nt = hh // th

    # W-s2d, channel-major, then H-s2d into the 2 DISTINCT row-phase
    # planes (plane s row p = padded full-res row 2p+s, s in {even,
    # odd}). conv1 output row g reads padded rows 2g+4..2g+6 =
    # even[g+2], odd[g+2], even[g+3] — the third dy tap is the even
    # plane one row block ahead, resolved as a VMEM lane slice
    # in-kernel, so the gather/concat writes 2 planes, not 3 (a 5-D
    # reshape/transpose formulation that avoids the gather entirely was
    # A/B'd and is WORSE: XLA's layout assignment reacts with ~3.5 ms
    # of full-res layout copies on the images and the level boundary —
    # 540 -> 421 pairs/s e2e; keep this transpose+pad+strided-slice
    # structure, which layout assignment handles cleanly).
    xs = x.reshape(b, h, wh, 2 * cin)
    xs = jnp.transpose(xs, (0, 3, 1, 2))  # (B, 2Cin, H, WH)
    xs = jnp.pad(
        xs, ((0, 0), (0, cin_p - 2 * cin), (4, 8), (1, wl - wh - 1))
    )
    npl = hh + 5
    planes = [xs[:, :, s : s + 2 * npl : 2, :] for s in range(2)]
    x2 = jnp.concatenate(planes, axis=1)  # (B, 2*CINP, HH+5, WL)
    x2 = x2.reshape(b, 2 * cin_p, npl * wl)

    k1m = _split_kernel(_remap_k1(k1), cin_p)  # (2C, 3*CINP)
    k1a, k1b = k1m[:, : 2 * cin_p], k1m[:, 2 * cin_p :]
    k2m = _split_kernel(k2, c)  # (3C, 3C)
    k3m = _split_kernel(k3, c)
    bias = jnp.stack([b1, b2, b3]).astype(jnp.float32)  # (3, C)

    kern = _plevel_kernel_banded if save_acts else _plevel_kernel_banded_infer
    out_specs = [
        pl.BlockSpec(
            (1, c, th * wl), lambda bi, i: (bi, 0, i),
            memory_space=pltpu.VMEM,
        )
    ] * (3 if save_acts else 1)
    out_shape = [
        jax.ShapeDtypeStruct((b, c, hh * wl), x.dtype)
        for _ in range(3 if save_acts else 1)
    ]
    res = pl.pallas_call(
        functools.partial(
            kern, th=th, hh=hh, wh=wh, wl=wl, interpret=interpret
        ),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                k1a.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                k1b.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM
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
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((1, 2 * cin_p, (th + 5) * wl), x.dtype),
            pltpu.VMEM((3 * c, (th + 6) * wl), x.dtype),
            pltpu.VMEM((3 * c, (th + 4) * wl), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x2, k1a, k1b, k2m, k3m, bias)
    out = res[0].reshape(b, c, hh, wl)[:, :, :, 1 : wh + 1]
    out = jnp.transpose(out, (0, 2, 3, 1))  # NHWC
    if save_acts:
        return out, res[1], res[2]  # s1/s2 residuals, banded (B, C, HH*WL)
    return out


def _pick_tile_bwd_banded(shape, c, itemsize):
    """Row tile for the banded backward; None -> row-loop fallback."""
    b, h, w, cin = shape
    hh, wh = h // 2, w // 2
    sub = 16 if itemsize == 2 else 8
    if c % sub:
        return None
    cin_p = _round_up(2 * cin, sub)
    wl = _round_up(wh + 2, 128)

    def fits(t):
        n = (t + 4) * wl
        windows = 4 * c * n * itemsize          # g/out/s1/s2 windows
        chain = 2 * 3 * c * n * 4               # dp + v f32 (widest stage)
        bands = 4 * c * n * 4                   # gz3/ds2/gz2/ds1 f32
        outs = 3 * c * t * wl * itemsize + 3 * cin_p * t * wl * 4
        dxv = 2 * max(3 * cin_p, 2 * c) * t * wl * 4
        return windows + chain + bands + outs + dxv + n * 4 <= _VMEM_BUDGET

    for t in range(min(hh, 64), 0, -1):
        if hh % t == 0 and fits(t):
            return t
    return None


def _plevel_bwd_kernel_banded(
    g_any,
    out_any,
    s1_any,
    s2_any,
    k1t_ref,
    k2t_ref,
    k3t_ref,
    gz1_ref,
    gz2_ref,
    gz3_ref,
    dxp_ref,
    gw_ref,
    ow_ref,
    s1w_ref,
    s2w_ref,
    sems,
    *,
    th: int,
    hh: int,
    wh: int,
    wl: int,
    interpret: bool,
):
    """Banded gz chain: the whole (batch, H-tile) backward in 3 dots.

    The row-loop backward (`_plevel_bwd_kernel`) unrolls 3*(TH+4) small
    dots plus per-row scatter-adds; here the band layout of the banded
    forward makes each chain stage one matmul over all rows at once, with
    the cross-row scatter-adds becoming whole-block lane rolls
    (ds[u] = sum_dy v_dy[u+1-dy]; roll wrap lands only in the band's
    first/last halo blocks, which nothing downstream reads).

    g/out/s1/s2_any: (B, C, (HH+4)*WL) HBM banded frames, 2 zero blocks
        of padding each side; s1/s2 are the banded forward's saved
        post-activation residuals (exact zeros in margins and invalid
        rows, so LeakyReLU sign masks and roll wraps stay clean).
    The (1, (TH+4)*WL) row-validity x lane-margin mask (off=2) — the
        banded analogue of the row backward's `valid` gating: conv2's
        vertical-SAME zero rows must not leak gradient — is rebuilt
        in-kernel per tile (`_band_mask`).
    dxp_ref: (1, 3*CINP, TH*WL) dx in the forward's 3-row-phase-plane
        H-space-to-depth layout, plane block p' = plane index p-2. Each
        x3 plane entry feeds exactly ONE conv1 output row, so per-tile
        dx windows are disjoint — no overlap-add (the row backward
        needs one); the XLA side re-interleaves even/odd full-res rows.
    """
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    r0 = ti * th
    f32 = jnp.float32
    c = gz1_ref.shape[1]
    n = (th + 4) * wl

    copies = [
        pltpu.make_async_copy(
            src.at[pl.ds(bi, 1), :, pl.ds(r0 * wl, n)], dst, sems.at[k]
        )
        for k, (src, dst) in enumerate(
            [
                (g_any, gw_ref),
                (out_any, ow_ref),
                (s1_any, s1w_ref),
                (s2_any, s2w_ref),
            ]
        )
    ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    def lroll(v, s):
        if s == 0:
            return v
        if interpret:
            return jnp.roll(v, -s, axis=1)
        return pltpu.roll(v, v.shape[1] - s, 1)

    def rroll(v, s):
        if s == 0:
            return v
        if interpret:
            return jnp.roll(v, s, axis=1)
        return pltpu.roll(v, s, 1)

    def leaky_mask(v):
        return jnp.where(v >= 0, jnp.asarray(1.0, f32), jnp.asarray(0.1, f32))

    def chain_stage(gz, kt_ref):
        # dP_d = unroll_d(gz) (forward applied roll_d to partial d);
        # ds[u] = sum_dy v_dy[u+1-dy] — whole-block rolls
        dp = jnp.concatenate([lroll(gz, 1), gz, rroll(gz, 1)], axis=0)
        v = jax.lax.dot(kt_ref[...], dp, preferred_element_type=f32)
        cc = v.shape[0] // 3
        return lroll(v[:cc], wl) + v[cc : 2 * cc] + rroll(v[2 * cc :], wl)

    mb = _band_mask(r0, th + 4, 2, hh, wh, wl)

    # ---- conv3 backward
    gz3 = gw_ref[0].astype(f32) * leaky_mask(ow_ref[0].astype(f32))
    gz3_ref[0] = gz3[:, 2 * wl : (2 + th) * wl].astype(gz3_ref.dtype)
    ds2 = chain_stage(gz3, k3t_ref)

    # ---- conv2 backward (mask: vertical-SAME rows carry no gradient)
    gz2 = ds2 * leaky_mask(s2w_ref[0].astype(f32)) * mb
    gz2_ref[0] = gz2[:, 2 * wl : (2 + th) * wl].astype(gz2_ref.dtype)
    ds1 = chain_stage(gz2, k2t_ref)

    # ---- conv1 backward on exact rows; dx in 3-plane s2d layout.
    # ds1's margin lanes hold gradients of the forward's zero margins
    # (lroll wrap in chain_stage) — mask them (exact-band slice of mb)
    # or rroll(gz1, 1) leaks them into lane 1's K1 tap (= full col 0).
    gz1 = (ds1 * leaky_mask(s1w_ref[0].astype(f32)))[
        :, 2 * wl : (2 + th) * wl
    ] * mb[:, 2 * wl : (2 + th) * wl]
    gz1_ref[0] = gz1.astype(gz1_ref.dtype)
    dp = jnp.concatenate([gz1, rroll(gz1, 1)], axis=0)
    v = jax.lax.dot(k1t_ref[...], dp, preferred_element_type=f32)
    dxp_ref[0] = v.astype(dxp_ref.dtype)


def _dkdb_xla(x, s1n, s2n, k1, k2, k3, b1, b2, b3, gz1n, gz2n, gz3n):
    """dk/db via XLA vjp of the plain convolutions on saved activations
    (the lane-contraction correlations XLA is good at)."""
    dn = ("NHWC", "HWIO", "NHWC")

    def dk_of(inp, kern, stride, gz):
        _, vjp = jax.vjp(
            lambda kk: lax.conv_general_dilated(
                inp, kk, (stride, stride), "SAME", dimension_numbers=dn
            ),
            kern,
        )
        return vjp(gz)[0]

    dk1 = dk_of(x, k1, 2, gz1n)
    dk2 = dk_of(s1n, k2, 1, gz2n)
    dk3 = dk_of(s2n, k3, 1, gz3n)
    db1 = jnp.sum(gz1n.astype(jnp.float32), axis=(0, 1, 2)).astype(b1.dtype)
    db2 = jnp.sum(gz2n.astype(jnp.float32), axis=(0, 1, 2)).astype(b2.dtype)
    db3 = jnp.sum(gz3n.astype(jnp.float32), axis=(0, 1, 2)).astype(b3.dtype)
    return dk1, db1, dk2, db2, dk3, db3


def _plevel_bwd_banded(
    x, k1, b1, k2, b2, k3, b3, out, s1b, s2b, g, th, interpret
):
    """(dx, dk1, db1, ..., db3) via the banded gz-chain kernel."""
    b, h, w, cin = x.shape
    c = k1.shape[-1]
    hh, wh = h // 2, w // 2
    itemsize = jnp.dtype(x.dtype).itemsize
    sub = 16 if itemsize == 2 else 8
    cin_p = _round_up(2 * cin, sub)
    wl = _round_up(wh + 2, 128)
    nt = hh // th

    def to_banded(arr_nhwc):
        t = jnp.transpose(arr_nhwc, (0, 3, 1, 2))  # (B, C, HH, WH)
        t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (1, wl - wh - 1)))
        return t.reshape(b, c, hh * wl)

    def pad_blocks(band):
        return jnp.pad(band, ((0, 0), (0, 0), (2 * wl, 2 * wl)))

    gb = pad_blocks(to_banded(g))
    ob = pad_blocks(to_banded(out))
    s1f = pad_blocks(s1b)
    s2f = pad_blocks(s2b)

    k1t = jnp.transpose(_split_kernel(_remap_k1(k1), cin_p))  # (3CINP, 2C)
    k2t = jnp.transpose(_split_kernel(k2, c))  # (3C, 3C)
    k3t = jnp.transpose(_split_kernel(k3, c))

    gz1, gz2, gz3, dxp = pl.pallas_call(
        functools.partial(
            _plevel_bwd_kernel_banded,
            th=th,
            hh=hh,
            wh=wh,
            wl=wl,
            interpret=interpret,
        ),
        grid=(b, nt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4
        + [
            pl.BlockSpec(
                k1t.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                k2t.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                k3t.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, c, th * wl), lambda bi, i: (bi, 0, i),
                memory_space=pltpu.VMEM,
            )
        ]
        * 3
        + [
            pl.BlockSpec(
                (1, 3 * cin_p, th * wl), lambda bi, i: (bi, 0, i),
                memory_space=pltpu.VMEM,
            )
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, hh * wl), x.dtype) for _ in range(3)
        ]
        + [jax.ShapeDtypeStruct((b, 3 * cin_p, hh * wl), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, c, (th + 4) * wl), x.dtype)] * 4
        + [pltpu.SemaphoreType.DMA((4,))],
        interpret=interpret,
    )(gb, ob, s1f, s2f, k1t, k2t, k3t)

    # ---- dx: un-H-s2d the 3 row-phase planes (plane p = block + 2;
    # padded full-res row 2p from plane0[p] + plane2[p-1], row 2p+1 from
    # plane1[p]) — interleave even/odd rows, then strip pads and undo
    # the W-space-to-depth
    npl = hh + 5
    planes = dxp.reshape(b, 3, cin_p, hh, wl)
    planes = jnp.pad(
        planes, ((0, 0), (0, 0), (0, 0), (2, npl - hh - 2), (0, 0))
    )
    p2s = jnp.pad(
        planes[:, 2], ((0, 0), (0, 0), (1, 0), (0, 0))
    )[:, :, :npl]
    even = planes[:, 0] + p2s
    rows = jnp.stack([even, planes[:, 1]], axis=3).reshape(
        b, cin_p, 2 * npl, wl
    )
    dxs2d = rows[:, : 2 * cin, 4 : 4 + h, 1 : wh + 1]  # (B, 2Cin, H, WH)
    dx = (
        jnp.transpose(dxs2d, (0, 2, 3, 1))
        .reshape(b, h, w, cin)
        .astype(x.dtype)
    )

    def from_banded(band):
        t = band.reshape(b, c, hh, wl)[:, :, :, 1 : wh + 1]
        return jnp.transpose(t, (0, 2, 3, 1))

    gz1n, gz2n, gz3n = from_banded(gz1), from_banded(gz2), from_banded(gz3)
    s1n, s2n = from_banded(s1b), from_banded(s2b)
    dk1, db1, dk2, db2, dk3, db3 = _dkdb_xla(
        x, s1n, s2n, k1, k2, k3, b1, b2, b3, gz1n, gz2n, gz3n
    )
    return dx, dk1, db1, dk2, db2, dk3, db3


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


def _pick_tile(h, w, cin, c, itemsize, requested: int | None = None):
    """Largest half-res row tile whose scratch fits the VMEM budget.

    ``requested``: a caller tile, honored only if it divides the half-res
    row count AND fits the budget (the grid is hh // tile, so a
    non-dividing tile would silently leave the trailing output rows
    unwritten); otherwise auto-plan."""
    hh, wh = h // 2, w // 2
    sub = 16 if itemsize == 2 else 8
    cin_p = _round_up(2 * cin, sub)
    wl = _round_up(wh + 2, 128)

    def fits(t):
        window = (2 * t + 10) * cin_p * wl * itemsize
        s1 = (t + 4) * c * wl * itemsize
        s2 = (t + 2) * c * wl * itemsize
        out_tile = 2 * t * c * _round_up(wh, 128) * itemsize
        # patch matrix + dot output + padded-row temporaries (f32)
        temps = (9 * c + 3 * c) * wl * 4
        return window + s1 + s2 + out_tile + temps <= _VMEM_BUDGET

    if requested is not None and hh % requested == 0 and fits(requested):
        return requested
    for t in range(min(hh, 32), 0, -1):
        if hh % t == 0 and fits(t):
            return t
    return None


def pyramid_level_fused(
    x, k1, b1, k2, b2, k3, b3, tile_h: int | None = None,
    interpret: bool = False, banded: bool = True,
):
    """One fused pyramid level: conv(s2)+leaky, conv+leaky, conv+leaky.

    Drop-in for the XLA 3-conv chain (exact SAME-padding / LeakyReLU(0.1)
    semantics, f32 accumulation, model-dtype rounding between convs).
    Requires even H and W; falls back to the XLA formulation when no tile
    fits VMEM. ``banded=False`` pins the row-loop kernels (A/B switch;
    the banded variants dispatch whenever their planners accept)."""
    b, h, w, cin = x.shape
    if h % 2 or w % 2:
        return _xla_level(x, k1, b1, k2, b2, k3, b3)
    interpret = common.resolve_interpret(interpret)
    itemsize = jnp.dtype(x.dtype).itemsize
    th = _pick_tile(h, w, cin, k1.shape[-1], itemsize, requested=tile_h)
    if th is None:
        return _xla_level(x, k1, b1, k2, b2, k3, b3)
    tb = (
        _pick_tile_banded(x.shape, k1.shape[-1], itemsize, requested=tile_h)
        if banded
        else None
    )
    return _plevel_vjp(x, k1, b1, k2, b2, k3, b3, th, tb, interpret)


def _plevel_bwd_kernel(
    g_ref,
    out_ref,
    s1_ref,
    s2_ref,
    k1t_ref,
    k2t_ref,
    k3t_ref,
    gz1_ref,
    gz2_ref,
    gz3_ref,
    dx_ref,
    gw_ref,
    ow_ref,
    s1w_ref,
    s2w_ref,
    ds1_ref,
    ds2_ref,
    dxs_ref,
    sems,
    *,
    th: int,
    hh: int,
    wh: int,
    cin_p: int,
    need_dx: bool,
    interpret: bool,
):
    """Backward gz chain for one fused pyramid level, one (batch, H-tile)
    grid step — no XLA scatters, no in-kernel transposes, no recompute.

    The chain d(out) -> d(z3) -> d(s2) -> d(z2) -> d(s1) -> d(z1) -> dx
    needs only (a) LeakyReLU sign masks from the *post-activation* values
    (saved by the forward kernel / the out residual), (b) static lane
    rolls of the cotangent rows, and (c) matmuls against the statically
    transposed stacked kernels (k?t = k?m.T, built at trace time) — the
    exact transpose of the forward's per-row formulation. The awkward
    lane-contraction dk/db correlations are left to XLA vjp on the saved
    activations (see `_plevel_bwd`).

    g_ref/out_ref/s1_ref/s2_ref: (1, HH+4, C, WL) HBM (memory_space=ANY),
        2 zero rows of padding each side, margin-lane layout (data in
        lanes 1..wh). g/out rows hold conv3 output cotangent/value; s1/s2
        the saved post-activation intermediates. Each grid step DMAs only
        its (TH+4)-row window into the g/o/s1/s2 window scratches — the
        kernel fits VMEM at any frame height.
    k1t_ref: (3*CINP, 2C); k2t/k3t: (3C, 3C) transposed stacked kernels
    gz1/gz2/gz3_ref: (1, TH, C, WL) output tiles: d(z_i) on exact rows
    dx_ref: (1, 1, 2TH+2, CINP, WL) output: tile's dx window (W-s2d,
        overlap-added across tiles on the XLA side)
    ds1/ds2_ref: (TH+4, C, WL) f32 scratch
    dxs_ref: (2TH+2, CINP, WL) f32 scratch
    """
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    r0 = ti * th
    f32 = jnp.float32
    c = gz1_ref.shape[2]
    wl = gz1_ref.shape[3]

    # overlap the four row-window DMAs, then wait for all
    copies = [
        pltpu.make_async_copy(
            src.at[pl.ds(bi, 1), pl.ds(r0, th + 4)], dst, sems.at[k]
        )
        for k, (src, dst) in enumerate(
            [
                (g_ref, gw_ref),
                (out_ref, ow_ref),
                (s1_ref, s1w_ref),
                (s2_ref, s2w_ref),
            ]
        )
    ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    # data lives in lanes 1..wh; the margin lanes of ds1/ds2 accumulate
    # gradients of the forward's zero margins, which must not leak into
    # data lanes through the rolls -> zero them before each chain stage
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, wl), 1)
    lane_mask = jnp.where(
        jnp.logical_and(lane >= 1, lane <= wh),
        jnp.asarray(1.0, f32),
        jnp.asarray(0.0, f32),
    )

    def rollr(v, shift):
        """Static right-roll: out lane i reads in lane i - shift."""
        if shift == 0:
            return v
        if interpret:
            return jnp.roll(v, shift, axis=1)
        return pltpu.roll(v, shift % wl, 1)

    def leaky_mask(v):
        return jnp.where(v >= 0, jnp.asarray(1.0, f32), jnp.asarray(0.1, f32))

    def row(ref, idx):
        return ref[0, pl.ds(idx, 1), :, :][0]

    ds2_ref[...] = jnp.zeros(ds2_ref.shape, ds2_ref.dtype)
    ds1_ref[...] = jnp.zeros(ds1_ref.shape, ds1_ref.dtype)
    if need_dx:
        dxs_ref[...] = jnp.zeros(dxs_ref.shape, dxs_ref.dtype)

    # ---- conv3 backward: gz3 rows r0-2 .. r0+th+2 fill ds2
    for jj in range(th + 4):
        # conv3 out row r = r0 - 2 + jj lives at padded index r0 + jj
        gz = row(gw_ref, jj).astype(f32) * leaky_mask(
            row(ow_ref, jj).astype(f32)
        )
        if 2 <= jj < th + 2:
            gz3_ref[0, pl.ds(jj - 2, 1), :, :] = gz[None].astype(
                gz3_ref.dtype
            )
        dp = jnp.concatenate([rollr(gz, d - 1) for d in range(3)], axis=0)
        v = jax.lax.dot(k3t_ref[...], dp, preferred_element_type=f32)
        for dy in range(3):
            t = jj + dy - 1
            if 0 <= t < th + 4:
                ds2_ref[pl.ds(t, 1), :, :] += v[dy * c : (dy + 1) * c][None]

    # ---- conv2 backward: gz2 rows r0-1 .. r0+th+1 (exact) fill ds1
    for sj in range(1, th + 3):
        r = r0 - 2 + sj
        gz = ds2_ref[sj].astype(f32) * leaky_mask(
            row(s2w_ref, sj).astype(f32)
        ) * lane_mask
        valid = jnp.logical_and(r >= 0, r < hh)
        gz = jnp.where(valid, gz, jnp.zeros_like(gz))
        if 2 <= sj < th + 2:
            gz2_ref[0, pl.ds(sj - 2, 1), :, :] = gz[None].astype(
                gz2_ref.dtype
            )
        dp = jnp.concatenate([rollr(gz, d - 1) for d in range(3)], axis=0)
        v = jax.lax.dot(k2t_ref[...], dp, preferred_element_type=f32)
        for dy in range(3):
            ds1_ref[pl.ds(sj + dy - 1, 1), :, :] += (
                v[dy * c : (dy + 1) * c][None]
            )

    # ---- conv1 backward: gz1 on exact rows; dx into the s2d window
    for sj in range(2, th + 2):
        r = r0 - 2 + sj
        gz = ds1_ref[sj].astype(f32) * leaky_mask(
            row(s1w_ref, sj).astype(f32)
        ) * lane_mask
        valid = jnp.logical_and(r >= 0, r < hh)
        gz = jnp.where(valid, gz, jnp.zeros_like(gz))
        gz1_ref[0, pl.ds(sj - 2, 1), :, :] = gz[None].astype(gz1_ref.dtype)
        if need_dx:
            dp = jnp.concatenate([rollr(gz, 0), rollr(gz, 1)], axis=0)
            v = jax.lax.dot(k1t_ref[...], dp, preferred_element_type=f32)
            i = sj - 2
            for dy in range(3):
                dxs_ref[pl.ds(2 * i + dy, 1), :, :] += (
                    v[dy * cin_p : (dy + 1) * cin_p][None]
                )

    if need_dx:
        dx_ref[0, 0] = dxs_ref[...].astype(dx_ref.dtype)


def _pick_tile_bwd(hh, wh, cin, c, itemsize):
    """Tile for the backward kernel; None -> XLA-recompute fallback.
    The four frame inputs stay in HBM and stream as (TH+4)-row window
    DMAs, so VMEM demand is tile-local at any frame height."""
    sub = 16 if itemsize == 2 else 8
    cin_p = _round_up(2 * cin, sub)
    wl = _round_up(wh + 2, 128)
    for t in range(min(hh, 16), 0, -1):
        if hh % t:
            continue
        windows = 4 * (t + 4) * c * wl * itemsize  # g/out/s1/s2 windows
        scr = (2 * (t + 4) * c + (2 * t + 2) * cin_p) * wl * 4
        outs = 2 * (3 * t * c + (2 * t + 2) * cin_p) * wl * itemsize
        temps = (9 * c + 3 * c + 3 * cin_p) * wl * 4
        if windows + scr + outs + temps <= _VMEM_BUDGET:
            return t
    return None


def _plevel_bwd_pallas(x, k1, b1, k2, b2, k3, b3, out, s1x, s2x, g,
                       interpret):
    """(dx, dk1, db1, ..., db3) via the Pallas gz chain + XLA dk/db.

    Returns None when the backward kernel does not fit VMEM (caller
    falls back to the XLA-recompute VJP)."""
    b, h, w, cin = x.shape
    c = k1.shape[-1]
    hh, wh = h // 2, w // 2
    itemsize = jnp.dtype(x.dtype).itemsize
    th = _pick_tile_bwd(hh, wh, cin, c, itemsize)
    if th is None:
        return None
    sub = 16 if itemsize == 2 else 8
    cin_p = _round_up(2 * cin, sub)
    wl = s1x.shape[-1]

    def frame(arr_nchw):
        # (B, HH, C, WL) -> 2 zero rows of padding each side
        return jnp.pad(arr_nchw, ((0, 0), (2, 2), (0, 0), (0, 0)))

    def to_margin(arr_nhwc):
        t = jnp.transpose(arr_nhwc, (0, 1, 3, 2))  # (B, HH, C, WH)
        return jnp.pad(t, ((0, 0), (0, 0), (0, 0), (1, wl - wh - 1)))

    gm = frame(to_margin(g))
    outm = frame(to_margin(out))
    s1m = frame(s1x)
    s2m = frame(s2x)

    k1t = jnp.transpose(_split_kernel(_remap_k1(k1), cin_p))  # (3CINP, 2C)
    k2t = jnp.transpose(_split_kernel(k2, c))  # (3C, 3C)
    k3t = jnp.transpose(_split_kernel(k3, c))

    nt = hh // th
    gz1, gz2, gz3, dxblk = pl.pallas_call(
        functools.partial(
            _plevel_bwd_kernel,
            th=th,
            hh=hh,
            wh=wh,
            cin_p=cin_p,
            need_dx=True,
            interpret=interpret,
        ),
        grid=(b, nt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4
        + [
            pl.BlockSpec(
                k1t.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                k2t.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                k3t.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, th, c, wl), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        * 3
        + [
            pl.BlockSpec(
                (1, 1, 2 * th + 2, cin_p, wl),
                lambda bi, i: (bi, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hh, c, wl), x.dtype) for _ in range(3)
        ]
        + [jax.ShapeDtypeStruct((b, nt, 2 * th + 2, cin_p, wl), x.dtype)],
        scratch_shapes=[
            pltpu.VMEM((1, th + 4, c, wl), x.dtype),
            pltpu.VMEM((1, th + 4, c, wl), x.dtype),
            pltpu.VMEM((1, th + 4, c, wl), x.dtype),
            pltpu.VMEM((1, th + 4, c, wl), x.dtype),
            pltpu.VMEM((th + 4, c, wl), jnp.float32),
            pltpu.VMEM((th + 4, c, wl), jnp.float32),
            pltpu.VMEM((2 * th + 2, cin_p, wl), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(gm, outm, s1m, s2m, k1t, k2t, k3t)

    def to_nhwc(arr):
        return jnp.transpose(arr[:, :, :, 1 : wh + 1], (0, 1, 3, 2))

    gz1n, gz2n, gz3n = to_nhwc(gz1), to_nhwc(gz2), to_nhwc(gz3)

    # ---- dx: overlap-add the per-tile s2d windows, undo W-s2d
    core = dxblk[:, :, : 2 * th].reshape(b, h, cin_p, wl)
    tails = dxblk[:, :-1, 2 * th :]  # (B, nt-1, 2, CINP, WL)
    if nt > 1:
        tails = jnp.pad(
            tails, ((0, 0), (0, 0), (0, 2 * th - 2), (0, 0), (0, 0))
        ).reshape(b, (nt - 1) * 2 * th, cin_p, wl)
        tails = jnp.pad(tails, ((0, 0), (2 * th, 0), (0, 0), (0, 0)))
        core = core + tails
    dxs2d = core[:, :, : 2 * cin, 1 : wh + 1]  # strip pads/margins
    dx = jnp.transpose(dxs2d, (0, 1, 3, 2)).reshape(b, h, w, cin)
    dx = dx.astype(x.dtype)

    s1n = to_nhwc(s1m[:, 2:-2])
    s2n = to_nhwc(s2m[:, 2:-2])
    dk1, db1, dk2, db2, dk3, db3 = _dkdb_xla(
        x, s1n, s2n, k1, k2, k3, b1, b2, b3, gz1n, gz2n, gz3n
    )
    return dx, dk1, db1, dk2, db2, dk3, db3


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _plevel_vjp(x, k1, b1, k2, b2, k3, b3, tile_h, tile_banded, interpret):
    if tile_banded is not None:
        return _plevel_forward_banded(
            x, k1, b1, k2, b2, k3, b3, th=tile_banded, interpret=interpret
        )
    return _plevel_forward(
        x, k1, b1, k2, b2, k3, b3, th=tile_h, interpret=interpret
    )


def _plevel_fwd(x, k1, b1, k2, b2, k3, b3, tile_h, tile_banded, interpret):
    if tile_banded is not None:
        tbb = _pick_tile_bwd_banded(
            x.shape, k1.shape[-1], jnp.dtype(x.dtype).itemsize
        )
        if tbb is not None:
            out, s1b, s2b = _plevel_forward_banded(
                x, k1, b1, k2, b2, k3, b3, th=tile_banded,
                interpret=interpret, save_acts=True,
            )
            # banded residuals are 3-D (B, C, HH*WL); the row-loop path's
            # are 4-D margin-layout — _plevel_bwd dispatches on ndim
            return out, (x, k1, b1, k2, b2, k3, b3, out, s1b, s2b)
    out, s1x, s2x = _plevel_forward(
        x, k1, b1, k2, b2, k3, b3, th=tile_h, interpret=interpret,
        save_acts=True,
    )
    return out, (x, k1, b1, k2, b2, k3, b3, out, s1x, s2x)


def _plevel_bwd(tile_h, tile_banded, interpret, res, g):
    x, k1, b1, k2, b2, k3, b3, out, s1x, s2x = res
    if s1x.ndim == 3:
        tbb = _pick_tile_bwd_banded(
            x.shape, k1.shape[-1], jnp.dtype(x.dtype).itemsize
        )
        return _plevel_bwd_banded(
            x, k1, b1, k2, b2, k3, b3, out, s1x, s2x, g, tbb, interpret
        )
    grads = _plevel_bwd_pallas(
        x, k1, b1, k2, b2, k3, b3, out, s1x, s2x, g, interpret
    )
    if grads is not None:
        return grads
    _, vjp = jax.vjp(_xla_level, x, k1, b1, k2, b2, k3, b3)
    return vjp(g)


_plevel_vjp.defvjp(_plevel_fwd, _plevel_bwd)
