"""Fused Pallas TPU kernel for one optical-flow estimator level (6 convs).

The per-level estimator (reference `OpticalFlowEstimator_custom`,
/root/reference/modules.py:227-285: 5 convs [128,128,96,64,32] with
LeakyReLU(0.1) + a linear 2-channel flow conv): XLA runs its
convolutions in NHWC (C minor) while the cost volume arrives from the
Pallas warped-CV kernel in (B, H, C, W) (W minor), so every level pays
layout transposes on both sides of the correlation. This kernel removes
them by running the chain in the correlation's layout.

**Measured NEGATIVE result — off by default.** At 384x448 b4 bf16 the
fused chain makes the train step 10% slower (243 -> 219 pairs/s) and
448x1024 b4 inference 6% slower (437 -> 411 pairs/s): the estimator's
C>=96 convs already fill the MXU under XLA, the true transpose cost is
~2.7 ms/step (round 2's 5.3 ms figure was a profile-bucketing artifact
— operand substring matches counted fusions as copies), and the
kernel's row-at-a-time fori_loop can't beat XLA's multi-row conv
tiling at these channel widths. Kept as an opt-in
(`fused_estimator_levels` / `--fused-estimator`) with full fwd+bwd
test coverage; see docs/DESIGN.md "Round-3: fused estimator chain".

This kernel runs the whole 6-conv chain in one VMEM pass per
(batch, H-tile) grid step, in the same (B, H, C, W) margin-lane layout
the cost-volume kernels already use — the transposes between the
correlation and the estimator cancel, and the chain's intermediates
never touch HBM:

- Each conv row is one MXU matmul: the stacked-tap kernel matrix
  (3*Cout, 3*Cin_pad) hits a (3*Cin_pad, WL) patch of three adjacent
  stripe rows (contiguous-row load + leading-dim merge); the f32
  partials are lane-rotated into place (`pyramid_conv` recipe). M =
  3*Cout reaches 384 here — far better MXU row fill than the pyramid's
  small-C levels.
- bias + LeakyReLU(0.1) fuse after each matmul (the flow conv is
  linear); SAME zero-padding is a zeroed 1-lane margin plus row-validity
  masks; intermediates round to the model dtype between convs, matmuls
  accumulate in f32 — matching the XLA chain up to dot ordering.
- The concatenated input frame stays in HBM (memory_space=ANY); each
  grid step DMAs only its (TH+12)-row window.

The backward is a native Pallas gz chain (no recompute, no scatters):
the forward saves the five post-activation stripes, and one kernel pass
runs d(flow) -> d(s5) -> ... -> d(s1) -> d(xin) with LeakyReLU sign
masks from the saved values, static lane rolls of the cotangents, and
matmuls against the transposed stacked kernels. dk/db are left to XLA
vjp on the saved activations (lane-contraction correlations).

The residual flow add and the input concat (cv, f0, flows_up,
features_up — reference modules.py:239-247) stay on the XLA side; the
kernel computes the pure chain xin -> (flow_raw, features).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pwcnet_tpu.ops.pallas.pyramid_conv import (
    _leaky,
    _round_up,
    _split_kernel,
)

__all__ = ["estimator_chain_fused"]

from pwcnet_tpu.ops.pallas import common
from pwcnet_tpu.ops.pallas.common import VMEM_BUDGET as _VMEM_BUDGET
_NCONV = 6  # 5 hidden convs + linear flow conv


def _xla_chain(xin, *kbs):
    """Reference XLA formulation (fallback + dk/db vjp source)."""
    dn = ("NHWC", "HWIO", "NHWC")
    y = xin
    feat = None
    for i in range(_NCONV):
        k, b = kbs[2 * i], kbs[2 * i + 1]
        y = lax.conv_general_dilated(
            y, k, (1, 1), "SAME", dimension_numbers=dn
        ) + b
        if i < _NCONV - 1:
            y = _leaky(y)
        if i == _NCONV - 2:
            feat = y
    return y, feat


def _est_kernel(
    *refs,
    th: int,
    hh: int,
    wh: int,
    couts,
    save_acts: bool,
    interpret: bool,
):
    """One (batch, H-tile) grid step of the 6-conv chain.

    Positional refs (pallas order — inputs, outputs, scratch):
      x_any:   (B, H+12, CINP, WL) HBM concat input, 6 zero rows each
               side, 1-lane zero margin
      km1..km6:(3*Cout_i, 3*Cin_pad_i) VMEM stacked-tap kernels
      bias:    (6, 128) f32 VMEM (rows zero-padded past Cout_i)
      flow:    (1, TH, 8, WL) output tile (2 data sublanes)
      feat:    (1, TH, C5, WL) output tile
      [s1..s4 exact-row output tiles when save_acts]
      xw:      (1, TH+12, CINP, WL) VMEM scratch — input row window
      st1..st5: chain stripes; st_i holds TH + 2*(6-i) rows of conv_i
               output in margin-lane layout
      sem:     DMA semaphore
    """
    n_acts = _NCONV - 2 if save_acts else 0
    x_any = refs[0]
    kms = refs[1 : 1 + _NCONV]
    bias_ref = refs[1 + _NCONV]
    flow_ref = refs[2 + _NCONV]
    feat_ref = refs[3 + _NCONV]
    act_refs = refs[4 + _NCONV : 4 + _NCONV + n_acts]
    xw_ref = refs[4 + _NCONV + n_acts]
    stripes = refs[5 + _NCONV + n_acts : 5 + _NCONV + n_acts + _NCONV - 1]
    sem = refs[-1]

    bi = pl.program_id(0)
    ti = pl.program_id(1)
    r0 = ti * th
    f32 = jnp.float32
    wl = flow_ref.shape[3]

    dma = pltpu.make_async_copy(
        x_any.at[pl.ds(bi, 1), pl.ds(r0, th + 12)], xw_ref, sem
    )
    dma.start()
    dma.wait()

    def rolled(p32, shift):
        """Lane-rotate the f32 partial so out col x reads lane x+shift."""
        if shift == 0:
            return p32[:, :wh]
        if interpret:
            return jnp.roll(p32, -shift, axis=1)[:, :wh]
        return pltpu.roll(p32, p32.shape[1] - shift, 1)[:, :wh]

    def pad_row(y, width):
        zc = jnp.zeros((y.shape[0], 1), y.dtype)
        zr = jnp.zeros((y.shape[0], width - y.shape[1] - 1), y.dtype)
        return jnp.concatenate([zc, y, zr], axis=1)

    def conv_row(src_ref, j, km_ref, b_vec, cout, leading_one):
        """3x3 SAME conv of stripe rows j..j+2 -> one f32 output row."""
        if leading_one:
            x3 = src_ref[0, pl.ds(j, 3), :, :].reshape(-1, wl)
        else:
            x3 = src_ref[pl.ds(j, 3), :, :].reshape(-1, wl)
        p = jax.lax.dot(km_ref[...], x3, preferred_element_type=f32)
        return (
            rolled(p[:cout], 0)
            + rolled(p[cout : 2 * cout], 1)
            + rolled(p[2 * cout :], 2)
            + b_vec[:, None]
        )

    # conv_i (i = 0..4, LeakyReLU): stripe st_i rows cover output rows
    # [r0 - (5-i), r0 + th + (5-i)); the source stripe (xw for i=0)
    # holds one extra row each side, so row j of st_i reads rows j..j+2.
    src = xw_ref
    for i in range(_NCONV - 1):
        halo = 5 - i

        def row_fn(j, carry, src=src, dst=stripes[i], km=kms[i],
                   b_vec=bias_ref[i, : couts[i]].astype(f32),
                   cout=couts[i], halo=halo, leading_one=(i == 0)):
            g = r0 - halo + j
            y = _leaky(conv_row(src, j, km, b_vec, cout, leading_one))
            valid = jnp.logical_and(g >= 0, g < hh)
            y = jnp.where(valid, y, jnp.zeros_like(y))
            dst[pl.ds(j, 1), :, :] = pad_row(y, wl)[None].astype(dst.dtype)
            return carry

        jax.lax.fori_loop(0, th + 2 * halo, row_fn, 0)
        src = stripes[i]

    # flow conv (linear) -> flow tile; features = st5 exact rows
    st5 = stripes[_NCONV - 2]
    b6 = bias_ref[_NCONV - 1, : couts[-1]].astype(f32)

    def row_flow(j, carry):
        y = conv_row(st5, j, kms[_NCONV - 1], b6, couts[-1], False)
        y8 = jnp.concatenate(
            [pad_row(y, wl), jnp.zeros((8 - couts[-1], wl), f32)], axis=0
        )
        flow_ref[0, pl.ds(j, 1), :, :] = y8[None].astype(flow_ref.dtype)
        return carry

    jax.lax.fori_loop(0, th, row_flow, 0)

    feat_ref[0] = st5[1 : 1 + th, :, :]
    if save_acts:
        for i in range(_NCONV - 2):  # s1..s4 exact-row tiles
            act_refs[i][0] = stripes[i][5 - i : 5 - i + th, :, :]


def _prep_input(xin, cinp, wl):
    """NHWC -> padded (B, H+12, CINP, WL) margin-lane frame."""
    b, h, w, cin = xin.shape
    xt = jnp.transpose(xin, (0, 1, 3, 2))  # (B, H, C, W)
    return jnp.pad(
        xt, ((0, 0), (6, 6), (0, cinp - cin), (1, wl - w - 1))
    )


def _est_forward(xin, kbs, *, th, interpret, save_acts=False):
    b, h, w, cin = xin.shape
    couts = [kbs[2 * i].shape[-1] for i in range(_NCONV)]
    sub = 16 if jnp.dtype(xin.dtype).itemsize == 2 else 8
    cinp = _round_up(cin, sub)
    wl = _round_up(w + 2, 128)

    xs = _prep_input(xin, cinp, wl)
    cins = [cinp] + couts[:-1]
    kms = [
        _split_kernel(kbs[2 * i], cins[i]).astype(xin.dtype)
        for i in range(_NCONV)
    ]
    bias = jnp.zeros((_NCONV, 128), jnp.float32)
    for i in range(_NCONV):
        bias = bias.at[i, : couts[i]].set(kbs[2 * i + 1].astype(jnp.float32))

    n_acts = _NCONV - 2 if save_acts else 0
    out_specs = [
        pl.BlockSpec(
            (1, th, 8, wl), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, th, couts[-2], wl), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, h, 8, wl), xin.dtype),
        jax.ShapeDtypeStruct((b, h, couts[-2], wl), xin.dtype),
    ]
    for i in range(n_acts):
        out_specs.append(
            pl.BlockSpec(
                (1, th, couts[i], wl), lambda bi, ii: (bi, ii, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((b, h, couts[i], wl), xin.dtype)
        )

    res = pl.pallas_call(
        functools.partial(
            _est_kernel,
            th=th,
            hh=h,
            wh=w,
            couts=tuple(couts),
            save_acts=save_acts,
            interpret=interpret,
        ),
        grid=(b, h // th),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [
            pl.BlockSpec(km.shape, lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM)
            for km in kms
        ]
        + [
            pl.BlockSpec(bias.shape, lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((1, th + 12, cinp, wl), xin.dtype),
        ]
        + [
            pltpu.VMEM((th + 2 * (5 - i), couts[i], wl), xin.dtype)
            for i in range(_NCONV - 1)
        ]
        + [pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(xs, *kms, bias)

    def cut(arr, c):
        return jnp.transpose(arr[:, :, :c, 1 : w + 1], (0, 1, 3, 2))

    flow = cut(res[0], couts[-1])
    feat = cut(res[1], couts[-2])
    if save_acts:
        return flow, feat, res[2:]
    return flow, feat


def _fwd_vmem(h, w, cin, couts, itemsize, th):
    sub = 16 if itemsize == 2 else 8
    cinp = _round_up(cin, sub)
    wl = _round_up(w + 2, 128)
    window = (th + 12) * cinp * wl * itemsize
    stripes = sum(
        (th + 2 * (5 - i)) * couts[i] * wl * itemsize
        for i in range(_NCONV - 1)
    )
    outs = th * (8 + couts[-2]) * wl * itemsize
    kmats = sum(
        3 * couts[i] * 3 * c_in * itemsize
        for i, c_in in enumerate([cinp] + couts[:-1])
    )
    # patch matrix + f32 dot output + padded-row temporaries
    temps = 3 * max([cinp] + couts) * wl * itemsize + 3 * max(couts) * wl * 4
    return window + stripes + outs + kmats + temps


def _pick_tile_fwd(h, w, cin, couts, itemsize):
    for t in range(min(h, 32), 0, -1):
        if h % t:
            continue
        if _fwd_vmem(h, w, cin, couts, itemsize, t) <= _VMEM_BUDGET:
            return t
    return None


# ---------------------------------------------------------------------------
# backward


def _est_bwd_kernel(
    *refs,
    th: int,
    hh: int,
    wh: int,
    couts,
    cinp: int,
    interpret: bool,
):
    """Backward gz chain, one (batch, H-tile) grid step.

    Positional refs:
      s1f..s4f: (B, H+10, C_i, WL) HBM saved stripes, 5 zero rows/side
      gflow:    (B, H+12, 8, WL) HBM — flow cotangent, 6 zero rows/side
      gfeat:    (B, H+10, C5, WL) HBM — features cotangent, 5 rows/side
      s5f:      (B, H+10, C5, WL) HBM saved s5 frame, 5 zero rows/side
      k6t..k1t: transposed stacked kernels
      gz1..gz5: exact-row output tiles (for XLA dk/db)
      dxblk:    (1, TH, CINP, WL) output — EXACT dxin rows
      sw1..sw4: (1, TH+2*i, C_i, WL) scratch — s_i window, halo i
      s5w:      (1, TH+10, C5, WL) scratch — s5 window, halo 5
      gfw:      (1, TH+12, 8, WL) scratch — gflow window, halo 6
      gtw:      (1, TH+10, C5, WL) scratch — gfeat window, halo 5
      ds1..ds5: f32 scratch, ds_i buffer rows [r0-(i+2), r0+th+(i+2))
      dxs:      (TH+4, CINP, WL) f32 scratch
      sems:     DMA semaphores (7,)

    EXACT-ROW scheme: the cotangent windows carry halo rows from the
    neighbor tiles (conv-transpose spreads a cotangent row +-1 per
    stage, so gz_i is exact only with (7-i) halo cotangent rows... the
    required extents are gz_i over +-i given gflow over +-6 and gfeat
    over +-5), so every gz_i value this tile emits — and every dx row —
    is the complete gradient. The halo sizes INVERT vs a
    decompose-by-source scheme: s_i masks are needed over gz_i's +-i
    extent, and ds_i buffers carry +-(i+2) rows so stage (i+1)'s
    three-row scatter exactly fills them (write idx = sj + dy for every
    stage; the 2 unread edge rows hold partial sums by construction).
    A per-tile chain over OWN cotangent rows only would make gz rows
    within (6-i) rows of a tile seam miss the neighbor's contributions
    — wrong dk/db (dx survives via overlap-add) — the bug this layout
    replaced.
    """
    nc = _NCONV
    s_frames = refs[0:4]
    gflow_any = refs[4]
    gfeat_any = refs[5]
    s5f_ref = refs[6]
    kts = refs[7 : 7 + nc]  # k6t, k5t, ..., k1t
    n_in = 7 + nc
    gz_refs = refs[n_in : n_in + nc - 1]  # gz1..gz5
    dx_ref = refs[n_in + nc - 1]
    base = n_in + nc  # first scratch ref
    sw_refs = refs[base : base + 4]  # s1..s4 windows
    s5w_ref = refs[base + 4]
    gfw_ref = refs[base + 5]
    gtw_ref = refs[base + 6]
    ds_refs = refs[base + 7 : base + 7 + nc - 1]  # ds1..ds5
    dxs_ref = refs[base + 7 + nc - 1]
    sems = refs[-1]

    bi = pl.program_id(0)
    ti = pl.program_id(1)
    r0 = ti * th
    f32 = jnp.float32
    wl = gfw_ref.shape[3]
    c5 = couts[-2]

    # overlapped row-window DMAs: s_i's window covers gz_i's extent
    # [r0-i, r0+th+i) (all source frames are 5/6-row zero-padded, so
    # every read is in-bounds: start = r0 - halo + pad).
    copies = []
    for i in range(4):
        halo = i + 1  # s_{i+1}'s halo rows each side
        copies.append(
            pltpu.make_async_copy(
                s_frames[i].at[
                    pl.ds(bi, 1), pl.ds(r0 - halo + 5, th + 2 * halo)
                ],
                sw_refs[i],
                sems.at[i],
            )
        )
    copies.append(
        pltpu.make_async_copy(
            s5f_ref.at[pl.ds(bi, 1), pl.ds(r0, th + 10)], s5w_ref,
            sems.at[4],
        )
    )
    copies.append(
        pltpu.make_async_copy(
            gflow_any.at[pl.ds(bi, 1), pl.ds(r0, th + 12)], gfw_ref,
            sems.at[5],
        )
    )
    copies.append(
        pltpu.make_async_copy(
            gfeat_any.at[pl.ds(bi, 1), pl.ds(r0, th + 10)], gtw_ref,
            sems.at[6],
        )
    )
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

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
        return jnp.where(
            v >= 0, jnp.asarray(1.0, f32), jnp.asarray(0.1, f32)
        )

    for ds in ds_refs:
        ds[...] = jnp.zeros(ds.shape, ds.dtype)
    dxs_ref[...] = jnp.zeros(dxs_ref.shape, dxs_ref.dtype)

    # ---- flow-conv backward: gz6 = g_flow rows [r0-6, r0+th+6) -> ds5
    ds5 = ds_refs[-1]
    k6t = kts[0]

    def row6(j, carry):
        gz = gfw_ref[0, pl.ds(j, 1), :, :][0][: couts[-1]].astype(f32)
        gz = gz * lane_mask
        dp = jnp.concatenate([rollr(gz, d - 1) for d in range(3)], axis=0)
        v = jax.lax.dot(k6t[...], dp, preferred_element_type=f32)
        for dy in range(3):
            # gz6 global row r0-6+j contributes to ds5 global rows
            # r0-7+j+dy, local index j+dy (ds5 buffer starts at r0-7)
            ds5[pl.ds(j + dy, 1), :, :] += v[dy * c5 : (dy + 1) * c5][None]
        return carry

    jax.lax.fori_loop(0, th + 12, row6, 0)

    # ---- hidden convs backward, stage i = 5..1 (1-based conv index):
    # stage i computes gz_i over its exact extent [r0-i, r0+th+i)
    for i in range(nc - 1, 0, -1):
        halo = i
        sw = s5w_ref if i == nc - 1 else sw_refs[i - 1]
        dst = dxs_ref if i == 1 else ds_refs[i - 2]
        c_dn = cinp if i == 1 else couts[i - 2]

        def stage_row(sj, carry, i=i, halo=halo, sw=sw, dst=dst,
                      c_dn=c_dn, ds_cur=ds_refs[i - 1],
                      gz_out=gz_refs[i - 1], kt=kts[nc - i],
                      c=couts[i - 1], add_gfeat=(i == nc - 1)):
            r = r0 - halo + sj
            # ds_i buffer halo is i+2, this extent's is i: offset 2
            g = ds_cur[pl.ds(sj + 2, 1), :, :][0]
            if add_gfeat:
                # features cotangent adds at the z5 level over gz5's
                # whole +-5 extent (window halo == stage extent halo)
                g = g + gtw_ref[0, pl.ds(sj, 1), :, :][0].astype(f32)
            sval = sw[0, pl.ds(sj, 1), :, :][0].astype(f32)
            gz = g * leaky_mask(sval) * lane_mask
            valid = jnp.logical_and(r >= 0, r < hh)
            gz = jnp.where(valid, gz, jnp.zeros_like(gz))

            @pl.when(jnp.logical_and(sj >= halo, sj < halo + th))
            def _():
                gz_out[0, pl.ds(sj - halo, 1), :, :] = gz[None].astype(
                    gz_out.dtype
                )

            dp = jnp.concatenate(
                [rollr(gz, d - 1) for d in range(3)], axis=0
            )
            v = jax.lax.dot(kt[...], dp, preferred_element_type=f32)
            for dy in range(3):
                # gz_i row r -> dst rows r-1+dy; dst buffer halo i+1
                # (dxs: 2), so local = sj + dy for every stage
                dst[pl.ds(sj + dy, 1), :, :] += (
                    v[dy * c_dn : (dy + 1) * c_dn][None]
                )
            return carry

        jax.lax.fori_loop(0, th + 2 * halo, stage_row, 0)

    # exact dx rows [r0, r0+th) sit at dxs local [2, th+2)
    dx_ref[0] = dxs_ref[pl.ds(2, th), :, :].astype(dx_ref.dtype)


def _bwd_vmem(h, w, cin, couts, itemsize, th):
    sub = 16 if itemsize == 2 else 8
    cinp = _round_up(cin, sub)
    wl = _round_up(w + 2, 128)
    # stripe windows at the exact-row scheme's inverted halos (s_i: +-i)
    windows = sum(
        (th + 2 * (i + 1)) * couts[i] * wl * itemsize for i in range(4)
    ) + (th + 10) * couts[-2] * wl * itemsize
    # cotangent windows: gflow +-6, gfeat +-5
    g_windows = (th + 12) * 8 * wl * itemsize + (th + 10) * couts[
        -2
    ] * wl * itemsize
    # ds_i buffers carry +-(i+2) rows (stage i+1's scatter fills exactly)
    ds = sum(
        (th + 2 * (i + 2)) * couts[i - 1] * wl * 4
        for i in range(1, _NCONV)
    )
    dxs = (th + 4) * cinp * wl * 4
    gz_tiles = sum(th * c * wl * itemsize for c in couts[:-1])
    dx_tile = th * cinp * wl * itemsize
    kmats = sum(
        3 * couts[i] * 3 * c_in * itemsize
        for i, c_in in enumerate([cinp] + couts[:-1])
    )
    temps = 3 * max(couts) * wl * 4 + 3 * max(cinp, max(couts)) * wl * 4
    return (
        windows + g_windows + ds + dxs + gz_tiles + dx_tile + kmats + temps
    )


def _pick_tile_bwd(h, w, cin, couts, itemsize):
    for t in range(min(h, 16), 0, -1):
        if h % t:
            continue
        if _bwd_vmem(h, w, cin, couts, itemsize, t) <= _VMEM_BUDGET:
            return t
    return None


def _est_bwd_pallas(xin, kbs, feat, acts, g_flow, g_feat, interpret):
    """(dxin, dk1, db1, ..., dk6, db6) via the Pallas gz chain + XLA
    dk/db on the saved activations. None when no tile fits VMEM."""
    b, h, w, cin = xin.shape
    couts = [kbs[2 * i].shape[-1] for i in range(_NCONV)]
    itemsize = jnp.dtype(xin.dtype).itemsize
    th = _pick_tile_bwd(h, w, cin, couts, itemsize)
    if th is None:
        return None
    sub = 16 if itemsize == 2 else 8
    cinp = _round_up(cin, sub)
    wl = _round_up(w + 2, 128)
    c5 = couts[-2]

    # saved stripes arrive as (B, H, C_i, WL) exact-row frames
    s_frames = [
        jnp.pad(a, ((0, 0), (5, 5), (0, 0), (0, 0))) for a in acts
    ]
    # s5 margin-lane frame from the NHWC features output, 5-row pad
    # (gz5's exact extent is +-5)
    s5m = jnp.transpose(feat, (0, 1, 3, 2))
    s5m = jnp.pad(s5m, ((0, 0), (5, 5), (0, 0), (1, wl - w - 1)))

    def to_margin(arr, cpad, row_pad):
        t = jnp.transpose(arr, (0, 1, 3, 2))
        return jnp.pad(
            t,
            (
                (0, 0),
                (row_pad, row_pad),
                (0, cpad - t.shape[2]),
                (1, wl - w - 1),
            ),
        )

    # halo'd cotangent frames (zero rows outside): gflow +-6, gfeat +-5
    gfm = to_margin(g_flow.astype(xin.dtype), 8, 6)
    gtm = to_margin(g_feat.astype(xin.dtype), c5, 5)

    cins = [cinp] + couts[:-1]
    kts = [
        jnp.transpose(_split_kernel(kbs[2 * i], cins[i])).astype(xin.dtype)
        for i in range(_NCONV - 1, -1, -1)
    ]  # k6t, k5t, ..., k1t

    nt = h // th
    res = pl.pallas_call(
        functools.partial(
            _est_bwd_kernel,
            th=th,
            hh=h,
            wh=w,
            couts=tuple(couts),
            cinp=cinp,
            interpret=interpret,
        ),
        grid=(b, nt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 7
        + [
            pl.BlockSpec(kt.shape, lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM)
            for kt in kts
        ],
        out_specs=[
            pl.BlockSpec(
                (1, th, couts[i], wl), lambda bi, ii: (bi, ii, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for i in range(_NCONV - 1)
        ]
        + [
            pl.BlockSpec(
                (1, th, cinp, wl),
                lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, couts[i], wl), xin.dtype)
            for i in range(_NCONV - 1)
        ]
        + [jax.ShapeDtypeStruct((b, h, cinp, wl), xin.dtype)],
        scratch_shapes=[
            pltpu.VMEM((1, th + 2 * (i + 1), couts[i], wl), xin.dtype)
            for i in range(4)
        ]
        + [
            pltpu.VMEM((1, th + 10, c5, wl), xin.dtype),
            pltpu.VMEM((1, th + 12, 8, wl), xin.dtype),
            pltpu.VMEM((1, th + 10, c5, wl), xin.dtype),
        ]
        + [
            pltpu.VMEM(
                (th + 2 * (i + 2), couts[i - 1], wl), jnp.float32
            )
            for i in range(1, _NCONV)
        ]
        + [
            pltpu.VMEM((th + 4, cinp, wl), jnp.float32),
            pltpu.SemaphoreType.DMA((7,)),
        ],
        interpret=interpret,
    )(*s_frames, gfm, gtm, s5m, *kts)

    gz_frames, dxblk = res[: _NCONV - 1], res[-1]

    # ---- dxin: exact rows, no overlap-add
    dxin = jnp.transpose(dxblk[:, :, :cin, 1 : w + 1], (0, 1, 3, 2))

    # ---- dk/db: XLA vjp of the plain convolutions on saved activations
    dn = ("NHWC", "HWIO", "NHWC")

    def to_nhwc(arr, c):
        return jnp.transpose(arr[:, :, :c, 1 : w + 1], (0, 1, 3, 2))

    acts_nhwc = (
        [xin]
        + [to_nhwc(a, couts[i]) for i, a in enumerate(acts)]
        + [feat]
    )
    gzs = [to_nhwc(gz_frames[i], couts[i]) for i in range(_NCONV - 1)] + [
        g_flow.astype(xin.dtype)
    ]
    grads = [dxin]
    for i in range(_NCONV):
        _, vjp = jax.vjp(
            lambda kk, inp=acts_nhwc[i]: lax.conv_general_dilated(
                inp, kk, (1, 1), "SAME", dimension_numbers=dn
            ),
            kbs[2 * i],
        )
        dk = vjp(gzs[i])[0]
        db = jnp.sum(gzs[i].astype(jnp.float32), axis=(0, 1, 2)).astype(
            kbs[2 * i + 1].dtype
        )
        grads.extend([dk, db])
    return tuple(grads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def _est_vjp(xin, k1, b1, k2, b2, k3, b3, k4, b4, k5, b5, k6, b6,
             tile_h, interpret):
    return _est_forward(
        xin, (k1, b1, k2, b2, k3, b3, k4, b4, k5, b5, k6, b6),
        th=tile_h, interpret=interpret,
    )


def _est_fwd(xin, k1, b1, k2, b2, k3, b3, k4, b4, k5, b5, k6, b6,
             tile_h, interpret):
    kbs = (k1, b1, k2, b2, k3, b3, k4, b4, k5, b5, k6, b6)
    flow, feat, acts = _est_forward(
        xin, kbs, th=tile_h, interpret=interpret, save_acts=True
    )
    return (flow, feat), (xin, kbs, feat, acts)


def _est_bwd(tile_h, interpret, res, g):
    xin, kbs, feat, acts = res
    g_flow, g_feat = g
    grads = _est_bwd_pallas(
        xin, kbs, feat, acts, g_flow, g_feat, interpret
    )
    if grads is None:
        _, vjp = jax.vjp(lambda *a: _xla_chain(*a), xin, *kbs)
        grads = vjp((g_flow.astype(xin.dtype), g_feat.astype(xin.dtype)))
    return grads


_est_vjp.defvjp(_est_fwd, _est_bwd)


def estimator_chain_fused(
    xin, *kbs, tile_h: int | None = None, interpret: bool = False
):
    """Fused estimator chain: 5x (conv 3x3 + LeakyReLU(0.1)) + linear
    flow conv, in one VMEM pass per H-tile.

    Drop-in for the XLA chain (reference modules.py:227-285 semantics:
    exact SAME padding, f32 accumulation, model-dtype rounding between
    convs). ``xin`` is the NHWC concat of (cv, features_0, flows_up,
    features_up); returns ``(flow_raw, features)`` — the caller adds
    the flows_up residual. Falls back to XLA when no tile fits VMEM.
    """
    assert len(kbs) == 2 * _NCONV
    b, h, w, cin = xin.shape
    interpret = common.resolve_interpret(interpret)
    couts = [kbs[2 * i].shape[-1] for i in range(_NCONV)]
    itemsize = jnp.dtype(xin.dtype).itemsize
    if tile_h is not None and (
        h % tile_h
        or _fwd_vmem(h, w, cin, couts, itemsize, tile_h) > _VMEM_BUDGET
    ):
        # a non-dividing tile would leave trailing output rows unwritten
        # (grid = h // tile_h); auto-plan instead, like _plan_fwd in the
        # cost-volume planner
        tile_h = None
    th = tile_h or _pick_tile_fwd(h, w, cin, couts, itemsize)
    if th is None or _pick_tile_bwd(h, w, cin, couts, itemsize) is None:
        return _xla_chain(xin, *kbs)
    return _est_vjp(xin, *kbs, th, interpret)
