"""Fused bilinear-warp + cost-volume Pallas TPU kernel.

The reference's hot path warps frame-1 features with four `tf.gather_nd`
calls and then builds an 81-tap cost volume over the warped map
(/root/reference/modules.py:99-204). Round 1 replaced the gathers with one
XLA patch gather and the cost volume with a VMEM-resident Pallas kernel —
but the *warped feature map* still made a full HBM round trip between the
two ops, and the XLA gather itself is the single most expensive op left in
the profile. This kernel removes both: the bilinear warp is computed
in-VMEM per H-tile and correlated immediately.

The warp cannot be a gather on TPU (per-pixel vector gathers do not
vectorize on the VPU and Mosaic rejects dynamic lane slices). Instead it is
expressed as a *candidate-offset tent filter*:

- Every output pixel reads the 2x2 corner neighborhood at
  ``clamp(floor(p + flow(p)))`` — reference semantics: corners clamped
  independently, weights from the unclamped fractional flow
  (modules.py:113-137). With a 1-pixel edge-replicated border the corner
  index becomes ``rel = clip(p + floor(flow), -1, size-1) + 1 - p`` so the
  two corners are at relative integer offsets ``rel`` and ``rel + 1``.
- Per (batch, H-tile) the XLA side precomputes ``[min(rel), max(rel)]``
  over the tile's halo'd stripe (a cheap reduction) and passes them as
  SMEM scalars. The kernel then loops over just those candidate offsets:
  a vertical candidate is a dynamic-start row slice of the VMEM-resident
  frame (rows are the untiled dimension — free), a horizontal candidate is
  one ``pltpu.roll`` lane rotation, and each pixel's tent weight
  ``wy*(rel_v==kv) + ...`` selects its own two corners. Smooth flow fields
  (the common case for coarse-to-fine refinement) need only a handful of
  candidates per tile; discontinuous tiles just run more fori_loop
  iterations — never incorrect, only slower.
- The warped stripe lands in a VMEM scratch with a 2d-lane margin and
  zeroed out-of-frame rows/cols (the cost volume's zero-pad boundary,
  modules.py:158-181), and the 81-tap correlation + LeakyReLU(0.1) runs
  exactly like `cost_volume_pallas` — without re-reading anything from HBM.

Layout matches the cost-volume kernel: (B, H, C|taps, W) — W in lanes, C in
sublanes, H untiled (dynamic row offsets are free there).

Backward (custom VJP): the forward kernel additionally writes the warped
map it already has in VMEM (a residual — no recompute), the Pallas
cost-volume backward correlation kernels produce (df0, d_warped), and the
scatter-free Pallas warp backward (`warp_bwd_pallas` below — the
candidate tent filter's transpose is itself a candidate tent filter)
turns d_warped into (df1, dflow). No XLA gathers or scatters anywhere in
the trained hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["warped_cost_volume"]

from pwcnet_tpu.ops.pallas.common import VMEM_BUDGET as _VMEM_BUDGET


from pwcnet_tpu.ops.pallas.common import round_up as _round_up  # noqa: E402


def _wcv_vmem_bytes(h, w, c, d, th, itemsize, hf=None, save_ext=False):
    """VMEM demand of the fused kernel's blocks + scratch (lane padding
    included; 2x for Pallas double-buffering of the tiled blocks).

    ``hf``: frame-1 height (== h except in the spatially-sharded global
    variant, where the full frame rides in VMEM while only the shard's h
    rows are computed). ``save_ext``: the per-tile warped stripe is saved
    whole (s rows) instead of the local th rows."""
    hf = h if hf is None else hf
    s = th + 2 * d
    taps = (2 * d + 1) ** 2
    wl = _round_up(w + 2 * d, 128)
    f1e = (hf + 2 + 2 * s) * c * wl * itemsize
    flow = (h + 2 * d) * 8 * wl * 4
    f0_tile = th * c * _round_up(w, 128) * itemsize
    sub = 16 if itemsize == 2 else 8
    out_tile = th * _round_up(taps, sub) * _round_up(w, 128) * itemsize
    outw_rows = s if save_ext else th
    outw_tile = outw_rows * c * _round_up(w, 128) * itemsize
    scratch = 2 * s * c * wl * 4  # ws + hacc, f32
    return f1e + flow + scratch + 2 * (f0_tile + out_tile + outw_tile)


def _pick_tile(h, w, c, d, itemsize, max_tile: int = 32, hf=None,
               save_ext=False):
    """Largest divisor of h (<= max_tile) whose kernel fits VMEM."""
    for t in range(min(h, max_tile), 0, -1):
        if h % t:
            continue
        if (
            _wcv_vmem_bytes(h, w, c, d, t, itemsize, hf, save_ext)
            <= _VMEM_BUDGET
        ):
            return t
    return None


def _lane_roll(x, ku, d: int, interpret: bool):
    """Lane rotation so output lane x' holds input lane x' + ku - d.

    pltpu.roll supports a traced (dynamic) shift when compiled by Mosaic,
    but measured on v5e: dynamic *negative* shifts are lowered wrong for
    lane widths > 256 (off by -128 at width 384), so the shift is always
    passed as its non-negative residue mod the lane width. Mosaic's roll
    interpret path rejects traced shifts — tests use jnp.roll (identical:
    wrapped lanes always carry zero tent weight)."""
    width = x.shape[2]
    shift = jnp.mod(d - ku, width)
    if interpret:
        return jnp.roll(x, shift, 2)
    return pltpu.roll(x, shift, 2)


def _wcv_kernel(
    s_ref,
    vb_ref,
    flow_ref,
    f0_ref,
    f1e_ref,
    out_ref,
    outw_ref,
    ws_ref,
    hacc_ref,
    *,
    d: int,
    hf: int,
    w: int,
    inv_c: float,
    interpret: bool,
    save_ext: bool,
):
    """One (batch, H-tile) grid step.

    s_ref:    (1, 4, T) SMEM   [vmin, nv, umin, nu] candidate ranges per tile
    vb_ref:   (1, 2) SMEM f32  [vlo, vhi] valid row bounds in local coords
              (unsharded: [0, h-1]; sharded shard k: [-off, Hf-1-off] so
              halo rows outside the *global* frame zero out)
    flow_ref: (1, H+2d, 2, W+2d) VMEM  flow (x, y); halo rows are zeros
              (unsharded) or the ppermuted neighbor rows (sharded), with
              the global row offset folded into the y channel
    f0_ref:   (1, TH, C, W)    VMEM tile (the shard's local rows)
    f1e_ref:  (1, Hf+2+2S, C, WL) VMEM  frame-1 (full frame under
              sharding): 1-px edge pad, S-row zero pad, lanes zero-padded
              to WL = roundup(W+2d, 128)
    out_ref:  (1, TH, T, W)    VMEM tile (T = (2d+1)^2 taps)
    outw_ref: the warped features themselves, saved as a VJP residual so
              the backward reuses them for the cost-volume transpose
              instead of re-warping with XLA —
              (1, TH, C, W) local-row tile, or with ``save_ext`` the
              whole per-tile stripe (1, 1, S, C, W) incl. the halo rows
              the sharded backward needs
    ws_ref:   (S, C, W+2d) f32 scratch — warped stripe, zero margin
    hacc_ref: (S, C, W+2d) f32 scratch — per-kv horizontal accumulator
    """
    th = out_ref.shape[1]
    s_rows = th + 2 * d
    n = 2 * d + 1
    w2d = w + 2 * d
    f32 = jnp.float32

    ti = pl.program_id(1)
    row0 = ti * th

    vmin = s_ref[0, 0, ti]
    nv = s_ref[0, 1, ti]
    umin = s_ref[0, 2, ti]
    nu = s_ref[0, 3, ti]
    vlo = vb_ref[0, 0]
    vhi = vb_ref[0, 1]

    fx = flow_ref[0, pl.ds(row0, s_rows), 0, :].astype(f32)  # (S, W+2d)
    fy = flow_ref[0, pl.ds(row0, s_rows), 1, :].astype(f32)
    gy = (
        lax.broadcasted_iota(jnp.int32, (s_rows, w2d), 0).astype(f32)
        + lax.convert_element_type(row0 - d, f32)
    )
    gx = lax.broadcasted_iota(jnp.int32, (s_rows, w2d), 1).astype(f32) - float(d)
    fy0 = jnp.floor(fy)
    fx0 = jnp.floor(fx)
    # relative offsets of the top-left corner in the edge-padded frame
    rel_v = jnp.clip(gy + fy0, -1.0, float(hf - 1)) + 1.0 - gy
    rel_u = jnp.clip(gx + fx0, -1.0, float(w - 1)) + 1.0 - gx
    wy1 = fy - fy0
    wy0 = 1.0 - wy1
    wx1 = fx - fx0
    wx0 = 1.0 - wx1
    # out-of-frame stripe pixels contribute zeros (cost-volume zero pad)
    valid = jnp.where(
        (gy >= vlo)
        & (gy <= vhi)
        & (gx >= 0.0)
        & (gx <= float(w - 1)),
        jnp.asarray(1.0, f32),
        jnp.asarray(0.0, f32),
    )

    ws_ref[...] = jnp.zeros(ws_ref.shape, ws_ref.dtype)

    def v_body(iv, carry):
        kv = vmin + iv
        kvf = lax.convert_element_type(kv, f32)
        wv = (
            jnp.where(rel_v == kvf, wy0, 0.0)
            + jnp.where(rel_v == kvf - 1.0, wy1, 0.0)
        ) * valid
        # stripe row i sources padded frame row (row0 - d + i) + kv + S.
        # Cast to f32 before the lane rotation: Mosaic's rotate only
        # handles 32-bit lanes (bf16 inputs would fail to compile).
        stripe = f1e_ref[0, pl.ds(row0 - d + kv + s_rows, s_rows), :, :].astype(
            f32
        )
        hacc_ref[...] = jnp.zeros(hacc_ref.shape, hacc_ref.dtype)

        def u_body(iu, c2):
            ku = umin + iu
            kuf = lax.convert_element_type(ku, f32)
            wu = jnp.where(rel_u == kuf, wx0, 0.0) + jnp.where(
                rel_u == kuf - 1.0, wx1, 0.0
            )
            rolled = _lane_roll(stripe, ku, d, interpret)[:, :, :w2d]
            hacc_ref[...] += wu[:, None, :] * rolled
            return c2

        lax.fori_loop(0, nu, u_body, 0)
        ws_ref[...] += wv[:, None, :] * hacc_ref[...]
        return carry

    lax.fori_loop(0, nv, v_body, 0)

    if save_ext:
        outw_ref[0, 0] = ws_ref[:, :, d : d + w].astype(outw_ref.dtype)
    else:
        outw_ref[0] = ws_ref[d : d + th, :, d : d + w].astype(outw_ref.dtype)

    # -- correlation over the in-VMEM warped stripe (as cost_volume_pallas)
    f0t = f0_ref[0]  # (TH, C, W) model dtype: bf16 taps halve VPU work
    scale = jnp.asarray(inv_c, f32)
    for v in range(n):
        vs = ws_ref[v : v + th, :, :].astype(f0t.dtype)  # (TH, C, W+2d)
        for u in range(n):
            win = vs[:, :, u : u + w]
            cost = (
                jnp.sum(f0t * win, axis=1, dtype=f32) * scale
            )  # (TH, W), f32 accumulation
            cost = jnp.where(cost >= 0, cost, cost * jnp.asarray(0.1, f32))
            out_ref[0, :, v * n + u, :] = cost.astype(out_ref.dtype)


def _wcv_forward(
    f0,
    f1,
    flow,
    *,
    d: int,
    th: int,
    interpret: bool,
    valid_rows=None,
    save_ext: bool = False,
):
    """Shared forward for the single-chip and spatially-sharded variants.

    Single-chip: ``f1`` has f0's height, ``flow`` has f0's height (zero
    halos are added here), ``valid_rows`` defaults to [0, h-1].

    Sharded (global) variant: ``f0`` holds the shard's h local rows,
    ``f1`` the FULL frame (Hf rows, all-gathered over the spatial axis),
    ``flow`` h + 2d rows (d ppermuted halo rows each side) with the
    shard's global row offset folded into the y channel — for integer
    ``off``, warp(frame, fy + off) at local row i samples global row
    (off + i) + fy exactly (floor/frac are shift-invariant), so the
    kernel needs no coordinate plumbing. ``valid_rows`` = [-off,
    Hf-1-off] marks which local stripe rows are inside the global frame.
    """
    b, h, w, c = f0.shape
    hf = f1.shape[1]
    flow_prepadded = flow.shape[1] != h
    s_rows = th + 2 * d
    n = 2 * d + 1
    wl = _round_up(w + 2 * d, 128)
    f32 = jnp.float32
    flow32 = flow.astype(f32)
    if not flow_prepadded:
        flow32 = jnp.pad(flow32, ((0, 0), (d, d), (0, 0), (0, 0)))
    if valid_rows is None:
        valid_rows = (jnp.asarray(0.0, f32), jnp.asarray(h - 1.0, f32))
    vlo, vhi = valid_rows
    vb = jnp.stack(
        [jnp.asarray(vlo, f32), jnp.asarray(vhi, f32)]
    ).reshape(1, 2)

    # per-(batch, tile) candidate ranges over the halo'd stripe; rows
    # outside the valid range contribute no tent weight in the kernel,
    # so they are excluded from the ranges (+-inf)
    gy = jnp.arange(-d, h + d, dtype=f32)[None, :, None]
    gx = jnp.arange(w, dtype=f32)[None, None, :]
    fx = flow32[..., 0]
    fy = flow32[..., 1]
    rel_v = jnp.clip(gy + jnp.floor(fy), -1.0, hf - 1.0) + 1.0 - gy
    rel_u = jnp.clip(gx + jnp.floor(fx), -1.0, w - 1.0) + 1.0 - gx
    row_ok = (gy[..., 0] >= vlo) & (gy[..., 0] <= vhi)  # (1, h+2d)
    n_tiles = h // th

    def tile_ranges(rel):
        row_min = jnp.where(row_ok, rel.min(axis=2), jnp.inf)
        row_max = jnp.where(row_ok, rel.max(axis=2), -jnp.inf)
        mins = jnp.stack(
            [row_min[:, i * th : i * th + s_rows].min(1) for i in range(n_tiles)],
            axis=1,
        )
        maxs = jnp.stack(
            [row_max[:, i * th : i * th + s_rows].max(1) for i in range(n_tiles)],
            axis=1,
        )
        return mins, maxs - mins + 2.0  # candidates kv in [min, max+1]

    vmin_t, nv_t = tile_ranges(rel_v)
    umin_t, nu_t = tile_ranges(rel_u)
    scal = jnp.stack([vmin_t, nv_t, umin_t, nu_t], axis=1).astype(jnp.int32)

    f1e = jnp.pad(f1, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    f1e = jnp.transpose(f1e, (0, 1, 3, 2))  # (B, hf+2, c, w+2)
    f1e = jnp.pad(f1e, ((0, 0), (s_rows, s_rows), (0, 0), (0, wl - (w + 2))))

    flow_t = jnp.transpose(flow32, (0, 1, 3, 2))  # (B, h+2d, 2, w)
    flow_t = jnp.pad(flow_t, ((0, 0), (0, 0), (0, 0), (d, d)))

    if save_ext:
        outw_spec = pl.BlockSpec(
            (1, 1, s_rows, c, w),
            lambda bi, i: (bi, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        outw_shape = jax.ShapeDtypeStruct(
            (b, n_tiles, s_rows, c, w), f0.dtype
        )
    else:
        outw_spec = pl.BlockSpec(
            (1, th, c, w),
            lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        outw_shape = jax.ShapeDtypeStruct((b, h, c, w), f0.dtype)

    out, outw = pl.pallas_call(
        functools.partial(
            _wcv_kernel,
            d=d,
            hf=hf,
            w=w,
            inv_c=1.0 / c,
            interpret=interpret,
            save_ext=save_ext,
        ),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 4, n_tiles),
                lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 2),
                lambda bi, i: (0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, h + 2 * d, 2, w + 2 * d),
                lambda bi, i: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th, c, w),
                lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hf + 2 + 2 * s_rows, c, wl),
                lambda bi, i: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, th, n * n, w),
                lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            outw_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n * n, w), f0.dtype),
            outw_shape,
        ],
        scratch_shapes=[
            pltpu.VMEM((s_rows, c, w + 2 * d), f32),
            pltpu.VMEM((s_rows, c, w + 2 * d), f32),
        ],
        interpret=interpret,
    )(scal, vb, flow_t, jnp.transpose(f0, (0, 1, 3, 2)), f1e)
    if save_ext:
        # (cost volume NHW(taps), per-tile warped stripes (B,T,S,C,W))
        return jnp.transpose(out, (0, 1, 3, 2)), outw
    # (cost volume NHW(taps), warped features NHWC)
    return jnp.transpose(out, (0, 1, 3, 2)), jnp.transpose(outw, (0, 1, 3, 2))


def _warp_bwd_kernel(
    s_ref,
    g_ref,
    f1e_ref,
    relw_ref,
    dfe_ref,
    dflow_ref,
    acc_ref,
    hacc_ref,
    dfx_ref,
    dfy_ref,
    *,
    hf: int,
    pad: int,
    w: int,
    interpret: bool,
):
    """Scatter-free bilinear-warp backward, one (batch, C-chunk, H-tile)
    grid step.

    The transpose of the candidate-offset tent filter is itself a
    candidate-offset tent filter: df1e[py+kv, px+ku] += W(p)·g(p) for the
    (kv, ku) the pixel actually selects, so looping over the tile's
    candidate offsets and *unrolling* (negated lane/row shifts) replaces
    XLA's scatter (4 serialized row-scatters, ~1.9 ms/step at 384x448).
    dflow reuses each candidate's rolled frame stripe: with
    sv0=(rel_v==kv), sv1=(rel_v==kv-1), su0/su1 likewise, the corner-
    difference sums factor as c_x=(su1-su0)·wv_map, c_y=(sv1-sv0)·wu_map.

    Tiling: candidate ranges are per H-tile (grid dim 2) for flow
    locality, like the forward; the scatter target is the frame-wide
    ``acc_ref`` scratch, zeroed on the first tile and flushed to
    ``dfe_ref`` on the last — tile writes may overlap rows, scratch
    accumulation handles it. Channels chunk over grid dim 1 so the
    frame-height buffers fit VMEM; dfx/dfy accumulate across chunks in
    frame-sized scratch.

    The frame height ``hf`` and the cotangent row count H decouple for
    the spatially-sharded variant (frame = the all-gathered full frame,
    cotangent = the shard's halo'd rows, global offset folded into the
    flow before relw is computed). ``pad`` (>= tile rows - 1) is the
    zero-row padding on f1e/acc: frame row r sits at index r + 1 + pad.

    s_ref:    (1, T, 4) SMEM    per-tile [vmin, nv, umin, nu]
    g_ref:    (1, TH, CC, WL)   cotangent tile of the warped map
    f1e_ref:  (1, Hf+2+2P, CC, WL) edge-padded frame rows at offset P
    relw_ref: (1, 6, TH, WL)    [rel_v, rel_u, wy0, wy1, wx0, wx1] f32
    dfe_ref:  (1, Hf+2, CC, WL) output: padded-grid df1 (pre edge-fold)
    dflow_ref:(1, 2, TH, WL)    output tile: [dfx, dfy]
    acc_ref:  (Hf+2P+2, CC, WL) f32 scratch — padded-grid scatter acc
    hacc_ref: (TH, CC, WL) f32  scratch — per-kv lane-unrolled products
    dfx_ref/dfy_ref: (H, WL) f32 scratch — cross-chunk dflow accumulators
    """
    f32 = jnp.float32
    wl = g_ref.shape[3]
    th = g_ref.shape[1]
    ci = pl.program_id(1)
    nc = pl.num_programs(1)
    ti = pl.program_id(2)
    nt = pl.num_programs(2)
    row0 = ti * th
    vmin = s_ref[0, ti, 0]
    nv = s_ref[0, ti, 1]
    umin = s_ref[0, ti, 2]
    nu = s_ref[0, ti, 3]

    rel_v = relw_ref[0, 0]
    rel_u = relw_ref[0, 1]
    wy0 = relw_ref[0, 2]
    wy1 = relw_ref[0, 3]
    wx0 = relw_ref[0, 4]
    wx1 = relw_ref[0, 5]
    g = g_ref[0].astype(f32)  # (TH, CC, WL)

    @pl.when(ti == 0)
    def _zero_acc():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    @pl.when(ci == 0)
    def _zero_dflow():
        dfx_ref[pl.ds(row0, th), :] = jnp.zeros((th, wl), dfx_ref.dtype)
        dfy_ref[pl.ds(row0, th), :] = jnp.zeros((th, wl), dfy_ref.dtype)

    def roll_to(x, shift):
        """Cyclic lane roll: out lane i reads in lane (i - shift) mod WL.
        Wrapped lanes only ever carry zero-weight contributions."""
        sh = jnp.mod(shift, wl)
        if interpret:
            return jnp.roll(x, sh, axis=-1)
        return pltpu.roll(x, sh, x.ndim - 1)

    def v_body(iv, carry):
        kv = vmin + iv
        kvf = lax.convert_element_type(kv, f32)
        sv0 = jnp.where(rel_v == kvf, 1.0, 0.0)
        sv1 = jnp.where(rel_v == kvf - 1.0, 1.0, 0.0)
        wv_map = wy0 * sv0 + wy1 * sv1  # (TH, WL)
        dsv = sv1 - sv0
        # frame rows py+kv (padded indices), py in [row0, row0+th)
        stripe = f1e_ref[0, pl.ds(row0 + kv + pad, th), :, :].astype(f32)
        hacc_ref[...] = jnp.zeros(hacc_ref.shape, hacc_ref.dtype)

        def u_body(iu, c2):
            ku = umin + iu
            kuf = lax.convert_element_type(ku, f32)
            su0 = jnp.where(rel_u == kuf, 1.0, 0.0)
            su1 = jnp.where(rel_u == kuf - 1.0, 1.0, 0.0)
            wu_map = wx0 * su0 + wx1 * su1
            # dflow: R = sum_c f1e[py+kv, px+ku] * g  (corner value dot g)
            stripe_r = roll_to(stripe, -ku)
            r = jnp.sum(stripe_r * g, axis=1)  # (TH, WL)
            dfx_ref[pl.ds(row0, th), :] += (su1 - su0) * wv_map * r
            dfy_ref[pl.ds(row0, th), :] += dsv * wu_map * r
            # df1: unroll the weighted cotangent to the corner position
            prod = (wv_map * wu_map)[:, None, :] * g
            hacc_ref[...] += roll_to(prod, ku)
            return c2

        lax.fori_loop(0, nu, u_body, 0)
        # row-unshift: pixel row py lands on padded row py + kv
        acc_ref[pl.ds(row0 + kv + pad, th), :, :] += hacc_ref[...]
        return carry

    lax.fori_loop(0, nv, v_body, 0)

    @pl.when(ti == nt - 1)
    def _flush_dfe():
        dfe_ref[0] = acc_ref[pad : pad + hf + 2, :, :].astype(dfe_ref.dtype)

    # final chunk's write is the one that lands (earlier chunks' blocks
    # are overwritten at the same output index)
    dflow_ref[0, 0] = dfx_ref[pl.ds(row0, th), :].astype(dflow_ref.dtype)
    dflow_ref[0, 1] = dfy_ref[pl.ds(row0, th), :].astype(dflow_ref.dtype)


def _warp_bwd_vmem_bytes(h, w, cc, th, itemsize, hf=None):
    """VMEM demand for one (batch, C-chunk, H-tile) grid step; ``h`` is
    the cotangent row count, ``hf`` the frame height (pad = th)."""
    hf = h if hf is None else hf
    wl = _round_up(w + 2, 128)
    acc = (hf + 2 * th + 2) * cc * wl * 4
    hacc = th * cc * wl * 4
    f1e = (hf + 2 + 2 * th) * cc * wl * itemsize
    g = th * cc * wl * itemsize
    relw = 6 * th * wl * 4
    dfe = (hf + 2) * cc * wl * itemsize
    dflow = 2 * th * wl * 4
    dfxy = 2 * h * wl * 4
    maps = 8 * th * wl * 4  # in-kernel f32 temporaries
    stripes = 3 * th * cc * wl * 4
    return (
        acc + hacc + f1e + dfxy + maps + stripes
        + 2 * (g + relw + dfe + dflow)
    )


def _pick_bwd_tiles(h, w, c, itemsize, max_tile: int = 16, hf=None):
    """(c_chunk, tile_h) whose per-step buffers fit the VMEM budget.

    Mosaic requires tiled block sublane dims divisible by 8 (or equal to
    the full array dim), so tile_h and c_chunk are restricted to that."""
    ths = [
        t
        for t in range(min(h, max_tile), 0, -1)
        if h % t == 0 and (t % 8 == 0 or t == h)
    ]
    ccs = [
        v
        for v in range(c, 0, -1)
        if c % v == 0 and (v % 8 == 0 or v == c)
    ]
    for cc in ccs:
        for th in ths:
            if (
                _warp_bwd_vmem_bytes(h, w, cc, th, itemsize, hf)
                <= _VMEM_BUDGET
            ):
                return cc, th
    return None


def warp_bwd_pallas(f1, flow, g, interpret: bool = False):
    """(df1, dflow) of ``bilinear_warp(f1, flow)`` given cotangent ``g``.

    Exact `_bilinear_warp_bwd` semantics (ops/warp.py — independent
    corner clamping via the padded grid, weight gradients from the
    unclamped fractional flow) without XLA scatters. Returns None when
    the kernel does not fit VMEM; callers fall back to the XLA path.

    The spatially-sharded path calls this with a frame taller than the
    cotangent (``f1`` = the all-gathered full frame, ``flow``/``g`` =
    the shard's halo'd local rows, global row offset folded into
    ``flow[..., 1]``): df1 then covers the full frame (the shard's
    scatter contributions; shard_map's all_gather transpose sums them)."""
    b, hf, w, c = f1.shape
    h = g.shape[1]
    picked = _pick_bwd_tiles(h, w, c, jnp.dtype(f1.dtype).itemsize, hf=hf)
    if picked is None and interpret:
        # interpreter-mode tests keep kernel coverage: Mosaic's sublane
        # divisibility rules do not apply, any divisor of h works
        picked = c, next(t for t in range(min(h, 16), 0, -1) if h % t == 0)
    if picked is None:
        return None
    cc, th = picked
    nc = c // cc
    nt = h // th
    f32 = jnp.float32
    wl = _round_up(w + 2, 128)
    flow32 = flow.astype(f32)
    fx = flow32[..., 0]
    fy = flow32[..., 1]
    gy = jnp.arange(h, dtype=f32)[None, :, None]
    gx = jnp.arange(w, dtype=f32)[None, None, :]
    fy0 = jnp.floor(fy)
    fx0 = jnp.floor(fx)
    rel_v = jnp.clip(gy + fy0, -1.0, hf - 1.0) + 1.0 - gy
    rel_u = jnp.clip(gx + fx0, -1.0, w - 1.0) + 1.0 - gx
    wy1 = fy - fy0
    wx1 = fx - fx0
    relw = jnp.stack(
        [rel_v, rel_u, 1.0 - wy1, wy1, 1.0 - wx1, wx1], axis=1
    )  # (B, 6, H, W)
    relw = jnp.pad(relw, ((0, 0), (0, 0), (0, 0), (0, wl - w)))

    def tile_ranges(rel):
        rmin = jnp.stack(
            [rel[:, i * th : (i + 1) * th].min((1, 2)) for i in range(nt)],
            axis=1,
        )
        rmax = jnp.stack(
            [rel[:, i * th : (i + 1) * th].max((1, 2)) for i in range(nt)],
            axis=1,
        )
        return rmin, rmax - rmin + 2.0  # candidates k in [min, max+1]

    vmin_t, nv_t = tile_ranges(rel_v)
    umin_t, nu_t = tile_ranges(rel_u)
    scal = jnp.stack(
        [vmin_t, nv_t, umin_t, nu_t], axis=2
    ).astype(jnp.int32)  # (B, T, 4)

    f1e = jnp.pad(f1, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    f1e = jnp.transpose(f1e, (0, 1, 3, 2))  # (B, hf+2, c, w+2)
    f1e = jnp.pad(
        f1e, ((0, 0), (th, th), (0, 0), (0, wl - (w + 2)))
    )

    gt = jnp.transpose(g, (0, 1, 3, 2))  # (B, h, c, w)
    gt = jnp.pad(gt, ((0, 0), (0, 0), (0, 0), (0, wl - w)))

    dfe, dflow = pl.pallas_call(
        functools.partial(
            _warp_bwd_kernel, hf=hf, pad=th, w=w, interpret=interpret
        ),
        grid=(b, nc, nt),
        in_specs=[
            pl.BlockSpec(
                (1, nt, 4), lambda bi, ci, ti: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, th, cc, wl), lambda bi, ci, ti: (bi, ti, ci, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hf + 2 + 2 * th, cc, wl),
                lambda bi, ci, ti: (bi, 0, ci, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 6, th, wl), lambda bi, ci, ti: (bi, 0, ti, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, hf + 2, cc, wl), lambda bi, ci, ti: (bi, 0, ci, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, th, wl), lambda bi, ci, ti: (bi, 0, ti, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hf + 2, c, wl), f1.dtype),
            jax.ShapeDtypeStruct((b, 2, h, wl), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hf + 2 * th + 2, cc, wl), f32),
            pltpu.VMEM((th, cc, wl), f32),
            pltpu.VMEM((h, wl), f32),
            pltpu.VMEM((h, wl), f32),
        ],
        interpret=interpret,
    )(scal, gt, f1e, relw)

    # fold the replicated padded-grid border back onto the true edges
    dfe = dfe[:, :, :, : w + 2]  # (B, hf+2, c, w+2)
    rows = dfe[:, 1 : hf + 1]
    rows = rows.at[:, 0].add(dfe[:, 0]).at[:, hf - 1].add(dfe[:, hf + 1])
    df1 = rows[:, :, :, 1 : w + 1]
    df1 = (
        df1.at[:, :, :, 0]
        .add(rows[:, :, :, 0])
        .at[:, :, :, w - 1]
        .add(rows[:, :, :, w + 1])
    )
    df1 = jnp.transpose(df1, (0, 1, 3, 2)).astype(f1.dtype)  # NHWC
    dflow_out = jnp.stack(
        [dflow[:, 0, :, :w], dflow[:, 1, :, :w]], axis=-1
    ).astype(flow.dtype)
    return df1, dflow_out


def warped_cost_volume(
    f0,
    f1,
    flow,
    search_range: int = 4,
    tile_h: int | None = None,
    interpret: bool = False,
):
    """Fused ``cost_volume(f0, bilinear_warp(f1, flow), d)`` in one pass.

    ``flow`` is in pixel units at this level (the caller applies the
    ``20 / 2**(num_levels - l)`` scale). Falls back to the composed
    warp -> cost_volume_pallas path when the kernel's VMEM demand exceeds
    the budget (both pieces gate their own fallbacks further)."""
    b, h, w, c = f0.shape
    d = int(search_range)
    itemsize = jnp.dtype(f0.dtype).itemsize
    if tile_h is not None and (
        h % tile_h
        or _wcv_vmem_bytes(h, w, c, d, tile_h, itemsize) > _VMEM_BUDGET
    ):
        # a non-dividing tile would leave trailing output rows unwritten
        # (grid = h // tile_h); auto-plan instead
        tile_h = None
    th = tile_h or _pick_tile(h, w, c, d, itemsize)
    if th is None:
        from pwcnet_tpu.ops.pallas.cost_volume import cost_volume_pallas
        from pwcnet_tpu.ops.warp import bilinear_warp

        return cost_volume_pallas(
            f0, bilinear_warp(f1, flow), d, None, interpret
        )
    return _warped_cv_vjp(f0, f1, flow, d, th, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _warped_cv_vjp(f0, f1, flow, search_range, tile_h, interpret):
    return _wcv_forward(
        f0, f1, flow, d=search_range, th=tile_h, interpret=interpret
    )[0]


def _wcv_fwd(f0, f1, flow, search_range, tile_h, interpret):
    out, f1w = _wcv_forward(
        f0, f1, flow, d=search_range, th=tile_h, interpret=interpret
    )
    return out, (f0, f1, flow, out, f1w)


def _wcv_bwd(search_range, tile_h, interpret, res, g):
    """Compose the optimized backward pieces: the Pallas cost-volume
    backward correlations over the warped map saved by the forward
    kernel, then the Pallas warp backward (scatter-free candidate
    transpose; XLA row-scatter VJP as the VMEM fallback)."""
    f0, f1, flow, out, f1w = res
    from pwcnet_tpu.ops.pallas.cost_volume import _cv_bwd
    from pwcnet_tpu.ops.warp import _bilinear_warp_bwd

    df0, df1w = _cv_bwd(search_range, None, interpret, (f0, f1w, out), g)
    warp_grads = warp_bwd_pallas(f1, flow, df1w, interpret)
    if warp_grads is None:
        warp_grads = _bilinear_warp_bwd((f1, flow), df1w)
    df1, dflow = warp_grads
    return df0, df1, dflow


_warped_cv_vjp.defvjp(_wcv_fwd, _wcv_bwd)


# --------------------------------------------- spatially-sharded variant
def _masked_warp_rows(f1, flow_ext, vb, d: int):
    """XLA formulation of the sharded warped map: warp the full frame at
    the shard's halo'd rows (global offset folded into flow[..., 1], the
    extra -d because flow_ext row j is local stripe row j - d) and zero
    the rows outside the global frame (the cost volume's zero padding)."""
    from pwcnet_tpu.ops.warp import bilinear_warp_rows

    h_ext = flow_ext.shape[1]
    flow_adj = flow_ext.at[..., 1].add(-float(d))
    we = bilinear_warp_rows(f1, flow_adj)
    gy = jnp.arange(h_ext, dtype=jnp.float32) - d
    mask = ((gy >= vb[0]) & (gy <= vb[1]))[None, :, None, None]
    return jnp.where(mask, we, jnp.zeros((), we.dtype)).astype(f1.dtype)


def warped_cost_volume_global(
    f0,
    f1_full,
    flow_ext,
    vb,
    search_range: int = 4,
    interpret: bool = False,
):
    """Per-shard fused warp+cost-volume against the full frame.

    Called inside ``shard_map`` by `parallel.make_spatial_warped_cv`:

    - ``f0``: the shard's local rows (B, h, W, C);
    - ``f1_full``: the FULL frame-1 (B, Hf, W, C) — all-gathered over the
      spatial axis outside this op (its transpose reduce-scatters the
      shard's full-frame df1 contributions back);
    - ``flow_ext``: (B, h+2d, W, 2) f32 — the shard's flow rows plus d
      ppermuted halo rows each side, with the global row offset already
      added to the y channel (exact for integer offsets);
    - ``vb``: (2,) f32 [vlo, vhi] — local stripe rows inside the global
      frame (``[-off, Hf-1-off]``); rows outside contribute zeros, which
      reproduces the unsharded kernel's frame-boundary zero padding at
      the *global* edges only.

    The kernel is the same `_wcv_kernel` as the single-chip path (the
    offset-folded flow makes all row arithmetic local); the backward
    composes the H-prepadded Pallas cost-volume transpose over the warped
    stripes the forward saved with the tall-frame Pallas warp backward.
    Falls back to an XLA warp + Pallas hpad cost volume when the full
    frame does not fit the kernel's VMEM budget.
    """
    b, h, w, c = f0.shape
    hf = f1_full.shape[1]
    d = int(search_range)
    th = _pick_tile(
        h, w, c, d, jnp.dtype(f0.dtype).itemsize, hf=hf, save_ext=True
    )
    if th is None and interpret:
        th = next(t for t in range(min(h, 32), 0, -1) if h % t == 0)
    if th is None:
        from pwcnet_tpu.ops.pallas.cost_volume import cost_volume_pallas_hpad

        we = _masked_warp_rows(f1_full, flow_ext, vb, d)
        return cost_volume_pallas_hpad(f0, we, d, None, interpret)
    return _wcv_global_vjp(f0, f1_full, flow_ext, vb, d, th, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _wcv_global_vjp(f0, f1, flow_ext, vb, search_range, tile_h, interpret):
    return _wcv_forward(
        f0,
        f1,
        flow_ext,
        d=search_range,
        th=tile_h,
        interpret=interpret,
        valid_rows=(vb[0], vb[1]),
        save_ext=True,
    )[0]


def _wcv_global_fwd(f0, f1, flow_ext, vb, search_range, tile_h, interpret):
    out, stripes = _wcv_forward(
        f0,
        f1,
        flow_ext,
        d=search_range,
        th=tile_h,
        interpret=interpret,
        valid_rows=(vb[0], vb[1]),
        save_ext=True,
    )
    return out, (f0, f1, flow_ext, vb, out, stripes)


def _wcv_global_bwd(search_range, tile_h, interpret, res, g):
    """df0 via the H-prepadded Pallas cost-volume transpose over the
    warped stripes the forward kernel saved (halo rows included — no
    re-warp, no neighbor exchange needed); then the tall-frame Pallas
    warp backward turns the warped-map cotangent into (df1 over the full
    frame, dflow over the halo'd local rows). shard_map's autodiff
    routes df1 through the all_gather transpose (psum_scatter) and the
    halo rows of dflow through the ppermute transpose."""
    f0, f1, flow_ext, vb, out, stripes = res
    d = search_range
    b, h, w, c = f0.shape
    th = stripes.shape[2] - 2 * d
    from pwcnet_tpu.ops.pallas.cost_volume import _cv_hpad_bwd

    # assemble the (B, h+2d, C, W) warped map from the per-tile stripes
    # (adjacent stripes duplicate their 2d halo rows; take each tile's
    # local th rows plus the outermost halos)
    local = stripes[:, :, d : d + th].reshape(b, h, c, w)
    we = jnp.concatenate(
        [stripes[:, 0, :d], local, stripes[:, -1, th + d :]], axis=1
    )
    we_nhwc = jnp.transpose(we, (0, 1, 3, 2))
    df0, dwe = _cv_hpad_bwd(d, None, interpret, (f0, we_nhwc, out), g)
    # rows outside the global frame were forced to zero in the forward —
    # nothing flows through them into f1/flow
    gy = jnp.arange(-d, h + d, dtype=jnp.float32)
    mask = ((gy >= vb[0]) & (gy <= vb[1]))[None, :, None, None]
    dwe = jnp.where(mask, dwe, jnp.zeros((), dwe.dtype))
    flow_adj = flow_ext.at[..., 1].add(-float(d))
    grads = warp_bwd_pallas(f1, flow_adj, dwe, interpret)
    if grads is None:
        from pwcnet_tpu.ops.warp import bilinear_warp_rows

        _, pullback = jax.vjp(bilinear_warp_rows, f1, flow_adj)
        grads = pullback(dwe.astype(f1.dtype))
    df1, dflow_adj = grads
    # d(flow_adj)/d(flow_ext) is the identity (constant shift)
    return df0, df1, dflow_adj.astype(flow_ext.dtype), jnp.zeros_like(vb)


_wcv_global_vjp.defvjp(_wcv_global_fwd, _wcv_global_bwd)
