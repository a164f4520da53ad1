"""Fused Pallas TPU kernel for the local cost-volume correlation.

The XLA fallback (`pwcnet_tpu.ops.cost_volume`) issues 81 slice-multiply-
reduce ops; XLA does not fuse the 81 re-reads of the padded f1 window, so
the op is HBM-bound (measured: the 5-level cost-volume chain is ~half the
whole PWCDCNet forward time at 448x1024). This kernel reads f0 and f1
once into VMEM and computes all (2d+1)^2 = 81 taps on-chip.

Layout: TPU vector tiles are (sublane, lane) over the last two dims, so
NHWC with C=32 would waste 4x the lanes. The kernel instead works on
(B, H, C, W): W sits in lanes (well-aligned at the fine levels where the
data is big), C in sublanes, and

- vertical taps v are slices along the untiled H dim (free),
- horizontal taps u are *static* lane-offset slices (a vector shift),
- the channel reduction is a sublane reduce,
- the 1/C scale and the reference's LeakyReLU(0.1) on the cost volume
  (modules.py:203) are fused into the same pass.

Output is (B, H, D*D, W), transposed back to NHWC by XLA (one cheap pass).
Wrapper transposes are fused into neighbors by XLA.

Backward is two correlations of the same family expressed with XLA shift
ops (`_cv_bwd`), registered via jax.custom_vjp so the kernel is trainable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (TPU params)

__all__ = ["cost_volume_pallas", "cost_volume_pallas_hpad"]


def _cv_kernel(f0_ref, f1p_ref, out_ref, *, d: int, inv_c: float):
    """One (batch, H-tile) grid step.

    f0_ref:  (1, TH, C, W)        VMEM
    f1p_ref: (1, H+2d, C, W+2d)   VMEM (full frame-1 block per batch
             element; constant block index across H-tiles, fetched once)
    out_ref: (1, TH, D*D, W)      VMEM
    """
    i = pl.program_id(1)
    th = f0_ref.shape[1]
    w = out_ref.shape[3]
    n_taps = 2 * d + 1
    row0 = i * th

    # taps multiply in the model dtype (bf16 halves the VPU work) and
    # accumulate over C in f32
    f0 = f0_ref[0]  # (TH, C, W)
    scale = jnp.float32(inv_c)
    for v in range(n_taps):
        stripe = f1p_ref[0, pl.ds(row0 + v, th), :, :]  # (TH, C, W+2d)
        for u in range(n_taps):
            win = stripe[:, :, u : u + w]
            cost = jnp.sum(f0 * win, axis=1, dtype=jnp.float32) * scale
            cost = jnp.where(cost >= 0, cost, cost * jnp.float32(0.1))
            out_ref[0, :, v * n_taps + u, :] = cost.astype(out_ref.dtype)


def _round_tile(h: int, max_tile: int = 32) -> int:
    """Largest divisor of h that is <= max_tile (keeps the grid even)."""
    for t in range(min(h, max_tile), 0, -1):
        if h % t == 0:
            return t
    return h


def _cv_kernel_windowed(
    f0_ref, f1p_any, out_ref, f1w_ref, sems, *, d: int, inv_c: float
):
    """Windowed forward: like `_cv_kernel` but frame 1 stays in HBM and
    only the (TH + 2d)-row window this tile reads is DMA'd into VMEM
    scratch — used when the full-frame block would not fit VMEM.

    The window DMAs are double-buffered across grid steps: step k starts
    the copy for step k+1 into the other scratch slot before computing,
    so the per-tile DMA latency hides behind the 81-tap correlation
    instead of serializing in front of it (scratch and semaphores
    persist across the sequential TPU grid).

    f0_ref:  (1, TH, C, W)        VMEM tile
    f1p_any: (1, H+2d, C, W+2d)   HBM (memory_space=ANY)
    out_ref: (1, TH, D*D, W)      VMEM tile
    f1w_ref: (2, TH+2d, C, W+2d)  VMEM scratch (two window slots)
    sems:    (2,) DMA semaphores, one per slot
    """
    bi = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)
    th = f0_ref.shape[1]
    w = out_ref.shape[3]
    n_taps = 2 * d + 1

    step = bi * nt + i
    slot = jax.lax.rem(step, 2)

    def window_dma(slot_idx, bj, tj):
        return pltpu.make_async_copy(
            f1p_any.at[bj, pl.ds(tj * th, th + 2 * d)],
            f1w_ref.at[slot_idx],
            sems.at[slot_idx],
        )

    @pl.when(step == 0)
    def _warmup():
        window_dma(slot, bi, i).start()

    nstep = step + 1

    @pl.when(nstep < nb * nt)
    def _prefetch():
        window_dma(
            jax.lax.rem(nstep, 2), nstep // nt, jax.lax.rem(nstep, nt)
        ).start()

    window_dma(slot, bi, i).wait()

    f0 = f0_ref[0]  # (TH, C, W) model dtype; f32 accumulation below
    scale = jnp.float32(inv_c)
    for v in range(n_taps):
        stripe = f1w_ref[slot, v : v + th, :, :]  # (TH, C, W+2d)
        for u in range(n_taps):
            win = stripe[:, :, u : u + w]
            cost = jnp.sum(f0 * win, axis=1, dtype=jnp.float32) * scale
            cost = jnp.where(cost >= 0, cost, cost * jnp.float32(0.1))
            out_ref[0, :, v * n_taps + u, :] = cost.astype(out_ref.dtype)


def _cv_forward(
    f0,
    f1,
    *,
    d: int,
    tile_h: int | None,
    interpret: bool,
    h_prepadded: bool = False,
    windowed: bool | None = None,
):
    """``h_prepadded``: f1 already carries d extra rows on each side (the
    spatially-sharded path supplies halo rows exchanged over ICI).

    ``windowed``: keep frame 1 in HBM and DMA only each tile's halo'd row
    window into VMEM (for shapes whose full-frame block does not fit);
    ``None`` auto-plans from the VMEM estimate."""
    b, h, w, c = f0.shape
    if windowed is None or tile_h is None:
        mode, plan_th = _plan_fwd(
            h, w, c, d, jnp.dtype(f0.dtype).itemsize, tile_h
        )
        if mode is None and interpret:
            # interpreter-mode tests must keep exercising the kernel
            # formulation regardless of the (hardware) VMEM model:
            # force the windowed plan at the largest dividing tile
            mode, plan_th = "windowed", _round_tile(h)
        if windowed is None:
            if mode is None:
                # even one windowed tile row would not fit VMEM: XLA
                # slice formulation (the backward falls back likewise)
                return _cv_fwd_xla(f0, f1, d, h_prepadded)
            windowed = mode == "windowed"
        # always take the planner's tile: a user tile_h that does not
        # divide h was rejected inside _plan_fwd (auto-planned), and
        # `tile_h or plan_th` would resurrect it — grid = h // tile_h
        # then silently leaves the trailing output rows unwritten
        tile_h = plan_th
    th = tile_h
    n_taps = 2 * d + 1

    f0_t = jnp.transpose(f0, (0, 1, 3, 2))  # (B, H, C, W)
    h_pad = ((0, 0), (0, 0)) if h_prepadded else ((0, 0), (d, d))
    f1p_t = jnp.transpose(
        jnp.pad(f1, (h_pad[0], h_pad[1], (d, d), (0, 0))), (0, 1, 3, 2)
    )  # (B, H+2d, C, W+2d)

    if windowed:
        kernel = functools.partial(
            _cv_kernel_windowed, d=d, inv_c=1.0 / c
        )
        # Mosaic DMA slices must be 128-aligned in the lane dim: pad the
        # HBM operand to the lane multiple and copy full-width rows (the
        # kernel's static value slices ignore the padding lanes).
        wl = _round_up(w + 2 * d, 128)
        f1p_t = jnp.pad(
            f1p_t, ((0, 0), (0, 0), (0, 0), (0, wl - (w + 2 * d)))
        )
        f1_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((2, th + 2 * d, c, wl), f1p_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel = functools.partial(_cv_kernel, d=d, inv_c=1.0 / c)
        f1_spec = pl.BlockSpec(
            (1, h + 2 * d, c, w + 2 * d),
            lambda bi, i: (bi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        scratch = []

    grid = (b, h // th)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, th, c, w),
                lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            f1_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, th, n_taps * n_taps, w),
            lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, h, n_taps * n_taps, w), f0.dtype
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(f0_t, f1p_t)
    return jnp.transpose(out, (0, 1, 3, 2))  # back to NHWC (…, 81)


def _leaky_grad(y):
    return jnp.where(y >= 0, 1.0, 0.1)


def _cv_fwd_xla(f0, f1, d, h_prepadded=False):
    """XLA slice formulation (last-resort forward fallback)."""
    b, h, w, c = f0.shape
    hp = (0, 0) if h_prepadded else (d, d)
    f1p = jnp.pad(f1, ((0, 0), hp, (d, d), (0, 0)))
    inv_c = jnp.asarray(1.0 / c, f0.dtype)
    costs = []
    for v in range(2 * d + 1):
        for u in range(2 * d + 1):
            win = jax.lax.slice(f1p, (0, v, u, 0), (b, v + h, u + w, c))
            costs.append(jnp.sum(f0 * win, axis=3) * inv_c)
    cv = jnp.stack(costs, axis=3)
    return jax.nn.leaky_relu(cv, 0.1)


from pwcnet_tpu.ops.pallas.common import round_up as _round_up  # noqa: E402


def _fwd_vmem_bytes(h, w, c, d, th, itemsize):
    """VMEM demand of the forward kernel's blocks (lane-padding included,
    2x for Pallas double-buffering of the tiled blocks)."""
    taps = (2 * d + 1) ** 2
    lanes_w = _round_up(w, 128)
    lanes_wp = _round_up(w + 2 * d, 128)
    full_f1 = (h + 2 * d) * c * lanes_wp * itemsize
    f0_tile = th * c * lanes_w * itemsize
    out_tile = th * _round_up(taps, 8) * lanes_w * itemsize
    return full_f1 + 2 * (f0_tile + out_tile)


from pwcnet_tpu.ops.pallas.common import VMEM_BUDGET as _VMEM_BUDGET


def _fwd_windowed_vmem_bytes(h, w, c, d, th, itemsize):
    """VMEM demand of the windowed forward: two f1 window slots (the
    DMAs double-buffer across grid steps) replace the full-frame block
    (f1 itself stays in HBM)."""
    taps = (2 * d + 1) ** 2
    lanes_w = _round_up(w, 128)
    lanes_wp = _round_up(w + 2 * d, 128)
    window = 2 * (th + 2 * d) * c * lanes_wp * itemsize
    f0_tile = th * c * lanes_w * itemsize
    out_tile = th * _round_up(taps, 8) * lanes_w * itemsize
    return window + 2 * (f0_tile + out_tile)


def _plan_fwd(h, w, c, d, itemsize, tile_h=None):
    """Pick (mode, tile) for the forward kernel: 'full' keeps frame 1
    VMEM-resident (fastest — fetched once per batch element), 'windowed'
    DMAs per-tile row windows from HBM (large shapes), (None, None) means
    even one windowed tile row does not fit (fall back to XLA).

    A user tile_h is honored only if it divides h (a non-dividing tile
    leaves the trailing rows unwritten — grid = h // tile_h) AND fits the
    VMEM budget; otherwise auto-plan — never silently degrade to the XLA
    fallback because of a bad request."""
    if tile_h is not None and h % tile_h == 0:
        if _fwd_vmem_bytes(h, w, c, d, tile_h, itemsize) <= _VMEM_BUDGET:
            return "full", tile_h
        if (
            _fwd_windowed_vmem_bytes(h, w, c, d, tile_h, itemsize)
            <= _VMEM_BUDGET
        ):
            return "windowed", tile_h
    th = _round_tile(h)
    if _fwd_vmem_bytes(h, w, c, d, th, itemsize) <= _VMEM_BUDGET:
        return "full", th
    for t in range(min(h, 32), 0, -1):
        if h % t:
            continue
        if _fwd_windowed_vmem_bytes(h, w, c, d, t, itemsize) <= _VMEM_BUDGET:
            return "windowed", t
    return None, None


def cost_volume_pallas(
    f0,
    f1,
    search_range: int = 4,
    tile_h: int | None = None,
    interpret: bool = False,
):
    """Fused cost volume (LeakyReLU included). Drop-in for ops.cost_volume.

    Shapes whose full-frame VMEM block does not fit on-chip take the
    windowed kernel (per-tile HBM->VMEM row-window DMAs); the XLA
    formulation remains only as a last-resort fallback for shapes where
    even one windowed tile row would not fit."""
    b, h, w, c = f0.shape
    d = int(search_range)
    mode, plan_th = _plan_fwd(
        h, w, c, d, jnp.dtype(f0.dtype).itemsize, tile_h
    )
    if mode is None and not interpret:
        from pwcnet_tpu.ops.cost_volume import cost_volume

        return cost_volume(f0, f1, d)
    # plan_th, not `tile_h or plan_th`: _plan_fwd rejects a non-dividing
    # user tile, and resurrecting it here would leave trailing output
    # rows unwritten (plan_th is None only when mode is None under
    # interpret, and _cv_forward re-plans in that case)
    return _cost_volume_pallas_vjp(f0, f1, d, plan_th, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _cost_volume_pallas_vjp(
    f0,
    f1,
    search_range: int = 4,
    tile_h: int | None = None,
    interpret: bool = False,
):
    return _cv_forward(
        f0, f1, d=search_range, tile_h=tile_h, interpret=interpret
    )


def _cv_fwd(f0, f1, search_range, tile_h, interpret):
    out = _cv_forward(
        f0, f1, d=search_range, tile_h=tile_h, interpret=interpret
    )
    # LeakyReLU preserves sign, so the activated output doubles as the
    # pre-activation sign residual for the backward pass.
    return out, (f0, f1, out)


# ------------------------------------------------------------- backward
def _cv_bwd_df0_kernel(gt_ref, f1p_ref, out_ref, *, d: int):
    """df0[p, c] = sum_t gt[p, t] * f1[p + off_t, c].

    gt_ref:  (1, TH, T, W)        VMEM tile (T = (2d+1)^2 taps)
    f1p_ref: (1, H+2d, C, W+2d)   VMEM full (constant block across tiles)
    out_ref: (1, TH, C, W)        VMEM tile
    """
    i = pl.program_id(1)
    th = out_ref.shape[1]
    w = out_ref.shape[3]
    n = 2 * d + 1
    row0 = i * th

    # fori_loop over the vertical taps keeps the VMEM stack footprint at
    # one stripe (full 81-tap unrolling OOMs scoped vmem at fine levels).
    def body(v, acc):
        stripe = f1p_ref[0, pl.ds(row0 + v, th), :, :]  # (TH, C, W+2d)
        for u in range(n):
            g_plane = gt_ref[0, :, pl.ds(v * n + u, 1), :]  # (TH, 1, W)
            # multiply in the stored dtype (bf16 halves VPU width),
            # accumulate in f32
            acc = acc + (
                g_plane * stripe[:, :, u : u + w]
            ).astype(jnp.float32)
        return acc

    acc = jax.lax.fori_loop(
        0, n, body, jnp.zeros(out_ref.shape[1:], jnp.float32)
    )
    out_ref[0] = acc.astype(out_ref.dtype)


def _cv_bwd_df1_kernel(gtp_ref, f0p_ref, out_ref, *, d: int):
    """df1[q, c] = sum_t gt[q - off_t, t] * f0[q - off_t, c].

    gtp_ref: (1, H+2d, T, W+2d)   VMEM full, zero-padded by d
    f0p_ref: (1, H+2d, C, W+2d)   VMEM full, zero-padded by d
    out_ref: (1, TH, C, W)        VMEM tile
    """
    i = pl.program_id(1)
    th = out_ref.shape[1]
    w = out_ref.shape[3]
    n = 2 * d + 1
    row0 = i * th

    def body(v, acc):
        # source row p = q - (v - d)  ->  padded index q + 2d - v
        rows = pl.ds(row0 + 2 * d - v, th)
        f_stripe = f0p_ref[0, rows, :, :]  # (TH, C, W+2d)
        g_stripe = gtp_ref[0, rows, pl.ds(v * n, n), :]  # (TH, n, W+2d)
        for u in range(n):
            cols = slice(2 * d - u, 2 * d - u + w)
            g_plane = g_stripe[:, u, cols]  # (TH, W)
            acc = acc + (
                g_plane[:, None, :] * f_stripe[:, :, cols]
            ).astype(jnp.float32)
        return acc

    acc = jax.lax.fori_loop(
        0, n, body, jnp.zeros(out_ref.shape[1:], jnp.float32)
    )
    out_ref[0] = acc.astype(out_ref.dtype)


def _cv_bwd_df0_kernel_w(
    gt_ref, f1p_any, out_ref, f1w_ref, sems, *, d: int, db: bool
):
    """Windowed df0: frame 1 stays in HBM; each tile DMAs its halo'd
    (TH + 2d)-row window into VMEM scratch.

    ``db`` statically selects DMA double-buffering across grid steps (see
    `_cv_kernel_windowed`). A traced slot index makes every stripe read
    dynamic in the leading scratch dim, which measured *slower* than the
    serial DMA at the sharded-L4 bf16 shape (PARITY §6: f+b 2.20->2.53
    ms) while winning 2.1x at 1024^2 f32 — so the caller picks per dtype
    and the db=False variant keeps slot 0 static.

    gt_ref:  (1, TH, T, W)           VMEM tile
    f1p_any: (1, H+2d, C, W+2d)      HBM (memory_space=ANY)
    out_ref: (1, TH, C, W)           VMEM tile
    f1w_ref: (nbuf, TH+2d, C, W+2d)  VMEM scratch (nbuf = 2 if db else 1)
    """
    bi = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)
    th = out_ref.shape[1]
    w = out_ref.shape[3]
    n = 2 * d + 1

    step = bi * nt + i

    def window_dma(slot_idx, bj, tj):
        return pltpu.make_async_copy(
            f1p_any.at[bj, pl.ds(tj * th, th + 2 * d)],
            f1w_ref.at[slot_idx],
            sems.at[slot_idx],
        )

    if db:
        slot = jax.lax.rem(step, 2)

        @pl.when(step == 0)
        def _warmup():
            window_dma(slot, bi, i).start()

        nstep = step + 1

        @pl.when(nstep < nb * nt)
        def _prefetch():
            window_dma(
                jax.lax.rem(nstep, 2), nstep // nt, jax.lax.rem(nstep, nt)
            ).start()
    else:
        slot = 0  # static: stripe reads below stay static-offset
        window_dma(slot, bi, i).start()

    window_dma(slot, bi, i).wait()

    def body(v, acc):
        stripe = f1w_ref[slot, pl.ds(v, th), :, :]  # (TH, C, W+2d)
        for u in range(n):
            g_plane = gt_ref[0, :, pl.ds(v * n + u, 1), :]  # (TH, 1, W)
            # multiply in the stored dtype (bf16 halves VPU width),
            # accumulate in f32
            acc = acc + (
                g_plane * stripe[:, :, u : u + w]
            ).astype(jnp.float32)
        return acc

    acc = jax.lax.fori_loop(
        0, n, body, jnp.zeros(out_ref.shape[1:], jnp.float32)
    )
    out_ref[0] = acc.astype(out_ref.dtype)


def _cv_bwd_df1_kernel_w(
    gtv_any, f0p_any, out_ref, gts_ref, f0w_ref, sems, *, d: int,
    rows_in: int, db: bool,
):
    """Windowed df1: both inputs stay in HBM; f0's halo'd (TH + 2d)-row
    window is DMA'd once per tile, and gt — regrouped on the XLA side
    into per-vertical-tap slabs — is DMA'd per fori_loop iteration at a
    dynamic *row* offset. (A dynamic tap offset into the sublane dim of a
    VMEM window is unprovable for Mosaic, and unrolling all 81 taps OOMs
    scoped vmem; rows are untiled, so slab-per-v sidesteps both.)

    With ``db`` both DMA streams are double-buffered: the f0 window
    across grid steps (as in `_cv_kernel_windowed`), the gt slabs across
    the fori_loop's vertical-tap iterations (slab v+1 starts before slab
    v's nine horizontal products run). The traced slot indices make every
    slab/stripe read dynamic in the leading scratch dim, which measured
    slower than serial DMAs at the sharded-L4 bf16 shape but 2.1x faster
    at 1024^2 f32 (PARITY §6) — the caller picks per dtype; db=False
    keeps slot 0 static and issues the DMAs serially.

    gtv_any: (1, n*R, NP, WL)        HBM, R = rows_in = H_out + 2d; slab
             v holds gt rows [v*R, (v+1)*R) with the u tap in sublanes
             (padded to NP)
    f0p_any: (1, R, C, WL)           HBM
    out_ref: (1, TH, C, W)           VMEM tile
    gts_ref: (nbuf, 1, TH, NP, WL)   VMEM scratch (f32) slab slots
    f0w_ref: (nbuf, 1, TH+2d, C, WL) VMEM scratch window slots
    sems:    (2*nbuf,) DMA semaphores — [0:nbuf] slabs, [nbuf:] windows
    """
    bi = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)
    th = out_ref.shape[1]
    w = out_ref.shape[3]
    n = 2 * d + 1
    row0 = i * th
    nbuf = 2 if db else 1

    step = bi * nt + i

    def window_dma(slot_idx, bj, tj):
        return pltpu.make_async_copy(
            f0p_any.at[pl.ds(bj, 1), pl.ds(tj * th, th + 2 * d)],
            f0w_ref.at[slot_idx],
            sems.at[nbuf + slot_idx],
        )

    def slab_dma(slot_idx, bj, r0j, v):
        # output rows [r0j, r0j+th) read source rows r0j + 2d - v + j of
        # slab v, which starts at absolute row v * rows_in
        src0 = v * (rows_in - 1) + r0j + 2 * d
        return pltpu.make_async_copy(
            gtv_any.at[pl.ds(bj, 1), pl.ds(src0, th)],
            gts_ref.at[slot_idx],
            sems.at[slot_idx],
        )

    if db:
        fslot = jax.lax.rem(step, 2)

        @pl.when(step == 0)
        def _warmup():
            window_dma(fslot, bi, i).start()

        nstep = step + 1

        @pl.when(nstep < nb * nt)
        def _prefetch():
            window_dma(
                jax.lax.rem(nstep, 2), nstep // nt, jax.lax.rem(nstep, nt)
            ).start()

        slab_dma(0, bi, row0, 0).start()
    else:
        fslot = 0  # static slot: slab/stripe reads stay static-offset
        window_dma(fslot, bi, i).start()

    window_dma(fslot, bi, i).wait()

    def body(v, acc):
        if db:
            vslot = jax.lax.rem(v, 2)

            @pl.when(v + 1 < n)
            def _next_slab():
                slab_dma(jax.lax.rem(v + 1, 2), bi, row0, v + 1).start()
        else:
            vslot = 0
            slab_dma(vslot, bi, row0, v).start()

        slab_dma(vslot, bi, row0, v).wait()
        f_stripe = f0w_ref[fslot, 0, pl.ds(2 * d - v, th), :, :]
        for u in range(n):
            cols = slice(2 * d - u, 2 * d - u + w)
            g_plane = gts_ref[vslot, 0, :, u, cols]  # (TH, W)
            acc = acc + (
                g_plane.astype(jnp.float32)[:, None, :]
                * f_stripe[:, :, cols].astype(jnp.float32)
            )
        return acc

    acc = jax.lax.fori_loop(
        0, n, body, jnp.zeros(out_ref.shape[1:], jnp.float32)
    )
    out_ref[0] = acc.astype(out_ref.dtype)


def _bwd_vmem_bytes(b, h, w, c, d, itemsize: int = 4):
    """VMEM demand of the df1 kernel's full blocks, with physical lane
    (128) and sublane (8) padding: the f32 gt block dominates — e.g. the
    81 taps pad to 88 sublanes and W+2d=264 lanes pad to 384."""
    taps = (2 * d + 1) ** 2
    lanes = _round_up(w + 2 * d, 128)
    gt_full = (h + 2 * d) * _round_up(taps, 8) * lanes * 4  # always f32
    f_full = (h + 2 * d) * c * lanes * itemsize
    return gt_full + f_full


def _bwd_temp_bytes(w, c, d, th):
    """Scoped-vmem stack demand of the backward kernels' fori_loop body:
    the n statically-unrolled u iterations each materialize an f32
    (TH, C, W) product (Mosaic does not reuse them), plus the f32 stripe
    and accumulator. Measured: predicted 16.8 MB vs Mosaic-reported
    16.74 MB at (th=32, c=32, w=256, d=4)."""
    n = 2 * d + 1
    lanes_w = _round_up(w, 128)
    lanes_wp = _round_up(w + 2 * d, 128)
    products = n * th * c * lanes_w * 4
    stripe = th * c * lanes_wp * 4
    acc = th * c * lanes_w * 4
    return products + stripe + acc


def _df0_vmem_bytes(h, w, c, d, th, itemsize, windowed):
    taps = (2 * d + 1) ** 2
    lanes_w = _round_up(w, 128)
    lanes_wp = _round_up(w + 2 * d, 128)
    gt_tile = th * _round_up(taps, 8) * lanes_w * 4  # gt is always f32
    out_tile = th * c * lanes_w * itemsize
    # windowed: sized for two window slots (the db=False variant uses
    # one — the 2-slot estimate stays conservative for both)
    f1_rows = 2 * (th + 2 * d) if windowed else (h + 2 * d)
    return (
        f1_rows * c * lanes_wp * itemsize
        + 2 * (gt_tile + out_tile)
        + _bwd_temp_bytes(w, c, d, th)
    )


def _df1_vmem_bytes(h_out, w, c, d, th, itemsize, windowed):
    taps = (2 * d + 1) ** 2
    n = 2 * d + 1
    lanes_w = _round_up(w, 128)
    lanes_wp = _round_up(w + 2 * d, 128)
    out_tile = th * c * lanes_w * itemsize
    if windowed:
        # sized for two gt slab slots + two f0 window slots (the db=False
        # variant uses one of each; the 2-slot estimate is conservative)
        gt = 2 * th * _round_up(n, 8) * lanes_wp * 4
        f0 = 2 * (th + 2 * d) * c * lanes_wp * itemsize
        return gt + f0 + 2 * out_tile + _bwd_temp_bytes(w, c, d, th)
    rows = h_out + 2 * d
    gt = rows * _round_up(taps, 8) * lanes_wp * 4
    f0 = rows * c * lanes_wp * itemsize
    return gt + f0 + 2 * out_tile + _bwd_temp_bytes(w, c, d, th)


def _plan_bwd(h_out, w, c, d, itemsize, tile_h, bytes_fn):
    """(mode, tile) for one backward kernel; same policy as `_plan_fwd`.

    A user tile_h that does not divide ``h_out`` or does not fit the
    VMEM budget is ignored (auto-plan): the hpad backward's df1_ext
    kernel covers h + 2d output rows, so a tile that divides h but not
    h + 2d would silently leave the trailing halo rows unwritten; and a
    too-big tile must not drop the whole Pallas path to the XLA loop."""
    if tile_h is not None and h_out % tile_h == 0:
        if bytes_fn(h_out, w, c, d, tile_h, itemsize, False) <= _VMEM_BUDGET:
            return "full", tile_h
        if bytes_fn(h_out, w, c, d, tile_h, itemsize, True) <= _VMEM_BUDGET:
            return "windowed", tile_h
    th = _round_tile(h_out)
    if bytes_fn(h_out, w, c, d, th, itemsize, False) <= _VMEM_BUDGET:
        return "full", th
    for t in range(min(h_out, 32), 0, -1):
        if h_out % t:
            continue
        if bytes_fn(h_out, w, c, d, t, itemsize, True) <= _VMEM_BUDGET:
            return "windowed", t
    return None, None


def _bwd_db(itemsize: int) -> bool:
    """Double-buffer the windowed backward kernels' DMA streams?

    Measured on v5e-1 (PARITY §6): double-buffering wins 2.1x at the
    1024^2-L4 f32 shape, is neutral at 112x256 f32 and 1024^2 bf16, and
    *loses* 13% at the sharded-L4 112x256 bf16 shape — the traced slot
    index turns every slab/stripe read dynamic in the scratch's leading
    dim, which costs more than the overlap buys when the per-tile compute
    is short (bf16 VPU products). Policy: overlap only for f32 features.
    (Tests monkeypatch this for coverage of both variants.)
    """
    return itemsize == 4


def _run_df0(
    gt_t, f1p_t, h, w, c, d, th, windowed, interpret, out_dtype, db
):
    """df0[p, c] = sum_t gt[p, t] * f1[p + off_t, c] as a Pallas call."""
    b = gt_t.shape[0]
    n_taps = 2 * d + 1
    if windowed:
        kernel = functools.partial(_cv_bwd_df0_kernel_w, d=d, db=db)
        nbuf = 2 if db else 1
        # lane-pad for 128-aligned DMA (see _cv_forward)
        wl = _round_up(w + 2 * d, 128)
        f1p_t = jnp.pad(
            f1p_t, ((0, 0), (0, 0), (0, 0), (0, wl - (w + 2 * d)))
        )
        f1_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((nbuf, th + 2 * d, c, wl), f1p_t.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ]
    else:
        kernel = functools.partial(_cv_bwd_df0_kernel, d=d)
        f1_spec = pl.BlockSpec(
            (1, h + 2 * d, c, w + 2 * d),
            lambda bi, i: (bi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        scratch = []
    return pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(
                (1, th, n_taps * n_taps, w),
                lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            f1_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, th, c, w),
            lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, c, w), out_dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(gt_t, f1p_t)


def _run_df1(
    gtp_t, f0p_t, h_out, w, c, d, th, windowed, interpret, out_dtype, db
):
    """df1[q, c] = sum_t gt[q - off_t, t] * f0[q - off_t, c] as a Pallas
    call over ``h_out`` output rows; inputs carry h_out + 2d rows (the
    plain path pads by d each side, the H-prepadded path by 2d)."""
    b = gtp_t.shape[0]
    rows_in = gtp_t.shape[1]
    n_taps = 2 * d + 1
    if windowed:
        # Regroup gt into per-v slabs (see _cv_bwd_df1_kernel_w): rows
        # become (v, R), the u tap sits in sublanes padded to a tiling
        # multiple, lanes pad to 128 for aligned DMAs.
        wl = _round_up(w + 2 * d, 128)
        np_pad = _round_up(n_taps, 8)
        gtv = gtp_t.reshape(b, rows_in, n_taps, n_taps, w + 2 * d)
        gtv = jnp.transpose(gtv, (0, 2, 1, 3, 4))  # (b, n, R, n, w+2d)
        gtv = jnp.pad(
            gtv,
            (
                (0, 0),
                (0, 0),
                (0, 0),
                (0, np_pad - n_taps),
                (0, wl - (w + 2 * d)),
            ),
        )
        gtp_t = gtv.reshape(b, n_taps * rows_in, np_pad, wl)
        f0p_t = jnp.pad(
            f0p_t, ((0, 0), (0, 0), (0, 0), (0, wl - (w + 2 * d)))
        )
        kernel = functools.partial(
            _cv_bwd_df1_kernel_w, d=d, rows_in=rows_in, db=db
        )
        nbuf = 2 if db else 1
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        scratch = [
            pltpu.VMEM((nbuf, 1, th, np_pad, wl), gtp_t.dtype),
            pltpu.VMEM((nbuf, 1, th + 2 * d, c, wl), f0p_t.dtype),
            pltpu.SemaphoreType.DMA((2 * nbuf,)),
        ]
    else:
        kernel = functools.partial(_cv_bwd_df1_kernel, d=d)
        in_specs = [
            pl.BlockSpec(
                (1, rows_in, n_taps * n_taps, w + 2 * d),
                lambda bi, i: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rows_in, c, w + 2 * d),
                lambda bi, i: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        scratch = []
    return pl.pallas_call(
        kernel,
        grid=(b, h_out // th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, th, c, w),
            lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h_out, c, w), out_dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(gtp_t, f0p_t)


def _cv_bwd(search_range, tile_h, interpret, res, g):
    """Backward via two Pallas correlation kernels (same VMEM-resident
    layout as the forward). Shapes whose full blocks would not fit VMEM
    run the windowed (per-tile HBM->VMEM DMA) kernel variants; XLA shift
    ops remain only as a last resort.

    raw[..., t] = <f0, shift(f1, v, u)> / C ; out = leaky(raw)
    df0 = sum_t g_t * leaky'(raw_t) * shift(f1, v, u) / C
    df1[p] = sum_t (g_t * leaky')(p - (v,u)) * f0(p - (v,u)) / C
    """
    f0, f1, out = res
    d = search_range
    b, h, w, c = f0.shape
    itemsize = jnp.dtype(f0.dtype).itemsize

    mode0, th0 = _plan_bwd(h, w, c, d, itemsize, tile_h, _df0_vmem_bytes)
    mode1, th1 = _plan_bwd(h, w, c, d, itemsize, tile_h, _df1_vmem_bytes)
    if interpret:  # keep kernel coverage in interpreter-mode tests
        mode0, th0 = mode0 or "windowed", th0 or _round_tile(h)
        mode1, th1 = mode1 or "windowed", th1 or _round_tile(h)
    if mode0 is None or mode1 is None:
        return _cv_bwd_xla(f0, f1, g, d)

    # gt = g * leaky'(raw) / C; sign(out) == sign(raw). Kept in float32:
    # the kernels index single taps with dynamic sublane offsets, which
    # Mosaic cannot prove aligned for 16-sublane (bf16) tiles.
    gt = (
        g.astype(jnp.float32)
        * _leaky_grad(out)
        * jnp.float32(1.0 / c)
    )
    gt_t = jnp.transpose(gt, (0, 1, 3, 2))  # (B, H, T, W) f32

    db = _bwd_db(itemsize)
    f1p_t = jnp.transpose(
        jnp.pad(f1, ((0, 0), (d, d), (d, d), (0, 0))), (0, 1, 3, 2)
    )
    df0 = _run_df0(
        gt_t, f1p_t, h, w, c, d, th0, mode0 == "windowed", interpret,
        f0.dtype, db,
    )

    gtp_t = jnp.pad(gt_t, ((0, 0), (d, d), (0, 0), (d, d)))
    f0p_t = jnp.transpose(
        jnp.pad(f0, ((0, 0), (d, d), (d, d), (0, 0))), (0, 1, 3, 2)
    )
    df1 = _run_df1(
        gtp_t, f0p_t, h, w, c, d, th1, mode1 == "windowed", interpret,
        f1.dtype, db,
    )

    return (
        jnp.transpose(df0, (0, 1, 3, 2)),
        jnp.transpose(df1, (0, 1, 3, 2)),
    )


def _cv_bwd_xla(f0, f1, g, d):
    """XLA shift-op fallback (zero-pad boundary semantics)."""
    b, h, w, c = f0.shape
    inv_c = jnp.asarray(1.0 / c, f0.dtype)
    f1p = jnp.pad(f1, ((0, 0), (d, d), (d, d), (0, 0)))

    df0 = jnp.zeros_like(f0)
    df1p = jnp.zeros_like(f1p)
    idx = 0
    for v in range(-d, d + 1):
        for u in range(-d, d + 1):
            win = jax.lax.slice(
                f1p, (0, v + d, u + d, 0), (b, v + d + h, u + d + w, c)
            )
            raw = jnp.sum(f0 * win, axis=-1, keepdims=True) * inv_c
            gt = g[..., idx : idx + 1] * _leaky_grad(raw).astype(g.dtype)
            df0 = df0 + gt * win * inv_c
            contrib = gt * f0 * inv_c
            df1p = jax.lax.dynamic_update_slice(
                df1p,
                jax.lax.dynamic_slice(
                    df1p, (0, v + d, u + d, 0), (b, h, w, c)
                )
                + contrib,
                (0, v + d, u + d, 0),
            )
            idx += 1
    df1 = jax.lax.slice(df1p, (0, d, d, 0), (b, d + h, d + w, c))
    return df0, df1


_cost_volume_pallas_vjp.defvjp(_cv_fwd, _cv_bwd)


# ------------------------------------------- H-prepadded (sharded) variant
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def cost_volume_pallas_hpad(
    f0,
    f1_ext,
    search_range: int = 4,
    tile_h: int | None = None,
    interpret: bool = False,
):
    """Fused cost volume over an f1 that already carries d halo rows on
    each side (``f1_ext`` is (B, H+2d, W, C)); used by the shard_map
    spatial-parallel path, where the halos arrive from neighbor shards via
    ppermute and gradients must flow back through them."""
    return _cv_forward(
        f0,
        f1_ext,
        d=search_range,
        tile_h=tile_h,
        interpret=interpret,
        h_prepadded=True,
    )


def _cv_hpad_fwd(f0, f1_ext, search_range, tile_h, interpret):
    out = _cv_forward(
        f0,
        f1_ext,
        d=search_range,
        tile_h=tile_h,
        interpret=interpret,
        h_prepadded=True,
    )
    return out, (f0, f1_ext, out)


def _cv_hpad_bwd(search_range, tile_h, interpret, res, g):
    """df0 local; df1_ext keeps the halo rows (uncropped in H) so the
    shard_map transpose routes them back to the neighbor shards.

    Runs as the same two Pallas correlation kernels as the plain backward
    (`_cv_bwd_df0_kernel`/`_cv_bwd_df1_kernel`): df0 is byte-identical to
    the plain case (f1_ext already carries the d halo rows the kernel
    expects as padding), and df1_ext reuses the df1 kernel with gt/f0
    zero-padded by 2d rows so the output grid covers the h+2d extended
    rows — the dynamic row index ``row0 + 2d - v`` then lands exactly on
    contribution row ``q - v``. XLA shift-op fallback when the full VMEM
    blocks would not fit."""
    f0, f1_ext, out = res
    d = search_range
    b, h, w, c = f0.shape
    he = h + 2 * d
    itemsize = jnp.dtype(f0.dtype).itemsize

    mode0, th0 = _plan_bwd(h, w, c, d, itemsize, tile_h, _df0_vmem_bytes)
    mode1, th1 = _plan_bwd(he, w, c, d, itemsize, tile_h, _df1_vmem_bytes)
    if interpret:  # keep kernel coverage in interpreter-mode tests
        mode0, th0 = mode0 or "windowed", th0 or _round_tile(h)
        mode1, th1 = mode1 or "windowed", th1 or _round_tile(he)
    if mode0 is None or mode1 is None:
        return _cv_hpad_bwd_xla(res, g, d)

    # gt = g * leaky'(raw) / C, float32 (see _cv_bwd for the bf16 caveat)
    gt = g.astype(jnp.float32) * _leaky_grad(out) * jnp.float32(1.0 / c)
    gt_t = jnp.transpose(gt, (0, 1, 3, 2))  # (B, H, T, W)

    # -- df0: identical to the plain backward; f1_ext == "f1 padded by d"
    db = _bwd_db(itemsize)
    f1p_t = jnp.transpose(
        jnp.pad(f1_ext, ((0, 0), (0, 0), (d, d), (0, 0))), (0, 1, 3, 2)
    )  # (B, H+2d, C, W+2d)
    df0 = _run_df0(
        gt_t, f1p_t, h, w, c, d, th0, mode0 == "windowed", interpret,
        f0.dtype, db,
    )

    # -- df1_ext over the h+2d extended rows: pad gt/f0 rows by 2d so the
    # kernel's row0+2d-v slices stay in-bounds for halo output rows
    gtp_t = jnp.pad(gt_t, ((0, 0), (2 * d, 2 * d), (0, 0), (d, d)))
    f0p_t = jnp.transpose(
        jnp.pad(f0, ((0, 0), (2 * d, 2 * d), (d, d), (0, 0))), (0, 1, 3, 2)
    )  # (B, H+4d, C, W+2d)
    df1_ext = _run_df1(
        gtp_t, f0p_t, he, w, c, d, th1, mode1 == "windowed", interpret,
        f1_ext.dtype, db,
    )
    return (
        jnp.transpose(df0, (0, 1, 3, 2)),
        jnp.transpose(df1_ext, (0, 1, 3, 2)),
    )


def _cv_hpad_bwd_xla(res, g, d):
    """XLA shift-op fallback for the H-prepadded backward."""
    f0, f1_ext, out = res
    b, h, w, c = f0.shape
    inv_c = jnp.asarray(1.0 / c, f0.dtype)
    # W-pad only; H halos are already in f1_ext.
    f1p = jnp.pad(f1_ext, ((0, 0), (0, 0), (d, d), (0, 0)))

    df0 = jnp.zeros_like(f0)
    df1p = jnp.zeros_like(f1p)  # (B, H+2d, W+2d, C)
    idx = 0
    for v in range(-d, d + 1):
        for u in range(-d, d + 1):
            win = jax.lax.slice(
                f1p, (0, v + d, u + d, 0), (b, v + d + h, u + d + w, c)
            )
            gt = g[..., idx : idx + 1] * _leaky_grad(
                out[..., idx : idx + 1]
            ).astype(g.dtype)
            df0 = df0 + gt * win * inv_c
            contrib = gt * f0 * inv_c
            df1p = jax.lax.dynamic_update_slice(
                df1p,
                jax.lax.dynamic_slice(
                    df1p, (0, v + d, u + d, 0), (b, h, w, c)
                )
                + contrib,
                (0, v + d, u + d, 0),
            )
            idx += 1
    df1_ext = jax.lax.slice(
        df1p, (0, 0, d, 0), (b, h + 2 * d, d + w, c)
    )
    return df0, df1_ext


cost_volume_pallas_hpad.defvjp(_cv_hpad_fwd, _cv_hpad_bwd)
