#!/usr/bin/env python
"""Sequential (per-segment) roofline decomposition of the serving step.

Why this exists (round 5, VERDICT r4 #1): the aggregate roofline in
``scripts/roofline.py`` — max(total_FLOPs/peak_MXU, total_bytes/peak_HBM)
— models a graph whose compute and HBM traffic overlap perfectly across
the WHOLE step. PWC-Net serving is a chain of segments with *different*
binding resources that cannot overlap each other:

- the finest-level estimator/context convs are MXU-bound (the op profile
  shows them at 90-95% of the 197 TFLOP/s bf16 peak individually),
- the 81-tap correlation (warp+cost-volume Pallas kernels) is VPU-bound
  (elementwise multiply + cross-channel reduction; no matmul shape fits
  — the contraction is per-pixel (1xC)@(Cx81), which starves the MXU),
- the resize/upsample/concat glue and the coarse pyramid levels are
  HBM-bound,

and the coarse-to-fine recurrence serializes them (level l+1 needs level
l's flow). The achievable step time is therefore bounded below by
``sum over segments of max(t_MXU_fill, t_HBM, t_VPU)``, not by
``max(sum, sum)``. This script builds that segment list analytically
from the architecture (reference topology: /root/reference/model.py:95-134,
modules.py:42-285) and prints both bounds next to the measured time.

Resource models per segment:
- conv segments: t_MXU = FLOPs / 197 TF/s, and t_MXU_fill additionally
  derates by MXU tile fill (N=C_out and K=9*C_in each pad to 128 lanes —
  a 3->16 conv fills 27/128 x 16/128 of every tile); t_HBM counts each
  operand/output once (perfect fusion).
- Pallas warp+CV segments: t_VPU = VPU FLOPs / an EMPIRICAL in-VMEM rate
  measured by --measure-vpu: the exact 81-window correlation inner loop
  (ops/pallas/cost_volume.py::_cv_kernel lines 55-63) run on
  constant-index VMEM blocks, i.e. zero steady-state DMA — the honest
  speed of light for this loop on this chip, not a paper number.
  Default 1.2e12 flop/s (measured on this v5e-1; loop variants —
  f32, bf16, tree reduction, tap-major stores — all land 0.9-1.2e12,
  so this is the formulation's ceiling, not a tuning artifact).
- copy/resize segments: t_HBM only.

Run on real TPU:

    python scripts/roofline_seq.py                # table + bounds
    python scripts/roofline_seq.py --measure      # + measure the real step
    python scripts/roofline_seq.py --measure-vpu  # + re-measure VPU rate
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PEAK_FLOPS = 197e12  # v5e bf16 MXU
PEAK_BW = 819e9      # v5e HBM
BYTES = 2            # bf16

FILTERS = [16, 32, 64, 96, 128, 192]
EST_FILTERS = [128, 128, 96, 64, 32]
CTX_FILTERS = [128, 128, 128, 96, 64, 32, 2]
D = 4
TAPS = (2 * D + 1) ** 2


def ru(x, m=128):
    return int(math.ceil(x / m) * m)


def conv_seg(name, b, h, w, cin, cout, h_in=None, w_in=None):
    """3x3 conv segment: FLOPs, fill-derated MXU time, HBM time."""
    h_in = h_in or h
    w_in = w_in or w
    flops = b * h * w * 9 * 2 * cin * cout
    k, n = 9 * cin, cout
    fill = (k / ru(k)) * (n / ru(n))
    bytes_ = BYTES * (b * h_in * w_in * cin + b * h * w * cout + 9 * cin * cout)
    return {
        "name": name,
        "flops": flops,
        "vpu_flops": 0,
        "bytes": bytes_,
        "t_mxu": flops / PEAK_FLOPS,
        "t_mxu_fill": flops / (PEAK_FLOPS * fill),
        "t_hbm": bytes_ / PEAK_BW,
    }


def copy_seg(name, bytes_):
    return {
        "name": name, "flops": 0, "vpu_flops": 0, "bytes": bytes_,
        "t_mxu": 0.0, "t_mxu_fill": 0.0, "t_hbm": bytes_ / PEAK_BW,
    }


def wcv_seg(name, b, h, w, c, warped, vpu_rate):
    """Warp+cost-volume Pallas segment (ops/pallas/warped_cv.py).

    VPU work: 81 windows x (mul + f32 accumulate) over C per pixel, plus
    (warped levels) the candidate-offset tent filter at the benchmark's
    near-zero-flow candidate count nv=nu=2 — real serving flows add
    candidates, so this is a LOWER bound on the warp work. Bytes: f0 +
    f1 (+1px edge pad, lane padding ignored) + flow + the 81-tap volume
    + the saved warped features (always emitted — VJP residual)."""
    cost_flops = b * h * w * TAPS * c * 2
    warp_flops = b * h * w * c * 2 * (2 * 2 + 2) * 2 if warped else 0
    vpu = cost_flops + warp_flops
    bytes_ = BYTES * b * h * w * (c + c + TAPS + (c if warped else 0)) + \
        4 * b * h * w * 2 * (1 if warped else 0)
    return {
        "name": name, "flops": 0, "vpu_flops": vpu, "bytes": bytes_,
        "t_mxu": 0.0, "t_mxu_fill": vpu / vpu_rate,
        "t_hbm": bytes_ / PEAK_BW,
    }


def build_segments(b, h, w, vpu_rate, fused_pyramid_levels=2):
    segs = []
    # input f32 -> bf16 convert (bench feeds f32 frames)
    segs.append(copy_seg("convert f32->bf16 frames",
                         b * 2 * h * w * 3 * (4 + BYTES)))
    # feature pyramid, two frames
    for frame in range(2):
        cin, hi, wi = 3, h, w
        for lvl, f in enumerate(FILTERS, start=1):
            ho, wo = hi // 2, wi // 2
            c1 = conv_seg(f"pyr{frame} L{lvl} s2 {cin}->{f}", b, ho, wo,
                          cin, f, h_in=hi, w_in=wi)
            c2 = conv_seg(f"pyr{frame} L{lvl} {f}->{f} (a)", b, ho, wo, f, f)
            c3 = conv_seg(f"pyr{frame} L{lvl} {f}->{f} (b)", b, ho, wo, f, f)
            if lvl <= fused_pyramid_levels:
                # fused kernel: one segment, intermediates stay in VMEM
                bytes_ = BYTES * (b * hi * wi * cin + b * ho * wo * f)
                flops = c1["flops"] + c2["flops"] + c3["flops"]
                t_fill = (c1["t_mxu_fill"] + c2["t_mxu_fill"]
                          + c3["t_mxu_fill"])
                segs.append({
                    "name": f"pyr{frame} L{lvl} fused x3 ({cin}->{f})",
                    "flops": flops, "vpu_flops": 0, "bytes": bytes_,
                    "t_mxu": flops / PEAK_FLOPS, "t_mxu_fill": t_fill,
                    "t_hbm": bytes_ / PEAK_BW,
                })
            else:
                segs.extend([c1, c2, c3])
            cin, hi, wi = f, ho, wo
    # coarse-to-fine estimator levels (deep -> shallow, l = 0..4)
    for l in range(5):
        p = 6 - l
        hl, wl, c = h >> p, w >> p, FILTERS[p - 1]
        segs.append(wcv_seg(
            f"l{l} {'warp+' if l else ''}cv 81tap C{c} {hl}x{wl}",
            b, hl, wl, c, warped=l > 0, vpu_rate=vpu_rate))
        cin = TAPS + c + (0 if l == 0 else 34)
        for i, f in enumerate(EST_FILTERS):
            segs.append(conv_seg(f"l{l} est conv{i} {cin}->{f}",
                                 b, hl, wl, cin, f))
            cin = f
        segs.append(conv_seg(f"l{l} flow head 32->2", b, hl, wl, 32, 2))
        if l < 4:
            # joint 34-ch mm-resize upsample x2 (flows+features)
            io = BYTES * b * hl * wl * 34 * (1 + 2 + 4)
            segs.append(copy_seg(f"l{l} joint up2 34ch", io))
    # context network at l=4
    hl, wl = h >> 2, w >> 2
    cin = 34
    for i, f in enumerate(CTX_FILTERS):
        segs.append(conv_seg(f"ctx conv{i} {cin}->{f} d{[1,2,4,8,16,1,1][i]}",
                             b, hl, wl, cin, f))
        cin = f
    # final x4 flow upsample (two-pass mm-resize) + x20 scale
    segs.append(copy_seg(
        "final up4 flow", BYTES * b * hl * wl * 2 * (1 + 4 + 16)))
    return segs


def measure_vpu_rate(iters=200):
    """Empirical in-VMEM rate of the exact correlation inner loop.

    Runs _cv_kernel's 81-window multiply+f32-accumulate (the same code
    pattern, same dtypes) on constant-index VMEM blocks — the grid
    re-executes the loop with zero steady-state DMA, so the measured
    rate is pure VPU throughput for this loop shape."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from pwcnet_tpu.utils.profiling import device_timeit

    th, c, w = 16, 32, 256  # finest-level tile shape

    def kernel(f0_ref, f1_ref, out_ref):
        f0 = f0_ref[0]
        scale = jnp.float32(1.0 / c)
        for v in range(2 * D + 1):
            stripe = f1_ref[0, pl.ds(v, th), :, :]
            for u in range(2 * D + 1):
                win = stripe[:, :, u : u + w]
                cost = jnp.sum(f0 * win, axis=1, dtype=jnp.float32) * scale
                cost = jnp.where(cost >= 0, cost, cost * jnp.float32(0.1))
                out_ref[0, :, v * (2 * D + 1) + u, :] = cost.astype(
                    out_ref.dtype)

    grid = 64

    @jax.jit
    def run(f0, f1):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, th, c, w), lambda i: (0, 0, 0, 0)),
                pl.BlockSpec((1, th + 2 * D, c, w + 2 * D),
                             lambda i: (0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, th, TAPS, w), lambda i: (0, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, th, TAPS, w), jnp.bfloat16),
        )(f0, f1)

    key = jax.random.PRNGKey(0)
    f0 = jax.random.normal(key, (1, th, c, w), jnp.bfloat16)
    f1 = jax.random.normal(key, (1, th + 2 * D, c, w + 2 * D), jnp.bfloat16)
    t = device_timeit(run, f0, f1, iters=iters)
    flops = grid * th * w * TAPS * c * 2
    return flops / t


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--height", type=int, default=448)
    parser.add_argument("--width", type=int, default=1024)
    parser.add_argument("--vpu-rate", type=float, default=1.2e12,
                        help="in-VMEM correlation rate (flop/s); default "
                        "= measured on this chip, see --measure-vpu")
    parser.add_argument("--measure-vpu", action="store_true")
    parser.add_argument("--measure", action="store_true",
                        help="also measure the real serving step "
                        "(bench.py methodology)")
    parser.add_argument("--full", action="store_true",
                        help="print every segment, not per-group sums")
    args = parser.parse_args()

    vpu_rate = args.vpu_rate
    if args.measure_vpu or args.measure:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.measure_vpu:
        vpu_rate = measure_vpu_rate()
        print(f"in-VMEM 81-tap correlation rate: {vpu_rate / 1e12:.2f} "
              f"Tflop/s (bf16 taps, f32 accumulate)")

    b, h, w = args.batch, args.height, args.width
    segs = build_segments(b, h, w, vpu_rate)
    for s in segs:
        s["bound"] = max(s["t_mxu_fill"], s["t_hbm"])
        s["res"] = ("VPU" if s["vpu_flops"] else
                    ("MXU" if s["t_mxu_fill"] >= s["t_hbm"] else "HBM"))

    def group(name):
        if name.startswith("pyr"):
            return "feature pyramid (x2 frames)"
        if "cv" in name and ("warp" in name or name.startswith("l0")):
            return "warp+cost-volume kernels"
        if "est" in name or "flow head" in name:
            return "estimator convs"
        if "up" in name:
            return "upsamples"
        if name.startswith("ctx"):
            return "context convs"
        return "glue"

    total_flops = sum(s["flops"] for s in segs)
    total_vpu = sum(s["vpu_flops"] for s in segs)
    total_bytes = sum(s["bytes"] for s in segs)
    seq_bound = sum(s["bound"] for s in segs)
    agg_bound = max(total_flops / PEAK_FLOPS, total_bytes / PEAK_BW)

    print(f"\nserving {h}x{w} b{b} bf16 — analytic segment model "
          f"({len(segs)} segments)")
    print(f"  MXU flops {total_flops / 1e9:.1f} G  VPU flops "
          f"{total_vpu / 1e9:.1f} G  bytes {total_bytes / 1e9:.2f} GB")
    if args.full:
        for s in segs:
            print(f"  {s['name']:<34} {s['bound'] * 1e3:7.3f} ms  "
                  f"[{s['res']}]  (mxu_fill {s['t_mxu_fill'] * 1e3:.3f} / "
                  f"hbm {s['t_hbm'] * 1e3:.3f})")
    groups: dict = {}
    for s in segs:
        g = groups.setdefault(group(s["name"]), [0.0, 0.0, 0.0, 0])
        g[0] += s["bound"]
        g[1] += s["t_mxu_fill"]
        g[2] += s["t_hbm"]
        g[3] += 1
    print(f"\n  {'group':<30} {'bound':>8}  {'mxu_fill':>8}  {'hbm':>8}")
    for k, (bd, mx, hb, n) in sorted(groups.items(), key=lambda kv: -kv[1][0]):
        print(f"  {k:<30} {bd * 1e3:7.2f}m  {mx * 1e3:7.2f}m  "
              f"{hb * 1e3:7.2f}m  ({n} segs)")
    print(f"\n  aggregate roofline  max(sum,sum) : {agg_bound * 1e3:7.2f} ms"
          f"  (the scripts/roofline.py model)")
    print(f"  sequential roofline sum(max)     : {seq_bound * 1e3:7.2f} ms"
          f"  (segments serialize)")

    if args.measure:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pwcnet_tpu.models import PWCDCNet
        from pwcnet_tpu.ops.pallas import (cost_volume_pallas,
                                           warped_cost_volume)
        from pwcnet_tpu.utils.profiling import device_timeit

        model = PWCDCNet(dtype=jnp.bfloat16, cost_volume_fn=cost_volume_pallas,
                         warp_cv_fn=warped_cost_volume,
                         fused_pyramid_levels=2, mm_resize=True)
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.random((b, h, w, 3)), jnp.float32)
        x1 = jnp.asarray(rng.random((b, h, w, 3)), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0, x1)

        def fwd(x0, x1):
            return model.apply(variables, x0, x1)[0]

        t = device_timeit(jax.jit(fwd), x0, x1, iters=100)
        print(f"\n  measured                         : {t * 1e3:7.2f} ms"
              f"  ({b / t:.1f} pairs/s; {seq_bound / t * 100:.1f}% of the"
              f" sequential bound, {agg_bound / t * 100:.1f}% of aggregate)")


if __name__ == "__main__":
    main()
