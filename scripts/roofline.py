#!/usr/bin/env python
"""Post-fusion roofline statement (VERDICT r3 #5).

Computes, for the CURRENT fused graphs (Pallas warp+CV, fused pyramid
levels, analytic weight decay):

- XLA cost analysis of the compiled executable: total FLOPs and HBM
  bytes accessed (post-fusion — each fusion's operands/outputs counted
  once, which is the HBM-traffic model for a fused graph; Pallas
  custom-calls are counted at operand+output size, matching their
  actual DMA traffic since every kernel streams its operands exactly
  once);
- the two roofline times at v5e peaks (bf16 MXU 197 TFLOP/s, HBM
  819 GB/s) and the bound they imply;
- the measured time (scan-chained, fetch-synced — bench.py
  methodology) and the achieved fraction of the binding roofline.

Run on real TPU:

    python scripts/roofline.py            # train b8 + inference b8
    python scripts/roofline.py --train    # train step only
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# v5e per-chip peaks (public spec: 197 bf16 TFLOP/s, 819 GB/s HBM BW)
PEAK_FLOPS = 197e12
PEAK_BW = 819e9


def _cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _analyze(compiled):
    a = compiled.cost_analysis()
    if isinstance(a, list):
        a = a[0]
    return float(a.get("flops", 0.0)), float(a.get("bytes accessed", 0.0))


def _report(name, pairs, flops, bytes_, measured_s):
    t_mxu = flops / PEAK_FLOPS
    t_hbm = bytes_ / PEAK_BW
    bound = "HBM" if t_hbm > t_mxu else "MXU"
    roof = max(t_hbm, t_mxu)
    print(f"\n== {name} ==")
    print(f"  flops            : {flops / 1e9:10.1f} GFLOP/batch "
          f"({flops / pairs / 1e9:.1f} GFLOP/pair)")
    print(f"  HBM bytes        : {bytes_ / 1e9:10.2f} GB/batch "
          f"({bytes_ / pairs / 1e6:.0f} MB/pair)")
    print(f"  t_MXU (197 TF/s) : {t_mxu * 1e3:10.2f} ms")
    print(f"  t_HBM (819 GB/s) : {t_hbm * 1e3:10.2f} ms")
    print(f"  binding roofline : {bound} -> {roof * 1e3:.2f} ms/batch")
    print(f"  measured         : {measured_s * 1e3:10.2f} ms/batch "
          f"({pairs / measured_s:.1f} pairs/s)")
    print(f"  achieved         : {roof / measured_s * 100:5.1f}% of the "
          f"{bound} roofline "
          f"({bytes_ / measured_s / 1e9:.0f} GB/s, "
          f"{flops / measured_s / 1e12:.1f} TFLOP/s)")


def bench_train(b, h, w, iters):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pwcnet_tpu.models import PWCDCNet
    from pwcnet_tpu.ops.pallas import cost_volume_pallas, warped_cost_volume
    from pwcnet_tpu.train_lib import create_train_state, make_train_step

    model = PWCDCNet(
        dtype=jnp.bfloat16,
        cost_volume_fn=cost_volume_pallas,
        warp_cv_fn=warped_cost_volume,
        fused_pyramid_levels=2,
    )
    rng = np.random.default_rng(0)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 64, 64, 3), learning_rate=1e-4
    )
    step = make_train_step(model, donate=False)
    images = jnp.asarray(rng.random((b, 2, h, w, 3)).astype(np.float32))
    flows = jnp.asarray(rng.standard_normal((b, h, w, 2)).astype(np.float32))

    # make_train_step returns a jitted fn — lower it directly
    compiled = step.lower(state, images, flows).compile()
    flops, bytes_ = _analyze(compiled)

    s, m = step(state, images, flows)
    float(m["loss"])  # compile + warm
    start = time.perf_counter()
    for _ in range(iters):
        s, m = step(s, images, flows)
    assert np.isfinite(float(m["loss"]))
    measured = (time.perf_counter() - start) / iters
    _report(f"train step {h}x{w} b{b} bf16", b, flops, bytes_, measured)


def bench_infer(b, h, w, iters):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from pwcnet_tpu.models import PWCDCNet
    from pwcnet_tpu.ops.pallas import cost_volume_pallas, warped_cost_volume

    model = PWCDCNet(
        dtype=jnp.bfloat16,
        cost_volume_fn=cost_volume_pallas,
        warp_cv_fn=warped_cost_volume,
        fused_pyramid_levels=2,
        mm_resize=True,  # serving-path default (round 5)
    )
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    images_0 = jnp.asarray(rng.random((b, h, w, 3)), dtype)
    images_1 = jnp.asarray(rng.random((b, h, w, 3)), dtype)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images_0, images_1)

    def fwd(variables, x0, x1):
        return model.apply(variables, x0, x1)[0]

    compiled = jax.jit(fwd).lower(variables, images_0, images_1).compile()
    flops, bytes_ = _analyze(compiled)

    @jax.jit
    def run(variables, x0, x1):
        def body(carry, _):
            out = fwd(variables, x0 + carry, x1)
            return (out.mean() * 1e-12).astype(dtype), ()

        carry, _ = lax.scan(body, jnp.zeros((), dtype), None, length=iters)
        return carry

    float(run(variables, images_0, images_1))
    start = time.perf_counter()
    assert np.isfinite(float(run(variables, images_0, images_1)))
    measured = (time.perf_counter() - start) / iters
    _report(f"inference {h}x{w} b{b} bf16", b, flops, bytes_, measured)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--infer", action="store_true")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=100)
    args = parser.parse_args()
    _cache()
    if args.train or not args.infer:
        bench_train(args.batch, 384, 448, args.iters)
    if args.infer or not args.train:
        bench_infer(args.batch, 448, 1024, args.iters)


if __name__ == "__main__":
    main()
