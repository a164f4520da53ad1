#!/usr/bin/env python
"""Micro-benchmarks for the Pallas cost-volume kernels on real TPU.

Times the windowed (HBM-streaming) kernel shapes from PARITY.md §6 —
forward and fwd+bwd — against the XLA shift-op formulation. Used to
record the effect of the double-buffered window DMAs (round 3).

The XLA fwd+bwd comparison autodiffs the 81-slice formulation, whose
transpose is a dynamic_update_slice scatter loop that can take tens of
minutes to COMPILE at the 1024x1024 shape — pass --xla-bwd to include
it; by default only the XLA forward is compared there.

Run:  python scripts/bench_kernels.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--xla", action="store_true",
                        help="Also time the XLA formulation (slow "
                        "compiles — the fwd+bwd autodiff transpose is a "
                        "scatter loop; round-2 XLA numbers are recorded "
                        "in PARITY.md §6)")
    parser.add_argument("--db", choices=["auto", "0", "1"], default="auto",
                        help="Backward-kernel DMA double-buffering: "
                        "auto (the _bwd_db per-dtype policy), 0 = serial "
                        "single-slot, 1 = overlapped two-slot "
                        "(same-session A/B)")
    args = parser.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from pwcnet_tpu.ops.cost_volume import cost_volume
    from pwcnet_tpu.ops.pallas import cost_volume_pallas
    from pwcnet_tpu.ops.pallas import cost_volume as cvp
    from pwcnet_tpu.utils.profiling import device_timeit

    if args.db != "auto":
        cvp._bwd_db = lambda itemsize, _v=args.db == "1": _v

    rng = np.random.default_rng(0)
    d = 4
    shapes = [
        ("sharded L4 b4 112x256", (4, 112, 256, 32)),
        ("L4 of 1024x1024 b1", (1, 256, 256, 32)),
    ]
    print(f"devices: {jax.devices()}  iters={args.iters}", flush=True)
    for label, (b, h, w, c) in shapes:
        for dtype in (jnp.float32, jnp.bfloat16):
            dt = jnp.dtype(dtype)
            mode_f, _ = cvp._plan_fwd(h, w, c, d, dt.itemsize)
            mode_b0, _ = cvp._plan_bwd(
                h, w, c, d, dt.itemsize, None, cvp._df0_vmem_bytes
            )
            mode_b1, _ = cvp._plan_bwd(
                h, w, c, d, dt.itemsize, None, cvp._df1_vmem_bytes
            )
            f0 = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
            f1 = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
            g = jnp.asarray(
                rng.standard_normal((b, h, w, (2 * d + 1) ** 2)), dtype
            )
            tag = (
                f"{label} {dt.name} [fwd={mode_f},df0={mode_b0},"
                f"df1={mode_b1},db={int(cvp._bwd_db(dt.itemsize))}]"
            )

            t = device_timeit(
                lambda a: cost_volume_pallas(a, f1, d), f0, iters=args.iters
            )
            print(f"{tag}: fwd pallas {t * 1e3:6.2f} ms", flush=True)
            if args.xla:
                t = device_timeit(
                    lambda a: cost_volume(a, f1, d), f0, iters=args.iters
                )
                print(f"{tag}: fwd xla    {t * 1e3:6.2f} ms", flush=True)

            def bwd_of(fn):
                def run(a):
                    def loss(a_, b_):
                        return jnp.sum(
                            fn(a_, b_, d).astype(jnp.float32)
                            * g.astype(jnp.float32)
                        )

                    return jax.grad(loss, argnums=(0, 1))(a, f1)

                return run

            t = device_timeit(
                bwd_of(cost_volume_pallas), f0, iters=args.iters
            )
            print(f"{tag}: fwd+bwd pallas {t * 1e3:6.2f} ms", flush=True)
            if args.xla:
                t = device_timeit(
                    bwd_of(cost_volume), f0, iters=args.iters
                )
                print(f"{tag}: fwd+bwd xla    {t * 1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
