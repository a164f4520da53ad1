#!/usr/bin/env python
"""Micro-benchmarks for the fused pyramid-level Pallas kernels on TPU.

A/B of the row-loop kernel (per-output-row matmuls), the banded kernel
(one matmul per conv per H-tile; rows batched into the lane dim), and
the XLA 3-conv chain, at the real serving shapes (448x1024 b8 bf16,
levels 0 and 1) — plus a compiled-parity check of the banded kernel vs
XLA on the chip (interpret-mode parity is covered by the test suite;
this checks the Mosaic lowering). Reference op: the pyramid extractor's
per-level conv chain, /root/reference/modules.py:42-71.

Run:  python scripts/bench_pyramid.py [--iters 100] [--f32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--f32", action="store_true")
    parser.add_argument("--batch", type=int, default=8)
    args = parser.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import functools

    import jax.numpy as jnp
    import numpy as np

    from pwcnet_tpu.ops.pallas import pyramid_conv as pcp
    from pwcnet_tpu.utils.profiling import device_timeit

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    itemsize = jnp.dtype(dtype).itemsize
    rng = np.random.default_rng(0)
    b = args.batch
    shapes = [
        ("L0 448x1024", (b, 448, 1024, 3), 16),
        ("L1 224x512", (b, 224, 512, 16), 32),
    ]
    print(f"devices: {jax.devices()}  iters={args.iters} dtype={dtype.__name__}",
          flush=True)

    def params_for(cin, c):
        def t(*shape):
            v = rng.standard_normal(shape).astype(np.float32)
            v /= np.sqrt(9.0 * shape[2]) if len(shape) == 4 else 10.0
            return jnp.asarray(v, dtype)

        return (t(3, 3, cin, c), t(c), t(3, 3, c, c), t(c),
                t(3, 3, c, c), t(c))

    for label, shape, c in shapes:
        cin = shape[-1]
        x = jnp.asarray(rng.standard_normal(shape), dtype)
        p = params_for(cin, c)
        th = pcp._pick_tile(shape[1], shape[2], cin, c, itemsize)
        tb = pcp._pick_tile_banded(shape, c, itemsize)
        print(f"{label} cin={cin} c={c}: row-loop tile={th} banded tile={tb}",
              flush=True)

        want = np.asarray(
            jax.jit(pcp._xla_level)(x, *p), dtype=np.float32
        )
        if tb is not None:
            got = np.asarray(
                jax.jit(functools.partial(
                    pcp._plevel_forward_banded, th=tb, interpret=False
                ))(x, *p),
                dtype=np.float32,
            )
            err = np.max(np.abs(got - want))
            print(f"  banded-vs-XLA max|err| = {err:.3e} "
                  f"({'OK' if err < 0.05 else 'MISMATCH'})", flush=True)

        t = device_timeit(lambda a: pcp._xla_level(a, *p), x,
                          iters=args.iters)
        print(f"  xla      fwd {t * 1e3:6.3f} ms", flush=True)
        if th is not None:
            t = device_timeit(
                lambda a: pcp._plevel_forward(
                    a, *p, th=th, interpret=False
                ), x, iters=args.iters,
            )
            print(f"  row-loop fwd {t * 1e3:6.3f} ms", flush=True)
        if tb is not None:
            t = device_timeit(
                lambda a: pcp._plevel_forward_banded(
                    a, *p, th=tb, interpret=False
                ), x, iters=args.iters,
            )
            print(f"  banded   fwd {t * 1e3:6.3f} ms", flush=True)

        # fwd+bwd A/B through the real dispatch (monkeypatched planners)
        tbb = pcp._pick_tile_bwd_banded(shape, c, itemsize)
        print(f"  bwd tiles: banded={tbb}", flush=True)

        def grad_fn(a):
            def loss(a, *pp):
                return jnp.sum(
                    pcp.pyramid_level_fused(a, *pp) ** 2
                ).astype(jnp.float32)

            return jax.grad(loss, argnums=tuple(range(7)))(a, *p)

        orig_banded = pcp._pick_tile_banded
        try:
            pcp._pick_tile_banded = lambda *a, **k: None  # row-loop path
            t = device_timeit(grad_fn, x, iters=args.iters)
            print(f"  row-loop f+b {t * 1e3:6.3f} ms", flush=True)
        finally:
            pcp._pick_tile_banded = orig_banded
        if tb is not None and tbb is not None:
            t = device_timeit(grad_fn, x, iters=args.iters)
            print(f"  banded   f+b {t * 1e3:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
