#!/usr/bin/env python
"""Spatial-sharded serving: the beyond-one-chip-HBM demonstration
(VERDICT r3 #4).

Three parts, each skipped gracefully when the hardware for it is absent:

1. **Single-chip memory wall** (real TPU): compile the unsharded f32
   forward at --height x --width b1 and print XLA's memory analysis
   (argument + output + temp bytes vs the chip's HBM). At 2048x2816 f32
   the activation working set exceeds a 16 GB v5e — the compile/run
   fails with RESOURCE_EXHAUSTED, which this script catches and records.
2. **Sharded equivalent**: when >= --spatial real devices exist, bench
   `FlowPredictor(spatial=N)` at the same shape (the real multi-chip
   number). This machine exposes ONE real chip, so by default this part
   runs on a virtual 8-device CPU mesh instead — functional execution +
   per-shard XLA memory analysis showing the ~1/N activation split
   (CPU wall-time is meaningless and not reported as a throughput).
3. **Largest-fitting single-chip frame** (real TPU): bench unsharded
   bf16 serving at the biggest multiple-of-64 frame that fits, as the
   extrapolation anchor for the sharded projection.

Usage:
    python scripts/bench_spatial.py                 # all parts
    python scripts/bench_spatial.py --height 2048 --width 2816
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _cache(jax):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _mem_report(compiled, tag):
    m = compiled.memory_analysis()
    if m is None:
        print(f"  {tag}: memory analysis unavailable")
        return None
    total = (
        m.argument_size_in_bytes
        + m.output_size_in_bytes
        + m.temp_size_in_bytes
    )
    print(
        f"  {tag}: args {m.argument_size_in_bytes / 1e9:.2f} GB + "
        f"out {m.output_size_in_bytes / 1e9:.2f} GB + "
        f"temp {m.temp_size_in_bytes / 1e9:.2f} GB = {total / 1e9:.2f} GB"
    )
    return total


def _build_fwd(dtype_name, h, w, spatial=1, data=1):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pwcnet_tpu.inference import FlowPredictor

    pred = FlowPredictor(
        dtype=jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32,
        spatial=spatial,
        data=data,
        use_pallas=jax.devices()[0].platform not in ("cpu",),
    )
    rng = np.random.default_rng(0)
    imgs = rng.random((1, h, w, 3)).astype(np.float32)
    params = pred.params_for(h, w)
    fwd = pred._jitted(h, w)
    x0 = pred._put(imgs)
    x1 = pred._put(imgs)
    return fwd, params, x0, x1


def part_unsharded_wall(h, w):
    import jax

    print(f"\n== 1. unsharded f32 {h}x{w} b1 on {jax.devices()[0].platform} ==")
    try:
        fwd, params, x0, x1 = _build_fwd("float32", h, w)
        compiled = fwd.lower(params, x0, x1).compile()
        total = _mem_report(compiled, "unsharded f32")
        out = compiled(params, x0, x1)
        float(out[0].mean())
        print("  ran OK (fits on this chip)")
        return total, True
    except Exception as e:  # RESOURCE_EXHAUSTED surfaces as XlaRuntimeError
        msg = str(e).splitlines()[0][:200]
        print(f"  FAILED: {type(e).__name__}: {msg}")
        return None, False


def part_sharded(h, w, spatial):
    import jax

    n_real = len(jax.devices())
    if n_real < spatial or jax.devices()[0].platform == "cpu":
        if "--cpu-sharded-only" not in sys.argv:
            # the TPU backend is already initialized in this process —
            # the virtual-CPU-mesh fallback needs fresh XLA_FLAGS, so
            # re-exec part 2 in a subprocess
            import subprocess

            # big frames on a starved host trip XLA:CPU's 20 s/40 s
            # collective-rendezvous watchdog (all 8 virtual devices
            # timeshare one core) — raise it; this is a functional
            # check, not a timing one
            env = dict(
                os.environ,
                JAX_PLATFORMS="cpu",
                XLA_FLAGS=(
                    "--xla_force_host_platform_device_count=8 "
                    "--xla_cpu_collective_call_warn_stuck_timeout_seconds=600 "
                    "--xla_cpu_collective_call_terminate_timeout_seconds=1800 "
                    "--xla_cpu_collective_timeout_seconds=1800"
                ),
            )
            argv = [sys.executable, os.path.abspath(__file__),
                    "--height", str(h), "--width", str(w),
                    "--spatial", str(spatial), "--cpu-sharded-only"]
            if "--no-exec" in sys.argv:
                argv.append("--no-exec")
            env["PYTHONUNBUFFERED"] = "1"
            subprocess.run(argv, env=env, check=True)
            return None
        print(
            f"\n== 2. spatial={spatial} sharded f32 {h}x{w} b1 "
            "(virtual CPU mesh — this host exposes one real chip; "
            "functional + memory split only) =="
        )
        jax.config.update("jax_platforms", "cpu")
    else:
        print(f"\n== 2. spatial={spatial} sharded f32 {h}x{w} b1 (real chips) ==")
    fwd, params, x0, x1 = _build_fwd("float32", h, w, spatial=spatial)
    compiled = fwd.lower(params, x0, x1).compile()
    total = _mem_report(compiled, f"per-shard (spatial={spatial})")
    sys.stdout.flush()
    if "--no-exec" in sys.argv:
        # per-shard memory analysis only: at wall-probe frame sizes the
        # 8-virtual-device functional dispatch needs hours of one-core
        # CPU time (the small-shape equivalence is asserted in
        # tests/test_spatial.py / test_inference.py instead)
        print("  (--no-exec: compile + memory analysis only)")
        return total
    start = time.perf_counter()
    out = compiled(params, x0, x1)
    v = float(out[0].mean())
    elapsed = time.perf_counter() - start
    import numpy as np

    assert np.isfinite(v)
    # This part is a functional + memory-split check; the single dispatch
    # timed here includes the host round-trip and is NOT a throughput
    # number on either backend (the repo's timing methodology — scan-chain
    # + fetch, CLAUDE.md / utils.profiling.device_timeit — is what part 3
    # uses). Label accordingly per backend.
    caveat = (
        "CPU time, not a TPU throughput"
        if jax.devices()[0].platform == "cpu"
        else "single-dispatch functional-check latency incl. host "
        "round-trip — not a throughput; see part 3 for timed numbers"
    )
    print(f"  ran OK, one dispatch {elapsed * 1e3:.0f} ms ({caveat})")
    return total


def part_largest_single_chip(iters):
    import jax

    if jax.devices()[0].platform == "cpu":
        print("\n== 3. skipped (no real TPU) ==")
        return
    import jax.numpy as jnp

    print("\n== 3. largest-fitting unsharded bf16 frames (real chip) ==")
    from pwcnet_tpu.utils.profiling import device_timeit

    for h, w in [(1024, 1024), (1536, 1536), (2048, 2048), (2048, 2816)]:
        try:
            fwd, params, x0, x1 = _build_fwd("bfloat16", h, w)

            def run(a, b_, p):
                return fwd(p, a, b_)[0]

            t = device_timeit(run, x0, x1, params, iters=iters)
            print(f"  {h}x{w} b1 bf16: {t * 1e3:.1f} ms/frame "
                  f"({1 / t:.1f} pairs/s)")
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(f"  {h}x{w} b1 bf16: FAILED ({type(e).__name__}: {msg})")
            break


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--height", type=int, default=2048)
    parser.add_argument("--width", type=int, default=2816)
    parser.add_argument("--spatial", type=int, default=4)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--skip-unsharded", action="store_true")
    parser.add_argument("--skip-large", action="store_true")
    parser.add_argument("--skip-sharded", action="store_true",
                        help="only the unsharded wall probe (part 1)")
    parser.add_argument("--no-exec", action="store_true",
                        help="part 2: compile + per-shard memory "
                        "analysis only (skip the one-core dispatch)")
    parser.add_argument("--cpu-sharded-only", action="store_true",
                        help="internal: run only part 2 on the virtual "
                        "CPU mesh (subprocess re-exec)")
    args = parser.parse_args()
    import jax

    _cache(jax)
    if args.cpu_sharded_only:
        # before any backend init: the sitecustomize pins
        # jax_platforms="axon,cpu", so the env var alone is not enough
        jax.config.update("jax_platforms", "cpu")
        part_sharded(args.height, args.width, args.spatial)
        return
    if not args.skip_large:
        part_largest_single_chip(args.iters)
    if not args.skip_unsharded:
        part_unsharded_wall(args.height, args.width)
    if not args.skip_sharded:
        part_sharded(args.height, args.width, args.spatial)


if __name__ == "__main__":
    main()
