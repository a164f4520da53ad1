#!/usr/bin/env python
"""Same-process A/B of the banded vs row-loop pyramid kernels, end-to-end.

Runs bench.py's inference and train measurements twice in ONE process
(banded=1 then banded=0) so the comparison is immune to the 5-8%
cross-session noise this relay shows (CLAUDE.md). Prints bench.py's JSON
lines tagged with the configuration.

Run:  python scripts/bench_banded_ab.py [--iters 100]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--skip-train", action="store_true")
    args_ab = parser.parse_args()

    base = dict(
        height=None,
        width=None,
        batch=None,
        iters=args_ab.iters,
        dtype="bfloat16",
        pallas=True,
        fused=True,
        fused_pyramid=2,
        fused_estimator=0,
    )
    for banded in (1, 0):
        for mode in (["infer"] if args_ab.skip_train else ["infer", "train"]):
            args = argparse.Namespace(**base, banded=banded)
            print(f"--- banded={banded} {mode} ---", flush=True)
            if mode == "infer":
                args.batch = 4
                bench.bench_infer(args, 448, 1024)
                args.batch = 8
                bench.bench_infer(args, 448, 1024)
            else:
                args.batch = 4
                bench.bench_train(args, 384, 448)
                args.batch = 8
                bench.bench_train(args, 384, 448)


if __name__ == "__main__":
    main()
