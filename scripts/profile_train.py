#!/usr/bin/env python
"""Per-op device-time profile of the training step (docs/DESIGN.md).

Groups the xplane op timeline into buckets (convs, Pallas kernels,
layout copies, ...) to track where the step time goes — the tool behind
the round-2/round-3 train profiles. Run on real TPU:

    python scripts/profile_train.py [--top 30]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def _opcode(name: str) -> str:
    """The HLO opcode — the bare ` <op>(` token after the result type.
    Operand references inside the parens are %-prefixed (%copy-done.3,
    %convolution.7), so a bare token cannot come from an operand; do NOT
    substring-match the whole text (the round-2 profile's 'layout
    copies' bucket was inflated ~2.7x by exactly that)."""
    for op in (
        "custom-call", "convolution", "copy-start", "copy-done", "copy",
        "transpose", "bitcast", "fusion", "all-reduce", "all-gather",
        "collective-permute", "reduce-scatter", "concatenate",
        "dynamic-update-slice", "dynamic-slice", "slice", "pad",
        "reshape", "broadcast", "reduce", "select", "add", "multiply",
        "tuple", "get-tuple-element", "parameter", "iota", "convert",
    ):
        if f" {op}(" in name:
            return op
    return "?"


def bucket(name: str) -> str:
    op = _opcode(name)
    if op == "custom-call":
        return "pallas kernels"
    if op in ("copy", "copy-start", "copy-done", "transpose", "bitcast"):
        return "layout copies"
    if op in ("all-reduce", "all-gather", "collective-permute",
              "reduce-scatter"):
        return "collectives"
    if op == "convolution" or (
        op == "fusion" and "%convolution" in name
    ):
        return "convs (+fused elementwise)"
    if op == "fusion":
        return "fusions (elementwise/reduce/copy)"
    return f"other ({op})" if op != "?" else "other"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--top", type=int, default=30)
    parser.add_argument("--infer", action="store_true",
                        help="profile the inference forward instead of "
                        "the train step (defaults switch to 448x1024 b8)")
    parser.add_argument("--height", type=int, default=None)
    parser.add_argument("--width", type=int, default=None)
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument(
        "--fused-estimator", type=int, default=0,
        help="fused_estimator_levels (0 = XLA estimator chain — the "
        "measured-faster default)",
    )
    parser.add_argument("--mm-resize", type=int, default=1, choices=[0, 1])
    parser.add_argument("--batched-pyramid", type=int, default=0,
                        choices=[0, 1])
    parser.add_argument("--pad-to", type=int, default=None,
                        help="paper-anchor mode: edge-pad H to this "
                        "inside the profiled graph (e.g. 448 with "
                        "--height 436)")
    args = parser.parse_args()
    if args.infer:
        args.height = args.height or 448
        args.width = args.width or 1024
        args.batch = args.batch or 8
    else:
        args.height = args.height or 384
        args.width = args.width or 448
        args.batch = args.batch or 4

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from pwcnet_tpu.models import PWCDCNet
    from pwcnet_tpu.ops.pallas import cost_volume_pallas, warped_cost_volume
    from pwcnet_tpu.train_lib import create_train_state, make_train_step
    from pwcnet_tpu.utils.profiling import op_profile

    model = PWCDCNet(
        dtype=jnp.bfloat16,
        cost_volume_fn=cost_volume_pallas,
        warp_cv_fn=warped_cost_volume,
        fused_pyramid_levels=2,
        fused_estimator_levels=args.fused_estimator,
        mm_resize=bool(args.mm_resize),
        batched_pyramid=bool(args.batched_pyramid),
    )
    rng = np.random.default_rng(0)
    b, h, w = args.batch, args.height, args.width
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 64, 64, 3), learning_rate=1e-4
    )
    step = make_train_step(model, donate=False)
    images = jnp.asarray(rng.random((b, 2, h, w, 3)).astype(np.float32))
    flows = jnp.asarray(rng.standard_normal((b, h, w, 2)).astype(np.float32))

    if args.infer:
        params = state.params

        if args.pad_to is not None:
            pad = ((0, 0), (0, args.pad_to - h), (0, 0), (0, 0))

            def infer(imgs):
                x0 = jnp.pad(imgs[:, 0], pad, mode="edge")
                x1 = jnp.pad(imgs[:, 1], pad, mode="edge")
                return model.apply({"params": params}, x0, x1)[0][:, :h]

        else:

            def infer(imgs):
                return model.apply(
                    {"params": params}, imgs[:, 0], imgs[:, 1]
                )[0]

        rows = op_profile(infer, images, iters=3)
    else:
        rows = op_profile(lambda s: step(s, images, flows), state, iters=3)
    total = sum(r["ms_per_iter"] for r in rows)
    groups: dict = {}
    for r in rows:
        groups.setdefault(bucket(r["name"]), [0.0, 0])
        groups[bucket(r["name"])][0] += r["ms_per_iter"]
        groups[bucket(r["name"])][1] += r["count"]
    what = "inference fwd" if args.infer else "train step"
    print(f"{what} {h}x{w} b{b} bf16 — sync op total {total:.2f} ms")
    for k, (ms, cnt) in sorted(groups.items(), key=lambda kv: -kv[1][0]):
        print(f"  {k:<28} {ms:7.2f} ms  ({cnt} events)")
    print(f"\ntop {args.top} ops:")
    for r in rows[: args.top]:
        print(f"  {r['ms_per_iter']:7.3f} ms  x{r['count']:<4} {r['name'][:90]}")


if __name__ == "__main__":
    main()
