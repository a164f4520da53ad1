#!/usr/bin/env python
"""Headline benchmark: PWCDCNet inference throughput on one chip.

Measures jitted forward passes at the BASELINE.json shape (448x1024 image
pairs) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "image_pairs_per_sec_per_chip",
     "vs_baseline": N}

``vs_baseline`` is measured throughput / 35.0 — the PWC-Net paper's ~35 fps
at 1024x436 on a Titan X Pascal (arXiv:1709.02371), the only recorded
external anchor (the reference repo publishes no numbers; BASELINE.md).
The target from BASELINE.json is >=5x the TF1 GPU baseline, i.e.
vs_baseline >= ~5.
"""

import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--height", type=int, default=448)
    parser.add_argument("--width", type=int, default=1024)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--dtype", choices=["float32", "bfloat16"],
                        default="bfloat16")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from pwcnet_tpu.models import PWCDCNet

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = PWCDCNet(dtype=dtype)
    rng = np.random.default_rng(0)
    h, w, b = args.height, args.width, args.batch
    images_0 = jnp.asarray(rng.random((b, h, w, 3)), dtype)
    images_1 = jnp.asarray(rng.random((b, h, w, 3)), dtype)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images_0, images_1)

    @jax.jit
    def forward(v, a, bb):
        return model.apply(v, a, bb)[0]

    out = forward(variables, images_0, images_1)
    out.block_until_ready()
    for _ in range(args.warmup):
        out = forward(variables, images_0, images_1)
    out.block_until_ready()

    start = time.perf_counter()
    for _ in range(args.iters):
        out = forward(variables, images_0, images_1)
    out.block_until_ready()
    elapsed = time.perf_counter() - start

    pairs_per_sec = args.iters * b / elapsed
    print(
        json.dumps(
            {
                "metric": (
                    f"PWCDCNet {h}x{w} b{b} {args.dtype} inference "
                    "throughput"
                ),
                "value": round(pairs_per_sec, 3),
                "unit": "image_pairs_per_sec_per_chip",
                "vs_baseline": round(pairs_per_sec / 35.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
