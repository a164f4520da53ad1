#!/usr/bin/env python
"""Headline benchmark: PWCDCNet inference throughput on one chip.

Measures the jitted forward at the BASELINE.json shape (448x1024 pairs)
and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "image_pairs_per_sec_per_chip",
     "vs_baseline": N}

Methodology: K forwards are chained inside a single jitted lax.scan (the
carry feeds the next input, so XLA cannot elide or overlap iterations) and
the timing includes fetching the scalar result — on remote-tunneled TPU
runtimes `block_until_ready` alone does not reliably synchronize, and
repeated identical dispatches can be memoized. One warmup run excludes
compilation; the host round-trip is amortized over K iterations.

``vs_baseline`` is measured throughput / 35.0 — the PWC-Net paper's ~35 fps
at 1024x436 on a Titan X Pascal (arXiv:1709.02371), the only recorded
external anchor (the reference repo publishes no numbers; see BASELINE.md).
The BASELINE.json target (>=5x the TF1 GPU baseline) therefore means
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
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--dtype", choices=["float32", "bfloat16"],
                        default="bfloat16")
    parser.add_argument("--no-pallas", dest="pallas", action="store_false",
                        help="Disable the fused Pallas cost-volume kernel")
    parser.set_defaults(pallas=True)
    parser.add_argument("--no-fused", dest="fused", action="store_false",
                        help="Disable the fused warp+cost-volume kernel "
                        "(fall back to XLA warp + Pallas cost volume)")
    parser.set_defaults(fused=True)
    parser.add_argument("--fused-pyramid", type=int, default=2,
                        help="Compute the N finest pyramid levels with "
                        "the fused Pallas conv kernels (fwd + the "
                        "gz-chain backward)")
    parser.add_argument("--train", action="store_true",
                        help="Benchmark the full training step (fwd+bwd+"
                        "Adam) at 384x448 instead of inference")
    args = parser.parse_args()
    if args.train and args.height == 448 and args.width == 1024:
        args.height, args.width = 384, 448

    import jax
    import jax.numpy as jnp
    from jax import lax

    from pwcnet_tpu.models import PWCDCNet

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cv_fn = warp_cv_fn = None
    if args.pallas and jax.devices()[0].platform != "cpu":
        from pwcnet_tpu.ops.pallas import cost_volume_pallas, warped_cost_volume

        cv_fn = cost_volume_pallas
        if args.fused:
            warp_cv_fn = warped_cost_volume
    model = PWCDCNet(
        dtype=dtype,
        cost_volume_fn=cv_fn,
        warp_cv_fn=warp_cv_fn,
        fused_pyramid_levels=(
            args.fused_pyramid
            if jax.devices()[0].platform != "cpu"
            else 0
        ),
    )

    rng = np.random.default_rng(0)
    b, h, w = args.batch, args.height, args.width
    K = args.iters

    if args.train:
        from pwcnet_tpu.train_lib import create_train_state, make_train_step

        state = create_train_state(
            model, jax.random.PRNGKey(0), (1, 64, 64, 3), learning_rate=1e-4
        )
        step = make_train_step(model, donate=False)
        images = jnp.asarray(rng.random((b, 2, h, w, 3)).astype(np.float32))
        flows = jnp.asarray(
            rng.standard_normal((b, h, w, 2)).astype(np.float32)
        )
        s, m = step(state, images, flows)
        float(m["loss"])  # compile + warm
        start = time.perf_counter()
        for _ in range(K):  # steps chain through the state carry
            s, m = step(s, images, flows)
        final = float(m["loss"])  # fetch = sync
        elapsed = time.perf_counter() - start
        assert np.isfinite(final)
        pairs_per_sec = K * b / elapsed
        print(
            json.dumps(
                {
                    "metric": (
                        f"PWCDCNet {h}x{w} b{b} {args.dtype} train step "
                        "throughput (fwd+bwd+adam, pallas kernels)"
                    ),
                    "value": round(pairs_per_sec, 3),
                    "unit": "image_pairs_per_sec_per_chip",
                    "vs_baseline": round(pairs_per_sec / 35.0, 3),
                }
            )
        )
        return

    images_0 = jnp.asarray(rng.random((b, h, w, 3)), dtype)
    images_1 = jnp.asarray(rng.random((b, h, w, 3)), dtype)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images_0, images_1)

    @jax.jit
    def run(variables, images_0, images_1):
        def body(carry, _):
            out = model.apply(variables, images_0 + carry, images_1)[0]
            return (out.mean() * 1e-12).astype(dtype), ()

        carry, _ = lax.scan(body, jnp.zeros((), dtype), None, length=K)
        return carry

    float(run(variables, images_0, images_1))  # compile + warm
    start = time.perf_counter()
    result = float(run(variables, images_0, images_1))  # fetch = sync
    elapsed = time.perf_counter() - start
    assert np.isfinite(result)

    pairs_per_sec = K * b / elapsed
    print(
        json.dumps(
            {
                "metric": (
                    f"PWCDCNet {h}x{w} b{b} {args.dtype} inference "
                    "throughput ("
                    + (
                        "fused pallas warp+cost volume"
                        if warp_cv_fn
                        else ("pallas" if cv_fn else "xla") + " cost volume"
                    )
                    + ")"
                ),
                "value": round(pairs_per_sec, 3),
                "unit": "image_pairs_per_sec_per_chip",
                "vs_baseline": round(pairs_per_sec / 35.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
