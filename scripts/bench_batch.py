#!/usr/bin/env python
"""Batch-scaling study on one chip (PARITY.md §6 / README serving note).

Measures inference (448x1024) and train-step (384x448) throughput across
batch sizes to locate the dispatch/HBM knee — per docs/DESIGN.md's M-fill
analysis, batch is the main MFU lever for this small-channel CNN.

Run:  python scripts/bench_batch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from pwcnet_tpu.models import PWCDCNet
    from pwcnet_tpu.ops.pallas import cost_volume_pallas, warped_cost_volume

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    model = PWCDCNet(
        dtype=dtype,
        cost_volume_fn=cost_volume_pallas,
        warp_cv_fn=warped_cost_volume,
        fused_pyramid_levels=2,
    )

    print("inference 448x1024 bf16 (fused kernels), K=100 scan-chained:")
    h, w, K = 448, 1024, 100
    for b in (1, 2, 4, 8, 16):
        images_0 = jnp.asarray(rng.random((b, h, w, 3)), dtype)
        images_1 = jnp.asarray(rng.random((b, h, w, 3)), dtype)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), images_0, images_1
        )

        @jax.jit
        def run(variables, images_0, images_1):
            def body(carry, _):
                out = model.apply(variables, images_0 + carry, images_1)[0]
                return (out.mean() * 1e-12).astype(dtype), ()

            carry, _ = lax.scan(body, jnp.zeros((), dtype), None, length=K)
            return carry

        float(run(variables, images_0, images_1))  # compile + warm
        start = time.perf_counter()
        float(run(variables, images_0, images_1))
        dt = time.perf_counter() - start
        print(
            f"  b{b:<3} {K * b / dt:8.1f} pairs/s/chip   "
            f"({dt / K * 1e3:6.2f} ms/batch)"
        )

    print("train step 384x448 bf16 (fwd+bwd+adam), K=100 chained:")
    from pwcnet_tpu.train_lib import create_train_state, make_train_step

    h, w = 384, 448
    for b in (2, 4, 8, 16):
        state = create_train_state(
            model, jax.random.PRNGKey(0), (1, 64, 64, 3), learning_rate=1e-4
        )
        step = make_train_step(model, donate=False)
        images = jnp.asarray(rng.random((b, 2, h, w, 3)).astype(np.float32))
        flows = jnp.asarray(
            rng.standard_normal((b, h, w, 2)).astype(np.float32)
        )
        s, m = step(state, images, flows)
        float(m["loss"])
        start = time.perf_counter()
        for _ in range(K):
            s, m = step(s, images, flows)
        float(m["loss"])
        dt = time.perf_counter() - start
        print(
            f"  b{b:<3} {K * b / dt:8.1f} pairs/s/chip   "
            f"({dt / K * 1e3:6.2f} ms/step)"
        )


if __name__ == "__main__":
    main()
