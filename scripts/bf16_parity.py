#!/usr/bin/env python
"""Pixel-unit bound on bf16 serving accuracy (VERDICT r4 #4).

Every headline serving number is bf16, but the <0.05 px parity budget
(BASELINE.md) was only ever verified f32-vs-oracle. This script measures
the full-depth bf16-vs-f32 final-flow delta in PIXELS at a production
serving shape, on BOTH serving paths:

  - the XLA path (plain ops, no Pallas kernels);
  - the fused Pallas path exactly as bench.py/FlowPredictor build it
    (fused warp+cost-volume, Pallas cost volume at level 0, fused
    pyramid levels 0-1) — skipped automatically off-TPU.

Weights are variance-scaled random (std 1/sqrt(fan_in), the same
construction as the full-depth converter-parity gate) so activations and
flows are at realistic magnitudes; the f32 run on the SAME weights is the
ground truth. Prints mean/max |Δflow| px plus the f32 flow's own
magnitude stats for context, one JSON line per (path, shape).

Usage:  python scripts/bf16_parity.py [--height 448 --width 1024 --batch 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scaled_params(template, seed: int = 0):
    import jax
    import numpy as np

    rng = np.random.default_rng(seed)

    def draw(leaf):
        shape = np.shape(leaf)
        std = 1.0 / np.sqrt(np.prod(shape[:3])) if len(shape) == 4 else 0.05
        return (rng.standard_normal(shape) * std).astype(np.float32)

    return jax.tree_util.tree_map(draw, template)


def measure(path_name: str, h: int, w: int, b: int, fused: bool) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pwcnet_tpu.models import PWCDCNet

    kw = {}
    if fused:
        import functools

        from pwcnet_tpu.ops.pallas import (
            cost_volume_pallas,
            pyramid_level_fused,
            warped_cost_volume,
        )

        kw = dict(
            cost_volume_fn=cost_volume_pallas,
            warp_cv_fn=warped_cost_volume,
            pyramid_level_fn=functools.partial(
                pyramid_level_fused, banded=False
            ),
            fused_pyramid_levels=2,
        )

    model_f32 = PWCDCNet(dtype=jnp.float32, **kw)
    model_bf16 = PWCDCNet(dtype=jnp.bfloat16, **kw)

    rng = np.random.default_rng(42)
    images_0 = jnp.asarray(rng.random((b, h, w, 3)).astype(np.float32))
    images_1 = jnp.asarray(rng.random((b, h, w, 3)).astype(np.float32))

    template = jax.eval_shape(
        lambda: model_f32.init(jax.random.PRNGKey(0), images_0[:1],
                               images_1[:1])
    )["params"]
    params = jax.tree_util.tree_map(jnp.asarray, scaled_params(template))

    @jax.jit
    def fwd32(p, x0, x1):
        return model_f32.apply({"params": p}, x0, x1)[0]

    @jax.jit
    def fwd16(p, x0, x1):
        return model_bf16.apply(
            {"params": p},
            x0.astype(jnp.bfloat16),
            x1.astype(jnp.bfloat16),
        )[0].astype(jnp.float32)

    f32 = np.asarray(fwd32(params, images_0, images_1))
    f16 = np.asarray(fwd16(params, images_0, images_1))
    delta = np.abs(f32 - f16)
    mag = np.sqrt((f32**2).sum(-1))
    out = {
        "path": path_name,
        "shape": f"{h}x{w} b{b}",
        "delta_px_mean": float(delta.mean()),
        "delta_px_p99": float(np.percentile(delta, 99)),
        "delta_px_max": float(delta.max()),
        "epe_bf16_vs_f32": float(
            np.sqrt(((f32 - f16) ** 2).sum(-1)).mean()
        ),
        "f32_flow_px_mean_mag": float(mag.mean()),
        "f32_flow_px_max_mag": float(mag.max()),
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=448)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    on_tpu = jax.devices()[0].platform != "cpu"
    measure("xla", args.height, args.width, args.batch, fused=False)
    if on_tpu:
        measure("fused-pallas", args.height, args.width, args.batch,
                fused=True)
    else:
        print(
            json.dumps({"path": "fused-pallas", "skipped": "no TPU"}),
            flush=True,
        )


if __name__ == "__main__":
    main()
