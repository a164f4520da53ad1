#!/usr/bin/env python
"""Host input-pipeline throughput: Sintel-layout PNG (and PPM) decode +
crop/flip + batch assembly, native C++ vs PIL.

The serving-side question (VERDICT r3 #3): can the host feed the chip for
the dataset the model is actually trained on? Sintel is PNG on disk; until
round 4 the native path refused PNG and the PIL path capped the host at
~260 pairs/s vs the chip's ~537 pairs/s serving rate.

Writes a synthetic dataset in the given layout (default: Sintel-size
1024x436 frames), then times full DataLoader epochs (decode -> augment ->
normalized float32 batches). Prints one JSON line per configuration.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_sintel(root: Path, n_pairs: int, hw, fmt: str = "png"):
    """Sintel on-disk layout with one scene of n_pairs+1 frames."""
    from PIL import Image

    from pwcnet_tpu.utils import save_flow

    h, w = hw
    img_dir = root / "training" / "clean" / "scene"
    flo_dir = root / "training" / "flow" / "scene"
    img_dir.mkdir(parents=True)
    flo_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    # natural-image-like content (smooth + texture) so PNG compression
    # ratios are realistic rather than incompressible noise
    base = rng.random((h // 8 + 1, w // 8 + 1, 3))
    base = np.kron(base, np.ones((8, 8, 1)))[:h, :w]
    noise = rng.random((h, w, 3)) * 0.1
    for i in range(n_pairs + 1):
        frame = np.roll(base, shift=3 * i, axis=1) * 0.9 + noise
        arr = (frame * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"frame_{i + 1:04d}.{fmt}")
        if i < n_pairs:
            flow = rng.standard_normal((h, w, 2)).astype(np.float32) * 4
            save_flow(flo_dir / f"frame_{i + 1:04d}.flo", flow)


def bench(loader, epochs: int, label: str, batch: int,
          image_dtype=np.float32):
    # warm epoch (thread pools, page cache)
    n = 0
    for _ in loader:
        n += 1
    # best-of-epochs: this shared 1-core host shows 2-3x steal-time
    # spikes between identical epochs; the best epoch is the machine's
    # actual capability (standard min-of-N noise rejection)
    best = 0.0
    for _ in range(epochs):
        start = time.perf_counter()
        for images, flows in loader:
            assert images.dtype == image_dtype
        best = max(best, n * batch / (time.perf_counter() - start))
    print(
        json.dumps(
            {
                "metric": f"host pipeline {label}",
                "value": round(best, 1),
                "unit": "image_pairs_per_sec",
            }
        ),
        flush=True,
    )
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=436)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--crop", type=int, nargs=2, default=[384, 448])
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--fmt", choices=["png", "ppm"], default="png")
    ap.add_argument("--paths", choices=["all", "both", "native", "pil",
                                        "cache"],
                    default="all",
                    help="'both' = native+pil (pre-round-5 behavior); "
                    "'all' adds the pre-decoded raw-cache path")
    args = ap.parse_args()

    from pwcnet_tpu.data import DataLoader
    from pwcnet_tpu.data.datasets import SintelClean

    tmp = Path(tempfile.mkdtemp(prefix="bench_host_"))
    try:
        make_sintel(
            tmp, args.pairs, (args.height, args.width), fmt=args.fmt
        )
        if args.fmt == "ppm":
            # SintelClean scans *.png; rename-scan via FlyingChairs-style
            # is unnecessary — the scanner only needs matching frames
            raise SystemExit("ppm layout: use the FlyingChairs bench "
                             "(PARITY §6 row) — this script is the "
                             "Sintel/PNG feed measurement")
        ds = SintelClean(
            "train",
            tmp,
            crop_type="random",
            crop_shape=tuple(args.crop),
            random_flip=True,
        )
        size = f"{args.height}x{args.width}->{args.crop[0]}x{args.crop[1]}"
        results = {}
        if args.paths in ("all", "cache"):
            # one-time transcode (reported, not part of the steady-state
            # number), then batches assemble straight from the memmaps
            from pwcnet_tpu.data.cache import build_cache

            t0 = time.perf_counter()
            build_cache(ds)
            print(
                json.dumps(
                    {
                        "metric": "one-time transcode",
                        "value": round(time.perf_counter() - t0, 2),
                        "unit": "sec",
                    }
                ),
                flush=True,
            )
            cached = DataLoader(
                ds,
                batch_size=args.batch,
                shuffle=True,
                num_workers=args.workers,
                use_cache=True,
            )
            results["cache"] = bench(
                cached, args.epochs,
                f"Sintel raw-cache {size} native C++", args.batch,
            )
            # device-normalize feed: images stay uint8 on the host (the
            # /255 runs on-chip via device_prefetch) — 4x fewer host
            # image bytes, the recommended TPU feed
            cached_u8 = DataLoader(
                ds,
                batch_size=args.batch,
                shuffle=True,
                num_workers=args.workers,
                use_cache=True,
                normalize="device",
            )
            results["cache_u8"] = bench(
                cached_u8, args.epochs,
                f"Sintel raw-cache {size} u8 device-normalize feed",
                args.batch, image_dtype=np.uint8,
            )
        if args.paths in ("all", "both", "native"):
            fast = DataLoader(
                ds,
                batch_size=args.batch,
                shuffle=True,
                num_workers=args.workers,
                use_native=True,
                use_cache=False,  # measure decode, not the cache built above
            )
            results["native"] = bench(
                fast, args.epochs, f"Sintel PNG {size} native C++",
                args.batch,
            )
        if args.paths in ("all", "both", "pil"):
            slow = DataLoader(
                ds,
                batch_size=args.batch,
                shuffle=True,
                num_workers=args.workers,
                use_native=False,
                use_cache=False,
            )
            results["pil"] = bench(
                slow, args.epochs, f"Sintel PNG {size} PIL", args.batch
            )
        for a, b in (("native", "pil"), ("cache", "native")):
            if a in results and b in results:
                print(
                    json.dumps(
                        {
                            "metric": f"{a}/{b} speedup",
                            "value": round(results[a] / results[b], 2),
                            "unit": "x",
                        }
                    )
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
