#!/usr/bin/env python
"""One-time dataset transcode into the raw pre-decoded cache.

Decodes every frame once and packs frames + flows into memmap-able shards
(pwcnet_tpu/data/cache.py layout); afterwards the DataLoader's cache path
serves batches as pure memory traffic — crop + flip + normalize with no
PNG/zlib work — which one host core drives far above the chip's serving
rate (the per-core PNG decode roofline is ~95 pairs/s vs the chip's ~540;
PARITY §6, VERDICT r4 #2).

    python scripts/transcode_dataset.py -d SintelClean -dd /data/sintel
    python scripts/transcode_dataset.py -d SintelClean -dd /data/sintel \
        --split val --out /fast-ssd/sintel_cache

The cache auto-invalidates when the dataset's sample list changes (the
index records the source paths); re-running the tool rebuilds it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-d", "--dataset", default="SintelClean",
                    help="Dataset name (get_dataset registry)")
    ap.add_argument("-dd", "--dataset_dir", required=True)
    ap.add_argument("--split", nargs="+", default=["train", "val"],
                    choices=["train", "val"],
                    help="Which splits to transcode [both]")
    ap.add_argument("--out", default=None,
                    help="Cache dir override (default: "
                    "<dataset_dir>/.pwcnet_cache/<Class>_<split>; with "
                    "--out, '_<split>' is appended)")
    args = ap.parse_args()

    from pwcnet_tpu.data.cache import build_cache, default_cache_dir
    from pwcnet_tpu.data.datasets import get_dataset

    cls = get_dataset(args.dataset)
    for split in args.split:
        ds = cls(split, args.dataset_dir, crop_type="none", crop_shape=None)
        out = (
            f"{args.out}_{split}" if args.out else default_cache_dir(ds)
        )
        start = time.perf_counter()
        cache_dir = build_cache(ds, out, progress=True)
        elapsed = time.perf_counter() - start
        frames = os.path.getsize(os.path.join(cache_dir, "frames.u8"))
        flows = os.path.getsize(os.path.join(cache_dir, "flows.f32"))
        print(
            json.dumps(
                {
                    "dataset": args.dataset,
                    "split": split,
                    "cache_dir": str(cache_dir),
                    "samples": len(ds.samples),
                    "frames_bytes": frames,
                    "flows_bytes": flows,
                    "transcode_sec": round(elapsed, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
