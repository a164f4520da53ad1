#!/usr/bin/env python
"""Generate a synthetic PNG frame sequence for sequence-throughput
benchmarking (``test_continuous.py --time``).

Frames are a textured random field rigidly translating 2-3 px/frame —
enough structure that the network does real work, with a known motion
for sanity-checking the predicted flow's sign/scale by eye.

Run:  python scripts/make_bench_frames.py -o /tmp/bench_frames -n 65
      python test_continuous.py -i '/tmp/bench_frames/*.png' --time \
          --dtype bfloat16
"""

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--out_dir", default="/tmp/bench_frames")
    parser.add_argument("-n", "--num_frames", type=int, default=65,
                        help="frame count (pairs = n-1) [65]")
    parser.add_argument("--height", type=int, default=448)
    parser.add_argument("--width", type=int, default=1024)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from PIL import Image

    rng = np.random.default_rng(args.seed)
    h, w = args.height, args.width
    # 4x4-block texture so the pyramid's coarse levels see structure too
    base = np.kron(
        rng.random((h // 4 + 2, w // 4 + 2, 3)), np.ones((4, 4, 1))
    )
    base = (base[: h + 8, : w + 8] * 255).astype(np.uint8)

    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(args.num_frames):
        frame = np.roll(base, shift=(-2 * i, -3 * i), axis=(0, 1))[:h, :w]
        Image.fromarray(frame).save(
            os.path.join(args.out_dir, f"frame_{i:04d}.png")
        )
    print(f"{args.num_frames} frames ({h}x{w}) -> {args.out_dir}")


if __name__ == "__main__":
    main()
