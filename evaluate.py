#!/usr/bin/env python
"""Dataset evaluation CLI: average EPE over a dataset split.

The reference only surfaces EPE as a TensorBoard scalar during training
(train.py:77,105); this CLI evaluates a checkpoint's end-point error over
any registered dataset split directly.

Example:
    python evaluate.py -d SintelClean -dd datasets/Sintel --split val \
        -r model/model_100.msgpack
"""

import argparse
import os


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-d", "--dataset", type=str, default="SintelClean")
    parser.add_argument("-dd", "--dataset_dir", type=str, required=True)
    parser.add_argument("--split", choices=["train", "val"], default="val")
    parser.add_argument("-b", "--batch_size", type=int, default=4)
    parser.add_argument("-r", "--resume", type=str, default=None,
                        help="Checkpoint (msgpack or TF .ckpt) [None]")
    parser.add_argument("--crop_type", type=str, default="center",
                        help="Crop for uniform eval shapes [center]")
    parser.add_argument("--crop_shape", nargs=2, type=int,
                        default=[384, 448])
    parser.add_argument("--num_levels", type=int, default=6)
    parser.add_argument("--search_range", type=int, default=4)
    parser.add_argument("--output_level", type=int, default=4)
    parser.add_argument("--platform", type=str, default=None)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import numpy as np

    from pwcnet_tpu import losses
    from pwcnet_tpu.data import DataLoader, get_dataset
    from pwcnet_tpu.inference import FlowPredictor

    dset = get_dataset(args.dataset)(
        train_or_val=args.split,
        dataset_dir=args.dataset_dir,
        crop_type=args.crop_type,
        crop_shape=args.crop_shape,
    )
    loader = DataLoader(
        dset, batch_size=args.batch_size, shuffle=False, drop_last=False
    )
    predictor = FlowPredictor(
        checkpoint=args.resume,
        num_levels=args.num_levels,
        search_range=args.search_range,
        output_level=args.output_level,
    )

    total_epe, n = 0.0, 0
    for images, flows_gt in loader:
        import jax.numpy as jnp

        batch = jnp.asarray(images)
        flow_final, _ = predictor.raw_forward(batch)
        epe = float(
            losses.epe(jnp.asarray(flows_gt), flow_final)
        )
        b = images.shape[0]
        total_epe += epe * b
        n += b
    print(f"{args.dataset}/{args.split}: mean EPE over {n} samples = "
          f"{total_epe / max(n, 1):.4f} px")


if __name__ == "__main__":
    main()
