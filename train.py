#!/usr/bin/env python
"""Training CLI — flag-compatible with the reference's train.py.

Differences from the reference surface (documented; see SURVEY.md §5):
- no interactive GPU-picker prompt (train.py:242); accelerator selection is
  automatic (TPU if present) with an optional --platform override;
- checkpoints are full-state msgpack files (params + Adam state + step), so
  --resume continues the LR schedule exactly;
- extra flags: --flip (datahandler-style random flip augmentation), --seed,
  --log_interval, --spatial (shard H over the mesh for very large crops).

Example:
    python train.py -d SintelClean -dd datasets/Sintel
    python train.py -d Synthetic -dd . -e 2 -b 4 --crop_type none
"""

import argparse
import os


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-d", "--dataset", type=str, default="SintelClean",
                        help="Target dataset [SintelClean]")
    parser.add_argument("-dd", "--dataset_dir", type=str, required=True,
                        help="Directory containing target dataset")
    parser.add_argument("-e", "--num_epochs", type=int, default=100,
                        help="# of epochs [100]")
    parser.add_argument("-b", "--batch_size", type=int, default=4,
                        help="Batch size [4]")
    parser.add_argument("-nw", "--num_workers", type=int, default=2,
                        help="# of workers for data loading [2]")

    parser.add_argument("--crop_type", type=str, default="random",
                        help="Crop type for raw data [random]")
    parser.add_argument("--crop_shape", nargs=2, type=int,
                        default=[384, 448],
                        help="Crop shape for raw data [384, 448]")
    parser.add_argument("--resize_shape", nargs=2, type=int, default=None,
                        help="Resize shape for raw data [None]")
    parser.add_argument("--resize_scale", type=float, default=None,
                        help="Resize scale for raw data [None]")
    parser.add_argument("--flip", dest="random_flip", action="store_true",
                        help="Enable random flip augmentation [disabled]")
    parser.set_defaults(random_flip=False)

    parser.add_argument("--num_levels", type=int, default=6,
                        help="# of levels for feature extraction [6]")
    parser.add_argument("--search_range", type=int, default=4,
                        help="Search range for cost-volume calculation [4]")
    parser.add_argument("--warp_type", default="bilinear",
                        choices=["bilinear", "nearest"],
                        help="Warping protocol, [bilinear] or nearest")
    parser.add_argument("--use-dc", dest="use_dc", action="store_true",
                        help="Enable dense connection in optical flow "
                        "estimator, [disabled] as default")
    parser.add_argument("--no-dc", dest="use_dc", action="store_false",
                        help="Disable dense connection in optical flow "
                        "estimator, [disabled] as default")
    parser.set_defaults(use_dc=False)
    parser.add_argument("--output_level", type=int, default=4,
                        help="Final output level for estimated flow [4]")

    parser.add_argument("--loss", default="multiscale",
                        choices=["multiscale", "robust"],
                        help="Loss function choice in [multiscale/robust]")
    parser.add_argument("--lr", type=float, default=1e-4,
                        help="Learning rate [1e-4]")
    parser.add_argument("--lr_scheduling", dest="lr_scheduling",
                        action="store_true",
                        help="Enable learning rate scheduling [enabled]")
    parser.add_argument("--no-lr_scheduling", dest="lr_scheduling",
                        action="store_false",
                        help="Disable learning rate scheduling [enabled]")
    parser.set_defaults(lr_scheduling=True)
    parser.add_argument("--weights", nargs="+", type=float,
                        default=[0.32, 0.08, 0.02, 0.01, 0.005],
                        help="Weights for each pyramid loss")
    parser.add_argument("--gamma", type=float, default=0.0004,
                        help="Coefficient for weight decay [4e-4]")
    parser.add_argument("--epsilon", type=float, default=0.02,
                        help="Small constant for robust loss [0.02]")
    parser.add_argument("--q", type=float, default=0.4,
                        help="Tolerance constant for outlier flow [0.4]")

    parser.add_argument("-v", "--visualize", dest="visualize",
                        action="store_true",
                        help="Enable estimated flow visualization [enabled]")
    parser.add_argument("--no-visualize", dest="visualize",
                        action="store_false",
                        help="Disable estimated flow visualization [enabled]")
    parser.set_defaults(visualize=True)
    parser.add_argument("-r", "--resume", type=str, default=None,
                        help="Learned parameter checkpoint file [None]")
    parser.add_argument("--ckpt_backend", choices=["msgpack", "orbax"],
                        default="msgpack",
                        help="Checkpoint format: single-file msgpack or "
                        "orbax directory (sharded/async-capable) [msgpack]")

    parser.add_argument("--seed", type=int, default=0, help="PRNG seed [0]")
    parser.add_argument("--log_interval", type=int, default=1000,
                        help="Train-metric logging interval in steps [1000]")
    parser.add_argument("--platform", type=str, default=None,
                        help="Force a JAX platform (tpu/cpu) [auto]")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="Multi-host: coordinator address host:port "
                        "for jax.distributed.initialize. On TPU pods "
                        "where the cluster is auto-detectable, pass "
                        "'auto' instead. [None = single process]")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="Multi-host: total process count "
                        "(with --coordinator host:port)")
    parser.add_argument("--process_id", type=int, default=None,
                        help="Multi-host: this process's index "
                        "(with --coordinator host:port)")
    parser.add_argument("--spatial", type=int, default=1,
                        help="Mesh size of the spatial (H) axis [1]")
    parser.add_argument("--dtype", choices=["float32", "bfloat16"],
                        default="float32",
                        help="Compute dtype (params stay float32) "
                        "[float32]")
    parser.add_argument("--remat", action="store_true",
                        help="Rematerialize activations in the backward "
                        "(bigger crops/batches per chip) [disabled]")
    parser.add_argument("--pallas", dest="pallas", action="store_true",
                        help="Use the fused Pallas cost-volume kernel "
                        "(TPU only)")
    parser.add_argument("--no-pallas", dest="pallas", action="store_false")
    parser.set_defaults(pallas=None)  # auto: on for TPU, off for CPU
    parser.add_argument("--no-fused", dest="fused", action="store_false",
                        help="Disable the fused warp+cost-volume kernel "
                        "(on by default with --pallas and bilinear warp)")
    parser.set_defaults(fused=True)
    parser.add_argument("--fused-estimator", dest="fused_estimator",
                        type=int, default=0,
                        help="Run the N finest estimator levels through "
                        "the fused Pallas 6-conv chain kernel [0: off — "
                        "measured slower than the XLA convs at the "
                        "default train shape; see docs/DESIGN.md]")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    for key, item in vars(args).items():
        print(f"{key} : {item}")

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        # a sitecustomize may have pinned jax_platforms already
        jax.config.update("jax_platforms", args.platform)

    if args.coordinator:
        # multi-host bring-up: must run before any backend initialization.
        # DCN/ICI collectives are then inserted by XLA over the global
        # mesh; the data loader takes this process's 1/num_processes slice
        # (SURVEY.md §5 distributed-communication row).
        import jax

        if args.coordinator == "auto":
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        print(
            f"distributed: process {jax.process_index()}/"
            f"{jax.process_count()}, {len(jax.devices())} global devices"
        )

    from pwcnet_tpu.train_lib.trainer import Trainer

    if args.pallas is None:
        import jax

        args.pallas = jax.devices()[0].platform not in ("cpu",)
    trainer = Trainer(args, spatial=args.spatial)
    trainer.train()
    return trainer


if __name__ == "__main__":
    main()
