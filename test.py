#!/usr/bin/env python
"""Single-pair inference CLI (+ latency benchmark) — reference test.py.

Runs PWCDCNet on one image pair: crops to a multiple of 64, loads a
checkpoint (msgpack from this framework, or a TF .ckpt via the converter),
renders the flow pyramid to ./test_figure/, and with --time reports the
mean jitted-forward latency (device-synchronized, compile excluded).

Example:
    python test.py --input_images a.png b.png -r model/model_100.msgpack
    python test.py --input_images a.png b.png -t
"""

import argparse
import os
import re
import time


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input_images", type=str, nargs=2, required=True,
                        help="Target images (required)")
    parser.add_argument("-r", "--resume", type=str, default=None,
                        help="Learned parameter checkpoint file [None]")
    parser.add_argument("--time", "-t", action="store_true",
                        help="Measure inference speed")
    parser.add_argument("--iters", type=int, default=1000,
                        help="# of timing iterations [1000]")
    parser.add_argument("--save_flow", type=str, default=None,
                        help="Also write the final flow as a .flo file")
    parser.add_argument("--num_levels", type=int, default=6,
                        help="# of levels for feature extraction [6]")
    parser.add_argument("--search_range", type=int, default=4,
                        help="Search range for cost-volume calculation [4]")
    parser.add_argument("--warp_type", choices=["bilinear", "nearest"],
                        default="bilinear",
                        help="Warping layer (must match training)")
    parser.add_argument("--use-dc", dest="use_dc", action="store_true")
    parser.add_argument("--no-dc", dest="use_dc", action="store_false")
    parser.set_defaults(use_dc=False)
    parser.add_argument("--output_level", type=int, default=4,
                        help="Final output level for estimated flow [4]")
    parser.add_argument("--size_handling", choices=["crop", "pad"],
                        default="crop",
                        help="Non-multiple-of-64 frames: 'crop' (reference "
                        "behavior) or 'pad' (keep all pixels) [crop]")
    parser.add_argument("--platform", type=str, default=None,
                        help="Force a JAX platform (tpu/cpu) [auto]")
    parser.add_argument("--dtype", choices=["float32", "bfloat16"],
                        default="float32",
                        help="Model compute dtype — bfloat16 is the "
                        "fast serving path on TPU [float32]")
    parser.add_argument("--spatial", type=int, default=1,
                        help="Shard the frame's H axis over N devices "
                        "(multi-chip serving for frames whose activations "
                        "exceed one chip's HBM) [1]")
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

    import jax.numpy as jnp
    import numpy as np

    from pwcnet_tpu.inference import FlowPredictor, factor_crop, load_image
    from pwcnet_tpu.utils import save_flow as write_flo
    from pwcnet_tpu.utils import vis_flow_pyramid

    predictor = FlowPredictor(
        checkpoint=args.resume,
        num_levels=args.num_levels,
        search_range=args.search_range,
        warp_type=args.warp_type,
        use_dc=args.use_dc,
        output_level=args.output_level,
        size_handling=args.size_handling,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        spatial=args.spatial,
    )
    img0 = load_image(args.input_images[0])
    img1 = load_image(args.input_images[1])

    flow_final, pyramid_px, images = predictor(img0, img1)

    if args.time:
        batch = jnp.asarray(
            np.stack(
                [
                    factor_crop(img0, predictor.crop_factor),
                    factor_crop(img1, predictor.crop_factor),
                ]
            )[None].astype(np.float32)
            / 255.0
        )
        # scan-chained, fetch-synced timing (block_until_ready alone is
        # unreliable on tunneled TPU runtimes; see utils/profiling.py)
        from pwcnet_tpu.utils.profiling import device_timeit

        h, w = batch.shape[2], batch.shape[3]
        params = predictor.params_for(h, w)

        def fwd(images, params):
            return predictor.model.apply(
                {"params": params}, images[:, 0], images[:, 1]
            )[0]

        time_iter = device_timeit(fwd, batch, params, iters=args.iters)
        print(
            f"Inference time: {time_iter} sec "
            f"(averaged over {args.iters} iterations)"
        )

    os.makedirs("./test_figure", exist_ok=True)
    fname = "_".join(re.split("[/.]", args.input_images[0])[-3:-1])
    vis_flow_pyramid(
        pyramid_px,
        images=images,
        filename=f"./test_figure/test_{fname}.pdf",
    )
    if args.save_flow:
        write_flo(args.save_flow, flow_final)
    print("Figure saved")


if __name__ == "__main__":
    main()
