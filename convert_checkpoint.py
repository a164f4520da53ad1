#!/usr/bin/env python
"""Convert a reference TF checkpoint to a pwcnet_tpu msgpack params file.

Reads the TF bundle format directly (no TensorFlow dependency), validates
every tensor against the PWCDCNet parameter tree, and writes a params-only
msgpack loadable by all CLIs via --resume.

Example:
    python convert_checkpoint.py model_1000epochs/model_600.ckpt out.msgpack
"""

import argparse


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("tf_checkpoint",
                        help="TF checkpoint prefix (or .index path)")
    parser.add_argument("output", help="Output .msgpack path")
    parser.add_argument("--num_levels", type=int, default=6)
    parser.add_argument("--search_range", type=int, default=4)
    parser.add_argument("--use-dc", dest="use_dc", action="store_true")
    parser.set_defaults(use_dc=False)
    parser.add_argument("--output_level", type=int, default=4)
    parser.add_argument("--check-only", action="store_true",
                        help="Only validate the name/shape tree from the "
                        ".index (works without the .data shards)")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pwcnet_tpu.models import PWCDCNet
    from pwcnet_tpu.train_lib import save_params
    from pwcnet_tpu.train_lib.tf_converter import (
        load_tf_checkpoint_params,
        read_index_entries,
        tf_name_to_path,
    )

    if args.check_only:
        index = args.tf_checkpoint
        if not index.endswith(".index"):
            index += ".index"
        entries = read_index_entries(index)
        model_vars = {
            n: e for n, e in entries.items() if tf_name_to_path(n)
        }
        print(f"{len(entries)} entries, {len(model_vars)} model tensors:")
        for name in sorted(model_vars):
            print(f"  {name}  {model_vars[name].shape}")
        return

    factor = 2**args.num_levels
    model = PWCDCNet(
        num_levels=args.num_levels,
        search_range=args.search_range,
        use_dc=args.use_dc,
        output_level=args.output_level,
    )
    dummy = jnp.zeros((1, factor, factor, 3), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), dummy, dummy)["params"]
    params = load_tf_checkpoint_params(args.tf_checkpoint, template)
    save_params(args.output, params)
    n = len(jax.tree_util.tree_leaves(params))
    print(f"Converted {n} tensors -> {args.output}")


if __name__ == "__main__":
    main()
