#!/usr/bin/env python
"""Bisect the algebraic-simplifier circular-loop warning in the multichip
dryrun (VERDICT r4 #3).

MULTICHIP_r04.json's tail shows two

    algebraic_simplifier.cc:10121 ... circular simplification loop and ran
    for 50 runs on computation main.89_spmd

errors, new in round 4. This script compiles the SAME (data x spatial)
train step under feature toggles to isolate which graph component makes
XLA's algebraic simplifier cycle. Run one variant per process (the error
is emitted on stderr during compilation):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bisect_algsimp.py --variant full

Variants:
  full        round-4 dryrun graph (expected: 2 errors)
  nopins      drop the replicated with_sharding_constraint pins
  noguard     drop the tiny-level spatial-unshard guard
  nofusedpyr  fused_pyramid_levels=0 (keep shard_map cv/warp-cv)
  noshardmap  drop every shard_map wrapper (GSPMD-only spatial)
  dataonly    8x1 mesh (no spatial axis)
  levels3     full wiring at num_levels=3/output_level=1 (small graph)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_and_compile(variant: str) -> None:
    import jax
    import numpy as np

    n_devices = 8
    from pwcnet_tpu.models import PWCDCNet
    from pwcnet_tpu.parallel import (
        batch_sharding,
        make_mesh,
        make_spatial_cost_volume,
        make_spatial_guard,
        make_spatial_pyramid_level,
        make_spatial_warped_cv,
        replicate,
    )
    from pwcnet_tpu.train_lib import create_train_state, make_train_step

    devices = jax.devices()[:n_devices]
    spatial = 1 if variant == "dataonly" else 2
    mesh = make_mesh(devices, data=n_devices // spatial, spatial=spatial)

    cv_fn = warp_cv_fn = plevel_fn = guard_fn = None
    fused_levels = 0
    if spatial > 1 and variant != "noshardmap":
        only = variant.startswith("only")
        if variant != "nocv" and (not only or variant == "onlycv"):
            cv_fn = make_spatial_cost_volume(mesh, use_pallas=True)
        if variant != "nowarpcv" and (not only or variant == "onlywarpcv"):
            warp_cv_fn = make_spatial_warped_cv(mesh, use_pallas=True)
        if variant != "nofusedpyr" and (
            not only or variant == "onlyplevel"
        ):
            plevel_fn = make_spatial_pyramid_level(mesh)
            fused_levels = 2
        if variant != "noguard" and not only:
            guard_fn = make_spatial_guard(mesh)

    kw = {}
    if variant == "levels3":
        kw = dict(num_levels=3, output_level=1, search_range=2)
    model = PWCDCNet(
        cost_volume_fn=cv_fn,
        warp_cv_fn=warp_cv_fn,
        pyramid_level_fn=plevel_fn,
        spatial_guard_fn=guard_fn,
        fused_pyramid_levels=fused_levels,
        **kw,
    )
    h = w = 64
    batch = mesh.shape["data"]

    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, h, w, 3), learning_rate=1e-4
    )
    state = replicate(state, mesh)
    step_mesh = None if variant == "nopins" else mesh
    step = make_train_step(model, donate=False, mesh=step_mesh)

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.random((batch, 2, h, w, 3)).astype(np.float32),
        batch_sharding(mesh, spatial_dim=2),
    )
    flows = jax.device_put(
        rng.standard_normal((batch, h, w, 2)).astype(np.float32),
        batch_sharding(mesh, spatial_dim=1),
    )
    lowered = step.lower(state, images, flows)
    lowered.compile()  # the simplifier runs here; errors land on stderr
    print(f"variant={variant}: compiled ok", flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="full")
    p.add_argument(
        "--dump", default=None, help="xla_dump_to dir (set via XLA_FLAGS)"
    )
    args = p.parse_args()

    # Must run on the virtual CPU mesh; honor env like __graft_entry__.
    import jax

    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms and "axon" not in env_platforms:
        jax.config.update("jax_platforms", env_platforms)
    if len(jax.devices()) < 8:
        print("need 8 devices (set XLA_FLAGS/JAX_PLATFORMS)", file=sys.stderr)
        sys.exit(2)
    build_and_compile(args.variant)


if __name__ == "__main__":
    main()
