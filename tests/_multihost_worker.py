"""Worker for tests/test_multihost.py: train a tiny PWCDCNet for a few
steps, single- or multi-process, and dump the final params from process 0.

Usage: python _multihost_worker.py <pid> <nprocs> <port> <outfile> [spatial]
Each process gets 2 virtual CPU devices; the global batch (8 samples of
the deterministic Synthetic dataset, shuffle off) is identical across
configurations up to within-batch order, so the mean-gradient updates
must match between 1-process and 2-process runs — and between DP-only
and (data x spatial) meshes: with ``spatial=2`` the images' H axis is
sharded over a 'spatial' mesh axis and the cost volume runs through the
explicit shard_map halo-exchange path (parallel/spatial.py), composing
shard_map with the multi-process DCN gradient psum.
"""

import os
import sys


def main():
    pid, n, port, outfile = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    spatial = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    os.environ["JAX_PLATFORMS"] = "cpu"
    # fresh flags: the parent pytest env pins an 8-device count
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if n > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=n,
            process_id=pid,
        )
    import numpy as np
    from flax import serialization

    from pwcnet_tpu.data import DataLoader, get_dataset
    from pwcnet_tpu.models import PWCDCNet
    from pwcnet_tpu.parallel import batch_sharding, make_mesh, put_global
    from pwcnet_tpu.train_lib import create_train_state, make_train_step

    assert jax.process_count() == n
    cv_fn = guard_fn = None
    mesh = make_mesh(
        jax.devices(),
        data=len(jax.devices()) // spatial,
        spatial=spatial,
    )
    if spatial > 1:
        from pwcnet_tpu.parallel import make_spatial_cost_volume, make_spatial_guard

        cv_fn = make_spatial_cost_volume(mesh, use_pallas=False)
        guard_fn = make_spatial_guard(mesh)
    model = PWCDCNet(
        num_levels=3, output_level=1, search_range=2, cost_volume_fn=cv_fn,
        spatial_guard_fn=guard_fn,
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 16, 16, 3), learning_rate=1e-3
    )
    img_sharding = batch_sharding(mesh, 2 if spatial > 1 else None)
    flo_sharding = batch_sharding(mesh, 1 if spatial > 1 else None)
    dset = get_dataset("Synthetic")(
        train_or_val="train",
        dataset_dir=".",
        num_samples=8,
        image_shape=(16, 16),
    )
    loader = DataLoader(
        dset,
        batch_size=8 // n,
        shuffle=False,
        drop_last=True,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    step = make_train_step(model, donate=False, mesh=mesh)
    for _ in range(2):  # two epochs over the same global batch
        for images, flows in loader:
            state, metrics = step(
                state,
                put_global(images, img_sharding),
                put_global(flows, flo_sharding),
            )
    assert np.isfinite(float(metrics["loss"]))
    if jax.process_index() == 0:
        params = jax.device_get(state.params)
        with open(outfile, "wb") as f:
            f.write(serialization.to_bytes(params))
        print(f"worker {pid}/{n}: wrote {outfile}", flush=True)


if __name__ == "__main__":
    main()
