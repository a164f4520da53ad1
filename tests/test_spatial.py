"""Spatially-sharded cost volume (shard_map + ppermute halo exchange)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwcnet_tpu.ops import cost_volume
from pwcnet_tpu.parallel import batch_sharding, make_mesh, make_spatial_cost_volume


def _shard(x, mesh, spatial_dim):
    return jax.device_put(x, batch_sharding(mesh, spatial_dim=spatial_dim))


class TestSpatialCostVolume:
    @pytest.mark.parametrize("use_pallas", [False, True])
    @pytest.mark.parametrize("layout", [(2, 4), (1, 8), (4, 2)])
    def test_matches_unsharded(self, rng, use_pallas, layout):
        data, spatial = layout
        mesh = make_mesh(data=data, spatial=spatial)
        cv_fn = make_spatial_cost_volume(
            mesh, use_pallas=use_pallas, interpret=use_pallas
        )
        b, h, w, c = 4, 16, 8, 6
        d = 2
        f0 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
        f1 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))

        want = np.asarray(cost_volume(f0, f1, d))
        got = np.asarray(
            jax.jit(lambda a, b_: cv_fn(a, b_, d))(
                _shard(f0, mesh, 1), _shard(f1, mesh, 1)
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_gradients_cross_halo_boundaries(self, rng, use_pallas):
        """d(cv)/d(f1) has halo contributions that must route back over
        the ppermute transpose to the neighbor shard."""
        mesh = make_mesh(data=2, spatial=4)
        cv_fn = make_spatial_cost_volume(
            mesh, use_pallas=use_pallas, interpret=use_pallas
        )
        b, h, w, c = 2, 16, 8, 3
        d = 2
        f0 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
        f1 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
        g = jnp.asarray(
            rng.standard_normal((b, h, w, (2 * d + 1) ** 2)).astype(np.float32)
        )

        def loss_ref(a, b_):
            return jnp.sum(cost_volume(a, b_, d) * g)

        def loss_sh(a, b_):
            return jnp.sum(cv_fn(a, b_, d) * g)

        gr0, gr1 = jax.grad(loss_ref, argnums=(0, 1))(f0, f1)
        gs0, gs1 = jax.jit(jax.grad(loss_sh, argnums=(0, 1)))(
            _shard(f0, mesh, 1), _shard(f1, mesh, 1)
        )
        np.testing.assert_allclose(
            np.asarray(gs0), np.asarray(gr0), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(gs1), np.asarray(gr1), rtol=1e-4, atol=1e-5
        )

    @pytest.mark.slow
    def test_full_model_with_spatial_pallas_cv(self, rng):
        """PWCDCNet forward with the sharded cv == replicated forward."""
        from pwcnet_tpu.models import PWCDCNet

        mesh = make_mesh(data=2, spatial=4)
        cv_fn = make_spatial_cost_volume(mesh, use_pallas=True, interpret=True)
        imgs0 = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
        imgs1 = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))

        ref_model = PWCDCNet(num_levels=3, output_level=1, search_range=2)
        variables = ref_model.init(jax.random.PRNGKey(0), imgs0, imgs1)
        want, _ = ref_model.apply(variables, imgs0, imgs1)

        sh_model = PWCDCNet(
            num_levels=3, output_level=1, search_range=2, cost_volume_fn=cv_fn
        )
        fwd = jax.jit(lambda v, a, b_: sh_model.apply(v, a, b_)[0])
        got = fwd(
            variables, _shard(imgs0, mesh, 1), _shard(imgs1, mesh, 1)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )
