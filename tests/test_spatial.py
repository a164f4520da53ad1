"""Spatially-sharded cost volume (shard_map + ppermute halo exchange)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwcnet_tpu.ops import cost_volume
from pwcnet_tpu.ops.warp import bilinear_warp
from pwcnet_tpu.parallel import (
    batch_sharding,
    make_mesh,
    make_spatial_cost_volume,
    make_spatial_warped_cv,
)


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

class TestSpatialWarpedCV:
    """Fused warp+cost-volume under H-sharding (VERDICT r2 #1): the
    sharded shard_map path must match the unsharded composed reference
    bit-for-bit in value AND gradient, including flows that reach across
    shard boundaries (the warp's reach is flow-dependent, hence the
    all_gather of f1)."""

    def _inputs(self, rng, b=4, h=16, w=8, c=6, d=2, fscale=5.0):
        f0 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
        f1 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
        # flows large enough to cross several 4-row shards vertically
        flow = jnp.asarray(
            (rng.standard_normal((b, h, w, 2)) * fscale).astype(np.float32)
        )
        return f0, f1, flow

    @pytest.mark.parametrize("use_pallas", [False, True])
    @pytest.mark.parametrize("layout", [(2, 4), (1, 8), (4, 2)])
    def test_matches_unsharded(self, rng, use_pallas, layout):
        data, spatial = layout
        mesh = make_mesh(data=data, spatial=spatial)
        wcv_fn = make_spatial_warped_cv(
            mesh, use_pallas=use_pallas, interpret=use_pallas
        )
        d = 2
        f0, f1, flow = self._inputs(rng, d=d)

        want = np.asarray(cost_volume(f0, bilinear_warp(f1, flow), d))
        got = np.asarray(
            jax.jit(lambda a, b_, fl: wcv_fn(a, b_, fl, d))(
                _shard(f0, mesh, 1), _shard(f1, mesh, 1), _shard(flow, mesh, 1)
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("fscale", [0.8, 9.0])
    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_gradients_cross_shards(self, rng, use_pallas, fscale):
        """d/d(f1) scatters into whatever shard the flow pointed at (the
        all_gather transpose reduce-scatters it back); d/d(flow) halo
        rows route over the ppermute transpose."""
        mesh = make_mesh(data=2, spatial=4)
        wcv_fn = make_spatial_warped_cv(
            mesh, use_pallas=use_pallas, interpret=use_pallas
        )
        d = 2
        f0, f1, flow = self._inputs(rng, b=2, c=3, d=d, fscale=fscale)
        g = jnp.asarray(
            rng.standard_normal(
                (2, 16, 8, (2 * d + 1) ** 2)
            ).astype(np.float32)
        )

        def loss_ref(a, b_, fl):
            return jnp.sum(cost_volume(a, bilinear_warp(b_, fl), d) * g)

        def loss_sh(a, b_, fl):
            return jnp.sum(wcv_fn(a, b_, fl, d) * g)

        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(f0, f1, flow)
        gs = jax.jit(jax.grad(loss_sh, argnums=(0, 1, 2)))(
            _shard(f0, mesh, 1), _shard(f1, mesh, 1), _shard(flow, mesh, 1)
        )
        for name, a, b_ in zip(("df0", "df1", "dflow"), gs, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4,
                err_msg=name,
            )

    def test_bf16_inputs(self, rng):
        """Model-dtype (bf16) activations: the wrapper must cast flow to
        f32 BEFORE folding in the global row offset (offset + flow in
        bf16 would destroy the fractional part)."""
        mesh = make_mesh(data=2, spatial=4)
        wcv_fn = make_spatial_warped_cv(mesh, use_pallas=True, interpret=True)
        d = 2
        f0, f1, flow = self._inputs(rng, b=2, c=3, d=d)
        f0, f1, flow = (
            f0.astype(jnp.bfloat16),
            f1.astype(jnp.bfloat16),
            flow.astype(jnp.bfloat16),
        )
        want = np.asarray(
            cost_volume(f0, bilinear_warp(f1, flow.astype(jnp.float32)), d),
            np.float32,
        )
        got = np.asarray(
            jax.jit(lambda a, b_, fl: wcv_fn(a, b_, fl, d))(
                _shard(f0, mesh, 1), _shard(f1, mesh, 1),
                _shard(flow, mesh, 1),
            ),
            np.float32,
        )
        np.testing.assert_allclose(got, want, rtol=0.1, atol=0.1)

    def test_indivisible_height_falls_back(self, rng):
        """Levels whose H does not divide the spatial axis (e.g. 7 rows
        at 1/64 of 448) take the GSPMD-partitionable XLA path."""
        mesh = make_mesh(data=2, spatial=4)
        wcv_fn = make_spatial_warped_cv(mesh, use_pallas=True, interpret=True)
        d = 2
        f0 = jnp.asarray(rng.standard_normal((2, 7, 8, 3)).astype(np.float32))
        f1 = jnp.asarray(rng.standard_normal((2, 7, 8, 3)).astype(np.float32))
        flow = jnp.asarray(
            rng.standard_normal((2, 7, 8, 2)).astype(np.float32)
        )
        want = np.asarray(cost_volume(f0, bilinear_warp(f1, flow), d))
        got = np.asarray(jax.jit(lambda *a: wcv_fn(*a, d))(f0, f1, flow))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.slow
    def test_full_model_spatial_fused_matches_replicated(self, rng):
        """PWCDCNet with BOTH sharded fused kernels (cv at level 0 and
        warp+cv at finer levels) == the plain replicated model."""
        from pwcnet_tpu.models import PWCDCNet

        mesh = make_mesh(data=2, spatial=4)
        cv_fn = make_spatial_cost_volume(mesh, use_pallas=True, interpret=True)
        wcv_fn = make_spatial_warped_cv(mesh, use_pallas=True, interpret=True)
        imgs0 = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
        imgs1 = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))

        ref_model = PWCDCNet(num_levels=3, output_level=1, search_range=2)
        variables = ref_model.init(jax.random.PRNGKey(0), imgs0, imgs1)
        want, _ = ref_model.apply(variables, imgs0, imgs1)

        sh_model = PWCDCNet(
            num_levels=3,
            output_level=1,
            search_range=2,
            cost_volume_fn=cv_fn,
            warp_cv_fn=wcv_fn,
        )
        fwd = jax.jit(lambda v, a, b_: sh_model.apply(v, a, b_)[0])
        got = fwd(
            variables, _shard(imgs0, mesh, 1), _shard(imgs1, mesh, 1)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )


class TestSpatialPyramidLevel:
    """Fused 3-conv pyramid level under H-sharding: halo recompute for
    interior boundaries + XLA strip patches at the global edges must
    reproduce the unsharded chain exactly, in value and gradient."""

    def _setup(self, rng, h=48, w=16, cin=3, c=16, b=2):
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))
        ks = []
        for ci, co in [(cin, c), (c, c), (c, c)]:
            ks.append(
                jnp.asarray(
                    (rng.standard_normal((3, 3, ci, co)) * 0.3).astype(
                        np.float32
                    )
                )
            )
            ks.append(
                jnp.asarray(
                    (rng.standard_normal((co,)) * 0.1).astype(np.float32)
                )
            )
        return x, ks

    @pytest.mark.parametrize("layout", [(2, 4), (4, 2)])
    def test_matches_unsharded(self, rng, layout):
        from pwcnet_tpu.ops.pallas.pyramid_conv import _xla_level
        from pwcnet_tpu.parallel import make_spatial_pyramid_level

        data, spatial = layout
        mesh = make_mesh(data=data, spatial=spatial)
        plevel = make_spatial_pyramid_level(mesh, interpret=True)
        x, ks = self._setup(rng, b=data)
        want = np.asarray(_xla_level(x, *ks))
        got = np.asarray(
            jax.jit(lambda x_, *k: plevel(x_, *k))(_shard(x, mesh, 1), *ks)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_gradients_match_unsharded(self, rng):
        from pwcnet_tpu.ops.pallas.pyramid_conv import _xla_level
        from pwcnet_tpu.parallel import make_spatial_pyramid_level

        mesh = make_mesh(data=2, spatial=4)
        plevel = make_spatial_pyramid_level(mesh, interpret=True)
        x, ks = self._setup(rng)
        g = jnp.asarray(
            rng.standard_normal((2, 24, 8, 16)).astype(np.float32)
        )

        def loss_ref(x_, *k):
            return jnp.sum(_xla_level(x_, *k) * g)

        def loss_sh(x_, *k):
            return jnp.sum(plevel(x_, *k) * g)

        argnums = tuple(range(7))
        gr = jax.grad(loss_ref, argnums=argnums)(x, *ks)
        gs = jax.jit(jax.grad(loss_sh, argnums=argnums))(
            _shard(x, mesh, 1), *ks
        )
        names = ("dx", "dk1", "db1", "dk2", "db2", "dk3", "db3")
        for name, a, b_ in zip(names, gs, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4,
                err_msg=name,
            )

    def test_small_level_falls_back(self, rng):
        from pwcnet_tpu.ops.pallas.pyramid_conv import _xla_level
        from pwcnet_tpu.parallel import make_spatial_pyramid_level

        mesh = make_mesh(data=2, spatial=4)
        plevel = make_spatial_pyramid_level(mesh, interpret=True)
        x, ks = self._setup(rng, h=16)  # 4 rows/shard < 12
        want = np.asarray(_xla_level(x, *ks))
        got = np.asarray(jax.jit(plevel)(x, *ks))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestTinyLevelGuard:
    """Round-4 regression: XLA's SPMD partitioner (jax 0.9.0) miscompiles
    the INPUT-GRADIENT of a 3x3 SAME conv on a 2x2 feature map H-sharded
    at 1 row/shard over a multi-axis (data x spatial) mesh — forward
    exact, d(loss)/d(input) wrong by O(1) (minimal repro in this file's
    history: lax.conv on (8,2,2,4), P('data','spatial'), rel err 1.0;
    the partitioner logs 'Involuntary full rematerialization'). Small
    frames (16x16 at 3 levels, 64x64 at 6) put pyramid/estimator convs
    exactly there. `parallel.make_spatial_guard` keeps such tiny levels
    spatially unsharded; these tests pin the contract: full-model
    PARAMETER GRADIENTS on a (data 2 x spatial 2) mesh == single-device
    gradients."""

    def _grads(self, model, mesh, images, flows, spatial_on):
        from pwcnet_tpu.train_lib import create_train_state
        from pwcnet_tpu.train_lib.step import make_loss_fn

        state = create_train_state(
            model, jax.random.PRNGKey(0), (1, 16, 16, 3)
        )
        loss_fn = make_loss_fn(model)
        img = jax.device_put(
            images, batch_sharding(mesh, 2 if spatial_on else None)
        )
        flo = jax.device_put(
            flows, batch_sharding(mesh, 1 if spatial_on else None)
        )
        f = jax.jit(jax.grad(lambda p, i, fl: loss_fn(p, i, fl)[0]))
        return jax.device_get(f(state.params, img, flo))

    @pytest.mark.parametrize("use_spatial_cv", [False, True])
    def test_guarded_grads_match_single_device(self, rng, use_spatial_cv):
        from pwcnet_tpu.models import PWCDCNet
        from pwcnet_tpu.parallel import make_spatial_guard

        images = jnp.asarray(
            rng.random((8, 2, 16, 16, 3)).astype(np.float32)
        )
        flows = jnp.asarray(
            rng.standard_normal((8, 16, 16, 2)).astype(np.float32)
        )
        kwargs = dict(num_levels=3, output_level=1, search_range=2)

        mesh_ref = make_mesh(data=8, spatial=1)
        ref = self._grads(
            PWCDCNet(**kwargs), mesh_ref, images, flows, False
        )

        mesh = make_mesh(jax.devices()[:4], data=2, spatial=2)
        cv_fn = (
            make_spatial_cost_volume(mesh, use_pallas=False)
            if use_spatial_cv
            else None
        )
        got = self._grads(
            PWCDCNet(
                cost_volume_fn=cv_fn,
                spatial_guard_fn=make_spatial_guard(mesh),
                **kwargs,
            ),
            mesh,
            images,
            flows,
            True,
        )
        flat_ref = jax.tree_util.tree_leaves_with_path(ref)
        flat_got = jax.tree_util.tree_leaves(got)
        for (path, a), b in zip(flat_ref, flat_got):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.max(np.abs(a)) + 1e-30
            np.testing.assert_allclose(
                b / scale, a / scale, atol=2e-5,
                err_msg=jax.tree_util.keystr(path),
            )


class TestSpatialServing:
    """FlowPredictor with an H-sharded serving mesh (VERDICT r3 #4): the
    sharded predictor must return the same flow as single-device serving.
    Both predictors init from PRNGKey(0), so identical configs share
    params."""

    def test_predictor_matches_unsharded(self, rng):
        from pwcnet_tpu.inference import FlowPredictor

        kwargs = dict(
            num_levels=3, output_level=1, search_range=2, use_pallas=False
        )
        img0 = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        img1 = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)

        ref = FlowPredictor(**kwargs)
        want, want_pyr, _ = ref(img0, img1)
        sh = FlowPredictor(spatial=4, **kwargs)
        got, got_pyr, _ = sh(img0, img1)

        assert sh.mesh.shape == {"data": 1, "spatial": 4}
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        for g, w in zip(got_pyr, want_pyr):
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-5)

    def test_data_axis_shards_sequence_batches(self, rng):
        """(data x spatial) serving mesh: predict_sequence's batched
        dispatches shard the pair axis over 'data' and H over 'spatial'
        and still match the unsharded stream."""
        from pwcnet_tpu.inference import FlowPredictor

        kwargs = dict(
            num_levels=3, output_level=1, search_range=2, use_pallas=False
        )
        frames = [
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            for _ in range(5)
        ]
        ref = FlowPredictor(**kwargs)
        want = list(ref.predict_sequence(frames, batch=2, fetch="flow"))
        sh = FlowPredictor(spatial=2, data=2, **kwargs)
        got = list(sh.predict_sequence(frames, batch=2, fetch="flow"))
        assert len(got) == len(want) == 4
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-5)

    @pytest.mark.slow
    def test_full_depth_sharded_serving(self, rng):
        """Full production config (6 levels, output_level 4, d=4) on the
        8-device CPU mesh with the fused Pallas kernels (interpret mode)
        == the plain XLA single-device predictor."""
        from pwcnet_tpu.inference import FlowPredictor

        img0 = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        img1 = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)

        ref = FlowPredictor(use_pallas=False)
        want, _, _ = ref(img0, img1)
        sh = FlowPredictor(spatial=4, data=2, use_pallas=True)
        got, _, _ = sh(img0, img1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestSpatialFullModel:
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
