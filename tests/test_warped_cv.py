"""Fused warp+cost-volume Pallas kernel vs the composed reference path.

Runs in interpreter mode on CPU (the kernel compiles for real TPU in
bench/production paths; compiled-vs-composed parity was additionally
measured exact on v5e for f32 and within bf16 rounding for bf16).

The reference semantics being fused: bilinear warp with independent corner
clamping (/root/reference/modules.py:99-137) followed by the 81-tap
mean-of-products cost volume with LeakyReLU(0.1) (modules.py:164-204).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwcnet_tpu.ops.cost_volume import cost_volume
from pwcnet_tpu.ops.pallas.warped_cv import warped_cost_volume
from pwcnet_tpu.ops.warp import bilinear_warp


def _rand(rng, shape, scale=1.0):
    return jnp.asarray((rng.standard_normal(shape) * scale).astype(np.float32))


def _composed(f0, f1, flow, d):
    return cost_volume(f0, bilinear_warp(f1, flow), search_range=d)


class TestWarpedCostVolume:
    @pytest.mark.parametrize(
        "shape,d,fscale",
        [
            ((2, 8, 16, 8), 2, 1.5),
            ((1, 16, 16, 4), 4, 3.0),
            ((1, 12, 8, 3), 1, 0.7),
            ((1, 6, 10, 5), 2, 0.2),
        ],
    )
    def test_matches_composed_reference(self, rng, shape, d, fscale):
        f0 = _rand(rng, shape)
        f1 = _rand(rng, shape)
        flow = _rand(rng, shape[:3] + (2,), fscale)
        want = np.asarray(_composed(f0, f1, flow, d))
        got = np.asarray(warped_cost_volume(f0, f1, flow, d, None, True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_far_out_of_bounds_flow_clamps_like_reference(self, rng):
        """Flows pointing far outside the frame exercise the independent
        corner clamping (reference modules.py:113-123)."""
        shape, d = (1, 12, 8, 3), 2
        f0 = _rand(rng, shape)
        f1 = _rand(rng, shape)
        flow = _rand(rng, shape[:3] + (2,), 30.0)
        want = np.asarray(_composed(f0, f1, flow, d))
        got = np.asarray(warped_cost_volume(f0, f1, flow, d, None, True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_tiling_splits_h(self, rng):
        shape, d = (1, 16, 8, 4), 2
        f0 = _rand(rng, shape)
        f1 = _rand(rng, shape)
        flow = _rand(rng, shape[:3] + (2,), 2.0)
        want = np.asarray(_composed(f0, f1, flow, d))
        got = np.asarray(warped_cost_volume(f0, f1, flow, d, 4, True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_integer_flow_is_exact_shift(self, rng):
        shape, d = (1, 8, 8, 4), 2
        f0 = _rand(rng, shape)
        f1 = _rand(rng, shape)
        flow = jnp.tile(jnp.asarray([2.0, -1.0], jnp.float32), (1, 8, 8, 1))
        want = np.asarray(_composed(f0, f1, flow, d))
        got = np.asarray(warped_cost_volume(f0, f1, flow, d, None, True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_gradients_match_composed(self, rng):
        shape, d = (1, 8, 8, 4), 2
        f0 = _rand(rng, shape)
        f1 = _rand(rng, shape)
        flow = _rand(rng, (1, 8, 8, 2), 2.0)
        g = _rand(rng, (1, 8, 8, 25))

        def loss_ref(a, b, fl):
            return jnp.sum(_composed(a, b, fl, d) * g)

        def loss_fused(a, b, fl):
            return jnp.sum(warped_cost_volume(a, b, fl, d, None, True) * g)

        want = jax.grad(loss_ref, argnums=(0, 1, 2))(f0, f1, flow)
        got = jax.grad(loss_fused, argnums=(0, 1, 2))(f0, f1, flow)
        for name, a, b in zip(("df0", "df1", "dflow"), want, got):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
                err_msg=name,
            )

    def test_non_dividing_tile_h_is_auto_planned(self, rng):
        """Regression: tile_h=5 with h=8 must auto-plan (grid = h // tile
        would leave the trailing output rows unwritten — NaN)."""
        shape, d = (1, 8, 8, 4), 2
        f0 = _rand(rng, shape)
        f1 = _rand(rng, shape)
        flow = _rand(rng, (1, 8, 8, 2), 1.0)
        want = np.asarray(_composed(f0, f1, flow, d))
        got = np.asarray(warped_cost_volume(f0, f1, flow, d, 5, True))
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_vmem_fallback_path(self, rng, monkeypatch):
        """Shapes whose kernel would not fit VMEM fall back to the
        composed warp -> cost_volume_pallas path (still differentiable)."""
        from pwcnet_tpu.ops.pallas import warped_cv

        shape, d = (1, 8, 8, 4), 2
        f0 = _rand(rng, shape)
        f1 = _rand(rng, shape)
        flow = _rand(rng, (1, 8, 8, 2), 1.0)
        want = np.asarray(_composed(f0, f1, flow, d))
        monkeypatch.setattr(warped_cv, "_pick_tile", lambda *a, **k: None)
        got = np.asarray(warped_cost_volume(f0, f1, flow, d, None, True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestModelIntegration:
    def test_model_with_fused_kernel_matches_unfused(self, rng):
        from pwcnet_tpu.models import PWCDCNet

        imgs0 = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        imgs1 = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        kw = dict(num_levels=3, output_level=1, search_range=2)
        plain = PWCDCNet(**kw)
        variables = plain.init(jax.random.PRNGKey(0), imgs0, imgs1)
        fused = PWCDCNet(
            warp_cv_fn=functools.partial(
                warped_cost_volume, tile_h=None, interpret=True
            ),
            **kw,
        )
        want, pyr_w = plain.apply(variables, imgs0, imgs1)
        got, pyr_g = fused.apply(variables, imgs0, imgs1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )
        for a, b in zip(pyr_w, pyr_g):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
            )

    def test_fused_requires_bilinear(self):
        from pwcnet_tpu.models import PWCDCNet

        model = PWCDCNet(
            num_levels=3, output_level=1, search_range=2,
            warp_type="nearest", warp_cv_fn=warped_cost_volume,
        )
        imgs = jnp.zeros((1, 16, 16, 3), jnp.float32)
        with pytest.raises(ValueError):
            model.init(jax.random.PRNGKey(0), imgs, imgs)


class TestWarpBwdPallas:
    """The scatter-free Pallas warp backward vs the XLA row-scatter VJP."""

    @pytest.mark.parametrize("fscale", [0.4, 2.5, 40.0])
    def test_matches_xla_warp_vjp(self, rng, fscale):
        from pwcnet_tpu.ops.pallas.warped_cv import warp_bwd_pallas
        from pwcnet_tpu.ops.warp import _bilinear_warp_bwd

        shape = (2, 10, 12, 5)
        f1 = _rand(rng, shape)
        flow = _rand(rng, shape[:3] + (2,), fscale)
        g = _rand(rng, shape)
        want_df1, want_dflow = _bilinear_warp_bwd((f1, flow), g)
        got = warp_bwd_pallas(f1, flow, g, interpret=True)
        assert got is not None
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(want_df1), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got[1]), np.asarray(want_dflow), rtol=1e-5, atol=1e-5
        )

    def test_integer_and_axis_aligned_flows(self, rng):
        """Exact-integer flows put weights on selector boundaries
        (rel==kv with fractional weight exactly 0/1)."""
        from pwcnet_tpu.ops.pallas.warped_cv import warp_bwd_pallas
        from pwcnet_tpu.ops.warp import _bilinear_warp_bwd

        shape = (1, 8, 8, 4)
        f1 = _rand(rng, shape)
        flow = jnp.tile(jnp.asarray([3.0, -2.0], jnp.float32), (1, 8, 8, 1))
        g = _rand(rng, shape)
        want_df1, want_dflow = _bilinear_warp_bwd((f1, flow), g)
        got = warp_bwd_pallas(f1, flow, g, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(want_df1), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got[1]), np.asarray(want_dflow), rtol=1e-5, atol=1e-5
        )

    def test_vmem_guard_returns_none(self, rng):
        from pwcnet_tpu.ops.pallas.warped_cv import warp_bwd_pallas

        f1 = jnp.zeros((1, 512, 1024, 64), jnp.float32)
        flow = jnp.zeros((1, 512, 1024, 2), jnp.float32)
        assert warp_bwd_pallas(f1, flow, jnp.zeros_like(f1)) is None
