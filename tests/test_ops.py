"""Unit tests for pwcnet_tpu.ops against independent NumPy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracles
from pwcnet_tpu import ops


class TestResizeBilinear:
    @pytest.mark.parametrize(
        "in_hw,out_hw",
        [
            ((4, 6), (8, 12)),  # 2x upsample (inter-level path)
            ((7, 5), (14, 10)),
            ((8, 8), (32, 32)),  # 4x final upsample
            ((9, 13), (4, 6)),  # downsample
            ((5, 5), (7, 11)),  # non-integer ratio
        ],
    )
    def test_matches_tf1_oracle(self, rng, in_hw, out_hw):
        x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
        got = np.asarray(ops.resize_bilinear(jnp.asarray(x), out_hw))
        want = oracles.tf1_resize_bilinear(x, *out_hw)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_identity(self, rng):
        x = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(ops.resize_bilinear(jnp.asarray(x), (4, 4))), x
        )

    def test_upsample2x_helper(self, rng):
        x = rng.standard_normal((1, 3, 5, 2)).astype(np.float32)
        got = np.asarray(ops.upsample2x_bilinear(jnp.asarray(x)))
        want = oracles.tf1_resize_bilinear(x, 6, 10)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_hwc_rank3(self, rng):
        x = rng.standard_normal((5, 7, 2)).astype(np.float32)
        got = np.asarray(ops.resize_bilinear(jnp.asarray(x), (10, 14)))
        want = oracles.tf1_resize_bilinear(x[None], 10, 14)[0]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize(
        "in_hw,out_hw",
        [
            ((4, 6), (8, 12)),  # 2x upsample (inter-level path)
            ((7, 5), (14, 10)),
            ((8, 8), (32, 32)),  # 4x final upsample
            ((9, 13), (4, 6)),  # downsample
            ((5, 5), (7, 11)),  # non-integer ratio
        ],
    )
    def test_mm_matches_tf1_oracle(self, rng, in_hw, out_hw):
        """The matmul formulation implements the same TF1 semantics."""
        x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
        got = np.asarray(ops.resize_bilinear_mm(jnp.asarray(x), out_hw))
        want = oracles.tf1_resize_bilinear(x, *out_hw)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_mm_upsample2x_and_rank3(self, rng):
        x = rng.standard_normal((1, 3, 5, 2)).astype(np.float32)
        got = np.asarray(ops.upsample2x_bilinear_mm(jnp.asarray(x)))
        want = oracles.tf1_resize_bilinear(x, 6, 10)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        x3 = rng.standard_normal((5, 7, 2)).astype(np.float32)
        got3 = np.asarray(ops.resize_bilinear_mm(jnp.asarray(x3), (10, 14)))
        want3 = oracles.tf1_resize_bilinear(x3[None], 10, 14)[0]
        np.testing.assert_allclose(got3, want3, rtol=1e-5, atol=1e-5)


class TestResizeNearest:
    @pytest.mark.parametrize(
        "in_hw,out_hw",
        [((8, 8), (4, 4)), ((9, 13), (3, 5)), ((4, 4), (9, 7)), ((6, 6), (6, 6))],
    )
    def test_matches_tf1_oracle(self, rng, in_hw, out_hw):
        x = rng.standard_normal((2, *in_hw, 2)).astype(np.float32)
        got = np.asarray(ops.resize_nearest(jnp.asarray(x), out_hw))
        want = oracles.tf1_resize_nearest(x, *out_hw)
        np.testing.assert_array_equal(got, want)


class TestWarp:
    def test_zero_flow_is_identity_bilinear(self, rng):
        x = rng.standard_normal((2, 6, 7, 3)).astype(np.float32)
        flow = np.zeros((2, 6, 7, 2), np.float32)
        got = np.asarray(ops.bilinear_warp(jnp.asarray(x), jnp.asarray(flow)))
        np.testing.assert_allclose(got, x, rtol=1e-6, atol=1e-6)

    def test_integer_flow_shifts_bilinear(self):
        # flow (x=+1, y=0) should fetch the pixel one to the right.
        x = np.arange(5, dtype=np.float32).reshape(1, 1, 5, 1)
        x = np.tile(x, (1, 4, 1, 1))
        flow = np.zeros((1, 4, 5, 2), np.float32)
        flow[..., 0] = 1.0
        got = np.asarray(ops.bilinear_warp(jnp.asarray(x), jnp.asarray(flow)))
        want = np.array([1, 2, 3, 4, 4], np.float32)  # clamp at right edge
        np.testing.assert_allclose(got[0, 0, :, 0], want, atol=1e-6)

    def test_bilinear_matches_oracle(self, rng):
        x = rng.standard_normal((2, 8, 9, 4)).astype(np.float32)
        flow = (rng.standard_normal((2, 8, 9, 2)) * 3).astype(np.float32)
        got = np.asarray(ops.bilinear_warp(jnp.asarray(x), jnp.asarray(flow)))
        want = oracles.bilinear_warp(x, flow)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_nearest_matches_oracle(self, rng):
        x = rng.standard_normal((2, 8, 9, 4)).astype(np.float32)
        flow = (rng.standard_normal((2, 8, 9, 2)) * 3).astype(np.float32)
        got = np.asarray(ops.nearest_warp(jnp.asarray(x), jnp.asarray(flow)))
        want = oracles.nearest_warp(x, flow)
        np.testing.assert_array_equal(got, want)

    def test_large_out_of_bounds_flow_clamps(self, rng):
        x = rng.standard_normal((1, 6, 6, 2)).astype(np.float32)
        flow = np.full((1, 6, 6, 2), 100.0, np.float32)
        got = np.asarray(ops.bilinear_warp(jnp.asarray(x), jnp.asarray(flow)))
        want = oracles.bilinear_warp(x, flow)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_dispatch(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
        flow = jnp.zeros((1, 4, 4, 2), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(ops.warp(x, flow, "nearest")), np.asarray(x)
        )
        with pytest.raises(ValueError):
            ops.warp(x, flow, "bicubic")

    def test_jit_and_grad(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 3)).astype(np.float32))
        flow = jnp.asarray(
            (rng.standard_normal((1, 6, 6, 2)) * 2).astype(np.float32)
        )
        f = jax.jit(lambda a, b: jnp.sum(ops.bilinear_warp(a, b) ** 2))
        g = jax.grad(f, argnums=(0, 1))(x, flow)
        assert all(np.all(np.isfinite(np.asarray(gi))) for gi in g)


class TestCostVolume:
    @pytest.mark.parametrize("d", [1, 2, 4])
    def test_matches_oracle(self, rng, d):
        f0 = rng.standard_normal((2, 7, 9, 6)).astype(np.float32)
        f1 = rng.standard_normal((2, 7, 9, 6)).astype(np.float32)
        got = np.asarray(
            ops.cost_volume(jnp.asarray(f0), jnp.asarray(f1), search_range=d)
        )
        want = oracles.cost_volume(f0, f1, d=d)
        assert got.shape == (2, 7, 9, (2 * d + 1) ** 2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_center_tap_is_mean_product(self, rng):
        d = 4
        f0 = rng.standard_normal((1, 5, 5, 8)).astype(np.float32)
        got = np.asarray(
            ops.cost_volume(
                jnp.asarray(f0), jnp.asarray(f0), search_range=d, activate=False
            )
        )
        center = (2 * d + 1) ** 2 // 2
        np.testing.assert_allclose(
            got[..., center], (f0**2).mean(axis=3), rtol=1e-5, atol=1e-6
        )

    def test_no_activation_flag(self, rng):
        f0 = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
        f1 = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
        raw = np.asarray(
            ops.cost_volume(jnp.asarray(f0), jnp.asarray(f1), 2, activate=False)
        )
        act = np.asarray(ops.cost_volume(jnp.asarray(f0), jnp.asarray(f1), 2))
        np.testing.assert_allclose(act, oracles.leaky_relu(raw, 0.1), rtol=1e-6)


class TestWarpCustomVJP:
    def _plain_warp(self, x, flow):
        """Autodiff reference: direct 4-gather formulation."""
        b, h, w, c = x.shape
        fx, fy = flow[..., 0], flow[..., 1]
        fx0, fy0 = jnp.floor(fx), jnp.floor(fy)
        fx1, fy1 = fx0 + 1, fy0 + 1
        gy = jnp.arange(h, dtype=flow.dtype)[None, :, None]
        gx = jnp.arange(w, dtype=flow.dtype)[None, None, :]
        y0 = jnp.clip(gy + fy0, 0, h - 1).astype(jnp.int32)
        y1 = jnp.clip(gy + fy1, 0, h - 1).astype(jnp.int32)
        x0 = jnp.clip(gx + fx0, 0, w - 1).astype(jnp.int32)
        x1 = jnp.clip(gx + fx1, 0, w - 1).astype(jnp.int32)

        def gat(yi, xi):
            flat = x.reshape(b, h * w, c)
            idx = (yi * w + xi).reshape(b, h * w, 1)
            return jnp.take_along_axis(flat, idx, axis=1).reshape(b, h, w, c)

        c00 = ((fy1 - fy) * (fx1 - fx))[..., None]
        c01 = ((fy1 - fy) * (fx - fx0))[..., None]
        c10 = ((fy - fy0) * (fx1 - fx))[..., None]
        c11 = ((fy - fy0) * (fx - fx0))[..., None]
        return (c00 * gat(y0, x0) + c01 * gat(y0, x1)
                + c10 * gat(y1, x0) + c11 * gat(y1, x1))

    @pytest.mark.parametrize("scale", [0.5, 3.0, 50.0])
    def test_grads_match_plain_autodiff(self, rng, scale):
        x = jnp.asarray(rng.standard_normal((2, 7, 9, 5)).astype(np.float32))
        flow = jnp.asarray(
            (rng.standard_normal((2, 7, 9, 2)) * scale).astype(np.float32)
        )
        g = jnp.asarray(rng.standard_normal((2, 7, 9, 5)).astype(np.float32))

        def loss_custom(a, f):
            return jnp.sum(ops.bilinear_warp(a, f) * g)

        def loss_plain(a, f):
            return jnp.sum(self._plain_warp(a, f) * g)

        gx_c, gf_c = jax.grad(loss_custom, argnums=(0, 1))(x, flow)
        gx_p, gf_p = jax.grad(loss_plain, argnums=(0, 1))(x, flow)
        np.testing.assert_allclose(
            np.asarray(gx_c), np.asarray(gx_p), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(gf_c), np.asarray(gf_p), rtol=1e-4, atol=1e-4
        )

    def test_integer_flow_boundary_grads(self, rng):
        """Exactly-integer flow at borders exercises the clamp/fold path."""
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
        flow = jnp.asarray(
            np.tile(np.array([2.0, -3.0], np.float32), (1, 4, 4, 1))
        )
        g = jnp.ones((1, 4, 4, 2), jnp.float32)

        def loss_custom(a):
            return jnp.sum(ops.bilinear_warp(a, flow) * g)

        def loss_plain(a):
            return jnp.sum(self._plain_warp(a, flow) * g)

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_custom)(x)),
            np.asarray(jax.grad(loss_plain)(x)),
            rtol=1e-5,
            atol=1e-5,
        )


class TestConv3x3Taps:
    """conv_taps.conv3x3_taps must be bit-level interchangeable with
    lax.conv — it is kept as a measured-negative-result record (see the
    module docstring), so the only thing worth asserting is parity."""

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    @pytest.mark.parametrize("cin,cout", [(32, 2), (34, 2), (16, 8)])
    def test_matches_lax_conv(self, rng, dtype, cin, cout):
        from jax import lax

        from pwcnet_tpu.ops.conv_taps import conv3x3_taps

        x = jnp.asarray(rng.standard_normal((2, 6, 9, cin)), dtype)
        k = jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)) * 0.1, dtype
        )
        b = jnp.asarray(rng.standard_normal((cout,)), dtype)
        got = conv3x3_taps(x, k, b)
        want = lax.conv_general_dilated(
            x.astype(jnp.float32),
            k.astype(jnp.float32),
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(jnp.float32)
        assert got.dtype == x.dtype
        tol = 1e-5 if dtype == jnp.float32 else 5e-2
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(want.astype(dtype), np.float32),
            rtol=tol,
            atol=tol,
        )
