"""Model structure/shape tests, incl. checkpoint-tree parity with the
reference's 110-tensor PWCDCNet parameter tree (SURVEY.md §2.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwcnet_tpu.models import PWCDCNet, PWCNet, flow_scales

H, W = 64, 64  # multiples of 2**6


def _init_pwcdcnet(**kw):
    model = PWCDCNet(**kw)
    imgs = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, imgs)
    return model, variables


class TestPWCDCNetParams:
    def test_param_tree_matches_reference_checkpoint(self):
        _, variables = _init_pwcdcnet()
        params = variables["params"]

        # fp_extractor: 18 convs (3 per level x 6 levels), HWIO 3x3.
        fp = params["fp_extractor"]
        assert set(fp.keys()) == {
            "conv2d" if i == 0 else f"conv2d_{i}" for i in range(18)
        }
        filters = [16, 32, 64, 96, 128, 192]
        in_ch = 3
        for i in range(18):
            name = "conv2d" if i == 0 else f"conv2d_{i}"
            f = filters[i // 3]
            expect_in = in_ch if i % 3 == 0 else f
            assert fp[name]["kernel"].shape == (3, 3, expect_in, f), name
            assert fp[name]["bias"].shape == (f,)
            if i % 3 == 2:
                in_ch = f

        # Estimators optflow_0..optflow_4 (level 5 never called -> absent);
        # input channels per level are checkpoint-verified: 81(cv) +
        # {192,128,96,64,32}(features_0) + {0,2}(flow_up) + {0,32}(feat_up).
        expected_in = {0: 81 + 192, 1: 81 + 128 + 2 + 32, 2: 81 + 96 + 2 + 32,
                       3: 81 + 64 + 2 + 32, 4: 81 + 32 + 2 + 32}
        assert expected_in == {0: 273, 1: 243, 2: 211, 3: 179, 4: 147}
        for l in range(5):
            est = params[f"optflow_{l}"]
            assert set(est.keys()) == {
                "conv2d" if i == 0 else f"conv2d_{i}" for i in range(6)
            }
            chain = [expected_in[l], 128, 128, 96, 64, 32]
            for i, f in enumerate([128, 128, 96, 64, 32, 2]):
                name = "conv2d" if i == 0 else f"conv2d_{i}"
                assert est[name]["kernel"].shape == (3, 3, chain[i], f), (l, name)
        assert "optflow_5" not in params

        # Context: 7 convs, input 2+32=34 channels.
        ctx = params["context"]
        assert set(ctx.keys()) == {
            "conv2d" if i == 0 else f"conv2d_{i}" for i in range(7)
        }
        chain = [34, 128, 128, 128, 96, 64, 32]
        for i, f in enumerate([128, 128, 128, 96, 64, 32, 2]):
            name = "conv2d" if i == 0 else f"conv2d_{i}"
            assert ctx[name]["kernel"].shape == (3, 3, chain[i], f)

        # 110 tensors total: (18 + 5*6 + 7) convs x (kernel, bias).
        n_tensors = len(jax.tree_util.tree_leaves(params))
        assert n_tensors == 110

        n_params = sum(
            np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)
        )
        # Exact total from the ckpt-verified shape tree (SURVEY.md §2.1's
        # "~4.05M" estimate was wrong; the shapes sum to 5,029,868).
        assert n_params == 5_029_868

    @pytest.mark.slow
    def test_dense_connection_changes_widths(self):
        _, variables = _init_pwcdcnet(use_dc=True)
        est = variables["params"]["optflow_0"]
        # with dense connections the running feature width accumulates
        assert est["conv2d_1"]["kernel"].shape == (3, 3, 128 + 273, 128)


class TestPWCDCNetForward:
    @pytest.mark.slow
    def test_output_shapes_and_pyramid(self):
        model, variables = _init_pwcdcnet()
        imgs0 = jnp.ones((2, H, W, 3), jnp.float32) * 0.5
        imgs1 = jnp.ones((2, H, W, 3), jnp.float32) * 0.5
        flows_final, pyramid = model.apply(variables, imgs0, imgs1)
        assert flows_final.shape == (2, H, W, 2)
        assert len(pyramid) == 5
        for l, f in enumerate(pyramid):
            s = 2 ** (6 - l)
            assert f.shape == (2, H // s, W // s, 2)

    def test_with_features(self):
        model, variables = _init_pwcdcnet()
        imgs = jnp.zeros((1, H, W, 3), jnp.float32)
        out = model.apply(variables, imgs, imgs, with_features=True)
        assert len(out) == 3
        pyramid_0 = out[2]
        assert len(pyramid_0) == 6
        assert pyramid_0[0].shape == (1, 1, 1, 192)  # 64/64=1
        assert pyramid_0[5].shape == (1, 32, 32, 16)

    def test_identical_images_forward_is_finite(self):
        """Smoke: equal frames run without NaN/Inf. (A randomly
        initialized estimator does NOT emit near-zero flow for identical
        inputs — it is a free-form CNN, not a matcher — so finiteness is
        the strongest property available without training.)"""
        model, variables = _init_pwcdcnet()
        imgs = jnp.asarray(
            np.random.default_rng(1).random((1, H, W, 3)), jnp.float32
        )
        flows_final, _ = model.apply(variables, imgs, imgs)
        assert np.all(np.isfinite(np.asarray(flows_final)))

    def test_scales_helper(self):
        assert flow_scales(6) == [None, 0.625, 1.25, 2.5, 5.0, 10.0, 20.0]

    def test_jit_forward(self):
        model, variables = _init_pwcdcnet()
        imgs = jnp.zeros((1, H, W, 3), jnp.float32)
        fn = jax.jit(lambda v, a, b: model.apply(v, a, b)[0])
        out = fn(variables, imgs, imgs)
        assert out.shape == (1, H, W, 2)


class TestPWCNetLegacy:
    def test_forward_and_params(self):
        model = PWCNet(context="final")
        imgs = jnp.zeros((1, H, W, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), imgs, imgs)
        final_flow, flows, pyramid_0 = model.apply(variables, imgs, imgs)
        assert final_flow.shape == (1, H, W, 2)
        assert len(flows) == 5
        # legacy pyramid: 12 convs (2 per level)
        fp = variables["params"]["fp_extractor"]
        assert len(fp) == 12

    def test_context_all(self):
        model = PWCNet(context="all", output_level=2, num_levels=4)
        imgs = jnp.zeros((1, 32, 32, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), imgs, imgs)
        final_flow, flows, _ = model.apply(variables, imgs, imgs)
        assert len(flows) == 3
        assert "context_0" in variables["params"]


class TestConvPaddingSemantics:
    """flax SAME padding must match TF1 SAME (manual-pad equivalence)."""

    def test_stride2_even_input_pads_bottom_right(self, rng):
        import flax.linen as nn

        x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
        conv = nn.Conv(6, (3, 3), strides=(2, 2), padding="SAME")
        v = conv.init(jax.random.PRNGKey(0), x)
        same = conv.apply(v, x)
        # TF SAME for k=3, s=2, even input: pad 0 top/left, 1 bottom/right.
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        valid = nn.Conv(6, (3, 3), strides=(2, 2), padding="VALID").apply(v, xp)
        np.testing.assert_allclose(
            np.asarray(same), np.asarray(valid), rtol=1e-5, atol=1e-5
        )

    def test_dilated_same_pads_by_dilation(self, rng):
        import flax.linen as nn

        x = jnp.asarray(rng.standard_normal((1, 9, 9, 3)).astype(np.float32))
        conv = nn.Conv(4, (3, 3), padding="SAME", kernel_dilation=(4, 4))
        v = conv.init(jax.random.PRNGKey(0), x)
        same = conv.apply(v, x)
        xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
        valid = nn.Conv(4, (3, 3), padding="VALID", kernel_dilation=(4, 4)).apply(
            v, xp
        )
        np.testing.assert_allclose(
            np.asarray(same), np.asarray(valid), rtol=1e-5, atol=1e-5
        )


class TestRemat:
    @pytest.mark.slow
    def test_remat_matches_plain(self, rng):
        """remat=True must be numerically identical (same params, loss)."""
        from pwcnet_tpu.train_lib import create_train_state, make_train_step

        imgs = jnp.asarray(rng.random((2, 2, 16, 16, 3)).astype(np.float32))
        flows = jnp.asarray(
            rng.standard_normal((2, 16, 16, 2)).astype(np.float32)
        )
        losses = {}
        for remat in (False, True):
            model = PWCDCNet(
                num_levels=3, output_level=1, search_range=2, remat=remat
            )
            state = create_train_state(
                model, jax.random.PRNGKey(0), (1, 16, 16, 3)
            )
            step = make_train_step(model, donate=False)
            state, m = step(state, imgs, flows)
            losses[remat] = float(m["loss"])
        assert losses[True] == pytest.approx(losses[False], rel=1e-6)


class TestModelVariants:
    def test_nearest_warp_variant_runs(self, rng):
        model = PWCDCNet(
            num_levels=3, output_level=1, search_range=2,
            warp_type="nearest",
        )
        imgs = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), imgs, imgs)
        flows_final, pyramid = model.apply(variables, imgs, imgs)
        assert flows_final.shape == (1, 16, 16, 2)
        assert np.all(np.isfinite(np.asarray(flows_final)))

    def test_mm_resize_matches_default(self, rng):
        """mm_resize=True (serving path) == phase/take resize in f32.

        Same params, same inputs; the matmul-formulated resize must stay
        within a few ULP of the default path end-to-end so the serving
        config keeps the golden-parity numerics.
        """
        kw = dict(num_levels=3, output_level=1, search_range=2)
        base = PWCDCNet(**kw)
        mm = PWCDCNet(mm_resize=True, **kw)
        imgs0 = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
        imgs1 = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
        variables = base.init(jax.random.PRNGKey(0), imgs0, imgs1)
        want, want_pyr = base.apply(variables, imgs0, imgs1)
        got, got_pyr = mm.apply(variables, imgs0, imgs1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
        )
        for g, w in zip(got_pyr, want_pyr):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-6
            )

    def test_batched_pyramid_matches_default(self, rng):
        """batched_pyramid=True (serving path) == per-frame extraction.

        The 2B-batch extractor call is per-sample identical math (convs
        are batch-elementwise); the backend may still block its GEMMs
        differently at 2B vs B (measured few-ULP deltas on CPU), so
        assert a few-ULP bound rather than bitwise. Also pins the level
        split ([:b] frame 0, [b:] frame 1) against accidental swaps —
        a swap produces O(1) flow deltas, not 1e-7.
        """
        kw = dict(num_levels=3, output_level=1, search_range=2)
        base = PWCDCNet(**kw)
        bp = PWCDCNet(batched_pyramid=True, **kw)
        imgs0 = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
        imgs1 = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
        variables = base.init(jax.random.PRNGKey(0), imgs0, imgs1)
        want, want_pyr = base.apply(variables, imgs0, imgs1)
        got, got_pyr = bp.apply(variables, imgs0, imgs1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6
        )
        for g, w in zip(got_pyr, want_pyr):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-6
            )

    @pytest.mark.slow
    def test_use_dc_variant_forward(self, rng):
        model = PWCDCNet(
            num_levels=3, output_level=1, search_range=2, use_dc=True
        )
        imgs = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), imgs, imgs)
        flows_final, _ = model.apply(variables, imgs, imgs)
        assert np.all(np.isfinite(np.asarray(flows_final)))

    @pytest.mark.slow
    def test_bfloat16_forward(self, rng):
        model = PWCDCNet(
            num_levels=3, output_level=1, search_range=2,
            dtype=jnp.bfloat16,
        )
        imgs = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), imgs, imgs)
        # params stay f32; activations bf16
        kernel = variables["params"]["fp_extractor"]["conv2d"]["kernel"]
        assert kernel.dtype == jnp.float32
        flows_final, _ = model.apply(variables, imgs, imgs)
        assert flows_final.dtype == jnp.bfloat16

    @pytest.mark.slow
    def test_bfloat16_pixel_bound_full_depth(self, rng):
        """bf16 serving accuracy in PIXEL units (VERDICT r4 #4): the
        full-depth bf16 forward must stay within the 0.05 px EPE parity
        budget of the f32 forward on the same weights.

        Weights are variance-scaled random (the converter-gate
        construction) so flows sit at realistic magnitudes. The
        production-shape numbers are recorded in PARITY §6 (measured
        448x1024 b4 on TPU: EPE delta 0.023 px on both the XLA and
        fused-Pallas paths, flows ~7.6 px); this asserts the same bound
        at a CPU-tractable full-depth shape so a precision regression
        (e.g. an op accidentally accumulating in bf16) fails the suite.
        """
        model32 = PWCDCNet()  # full depth, all defaults
        model16 = PWCDCNet(dtype=jnp.bfloat16)
        images_0 = rng.random((1, 64, 64, 3)).astype(np.float32)
        images_1 = rng.random((1, 64, 64, 3)).astype(np.float32)
        template = jax.eval_shape(
            lambda: model32.init(
                jax.random.PRNGKey(0),
                jnp.asarray(images_0),
                jnp.asarray(images_1),
            )
        )["params"]

        def draw(leaf):
            shape = np.shape(leaf)
            std = (
                1.0 / np.sqrt(np.prod(shape[:3]))
                if len(shape) == 4
                else 0.05
            )
            return (rng.standard_normal(shape) * std).astype(np.float32)

        params = jax.tree_util.tree_map(draw, template)
        f32 = np.asarray(
            model32.apply(
                {"params": params},
                jnp.asarray(images_0),
                jnp.asarray(images_1),
            )[0]
        )
        f16 = np.asarray(
            model16.apply(
                {"params": params},
                jnp.asarray(images_0, jnp.bfloat16),
                jnp.asarray(images_1, jnp.bfloat16),
            )[0].astype(jnp.float32)
        )
        epe_delta = float(np.sqrt(((f32 - f16) ** 2).sum(-1)).mean())
        mag = float(np.sqrt((f32**2).sum(-1)).mean())
        assert mag > 0.5, f"degenerate flow magnitude {mag}"
        assert epe_delta < 0.05, (
            f"bf16 EPE delta {epe_delta:.4f} px exceeds the 0.05 px "
            f"parity budget (flow magnitude {mag:.2f} px)"
        )
