"""Pin the Pallas kernels' mode/fallback boundaries at real model shapes.

Every kernel picks a VMEM plan from static shape arithmetic; these tests
assert that the shapes the flagship configurations actually produce take
the intended fast path (and that genuinely oversized shapes degrade in
the documented order: full -> windowed -> XLA fallback) so a silent
perf cliff cannot creep in through a heuristic change. Shapes below are
the per-level (H, W, C) of PWCDCNet warped levels for 448x1024 b4
inference and 384x448 b4 training (d=4).
"""

import jax.numpy as jnp
import pytest

from pwcnet_tpu.ops.pallas import cost_volume as cvp
from pwcnet_tpu.ops.pallas import pyramid_conv as pcp
from pwcnet_tpu.ops.pallas import warped_cv as wcv

BF16 = jnp.dtype(jnp.bfloat16).itemsize
F32 = jnp.dtype(jnp.float32).itemsize

# (h, w, c) of the warped levels, deep -> shallow (l=1..4)
INFER_LEVELS = [(14, 32, 128), (28, 64, 96), (56, 128, 64), (112, 256, 32)]
TRAIN_LEVELS = [(12, 14, 128), (24, 28, 96), (48, 56, 64), (96, 112, 32)]


class TestCostVolumePlans:
    @pytest.mark.parametrize("h,w,c", INFER_LEVELS + TRAIN_LEVELS)
    def test_flagship_levels_avoid_xla_fallback(self, h, w, c):
        for item in (BF16, F32):
            mode, th = cvp._plan_fwd(h, w, c, 4, item)
            assert mode in ("full", "windowed"), (h, w, c, item)
            assert th is not None and h % th == 0

    def test_small_levels_use_full_mode(self):
        # VMEM-resident frame-1 (fetched once per batch) on coarse levels
        mode, _ = cvp._plan_fwd(14, 32, 128, 4, BF16)
        assert mode == "full"

    def test_1024x1024_f32_is_windowed_not_xla(self):
        # round-1 VERDICT: 1024x1024 f32 silently took the XLA path;
        # the windowed kernels now cover it
        mode, th = cvp._plan_fwd(256, 256, 32, 4, F32)
        assert mode == "windowed"
        assert th is not None

    def test_degradation_order_with_growing_width(self):
        seen = []
        for w in (128, 2048, 65536):
            mode, _ = cvp._plan_fwd(64, w, 64, 4, F32)
            seen.append(mode)
        assert seen[0] == "full"
        assert seen[1] == "windowed"
        assert seen[2] is None  # XLA fallback only at absurd widths


class TestWarpedCvPlans:
    @pytest.mark.parametrize("h,w,c", INFER_LEVELS + TRAIN_LEVELS)
    def test_forward_fits_at_flagship_levels(self, h, w, c):
        for item in (BF16, F32):
            assert wcv._pick_tile(h, w, c, 4, item) is not None, (h, w, c)

    @pytest.mark.parametrize("h,w,c", TRAIN_LEVELS)
    def test_backward_fits_at_training_levels(self, h, w, c):
        for item in (BF16, F32):
            picked = wcv._pick_bwd_tiles(h, w, c, item)
            assert picked is not None, (h, w, c, item)
            cc, th = picked
            assert c % cc == 0 and h % th == 0
            # Mosaic block constraint: sublane dims divisible by 8 or full
            assert cc % 8 == 0 or cc == c
            assert th % 8 == 0 or th == h

    def test_backward_falls_back_beyond_vmem(self):
        assert wcv._pick_bwd_tiles(512, 1024, 64, F32) is None


class TestPyramidConvPlans:
    def test_finest_levels_fit_at_flagship_sizes(self):
        # level 0: 448x1024x3 -> 16; level 1: 224x512x16 -> 32
        for (h, w, cin, c) in ((448, 1024, 3, 16), (224, 512, 16, 32)):
            for item in (BF16, F32):
                assert pcp._pick_tile(h, w, cin, c, item) is not None

    def test_tile_divides_half_height(self):
        th = pcp._pick_tile(448, 1024, 3, 16, BF16)
        assert (448 // 2) % th == 0

    def test_banded_plans_at_flagship_sizes(self):
        """The banded kernels (3 dots per tile) must dispatch — not
        silently fall back to the row-loop kernels — at every production
        shape: serving 448x1024 and training 384x448, both fused levels,
        bf16 and f32."""
        for (b, h, w, cin, c) in (
            (8, 448, 1024, 3, 16), (8, 224, 512, 16, 32),
            (4, 384, 448, 3, 16), (4, 192, 224, 16, 32),
        ):
            for item in (BF16, F32):
                shape = (b, h, w, cin)
                tf = pcp._pick_tile_banded(shape, c, item)
                tb = pcp._pick_tile_bwd_banded(shape, c, item)
                assert tf is not None and (h // 2) % tf == 0, (shape, item)
                assert tb is not None and (h // 2) % tb == 0, (shape, item)


class TestPyramidBwdPlans:
    def test_backward_fits_at_all_training_shapes(self):
        """The windowed (HBM-streaming) gz-chain backward covers both
        fused levels at training and full-frame scales, f32 and bf16."""
        from pwcnet_tpu.ops.pallas import pyramid_conv as pcp

        # (hh, wh, cin, c) after each level's stride-2
        for hh, wh, cin, c in (
            (192, 224, 3, 16), (96, 112, 16, 32),
            (224, 512, 3, 16), (112, 256, 16, 32),
        ):
            for item in (BF16, F32):
                assert (
                    pcp._pick_tile_bwd(hh, wh, cin, c, item) is not None
                ), (hh, wh, cin, c, item)
