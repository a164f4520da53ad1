"""Top-level optical-flow networks: PWCDCNet (flagship) and PWCNet (legacy).

`PWCDCNet` reproduces the reference's working model (model.py:74-138):

- shared 6-level feature pyramid over both frames (deep -> shallow);
- coarse-to-fine: at the deepest level no warping; at finer levels frame-1
  features are bilinear-warped by the upsampled previous flow scaled by
  ``20 / 2**(num_levels - l)`` pixels (model.py:93,109);
- local cost-volume correlation (max displacement ``search_range``) with
  LeakyReLU(0.1);
- per-level estimators threading upsampled flow+features (residual flow);
- at ``output_level`` (default 4, i.e. 1/4 resolution): dilated context
  refinement, then TF1-bilinear upsampling by ``2**(num_levels -
  output_level)`` and x20 to full-resolution pixel units.

Flow-unit convention: network-internal flows are ground-truth/20 at
full-resolution magnitude; the loss scales gt by 1/20 (losses.py:20) and
visualization rescales level-l flow by ``20 / 2**(num_levels - l)``.

`PWCNet` is the reference's "original" variant. As written upstream it is
broken (model.py:19-28 reads attributes before assignment and calls the
estimator with permuted arguments — SURVEY.md §2.4); here it is implemented
*fixed*, documenting the intended architecture: 2-conv pyramid, zero flow
init at the deepest level, ``resize(flow)*2`` between levels, warp ->
cost-volume -> legacy estimator, context refinement per level ('all') or at
the output level ('final'), and a final ``2**(num_levels-output_level)``
flow upscale.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pwcnet_tpu.models.context import ContextNetwork
from pwcnet_tpu.models.estimator import FlowEstimator, FlowEstimatorLegacy
from pwcnet_tpu.models.pyramid import (
    FeaturePyramidExtractor,
    FeaturePyramidExtractorLegacy,
)
from pwcnet_tpu.ops.cost_volume import cost_volume
from pwcnet_tpu.ops.resize import (
    resize_bilinear,
    resize_bilinear_mm,
    upsample2x_bilinear,
    upsample2x_bilinear_mm,
)
from pwcnet_tpu.ops.warp import warp


def flow_scales(num_levels: int) -> list:
    """Pixel-unit conversion factor per level (None at the deepest level).

    ``scales[l] = 20 / 2**(num_levels - l)`` — the reference's
    ``[None, 0.625, 1.25, 2.5, 5.0, 10., 20.]`` for num_levels=6.
    """
    return [None] + [20.0 / 2 ** (num_levels - l) for l in range(1, num_levels + 1)]


class PWCDCNet(nn.Module):
    """PWC-Net with dense-connectable estimators + context network."""

    num_levels: int = 6
    search_range: int = 4
    warp_type: str = "bilinear"
    use_dc: bool = False
    output_level: int = 4
    dtype: Any = jnp.float32
    precision: Any = None
    cost_volume_fn: Any = None  # override (e.g. Pallas fused kernel)
    # fused warp+cost-volume: called as (f0, f1, flow_px, search_range) for
    # warped levels (e.g. ops.pallas.warped_cost_volume — one VMEM pass, no
    # warped-feature HBM round trip); requires warp_type == 'bilinear'
    warp_cv_fn: Any = None
    remat: bool = False  # rematerialize estimators/context in the backward
    # compute the N finest pyramid levels with the fused Pallas kernel
    # (ops/pallas/pyramid_conv.py) — same math, same parameter tree
    fused_pyramid_levels: int = 0
    # compute the N finest estimator levels with the fused Pallas chain
    # kernel (ops/pallas/estimator_conv.py) — same math/param tree
    fused_estimator_levels: int = 0
    # override for the fused level chain (e.g. the shard_map spatial
    # wrapper, parallel.make_spatial_pyramid_level)
    pyramid_level_fn: Any = None
    # matmul-formulated inter-level/final resize (ops.resize_bilinear_mm):
    # same TF1 semantics, but contracts the interpolation as einsums so
    # XLA keeps the surrounding graph in MXU-friendly layouts instead of
    # the phase-interleave's lane-hostile 5-D reshapes. Serving-path
    # default (FlowPredictor/bench); off by default to keep the f32
    # golden-parity path byte-stable.
    mm_resize: bool = False
    # spatial-sharding guard (parallel.make_spatial_guard): constrains
    # too-small pyramid levels to be spatially UNSHARDED. Required for
    # correct gradients on (data x spatial) meshes: XLA's SPMD
    # partitioner miscompiles the input-gradient of 3x3 convs on 2x2
    # feature maps H-sharded at 1 row/shard (see parallel/spatial.py).
    spatial_guard_fn: Any = None
    # run the feature pyramid over BOTH frames as one 2B-batch extractor
    # call (the weights are shared anyway) and split each level: per-sample
    # math is identical and the per-level dispatches halve, but it is a
    # measured LOSS with the fused Pallas pyramid kernels at the serving
    # shapes (448x1024 b8 bf16: 569 -> 513 pairs/s) and neutral with the
    # XLA pyramid — opt-in A/B, off by default (docs/DESIGN.md round 5).
    batched_pyramid: bool = False

    def setup(self):
        assert self.output_level < self.num_levels, (
            "Should set output_level < num_levels"
        )
        if self.warp_cv_fn is not None and self.warp_type != "bilinear":
            raise ValueError(
                "warp_cv_fn fuses the bilinear warp; use warp_type="
                f"'bilinear', not {self.warp_type!r}"
            )
        fp_cls = FeaturePyramidExtractor
        est_cls = FlowEstimator
        ctx_cls = ContextNetwork
        if self.remat:
            # trade FLOPs for HBM: recompute the estimator/context/pyramid
            # activations in the backward pass (jax.checkpoint), enabling
            # much larger crops/batches per chip
            fp_cls = nn.remat(fp_cls)
            est_cls = nn.remat(est_cls)
            ctx_cls = nn.remat(ctx_cls)
        self.fp_extractor = fp_cls(
            num_levels=self.num_levels,
            dtype=self.dtype,
            precision=self.precision,
            fused_levels=self.fused_pyramid_levels,
            level_fn=self.pyramid_level_fn,
            level_guard_fn=self.spatial_guard_fn,
            name="fp_extractor",
        )
        # Estimators for every level are declared (like the reference's
        # constructor, model.py:89-90) but only levels <= output_level are
        # ever called, so deeper ones contribute no parameters — matching
        # the reference checkpoints, which have no optflow_5 variables.
        self.of_estimators = [
            est_cls(
                use_dc=self.use_dc,
                dtype=self.dtype,
                precision=self.precision,
                fused=l > self.output_level - self.fused_estimator_levels,
                name=f"optflow_{l}",
            )
            for l in range(self.num_levels)
        ]
        self.context_net = ctx_cls(
            dtype=self.dtype, precision=self.precision, name="context"
        )

    @property
    def scales(self) -> list:
        return flow_scales(self.num_levels)

    def __call__(
        self,
        images_0: jnp.ndarray,
        images_1: jnp.ndarray,
        with_features: bool = False,
    ):
        """Run the coarse-to-fine flow cascade.

        Args:
          images_0/images_1: (B, H, W, 3) frames in [0, 1]; H and W must be
            multiples of ``2**num_levels``.
          with_features: also return the frame-0 feature pyramid.

        Returns:
          ``(flows_final, flows_pyramid[, pyramid_0])`` — full-resolution
          pixel-unit flow and the per-level internal-unit flow pyramid
          (deep -> output level).
        """
        cv_fn = self.cost_volume_fn or cost_volume
        up2 = upsample2x_bilinear_mm if self.mm_resize else upsample2x_bilinear
        resize = resize_bilinear_mm if self.mm_resize else resize_bilinear
        guard = self.spatial_guard_fn or (lambda x, min_rows=4: x)
        if self.batched_pyramid:
            b = images_0.shape[0]
            pyr = self.fp_extractor(
                jnp.concatenate([images_0, images_1], axis=0)
            )
            pyramid_0 = [p[:b] for p in pyr]
            pyramid_1 = [p[b:] for p in pyr]
        else:
            pyramid_0 = self.fp_extractor(images_0)
            pyramid_1 = self.fp_extractor(images_1)
        scales = self.scales

        flows_pyramid = []
        flows_up = features_up = None
        for l, (f0, f1) in enumerate(zip(pyramid_0, pyramid_1)):
            # keep tiny levels (and everything computed from them — the
            # estimator convs below) spatially unsharded; see
            # spatial_guard_fn docstring
            f0, f1 = guard(f0), guard(f1)
            if flows_up is not None:
                flows_up = guard(flows_up)
                features_up = guard(features_up)
            if l == 0:
                cv = cv_fn(f0, f1, self.search_range)
            elif self.warp_cv_fn is not None:
                cv = self.warp_cv_fn(
                    f0, f1, flows_up * scales[l], self.search_range
                )
            else:
                f1_warped = warp(f1, flows_up * scales[l], self.warp_type)
                cv = cv_fn(f0, f1_warped, self.search_range)

            flows, features = self.of_estimators[l](
                guard(cv), f0, flows_up, features_up
            )
            if l < self.output_level:
                # one 34-channel upsample instead of a 2-channel + a
                # 32-channel one: bilinear resize is channelwise, so the
                # values are bit-identical, but the separate 2-channel
                # flow resize wastes 126/128 of its lane tiles and the
                # two launches halve into one. The estimator consumes
                # [..., flows_up, features_up] adjacently in this exact
                # order (reference modules.py:261-264), so XLA folds the
                # slices straight back into its input concat.
                fu = up2(jnp.concatenate([flows, features], axis=3))
                flows_up = fu[..., :2]
                features_up = fu[..., 2:]
                flows_pyramid.append(flows)
            else:
                flows = self.context_net(flows, features)
                flows_pyramid.append(flows)
                upscale = 2 ** (self.num_levels - self.output_level)
                h, w = flows.shape[1], flows.shape[2]
                flows_final = (
                    resize(flows, (h * upscale, w * upscale)) * 20.0
                )
                if with_features:
                    return flows_final, flows_pyramid, pyramid_0
                return flows_final, flows_pyramid


class PWCNet(nn.Module):
    """Original PWC-Net variant (fixed re-implementation of model.py:6-71)."""

    num_levels: int = 6
    search_range: int = 4
    warp_type: str = "bilinear"
    context: str = "final"  # 'all' | 'final'
    batch_norm: bool = False
    output_level: int = 4
    dtype: Any = jnp.float32
    precision: Any = None

    def setup(self):
        assert self.output_level < self.num_levels, (
            "Should set output_level < num_levels"
        )
        assert self.context in ("all", "final"), (
            "context argument should be all/final"
        )
        self.fp_extractor = FeaturePyramidExtractorLegacy(
            num_levels=self.num_levels,
            dtype=self.dtype,
            precision=self.precision,
            name="fp_extractor",
        )
        self.of_estimators = [
            FlowEstimatorLegacy(
                batch_norm=self.batch_norm,
                dtype=self.dtype,
                precision=self.precision,
                name=f"optflow_{l}",
            )
            for l in range(self.num_levels)
        ]
        if self.context == "all":
            self.context_nets = [
                ContextNetwork(
                    dtype=self.dtype, precision=self.precision, name=f"context_{l}"
                )
                for l in range(self.num_levels)
            ]
        else:
            self.context_net = ContextNetwork(
                dtype=self.dtype, precision=self.precision, name="context"
            )

    def __call__(
        self, images_0: jnp.ndarray, images_1: jnp.ndarray, train: bool = False
    ):
        pyramid_0 = self.fp_extractor(images_0)
        pyramid_1 = self.fp_extractor(images_1)

        flows = []
        flow = None
        for l, (f0, f1) in enumerate(zip(pyramid_0, pyramid_1)):
            b, h, w, _ = f0.shape
            if l == 0:
                flow = jnp.zeros((b, h, w, 2), dtype=self.dtype)
            else:
                flow = resize_bilinear(flow, (h, w)) * 2.0

            f1_warped = warp(f1, flow, self.warp_type)
            cost = cost_volume(f0, f1_warped, self.search_range)
            feature, flow = self.of_estimators[l](cost, f0, flow, train=train)

            if self.context == "all":
                flow = self.context_nets[l](flow, feature)
            elif l == self.output_level:
                flow = self.context_net(flow, feature)

            flows.append(flow)

            if l == self.output_level:
                upscale = 2 ** (self.num_levels - self.output_level)
                final_flow = (
                    resize_bilinear(flow, (h * upscale, w * upscale)) * upscale
                )
                return final_flow, flows, pyramid_0
