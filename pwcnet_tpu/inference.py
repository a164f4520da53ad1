"""Inference helpers shared by the test/test_continuous CLIs.

Mirrors the reference drivers' behavior (test.py / test_continuous.py):
images are cropped to a multiple of 64 (`factor_crop`, test.py:13-17),
normalized to [0,1], run through PWCDCNet, and the per-level flows are
rescaled to pixel units by ``20 / 2**(num_levels - l)`` for visualization.

XLA needs static shapes, so instead of the reference's dynamic-shape
placeholder (test_continuous.py:28) the jitted forward is cached per input
shape: a sequence of same-sized frames compiles exactly once.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pwcnet_tpu.models import PWCDCNet
from pwcnet_tpu.train_lib.checkpoint import load_params

__all__ = ["factor_crop", "FlowPredictor", "load_image"]


def factor_crop(image: np.ndarray, factor: int = 64) -> np.ndarray:
    """Crop H and W down to multiples of ``factor`` (top-left anchored)."""
    assert image.ndim == 3
    h, w, _ = image.shape
    return image[: factor * (h // factor), : factor * (w // factor)]


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


class FlowPredictor:
    """PWCDCNet inference with checkpoint loading and shape-cached jit."""

    def __init__(
        self,
        checkpoint: Optional[str] = None,
        num_levels: int = 6,
        search_range: int = 4,
        warp_type: str = "bilinear",
        use_dc: bool = False,
        output_level: int = 4,
        dtype=jnp.float32,
        use_pallas: str | bool = "auto",
        use_fused: str | bool = "auto",
        fused_pyramid: str | int = "auto",
        fused_estimator: str | int = "auto",
        mm_resize: str | bool = "auto",
        batched_pyramid: str | bool = "auto",
        size_handling: str = "crop",
        spatial: int = 1,
        data: int = 1,
        mesh=None,
        device_normalize: bool = True,
    ):
        """``size_handling``: how non-multiple-of-2**num_levels frames are
        made jit-shaped — 'crop' (reference behavior: top-left factor
        crop, test.py:13-17) or 'pad' (edge-replicate up to the next
        multiple and crop the output flow back, keeping every input
        pixel — useful for full-frame Sintel eval at 436 rows).

        ``device_normalize``: ship frames to the device as uint8 and run
        the /255 normalization in-graph, cutting host->device transfer
        bytes 4x (the training feed already does this —
        ``device_prefetch`` uint8 auto-normalize). XLA lowers the f32
        division to a reciprocal multiply, so normalized inputs differ
        from the host path by at most 1 ulp (~6e-8) — orders of
        magnitude below the 0.05 px parity budget and below bf16
        serving noise. False restores host-side normalization + f32
        transfer (the bit-exact-reference path).

        ``spatial``/``data``/``mesh``: multi-chip serving. ``spatial=N``
        shards the frame's H axis over N devices (activations — the HBM
        cost at large frames — are split N ways, so frames whose
        activations OOM one chip become servable); ``data=M`` shards the
        batch. Either builds a (data x spatial) mesh over the first
        data*spatial devices, or pass a prebuilt mesh with those axis
        names. The flow field is bit-equivalent to single-device serving
        (tests/test_spatial.py::TestSpatialServing)."""
        if size_handling not in ("crop", "pad"):
            raise ValueError(f"size_handling must be crop|pad: {size_handling!r}")
        self.size_handling = size_handling
        if use_pallas == "auto":
            use_pallas = jax.devices()[0].platform not in ("cpu",)
        if mesh is None and (spatial > 1 or data > 1):
            from pwcnet_tpu.parallel import make_mesh

            n = data * spatial
            if len(jax.devices()) < n:
                raise ValueError(
                    f"data({data}) x spatial({spatial}) needs {n} devices, "
                    f"have {len(jax.devices())}"
                )
            mesh = make_mesh(jax.devices()[:n], data=data, spatial=spatial)
        self.mesh = mesh
        spatial_on = mesh is not None and mesh.shape.get("spatial", 1) > 1
        cv_fn = warp_cv_fn = plevel_fn = guard_fn = None
        if use_fused == "auto":
            use_fused = bool(use_pallas) and warp_type == "bilinear"
        if spatial_on:
            # explicit shard_map serving path: fused Pallas kernels run
            # per H-shard with ppermute halo exchange / all-gathered
            # frame-1 (GSPMD cannot partition a pallas_call); XLA
            # formulations inside the same shard_map when use_pallas=False
            from pwcnet_tpu.parallel import (
                make_spatial_cost_volume,
                make_spatial_guard,
                make_spatial_pyramid_level,
                make_spatial_warped_cv,
            )

            cv_fn = make_spatial_cost_volume(mesh, use_pallas=use_pallas)
            if use_fused:
                warp_cv_fn = make_spatial_warped_cv(mesh, use_pallas=use_pallas)
            if use_pallas:
                plevel_fn = make_spatial_pyramid_level(mesh)
            # keeps tiny levels spatially unsharded (halo/collective
            # overhead outweighs their compute; also the gradient-side
            # GSPMD guard, moot for forward-only serving)
            guard_fn = make_spatial_guard(mesh)
        elif use_pallas:
            from pwcnet_tpu.ops.pallas import (
                cost_volume_pallas,
                warped_cost_volume,
            )

            cv_fn = cost_volume_pallas
            if use_fused:
                warp_cv_fn = warped_cost_volume
        if fused_pyramid == "auto":
            # the fused Pallas conv kernel wins on the two finest
            # (small-C) levels; it falls back internally for odd sizes
            fused_pyramid = 2 if use_pallas else 0
        if fused_estimator == "auto":
            # fused 6-conv estimator chain: opt-in only. Measured SLOWER
            # than the XLA convs at the serving shapes (448x1024 b4 bf16:
            # 437 -> 411 pairs/s) — the estimator's wide-C convs already
            # fill the MXU; see docs/DESIGN.md round-3 negative result.
            fused_estimator = 0
        if mm_resize == "auto":
            # matmul-formulated resize: measured e2e win on TPU (PARITY
            # §6); keep the take/phase path on CPU where there's no MXU
            mm_resize = bool(use_pallas)
        if batched_pyramid == "auto":
            # both frames through the extractor as one 2B-batch call:
            # identical per-sample math and half the pyramid dispatches,
            # but measured SLOWER with the fused pyramid kernels at the
            # serving shapes (448x1024 b8 bf16: 569 -> 513 pairs/s — the
            # 2-plane kernel prep + grid lose more at 2B than the saved
            # dispatches buy; neutral with the XLA pyramid, 429 vs 425).
            # Kept as an opt-in A/B; see docs/DESIGN.md round 5.
            batched_pyramid = False
        self.model = PWCDCNet(
            num_levels=num_levels,
            search_range=search_range,
            warp_type=warp_type,
            use_dc=use_dc,
            output_level=output_level,
            dtype=dtype,
            mm_resize=bool(mm_resize),
            batched_pyramid=bool(batched_pyramid),
            cost_volume_fn=cv_fn,
            warp_cv_fn=warp_cv_fn,
            pyramid_level_fn=plevel_fn,
            spatial_guard_fn=guard_fn,
            fused_pyramid_levels=int(fused_pyramid),
            fused_estimator_levels=(
                0 if spatial_on else int(fused_estimator)
            ),
        )
        self.num_levels = num_levels
        self.crop_factor = 2**num_levels
        self.device_normalize = bool(device_normalize)
        self._params = None
        self._checkpoint = checkpoint
        self._jit_cache: dict = {}

    # -- params -----------------------------------------------------------
    def _init_params(self, h: int, w: int):
        # PWCDCNet is fully convolutional: the parameter tree (shapes,
        # names, AND init draws — flax initializers sample per kernel
        # shape on a module-structure-determined RNG path) is identical
        # for every legal frame size, so initialize a plain twin model
        # (same architecture, default XLA ops — the custom kernel/mesh
        # fns only change activation compute) at the 2**num_levels
        # minimum frame instead of tracing the real model at (h, w):
        # at serving sizes an eager full-frame init costs a full-frame
        # forward (minutes at 8 k frames, worse when the model's ops are
        # mesh-sharded shard_maps that collective-exchange eagerly).
        del h, w
        f = self.crop_factor
        init_model = PWCDCNet(
            num_levels=self.num_levels,
            search_range=self.model.search_range,
            warp_type=self.model.warp_type,
            use_dc=self.model.use_dc,
            output_level=self.model.output_level,
            dtype=self.model.dtype,
        )
        imgs = jnp.zeros((1, f, f, 3), self.model.dtype)
        variables = init_model.init(jax.random.PRNGKey(0), imgs, imgs)
        params = variables["params"]
        if self._checkpoint is not None:
            if str(self._checkpoint).endswith((".ckpt", ".ckpt.index")):
                from pwcnet_tpu.train_lib.tf_converter import (
                    load_tf_checkpoint_params,
                )

                params = load_tf_checkpoint_params(self._checkpoint, params)
            else:
                params = load_params(self._checkpoint, params)
        else:
            print("!!! Inference with randomly initialized model !!!")
        return params

    def params_for(self, h: int, w: int):
        if self._params is None:
            params = self._init_params(h, w)
            if self.mesh is not None:
                # params live replicated on every mesh device (pinning
                # them avoids per-call GSPMD resharding of the weights)
                from pwcnet_tpu.parallel import replicate

                params = replicate(params, self.mesh)
            self._params = params
        return self._params

    def _put(self, images):
        """Place a (B, H, W, 3) device input under the serving mesh's
        layout: H over 'spatial', batch over 'data' when it divides."""
        if self.mesh is None:
            return jnp.asarray(images)
        from jax.sharding import NamedSharding, PartitionSpec as P

        b_axis = (
            "data"
            if self.mesh.shape.get("data", 1) > 1
            and images.shape[0] % self.mesh.shape["data"] == 0
            else None
        )
        s_axis = "spatial" if self.mesh.shape.get("spatial", 1) > 1 else None
        sharding = NamedSharding(self.mesh, P(b_axis, s_axis, None, None))
        return jax.device_put(jnp.asarray(images), sharding)

    # -- forward ----------------------------------------------------------
    def _jitted(self, h: int, w: int):
        # per-instance cache: an lru_cache on the (bound) method would
        # hold a strong ref to self forever (leaking params + compiled
        # executables in long-lived processes) and share one eviction
        # budget across every predictor
        try:
            return self._jit_cache[(h, w)]
        except KeyError:
            pass

        def fwd(params, images_0, images_1):
            if jnp.issubdtype(images_0.dtype, jnp.integer):
                # device-side /255 (XLA lowers to reciprocal-multiply:
                # <=1 ulp from the host path's IEEE division)
                images_0 = images_0.astype(jnp.float32) / jnp.float32(255.0)
                images_1 = images_1.astype(jnp.float32) / jnp.float32(255.0)
            return self.model.apply({"params": params}, images_0, images_1)

        fn = jax.jit(fwd)
        self._jit_cache[(h, w)] = fn
        return fn

    def __call__(self, image_0: np.ndarray, image_1: np.ndarray):
        """Run on a raw uint8 frame pair.

        Returns (flow_final (H', W', 2) np.float32 pixels, pyramid list in
        pixel units, cropped normalized frames (2, H', W', 3)).
        """
        orig_h, orig_w = image_0.shape[:2]
        if self.size_handling == "pad":
            f = self.crop_factor
            ph = -(-orig_h // f) * f
            pw = -(-orig_w // f) * f
            pad = ((0, ph - orig_h), (0, pw - orig_w), (0, 0))
            img0 = np.pad(image_0, pad, mode="edge")
            img1 = np.pad(image_1, pad, mode="edge")
        else:
            img0 = factor_crop(image_0, self.crop_factor)
            img1 = factor_crop(image_1, self.crop_factor)
        h, w = img0.shape[:2]
        stacked = np.stack([img0, img1])
        params = self.params_for(h, w)
        fwd = self._jitted(h, w)
        dev = stacked if self.device_normalize else (
            stacked.astype(np.float32) / 255.0
        )
        flow_final, pyramid = fwd(
            params, self._put(dev[None, 0]), self._put(dev[None, 1])
        )
        # returned frames stay normalized f32 regardless of transfer dtype
        images = stacked.astype(np.float32) / 255.0
        pyramid_px = [
            np.asarray(f[0], np.float32) * (20.0 / 2 ** (self.num_levels - l))
            for l, f in enumerate(pyramid)
        ]
        flow_out = np.asarray(flow_final[0], np.float32)
        if self.size_handling == "pad":
            flow_out = flow_out[:orig_h, :orig_w]
        return flow_out, pyramid_px, images

    def raw_forward(self, images: jnp.ndarray):
        """Jitted forward on a preprocessed (1, 2, H, W, 3) batch (for
        latency benchmarking, like the reference's --time loop)."""
        h, w = images.shape[2], images.shape[3]
        params = self.params_for(h, w)
        fwd = self._jitted(h, w)
        return fwd(params, self._put(images[:, 0]), self._put(images[:, 1]))

    # -- pipelined sequence inference -------------------------------------
    def _preprocess(self, image: np.ndarray) -> np.ndarray:
        if self.size_handling == "pad":
            f = self.crop_factor
            h, w = image.shape[:2]
            pad = (
                (0, -(-h // f) * f - h),
                (0, -(-w // f) * f - w),
                (0, 0),
            )
            image = np.pad(image, pad, mode="edge")
        else:
            image = factor_crop(image, self.crop_factor)
        if self.device_normalize:
            return np.ascontiguousarray(image)  # uint8; /255 runs in-graph
        return image.astype(np.float32) / 255.0

    def predict_sequence(
        self, frames, depth: int = 2, batch: int = 1, fetch: str = "all"
    ):
        """Pipelined, batched inference over consecutive frame pairs.

        The reference's sequence driver dispatches one blocking
        ``sess.run`` per pair (test_continuous.py:42-65); a literal port
        of that loop caps throughput at the host round-trip (~25-30 ms on
        this TPU relay — ~1/14 of what the chip can do). Three changes
        recover device-rate streaming:

        - **batching**: ``batch`` consecutive pairs run per dispatch —
          frames [i..i+B] become (images_0 = [i..i+B), images_1 =
          [i+1..i+B]); a frame sequence is an almost-free batch-B
          workload, and b4/b8 is where the chip's throughput knee sits
          (PARITY.md §6 batch scaling);
        - **pipelining**: up to ``depth`` dispatched batches stay in
          flight (JAX dispatch is asynchronous), so host decode and the
          fetch RTT overlap device compute;
        - **async device->host copies**: transfers start as soon as each
          batch's compute finishes (``copy_to_host_async``), not when the
          host gets around to reading it.

        Each frame is preprocessed once and reused as the next pair's
        frame 0. The tail batch is padded by repeating the last frame
        (static shapes — no recompilation) and the padding pairs are
        dropped from the output.

        Args:
          frames: iterable of frame sources — file paths or uint8 HxWx3
            arrays. Consecutive elements form the pairs.
          depth: number of in-flight device computations.
          batch: consecutive pairs per dispatch.
          fetch: 'all' yields (flow_px, pyramid_px, images) per pair like
            ``__call__``; 'flow' skips the pyramid/image transfers and
            yields only flow_px (sequence-throughput mode).

        Yields per consecutive pair, in order.
        """
        from collections import deque

        def load(src):
            img = load_image(src) if isinstance(src, str) else src
            return img.shape[:2], self._preprocess(img)

        def dispatch(buf, n_valid):
            """buf: list of batch+1 (orig_hw, frame) tuples."""
            imgs = np.stack([f for _, f in buf])  # (B+1, H, W, 3)
            h, w = imgs.shape[1:3]
            params = self.params_for(h, w)
            fwd = self._jitted(h, w)
            out = fwd(
                params, self._put(imgs[:-1]), self._put(imgs[1:])
            )  # asynchronous dispatch — no host sync here
            flow_final, pyramid = out
            # start the device->host transfers behind the compute
            flow_final.copy_to_host_async()
            if fetch != "flow":
                for f in pyramid:
                    f.copy_to_host_async()
            return (out, imgs, [hw for hw, _ in buf[:-1]], n_valid)

        def finalize(item):
            (flow_final, pyramid), imgs, orig_hws, n_valid = item
            if fetch != "flow" and imgs.dtype == np.uint8:
                # yielded frames stay normalized f32 (API contract);
                # only the device transfer rode the uint8 fast path
                imgs = imgs.astype(np.float32) / 255.0
            flows = np.asarray(flow_final, np.float32)
            for i in range(n_valid):
                orig_h, orig_w = orig_hws[i]
                flow_out = flows[i]
                if self.size_handling == "pad":
                    flow_out = flow_out[:orig_h, :orig_w]
                if fetch == "flow":
                    yield flow_out
                else:
                    pyramid_px = [
                        np.asarray(f[i], np.float32)
                        * (20.0 / 2 ** (self.num_levels - l))
                        for l, f in enumerate(pyramid)
                    ]
                    yield flow_out, pyramid_px, imgs[i : i + 2]

        pending: deque = deque()
        buf: list = []
        for src in frames:
            buf.append(load(src))
            if len(buf) == batch + 1:
                pending.append(dispatch(buf, batch))
                buf = buf[-1:]  # last frame starts the next batch
                if len(pending) >= depth:
                    yield from finalize(pending.popleft())
        if len(buf) >= 2:  # tail: pad with the last frame
            n_valid = len(buf) - 1
            buf = buf + [buf[-1]] * (batch + 1 - len(buf))
            pending.append(dispatch(buf, n_valid))
        while pending:
            yield from finalize(pending.popleft())
