"""High-level Trainer driving the full training loop.

The TPU-native counterpart of the reference's Trainer (train.py:18-172):

- datasets/loaders from `pwcnet_tpu.data` (threaded decode + device
  prefetch instead of torch DataLoader + feed_dict);
- a donated jit train step, data-parallel over a device mesh;
- per-epoch validation (aggregated, unlike the reference's per-batch
  summaries), flow-pyramid visualization, and full-state checkpoints;
- metrics to ``logs/history_<ts>/{train,val}`` as JSONL (+ TensorBoard when
  available), config snapshot + artifact collection via ExperimentSaver.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from pwcnet_tpu.data import DataLoader, device_prefetch, get_dataset
from pwcnet_tpu.models import PWCDCNet
from pwcnet_tpu.parallel import batch_sharding, make_mesh
from pwcnet_tpu.train_lib.checkpoint import (
    restore_checkpoint_auto,
    save_checkpoint,
    save_checkpoint_orbax,
    wait_for_orbax_saves,
)
from pwcnet_tpu.train_lib.metrics import MetricsLogger
from pwcnet_tpu.train_lib.step import (
    create_train_state,
    make_eval_step,
    make_forward,
    make_train_step,
)
from pwcnet_tpu.utils.config import ExperimentSaver, timestamp
from pwcnet_tpu.utils.flow_viz import vis_flow_pyramid

__all__ = ["Trainer"]


class _NullLogger:
    """No-op MetricsLogger stand-in for non-zero processes."""

    def log(self, *a, **k):
        pass

    def close(self):
        pass


class Trainer:
    def __init__(self, args, mesh=None, spatial: int = 1):
        self.args = args
        self.is_main = jax.process_index() == 0
        if mesh is None:
            # data axis must divide the global batch (per-process
            # batch_size x process_count); use the largest device count
            # that does (leftover devices idle, warned).
            import math

            import jax as _jax

            global_batch = args.batch_size * _jax.process_count()
            avail = len(_jax.devices()) // spatial
            data = math.gcd(global_batch, avail)
            if data * spatial < len(_jax.devices()) and self.is_main:
                print(
                    f"note: using {data * spatial}/{len(_jax.devices())} "
                    f"devices (global batch {global_batch} limits the "
                    "data axis)"
                )
            mesh = make_mesh(
                _jax.devices()[: data * spatial], data=data, spatial=spatial
            )
        self.mesh = mesh
        self._build_dataloader()
        self._build_model()
        self._build_logging()

    # ------------------------------------------------------------------
    def _build_dataloader(self):
        args = self.args
        dset = get_dataset(args.dataset)
        seed = int(getattr(args, "seed", 0) or 0)
        data_args = dict(
            dataset_dir=args.dataset_dir,
            origin_size=None,
            crop_type=args.crop_type,
            crop_shape=args.crop_shape,
            resize_shape=args.resize_shape,
            resize_scale=args.resize_scale,
            random_flip=getattr(args, "random_flip", False),
            seed=seed,
        )
        tset = dset(train_or_val="train", **data_args)
        vset = dset(train_or_val="val", **data_args)
        self.image_size = tset.image_size
        loader_args = dict(
            batch_size=args.batch_size,
            num_workers=args.num_workers,
            drop_last=True,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            seed=seed,
        )
        self.tloader = DataLoader(tset, shuffle=True, **loader_args)
        self.vloader = DataLoader(vset, shuffle=False, **loader_args)
        # per-process batch count (multi-host loaders yield a disjoint
        # 1/process_count slice — the tqdm total and resume-skip math
        # must match what THIS process iterates)
        self.num_batches = len(self.tloader)
        if self.is_main:
            print(
                f"Found {len(tset.samples)} samples -> "
                f"{self.num_batches} mini-batches/process"
            )

    def _build_model(self):
        args = self.args
        cv_fn = warp_cv_fn = pyramid_level_fn = spatial_guard_fn = None
        use_pallas = bool(getattr(args, "pallas", False))
        use_fused = getattr(args, "fused", True) and (
            args.warp_type == "bilinear"
        )
        if self.mesh.shape.get("spatial", 1) > 1:
            # explicit shard_map path: all the fused Pallas kernels run
            # per shard (GSPMD cannot partition a pallas_call) — cost
            # volume and pyramid levels with ppermute halo exchange over
            # ICI, the fused warp+CV against the all-gathered frame
            # (XLA formulations inside the same shard_map when
            # --no-pallas)
            from pwcnet_tpu.parallel import (
                make_spatial_cost_volume,
                make_spatial_guard,
                make_spatial_pyramid_level,
                make_spatial_warped_cv,
            )

            # tiny pyramid levels stay spatially unsharded — required
            # for correct gradients on (data x spatial) meshes (GSPMD
            # conv-grad miscompile; parallel/spatial.py docstring)
            spatial_guard_fn = make_spatial_guard(self.mesh)
            cv_fn = make_spatial_cost_volume(self.mesh, use_pallas=use_pallas)
            if use_fused:
                warp_cv_fn = make_spatial_warped_cv(
                    self.mesh, use_pallas=use_pallas
                )
            if use_pallas:
                pyramid_level_fn = make_spatial_pyramid_level(self.mesh)
        elif use_pallas:
            from pwcnet_tpu.ops.pallas import (
                cost_volume_pallas,
                warped_cost_volume,
            )

            cv_fn = cost_volume_pallas
            if use_fused:
                # one VMEM pass for warp+correlation in the forward; the
                # backward runs the scatter-free Pallas warp transpose
                warp_cv_fn = warped_cost_volume
        import jax.numpy as jnp

        dtype = (
            jnp.bfloat16
            if getattr(args, "dtype", "float32") == "bfloat16"
            else jnp.float32
        )
        self.model = PWCDCNet(
            dtype=dtype,
            num_levels=args.num_levels,
            search_range=args.search_range,
            warp_type=args.warp_type,
            use_dc=args.use_dc,
            output_level=args.output_level,
            cost_volume_fn=cv_fn,
            warp_cv_fn=warp_cv_fn,
            spatial_guard_fn=spatial_guard_fn,
            remat=getattr(args, "remat", False),
            # fused Pallas conv fwd + gz-chain bwd on the two finest
            # pyramid levels (measured -9% step time at 384x448 b4 bf16);
            # under spatial sharding they run per shard via shard_map
            fused_pyramid_levels=2 if use_pallas else 0,
            pyramid_level_fn=pyramid_level_fn,
            # fused estimator chain (opt-in, default OFF): measured 10%
            # SLOWER than the XLA convs at 384x448 b4 bf16 (243 -> 219
            # pairs/s) — the estimator's C>=96 convs already fill the MXU
            # under XLA, so saving the correlation-side transposes does
            # not pay for the kernel's row-loop; see docs/DESIGN.md
            # "Round-3: fused estimator chain (negative result)"
            fused_estimator_levels=(
                getattr(args, "fused_estimator", 0)
                if use_pallas and self.mesh.shape.get("spatial", 1) == 1
                else 0
            ),
        )
        h, w = self.image_size
        self.state = create_train_state(
            self.model,
            jax.random.PRNGKey(getattr(self.args, "seed", 0)),
            (1, h, w, 3),
            learning_rate=args.lr,
            lr_scheduling=args.lr_scheduling,
        )
        self._resume_epoch = 0
        self._resume_batch = 0
        if args.resume is not None:
            print(f"Loading learned model from checkpoint {args.resume}")
            # auto-detects the backend: orbax directory vs msgpack file
            self.state = restore_checkpoint_auto(args.resume, self.state)
            cursor = self._read_cursor(args.resume)
            if cursor is not None:
                self._resume_epoch = int(cursor.get("epoch", 0))
                self._resume_batch = int(cursor.get("batch", 0))
                print(
                    "sample-exact resume: continuing epoch "
                    f"{self._resume_epoch + 1} at batch {self._resume_batch}"
                )

        # pin the replicated TrainState onto the mesh's devices; grads
        # are also constrained replicated inside the step (without the
        # pin GSPMD involuntarily remats the tiny bias-grad accumulators
        # on data x spatial meshes — VERDICT r3 #2)
        from pwcnet_tpu.parallel import replicate

        self.state = replicate(self.state, self.mesh)
        loss_kwargs = dict(
            loss_name=args.loss,
            weights=tuple(args.weights),
            gamma=args.gamma,
            epsilon=args.epsilon,
            q=args.q,
        )
        self.train_step = make_train_step(
            self.model, mesh=self.mesh, **loss_kwargs
        )
        self.eval_step = make_eval_step(self.model, **loss_kwargs)
        self.forward = make_forward(self.model)
        # under --spatial N batches land H-sharded from the host (images
        # (B,2,H,W,3): H axis 2; flows (B,H,W,2): H axis 1) — otherwise
        # GSPMD reshards every step
        spatial_on = self.mesh.shape.get("spatial", 1) > 1
        self.batch_shardings = (
            batch_sharding(self.mesh, 2 if spatial_on else None),
            batch_sharding(self.mesh, 1 if spatial_on else None),
        )

    def _build_logging(self):
        """Metrics/artifacts are written by process 0 only (multi-host:
        params and metrics are replicated, so other processes would write
        identical copies)."""
        if not self.is_main:
            self.logdir = None
            self.tlogger = self.vlogger = _NullLogger()
            self.exp_saver = None
            return
        logdir = "logs/history_" + timestamp()
        self.logdir = logdir
        self.tlogger = MetricsLogger(logdir + "/train")
        self.vlogger = MetricsLogger(logdir + "/val")
        self.exp_saver = ExperimentSaver(logdir=logdir, parse_args=self.args)
        print(f"Setup completed, histories are logged in {logdir}")

    # ------------------------------------------------------------------
    def _install_preemption_handler(self):
        """Save a resumable full-state checkpoint on SIGTERM/SIGINT.

        The reference loses up to a full epoch on preemption (its only
        checkpoints are per-epoch, train.py:164-166); here the current
        TrainState is flushed to ./model/model_preempt.msgpack before
        exiting, and --resume restores it mid-epoch (incl. the LR step).
        """
        import signal

        self._preempted = False

        def _handler(signum, frame):
            self._preempted = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, _handler)
            except ValueError:  # not the main thread
                break

    @staticmethod
    def _cursor_path(ckpt_path: str) -> str:
        """Sidecar path of a checkpoint's loader cursor: X.msgpack ->
        X.cursor.json; an orbax directory X -> sibling X.cursor.json."""
        p = str(ckpt_path)
        if p.endswith(".msgpack"):
            p = p[: -len(".msgpack")]
        return p + ".cursor.json"

    def _read_cursor(self, ckpt_path):
        import json
        import re

        path = self._cursor_path(ckpt_path)
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        # No sidecar (epoch checkpoints are saved async and cursor-less):
        # the epoch is in the filename — model_N holds the state AFTER
        # epoch N, so resume continues at epoch N, batch 0. Without this,
        # resuming model_N replayed the (seed, epoch)-deterministic
        # shuffle orders from epoch 0.
        m = re.fullmatch(
            r"model_(\d+)(?:\.msgpack)?",
            os.path.basename(str(ckpt_path).rstrip("/")),
        )
        if m:
            return {"epoch": int(m.group(1)), "batch": 0}
        return None

    def _save_state(
        self, stem: str, wait: bool = True, cursor: dict | None = None
    ) -> str | None:
        """Save the TrainState under ./model/<stem> with the configured
        backend (msgpack file or orbax directory). Process 0 only (the
        state is replicated across processes).

        ``wait=False`` (orbax backend): the file write overlaps the next
        epoch's training; `train()` flushes in-flight saves before exit
        and before preemption saves.

        ``cursor``: the loader position {"epoch", "batch"} to persist as
        a sidecar json, written AFTER the (atomic) state write. Any stale
        sidecar at the same path is removed first, so every crash window
        degrades to a cursor-less state — resume then replays the epoch
        from the top (conservative: samples may be double-counted, like
        the reference's <=1-epoch loss, train.py:164-166, but never
        skipped). Writing the cursor first would pair a NEW cursor with a
        STALE state on a crash between the two, and resume would silently
        skip samples that state never trained on."""
        if not self.is_main:
            return None
        import json

        os.makedirs("./model", exist_ok=True)
        if getattr(self.args, "ckpt_backend", "msgpack") == "orbax":
            path = f"./model/{stem}"
        else:
            path = f"./model/{stem}.msgpack"
        cpath = self._cursor_path(path)
        if os.path.exists(cpath):
            os.remove(cpath)  # stale/inherited cursor: see docstring
        if getattr(self.args, "ckpt_backend", "msgpack") == "orbax":
            # a cursor must never refer to a not-yet-durable state: force
            # the synchronous path when one is being written
            out = save_checkpoint_orbax(
                path, self.state, wait=wait or cursor is not None
            )
        else:
            out = save_checkpoint(path, self.state)
        if cursor is not None:
            with open(cpath, "w") as f:
                json.dump(cursor, f)
        return out

    def _handle_preemption(self, epoch: int, batch: int) -> bool:
        if not getattr(self, "_preempted", False):
            return False
        path = self._save_state(
            "model_preempt", cursor={"epoch": epoch, "batch": batch}
        )
        print(
            f"\npreempted: state saved to {path} (step "
            f"{int(self.state.step)}, epoch {epoch} batch {batch}); "
            "--resume continues sample-exactly"
        )
        return True

    def train(self):
        args = self.args
        log_interval = getattr(args, "log_interval", 1000)
        self._install_preemption_handler()
        from tqdm import tqdm

        for epoch in range(self._resume_epoch, args.num_epochs):
            # -- training ------------------------------------------------
            # Per-batch progress like the reference (train.py:119). Metrics
            # are only fetched at log_interval — reading them every batch
            # would force a device sync per step.
            # Sample-exact resume: pin the loader to this epoch's
            # deterministic order; on the resumed epoch skip the batches
            # the preempted run already trained on.
            self.tloader.epoch = epoch
            skip = self._resume_batch if epoch == self._resume_epoch else 0
            self.tloader.start_batch = skip
            batch_idx = skip
            last_metrics = None
            pbar = tqdm(
                total=self.num_batches,
                initial=skip,
                desc=f"epoch {epoch + 1}/{args.num_epochs}",
                unit="batch",
                leave=False,
                # auto-off on non-tty; always off on non-zero processes
                disable=None if self.is_main else True,
                dynamic_ncols=True,
            )
            for images, flows_gt in device_prefetch(
                iter(self.tloader), sharding=self.batch_shardings
            ):
                # flows arrive with the images' sharding layout already
                self.state, metrics = self.train_step(
                    self.state, images, flows_gt
                )
                last_metrics = metrics
                batch_idx += 1
                if self._handle_preemption(epoch, batch_idx):
                    pbar.close()
                    return self.state
                g_step = int(self.state.step)
                if g_step % log_interval == 0:
                    self.tlogger.log(
                        g_step,
                        {
                            "loss/pwc": metrics["loss"],
                            "EPE/source": metrics["epe"],
                        },
                    )
                    pbar.set_postfix(
                        loss=f"{float(metrics['loss']):.4f}",
                        epe=f"{float(metrics['epe']):.4f}",
                        refresh=False,
                    )
                pbar.update(1)
            pbar.close()
            g_step = int(self.state.step)

            # -- validation ----------------------------------------------
            # device_prefetch like training: decode + H2D transfer of
            # batch k+1 overlap eval of batch k (the per-batch float()
            # fetches below are the eval sync points)
            val_losses, val_epes = [], []
            val_batch = None
            for images, flows_gt in device_prefetch(
                iter(self.vloader), sharding=self.batch_shardings
            ):
                metrics = self.eval_step(self.state, images, flows_gt)
                val_losses.append(float(metrics["loss"]))
                val_epes.append(float(metrics["epe"]))
                val_batch = (images, flows_gt)
            if val_losses:
                self.vlogger.log(
                    g_step,
                    {
                        "loss/pwc": float(np.mean(val_losses)),
                        "EPE/source": float(np.mean(val_epes)),
                    },
                )

            # -- visualization --------------------------------------------
            # multi-process: skipped — the batch rows are sharded across
            # processes, and only process 0 could fetch row 0 anyway
            if (
                args.visualize
                and val_batch is not None
                and jax.process_count() == 1
            ):
                os.makedirs("./figure", exist_ok=True)
                images, flows_gt = val_batch
                _, pyramid = self.forward(
                    self.state.params, images[:, 0], images[:, 1]
                )
                flow_set = [
                    np.asarray(f[0]) * (20.0 / 2 ** (args.num_levels - l))
                    for l, f in enumerate(pyramid)
                ]
                vis_flow_pyramid(
                    flow_set,
                    np.asarray(flows_gt[0]),
                    np.asarray(images[0]),
                    f"./figure/flow_{str(epoch + 1).zfill(4)}.pdf",
                )

            # -- checkpoint ------------------------------------------------
            # orbax: async — the write overlaps the next epoch's steps
            self._save_state(f"model_{epoch + 1}", wait=False)
            if self.is_main:
                print(
                    f"epoch {epoch + 1}/{args.num_epochs} step {g_step} "
                    + (
                        f"loss {float(last_metrics['loss']):.4f} "
                        f"epe {float(last_metrics['epe']):.4f}"
                        if last_metrics is not None
                        else ""
                    )
                )

        wait_for_orbax_saves()  # flush the last async epoch save
        self.tlogger.close()
        self.vlogger.close()
        if self.exp_saver is not None:
            self.exp_saver.append(["./figure", "./model"])
            self.exp_saver.save()
        return self.state
