"""Tests for .flo I/O, flow color coding, and experiment utilities."""

import json
import os

import numpy as np
import pytest

from pwcnet_tpu.utils import (
    ExperimentSaver,
    load_flow,
    make_colorwheel,
    save_config,
    save_flow,
    vis_flow,
    vis_flow_pyramid,
)


class TestFloIO:
    def test_roundtrip(self, rng, tmp_path):
        flow = (rng.standard_normal((7, 9, 2)) * 20).astype(np.float32)
        p = tmp_path / "a.flo"
        save_flow(p, flow)
        got = load_flow(p)
        np.testing.assert_array_equal(got, flow)

    def test_bad_magic_returns_none(self, tmp_path):
        p = tmp_path / "bad.flo"
        p.write_bytes(np.array([1.0], np.float32).tobytes() + b"\x00" * 16)
        assert load_flow(p) is None

    def test_truncated_raises(self, tmp_path):
        p = tmp_path / "trunc.flo"
        with open(p, "wb") as f:
            np.array([202021.25], np.float32).tofile(f)
            np.array([4], np.int32).tofile(f)
            np.array([4], np.int32).tofile(f)
            np.zeros(3, np.float32).tofile(f)  # should be 32 floats
        with pytest.raises(ValueError):
            load_flow(p)

    def test_shape_validation(self, tmp_path):
        with pytest.raises(ValueError):
            save_flow(tmp_path / "x.flo", np.zeros((4, 4, 3), np.float32))

    def test_binary_layout(self, tmp_path):
        """Exact Middlebury byte layout: magic f32, w i32, h i32, data."""
        flow = np.arange(2 * 3 * 2, dtype=np.float32).reshape(2, 3, 2)
        p = tmp_path / "layout.flo"
        save_flow(p, flow)
        raw = p.read_bytes()
        assert np.frombuffer(raw[:4], np.float32)[0] == np.float32(202021.25)
        assert np.frombuffer(raw[4:8], np.int32)[0] == 3  # width first
        assert np.frombuffer(raw[8:12], np.int32)[0] == 2
        np.testing.assert_array_equal(
            np.frombuffer(raw[12:], np.float32), flow.ravel()
        )


class TestColorWheel:
    def test_reference_structure(self):
        """Matches the reference's 55-color wheel exactly
        (flow_utils.py:32-79 construction)."""
        wheel = make_colorwheel()
        assert wheel.shape == (55, 3)
        # First 15 (RY): R=255, G ramps floor(255*i/15), B=0.
        np.testing.assert_array_equal(wheel[:15, 0], 255)
        np.testing.assert_array_equal(
            wheel[:15, 1], np.floor(255 * np.arange(15) / 15)
        )
        np.testing.assert_array_equal(wheel[:15, 2], 0)
        # YG rows 15..20: R ramps down 255 - floor(255*i/6), G=255.
        np.testing.assert_array_equal(
            wheel[15:21, 0], 255 - np.floor(255 * np.arange(6) / 6)
        )
        np.testing.assert_array_equal(wheel[15:21, 1], 255)
        # MR rows 49..54: B ramps down, R=255.
        np.testing.assert_array_equal(wheel[49:55, 0], 255)
        np.testing.assert_array_equal(
            wheel[49:55, 2], 255 - np.floor(255 * np.arange(6) / 6)
        )

    def test_vis_flow_properties(self, rng):
        flow = (rng.standard_normal((8, 10, 2)) * 5).astype(np.float32)
        img = vis_flow(flow)
        assert img.shape == (8, 10, 3)
        assert img.dtype == np.uint8

    def test_vis_flow_zero_flow_is_white(self):
        img = vis_flow(np.zeros((4, 4, 2), np.float32))
        # radius 0 -> col = 1 - 0*(1-col) = 1 -> 255 everywhere
        np.testing.assert_array_equal(img, 255)

    def test_vis_flow_handles_unknown_and_nan(self):
        flow = np.full((4, 4, 2), 1e10, np.float32)
        img = vis_flow(flow)
        assert img.dtype == np.uint8
        flow2 = np.zeros((4, 4, 2), np.float32)
        flow2[0, 0] = np.nan
        img2 = vis_flow(flow2)
        assert np.all(np.isfinite(img2.astype(np.float64)))

    def test_vis_flow_pyramid_writes_file(self, rng, tmp_path):
        pyr = [
            (rng.standard_normal((4 * 2**l, 4 * 2**l, 2))).astype(np.float32)
            for l in range(3)
        ]
        gt = rng.standard_normal((16, 16, 2)).astype(np.float32)
        images = rng.random((2, 16, 16, 3)).astype(np.float32)
        out = tmp_path / "pyr.png"
        vis_flow_pyramid(pyr, gt, images, str(out))
        assert out.exists() and out.stat().st_size > 0


class TestConfigUtils:
    def test_save_config(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        fn = save_config({"a": 1, "b": "x"}, "cfg.json")
        assert json.loads(open(fn).read()) == {"a": 1, "b": "x"}

    def test_save_config_rejects_non_dict(self):
        with pytest.raises(TypeError):
            save_config([1, 2])

    def test_experiment_saver_moves_artifacts(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        os.mkdir("figure")
        open("figure/f.txt", "w").write("x")
        saver = ExperimentSaver(logdir="logs/run1")
        saver.append(["figure"])
        saver.save()
        assert (tmp_path / "logs/run1/figure/f.txt").exists()
        assert not (tmp_path / "figure").exists()


class TestProfiling:
    def test_device_timeit_runs_and_is_positive(self, rng):
        import jax.numpy as jnp

        from pwcnet_tpu.utils import device_timeit

        x = jnp.asarray(rng.random((8, 128)).astype(np.float32))
        t = device_timeit(lambda a: a * 2.0 + 1.0, x, iters=5)
        assert t > 0

    def test_flops_estimate(self, rng):
        import jax.numpy as jnp

        from pwcnet_tpu.utils import flops_estimate

        a = jnp.asarray(rng.random((64, 64)).astype(np.float32))
        b = jnp.asarray(rng.random((64, 64)).astype(np.float32))
        res = flops_estimate(lambda x, y: x @ y, a, b)
        assert res["flops"] and res["flops"] >= 2 * 64**3 * 0.9

    def test_trace_context_writes_profile(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from pwcnet_tpu.utils import trace

        with trace(str(tmp_path / "trace")) as logdir:
            jnp.ones((8, 8)).sum().block_until_ready()
        import pathlib

        files = list(pathlib.Path(logdir).rglob("*"))
        assert files, "no trace artifacts written"


class TestShowProgress:
    def test_bar_and_counts(self, capsys):
        from pwcnet_tpu.utils import show_progress

        show_progress(3, 5, 10, loss=0.25)
        out = capsys.readouterr().out
        assert "3 epoch" in out
        assert "[5/10" in out
        assert "loss: 0.25" in out
        assert "50.0%" in out
        assert "#" in out and "-" in out

    def test_full_and_empty(self, capsys):
        from pwcnet_tpu.utils import show_progress

        show_progress(1, 0, 4, width=4)
        show_progress(1, 4, 4, width=4)
        out = capsys.readouterr().out
        assert "|----|" in out and "|####|" in out


class TestOpProfile:
    @pytest.mark.slow
    def test_returns_op_rows(self, rng, tmp_path):
        import jax.numpy as jnp

        from pwcnet_tpu.utils.profiling import op_profile

        x = jnp.asarray(rng.random((64, 64)).astype("float32"))
        rows = op_profile(
            lambda a: (a @ a).sum(), x, iters=2, logdir=str(tmp_path)
        )
        assert rows, "no profiler events captured"
        assert {"name", "ms_per_iter", "count"} <= set(rows[0])
        assert all(r["ms_per_iter"] >= 0 for r in rows)
