"""Data pipeline tests: dataset layouts, augmentation, loader, prefetch."""

import numpy as np
import pytest
from PIL import Image

from pwcnet_tpu.data import (
    DataLoader,
    FlyingChairs,
    SintelClean,
    SyntheticFlow,
    device_prefetch,
    get_dataset,
)
from pwcnet_tpu.utils import save_flow


def _make_sintel(root, scenes=("alley_1", "alley_2"), frames=4, hw=(36, 48)):
    rng = np.random.default_rng(0)
    h, w = hw
    for scene in scenes:
        img_dir = root / "training" / "clean" / scene
        flow_dir = root / "training" / "flow" / scene
        img_dir.mkdir(parents=True)
        flow_dir.mkdir(parents=True)
        for t in range(1, frames + 1):
            arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / f"frame_{t:04d}.png")
            if t < frames:
                save_flow(
                    flow_dir / f"frame_{t:04d}.flo",
                    rng.standard_normal((h, w, 2)).astype(np.float32),
                )


def _make_chairs(root, n=12, hw=(32, 40)):
    rng = np.random.default_rng(0)
    h, w = hw
    data = root / "data"
    data.mkdir(parents=True)
    for i in range(1, n + 1):
        for tag in ("img1", "img2"):
            arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(data / f"{i:05d}_{tag}.ppm")
        save_flow(
            data / f"{i:05d}_flow.flo",
            rng.standard_normal((h, w, 2)).astype(np.float32),
        )


class TestSintel:
    def test_scan_and_getitem(self, tmp_path):
        _make_sintel(tmp_path)
        ds = SintelClean(
            "train", tmp_path, crop_type="random", crop_shape=(24, 32)
        )
        # 2 scenes x 3 pairs = 6 total; 1-in-10 val split -> train keeps 6
        assert len(ds.samples) == 6
        assert ds.image_size == (24, 32)
        images, flow = ds[0]
        assert images.shape == (2, 24, 32, 3) and images.dtype == np.uint8
        assert flow.shape == (24, 32, 2) and flow.dtype == np.float32

    def test_no_crop_native_size(self, tmp_path):
        _make_sintel(tmp_path)
        ds = SintelClean("train", tmp_path, crop_type="none", crop_shape=None)
        assert ds.image_size == (36, 48)

    def test_missing_dir_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            SintelClean("train", tmp_path / "nope")


class TestFlyingChairs:
    def test_fallback_split(self, tmp_path):
        _make_chairs(tmp_path, n=20)
        tr = FlyingChairs("train", tmp_path, crop_type="none", crop_shape=None)
        va = FlyingChairs("val", tmp_path, crop_type="none", crop_shape=None)
        assert len(tr.samples) == 18 and len(va.samples) == 2
        assert not set(map(tuple, tr.samples)) & set(map(tuple, va.samples))

    def test_official_split_file(self, tmp_path):
        _make_chairs(tmp_path, n=10)
        (tmp_path / "FlyingChairs_train_val.txt").write_text(
            "\n".join(["1"] * 7 + ["2"] * 3)
        )
        tr = FlyingChairs("train", tmp_path, crop_type="none", crop_shape=None)
        va = FlyingChairs("val", tmp_path, crop_type="none", crop_shape=None)
        assert len(tr.samples) == 7 and len(va.samples) == 3


class TestAugmentation:
    def test_resize_scale_rescales_flow(self, tmp_path):
        _make_sintel(tmp_path, scenes=("a",), frames=2)
        # overwrite gt with constant flow (dx=4, dy=-2) for an exact check
        flo = (
            tmp_path / "training" / "flow" / "a" / "frame_0001.flo"
        )
        const = np.empty((36, 48, 2), np.float32)
        const[..., 0], const[..., 1] = 4.0, -2.0
        save_flow(flo, const)
        ds = SintelClean(
            "train",
            tmp_path,
            crop_type="none",
            crop_shape=None,
            resize_scale=0.5,
        )
        images, flow = ds[0]
        assert images.shape[1:3] == (18, 24)
        # constant field survives resampling; magnitudes halve with scale
        np.testing.assert_allclose(flow[..., 0], 2.0, atol=1e-4)
        np.testing.assert_allclose(flow[..., 1], -1.0, atol=1e-4)

    def test_origin_size_resizes_raw_frames_and_rescales_flow(
        self, tmp_path
    ):
        """origin_size normalizes the RAW frame size before crop: frames
        resample to (H, W) and flow magnitudes rescale per axis."""
        _make_sintel(tmp_path, scenes=("a",), frames=2)
        flo = tmp_path / "training" / "flow" / "a" / "frame_0001.flo"
        const = np.empty((36, 48, 2), np.float32)
        const[..., 0], const[..., 1] = 4.0, -2.0
        save_flow(flo, const)
        ds = SintelClean(
            "train",
            tmp_path,
            origin_size=(72, 24),  # H x2, W /2
            crop_type="none",
            crop_shape=None,
        )
        assert ds.image_size == (72, 24)
        images, flow = ds[0]
        assert images.shape == (2, 72, 24, 3)
        np.testing.assert_allclose(flow[..., 0], 2.0, atol=1e-4)
        np.testing.assert_allclose(flow[..., 1], -4.0, atol=1e-4)

    def test_origin_size_applies_before_crop(self, tmp_path):
        """crop_shape larger than the native frames is satisfiable after
        origin_size upscaling — proving the resize happens first."""
        _make_sintel(tmp_path, scenes=("a",), frames=2)
        ds = SintelClean(
            "train",
            tmp_path,
            origin_size=(72, 96),
            crop_type="random",
            crop_shape=(64, 64),  # > native (36, 48)
        )
        images, flow = ds[0]
        assert images.shape == (2, 64, 64, 3)
        assert flow.shape == (64, 64, 2)

    def test_flip_negates_flow(self):
        """Falsifiable flip check: force each flip via the per-call rng
        and compare against the unflipped sample — images reverse along
        the axis and the corresponding flow component negates."""

        class _Seq:
            def __init__(self, vals):
                self.vals = list(vals)

            def random(self):
                return self.vals.pop(0)

            def integers(self, *a, **k):
                raise AssertionError("no crop draws expected")

        ds = SyntheticFlow(
            "train", num_samples=4, image_shape=(16, 16), random_flip=True
        )
        # draws: (h, v); random() < 0.5 flips
        imgs_n, flow_n = ds.__getitem__(0, _Seq([1.0, 1.0]))
        imgs_h, flow_h = ds.__getitem__(0, _Seq([0.0, 1.0]))
        np.testing.assert_array_equal(imgs_h, imgs_n[:, :, ::-1])
        np.testing.assert_array_equal(
            flow_h, flow_n[:, ::-1] * np.array([-1.0, 1.0], np.float32)
        )
        imgs_v, flow_v = ds.__getitem__(0, _Seq([1.0, 0.0]))
        np.testing.assert_array_equal(imgs_v, imgs_n[:, ::-1])
        np.testing.assert_array_equal(
            flow_v, flow_n[::-1] * np.array([1.0, -1.0], np.float32)
        )

    def test_crop_too_large_raises(self, tmp_path):
        _make_sintel(tmp_path, scenes=("a",), frames=2)
        ds = SintelClean(
            "train", tmp_path, crop_type="random", crop_shape=(100, 100)
        )
        with pytest.raises(ValueError):
            ds[0]


class TestSynthetic:
    def test_known_flow(self):
        ds = SyntheticFlow("train", num_samples=8, image_shape=(32, 32))
        images, flow = ds[0]
        assert images.shape == (2, 32, 32, 3)
        dx, dy = flow[0, 0, 0], flow[0, 0, 1]
        # content moves by +(dy, dx): frame1 is frame0 rolled by (dy, dx)
        img0 = images[0].astype(np.int32)
        img1 = images[1].astype(np.int32)
        rolled = np.roll(img0, shift=(int(dy), int(dx)), axis=(0, 1))
        np.testing.assert_array_equal(img1, rolled)

    def test_flow_satisfies_warp_convention(self):
        """The GT must be FORWARD flow in the model's warp convention —
        warp(img1, flow) == img0 away from the wrap seam (the round-3
        review caught the labels sign-inverted, which made the
        coarse-to-fine warp counterproductive on this dataset)."""
        import jax.numpy as jnp

        from pwcnet_tpu.ops.warp import bilinear_warp

        ds = SyntheticFlow("train", num_samples=4, image_shape=(32, 32))
        for i in range(4):
            images, flow = ds[i]
            img0 = images[0].astype(np.float32)
            img1 = images[1].astype(np.float32)
            warped = np.asarray(
                bilinear_warp(
                    jnp.asarray(img1)[None], jnp.asarray(flow)[None]
                )
            )[0]
            d = int(ds.max_disp)
            # interior: wrap seam and edge clamping excluded
            np.testing.assert_allclose(
                warped[d:-d, d:-d], img0[d:-d, d:-d], atol=1e-4
            )

    def test_train_val_disjoint(self):
        tr = SyntheticFlow("train", num_samples=8)
        va = SyntheticFlow("val", num_samples=8)
        assert not set(tr.samples) & set(va.samples)


class TestLoader:
    def test_batching_shapes_and_normalization(self):
        ds = SyntheticFlow("train", num_samples=10, image_shape=(16, 16))
        loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True)
        batches = list(loader)
        assert len(batches) == 2 == len(loader)
        images, flows = batches[0]
        assert images.shape == (4, 2, 16, 16, 3)
        assert images.dtype == np.float32
        assert 0.0 <= images.min() and images.max() <= 1.0
        assert flows.shape == (4, 16, 16, 2)

    def test_drop_last_false(self):
        ds = SyntheticFlow("train", num_samples=10, image_shape=(16, 16))
        loader = DataLoader(ds, batch_size=4, drop_last=False)
        sizes = [b[0].shape[0] for b in loader]
        assert sizes == [4, 4, 2]

    def test_shuffle_deterministic_by_seed(self):
        ds = SyntheticFlow("train", num_samples=8, image_shape=(16, 16))
        a = [b[1].sum() for b in DataLoader(ds, 4, shuffle=True, seed=1)]
        b = [b[1].sum() for b in DataLoader(ds, 4, shuffle=True, seed=1)]
        np.testing.assert_allclose(a, b)

    def test_augmentation_stream_resume_invariant(self, tmp_path):
        """Crop/flip draws are a pure function of (seed, epoch, sample),
        so a mid-epoch resume (start_batch > 0) reproduces the exact
        batches — augmentations included — an uninterrupted run yields,
        regardless of worker-thread scheduling."""
        _make_sintel(tmp_path)
        ds = SintelClean(
            "train",
            tmp_path,
            crop_type="random",
            crop_shape=(24, 32),
            random_flip=True,
        )

        def mk():
            return DataLoader(
                ds, batch_size=2, shuffle=True, seed=7, num_workers=3
            )

        full = list(mk())
        resumed = mk()
        resumed.start_batch = 1  # as a cursor fast-forward would set
        tail = list(resumed)
        assert len(tail) == len(full) - 1
        for (fi, ff), (ti, tf) in zip(full[1:], tail):
            np.testing.assert_array_equal(fi, ti)
            np.testing.assert_array_equal(ff, tf)

    def test_native_augmentation_matches_pil_path(self, tmp_path):
        """The native C++ assembler draws crops AND flips from the same
        per-(epoch, sample) generator sequence as the PIL path, so the
        two paths produce byte-identical batches — a run preempted on a
        native host and resumed on a PIL-only host keeps the exact
        augmentation stream."""
        pytest.importorskip("pwcnet_tpu.data.native")
        from pwcnet_tpu.data import native

        if not native.available():
            pytest.skip("no native toolchain")
        _make_chairs(tmp_path, n=8, hw=(24, 32))
        ds = FlyingChairs(
            "train",
            tmp_path,
            crop_type="random",
            crop_shape=(16, 20),
            random_flip=True,
        )
        fast = DataLoader(
            ds, batch_size=4, shuffle=True, seed=3, use_native=True
        )
        slow = DataLoader(
            ds, batch_size=4, shuffle=True, seed=3, use_native=False
        )
        for (fi, ff), (si, sf) in zip(fast, slow):
            np.testing.assert_allclose(fi, si, atol=1e-6)
            np.testing.assert_allclose(ff, sf, atol=1e-6)

    def test_device_prefetch(self):
        import jax

        ds = SyntheticFlow("train", num_samples=8, image_shape=(16, 16))
        loader = DataLoader(ds, batch_size=4)
        out = list(device_prefetch(iter(loader), size=2))
        assert len(out) == 2
        assert isinstance(out[0][0], jax.Array)

    def test_device_prefetch_with_sharding(self):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()), ("data",))
        sharding = NamedSharding(mesh, P("data"))
        ds = SyntheticFlow("train", num_samples=16, image_shape=(16, 16))
        loader = DataLoader(ds, batch_size=8)
        (images, flows) = next(device_prefetch(iter(loader), sharding=sharding))
        assert images.sharding.is_equivalent_to(sharding, images.ndim)


class TestNativeLoaderPath:
    def test_flyingchairs_uses_native_and_matches_python(self, tmp_path):
        pytest.importorskip("pwcnet_tpu.data.native")
        from pwcnet_tpu.data import native

        if not native.available():
            pytest.skip("no native toolchain")
        _make_chairs(tmp_path, n=8, hw=(24, 32))
        ds = FlyingChairs(
            "train", tmp_path, crop_type="center", crop_shape=(16, 20)
        )
        fast = DataLoader(ds, batch_size=4, use_native=True)
        slow = DataLoader(ds, batch_size=4, use_native=False)
        (fi, ff) = next(iter(fast))
        (si, sf) = next(iter(slow))
        assert fast._native is not None and slow._native is None
        np.testing.assert_allclose(fi, si, atol=1e-6)
        np.testing.assert_allclose(ff, sf, atol=1e-6)

    def test_sintel_png_uses_native_and_matches_python(self, tmp_path):
        """Sintel (PNG on disk) takes the C++ fast path since round 4
        and must produce byte-identical batches to the PIL path."""
        pytest.importorskip("pwcnet_tpu.data.native")
        from pwcnet_tpu.data import native

        if not native.available():
            pytest.skip("no native toolchain")
        _make_sintel(tmp_path)
        ds = SintelClean(
            "train", tmp_path, crop_type="random", crop_shape=(24, 32),
            random_flip=True,
        )
        fast = DataLoader(
            ds, batch_size=2, shuffle=True, seed=5, use_native=True
        )
        slow = DataLoader(
            ds, batch_size=2, shuffle=True, seed=5, use_native=False
        )
        assert fast._native is not None
        for (fi, ff), (si, sf) in zip(fast, slow):
            np.testing.assert_allclose(fi, si, atol=1e-6)
            np.testing.assert_allclose(ff, sf, atol=1e-6)

    def test_native_falls_back_for_unsupported_png(self, tmp_path):
        """A dataset whose frames the from-scratch PNG reader cannot
        decode (palette mode) fails the probe and falls back to PIL."""
        pytest.importorskip("pwcnet_tpu.data.native")
        from pwcnet_tpu.data import native

        if not native.available():
            pytest.skip("no native toolchain")
        from PIL import Image

        _make_sintel(tmp_path, scenes=("a",), frames=3)
        for p in (tmp_path / "training" / "clean" / "a").glob("*.png"):
            Image.open(p).convert("P").save(p)
        ds = SintelClean(
            "train", tmp_path, crop_type="random", crop_shape=(24, 32)
        )
        loader = DataLoader(ds, batch_size=2, use_native="auto")
        assert loader._native is None
        with pytest.raises(IOError):
            DataLoader(ds, batch_size=2, use_native=True)
        # and the PIL path still yields batches
        images, flows = next(iter(loader))
        assert images.shape == (2, 2, 24, 32, 3)

    def test_native_full_epoch_batch_count(self, tmp_path):
        pytest.importorskip("pwcnet_tpu.data.native")
        from pwcnet_tpu.data import native

        if not native.available():
            pytest.skip("no native toolchain")
        _make_chairs(tmp_path, n=10, hw=(24, 32))
        ds = FlyingChairs(
            "train", tmp_path, crop_type="random", crop_shape=(16, 16)
        )
        loader = DataLoader(ds, batch_size=4, shuffle=True, use_native=True)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0][0].shape == (4, 2, 16, 16, 3)
        assert batches[0][0].max() <= 1.0


class TestMultiHostSharding:
    def test_disjoint_full_coverage(self):
        ds = SyntheticFlow("train", num_samples=16, image_shape=(16, 16))
        seen = []
        for rank in range(4):
            loader = DataLoader(
                ds, batch_size=2, shuffle=True, seed=7,
                process_index=rank, process_count=4,
            )
            assert len(loader) == 2
            for images, flows in loader:
                seen.append(flows[:, 0, 0, :].copy())
        all_rows = np.concatenate(seen)
        # every sample appears exactly once across ranks: MULTISET
        # equality (set-of-values comparison would pass a split that
        # duplicates one sample and drops another whose constant (dx,dy)
        # collides — only 81 distinct values exist)
        assert all_rows.shape == (16, 2)
        ref = np.array([ds[i][1][0, 0] for i in range(16)])
        np.testing.assert_array_equal(
            all_rows[np.lexsort(all_rows.T)], ref[np.lexsort(ref.T)]
        )

    def test_invalid_rank_raises(self):
        ds = SyntheticFlow("train", num_samples=8, image_shape=(16, 16))
        with pytest.raises(ValueError):
            DataLoader(ds, batch_size=2, process_index=2, process_count=2)


class TestRawCache:
    """Pre-decoded raw dataset cache (data/cache.py, VERDICT r4 #2):
    transcode once, serve batches as pure memory traffic. The cache path
    must be augmentation-identical to the decode paths, reject stale
    caches, and support the u8 device-normalize feed."""

    def _ds(self, tmp_path, **kw):
        _make_sintel(tmp_path)
        kw.setdefault("crop_type", "random")
        kw.setdefault("crop_shape", (24, 32))
        kw.setdefault("random_flip", True)
        return SintelClean("train", tmp_path, **kw)

    def test_cache_matches_pil_and_native_paths(self, tmp_path):
        """Same (seed, epoch, sample) -> byte-identical batches on all
        three loader paths, like the native==PIL gate above."""
        from pwcnet_tpu.data.cache import build_cache, open_cache

        ds = self._ds(tmp_path)
        build_cache(ds)
        assert open_cache(ds) is not None
        cached = DataLoader(
            ds, batch_size=3, shuffle=True, seed=5, use_cache=True
        )
        pil = DataLoader(
            ds, batch_size=3, shuffle=True, seed=5,
            use_cache=False, use_native=False,
        )
        n = 0
        for (ci, cf), (pi, pf) in zip(cached, pil):
            np.testing.assert_allclose(ci, pi, atol=1e-6)
            np.testing.assert_allclose(cf, pf, atol=1e-6)
            n += 1
        assert n == len(cached) > 0

    def test_u8_device_feed_equivalence(self, tmp_path):
        """normalize='device' yields uint8 images whose /255 equals the
        host-normalized f32 batches exactly; flows are identical."""
        from pwcnet_tpu.data.cache import build_cache

        ds = self._ds(tmp_path)
        build_cache(ds)
        f32 = DataLoader(
            ds, batch_size=3, shuffle=True, seed=9, use_cache=True
        )
        u8 = DataLoader(
            ds, batch_size=3, shuffle=True, seed=9, use_cache=True,
            normalize="device",
        )
        for (fi, ff), (ui, uf) in zip(f32, u8):
            assert ui.dtype == np.uint8 and fi.dtype == np.float32
            np.testing.assert_allclose(
                fi, ui.astype(np.float32) / 255.0, atol=1e-6
            )
            np.testing.assert_array_equal(ff, uf)

    def test_device_prefetch_normalizes_u8_on_device(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from pwcnet_tpu.data.cache import build_cache

        ds = self._ds(tmp_path)
        build_cache(ds)
        u8 = DataLoader(
            ds, batch_size=3, shuffle=True, seed=9, use_cache=True,
            normalize="device",
        )
        f32 = DataLoader(
            ds, batch_size=3, shuffle=True, seed=9, use_cache=True
        )
        got = list(device_prefetch(iter(u8), size=2))
        want = list(device_prefetch(iter(f32), size=2))
        assert len(got) == len(want) > 0
        for (gi, gf), (wi, wf) in zip(got, want):
            assert isinstance(gi, jax.Array) and gi.dtype == jnp.float32
            np.testing.assert_allclose(
                np.asarray(gi), np.asarray(wi), atol=1e-6
            )
            np.testing.assert_array_equal(np.asarray(gf), np.asarray(wf))

    def test_native_assemble_matches_numpy_fallback(self, tmp_path):
        from pwcnet_tpu.data import native
        from pwcnet_tpu.data.cache import build_cache, open_cache

        if not native.available():
            pytest.skip("no native toolchain")
        ds = self._ds(tmp_path)
        build_cache(ds)
        cache = open_cache(ds)
        y0s = np.array([0, 3, 7])
        x0s = np.array([0, 5, 11])
        flips = np.array([0, 1, 3], np.uint8)
        for dtype in (np.float32, np.uint8):
            a_img, a_fl = cache.assemble(
                [0, 1, 2], (24, 32), y0s, x0s, flips, image_dtype=dtype
            )
            b_img, b_fl = cache._assemble_numpy(
                cache.records[[0, 1, 2]], (24, 32), y0s, x0s, flips, dtype
            )
            assert a_img.dtype == np.dtype(dtype)
            np.testing.assert_allclose(a_img, b_img, atol=1e-6)
            np.testing.assert_array_equal(a_fl, b_fl)

    def test_stale_cache_rejected(self, tmp_path):
        """A cache built from a different sample list must not be used
        (silently serving stale data would corrupt training)."""
        import shutil

        from pwcnet_tpu.data.cache import build_cache, open_cache

        ds = self._ds(tmp_path)
        build_cache(ds)
        shutil.rmtree(tmp_path / "training" / "clean" / "alley_2")
        shutil.rmtree(tmp_path / "training" / "flow" / "alley_2")
        ds2 = SintelClean(
            "train", tmp_path, crop_type="random", crop_shape=(24, 32)
        )
        assert open_cache(ds2) is None
        # auto mode falls back to decoding; explicit use_cache=True raises
        loader = DataLoader(ds2, batch_size=2, use_cache="auto")
        assert loader._cache is None
        with pytest.raises(ValueError, match="no valid cache"):
            DataLoader(ds2, batch_size=2, use_cache=True)

    def test_truncated_cache_file_rejected(self, tmp_path):
        from pwcnet_tpu.data.cache import build_cache, open_cache

        ds = self._ds(tmp_path)
        cache_dir = build_cache(ds)
        frames = cache_dir / "frames.u8"
        frames.write_bytes(frames.read_bytes()[:-16])
        assert open_cache(ds) is None

    def test_build_is_idempotent(self, tmp_path):
        from pwcnet_tpu.data.cache import build_cache

        ds = self._ds(tmp_path)
        d1 = build_cache(ds)
        mtime = (d1 / "index.json").stat().st_mtime_ns
        d2 = build_cache(ds)
        assert d1 == d2
        assert (d2 / "index.json").stat().st_mtime_ns == mtime

    def test_resize_dataset_not_cacheable(self, tmp_path):
        from pwcnet_tpu.data.cache import build_cache

        ds = self._ds(tmp_path, resize_shape=(18, 24), crop_shape=(12, 16))
        with pytest.raises(ValueError, match="not cacheable"):
            build_cache(ds)

    def test_preemption_resume_stream_identical_on_cache_path(
        self, tmp_path
    ):
        """The cache path consumes the same per-(seed, epoch, sample)
        augmentation streams, so a mid-epoch resume reproduces the
        remaining batches exactly (the sample-exact preemption contract,
        PARITY §5)."""
        from pwcnet_tpu.data.cache import build_cache

        ds = self._ds(tmp_path)
        build_cache(ds)

        def mk():
            return DataLoader(
                ds, batch_size=2, shuffle=True, seed=11, use_cache=True
            )

        full = list(mk())
        resumed = mk()
        resumed.start_batch = 1
        tail = list(resumed)
        assert len(tail) == len(full) - 1
        for (fi, ff), (ti, tf) in zip(full[1:], tail):
            np.testing.assert_array_equal(fi, ti)
            np.testing.assert_array_equal(ff, tf)
