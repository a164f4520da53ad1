"""Native (C++) data-core tests: .flo parity, batch assembly, crop/flip."""

import numpy as np
import pytest
from PIL import Image

from pwcnet_tpu.utils import save_flow

native = pytest.importorskip("pwcnet_tpu.data.native")
if not native.available():
    pytest.skip("no native toolchain", allow_module_level=True)


def _write_triple(tmp_path, i, hw=(24, 32), rng=None):
    rng = rng or np.random.default_rng(i)
    h, w = hw
    paths = []
    for tag in ("img1", "img2"):
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        p = tmp_path / f"{i:05d}_{tag}.ppm"
        Image.fromarray(arr).save(p)
        paths.append(p)
    flow = (rng.standard_normal((h, w, 2)) * 5).astype(np.float32)
    fp = tmp_path / f"{i:05d}_flow.flo"
    save_flow(fp, flow)
    return tuple(paths) + (fp,), flow


class TestNativeFlo:
    def test_matches_python_reader(self, tmp_path, rng):
        flow = (rng.standard_normal((17, 23, 2)) * 9).astype(np.float32)
        p = tmp_path / "x.flo"
        save_flow(p, flow)
        got = native.read_flo(p)
        np.testing.assert_array_equal(got, flow)

    def test_bad_file_raises(self, tmp_path):
        p = tmp_path / "bad.flo"
        p.write_bytes(b"\x00" * 32)
        with pytest.raises(IOError):
            native.read_flo(p)


class TestNativeBatch:
    def test_matches_python_pipeline(self, tmp_path, rng):
        samples, flows = zip(
            *[_write_triple(tmp_path, i, rng=rng) for i in range(3)]
        )
        y0s, x0s = [0, 4, 2], [0, 6, 1]
        images, flo = native.load_batch(
            samples, (16, 20), y0s, x0s, flips=[0, 0, 0]
        )
        assert images.shape == (3, 2, 16, 20, 3)
        assert flo.shape == (3, 16, 20, 2)
        for i, (paths, f) in enumerate(zip(samples, flows)):
            ref0 = np.asarray(Image.open(paths[0]), np.float32) / 255.0
            y0, x0 = y0s[i], x0s[i]
            np.testing.assert_allclose(
                images[i, 0], ref0[y0 : y0 + 16, x0 : x0 + 20], atol=1e-6
            )
            np.testing.assert_array_equal(
                flo[i], f[y0 : y0 + 16, x0 : x0 + 20]
            )

    def test_flips_match_python_semantics(self, tmp_path, rng):
        (sample, flow), = [_write_triple(tmp_path, 0, rng=rng)]
        # horizontal flip: x reversed, dx negated
        images, flo = native.load_batch(
            [sample], (24, 32), [0], [0], flips=[1]
        )
        ref = flow[:, ::-1] * np.array([-1.0, 1.0], np.float32)
        np.testing.assert_allclose(flo[0], ref, atol=1e-6)
        # vertical flip: y reversed, dy negated
        images, flo = native.load_batch(
            [sample], (24, 32), [0], [0], flips=[2]
        )
        ref = flow[::-1] * np.array([1.0, -1.0], np.float32)
        np.testing.assert_allclose(flo[0], ref, atol=1e-6)
        # both
        images, flo = native.load_batch(
            [sample], (24, 32), [0], [0], flips=[3]
        )
        ref = flow[::-1, ::-1] * np.array([-1.0, -1.0], np.float32)
        np.testing.assert_allclose(flo[0], ref, atol=1e-6)

    def test_out_of_bounds_crop_fails(self, tmp_path, rng):
        (sample, _), = [_write_triple(tmp_path, 0, rng=rng)]
        with pytest.raises(IOError):
            native.load_batch([sample], (30, 40), [0], [0], flips=[0])

    def test_multithreaded_consistency(self, tmp_path, rng):
        samples = [_write_triple(tmp_path, i, rng=rng)[0] for i in range(8)]
        a = native.load_batch(
            samples, (16, 16), [0] * 8, [0] * 8, [0] * 8, num_threads=1
        )
        b = native.load_batch(
            samples, (16, 16), [0] * 8, [0] * 8, [0] * 8, num_threads=8
        )
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
