"""Native (C++) data-core tests: .flo parity, batch assembly, crop/flip."""

import numpy as np
import pytest
from PIL import Image

from pwcnet_tpu.utils import save_flow

native = pytest.importorskip("pwcnet_tpu.data.native")
if not native.available():
    pytest.skip("no native toolchain", allow_module_level=True)


def _write_triple(tmp_path, i, hw=(24, 32), rng=None, ext="ppm"):
    rng = rng or np.random.default_rng(i)
    h, w = hw
    paths = []
    for tag in ("img1", "img2"):
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        p = tmp_path / f"{i:05d}_{tag}.{ext}"
        Image.fromarray(arr).save(p)
        paths.append(p)
    flow = (rng.standard_normal((h, w, 2)) * 5).astype(np.float32)
    fp = tmp_path / f"{i:05d}_flow.flo"
    save_flow(fp, flow)
    return tuple(paths) + (fp,), flow


def _png_all_filters(arr: np.ndarray) -> bytes:
    """Hand-rolled 8-bit RGB PNG encoder cycling through ALL FIVE row
    filters (None/Sub/Up/Average/Paeth) — PIL's encoder picks its own
    filters, so this is the only way to pin every unfilter branch."""
    import struct
    import zlib

    h, w, _ = arr.shape

    def paeth(a, b, c):
        p = int(a) + int(b) - int(c)
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = b""
    prev = np.zeros((w, 3), np.uint8)
    for y in range(h):
        row = arr[y].astype(np.int32)
        f = y % 5
        out = np.zeros((w, 3), np.int32)
        for x in range(w):
            for ch in range(3):
                left = row[x - 1, ch] if x else 0
                up = int(prev[x, ch])
                ul = int(prev[x - 1, ch]) if x else 0
                v = row[x, ch]
                if f == 0:
                    out[x, ch] = v
                elif f == 1:
                    out[x, ch] = v - left
                elif f == 2:
                    out[x, ch] = v - up
                elif f == 3:
                    out[x, ch] = v - ((left + up) // 2)
                else:
                    out[x, ch] = v - paeth(left, up, ul)
        raw += bytes([f]) + (out % 256).astype(np.uint8).tobytes()
        prev = arr[y]

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


class TestNativePng:
    def test_pil_written_rgb_decodes_exactly(self, tmp_path, rng):
        (sample, flow), = [
            _write_triple(tmp_path, 0, hw=(37, 53), rng=rng, ext="png")
        ]
        imgs, flo = native.load_batch([sample], (37, 53), [0], [0], [0])
        ref0 = np.asarray(Image.open(sample[0]), np.float32) / 255.0
        ref1 = np.asarray(Image.open(sample[1]), np.float32) / 255.0
        np.testing.assert_allclose(imgs[0, 0], ref0, atol=1e-6)
        np.testing.assert_allclose(imgs[0, 1], ref1, atol=1e-6)
        np.testing.assert_array_equal(flo[0], flow)

    def test_all_five_filters_decode_exactly(self, tmp_path, rng):
        h, w = 16, 21
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        p = tmp_path / "filt.png"
        p.write_bytes(_png_all_filters(arr))
        # the encoder itself is verified against PIL's decoder first
        np.testing.assert_array_equal(np.asarray(Image.open(p)), arr)
        flow = np.zeros((h, w, 2), np.float32)
        fp = tmp_path / "z.flo"
        save_flow(fp, flow)
        imgs, _ = native.load_batch([(p, p, fp)], (h, w), [0], [0], [0])
        np.testing.assert_allclose(
            imgs[0, 0], arr.astype(np.float32) / 255.0, atol=1e-6
        )

    @pytest.mark.parametrize("mode", ["RGBA", "L", "LA"])
    def test_alpha_and_gray_convert_like_pil(self, tmp_path, rng, mode):
        h, w = 19, 23
        rgb = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        im = Image.fromarray(rgb).convert(mode)
        p = tmp_path / f"{mode}.png"
        im.save(p)
        flow = np.zeros((h, w, 2), np.float32)
        fp = tmp_path / "z.flo"
        save_flow(fp, flow)
        imgs, _ = native.load_batch([(p, p, fp)], (h, w), [0], [0], [0])
        # the PIL path converts via .convert("RGB") — must match exactly
        ref = np.asarray(im.convert("RGB"), np.float32) / 255.0
        np.testing.assert_allclose(imgs[0, 0], ref, atol=1e-6)

    def test_image_size_probe(self, tmp_path, rng):
        arr = (rng.random((11, 13, 3)) * 255).astype(np.uint8)
        p = tmp_path / "x.png"
        Image.fromarray(arr).save(p)
        assert native.image_size(p) == (11, 13)

    @pytest.mark.parametrize("mode", ["P", "I;16"])
    def test_unsupported_png_variants_raise(self, tmp_path, rng, mode):
        """Palette and 16-bit PNGs must FAIL the native probe (the
        loader then falls back to PIL instead of mis-decoding)."""
        h, w = 8, 8
        if mode == "P":
            im = Image.fromarray(
                (rng.random((h, w, 3)) * 255).astype(np.uint8)
            ).convert("P")
        else:
            im = Image.fromarray(
                (rng.random((h, w)) * 65535).astype(np.uint16)
            )
        p = tmp_path / "unsupported.png"
        im.save(p)
        with pytest.raises(IOError):
            native.image_size(p)


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
