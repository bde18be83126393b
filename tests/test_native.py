"""Native host-IO library (native/segio.cpp) equality tests.

Every native path is gated on a bit-equality oracle:
  * PNG decode  == PIL ``convert("RGB")`` across color types,
  * PNG encode  round-trips through PIL to the exact input pixels,
  * nearest resize == PIL NEAREST == the numpy oracle,
  * bilinear resize == the numpy fixed-point oracle (NOT PIL — documented),
  * the wired call sites (fastpng, kitti) produce identical results with
    the native path on and off.
"""

import io
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from semanticsegmentation_tensorflow_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"segio unavailable: {native.why_unavailable()}")


def _pil_png(arr, mode):
    img = Image.fromarray(arr, mode)
    b = io.BytesIO()
    img.save(b, "PNG")
    return b.getvalue()


def _pil_rgb(data):
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


class TestDecode:
    @pytest.mark.parametrize("mode,ch", [
        ("RGB", 3), ("RGBA", 4), ("L", 1), ("LA", 2)])
    def test_matches_pil(self, mode, ch):
        rng = np.random.default_rng(hash(mode) % 2**31)
        shape = (23, 41) if ch == 1 else (23, 41, ch)
        data = _pil_png(rng.integers(0, 256, shape, dtype=np.uint8), mode)
        assert np.array_equal(native.decode_png(data), _pil_rgb(data))

    def test_palette(self):
        rng = np.random.default_rng(3)
        img = Image.fromarray(
            rng.integers(0, 256, (19, 37, 3), dtype=np.uint8), "RGB"
        ).quantize(17)
        b = io.BytesIO()
        img.save(b, "PNG")
        data = b.getvalue()
        assert np.array_equal(native.decode_png(data), _pil_rgb(data))

    def test_16bit_gray_strips_high_byte(self):
        # PIL opens 16-bit gray as mode "I;16" and convert("RGB") SATURATES
        # (values > 255 clamp); segio does the standard high-byte strip —
        # the faithful conversion. Pinned here per the documented exception
        # in native/__init__.py (16-bit sources don't occur in KITTI).
        a16 = (np.arange(12, dtype=np.uint16).reshape(3, 4) * 4660)
        b = io.BytesIO()
        Image.fromarray(a16).save(b, "PNG")
        out = native.decode_png(b.getvalue())
        expect = (a16 >> 8).astype(np.uint8)
        assert np.array_equal(out, np.repeat(expect[:, :, None], 3, axis=2))

    def test_info_without_decode(self):
        data = _pil_png(np.zeros((7, 13, 3), np.uint8), "RGB")
        assert native.png_info(data) == (7, 13)

    def test_truncated_raises(self):
        data = _pil_png(np.zeros((16, 16, 3), np.uint8), "RGB")
        with pytest.raises(ValueError):
            native.decode_png(data[: len(data) // 2])
        with pytest.raises(ValueError):
            native.decode_png(b"not a png at all")


class TestEncode:
    @pytest.mark.parametrize("mode", ["fixed", "zlib"])
    def test_roundtrip(self, mode):
        rng = np.random.default_rng(4)
        arr = rng.integers(0, 256, (31, 57, 3), dtype=np.uint8)
        assert np.array_equal(_pil_rgb(native.encode_png(arr, mode=mode)), arr)

    def test_fixed_is_valid_for_odd_sizes(self):
        # 1-pixel rows/cols stress the bit-packer flush
        for h, w in [(1, 1), (1, 97), (53, 1), (2, 2)]:
            arr = np.arange(h * w * 3, dtype=np.uint64).astype(np.uint8)
            arr = arr.reshape(h, w, 3)
            assert np.array_equal(_pil_rgb(native.encode_png(arr)), arr)

    def test_concurrent_encodes_are_consistent(self):
        # writer pools encode concurrently with the GIL released; the
        # Huffman tables use thread-safe static init (a prior data race)
        from concurrent.futures import ThreadPoolExecutor
        rng = np.random.default_rng(6)
        arrs = [rng.integers(0, 256, (64, 80, 3)).astype(np.uint8)
                for _ in range(16)]
        expect = [native.encode_png(a) for a in arrs]
        with ThreadPoolExecutor(max_workers=8) as pool:
            got = list(pool.map(native.encode_png, arrs))
        assert got == expect
        for a, g in zip(arrs, got):
            assert np.array_equal(_pil_rgb(g), a)

    def test_fastpng_uses_native_at_level1(self):
        from semanticsegmentation_tensorflow_tpu.utils import fastpng
        rng = np.random.default_rng(5)
        arr = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
        via_fastpng = fastpng.encode_png(arr, 1)
        assert via_fastpng == native.encode_png(arr, mode="fixed")
        assert np.array_equal(_pil_rgb(via_fastpng), arr)
        # level>=2 stays on the numpy+zlib path (smaller files)
        assert fastpng.encode_png(arr, 2) != via_fastpng
        assert np.array_equal(_pil_rgb(fastpng.encode_png(arr, 2)), arr)


class TestResize:
    SIZES = [(37, 53, 3, 19, 90), (64, 64, 1, 64, 64), (5, 7, 4, 13, 3),
             (1, 1, 3, 4, 4), (375, 1242, 3, 160, 576), (9, 9, 3, 90, 2)]

    @pytest.mark.parametrize("h,w,c,oh,ow", SIZES)
    def test_bilinear_matches_oracle(self, h, w, c, oh, ow):
        rng = np.random.default_rng(h * w + oh)
        src = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        assert np.array_equal(native.resize_bilinear(src, oh, ow),
                              native.resize_bilinear_ref(src, oh, ow))

    @pytest.mark.parametrize("h,w,c,oh,ow", SIZES)
    def test_nearest_matches_oracle_and_pil(self, h, w, c, oh, ow):
        rng = np.random.default_rng(h * w + ow)
        src = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        out = native.resize_nearest(src, oh, ow)
        assert np.array_equal(out, native.resize_nearest_ref(src, oh, ow))
        if c in (1, 3, 4):
            pil_src = src[:, :, 0] if c == 1 else src
            ref = np.asarray(Image.fromarray(pil_src).resize(
                (ow, oh), Image.NEAREST))
            assert np.array_equal(out if c != 1 else out[:, :, 0], ref)

    def test_nearest_matches_pil_fuzz(self):
        # exact-tie pixels are decided by PIL's accumulated-FP index rule,
        # which segio replicates — any closed-form index math fails this
        rng = np.random.default_rng(11)
        for _ in range(40):
            h, w = rng.integers(1, 400, 2)
            oh, ow = rng.integers(1, 400, 2)
            src = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            ref = np.asarray(Image.fromarray(src).resize(
                (int(ow), int(oh)), Image.NEAREST))
            assert np.array_equal(
                native.resize_nearest(src, int(oh), int(ow)), ref)

    def test_identity_is_copy(self):
        rng = np.random.default_rng(12)
        src = rng.integers(0, 256, (17, 29, 3), dtype=np.uint8)
        assert np.array_equal(native.resize_bilinear(src, 17, 29), src)
        assert np.array_equal(native.resize_nearest(src, 17, 29), src)

    def test_2d_input(self):
        rng = np.random.default_rng(13)
        src = rng.integers(0, 256, (10, 12), dtype=np.uint8)
        out = native.resize_nearest(src, 5, 6)
        assert out.shape == (5, 6)
        assert np.array_equal(out, native.resize_nearest_ref(
            src[:, :, None], 5, 6)[:, :, 0])


class TestOverlayLut:
    def test_matches_numpy_blend_fuzz(self):
        from semanticsegmentation_tensorflow_tpu.ops import overlay as ov
        rng = np.random.default_rng(21)
        for alpha in (0.5, 0.3, 0.62):
            for blend0 in (False, True):
                nc = int(rng.integers(2, 30))
                pal = rng.integers(0, 256, (nc, 3)).astype(np.uint8)
                img = rng.integers(0, 256, (43, 61, 3)).astype(np.uint8)
                lab = rng.integers(0, nc, (43, 61)).astype(np.uint8)
                got = ov.host_overlay(img, lab, pal, alpha, blend0)
                # the pure-numpy expression, forced
                f = img.astype(np.float32)
                colors = pal.astype(np.float32)[lab]
                blended = f * (1.0 - alpha) + colors * alpha
                if not blend0:
                    blended = np.where((lab == 0)[..., None], f, blended)
                ref = np.clip(blended, 0, 255).astype(np.uint8)
                assert np.array_equal(got, ref), (alpha, blend0, nc)

    def test_out_of_range_label_raises(self):
        rng = np.random.default_rng(22)
        img = rng.integers(0, 256, (4, 4, 3)).astype(np.uint8)
        lab = np.full((4, 4), 7, np.uint8)
        lut = rng.integers(0, 256, (3, 3, 256)).astype(np.uint8)
        with pytest.raises(IndexError):
            native.overlay_lut(img, lab, lut)


class TestWiring:
    def test_kitti_gt_native_matches_pil_path(self, tmp_path):
        from semanticsegmentation_tensorflow_tpu.data import kitti
        from semanticsegmentation_tensorflow_tpu.data.palette import (
            KITTI_ROAD_PALETTE)
        rng = np.random.default_rng(14)
        # GT-like image: pixels drawn from the palette colors
        pal = KITTI_ROAD_PALETTE.astype(np.uint8)
        gt = pal[rng.integers(0, len(pal), (75, 248))]
        p = tmp_path / "um_road_000000.png"
        Image.fromarray(gt).save(p)
        ids_n, valid_n = kitti.load_gt(str(p), (38, 124))
        # PIL fallback path
        img = Image.open(p).convert("RGB").resize((124, 38), Image.NEAREST)
        from semanticsegmentation_tensorflow_tpu.data.palette import (
            encode_labels)
        ids_p, valid_p = encode_labels(np.asarray(img, np.uint8),
                                       KITTI_ROAD_PALETTE)
        assert np.array_equal(ids_n, ids_p)
        assert np.array_equal(valid_n, valid_p)

    def test_native_resize_optin_changes_image_path(self, tmp_path,
                                                    monkeypatch):
        from semanticsegmentation_tensorflow_tpu.data import kitti
        rng = np.random.default_rng(15)
        arr = rng.integers(0, 256, (75, 248, 3), dtype=np.uint8)
        p = tmp_path / "um_000000.png"
        Image.fromarray(arr).save(p)
        monkeypatch.delenv("SEG_NATIVE_RESIZE", raising=False)
        via_pil = kitti.load_image(str(p), (38, 124))
        monkeypatch.setenv("SEG_NATIVE_RESIZE", "1")
        via_native = kitti.load_image(str(p), (38, 124))
        assert via_native.shape == via_pil.shape == (38, 124, 3)
        assert np.array_equal(
            via_native, native.resize_bilinear(arr, 38, 124))
        # identity size: both paths bit-equal (pure decode)
        assert np.array_equal(kitti.load_image(str(p), (75, 248)), arr)

    def test_native_resize_optin_nonpng_falls_back_to_pil(self, tmp_path,
                                                          monkeypatch):
        # the opt-in fast path only handles PNG; other formats must keep
        # working through PIL even with SEG_NATIVE_RESIZE=1
        from semanticsegmentation_tensorflow_tpu.data import kitti
        rng = np.random.default_rng(16)
        arr = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
        p = tmp_path / "img.bmp"
        Image.fromarray(arr).save(p)
        monkeypatch.setenv("SEG_NATIVE_RESIZE", "1")
        out = kitti.load_image(str(p), (10, 15))
        ref = np.asarray(Image.open(p).convert("RGB").resize(
            (15, 10), Image.BILINEAR))
        assert np.array_equal(out, ref)

    def test_kill_switch_subprocess(self):
        # SEG_NATIVE=0 must disable the library entirely (fresh process:
        # the flag is read once at first load())
        code = ("from semanticsegmentation_tensorflow_tpu import native; "
                "assert not native.available(); "
                "assert 'SEG_NATIVE=0' in native.why_unavailable(); "
                "print('ok')")
        env = dict(os.environ, SEG_NATIVE="0", JAX_PLATFORMS="cpu")
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=300,
                             cwd=os.path.dirname(os.path.dirname(__file__)))
        assert out.returncode == 0 and "ok" in out.stdout, out.stderr
