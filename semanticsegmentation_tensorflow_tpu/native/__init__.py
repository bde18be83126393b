"""segio: native (C++) host-side image IO, ctypes-bound with lazy build.

The reference framework's host runtime decodes/encodes PNGs and resizes on
the CPU (SURVEY.md §3.1/§3.2 — scipy/PIL). This package is the TPU-native
rebuild's native-code equivalent: ``segio.cpp`` (libpng decode, sub-filter
PNG encode with a literal-only fixed-Huffman DEFLATE fast path or zlib,
fixed-point bilinear/nearest resize), compiled lazily with g++ and bound
via ctypes (no pybind11 in this image).

Contract:

* ``decode_png``/``png_info`` are **bit-exact** with PIL's
  ``Image.open(...).convert("RGB")`` for every 8-bit PNG color type
  (gray, gray+alpha, palette, RGB, RGBA — decode is lossless and the
  normalization rules match), verified in tests/test_native.py.
  Exception: 16-bit inputs take the standard high-byte strip
  (0x1234 -> 0x12), where PIL round-trips through its integer mode and
  saturates (convert("RGB") on mode "I" clamps to 255) — the strip is
  the faithful conversion, and 16-bit sources don't occur in KITTI/
  Cityscapes; the behavior is pinned in tests.
* ``resize_bilinear``/``resize_nearest`` bit-match the numpy oracles
  ``resize_bilinear_ref``/``resize_nearest_ref`` in this file (16.16
  fixed-point weights, 32.32 accumulation, round-half-up; half-pixel
  centers). Nearest additionally matches PIL's NEAREST index rule.
  Bilinear is classic 2-tap half-pixel bilinear — NOT PIL's
  area-averaging triangle filter — so it is opt-in for training data
  (``SEG_NATIVE_RESIZE=1``) to keep the PIL-parity path the default.
* ``SEG_NATIVE=0`` kills every native path (pure-Python fallbacks take
  over); a failed build degrades to the same fallbacks with a one-time
  warning, never an exception.

All ctypes calls release the GIL, so the inference sweep's writer threads
overlap native encode with device fetches exactly like the zlib path did.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
import warnings

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "segio.cpp")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_LOAD_FAILED: str | None = None

_u8p = ctypes.POINTER(ctypes.c_uint8)
_i32p = ctypes.POINTER(ctypes.c_int32)


def _build_dirs() -> list[str]:
    # package-local first (fast, survives with the checkout), then a user
    # cache (covers read-only installs)
    return [
        os.path.join(os.path.dirname(__file__), "_build"),
        os.path.join(os.path.expanduser("~"), ".cache", "segio"),
    ]


def _compile(src: str, out_path: str) -> None:
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(out_path))
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", tmp, "-lpng", "-lz"],
            check=True, capture_output=True, timeout=300)
        os.replace(tmp, out_path)  # atomic: concurrent builders both win
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.segio_version.restype = ctypes.c_int
    lib.segio_version.argtypes = []
    lib.segio_png_info.restype = ctypes.c_int
    lib.segio_png_info.argtypes = [_u8p, ctypes.c_size_t, _i32p, _i32p]
    lib.segio_decode_png.restype = ctypes.c_int
    lib.segio_decode_png.argtypes = [_u8p, ctypes.c_size_t, _u8p, _i32p, _i32p]
    lib.segio_encode_png_fixed.restype = ctypes.c_int
    lib.segio_encode_png_fixed.argtypes = [
        _u8p, ctypes.c_int32, ctypes.c_int32, _u8p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_size_t)]
    lib.segio_encode_png_zlib.restype = ctypes.c_int
    lib.segio_encode_png_zlib.argtypes = [
        _u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, _u8p,
        ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t)]
    for name in ("segio_resize_bilinear_u8", "segio_resize_nearest_u8"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [_u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                       _u8p, ctypes.c_int32, ctypes.c_int32]
    lib.segio_overlay_lut_u8.restype = ctypes.c_int
    lib.segio_overlay_lut_u8.argtypes = [
        _u8p, _u8p, ctypes.c_int64, _u8p, ctypes.c_int32, _u8p]
    return lib


def load() -> ctypes.CDLL | None:
    """Build (if needed) + load the segio shared library; None on failure."""
    global _LIB, _LOAD_FAILED
    if _LIB is not None:
        return _LIB
    if _LOAD_FAILED is not None:
        return None
    if os.environ.get("SEG_NATIVE", "1").strip().lower() in ("0", "false", "off"):
        _LOAD_FAILED = "disabled via SEG_NATIVE=0"
        return None
    with _LOCK:
        if _LIB is not None or _LOAD_FAILED is not None:
            return _LIB
        try:
            with open(_SRC, "rb") as f:
                tag = hashlib.sha256(f.read()).hexdigest()[:16]
        except OSError as e:
            _LOAD_FAILED = f"segio.cpp unreadable: {e}"
            return None
        last_err = None
        for d in _build_dirs():
            so = os.path.join(d, f"segio-{tag}.so")
            try:
                if not os.path.exists(so):
                    os.makedirs(d, exist_ok=True)
                    _compile(_SRC, so)
                _LIB = _bind(ctypes.CDLL(so))
                return _LIB
            except Exception as e:  # build or dlopen failure -> next dir
                last_err = e
        _LOAD_FAILED = f"native segio unavailable ({last_err}); using Python fallbacks"
        warnings.warn(_LOAD_FAILED, RuntimeWarning)
        return None


def available() -> bool:
    return load() is not None


def why_unavailable() -> str | None:
    load()
    return _LOAD_FAILED


def _as_u8p(arr: np.ndarray):
    return arr.ctypes.data_as(_u8p)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def png_info(data: bytes) -> tuple[int, int]:
    """(H, W) of a PNG without decoding pixel data."""
    lib = load()
    if lib is None:
        raise RuntimeError(f"segio unavailable: {_LOAD_FAILED}")
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    rc = lib.segio_png_info(_as_u8p(buf), buf.size,
                            ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise ValueError(f"segio_png_info failed rc={rc}")
    return h.value, w.value


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> [H, W, 3] uint8 RGB (any color type normalized).

    Two C calls: a header probe to size the buffer, then the decode. The
    probe reads only the signature + IHDR (microseconds vs ~10 ms for the
    pixel decode), so the double header parse is noise."""
    lib = load()
    if lib is None:
        raise RuntimeError(f"segio unavailable: {_LOAD_FAILED}")
    h, w = png_info(data)
    out = np.empty((h, w, 3), np.uint8)
    buf = np.frombuffer(data, np.uint8)
    h2 = ctypes.c_int32()
    w2 = ctypes.c_int32()
    rc = lib.segio_decode_png(_as_u8p(buf), buf.size, _as_u8p(out),
                              ctypes.byref(h2), ctypes.byref(w2))
    if rc != 0:
        raise ValueError(f"segio_decode_png failed rc={rc}")
    return out


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------

def encode_png(arr: np.ndarray, mode: str = "fixed", level: int = 1) -> bytes:
    """[H, W, 3] uint8 -> PNG bytes.

    mode="fixed": literal-only fixed-Huffman DEFLATE (no LZ matching) —
    fastest, ~15-25% larger files. mode="zlib": C sub-filter + zlib at
    ``level`` — same size as utils/fastpng.py at the same level.
    """
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected [H,W,3] uint8, got {arr.shape} {arr.dtype}")
    lib = load()
    if lib is None:
        raise RuntimeError(f"segio unavailable: {_LOAD_FAILED}")
    arr = np.ascontiguousarray(arr)
    h, w = arr.shape[:2]
    raw_len = h * (w * 3 + 1)
    cap = raw_len + raw_len // 8 + 4096  # > C-side zmax + 57-byte skeleton
    out = np.empty(cap, np.uint8)
    n = ctypes.c_size_t()
    if mode == "fixed":
        rc = lib.segio_encode_png_fixed(_as_u8p(arr), h, w, _as_u8p(out),
                                        cap, ctypes.byref(n))
    elif mode == "zlib":
        rc = lib.segio_encode_png_zlib(_as_u8p(arr), h, w, int(level),
                                       _as_u8p(out), cap, ctypes.byref(n))
    else:
        raise ValueError(f"unknown mode {mode!r}")
    if rc != 0:
        raise ValueError(f"segio_encode_png_{mode} failed rc={rc}")
    return out[: n.value].tobytes()


# ---------------------------------------------------------------------------
# Resize: native kernels + the bit-exact numpy oracles they are tested
# against. Half-pixel centers: src_x = (j + 0.5) * in/out - 0.5 in 16.16
# fixed point, edge-clamped; bilinear accumulates 32.32, rounds half-up.
# ---------------------------------------------------------------------------

def _axis_coords_ref(in_n: int, out_n: int) -> tuple[np.ndarray, np.ndarray]:
    j = np.arange(out_n, dtype=np.int64)
    x = ((2 * j + 1) * in_n << 16) // (2 * out_n) - (1 << 15)
    x = np.maximum(x, 0)
    i0 = x >> 16
    frac = x & 0xFFFF
    at_edge = i0 >= in_n - 1
    return (np.where(at_edge, in_n - 1, i0),
            np.where(at_edge, 0, frac))


def resize_bilinear_ref(src: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Numpy oracle for segio_resize_bilinear_u8 (bit-exact)."""
    h, w, _ = src.shape
    xi, xw = _axis_coords_ref(w, ow)
    yi, yw = _axis_coords_ref(h, oh)
    x1 = np.minimum(xi + 1, w - 1)
    y1 = np.minimum(yi + 1, h - 1)
    s = src.astype(np.int64)
    hrow = (s[:, xi] * (65536 - xw)[None, :, None]
            + s[:, x1] * xw[None, :, None])           # [H, ow, C] in 16.16
    v = (hrow[yi] * (65536 - yw)[:, None, None]
         + hrow[y1] * yw[:, None, None])              # [oh, ow, C] in 32.32
    return ((v + (1 << 31)) >> 32).astype(np.uint8)


def _pil_nearest_axis(in_n: int, out_n: int) -> np.ndarray:
    # PIL's ImagingScaleAffine accumulates the double scale per output pixel
    # (xx = 0.5*s; xx += s; truncate) — the accumulated FP rounding decides
    # exact-tie pixels, so this must be sequential adds, not closed form.
    # np.add.accumulate performs the same left-to-right double additions.
    s = in_n / out_n
    steps = np.full(out_n, s, np.float64)
    steps[0] = s * 0.5
    return np.minimum(np.add.accumulate(steps).astype(np.int64), in_n - 1)


def resize_nearest_ref(src: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Numpy oracle for segio_resize_nearest_u8 (bit-exact; == PIL NEAREST,
    including PIL's accumulated-FP behavior on exact half-pixel ties)."""
    h, w = src.shape[:2]
    return src[_pil_nearest_axis(h, oh)][:, _pil_nearest_axis(w, ow)]


def _resize(src: np.ndarray, oh: int, ow: int, fn_name: str) -> np.ndarray:
    if src.ndim == 2:
        return _resize(src[:, :, None], oh, ow, fn_name)[:, :, 0]
    if src.ndim != 3 or src.dtype != np.uint8:
        raise ValueError(f"expected [H,W,C] uint8, got {src.shape} {src.dtype}")
    lib = load()
    if lib is None:
        raise RuntimeError(f"segio unavailable: {_LOAD_FAILED}")
    src = np.ascontiguousarray(src)
    h, w, c = src.shape
    dst = np.empty((oh, ow, c), np.uint8)
    rc = getattr(lib, fn_name)(_as_u8p(src), h, w, c, _as_u8p(dst), oh, ow)
    if rc != 0:
        raise ValueError(f"{fn_name} failed rc={rc}")
    return dst


def resize_bilinear(src: np.ndarray, oh: int, ow: int) -> np.ndarray:
    return _resize(src, oh, ow, "segio_resize_bilinear_u8")


def resize_nearest(src: np.ndarray, oh: int, ow: int) -> np.ndarray:
    return _resize(src, oh, ow, "segio_resize_nearest_u8")


# ---------------------------------------------------------------------------
# Overlay blend via precomputed LUT (see ops/overlay.host_overlay, which
# builds lut[class][channel][256] with the exact f32 blend arithmetic).
# ---------------------------------------------------------------------------

def overlay_lut(img: np.ndarray, labels: np.ndarray,
                lut: np.ndarray) -> np.ndarray:
    """Apply lut [nc, 3, 256] u8 to img [H, W, 3] u8 via labels [H, W] u8."""
    lib = load()
    if lib is None:
        raise RuntimeError(f"segio unavailable: {_LOAD_FAILED}")
    if (img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8
            or labels.shape != img.shape[:2] or labels.dtype != np.uint8
            or lut.ndim != 3 or lut.shape[1:] != (3, 256)
            or lut.dtype != np.uint8):
        raise ValueError(
            f"bad shapes/dtypes: img {img.shape} {img.dtype}, labels "
            f"{labels.shape} {labels.dtype}, lut {lut.shape} {lut.dtype}")
    img = np.ascontiguousarray(img)
    labels = np.ascontiguousarray(labels)
    lut = np.ascontiguousarray(lut)
    out = np.empty_like(img)
    rc = lib.segio_overlay_lut_u8(
        _as_u8p(img), _as_u8p(labels), img.shape[0] * img.shape[1],
        _as_u8p(lut), lut.shape[0], _as_u8p(out))
    if rc == -3:
        raise IndexError(f"label id >= num classes ({lut.shape[0]})")
    if rc != 0:
        raise ValueError(f"segio_overlay_lut_u8 failed rc={rc}")
    return out
