"""Fast PNG writer for the inference overlay sweep.

The reference's test sweep writes one overlay PNG per KITTI test image
(SURVEY.md §3.2). On this 1-core host, PIL's default encoder costs
~170 ms/image at 1242x375 (zlib level 6 + per-row adaptive filtering in C
but single-threaded) — it was 97% of the end-to-end sweep time
(VERDICT round 1 item 4: 4.4 img/s e2e vs 312 img/s device-side).

This writer does the PNG "sub" filter as one vectorized numpy diff and
deflates at level 1: measured 25 ms/image with the SAME file size as PIL
at level 1 (0.87 MB vs PIL-level-6's 0.76 MB) — a 7x encoder speedup for
a ~14% size cost. Output is a fully standard 8-bit RGB PNG (round-trip
verified against PIL in tests/test_infer.py). ``zlib.compress`` releases
the GIL, so writer threads overlap with device fetches.

Round 4 adds the native C++ encoder (native/segio.cpp): sub filter + a
literal-only fixed-Huffman DEFLATE with no LZ match search — measured
4.4 ms/image at 1242x375 vs 39 ms for this module's numpy+zlib path
(another 8.9x), at ~34% larger files. ``encode_png``/``write_png`` use it
automatically at level<=1 when the library builds; ``SEG_NATIVE=0``
(or any level>=2) falls back to the pure-Python path below. The ctypes
call releases the GIL like ``zlib.compress`` did.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _native_encode(arr: np.ndarray) -> bytes | None:
    from semanticsegmentation_tensorflow_tpu import native
    if not native.available():
        return None
    return native.encode_png(arr, mode="fixed")


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data)))


def encode_png(arr: np.ndarray, level: int = 1) -> bytes:
    """[H, W, 3] uint8 -> PNG bytes (8-bit RGB, sub filter, deflate).

    level<=1 takes the native fixed-Huffman fast path when available
    (speed point); level>=2 always uses the numpy+zlib path (size point).
    """
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected [H,W,3] uint8, got {arr.shape} {arr.dtype}")
    if level <= 1:
        data = _native_encode(np.ascontiguousarray(arr))
        if data is not None:
            return data
    return encode_png_numpy(arr, level)


def encode_png_numpy(arr: np.ndarray, level: int = 1) -> bytes:
    """The pure numpy+zlib encoder (fallback / size-optimal path)."""
    h, w, _ = arr.shape
    flat = np.ascontiguousarray(arr).reshape(h, w * 3)
    # PNG filter type 1 ("sub"): byte minus the byte 3 positions left
    # (bytes-per-pixel), mod 256 — uint8 wraparound does the mod for free
    raw = np.empty((h, w * 3 + 1), np.uint8)
    raw[:, 0] = 1
    raw[:, 1:4] = flat[:, :3]
    np.subtract(flat[:, 3:], flat[:, :-3], out=raw[:, 4:])
    return (_SIG
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(raw.tobytes(), level))
            + _chunk(b"IEND", b""))


def write_png(path: str, arr: np.ndarray, level: int = 1) -> None:
    with open(path, "wb") as f:
        f.write(encode_png(arr, level))
