"""Image decode/encode: BMP (reference texture format) and PNG output.

BMP covers the reference's stb_image usage (help_func.h:4-20). PNG writing is
a minimal uncompressed-zlib encoder for saving renders without new deps.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

from tpuray.io import fallback, native


def read_bmp(path: str) -> np.ndarray:
    out = native.read_bmp_native(path)
    if out is None:
        out = fallback.read_bmp_py(path)
    return out


def write_bmp(path: str, rgb: np.ndarray) -> None:
    fallback.write_bmp_py(path, rgb)


def write_png(path: str, img: np.ndarray) -> None:
    """img: (H, W, 3) float in [0,1] or uint8."""
    if img.dtype != np.uint8:
        img = np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    h, w = img.shape[:2]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)
