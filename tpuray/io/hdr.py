"""Radiance RGBE (.hdr) read/write (native C++ with numpy fallback).

Replaces lib/hdrloader.{h,cpp} of the reference; also provides an encoder so
the framework can generate its own HDR test assets (the reference ships none).
"""
from __future__ import annotations

import numpy as np

from tpuray.io import fallback, native


def read_hdr(path: str) -> np.ndarray:
    out = native.read_hdr_native(path)
    if out is None:
        out = fallback.read_hdr_py(path)
    return out


def write_hdr(path: str, rgb: np.ndarray) -> None:
    if not native.write_hdr_native(path, np.asarray(rgb, np.float32)):
        fallback.write_hdr_py(path, rgb)
