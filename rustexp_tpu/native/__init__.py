"""ctypes bindings for the native C++ asset-loading runtime.

The shared library is built on demand (g++ is assumed present; see
Makefile). Every entry point has a pure-numpy fallback in assets/, so
``available()`` returning False only costs load speed, not functionality.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "librustexp_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"], check=True, capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    if not hasattr(lib, "rx_gif_lzw"):
        # stale library from before a symbol was added: rebuild once
        try:
            subprocess.run(["make", "-C", _DIR, "-s", "-B"], check=True,
                           capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception:
            return None
        if not hasattr(lib, "rx_gif_lzw"):
            return None

    lib.rx_mesh_parse.restype = ctypes.c_long
    lib.rx_mesh_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
    ]
    lib.rx_hdr_decode.restype = ctypes.c_long
    lib.rx_hdr_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.c_long, ctypes.c_long, ctypes.POINTER(ctypes.c_float),
    ]
    lib.rx_ansi_frame.restype = ctypes.c_long
    lib.rx_ansi_frame.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_long,
        ctypes.c_char_p, ctypes.c_long,
    ]
    lib.rx_gif_lzw.restype = ctypes.c_long
    lib.rx_gif_lzw.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_mesh(text: bytes, ncomp: int):
    """Parse mesh text -> (vdata f32 [V, ncomp], indices i32 [I]) or None."""
    lib = _load()
    if lib is None:
        return None
    n_tokens_max = text.count(b"\n") + 2
    # Generous capacity: every line could be a vertex or an index row
    vcap = (len(text) // 2) + 16  # floats upper bound (numbers are >1 char)
    icap = vcap
    vdata = np.empty(vcap, dtype=np.float32)
    indices = np.empty(icap, dtype=np.int32)
    vtx_cnt = ctypes.c_long()
    idx_cnt = ctypes.c_long()
    rc = lib.rx_mesh_parse(
        text, len(text), ncomp,
        vdata.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), vcap,
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), icap,
        ctypes.byref(vtx_cnt), ctypes.byref(idx_cnt),
    )
    del n_tokens_max
    if rc != 0:
        raise ValueError(f"native mesh parse failed with code {rc}")
    v = vtx_cnt.value
    i = idx_cnt.value
    return vdata[: v * ncomp].reshape(v, ncomp).copy(), indices[:i].copy()


def decode_hdr_payload(payload: bytes, w: int, h: int):
    """Decode HDR pixel payload -> f32 [h, w, 3] or None if lib missing."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((h, w, 3), dtype=np.float32)
    buf = np.frombuffer(payload, dtype=np.uint8)
    rc = lib.rx_hdr_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(payload),
        w, h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError(f"native HDR decode failed with code {rc}")
    return out


def ansi_frame(rgb8_topleft: np.ndarray):
    """RGB8 [h, w, 3] (top-left, even h) -> ANSI half-block str, or None.

    The C++ pump with run-length color dedup replaces the Python f-string
    cell loop (~60 ms/frame at 512^2 -> ~1 ms, and a ~3x smaller escape
    stream). Same visual output; the Python fallback lives in app/viewer.py.
    """
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(rgb8_topleft, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3
    if h % 2:  # drop the last row, matching the Python fallback's slicing
        img = img[: h - 1]
        h -= 1
    cap = 43 * w * (h // 2) + 8 * h + 16
    buf = ctypes.create_string_buffer(cap)
    n = lib.rx_ansi_frame(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, buf, cap)
    if n < 0:
        raise ValueError("native ANSI frame buffer too small")
    return buf.raw[:n].decode("utf-8")


def gif_lzw(indices: np.ndarray, min_code_size: int):
    """GIF LZW-encode a flat uint8 index stream; None if the lib is absent.

    Byte-identical to core/gif.py's pure-Python _lzw_encode_py (test-
    pinned) — this is the GIF writer's only Python-loop stage, ~50x
    faster natively.
    """
    lib = _load()
    if lib is None:
        return None
    idx = np.ascontiguousarray(indices, dtype=np.uint8).ravel()
    cap = 2 * idx.size + 64
    buf = (ctypes.c_uint8 * cap)()
    n = lib.rx_gif_lzw(
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), idx.size,
        int(min_code_size), buf, cap)
    if n < 0:
        raise ValueError("native GIF LZW buffer too small")
    return bytes(bytearray(buf[:n]))
