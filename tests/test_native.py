"""Native C++ loader runtime: cross-check against the numpy fallbacks."""

import os

import numpy as np
import pytest

from rustexp_tpu import native
from rustexp_tpu.assets import hdr, mesh


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library unavailable (no g++?)")
    return native


def test_native_mesh_parse_matches_python(lib):
    text = (
        "# header\n3\n"
        "0 0 0 0 0 1 0.5 0.25 0.125\n"
        "1 0 0 0 0 1 1 1 1\n"
        "0 1 0 0 0 1 0 0 0\n"
        "3\n0 1 2\n"
    )
    vd_n, ix_n = lib.parse_mesh(text.encode(), 9)
    vd_p, ix_p = mesh._parse_tokens_py(text, 9, "t")
    np.testing.assert_array_equal(vd_n, vd_p)
    np.testing.assert_array_equal(ix_n.ravel(), ix_p.ravel())


def test_native_mesh_parse_rejects_bad_index(lib):
    text = "3\n0 0 0 0 0 1\n1 0 0 0 0 1\n0 1 0 0 0 1\n3\n0 1 9\n"
    with pytest.raises(ValueError):
        lib.parse_mesh(text.encode(), 6)


def test_native_hdr_matches_python(lib, reference_root):
    p = os.path.join(reference_root, "envmaps", "grace", "env_cos_8_y-.hdr")
    if not os.path.isfile(p):
        pytest.skip("grace envmap missing")
    img_native = hdr.load_hdr(p)
    orig = native.available
    native.available = lambda: False
    try:
        img_py = hdr.load_hdr(p)
    finally:
        native.available = orig
    np.testing.assert_array_equal(img_native, img_py)


def test_reference_mesh_via_native(lib, reference_root):
    p = os.path.join(reference_root, "meshes", "cube.dat")
    if not os.path.isfile(p):
        pytest.skip("cube.dat missing")
    m = mesh.load_mesh(p, mesh.XYZ_N_RGB)
    assert m.num_tris == 12


def test_ansi_frame_matches_python():
    """The C++ ANSI pump must emit the same escape stream as the Python
    fallback when every adjacent cell color differs (dedup never fires),
    and a semantically-equal, shorter stream when colors repeat."""
    from rustexp_tpu import native
    from rustexp_tpu.app.viewer import fb_to_ansi_py

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    # all-distinct colors: byte-identical output
    rgb = rng.integers(0, 256, (8, 16, 3), dtype=np.uint8)
    # force adjacent distinctness by xoring in the cell index
    rgb[..., 0] ^= (np.arange(16, dtype=np.uint8) * 7)[None, :]
    assert native.ansi_frame(rgb) == fb_to_ansi_py(rgb)
    # flat frame: dedup emits two color codes per row, far shorter
    flat = np.full((8, 64, 3), 77, np.uint8)
    out = native.ansi_frame(flat)
    assert len(out) < len(fb_to_ansi_py(flat)) / 3
    assert out.count("▀") == 4 * 64


def test_gif_lzw_native_matches_python():
    """The C++ GIF LZW encoder must be BYTE-identical to the pure-Python
    fallback (same clear-first, growth, and 4096-reset rules) across
    palette depths, including the empty and single-pixel streams."""
    import numpy as np
    import pytest

    from rustexp_tpu import native
    from rustexp_tpu.core.gif import _lzw_encode_py

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    cases = [(0, 2), (1, 2), (7, 2), (4096, 2), (100000, 8), (65536, 4),
             (12345, 6)]
    for n, mcs in cases:
        idx = rng.integers(0, 1 << mcs, n).astype(np.uint8)
        assert native.gif_lzw(idx, mcs) == _lzw_encode_py(idx, mcs), (n, mcs)
    # highly repetitive stream: exercises long dictionary chains
    idx = np.tile(np.arange(16, dtype=np.uint8), 8192)
    assert native.gif_lzw(idx, 8) == _lzw_encode_py(idx, 8)
