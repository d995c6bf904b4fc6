"""Color packing / LUT parity tests.

The gamma and pow16 LUTs are regenerated from their closed forms; these tests
check them element-by-element against the tables embedded in the reference
source (rasterizer.rs:1395-1510, rasterizer.rs:1071-1115) when available.
"""

import re

import numpy as np
import jax.numpy as jnp

from rustexp_tpu.core import colors


def _parse_rust_array(src: str, pattern: str, dtype):
    m = re.search(pattern, src, re.S)
    assert m, "table not found in reference source"
    vals = [x.strip() for x in m.group(1).replace("\n", " ").split(",") if x.strip()]
    return np.array([dtype(v) for v in vals])


def test_gamma_lut_matches_reference(reference_root):
    src = open(f"{reference_root}/rs-src/rasterizer.rs").read()
    ref = _parse_rust_array(src, r"static GAMMA_11BIT_LUT: \[u8; 2048\] = \[(.*?)\];", int)
    assert ref.shape == (2048,)
    np.testing.assert_array_equal(ref.astype(np.uint8), colors.GAMMA_11BIT_LUT)


def test_pow16_table_matches_reference(reference_root):
    src = open(f"{reference_root}/rs-src/rasterizer.rs").read()
    ref = _parse_rust_array(src, r"static TBL: \[f32; 256\] = \[(.*?)\];", float).astype(
        np.float32
    )
    assert ref.shape == (256,)
    # identical up to 1 ulp of f32 pow evaluation differences
    np.testing.assert_allclose(ref, colors.POW16_TABLE, rtol=0, atol=1e-7)


def test_pack_abgr32_truncation_and_clamp():
    r = jnp.array([0.0, 1.0, 0.5, -0.2, 2.0])
    g = jnp.array([0.0, 1.0, 0.999, 0.0, 0.0])
    b = jnp.array([0.0, 1.0, 0.001, 0.5, 0.5])
    out = np.asarray(colors.pack_abgr32(r, g, b))
    # truncation: 0.5*255 = 127.5 -> 127; 0.999*255 = 254.745 -> 254
    assert out[2] == 127 | (254 << 8) | (0 << 16)
    assert out[0] == 0
    assert out[1] == 255 | (255 << 8) | (255 << 16)
    assert out[3] & 0xFF == 0  # clamped below
    assert out[4] & 0xFF == 255  # clamped above


def test_pack_gamma_endpoints():
    out = np.asarray(colors.pack_abgr32_gamma(jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0)))
    assert out == 255 | (0 << 8) | (255 << 16)
    # negative red forces red AND blue to zero (reference quirk rasterizer.rs:1376)
    out2 = np.asarray(
        colors.pack_abgr32_gamma(jnp.float32(-0.5), jnp.float32(0.5), jnp.float32(1.0))
    )
    assert out2 & 0xFF == 0
    assert (out2 >> 16) & 0xFF == 0


def test_add_abgr32_saturates():
    c1 = jnp.uint32(200 | (200 << 8) | (10 << 16))
    c2 = jnp.uint32(100 | (40 << 8) | (20 << 16))
    out = int(np.asarray(colors.add_abgr32(c1, c2)))
    assert out == 255 | (240 << 8) | (30 << 16)


def test_fast_unit_pow16_against_exact():
    v = jnp.linspace(0.0, 1.0, 1001)
    approx = np.asarray(colors.fast_unit_pow16(v))
    exact = np.asarray(v, dtype=np.float64) ** 16
    # floor-lookup quantization: worst step near x=1 is d(x^16)/dx / 855 ~ 16/855
    assert np.all(np.abs(approx - exact) < 16.0 / 855.0)
    assert approx[0] == 0.0 and approx[-1] == 1.0


def test_rgb8_to_abgr32():
    # golden body color from the reference N-body renderer (nbody.rs:520)
    assert colors.rgb8_to_abgr32(255, 215, 130, 0.3) == 76 | (64 << 8) | (39 << 16)


def test_gamma_arith_matches_lut():
    """The arithmetic gamma pack recomputes the LUT's generator formula;
    any deviation is float-pow rounding at the odd half-step and must stay
    within 1 output LSB on a handful of entries."""
    import numpy as np
    import jax.numpy as jnp
    from rustexp_tpu.core.colors import (
        GAMMA_11BIT_LUT, pack_abgr32_gamma, pack_abgr32_gamma_arith,
    )

    v = jnp.asarray((np.arange(2048, dtype=np.float32) + 0.5) / 2047.0)
    a = np.asarray(pack_abgr32_gamma_arith(v, v, v)) & 0xFF
    b = np.asarray(pack_abgr32_gamma(v, v, v)) & 0xFF
    diff = np.abs(a.astype(int) - b.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).sum() <= 20


def test_pow16_arith_matches_lut():
    import numpy as np
    import jax.numpy as jnp
    from rustexp_tpu.core.colors import POW16_TABLE, fast_unit_pow16_arith

    v = jnp.asarray((np.arange(256, dtype=np.float32) + 600.5) / 855.0)
    got = np.asarray(fast_unit_pow16_arith(v))
    np.testing.assert_allclose(got, POW16_TABLE, rtol=2e-5)


def test_font_overlay():
    import numpy as np
    import jax.numpy as jnp
    from rustexp_tpu.core.font import GLYPH_H, GLYPH_W, draw_text, text_mask

    m = text_mask("AB 1|?")
    assert m.shape == (GLYPH_H, 6 * GLYPH_W)
    assert m.sum() > 30
    # unknown chars fall back to '?'
    assert np.array_equal(text_mask("\x01"), text_mask("?"))

    fb = jnp.zeros((32, 128), jnp.uint32)
    out = np.asarray(draw_text(fb, "HI", color=0x00FFFFFF))
    assert (out == 0x00FFFFFF).sum() == text_mask("HI").sum()
    # text sits near the TOP of the (bottom-left-origin) framebuffer
    ys = np.nonzero(out == 0x00FFFFFF)[0]
    assert ys.min() > 16
