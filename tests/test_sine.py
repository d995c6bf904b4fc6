"""Sine scroller parity vs an independent numpy oracle of the reference math."""

import numpy as np
import jax.numpy as jnp

from rustexp_tpu.sims.sine import SineExperiment, sine_frame
from rustexp_tpu.core.framebuffer import save_framebuffer_png, read_png, to_rgb8_topleft


def _oracle(w, h, tick):
    """Scalar port of sine_scroller.rs:4-17 in float32."""
    fb = np.zeros((h, w), dtype=np.uint32)
    t = np.float32(tick)
    two_pi = np.float32(2.0) * np.float32(np.pi)
    for y in range(h):
        sy = np.sin((np.float32(y) / np.float32(64.0) + t) * two_pi, dtype=np.float32)
        for x in range(w):
            sx = np.sin((np.float32(x) / np.float32(64.0) + t) * two_pi, dtype=np.float32)
            gray = np.uint32((sx + 1) * np.float32(0.5) * ((sy + 1) * np.float32(0.5)) * 255.0)
            fb[y, x] = gray | (gray << 8) | (gray << 16)
    return fb


def test_sine_frame_matches_oracle():
    w, h, tick = 64, 48, 0.37
    got = np.asarray(
        sine_frame(jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32), tick)
    )
    want = _oracle(w, h, tick)
    # sin() differs by <=1ulp between XLA and numpy; allow the gray value to be
    # off by at most 1 in rare boundary cases
    r_got, r_want = (got & 0xFF).astype(np.int32), (want & 0xFF).astype(np.int32)
    assert np.abs(r_got - r_want).max() <= 1
    assert (r_got == r_want).mean() > 0.99
    # channels replicated
    assert np.array_equal((got >> 8) & 0xFF, got & 0xFF)
    assert np.array_equal((got >> 16) & 0xFF, got & 0xFF)


def test_experiment_api_and_png_roundtrip(tmp_path):
    exp = SineExperiment()
    st = exp.init()
    st = exp.step(st)
    fb = exp.render(st, 128, 96)
    assert fb.shape == (96, 128)
    p = tmp_path / "sine.png"
    save_framebuffer_png(str(p), fb)
    img = read_png(str(p))
    np.testing.assert_array_equal(img, to_rgb8_topleft(fb))
