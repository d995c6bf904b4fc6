#!/usr/bin/env python
"""Shade-pass breakdown on the real TPU: where do KillerooP's ~2 ms go?

Same sustained-scan methodology as tools/profile_raster.py.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from tools.profile_raster import bench  # noqa: E402


def main():
    from rustexp_tpu.assets import cubemap, mesh
    from rustexp_tpu.raster import camera, pipeline as pp, shaders as sh
    from rustexp_tpu.core.colors import pack_abgr32_gamma_arith

    np.asarray(jnp.zeros(8))  # honest-sync

    W = H = 512
    m = mesh.get_mesh(0)
    scene = pp.make_scene(m, cubemap.get_cm_set(0))
    eye = jnp.asarray(camera.camera_eye(mesh.mesh_camera(0), 0.0))
    tick = jnp.float32(0.0)
    cm = scene.cm

    key = jax.random.PRNGKey(0)
    p = jax.random.normal(key, (H, W, 3), jnp.float32)
    n = jax.random.normal(jax.random.PRNGKey(1), (H, W, 3), jnp.float32)
    col = jax.random.uniform(jax.random.PRNGKey(2), (H, W, 3), jnp.float32)

    bench(lambda p, n, c: sh.shader_fn(5)(p, n, c, eye, tick, cm),
          p, n, col, K=64, label="CMRefl full (2 gathers)")

    # pieces
    def texels(p, n):
        nn = sh.fast_normalize(n)
        return sh.cm_texel_from_dir(sh.reflect(p - eye, nn)), \
            sh.cm_texel_from_dir(nn)

    bench(lambda p, n: texels(p, n), p, n, K=64,
          label="  texel coords only (elementwise)")

    (rt, nt) = jax.jit(texels)(p, n)

    bench(lambda t0, t1, t2: sh.lookup_texel_powers(cm, (sh.COS_8, sh.COS_64),
                                                    (t0, t1, t2)),
          rt[0], rt[1], rt[2], K=64, label="  gather c8+c64 (262k rows of 6)")
    bench(lambda t0, t1, t2: sh.lookup_texel_cm(cm, sh.COS_1, (t0, t1, t2)),
          nt[0], nt[1], nt[2], K=64, label="  gather c1 (262k rows of 3)")

    flat = ((rt[0] * 64 + rt[1]) * 64 + rt[2]).reshape(-1)
    tab3 = cm[1].reshape(-1, 3)
    bench(lambda f: tab3[f], flat, K=64, label="  flat row gather [262k,3]")
    tab1 = cm[1].reshape(-1, 3)[:, 0]
    bench(lambda f: tab1[f], flat, K=64, label="  flat scalar gather [262k]")
    # padded-row variants: does minor-dim padding change the gather speed?
    for pad in (4, 8, 128):
        tabp = jnp.pad(tab3, ((0, 0), (0, pad - 3)))
        bench(lambda f, t=tabp: t[f], flat, K=64,
              label=f"  flat row gather [262k,{pad}]")

    # one-hot matmul alternative for the 24576-entry table
    tab6 = jnp.concatenate([cm[2].reshape(-1, 3), cm[3].reshape(-1, 3)], 1)

    def onehot_bf16(f):
        oh = jax.nn.one_hot(f, 24576, dtype=jnp.bfloat16)
        return oh @ tab6.astype(jnp.bfloat16)

    bench(onehot_bf16, flat, K=8, label="  one-hot bf16 matmul [262k,24576]")

    bench(lambda p_: pack_abgr32_gamma_arith(p_[..., 0], p_[..., 1],
                                             p_[..., 2]),
          p, K=64, label="gamma pack 512^2")

    # V-mode shade for comparison: vertex batch (~16k verts)
    vw = jax.random.normal(jax.random.PRNGKey(3), (m.positions.shape[0], 3))
    bench(lambda a, b, c: sh.shader_fn(5)(a, b, c, eye, tick, cm),
          vw, vw, jnp.abs(vw), K=64, label="CMRefl over 16k verts (V mode)")


if __name__ == "__main__":
    main()
