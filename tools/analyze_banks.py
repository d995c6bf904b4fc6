#!/usr/bin/env python
"""Measure cubemap-texel bank locality per screen tile on real scenes.

For each 12-suite scene (P mode), render the G-buffer, compute the CMRefl
texel indices (normal + reflection), and report the distribution of
distinct/spanned 128-entry banks per 8x128 tile — the cost model for an
in-kernel banked gather. Also: occupied-tile fraction (shade-skip win).
"""

from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from rustexp_tpu.assets import cubemap, mesh
from rustexp_tpu.raster import camera, pipeline as pp, shaders as sh
from rustexp_tpu.ops.raster_setup import setup_triangles
from rustexp_tpu.ops.raster_xla import raster_gbuffer_xla

W = H = 512
TH, TW = 8, 128


def texels_for(mesh_idx):
    m = mesh.get_mesh(mesh_idx)
    cm = cubemap.get_cm_set(0)
    scene = pp.make_scene(m, cm)
    eye = jnp.asarray(camera.camera_eye(mesh.mesh_camera(mesh_idx), 0.0))
    vp, world, n_world = pp.transform_vertices(scene, eye, W, H)
    setup = setup_triangles(vp, scene.tris, W, H)
    gb = raster_gbuffer_xla(setup, H, W)
    mask = gb.tid >= 0
    t = jnp.maximum(gb.tid, 0).reshape(-1)
    tris = scene.tris
    i0, i1, i2 = tris[:, 0][t], tris[:, 1][t], tris[:, 2][t]
    b = gb.b.reshape(-1, 3)
    b0, b1, b2 = b[:, 0], b[:, 1], b[:, 2]
    vp_w = vp[:, 3]
    iw0, iw1, iw2 = vp_w[i0], vp_w[i1], vp_w[i2]
    wr = 1.0 / (iw0 + (iw1 - iw0) * b2 + (iw2 - iw0) * b0)

    def lerp3(a0, a1, a2):
        return (a0 * (iw0 * b1)[:, None] + a1 * (iw1 * b2)[:, None]
                + a2 * (iw2 * b0)[:, None]) * wr[:, None]

    p = lerp3(world[i0], world[i1], world[i2])
    n = lerp3(n_world[i0], n_world[i1], n_world[i2])
    nn = sh.fast_normalize(n)
    r = sh.reflect(p - jnp.asarray(eye), nn)
    fn_, tyn, txn = sh.cm_texel_from_dir(nn)
    fr_, tyr, txr = sh.cm_texel_from_dir(r)
    flat_n = ((fn_ * 64 + tyn) * 64 + txn).reshape(H, W)
    flat_r = ((fr_ * 64 + tyr) * 64 + txr).reshape(H, W)
    return (np.asarray(mask).reshape(H, W), np.asarray(flat_n),
            np.asarray(flat_r))


def tile_stats(mask, fn, fr, morton=False):
    nty, ntx = H // TH, W // TW
    occupied = spans = 0
    span_list = []
    distinct_list = []
    for ty in range(nty):
        for tx in range(ntx):
            ms = mask[ty * TH:(ty + 1) * TH, tx * TW:(tx + 1) * TW]
            if not ms.any():
                continue
            occupied += 1
            tot_span = 0
            tot_distinct = 0
            for f in (fn, fr):
                v = f[ty * TH:(ty + 1) * TH, tx * TW:(tx + 1) * TW][ms]
                if morton:
                    face, rem = v // 4096, v % 4096
                    tyv, txv = rem // 64, rem % 64
                    # 8x16 texel patches: bank = face*32 + (ty//8)*8 + tx//16
                    b = face * 32 + (tyv // 8) * 4 + (txv // 16)
                else:
                    b = v >> 7
                tot_span += int(b.max() - b.min() + 1)
                tot_distinct += len(np.unique(b))
            span_list.append(tot_span)
            distinct_list.append(tot_distinct)
    sl = np.array(span_list)
    dl = np.array(distinct_list)
    return occupied, nty * ntx, sl, dl


for mi, name in ((0, "Killeroo"), (1, "Head"), (4, "Hand"), (6, "TorusKnot"),
                 (9, "Cube"), (11, "CornellBox")):
    mask, fn, fr = texels_for(mi)
    occ, tot, sl, dl = tile_stats(mask, fn, fr)
    occm, _, slm, dlm = tile_stats(mask, fn, fr, morton=True)
    cov = mask.mean()
    print(f"{name:<11} cov {cov:5.1%} occ_tiles {occ}/{tot} "
          f"| span(n+r): med {np.median(sl):4.0f} p90 {np.percentile(sl, 90):4.0f} "
          f"max {sl.max():4d} mean {sl.mean():5.1f} "
          f"| distinct: med {np.median(dl):3.0f} p90 {np.percentile(dl, 90):4.0f} "
          f"| morton-bank span med {np.median(slm):4.0f} p90 "
          f"{np.percentile(slm, 90):4.0f}", flush=True)
