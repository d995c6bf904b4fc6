"""The frame pipeline: vertex transform → raster → deferred shade → pack.

TPU-native replacement for the reference's ``rast_draw`` orchestrator
(rasterizer.rs:1891-2206). Structural differences, by design:

  * Vertex processing is one batched matmul over all vertices (vs. chunked
    thread-pool scalar loops, rasterizer.rs:1961-1985).
  * Fill mode rasterizes to a (z, tri_id, barycentrics) G-buffer, then a
    single deferred pass shades every visible pixel at once — per-pixel
    shading cost is overdraw-independent, unlike the reference's
    shade-inside-the-depth-test-branch (rasterizer.rs:1722-1744).
  * Per-vertex shading mode shades the vertex batch up front and the
    deferred pass merely interpolates colors — the same two paths as the
    reference's mk_rasterizer! macro instantiations (rasterizer.rs:1772-1773).

All interpolation formulas (z linear in screen space, attributes via
1/w-weighted barycentrics) match rasterizer.rs:1695-1744 exactly.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core.colors import pack_abgr32, pack_abgr32_gamma_arith
from ..ops.raster_setup import setup_triangles
from ..ops.raster_xla import GBuffer, raster_gbuffer_xla
from . import shaders as sh

MODE_POINT, MODE_LINE, MODE_FILL = 0, 1, 2
MODE_NAMES = ("Point", "Line", "Fill")

# Vertical-gradient backgrounds (start, end), rasterizer.rs:1287-1294
BACKGROUNDS = (
    ((0.3, 0.3, 0.3), (0.7, 0.7, 0.7)),
    ((1.0, 0.4, 0.0), (0.0, 0.5, 0.5)),
    ((1.0, 0.0, 1.0), (1.0, 0.0, 1.0)),
    ((1.0, 1.0, 1.0), (1.0, 1.0, 1.0)),
    ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0)),
)
NUM_BACKGROUNDS = len(BACKGROUNDS)


class Scene(NamedTuple):
    """Device-resident scene inputs for one frame (a pytree).

    The c_* members are the DE-INDEXED triangle corners ([3T, ...], corner
    j of triangle t at row 3t+j). Per-frame corner gathers (vp[tris[:, j]])
    cost ~5-8 ns per index on TPU's scalar core; de-indexing once at scene
    build turns the whole vertex pipeline into gather-free matmuls.
    """

    positions: jnp.ndarray  # f32 [V, 3] mesh-space
    normals: jnp.ndarray    # f32 [V, 3]
    colors: jnp.ndarray     # f32 [V, 3]
    tris: jnp.ndarray       # i32 [T, 3]
    ndim: jnp.ndarray       # f32 [4, 4] mesh -> unit cube (world)
    it33: jnp.ndarray       # f32 [3, 3] inverse-transpose of ndim's 3x3
    cm: jnp.ndarray         # f32 [5, 6, 64, 64, 3] irradiance cubemap set
    cross: jnp.ndarray      # u32 [ch, cw] unfolded cubemap preview
    c_pos: jnp.ndarray      # f32 [3T, 3] de-indexed corner positions
    c_nrm: jnp.ndarray      # f32 [3T, 3] de-indexed corner normals
    c_col: jnp.ndarray      # f32 [3T, 3] de-indexed corner baked colors
    cp3: jnp.ndarray        # f32 [3, 4, T] corner-major homogeneous positions
    cn3: jnp.ndarray        # f32 [3, 3, T] corner-major normals
    cc3: jnp.ndarray        # f32 [3, 3, T] corner-major baked colors


def make_scene(mesh, cm_set) -> Scene:
    """Build a Scene from assets.mesh.MeshData + assets.cubemap.CubeMapSet.

    The cp3/cn3/cc3 members are CORNER-MAJOR planar layouts (corner j,
    component k, triangle t): every per-triangle quantity downstream is a
    lane-major [T] vector. The [N, 3]-shaped c_* forms pad their minor dim
    to 128 lanes on TPU (~20x wasted bandwidth) and cost ~1 ms/frame at
    24k triangles through transform+setup; the planar forms make the whole
    geometry stage ~100 us.
    """
    ndim = mesh.normalize_dimensions()
    it33 = np.linalg.inv(ndim).T[:3, :3].astype(np.float32)
    tris = np.asarray(mesh.tris)
    flat = tris.reshape(-1)
    pos = np.asarray(mesh.positions)
    nrm = np.asarray(mesh.normals)
    col = np.asarray(mesh.colors)
    posh = np.concatenate([pos, np.ones((pos.shape[0], 1), np.float32)],
                          axis=1)
    return Scene(
        positions=jnp.asarray(mesh.positions),
        normals=jnp.asarray(mesh.normals),
        colors=jnp.asarray(mesh.colors),
        tris=jnp.asarray(mesh.tris),
        ndim=jnp.asarray(ndim),
        it33=jnp.asarray(it33),
        cm=jnp.asarray(cm_set.data),
        cross=jnp.asarray(cm_set.cross),
        c_pos=jnp.asarray(pos[flat]),
        c_nrm=jnp.asarray(nrm[flat]),
        c_col=jnp.asarray(col[flat]),
        cp3=jnp.asarray(posh[tris].transpose(1, 2, 0)),
        cn3=jnp.asarray(nrm[tris].transpose(1, 2, 0)),
        cc3=jnp.asarray(col[tris].transpose(1, 2, 0)),
    )


# ---------------------------------------------------------------------------
# Transform matrices (camera conventions from rasterizer.rs:1236-1259)
# ---------------------------------------------------------------------------


# --- strict-IEEE accumulation (VERDICT r3 next-6) ------------------------
#
# The reference's vertex transform is scalar f32 with per-op rounding and a
# fixed left-to-right accumulation order (nalgebra matmuls,
# rasterizer.rs:1180-1230; the parity oracle's m4_mul/m4_mul_v4 spell the
# order out). XLA preserves that order at the HLO level, but the CPU
# backend's LLVM codegen contracts mul+add pairs into FMAs regardless of
# every available flag (measured in tools/xform_parity.py: eager matches the
# scalar order bit-for-bit, any jitted mul->add chain is 1 ulp off). The
# escape is to launder each product's bits through integer ops keyed by a
# runtime-zero no compiler can constant-fold: the product must then be
# rounded to a real f32 before the add, which is exactly the reference's
# semantics. Costs two integer ops per protected product — immeasurable
# next to rasterization; elementwise [4,T] rows instead of [4,4]x[4,T]
# einsums is the same VPU work on TPU (the contraction axis is only 4).


from ..ops.ieee import (  # noqa: E402  (placed with its explanatory comment)
    lerp_2mad as _lerp_2mad,
    lerp_3w as _lerp_3w,
    seal as _seal,
    seal_zero as _seal_zero,
)


def _dot3_exact(a, b, z):
    return _seal(a[0] * b[0], z) + _seal(a[1] * b[1], z) + _seal(a[2] * b[2], z)


def _cross3_exact(a, b, z):
    return jnp.stack([
        _seal(a[1] * b[2], z) - _seal(a[2] * b[1], z),
        _seal(a[2] * b[0], z) - _seal(a[0] * b[2], z),
        _seal(a[0] * b[1], z) - _seal(a[1] * b[0], z),
    ])


def _mm4_exact(a, b, z):
    """Fixed-order 4x4 @ 4x4: s = a[i,0]*b[0,j]; s += a[i,1]*b[1,j]; ...
    (the oracle's m4_mul; nalgebra's Mul accumulates in the same order)."""
    s = _seal(a[:, 0:1] * b[0:1, :], z)
    s = s + _seal(a[:, 1:2] * b[1:2, :], z)
    s = s + _seal(a[:, 2:3] * b[2:3, :], z)
    s = s + _seal(a[:, 3:4] * b[3:4, :], z)
    return s


def _mv4_exact(m4, v, z):
    """Fixed-order [4,4] x [4,T] -> [4,T] (the oracle's m4_mul_v4)."""
    s = _seal(m4[:, 0:1] * v[0:1], z)
    s = s + _seal(m4[:, 1:2] * v[1:2], z)
    s = s + _seal(m4[:, 2:3] * v[2:3], z)
    s = s + _seal(m4[:, 3:4] * v[3:4], z)
    return s


def _mv3_exact(m3, v, z):
    """Fixed-order [3,3] x [3,T] -> [3,T] (the oracle's normal transform)."""
    s = _seal(m3[:, 0:1] * v[0:1], z)
    s = s + _seal(m3[:, 1:2] * v[1:2], z)
    s = s + _seal(m3[:, 2:3] * v[2:3], z)
    return s


def look_at(eye, at, up):
    """Reference look_at (rasterizer.rs:1236-1245): division-form normalize,
    left-to-right dots, translation column dot(-eye, axis) — per-op f32."""
    z = _seal_zero(eye)
    za = eye - at
    za = za / jnp.sqrt(_dot3_exact(za, za, z))
    xa = _cross3_exact(up, za, z)
    xa = xa / jnp.sqrt(_dot3_exact(xa, xa, z))
    ya = _cross3_exact(za, xa, z)
    ne = -eye
    return jnp.stack([
        jnp.stack([xa[0], xa[1], xa[2], _dot3_exact(ne, xa, z)]),
        jnp.stack([ya[0], ya[1], ya[2], _dot3_exact(ne, ya, z)]),
        jnp.stack([za[0], za[1], za[2], _dot3_exact(ne, za, z)]),
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32),
    ])


try:
    import ctypes as _ct

    _libm = _ct.CDLL("libm.so.6")
    _libm.tanf.restype = _ct.c_float
    _libm.tanf.argtypes = [_ct.c_float]

    def _tanf(x) -> np.float32:
        return np.float32(_libm.tanf(float(np.float32(x))))
except Exception:  # non-glibc host
    def _tanf(x) -> np.float32:
        return np.tan(np.float32(x))


def perspective(fovy_deg: float, aspect: float, near: float, far: float):
    """Per-op f32 like the reference (rasterizer.rs:1247-1258): tanf of the
    f32 degree product; every divide rounds f32. Static args, so this folds
    to a constant at trace time."""
    f = np.float32
    tan_half = _tanf(f(fovy_deg) * f(0.0174532925) / f(2.0))
    m00 = f(1.0) / (f(aspect) * tan_half)
    m11 = f(1.0) / tan_half
    m22 = -(f(far) + f(near)) / (f(far) - f(near))
    m23 = -(f(2.0) * f(far) * f(near)) / (f(far) - f(near))
    return jnp.array(
        [[m00, 0, 0, 0], [0, m11, 0, 0], [0, 0, m22, m23], [0, 0, -1.0, 0]],
        dtype=jnp.float32,
    )


def viewport_matrix(w: int, h: int):
    wh, hh = w / 2.0, h / 2.0
    return jnp.array(
        [[wh, 0, 0, wh], [0, hh, 0, hh], [0, 0, 1, 0], [0, 0, 0, 1]],
        dtype=jnp.float32,
    )


def inv_world_to_vp(eye, w: int, h: int):
    """Analytic inverse of the world->viewport chain (for ray unprojection).

    Composed from the analytic inverses of look_at (rigid), perspective, and
    viewport — numerically stable in f32, no linear solve.
    """
    zaxis = sh.normalize(eye - jnp.zeros(3, jnp.float32))
    xaxis = sh.normalize(jnp.cross(jnp.array([0.0, 1.0, 0.0]), zaxis))
    yaxis = jnp.cross(zaxis, xaxis)
    R = jnp.stack([xaxis, yaxis, zaxis])  # rows
    inv_look = jnp.concatenate(
        [jnp.concatenate([R.T, eye[:, None]], axis=1),
         jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=jnp.float32)], axis=0)

    aspect = w / h
    tan_half = np.tan(np.float32(45.0) * np.float32(0.0174532925) / 2.0)
    near, far = 0.1, 10.0
    m00 = 1.0 / (aspect * tan_half)
    m11 = 1.0 / tan_half
    m22 = -(far + near) / (far - near)
    m23 = -(2.0 * far * near) / (far - near)
    inv_persp = jnp.array(
        [[1.0 / m00, 0, 0, 0],
         [0, 1.0 / m11, 0, 0],
         [0, 0, 0, -1.0],
         [0, 0, 1.0 / m23, m22 / m23]], dtype=jnp.float32)

    wh, hh = w / 2.0, h / 2.0
    inv_vpm = jnp.array(
        [[1.0 / wh, 0, 0, -1.0], [0, 1.0 / hh, 0, -1.0],
         [0, 0, 1.0, 0], [0, 0, 0, 1.0]], dtype=jnp.float32)
    return inv_look @ inv_persp @ inv_vpm


def transform_vertices(scene: Scene, eye, w: int, h: int):
    """Mesh space -> (viewport vp with 1/w, world positions, world normals).

    Reference: transform_vertices, rasterizer.rs:1181-1231 — including the
    quirk of applying the viewport matrix *before* the perspective divide.
    """
    z = _seal_zero(eye)
    world_to_vp = _world_to_vp_exact(eye, w, h, z)
    pos_h = jnp.concatenate(
        [scene.positions, jnp.ones((scene.positions.shape[0], 1), jnp.float32)], axis=1
    )
    world_h = _mv4_exact(scene.ndim, pos_h.T, z).T
    world = world_h[:, :3]
    clip = _mv4_exact(world_to_vp, world_h.T, z).T
    inv_w = 1.0 / clip[:, 3]
    vp = jnp.concatenate(
        [_seal(clip[:, :3] * inv_w[:, None], z), inv_w[:, None]], axis=1)
    n_world = _mv3_exact(scene.it33, scene.normals.T, z).T
    return vp, world, n_world


def _world_to_vp_exact(eye, w: int, h: int, z):
    """(viewport @ perspective) @ look_at with the oracle's m4_mul order."""
    return _mm4_exact(
        _mm4_exact(viewport_matrix(w, h),
                   perspective(45.0, w / h, 0.1, 10.0), z),
        look_at(eye, jnp.zeros(3, jnp.float32), jnp.array([0.0, 1.0, 0.0])),
        z)


def transform_corners_planar(scene: Scene, eye, w: int, h: int):
    """Corner-major planar transform: no [N, k] intermediates anywhere.

    Returns (xs, ys, zs, iw, n, world) with xs/ys/zs/iw f32 [3, T] viewport
    coordinates per corner and n/world [3, 3, T] world-space normals /
    positions. Same two-step matmul chain as transform_vertices
    (mesh -> world via ndim, world -> viewport incl. the viewport-before-
    divide quirk, rasterizer.rs:1181-1231) in the reference's exact
    accumulation order on [3, 4, T] operands (see _seal above); vertex
    outputs are bit-identical to the scalar oracle's.
    """
    z = _seal_zero(eye)
    world_to_vp = _world_to_vp_exact(eye, w, h, z)
    world = jnp.stack([_mv4_exact(scene.ndim, scene.cp3[j], z)
                       for j in range(3)])                       # [3, 4, T]
    clip = jnp.stack([_mv4_exact(world_to_vp, world[j], z)
                      for j in range(3)])                        # [3, 4, T]
    iw = 1.0 / clip[:, 3]
    xs = _seal(clip[:, 0] * iw, z)
    ys = _seal(clip[:, 1] * iw, z)
    zs = _seal(clip[:, 2] * iw, z)
    n = jnp.stack([_mv3_exact(scene.it33, scene.cn3[j], z)
                   for j in range(3)])                           # [3, 3, T]
    return xs, ys, zs, iw, n, world[:, :3]


def transform_corners(scene: Scene, eye, w: int, h: int):
    """De-indexed corner transform: (vp_c [3T,4], n_c [3T,3]) — no gathers.

    Identical arithmetic per row as transform_vertices (same fixed-order
    contraction on the same values), so corner results are bit-equal to
    vp[tris[:, j]].
    """
    z = _seal_zero(eye)
    world_to_vp = _world_to_vp_exact(eye, w, h, z)
    pos_h = jnp.concatenate(
        [scene.c_pos, jnp.ones((scene.c_pos.shape[0], 1), jnp.float32)],
        axis=1)
    world_h = _mv4_exact(scene.ndim, pos_h.T, z).T
    clip = _mv4_exact(world_to_vp, world_h.T, z).T
    inv_w = 1.0 / clip[:, 3]
    vp_c = jnp.concatenate(
        [_seal(clip[:, :3] * inv_w[:, None], z), inv_w[:, None]], axis=1)
    n_c = _mv3_exact(scene.it33, scene.c_nrm.T, z).T
    return vp_c, n_c


# ---------------------------------------------------------------------------
# Deferred shading
# ---------------------------------------------------------------------------


def shade_gbuffer(
    gb: GBuffer,
    scene: Scene,
    vp,
    world,
    n_world,
    colors,
    eye,
    tick,
    *,
    per_pixel: bool,
    shader_idx: int,
    bg_fb,
):
    """Interpolate attributes for each visible pixel and shade once.

    Interpolation matches rasterizer.rs:1695-1744: z/w-linear screen-space
    barycentrics with perspective correction through interpolated 1/w.
    """
    h, w = gb.tid.shape
    mask = gb.tid >= 0
    # Flat 1-D indices: multi-dim advanced indexing takes XLA:TPU's slow
    # gather path; flat single-index gathers are ~300x faster.
    t = jnp.maximum(gb.tid, 0).reshape(-1)
    i0, i1, i2 = scene.tris[:, 0][t], scene.tris[:, 1][t], scene.tris[:, 2][t]
    b = gb.b.reshape(-1, 3)
    b0, b1, b2 = b[:, 0], b[:, 1], b[:, 2]

    vp_w = vp[:, 3]
    z = _seal_zero(vp)
    inv_w0, inv_w1, inv_w2 = vp_w[i0], vp_w[i1], vp_w[i2]
    w_raster = 1.0 / _lerp_2mad(inv_w0, inv_w1 - inv_w0, inv_w2 - inv_w0,
                                b2, b0, z)

    def persp_lerp_2mad(a0, a1, a2):
        """v0 + (v1-v0)*b2 + (v2-v0)*b0 form, pre-divided by w (colors).

        Per-op f32 like the reference's per-fragment chain
        (rasterizer.rs:1713-1719 / oracle.cpp c_raster): every product is
        sealed so LLVM cannot contract it into the following add."""
        base = _seal(a0 * inv_w0[..., None], z)
        d10 = _seal(a1 * inv_w1[..., None], z) - base
        d20 = _seal(a2 * inv_w2[..., None], z) - base
        return _lerp_2mad(base, d10, d20, b2[..., None], b0[..., None], z) \
            * w_raster[..., None]

    def persp_lerp_3w(a0, a1, a2):
        """b1/b2/b0-weighted form (world pos / normals,
        rasterizer.rs:1725-1733): (a_j*iw_j)*b — each product rounded, the
        reference's left-to-right order."""
        return _lerp_3w(
            _seal(a0 * inv_w0[..., None], z), _seal(a1 * inv_w1[..., None], z),
            _seal(a2 * inv_w2[..., None], z),
            b1[..., None], b2[..., None], b0[..., None], z,
        ) * w_raster[..., None]

    c = persp_lerp_2mad(colors[i0], colors[i1], colors[i2])
    if per_pixel:
        p = persp_lerp_3w(world[i0], world[i1], world[i2])
        n = persp_lerp_3w(n_world[i0], n_world[i1], n_world[i2])
        out = sh.shader_fn(shader_idx)(p, n, c, eye, tick, scene.cm)
    else:
        out = c  # vertices were pre-shaded

    packed = pack_abgr32_gamma_arith(
        out[..., 0], out[..., 1], out[..., 2]
    ).reshape(h, w)
    return jnp.where(mask, packed, bg_fb)


def raster_and_shade_pallas(
    scene: Scene, setup, vp, world, n_world, colors, eye, tick,
    *, w: int, h: int, per_pixel: bool, shader_idx: int, bg_fb, cap=None,
    spans=None, rows_cap=None,
):
    """Zero-gather Fill path: attributes interpolate inside the tile kernel.

    Per-pixel gathers cost ~100 ns/index on TPU's scalar core, so instead of
    a (tri-id, barycentric) G-buffer + gather-based deferred pass, the Pallas
    kernel interpolates 1/w, color (and world pos + normal when shading
    per-pixel) as screen-space planes — the same interpolation the reference
    runs per fragment (rasterizer.rs:1713-1744). Shading is then pure
    elementwise VPU work.

    Returns (fb, overflow): `overflow` is a traced bool scalar — True means
    the static bin capacity/spans were exceeded and triangles were dropped.
    """
    from ..ops.raster_pallas import (
        attr_channels_2mad, attr_channels_3w, raster_attrs_pallas,
    )

    tris = scene.tris
    i0, i1, i2 = tris[:, 0], tris[:, 1], tris[:, 2]
    iw0, iw1, iw2 = vp[i0, 3], vp[i1, 3], vp[i2, 3]
    ones = jnp.ones((tris.shape[0], 1), jnp.float32)

    def cat2(ci):
        return jnp.concatenate([ones, colors[ci]], axis=1)

    f2 = attr_channels_2mad(iw0, iw1, iw2, cat2(i0), cat2(i1), cat2(i2))
    n2, n3 = 4, 0
    extra = f2
    if per_pixel:
        def cat3(ci):
            return jnp.concatenate([world[ci], n_world[ci]], axis=1)

        f3 = attr_channels_3w(iw0, iw1, iw2, cat3(i0), cat3(i1), cat3(i2))
        extra = jnp.concatenate([f2, f3], axis=1)
        n3 = 6

    z, mask, lin, overflow = raster_attrs_pallas(setup, extra, n2, n3, h, w,
                                                 cap=cap, spans=spans)

    if per_pixel and rows_cap is not None:
        # Compact the shade to occupied 128-wide row-blocks, exactly like
        # the queue backend's _shade_compacted — for small meshes (Cube:
        # 12 triangles, bins backend) the two full-frame cubemap gathers
        # dominate the frame, and the kernel's own coverage mask bounds
        # the rows that can need shading. rows_cap is a static shape; if a
        # frame covers more row-blocks than it, the extras would silently
        # keep the background, so that raises `overflow` (re-bin signal),
        # same contract as the bin capacity itself.
        from ..ops.raster_queue import SHADE_W

        ntx_rb = w // SHADE_W
        occ = mask.reshape(h * ntx_rb, SHADE_W).any(axis=1)     # [h*ntx]
        rows = jnp.nonzero(occ, size=rows_cap,
                           fill_value=h * ntx_rb)[0].astype(jnp.int32)
        overflow = overflow | (jnp.count_nonzero(occ) > rows_cap)
        fb = _shade_compacted(rows, scene, z, mask, lin, eye, tick,
                              shader_idx, bg_fb, w, h, ray_world=False)
        return fb, overflow

    wr = 1.0 / lin[0]

    def ch_last(ps):
        return jnp.stack([q * wr for q in ps], axis=-1)

    c = ch_last(lin[1:4])
    if per_pixel:
        p = ch_last(lin[4:7])
        n = ch_last(lin[7:10])
        out = sh.shader_fn(shader_idx)(p, n, c, eye, tick, scene.cm)
    else:
        out = c
    packed = pack_abgr32_gamma_arith(out[..., 0], out[..., 1], out[..., 2])
    return jnp.where(mask, packed, bg_fb), overflow


def raster_and_shade_queue(
    scene: Scene, queue, colors, eye, tick,
    *, w: int, h: int, per_pixel: bool, shader_idx: int, bg_fb,
    ray_world: bool = True, defer: bool = False,
):
    """Flat-queue Fill path (ops/raster_queue.py) — the round-2 fast path.

    Uses the de-indexed corner arrays (Scene.c_*): triangle setup and
    attribute channels are built without a single per-frame gather (except
    one flat gather of per-vertex-shaded colors in V mode). Per-pixel world
    positions are reconstructed from the interpolated viewport (x, y, z, w)
    by the analytic inverse transform instead of interpolating three extra
    planes (VERDICT r1 #2c); set ray_world=False to interpolate them exactly
    like the reference (parity tests).

    `colors` is the per-unique-vertex shaded colors in V mode, or None in
    per-pixel mode (baked corner colors are static).

    `defer=True` routes through the z/slot-only kernel + per-winner
    re-evaluation (_shade_deferred) — bit-identical output, but MEASURED
    SLOWER on v5e (KillerooP 3.0 ms vs 1.55 ms): the kernel itself drops
    1067 -> 722 us (it is SMEM-scalar-read bound at ~1 ns/read, and the
    z-race needs 17 reads/pair vs 38), but the per-pixel winner re-fetch
    is a ~39-channel row gather at ~0.5 ns/element — ~2.3 ms at killeroo
    coverage. Per-pixel gathers lose to per-pair vector select+stores by
    ~1000x per element on this hardware; the flag is kept as the measured
    record and because a sparsecore-bearing part would change the verdict.

    Returns (fb, stale): `stale` means the cached queue no longer covers
    this frame — rebuild it and re-render.
    """
    from ..ops.raster_queue import raster_attrs_queue, raster_zslot_queue
    from ..ops.raster_setup import setup_triangles_planar

    xs, ys, zs, iw, n_c, world_c = transform_corners_planar(scene, eye, w, h)
    setup = setup_triangles_planar(xs, ys, zs, w, h)
    T = scene.tris.shape[0]
    one = jnp.ones((T,), jnp.float32)

    if per_pixel:
        cc = scene.cc3  # static baked corners, zero gathers
        crows = [cc[0], cc[1], cc[2]]         # [3, T] each
    else:
        # per-vertex shaded colors: one [T]-row gather per corner
        crows = [colors[scene.tris[:, j]].T for j in range(3)]

    def base_d(j):
        return [one, crows[j][0], crows[j][1], crows[j][2]]

    # attr_channels_2mad in planar form: (base, d10, d20) per channel.
    # Every product is sealed so the (q*iw - base) chain rounds per-op like
    # the reference's per-triangle c10/c20 precompute (oracle.cpp:1242-1243).
    zs_ = _seal_zero(iw)
    base = [_seal(q * iw[0], zs_) for q in base_d(0)]
    d10 = [_seal(q * iw[1], zs_) - b for q, b in zip(base_d(1), base)]
    d20 = [_seal(q * iw[2], zs_) - b for q, b in zip(base_d(2), base)]
    extra = base + d10 + d20
    n2, n3 = 4, 0
    if per_pixel:
        if ray_world:
            cat3 = [[n_c[j, k] for k in range(3)] for j in range(3)]
            n3 = 3
        else:
            cat3 = [[world_c[j, k] for k in range(3)]
                    + [n_c[j, k] for k in range(3)] for j in range(3)]
            n3 = 6
        # attr_channels_3w planar: (q*iw0, q*iw1, q*iw2) triples
        extra = extra + [_seal(q * iw[0], zs_) for q in cat3[0]] \
            + [_seal(q * iw[1], zs_) for q in cat3[1]] \
            + [_seal(q * iw[2], zs_) for q in cat3[2]]

    if defer:
        z, slot, rows_flat, stale = raster_zslot_queue(
            queue, setup, tuple(extra), h, w)
        fb = _shade_deferred(queue, scene, z, slot, rows_flat, n2, n3, eye,
                             tick, shader_idx, bg_fb, w, h, per_pixel,
                             ray_world)
        return fb, stale

    z, mask, lin, stale = raster_attrs_queue(queue, setup, tuple(extra),
                                             n2, n3, h, w)
    if per_pixel:
        fb = _shade_compacted(queue.rows, scene, z, mask, lin, eye, tick,
                              shader_idx, bg_fb, w, h, ray_world,
                              block_w=int(queue.shade_w))
        return fb, stale

    wr = 1.0 / lin[0]
    c = jnp.stack([q * wr for q in lin[1:4]], axis=-1)
    packed = pack_abgr32_gamma_arith(c[..., 0], c[..., 1], c[..., 2])
    return jnp.where(mask, packed, bg_fb), stale


def _shade_deferred(queue, scene: Scene, z, slot, rows_flat, n2: int, n3: int,
                    eye, tick, shader_idx: int, bg_fb, w: int, h: int,
                    per_pixel: bool, ray_world: bool):
    """Deferred shading from (z, slot): re-evaluate the WINNING pair only.

    The depth-race kernel (ops/raster_queue.raster_zslot_queue) stores no
    attribute planes; this pass compacts (z, slot) to the occupied
    row-blocks, gathers each pixel's winning-pair channel row with ONE
    rows_flat[slot] gather, and re-evaluates edges -> barycentrics ->
    attribute planes with exactly the kernel's formulas on exactly the
    same integers — bit-identical output to the select+store path, at
    one evaluation per PIXEL instead of one per PAIR (ROADMAP lever #1).
    """
    from ..ops.raster_queue import _F_CH, _I_CH

    SHADE_W = int(queue.shade_w)  # static: the granularity rows was built at
    ntx = w // SHADE_W
    rows = queue.rows                                       # [Rc]
    padr = rows >= h * ntx
    rows_g = jnp.where(padr, 0, rows)

    def comp(plane):
        return plane.reshape(h * ntx, SHADE_W)[rows_g]      # [Rc, SHADE_W]

    slotc = comp(slot)
    maskc = slotc >= 0
    sentinel = rows_flat.shape[0] - 1
    sg = jnp.where(maskc, slotc, sentinel).reshape(-1)
    px_rows = rows_flat[sg]                                 # [Rc*SW, CH]
    Rc = rows_g.shape[0]

    def fch(k):  # float channel k as [Rc, SHADE_W]
        return px_rows[:, _I_CH + k].reshape(Rc, SHADE_W)

    def ich(k):  # int channel k
        return jax.lax.bitcast_convert_type(
            px_rows[:, k].reshape(Rc, SHADE_W), jnp.int32)

    # Pixel coordinates of the compacted rows (global frame space)
    yc_i = (rows_g // ntx).astype(jnp.int32)[:, None]
    xc_i = ((rows_g % ntx) * SHADE_W).astype(jnp.int32)[:, None] \
        + jnp.arange(SHADE_W, dtype=jnp.int32)[None, :]
    xf = xc_i << 4
    yf = yc_i << 4

    # Same integer edge math as the kernel (28.4 fixed point)
    e0 = ich(0) * xf + ich(2) * yf + ich(4)
    e1 = ich(1) * xf + ich(3) * yf + ich(5)
    e2 = ich(6) - e0 - e1
    inv_a2 = fch(6)
    # Integer de-bias then ONE f32 rounding (rasterizer.rs:1695-1697);
    # f channels 0..2 hold the f32-encoded integer de-bias {1, 2}.
    b0 = (e0 - fch(0).astype(jnp.int32)).astype(jnp.float32) * inv_a2
    b1 = (e1 - fch(1).astype(jnp.int32)).astype(jnp.float32) * inv_a2
    b2 = (e2 - fch(2).astype(jnp.int32)).astype(jnp.float32) * inv_a2

    lins = []
    zz = _seal_zero(inv_a2)
    off = _F_CH
    for a in range(n2):
        lins.append(_lerp_2mad(fch(off + a), fch(off + n2 + a),
                               fch(off + 2 * n2 + a), b2, b0, zz))
    off = _F_CH + 3 * n2
    for a in range(n3):
        lins.append(_lerp_3w(fch(off + a), fch(off + n3 + a),
                             fch(off + 2 * n3 + a), b1, b2, b0, zz))

    wrc = 1.0 / lins[0]
    cc = jnp.stack([p_ * wrc for p_ in lins[1:4]], axis=-1)
    if per_pixel:
        if ray_world:
            nc = jnp.stack([p_ * wrc for p_ in lins[4:7]], axis=-1)
            zc = comp(z)
            M = inv_world_to_vp(eye, w, h)
            xcf = xc_i.astype(jnp.float32)
            ycf = jnp.broadcast_to(yc_i.astype(jnp.float32), (Rc, SHADE_W))
            pc = jnp.stack(
                [wrc * (M[i, 0] * xcf + M[i, 1] * ycf + M[i, 2] * zc + M[i, 3])
                 for i in range(3)], axis=-1)
        else:
            pc = jnp.stack([p_ * wrc for p_ in lins[4:7]], axis=-1)
            nc = jnp.stack([p_ * wrc for p_ in lins[7:10]], axis=-1)
        out = sh.shader_fn(shader_idx)(pc, nc, cc, eye, tick, scene.cm)
    else:
        out = cc  # vertices were pre-shaded; colors only interpolate
    packed = pack_abgr32_gamma_arith(out[..., 0], out[..., 1], out[..., 2])

    bgv = bg_fb.reshape(h * ntx, SHADE_W)
    merged = jnp.where(maskc, packed, bgv[rows_g])
    rows_s = jnp.where(padr, h * ntx, rows)  # pads scatter out of bounds
    # Same load-bearing barrier as _shade_compacted: keep the scatter out
    # of the gather+select fusion (XLA:TPU miscompile, tested).
    merged = jax.lax.optimization_barrier(merged)
    return bgv.at[rows_s].set(merged, mode="drop").reshape(h, w)


def _shade_compacted(rows, scene: Scene, z, mask, lin, eye, tick,
                     shader_idx: int, bg_fb, w: int, h: int, ray_world: bool,
                     y0=0, full_h: int | None = None, y_rows=None,
                     block_w: int | None = None):
    """Deferred per-pixel shading over OCCUPIED row-blocks only.

    The per-pixel cubemap lookups are row gathers at ~2.6 ns/index — the
    single largest cost of a P frame when run over all w*h pixels. Pixels
    outside the occupied row-block list `rows` (int32 [Rc], entries >=
    h*ntx are padding; the queue backend passes its build-frozen
    pair-AABB list, the bins backend a mask-derived per-frame list) can
    have no coverage, so the planes are compacted to [r_cap, tile_w] via
    a row gather (~1-2k indices), shaded there, and scattered back over
    the background. At killeroo only ~25% of row-blocks are occupied:
    the gathers, shader math, and gamma pack all shrink accordingly.
    (The reference never shades uncovered pixels either — its shader
    call sits inside the depth-test branch, rasterizer.rs:1722-1744.)

    `y0` / `full_h` support band-sharded frames (parallel/raster_shard.py):
    `h` is then the local band height while the ray-unprojection matrix
    and pixel rows use the GLOBAL frame (y0 = band's first global row,
    full_h = global frame height) — the interpolated planes themselves are
    translation-invariant, only the world-ray reconstruction sees absolute
    coordinates. `y_rows` ([h], overrides y0) maps each LOCAL row to an
    arbitrary global row — the cyclic tile-row interleave's
    non-contiguous bands.

    `block_w` (round 5, default raster_queue.SHADE_W) is the compaction
    granularity and must match what the rows list was built at: entries
    of `rows` index blocks of block_w pixels, id = (y*w + x0) / block_w.
    Narrower blocks skip uncovered x-spans inside occupied rows
    (silhouette scenes: TorusKnotP covers 58% of the frame at 32-px
    blocks vs 76% at 128) at the cost of more gather/scatter indices;
    64 is the measured sweet spot (see raster_queue.SHADE_W).
    """
    from ..ops.raster_queue import SHADE_W

    if block_w is None:
        block_w = SHADE_W
    ntx = w // block_w
    padr = rows >= h * ntx
    rows_g = jnp.where(padr, 0, rows)

    def comp(plane):
        return plane.reshape(h * ntx, block_w)[rows_g]      # [Rc, block_w]

    maskc = comp(mask)
    wrc = 1.0 / comp(lin[0])
    cc = jnp.stack([comp(p_) * wrc for p_ in lin[1:4]], axis=-1)
    if ray_world:
        nc = jnp.stack([comp(p_) * wrc for p_ in lin[4:7]], axis=-1)
        zc = comp(z)
        if y_rows is None:
            yc = (rows_g // ntx).astype(jnp.float32)[:, None] + y0
        else:
            yc = jnp.asarray(y_rows, jnp.float32)[rows_g // ntx][:, None]
        xc = ((rows_g % ntx) * block_w).astype(jnp.float32)[:, None] \
            + jnp.arange(block_w, dtype=jnp.float32)[None, :]
        M = inv_world_to_vp(eye, w, h if full_h is None else full_h)
        pc = jnp.stack(
            [wrc * (M[i, 0] * xc + M[i, 1] * yc + M[i, 2] * zc + M[i, 3])
             for i in range(3)], axis=-1)
    else:
        pc = jnp.stack([comp(p_) * wrc for p_ in lin[4:7]], axis=-1)
        nc = jnp.stack([comp(p_) * wrc for p_ in lin[7:10]], axis=-1)
    out = sh.shader_fn(shader_idx)(pc, nc, cc, eye, tick, scene.cm)
    packed = pack_abgr32_gamma_arith(out[..., 0], out[..., 1], out[..., 2])

    bgv = bg_fb.reshape(h * ntx, block_w)
    merged = jnp.where(maskc, packed, bgv[rows_g])
    rows_s = jnp.where(padr, h * ntx, rows)  # pads scatter out of bounds
    # The barrier is load-bearing: XLA:TPU miscompiles the fusion of the
    # compaction row-gathers + select + this scatter (whole occupied tiles
    # came back black under jit; each op alone and the barriered form are
    # correct). Keep the scatter out of the gather fusion.
    merged = jax.lax.optimization_barrier(merged)
    return bgv.at[rows_s].set(merged, mode="drop").reshape(h, w)


# ---------------------------------------------------------------------------
# Backgrounds, point/line modes, cubemap-cross overlay
# ---------------------------------------------------------------------------


def background(bg_idx: int, w: int, h: int, y0=0, full_h: int | None = None,
               y_rows=None):
    """Vertical gradient, packed without gamma (rasterizer.rs:1268-1299).

    `y0`/`full_h` evaluate a band of a taller frame's gradient at its
    GLOBAL rows (band-sharded rendering, parallel/raster_shard.py); y0
    may be traced (a mesh axis index). `y_rows` ([h] i32/f32, overrides
    y0) gives each local row an arbitrary global row — the cyclic
    tile-row interleave's non-contiguous bands.
    """
    start, end = BACKGROUNDS[bg_idx]
    ys_g = (y0 + jnp.arange(h, dtype=jnp.float32)) if y_rows is None \
        else jnp.asarray(y_rows, jnp.float32)
    pos = ys_g / float((h if full_h is None else full_h) - 1)
    col = (
        jnp.asarray(start, jnp.float32)[None, :] * (1.0 - pos)[:, None]
        + jnp.asarray(end, jnp.float32)[None, :] * pos[:, None]
    )
    row = pack_abgr32(col[:, 0], col[:, 1], col[:, 2])
    return jnp.broadcast_to(row[:, None], (h, w))


def draw_points(fb, vp, tris, w: int, h: int):
    """Point mode: one white dot per referenced vertex (rasterizer.rs:2013-2028)."""
    idx = tris.reshape(-1)
    x = vp[idx, 0].astype(jnp.int32)
    y = vp[idx, 1].astype(jnp.int32)
    ok = (x >= 0) & (x < w) & (y >= 0) & (y < h)
    x = jnp.where(ok, x, 0)
    y = jnp.where(ok, y, 0)
    val = jnp.where(ok, jnp.uint32(0x00FFFFFF), fb[y, x])
    return fb.at[y, x].set(val, mode="drop")


def draw_lines(fb, vp, tris, w: int, h: int, max_steps: int | None = None):
    """Wireframe via vectorized DDA (rasterizer.rs:1301-1329).

    Every edge takes MAX_STEPS parameter samples with unit max-axis spacing,
    masked beyond its true length — the static-shape equivalent of the
    reference's while loop.
    """
    if max_steps is None:
        max_steps = 2 * max(w, h)
    e1 = tris[:, [0, 1]]
    e2 = tris[:, [1, 2]]
    e3 = tris[:, [2, 0]]
    edges = jnp.concatenate([e1, e2, e3], axis=0)  # [E, 2]
    p1 = vp[edges[:, 0], 0:2]
    p2 = vp[edges[:, 1], 0:2]
    # Canonical direction so both windings draw identical pixels
    swap = p2[:, 0] <= p1[:, 0]
    a = jnp.where(swap[:, None], p2, p1)
    b = jnp.where(swap[:, None], p1, p2)
    d = b - a
    s = jnp.maximum(jnp.abs(d[:, 0]), jnp.abs(d[:, 1]))
    step = d / jnp.maximum(s, 1e-30)[:, None]
    m = jnp.arange(max_steps, dtype=jnp.float32)
    pts = a[:, None, :] + step[:, None, :] * m[None, :, None]  # [E, K, 2]
    live = m[None, :] < s[:, None]
    x = pts[..., 0].astype(jnp.int32)
    y = pts[..., 1].astype(jnp.int32)
    ok = live & (x >= 0) & (x < w) & (y >= 0) & (y < h)
    x = jnp.where(ok, x, 0).reshape(-1)
    y = jnp.where(ok, y, 0).reshape(-1)
    val = jnp.where(ok.reshape(-1), jnp.uint32(0x00FFFFFF), fb[y, x])
    return fb.at[y, x].set(val, mode="drop")


def overlay_cross(fb, cross, xorg: int = 10, yorg: int = 10):
    """Blit the unfolded-cubemap preview, skipping alpha-0 pixels
    (rasterizer.rs:529-551). Static placement, clipped to the frame."""
    h, w = fb.shape
    ch, cw = cross.shape
    x1, y1 = min(max(xorg, 0), w), min(max(yorg, 0), h)
    x2, y2 = min(x1 + cw, w), min(y1 + ch, h)
    if x2 <= x1 or y2 <= y1:
        return fb
    sub = cross[0 : y2 - y1, 0 : x2 - x1]
    region = fb[y1:y2, x1:x2]
    merged = jnp.where((sub & jnp.uint32(0xFF000000)) != 0, sub, region)
    return fb.at[y1:y2, x1:x2].set(merged)


# ---------------------------------------------------------------------------
# Frame orchestration
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("w", "h"))
def _max_bin_count_jit(scene: Scene, eye, w: int, h: int):
    from ..ops.raster_pallas import max_bin_count

    vp, _, _ = transform_vertices(scene, eye, w, h)
    setup = setup_triangles(vp, scene.tris, w, h)
    return max_bin_count(setup, h, w)


@partial(jax.jit, static_argnames=("w", "h"))
def _bin_stats_jit(scene: Scene, eye, w: int, h: int):
    from ..ops.raster_pallas import max_bin_count, max_spans
    from ..ops.raster_queue import SHADE_W

    vp, _, _ = transform_vertices(scene, eye, w, h)
    setup = setup_triangles(vp, scene.tris, w, h)
    sx, sy = max_spans(setup, h, w)

    # Upper bound on occupied SHADE_W-wide shade blocks: a block (y, tx)
    # can hold coverage only if some valid triangle's clipped AABB
    # intersects it. One [h,T]x[T,ntx] matmul (MXU) beats any scatter.
    ntx = -(-w // SHADE_W)
    ys = jnp.arange(h, dtype=jnp.int32)
    occ_y = ((ys[:, None] >= setup.min_y[None, :])
             & (ys[:, None] < setup.max_y[None, :]))          # [h, T]
    tx0 = jnp.arange(ntx, dtype=jnp.int32) * SHADE_W
    occ_x = ((tx0[None, :] < setup.max_x[:, None])
             & (tx0[None, :] + SHADE_W > setup.min_x[:, None])
             & setup.valid[:, None])                          # [T, ntx]
    occ = jnp.dot(occ_y.astype(jnp.float32), occ_x.astype(jnp.float32)) > 0
    return max_bin_count(setup, h, w), sx, sy, jnp.count_nonzero(occ)


def suggest_binning(scene: Scene, eye, w: int, h: int, margin: float = 1.3):
    """(cap, (m_x, m_y), rows_cap) for the bins backend, one device trip.

    The span margin (+1 tile each way) absorbs camera motion; bin_pairs
    still reports `overflow` if a frame ever exceeds it. rows_cap bounds
    the occupied shade row-blocks (render_frame's raster_rows) with the
    same margin, from the AABB union — a superset of any coverage mask —
    or None when >=75% of the frame's row-blocks can be occupied:
    compacting then costs more in row gathers + scatter-back than the
    skipped shade saves (measured: CubeP, 70% coverage, 1236 -> 1324 us).
    """
    mc, sx, sy, rc = jax.device_get(
        _bin_stats_jit(scene, jnp.asarray(eye, jnp.float32), w, h)
    )
    from ..ops.raster_queue import SHADE_W

    need = max(512, int(int(mc) * margin))
    cap = (need + 511) // 512 * 512
    ntx = -(-w // SHADE_W)
    rows_cap = min(h * ntx, max(64, (int(int(rc) * margin) + 63) // 64 * 64))
    if rows_cap >= (h * ntx * 3) // 4:
        rows_cap = None
    return cap, (int(sx) + 1, int(sy) + 1), rows_cap


@partial(jax.jit, static_argnames=("w", "h"))
def _queue_stats_jit(scene: Scene, eye, w: int, h: int):
    from ..ops.raster_queue import queue_stats
    from ..ops.raster_setup import setup_triangles_planar

    xs, ys, zs, _, _, _ = transform_corners_planar(scene, eye, w, h)
    setup = setup_triangles_planar(xs, ys, zs, w, h)
    return queue_stats(setup, h, w)


@partial(jax.jit, static_argnames=("w", "h", "s_cap", "m_y", "m_x", "t_cap",
                                   "shade_w"))
def _build_queue_jit(scene: Scene, eye, w: int, h: int, s_cap: int,
                     m_y: int, m_x: int, t_cap: int,
                     shade_w: int | None = None):
    from ..ops.raster_queue import SHADE_W, build_queue
    from ..ops.raster_setup import setup_triangles_planar

    # The build MUST use the same planar setup as the per-frame path:
    # a bitwise-different transform could snap a triangle into a tile the
    # cached structure never enumerated.
    xs, ys, zs, _, _, _ = transform_corners_planar(scene, eye, w, h)
    setup = setup_triangles_planar(xs, ys, zs, w, h)
    return build_queue(setup, h, w, s_cap=s_cap, m_y=m_y, m_x=m_x,
                       t_cap=t_cap,
                       shade_w=SHADE_W if shade_w is None else shade_w)


def build_scene_queue(scene: Scene, eye, w: int, h: int,
                      margin: float = 1.3, per_pixel: bool = True,
                      shade_w: int | None = None):
    """Measure + build the flat raster queue for this scene/viewpoint.

    One device round-trip for the static config, then a jitted build. The
    result is a pytree cacheable across frames; render_frame reports `stale`
    (via return_overflow) when the camera has moved beyond it. The
    compacted-shade granularity is chosen per scene from the measured
    occupancy (ops.raster_queue.choose_shade_w) and travels WITH the queue;
    pass per_pixel=False for V-mode configs (the rows list is unused there).
    """
    from ..ops.raster_queue import choose_shade_w, suggest_queue_config

    eye = jnp.asarray(eye, jnp.float32)
    stats = tuple(int(x) for x in
                  jax.device_get(_queue_stats_jit(scene, eye, w, h)))
    if shade_w is None:
        shade_w = choose_shade_w(stats[3], stats[4], per_pixel=per_pixel)
    from ..ops.raster_queue import SHADE_W

    occ = stats[3] if shade_w == SHADE_W else stats[4]
    s_cap, m_y, m_x, t_cap = suggest_queue_config(
        stats[:3] + (occ,), margin=margin)
    return _build_queue_jit(scene, eye, w, h, s_cap, m_y, m_x, t_cap,
                            shade_w)


def suggest_cap(scene: Scene, eye, w: int, h: int, margin: float = 1.3) -> int:
    """Pick a power-of-two bin capacity for this scene/viewpoint.

    The tile kernel's bin capacity is a static shape; oversizing it streams
    empty chunks (HBM traffic + grid steps), undersizing drops triangles.
    One cheap device round-trip bounds the real maximum, and the margin
    absorbs camera motion without recompiling every frame.
    """
    m = int(_max_bin_count_jit(scene, jnp.asarray(eye, jnp.float32), w, h))
    need = max(512, int(m * margin))
    return (need + 511) // 512 * 512  # chunk-multiple; bin cost scales with cap


@partial(
    jax.jit,
    static_argnames=(
        "w", "h", "mode", "per_pixel", "shader_idx", "bg_idx", "show_cm",
        "backend", "raster_cap", "raster_spans", "raster_rows",
        "return_overflow",
    ),
)
def render_frame(
    scene: Scene,
    eye,
    tick,
    *,
    w: int,
    h: int,
    mode: int = MODE_FILL,
    per_pixel: bool = False,
    shader_idx: int = 5,
    bg_idx: int = 0,
    show_cm: bool | None = None,
    backend: str = "auto",
    raster_cap: int | None = None,
    raster_spans: tuple | None = None,
    raster_rows: int | None = None,
    raster_queue=None,
    return_overflow: bool = False,
):
    """Render one frame -> uint32 ABGR [h, w], bottom-left origin.

    The TPU-native rast_draw (rasterizer.rs:1891-2206). ``backend`` selects
    the G-buffer producer: "xla" (whole-frame oracle), "pallas" (binned tile
    kernel), "queue" (flat-queue kernel, pass a prebuilt `raster_queue`
    from ops.raster_queue.build_queue), or "auto" (pallas for real meshes,
    xla for tiny ones).

    With ``return_overflow=True`` returns (fb, overflow): a traced bool that
    is True when the Pallas binner's static capacity/spans were exceeded and
    triangles were dropped. Interactive callers must re-bin when it fires
    (the reference's dynamic bins are exact by construction,
    rasterizer.rs:2115-2163; our static-shape bins trade that for a flag).
    """
    if show_cm is None:
        show_cm = sh.shader_uses_cm(shader_idx)

    eye = jnp.asarray(eye, jnp.float32)
    tick = jnp.float32(tick)
    vp, world, n_world = transform_vertices(scene, eye, w, h)

    fb = background(bg_idx, w, h)
    overflow = jnp.bool_(False)

    if mode == MODE_POINT:
        fb = draw_points(fb, vp, scene.tris, w, h)
    elif mode == MODE_LINE:
        fb = draw_lines(fb, vp, scene.tris, w, h)
    else:
        colors = scene.colors
        if not per_pixel:
            colors = sh.shader_fn(shader_idx)(
                world, n_world, scene.colors, eye, tick, scene.cm
            )
        setup = setup_triangles(vp, scene.tris, w, h)
        from ..ops.raster_pallas import TILE_H, TILE_W

        tileable = h % TILE_H == 0 and w % TILE_W == 0
        if backend == "queue" and raster_queue is not None:
            fb, overflow = raster_and_shade_queue(
                scene, raster_queue, None if per_pixel else colors,
                eye, tick, w=w, h=h, per_pixel=per_pixel,
                shader_idx=shader_idx, bg_fb=fb,
            )
        elif backend == "pallas" or (backend in ("auto", "queue")
                                     and tileable):
            fb, overflow = raster_and_shade_pallas(
                scene, setup, vp, world, n_world, colors, eye, tick,
                w=w, h=h, per_pixel=per_pixel, shader_idx=shader_idx, bg_fb=fb,
                cap=raster_cap, spans=raster_spans, rows_cap=raster_rows,
            )
        else:
            gb = raster_gbuffer_xla(setup, h, w)
            fb = shade_gbuffer(
                gb, scene, vp, world, n_world, colors, eye, tick,
                per_pixel=per_pixel, shader_idx=shader_idx, bg_fb=fb,
            )

    if show_cm:
        fb = overlay_cross(fb, scene.cross)
    if return_overflow:
        return fb, overflow
    return fb
