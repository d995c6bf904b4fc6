"""Multi-chip rasterization: row-band frame sharding over a device Mesh.

TPU-native scaling of the reference's tile-parallel Fill path
(rasterizer.rs:2074-2198, P4 in SURVEY.md §2.4): the framebuffer is split
into horizontal bands, one per device. Vertex processing is replicated
(cheap — one batched matmul), each device bins and rasterizes only the
triangles overlapping its band, then shades locally; no inter-device
communication is needed at all (tile exclusivity), so the only collective
is the implicit final gather when the caller assembles the frame.

The band translation trick keeps fixed-point parity: shifting viewport
coordinates by an integer row offset before the 28.4 snap commutes with
truncation, so band-local rasterization is bit-identical to the
corresponding rows of a single-device render.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.raster_setup import setup_triangles
from ..ops.raster_xla import raster_gbuffer_xla
from ..raster import pipeline as pp


def make_sharded_render(
    mesh: Mesh,
    *,
    w: int,
    h: int,
    per_pixel: bool = False,
    shader_idx: int = 5,
    bg_idx: int = 0,
    backend: str = "xla",
    axis="rows",
    return_overflow: bool = False,
):
    """Build a jitted (scene, eye, tick) -> fb renderer sharded over `axis`.

    The returned framebuffer is row-sharded across the mesh; callers can
    keep computing on it sharded or pull it to host for display. With
    ``return_overflow=True`` (pallas backend) the renderer also returns an
    any-reduced bool: True if any device's bins overflowed and dropped
    triangles.
    """
    from .gol_shard import axis_size

    n_dev = axis_size(mesh, axis)
    if h % n_dev:
        raise ValueError(f"frame height {h} not divisible by {n_dev} devices")
    band_h = h // n_dev

    def band_render(scene: pp.Scene, eye, tick):
        dev = jax.lax.axis_index(axis)
        y_org = (dev * band_h).astype(jnp.float32)

        vp, world, n_world = pp.transform_vertices(scene, eye, w, h)
        colors = scene.colors
        if not per_pixel:
            colors = pp.sh.shader_fn(shader_idx)(
                world, n_world, scene.colors, eye, tick, scene.cm
            )
        # Integer band translation: exact under the 28.4 truncating snap
        vp_local = vp.at[:, 1].add(-y_org)
        setup = setup_triangles(vp_local, scene.tris, w, band_h)
        overflow = jnp.bool_(False)
        if backend == "pallas":
            from ..ops.raster_pallas import raster_gbuffer_pallas

            gb, overflow = raster_gbuffer_pallas(setup, band_h, w)
        else:
            gb = raster_gbuffer_xla(setup, band_h, w)

        # Band slice of the vertical gradient, evaluated at global rows
        start, end = pp.BACKGROUNDS[bg_idx]
        pos = (dev * band_h + jnp.arange(band_h, dtype=jnp.float32)) / float(h - 1)
        col = (jnp.asarray(start, jnp.float32)[None, :] * (1.0 - pos)[:, None]
               + jnp.asarray(end, jnp.float32)[None, :] * pos[:, None])
        from ..core.colors import pack_abgr32

        row = pack_abgr32(col[:, 0], col[:, 1], col[:, 2])
        bg = jnp.broadcast_to(row[:, None], (band_h, w))

        # Shading interpolates from *untranslated* vertex attributes; the
        # barycentrics are translation-invariant so this is exact.
        fb = pp.shade_gbuffer(
            gb, scene, vp, world, n_world, colors, eye, tick,
            per_pixel=per_pixel, shader_idx=shader_idx, bg_fb=bg,
        )
        if return_overflow:
            any_overflow = jax.lax.pmax(overflow.astype(jnp.int32), axis) > 0
            return fb, any_overflow
        return fb

    replicated = P()
    out_specs = (P(axis, None), P()) if return_overflow else P(axis, None)
    fn = shard_map(
        band_render,
        mesh=mesh,
        in_specs=(replicated, replicated, replicated),
        out_specs=out_specs,
        check_rep=False,
    )
    if return_overflow:
        out_sharding = (NamedSharding(mesh, P(axis, None)),
                        NamedSharding(mesh, P()))
    else:
        out_sharding = NamedSharding(mesh, P(axis, None))
    return jax.jit(fn, out_shardings=out_sharding)


def render_frame_sharded(scene, eye, tick, mesh: Mesh, **kw):
    """One-shot convenience wrapper around make_sharded_render."""
    fn = make_sharded_render(mesh, **kw)
    return fn(scene, jnp.asarray(eye, jnp.float32), jnp.float32(tick))
