"""Bit-packed (SWAR) Game of Life kernel — 32 cells per uint32 word.

Same semantics as ops/gol_stencil.py (reference: gol_step,
rs-src/gol.rs:31-170 — 8-neighbor torus sum, rule ``alive_nb == 3 ||
(alive && alive_nb == 2)``, gol.rs:79), but cells are BITS: word
``P[w, c]`` bit ``b`` holds ``cell[32*w + b, c]``, so one [8, 128] vreg
carries 32,768 cells and the whole neighbor count runs as bitwise
full-adder logic (carry-save arithmetic) on the VPU:

  * 32x fewer vregs per grid than the f32 roll kernel — a 256^2 grid is
    TWO vregs, and the VMEM-resident ceiling rises from ~640k cells to
    multi-megacell grids.
  * ~45 bitwise ops/generation on those few vregs vs ~12 roll/add ops
    per generation on 32x more vregs for the f32 form.

Packing rows (not columns) into bits keeps both neighbor axes cheap:
column neighbors are lane rolls of the packed array, row neighbors are
in-word shifts with a 1-sublane roll carrying the word-boundary bit.
The bit-level rule is exact — cells are binary, the carry-save adders
compute the same integer neighbor count, so this path is bit-identical
to step_roll/step_mxu (tests/test_gol.py::test_swar_parity).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BITS = 32
_UNROLL = 32


def pack_rows(grid) -> jnp.ndarray:
    """[R, C] {0,1} int grid -> [R//32, C] uint32, bit b = row 32w+b."""
    r, c = grid.shape
    assert r % BITS == 0, f"rows {r} not a multiple of {BITS}"
    g = grid.astype(jnp.uint32).reshape(r // BITS, BITS, c)
    w = jnp.uint32(1) << jnp.arange(BITS, dtype=jnp.uint32)
    return (g * w[None, :, None]).sum(axis=1, dtype=jnp.uint32)


def unpack_rows(packed, dtype=jnp.int32) -> jnp.ndarray:
    """[W, C] uint32 -> [32*W, C] {0,1} of `dtype`."""
    wn, c = packed.shape
    b = (packed[:, None, :] >> jnp.arange(BITS, dtype=jnp.uint32)[None, :, None])
    return (b & jnp.uint32(1)).astype(dtype).reshape(wn * BITS, c)


def _gen_bits(p, wn: int, cn: int):
    """One generation on the packed grid (torus). ~45 bitwise vreg-ops.

    Carry-save adders: the vertical 3-row sum per cell is 2 bits
    (s1, s0), the horizontal sum of three such 2-bit numbers is the 4-bit
    3x3 box count (b3..b0); the rule in box form (box = neighbors + self)
    is ``box == 3 || (alive && box == 4)`` — identical to the reference's
    ``nb == 3 || (alive && nb == 2)``.
    """
    one = jnp.uint32(1)
    b31 = jnp.uint32(BITS - 1)

    # Row neighbors: bit b of `up` is cell[32w+b-1], i.e. the row above.
    up = (p << one) | (pltpu.roll(p, 1, 0) >> b31)
    down = (p >> one) | (pltpu.roll(p, wn - 1, 0) << b31)

    # Vertical triple up+p+down as 2-bit carry-save (s1, s0)
    s0 = up ^ p ^ down
    s1 = (up & p) | (down & (up ^ p))

    # Column neighbors of the 2-bit sums
    l0 = pltpu.roll(s0, 1, 1)
    l1 = pltpu.roll(s1, 1, 1)
    r0 = pltpu.roll(s0, cn - 1, 1)
    r1 = pltpu.roll(s1, cn - 1, 1)

    # box bit0 + carry into the 2s column
    b0 = l0 ^ s0 ^ r0
    c0 = (l0 & s0) | (r0 & (l0 ^ s0))

    # 2s column: l1 + s1 + r1 + c0 (0..4) -> bits (b1, h0, h1)
    sa = l1 ^ s1
    ca = l1 & s1
    sb = r1 ^ c0
    cb = r1 & c0
    b1 = sa ^ sb
    c2 = sa & sb
    b2 = ca ^ cb ^ c2
    b3 = (ca & cb) | (c2 & (ca ^ cb))

    # box == 3: b1 & b0, none above; box == 4: only b2
    n23 = ~(b2 | b3)
    eq3 = b0 & b1 & n23
    eq4 = b2 & ~(b0 | b1 | b3)
    return eq3 | (p & eq4)


def _swar_kernel(steps_ref, grid_ref, out_ref, *, wn: int, cn: int):
    steps = steps_ref[0]

    def body_u(_, g):
        for _ in range(_UNROLL):
            g = _gen_bits(g, wn, cn)
        return g

    g = grid_ref[:]
    g = lax.fori_loop(0, steps // _UNROLL, body_u, g)
    out_ref[:] = lax.fori_loop(0, steps % _UNROLL,
                               lambda _, x: _gen_bits(x, wn, cn), g)


@partial(jax.jit, static_argnames=("interpret",))
def multi_step_packed(packed, k, interpret: bool | None = None):
    """k generations on a packed [W, C] uint32 grid, one Pallas dispatch.

    k is a traced scalar (prefetch) — no recompile on change. The packed
    grid plus the adder temporaries stay VMEM-resident for all k steps.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    wn, cn = packed.shape
    return pl.pallas_call(
        partial(_swar_kernel, wn=wn, cn=cn),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((wn, cn), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray([k], dtype=jnp.int32), packed)


# The adder temporaries keep ~8 packed-grid copies live; guard the
# scoped-VMEM limit (16 MB on v5e) with margin. 2048^2 compiles and runs
# (0.5 MB packed, measured 3.75 us/gen = 1.12e12 cells/s); 4096^2 (2 MB
# packed) FAILS TPU compile — shard rows beyond this (parallel/gol_shard).
MAX_CELLS = 2048 * 2048


@partial(jax.jit, static_argnames=("interpret",))
def multi_step_swar(grid, k, interpret: bool | None = None):
    """Drop-in multi_step: [R, C] cell grid -> k generations -> same shape.

    Packs rows to bits, runs the SWAR kernel, unpacks. Pack/unpack is two
    cheap vector passes per DISPATCH (not per generation).
    """
    r, c = grid.shape
    if r % BITS or r * c > MAX_CELLS:
        raise ValueError(
            f"{r}x{c} grid not supported by the SWAR kernel "
            f"(rows % {BITS} == 0 and cells <= {MAX_CELLS}); use "
            "multi_step_swar_banded, gol_stencil.multi_step, or shard "
            "rows (parallel/gol_shard)")
    out = multi_step_packed(pack_rows(grid), k, interpret=interpret)
    return unpack_rows(out, dtype=grid.dtype)


@partial(jax.jit, static_argnames=("k", "band", "interpret"))
def multi_step_swar_banded(grid, k: int, band: int = 512,
                           interpret: bool | None = None):
    """SWAR generations for grids PAST the single-dispatch VMEM ceiling.

    Single-chip analog of parallel/gol_shard's "bits" backend: the grid
    is cut into row bands, each band is padded with h = ceil(k/16)*16
    halo rows from its torus neighbors, and vmap runs the packed kernel
    over all bands in one dispatch (vmap over pallas_call becomes a
    leading grid dimension — each band's packed block plus adder
    temporaries is VMEM-resident on its own). The kernel's wrong y-wrap
    at band edges contaminates one row per generation inward; h halo
    rows absorb all k generations, so the interior is bit-exact
    (tests/test_gol.py::test_swar_banded_parity). Redundant halo compute
    is 2h/band per band (~6% at band=512, k<=256... h<=256); unlike
    MAX_CELLS there is no grid-size ceiling — 4096^2 and 8192^2 run at
    SWAR rates where the MXU circulant path decays as 1/n.

    k is STATIC here (it sets the halo depth); band must divide rows,
    and band % 32 == 0, h <= band (k <= band generations per dispatch).
    """
    r, c = grid.shape
    if r % band or band % BITS:
        raise ValueError(f"rows {r} need band | rows and band % {BITS} == 0")
    h = -(-int(k) // (BITS // 2)) * (BITS // 2)
    if h > band:
        raise ValueError(f"k={k} needs h={h} > band={band}; raise band")
    nb = r // band
    bands = grid.reshape(nb, band, c)
    lo = jnp.roll(bands, 1, axis=0)[:, -h:, :]    # rows above each band
    hi = jnp.roll(bands, -1, axis=0)[:, :h, :]    # rows below
    padded = jnp.concatenate([lo, bands, hi], axis=1)  # [nb, band+2h, c]
    packed = jax.vmap(pack_rows)(padded)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    stepped = jax.vmap(
        lambda p: multi_step_packed(p, jnp.int32(k), interpret=interpret)
    )(packed)
    full = jax.vmap(partial(unpack_rows, dtype=grid.dtype))(stepped)
    return full[:, h:h + band, :].reshape(r, c)
