"""Pallas bitonic sorter — key-value sort at VPU rate, in VMEM.

XLA's TPU sort made the per-step Morton sort the single largest line
item of the block Barnes-Hut N-body step (sort + 5 permutation gathers
= 3.35 ms of the 11.4 ms step at N=131,072, BASELINE.md attribution).
A bitonic network is a far better fit for the hardware: every
compare-exchange stage is the same data-independent pattern over the
whole array, so it vectorizes to pltpu.roll + select on [8, 128] vregs
with zero scalar work, and payloads ride through the network instead of
paying a post-sort gather each.

Layout: the [n] array is viewed as [n // 128, 128] (sublanes x lanes),
element i at (i >> 7, i & 127). Bitonic partners are i XOR j for
power-of-two j:

  * j < 128 flips lane bits only — partners stay in the SAME row, and
    because XOR by j never carries, `roll(x, -j)` along lanes delivers
    partner values to every element whose bit j is 0, `roll(x, +j)` to
    every element whose bit is 1 (a static lane mask selects between
    them);
  * j >= 128 flips row bits only — same trick along the sublane axis.

The sort key is the LEXICOGRAPHIC pair (key, idx): ties in `key` break
by original position, which makes the result IDENTICAL to
jax.numpy.argsort's stable order — the sorter is a bit-exact drop-in
(tests/test_sort_bitonic.py). The swap decision is computed once per
stage from the key pair and reused for every carried value array, so
payloads ride along for 3 vector ops each (2 rolls + select) instead of
a post-sort gather.

n must be a power of two and >= 256 (two [8,128] vregs). For the
N-body use the caller pads to the next power of two with +inf keys.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _partner(v, j: int, rows: int):
    """Value of each element's XOR-j partner, for power-of-two j."""
    if j < LANES:
        lo = pltpu.roll(v, LANES - j, 1)   # roll by -j: lane l reads l+j
        hi = pltpu.roll(v, j, 1)           # lane l reads l-j
        lane = lax.broadcasted_iota(jnp.int32, v.shape, 1)
        return jnp.where(lane & j == 0, lo, hi)
    r = j // LANES
    lo = pltpu.roll(v, rows - r, 0)
    hi = pltpu.roll(v, r, 0)
    row = lax.broadcasted_iota(jnp.int32, v.shape, 0)
    return jnp.where(row & r == 0, lo, hi)


def _partner_dyn(v, j, rows: int):
    """Partner values for a TRACED power-of-two j (loop-mode kernel).

    XOR by j flips either lane bits (j < 128) or row bits (j >= 128),
    never both; composing a dynamic lane-XOR (amount j & 127, identity
    when 0) with a dynamic row-XOR (amount j >> 7, identity when 0)
    therefore realizes any j with 4 rolls + 2 selects."""
    jl = j & (LANES - 1)
    jr = j >> 7
    lane = lax.broadcasted_iota(jnp.int32, v.shape, 1)
    row = lax.broadcasted_iota(jnp.int32, v.shape, 0)
    v = jnp.where((lane & jl) == 0,
                  pltpu.roll(v, (LANES - jl) % LANES, 1),
                  pltpu.roll(v, jl, 1))
    return jnp.where((row & jr) == 0,
                     pltpu.roll(v, (rows - jr) % rows, 0),
                     pltpu.roll(v, jr, 0))


def _substage_table(n: int) -> tuple[list[int], list[int]]:
    """(j, k) per compare-exchange substage of the n-element network."""
    js, ks = [], []
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            js.append(j)
            ks.append(k)
            j //= 2
        k *= 2
    return js, ks


def _merge_table(n: int) -> tuple[list[int], list[int]]:
    """(j, k) substages of the ascending bitonic MERGE of a bitonic
    n-sequence — the final k == n block of the full network (log n
    substages instead of the sort's log^2 n). Correct only when the
    input is bitonic under the (key, idx) order, e.g. either half of a
    Batcher compare-split of two sorted sequences."""
    js, ks = [], []
    j = n // 2
    while j >= 1:
        js.append(j)
        ks.append(n)
        j //= 2
    return js, ks


def _exchange(key, idx, vals, pkey, pidx, pvals, flat, j, k):
    """One compare-exchange given own and partner values; j/k may be
    Python ints (unrolled mode) or traced scalars (loop mode)."""
    mine_first = (key < pkey) | ((key == pkey) & (idx < pidx))
    low_side = (flat & j) == 0
    up = (flat & k) == 0
    # ascending run: low side keeps min -> keep own iff
    # mine_first == low_side; descending run: inverted
    keep = jnp.logical_xor(mine_first == low_side, ~up)
    key = jnp.where(keep, key, pkey)
    idx = jnp.where(keep, idx, pidx)
    vals = [jnp.where(keep, v, pv) for v, pv in zip(vals, pvals)]
    return key, idx, vals


def _make_kernel(n: int, nv: int, table=None):
    """Fully unrolled network: every substage has STATIC roll amounts
    (2 rolls + select per array). Fastest form, but Mosaic compile cost
    grows as substages x vregs — used below an instruction budget."""
    rows = n // LANES
    if table is None:
        table = _substage_table(n)

    def kernel(*refs):
        # refs = [key_in, idx_in, v_in..., key_out, idx_out, v_out...]
        ins = refs[: 2 + nv]
        outs = refs[2 + nv:]
        key = ins[0][:]
        idx = ins[1][:]
        vals = [ins[2 + i][:] for i in range(nv)]
        flat = (lax.broadcasted_iota(jnp.int32, key.shape, 0) * LANES
                + lax.broadcasted_iota(jnp.int32, key.shape, 1))

        for j, k in zip(*table):
            key, idx, vals = _exchange(
                key, idx, vals,
                _partner(key, j, rows), _partner(idx, j, rows),
                [_partner(v, j, rows) for v in vals], flat, j, k)

        outs[0][:] = key
        outs[1][:] = idx
        for i in range(nv):
            outs[2 + i][:] = vals[i]

    return kernel


def _make_kernel_loop(n: int, nv: int):
    """fori_loop over the substage table with TRACED (j, k) — one
    compiled body regardless of n (the GoL adaptive-unroll lesson:
    unrolled vector code on many-vreg operands explodes Mosaic compile
    time). Partner fetch costs 4 rolls + 2 selects per array instead of
    the unrolled form's 2 + 1."""
    rows = n // LANES

    def kernel(js_ref, ks_ref, *refs):
        ins = refs[: 2 + nv]
        outs = refs[2 + nv:]
        flat = (lax.broadcasted_iota(jnp.int32, ins[0].shape, 0) * LANES
                + lax.broadcasted_iota(jnp.int32, ins[0].shape, 1))
        n_sub = js_ref.shape[0]

        def body(s, carry):
            key, idx, vals = carry
            j = js_ref[s]
            k = ks_ref[s]
            return _exchange(
                key, idx, vals,
                _partner_dyn(key, j, rows), _partner_dyn(idx, j, rows),
                [_partner_dyn(v, j, rows) for v in vals], flat, j, k)

        key, idx, vals = lax.fori_loop(
            0, n_sub,
            body, (ins[0][:], ins[1][:], [ins[2 + i][:] for i in range(nv)]))
        outs[0][:] = key
        outs[1][:] = idx
        for i in range(nv):
            outs[2 + i][:] = vals[i]

    return kernel


# Mosaic compile budget for the unrolled network, in (substages x vregs
# x ops) units — beyond it the loop-mode kernel compiles in seconds
# where the unrolled form takes minutes (measured on the GoL kernel's
# identical pathology; see ops/gol_bits._pick_unroll).
_UNROLL_BUDGET = 60_000


def _use_loop(substages: int, n: int, nv: int) -> bool:
    vregs = max(1, n // 1024)
    return substages * vregs * (3 * (nv + 2) + 6) > _UNROLL_BUDGET


def _run_network(key, idx, values, table, interpret):
    """Run a (j, k) substage table over (key, idx, values); returns the
    permuted (key, idx, values) with idx carried through the network."""
    n = key.shape[0]
    assert n >= 256 and (n & (n - 1)) == 0, f"n={n} not a power of two"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows = n // LANES
    shaped = [key.reshape(rows, LANES), idx.reshape(rows, LANES)]
    shaped += [v.reshape(rows, LANES) for v in values]
    nv = len(values)
    out_shapes = [jax.ShapeDtypeStruct((rows, LANES), a.dtype)
                  for a in shaped]
    vmem = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(shaped)
    if _use_loop(len(table[0]), n, nv):
        js, ks = table
        outs = pl.pallas_call(
            _make_kernel_loop(n, nv),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 + vmem,
            out_specs=vmem,
            out_shape=out_shapes,
            interpret=interpret,
        )(jnp.asarray(js, jnp.int32), jnp.asarray(ks, jnp.int32), *shaped)
    else:
        outs = pl.pallas_call(
            _make_kernel(n, nv, table),
            in_specs=vmem,
            out_specs=vmem,
            out_shape=out_shapes,
            interpret=interpret,
        )(*shaped)
    return (outs[0].reshape(n), outs[1].reshape(n),
            [o.reshape(n) for o in outs[2:]])


@partial(jax.jit, static_argnames=("interpret",))
def sort_kv(key, values, interpret: bool | None = None, idx=None):
    """Stable sort of int32 `key` carrying `values` (list of f32/i32 [n]).

    Returns (sorted_key, sorted_values_list). Bit-identical to
    jnp.argsort(key, stable=True) applied to every array. n must be a
    power of two, >= 256, and small enough that (2 + len(values)) arrays
    of n * 4 bytes plus temporaries fit VMEM (131072 x 8 arrays = 4 MB
    is the N-body use and compiles fine).

    `idx` (optional i32 [n]) replaces the implicit arange tiebreak: the
    sort order becomes lexicographic (key, idx) — the distributed sort
    (parallel/sort_shard.py) passes GLOBAL positions here so every chunk
    breaks ties the way a replicated stable sort of the whole would."""
    if idx is None:
        idx = jnp.arange(key.shape[0], dtype=jnp.int32)
    skey, _, svals = _run_network(key, idx, values,
                                  _substage_table(key.shape[0]), interpret)
    return skey, svals


@partial(jax.jit, static_argnames=("interpret",))
def merge_kv(key, idx, values, interpret: bool | None = None):
    """Ascending bitonic MERGE of a (key, idx)-bitonic sequence carrying
    `values` — log n substages vs the full sort's log^2 n. The inputs of
    record: either half of a Batcher compare-split of two (key, idx)-
    sorted sequences is bitonic, which is exactly what the distributed
    sort's cross-device stages produce. Returns (key, idx, values)."""
    return _run_network(key, idx, values, _merge_table(key.shape[0]),
                        interpret)
