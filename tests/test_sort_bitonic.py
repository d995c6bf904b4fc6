"""The Pallas bitonic key-value sorter (ops/sort_bitonic.py) must be a
bit-exact drop-in for stable argsort-then-gather — it replaces XLA's
sort in the N-body Morton step, so any deviation would silently change
block membership and physics."""

import numpy as np
import jax.numpy as jnp

from rustexp_tpu.ops.sort_bitonic import sort_kv


def _check(n, key_hi, nv, seed):
    rng = np.random.default_rng(seed)
    key = jnp.asarray(rng.integers(0, key_hi, n).astype(np.int32))
    vals = [jnp.asarray(rng.standard_normal(n).astype(np.float32))
            for _ in range(nv)]
    sk, svs = sort_kv(key, vals)
    order = np.argsort(np.asarray(key), kind="stable")
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(key)[order])
    for sv, v in zip(svs, vals):
        np.testing.assert_array_equal(np.asarray(sv), np.asarray(v)[order])


def test_matches_stable_argsort_with_ties():
    """Heavy ties (key range << n) exercise the lexicographic (key, idx)
    tie-break that makes the network reproduce STABLE order."""
    _check(1024, 7, 2, seed=1)


def test_unique_keys_and_many_payloads():
    """Distinct keys, 5 payload arrays (the N-body carry set)."""
    _check(2048, 1 << 30, 5, seed=2)


def test_already_sorted_and_reversed():
    srt = jnp.arange(512, dtype=jnp.int32)
    v = jnp.arange(512, dtype=jnp.float32) * 0.5
    sk, (sv,) = sort_kv(srt, [v])
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(srt))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(v))
    rev = srt[::-1]
    sk, (sv,) = sort_kv(rev, [v])
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(srt))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(v)[::-1])


def test_minimum_size():
    _check(256, 17, 1, seed=3)


def test_loop_mode_matches(monkeypatch):
    """The fori_loop kernel (dynamic roll amounts, used past the Mosaic
    compile budget — the production N=131k path) is the same network as
    the unrolled form; force it at test size and re-check stability."""
    from rustexp_tpu.ops import sort_bitonic as sb

    monkeypatch.setattr(sb, "_UNROLL_BUDGET", 1)
    assert sb._use_loop(len(sb._substage_table(256)[0]), 256, 1)
    _check(512, 5, 3, seed=4)


def test_merge_kv_bitonic_input():
    """merge_kv sorts any (key, idx)-bitonic input — in particular the
    halves of a Batcher compare-split of two sorted chunks, which is how
    the distributed sort (parallel/sort_shard) uses it."""
    import numpy as np

    from rustexp_tpu.ops import sort_bitonic as sb

    rng = np.random.default_rng(7)
    n = 512
    # build two stably-sorted (key, gidx) chunks and split them
    ka = np.sort(rng.integers(0, 40, n).astype(np.int32))
    kb = np.sort(rng.integers(0, 40, n).astype(np.int32))
    ga = np.arange(n, dtype=np.int32)
    gb = np.arange(n, 2 * n, dtype=np.int32)
    va = rng.standard_normal(n).astype(np.float32)
    vb = rng.standard_normal(n).astype(np.float32)
    kbr, gbr, vbr = kb[::-1], gb[::-1], vb[::-1]
    mine_first = (ka < kbr) | ((ka == kbr) & (ga < gbr))
    for keep in (mine_first, ~mine_first):  # min-half and max-half
        key = np.where(keep, ka, kbr)
        gidx = np.where(keep, ga, gbr)
        val = np.where(keep, va, vbr)
        sk, sg, sv = sb.merge_kv(jnp.asarray(key), jnp.asarray(gidx),
                                 [jnp.asarray(val)], interpret=True)
        order = np.lexsort((gidx, key))
        np.testing.assert_array_equal(np.asarray(sk), key[order])
        np.testing.assert_array_equal(np.asarray(sg), gidx[order])
        np.testing.assert_array_equal(np.asarray(sv[0]), val[order])
