"""Unit contracts for the device lookup primitives in tpu/trie.py.

The integration suites exercise these through the pipelines; these pin
the primitives' exact semantics directly against numpy on adversarial
inputs (bound indices, negative values through byte planes, unique-hit
scatters, walk-step equivalence)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def jnp():
    import jax
    import jax.numpy as jnp
    return jnp


def test_taa_mxu_matches_numpy(jnp):
    from sentencepiece_tpu.tpu import trie

    rng = np.random.default_rng(3)
    for B, N, O in [(4, 8, 8), (16, 128, 130), (3, 2048, 64)]:
        arr = rng.integers(-(1 << 31), 1 << 31, (B, N)).astype(np.int32)
        idx = rng.integers(0, N, (B, O)).astype(np.int32)
        idx[0, 0] = 0
        idx[-1, -1] = N - 1
        got = np.asarray(trie.taa_mxu(jnp.asarray(arr), jnp.asarray(idx)))
        want = np.take_along_axis(arr, idx, axis=1)
        assert np.array_equal(got, want), (B, N, O)


def test_taa_mxu_value_bits_uint8(jnp):
    from sentencepiece_tpu.tpu import trie

    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (8, 64)).astype(np.uint8)
    idx = rng.integers(0, 64, (8, 70)).astype(np.int32)
    got = np.asarray(trie.taa_mxu(jnp.asarray(arr), jnp.asarray(idx),
                                  value_bits=8))
    assert got.dtype == np.uint8
    assert np.array_equal(got, np.take_along_axis(arr, idx, axis=1))


def test_scatter_rowlocal_matches_numpy(jnp):
    from sentencepiece_tpu.tpu import trie

    rng = np.random.default_rng(5)
    for B, N, O in [(4, 16, 16), (16, 128, 130), (2, 2048, 100)]:
        vals = rng.integers(0, 1 << 20, (B, N)).astype(np.int32)
        # unique in-range columns per row + some dropped (>= O)
        cols = np.stack([rng.permutation(max(N, O))[:N] for _ in range(B)])
        cols = cols.astype(np.int32)
        got = np.asarray(trie.scatter_rowlocal_mxu(
            jnp.asarray(vals), jnp.asarray(cols), O, fill=-7,
            value_bits=20))
        want = np.full((B, O), -7, np.int32)
        for b in range(B):
            for n in range(N):
                if cols[b, n] < O:
                    want[b, cols[b, n]] = vals[b, n]
        assert np.array_equal(got, want), (B, N, O)


def test_utf8_classifier_np_jnp_agree(jnp):
    """The shared UTF-8 classifier must produce identical results on
    its numpy (host width estimator) and jax.numpy (device normalizer)
    instantiations — the overflow-guard reasoning depends on it."""
    from sentencepiece_tpu.tpu import utf8

    rng = np.random.default_rng(9)
    batch = rng.integers(0, 256, (16, 96)).astype(np.uint8)
    lens = rng.integers(0, 97, 16).astype(np.int32)
    cl_n, v_n = utf8.utf8_class(np, batch, lens)
    cl_j, v_j = utf8.utf8_class(jnp, jnp.asarray(batch), jnp.asarray(lens))
    assert np.array_equal(cl_n, np.asarray(cl_j))
    assert np.array_equal(v_n, np.asarray(v_j))
    cov_n = utf8.covered_continuations(np, batch, v_n, cl_n)
    cov_j = utf8.covered_continuations(jnp, jnp.asarray(batch), v_j, cl_j)
    assert np.array_equal(cov_n, np.asarray(cov_j))


def test_step_root_and_pair_match_generic_walk(jnp):
    """step_root + step_pair must reproduce the generic darts walk's
    first two steps exactly on a real vocab trie."""
    import jax
    from sentencepiece_tpu.tpu import trie
    from sentencepiece_tpu.utils import darts

    keys = sorted([b"a", b"ab", b"abc", b"b", b"ba", b"\xe2\x96\x81a",
                   b"\xe2\x96\x81", b"zz", b"zzz", b"q"])
    da = darts.build(keys, list(range(len(keys))))
    units_np = np.asarray(da.units, np.uint32)
    paired = jnp.asarray(trie.build_paired(units_np))
    u0 = int(units_np[0])
    root = int((u0 >> 10) << (((u0 >> 9) & 1) << 3))
    arcs = trie.build_pair_arcs(units_np, root)
    assert arcs is not None

    rng = np.random.default_rng(6)
    byte_pool = list(b"abqz") + [0xE2, 0x96, 0x81, 0x00, 0xFF]
    batch = rng.choice(byte_pool, (8, 16)).astype(np.uint8)
    lengths = rng.integers(0, 17, 8).astype(np.int32)
    pos = np.arange(16)[None, :]
    in_range = pos < lengths[:, None]

    # generic two steps (numpy)
    def np_step(state, alive, d):
        bp = np.concatenate([batch, np.zeros((8, 4), np.uint8)], axis=1)
        c = bp[:, d:16 + d].astype(np.uint32)
        live = alive & ((pos + d) < lengths[:, None])
        node = np.where(live, state ^ c, 0)
        unit = units_np[np.minimum(node, len(units_np) - 1)]
        ok = live & ((unit & np.uint32((1 << 31) | 0xFF)) == c)
        offs = (unit >> np.uint32(10)) << ((unit & np.uint32(1 << 9))
                                           >> np.uint32(6))
        nstate = np.where(ok, node ^ offs, state)
        hl = ok & ((unit & np.uint32(1 << 8)) != 0)
        leaf = units_np[np.minimum(nstate, len(units_np) - 1)] \
            & np.uint32(0x7FFFFFFF)
        val = np.where(hl, leaf.astype(np.int32), -1)
        return nstate, ok, val

    st0 = np.full((8, 16), root, np.uint32)
    w_st1, w_al1, w_v1 = np_step(st0, in_range, 0)
    w_st2, w_al2, w_v2 = np_step(w_st1, w_al1, 1)

    d_st1, d_al1, d_v1, _sc1 = trie.step_root(paired, jnp.asarray(batch),
                                              jnp.asarray(in_range),
                                              root_state=root)
    assert np.array_equal(np.asarray(d_v1), w_v1)
    assert np.array_equal(np.asarray(d_al1), w_al1)
    assert np.array_equal(np.asarray(d_st1)[w_al1], w_st1[w_al1])

    bp = np.concatenate([batch, np.zeros((8, 1), np.uint8)], axis=1)
    key = batch.astype(np.int32) * 256 + bp[:, 1:17].astype(np.int32)
    live1 = np.asarray(d_al1) & ((pos + 1) < lengths[:, None])
    d_st2, d_al2, d_v2, _sc2 = trie.step_pair(
        jnp.asarray(arcs[0]), jnp.asarray(arcs[1]), jnp.asarray(arcs[2]),
        jnp.asarray(key), jnp.asarray(live1), d_st1)
    assert np.array_equal(np.asarray(d_v2), w_v2)
    assert np.array_equal(np.asarray(d_al2), w_al2)
    assert np.array_equal(np.asarray(d_st2)[w_al2], w_st2[w_al2])
