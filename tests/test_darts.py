"""Double-array trie tests (format of reference third_party/darts_clone)."""

import numpy as np
import pytest

from sentencepiece_tpu.proto.spec import ModelProto
from sentencepiece_tpu.utils import darts
from sentencepiece_tpu.normalizer import charsmap as cm


@pytest.fixture(scope="module")
def ref_trie(test_model_path):
    m = ModelProto.load(test_model_path)
    trie, pool = cm.decode_blob(m.normalizer_spec.precompiled_charsmap)
    return trie, pool


def test_read_reference_blob(ref_trie):
    trie, pool = ref_trie
    # NFKC: fullwidth A (U+FF21) -> 'A'
    r = trie.common_prefix_search("Ａ".encode("utf-8"))
    assert len(r) == 1
    v, length = r[0]
    assert length == 3
    end = pool.index(0, v)
    assert pool[v:end] == b"A"


def test_dense_matches_scalar(ref_trie):
    trie, _ = ref_trie
    test = "ﾊﾟｰﾃｨｰへ行こうＡＢＣ１２３ hello ㌀".encode("utf-8")
    data = np.frombuffer(test, dtype=np.uint8)
    maxd = trie.max_key_length()
    dense = trie.prefix_matches_dense(data, maxd)
    for i in range(len(test)):
        scalar = {length - 1: v for v, length in
                  trie.common_prefix_search(test, i)}
        for d in range(maxd):
            assert dense[i, d] == scalar.get(d, -1)


def test_build_and_search():
    keys = [b"a", b"ab", b"abc", b"b", b"\xe2\x96\x81", b"hello", b"help",
            b"xyz"]
    vals = [10, 20, 30, 40, 50, 60, 70, 80]
    trie = darts.build(keys, vals)
    for k, v in zip(keys, vals):
        assert trie.exact_match_search(k) == v
    assert trie.exact_match_search(b"zz") == -1
    assert trie.exact_match_search(b"hel") == -1
    assert trie.common_prefix_search(b"abcd") == [(10, 1), (20, 2), (30, 3)]


def test_build_rank_values():
    keys = [b"b", b"a", b"c"]
    trie = darts.build(keys)  # values = sorted rank
    assert trie.exact_match_search(b"a") == 0
    assert trie.exact_match_search(b"b") == 1
    assert trie.exact_match_search(b"c") == 2


def test_build_rejects_duplicates():
    with pytest.raises(ValueError):
        darts.build([b"a", b"a"], [1, 2])


def test_blob_roundtrip():
    trie = darts.build([b"x", b"xy"], [1, 2])
    trie2 = darts.DoubleArray.from_blob(trie.to_blob())
    assert trie2.exact_match_search(b"xy") == 2
