"""Component unit tests (the reference's per-component *_test.cc spirit:
flags 12, builder 8, util 28, ... — SURVEY.md §4). Conformance suites
cover end-to-end behavior; these pin the building blocks directly."""

import numpy as np
import pytest


def test_flags_parsing():
    from sentencepiece_tpu.cli import Flags

    spec = {"name": ("s", "", "a string"),
            "size": ("i", 8000, "an int"),
            "alpha": ("f", 0.1, "a float"),
            "flag": ("b", False, "a bool")}
    f = Flags(spec, "prog")
    f.parse(["--name=x", "--size", "42", "--alpha=0.5",
             "--flag", "rest1", "rest2"])
    assert f.name == "x" and f.size == 42 and f.alpha == 0.5
    assert f.flag is True
    assert f.rest == ["rest1", "rest2"]
    f2 = Flags(spec, "prog")
    f2.parse(["--flag=false"])
    assert f2.flag is False


def test_flags_unknown_rejected():
    from sentencepiece_tpu.cli import Flags

    f = Flags({"a": ("i", 0, "")}, "prog")
    with pytest.raises(SystemExit):
        f.parse(["--nope=1"])


def test_charsmap_compile_decompile_roundtrip():
    from sentencepiece_tpu.normalizer.charsmap import (compile_charsmap,
                                                       decompile_charsmap)

    cm = {(0x41,): (0x61,), (0x42, 0x43): (0x78,),
          (0xFF21,): (0x61,), (0x3000,): (0x20,)}
    blob = compile_charsmap(cm)
    assert decompile_charsmap(blob) == cm


def test_prefix_matcher_longest_match():
    from sentencepiece_tpu.normalizer.normalize import PrefixMatcher

    m = PrefixMatcher(["ab", "abc", "x"])
    assert m.prefix_match(b"abcd", 0) == (3, True)   # longest wins
    assert m.prefix_match(b"abd", 0) == (2, True)
    assert m.prefix_match(b"zzz", 0) == (1, False)   # one char
    assert m.global_replace(b"abcx_ab", b"#") == b"##_#"


def test_split_into_words_modes():
    from sentencepiece_tpu.models.base import split_into_words

    WS = "▁".encode()
    t = WS + b"ab" + WS + WS + b"c"
    assert split_into_words(t, False) == [WS + b"ab", WS, WS + b"c"]
    assert split_into_words(t, True) == [WS, b"ab" + WS, WS, b"c"]
    assert split_into_words(b"", False) == []


def test_log_sum_exp_f32_pinned():
    from sentencepiece_tpu.train.unigram import log_sum_exp_f32

    assert log_sum_exp_f32(0.0, -1.5, True) == np.float32(-1.5)
    v = log_sum_exp_f32(-1.0, -2.0, False)
    assert abs(v - np.float32(-0.68673830)) < 1e-6
    # far-apart fast path returns vmax
    assert log_sum_exp_f32(-100.0, -1.0, False) == np.float32(-1.0)


def test_std_heap_matches_sorted_semantics():
    from sentencepiece_tpu.utils.stdheap import StdPriorityQueue

    q = StdPriorityQueue(lambda a, b: a < b)  # max-heap on value
    import random

    rnd = random.Random(0)
    vals = [rnd.randrange(100) for _ in range(200)]
    for v in vals:
        q.push(v)
    out = []
    while len(q):
        out.append(q.top())
        q.pop()
    assert out == sorted(vals, reverse=True)


def test_std_unordered_map_basics():
    from sentencepiece_tpu.utils.stdhashtable import StdUnorderedMap

    m = StdUnorderedMap()
    for k in range(50):
        m.insert(k * 7, k)
    assert len(m) == 50
    assert m.get(7 * 3) == 3
    assert m.get(999) is None
    m.erase(7 * 3)
    assert m.get(7 * 3) is None
    assert len(m) == 49
    assert set(m.values()) == set(range(50)) - {3}


def test_mt19937_float_utils():
    from sentencepiece_tpu.train.interface import Mt19937

    a, b = Mt19937(1), Mt19937(1)
    assert [a() for _ in range(10)] == [b() for _ in range(10)]
    assert Mt19937(1)() != Mt19937(2)()


def test_utf8_decode_malformed():
    from sentencepiece_tpu.utils.unicode import decode_utf8, one_char_len

    assert decode_utf8(b"A")[0] == 0x41
    assert decode_utf8("é".encode())[0] == 0xE9
    assert decode_utf8("𠜎".encode())[1] == 4
    assert one_char_len(0x80) == 1  # continuation byte alone
