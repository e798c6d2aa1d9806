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


def test_cp_direct_charsmap_exact():
    """The cp-direct charsmap fast path (NormalizerTables.cp_rule —
    dense cp table + extends/second-char demotion, docs/design.md rule
    22) against the host normalizer, on CJK text, combining-mark /
    Hangul-jamo sequences (real EXTENDS continuations), and raw-byte
    fuzz. The composed TPU pipeline uses this path on device only
    (pipeline.py gates it off the CPU backend), so this direct
    normalize_batch drive is its CPU conformance coverage."""
    import numpy as np
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import pack_lines
    from sentencepiece_tpu.tpu import normalize as tn
    from sentencepiece_tpu.normalizer.normalize import Normalizer

    sp = SentencePieceProcessor()
    sp.load("/root/reference/python/test/test_ja_model.model")
    spec = sp.model_proto.normalizer_spec
    t = tn.NormalizerTables(spec)
    assert t.cp_rule is not None
    hn = Normalizer(spec)

    rng = np.random.RandomState(11)
    pool = [0x304B, 0x3099, 0x309A, 0x1100, 0x1161, 0x11A8, 0x30AB,
            0x20, 0x61, 0xFF76, 0xFF9E, 0x2460, 0x1F600]
    cases = [
        "吾輩は猫である。名前はまだ無い。".encode(),
        "がぎ  ぐ".encode(),   # combining voiced marks
        "각".encode(),           # jamo L+V+T
    ]
    for _ in range(120):
        n = rng.randint(1, 40)
        if rng.rand() < 0.7:
            s = "".join(chr(pool[rng.randint(len(pool))])
                        for _ in range(n))
            cases.append(s.encode("utf-8")[:90])
        else:
            cases.append(bytes(rng.randint(1, 256, n)
                               .astype(np.uint8))[:90])
    arr, lens = pack_lines(cases, 96)
    n_out = t.out_width(96)
    out, total = tn.normalize_batch(
        t.units, t.esc_pool, t.v_attr, t.ws_arr, t.fffd_arr,
        arr, lens.astype(np.int32),
        max_rule_len=t.max_rule_len, root_state=t.root_state,
        n_out=n_out, ws_len=t.ws_len, max_rep_len=t.max_rep_len,
        add_dummy_prefix=t.add_dummy_prefix,
        remove_extra_whitespaces=t.remove_extra_whitespaces,
        escape_whitespaces=t.escape_whitespaces, suffix=t.suffix,
        arcs=t.arcs, u_units=None, u_max_len=0, u_root_state=0,
        cp_rule=t.cp_rule)
    out, total = np.asarray(out), np.asarray(total)
    for i, b in enumerate(cases):
        exp = hn.normalize(b)
        if isinstance(exp, tuple):
            exp = exp[0]
        if isinstance(exp, str):
            exp = exp.encode()
        assert bytes(out[i, :total[i]]) == exp, (i, b)


def test_score_paired_trie_exact():
    """The score-paired [U, 3] trie (trie.build_paired with
    leaf_scores + pair-arc w2 — docs/design.md rule 19) against the
    2-column table + score-gather path, driven directly through
    unigram_encode_batch on a small batch. The composed pipeline uses
    the 3-column form on device only (encode.py gates it off the CPU
    backend), so this small-program drive is its CPU coverage."""
    import numpy as np
    import jax.numpy as jnp
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu import trie
    from sentencepiece_tpu.tpu.encode import unigram_encode_batch
    from sentencepiece_tpu.tpu.pipeline import pack_lines
    from sentencepiece_tpu import native

    sp = SentencePieceProcessor()
    sp.load("/root/reference/python/test/test_model.model")
    model = sp.model
    scores = np.array(model.scores, np.float32)
    keys = sorted(model.pieces)
    r = native.darts_build_banded(keys, [model.pieces[k] for k in keys])
    assert r is not None
    units_np, bands = r
    bands = tuple(bands)
    u0 = int(units_np[0])
    root_state = int((u0 >> 10) << (((u0 >> 9) & 1) << 3))
    D = max(max(len(k) for k in keys), 4)
    lines = [b"\xe2\x96\x81I\xe2\x96\x81have\xe2\x96\x81a\xe2\x96\x81pen.",
             b"\xe2\x96\x81hello\xe2\x96\x81world",
             "▁吾輩は猫である".encode()]
    arr, lens = pack_lines(lines, 64)
    outs = []
    for sc_pair in (None, scores):
        pa = trie.build_pair_arcs(units_np, root_state,
                                  leaf_scores=sc_pair)
        arcs = tuple(jnp.asarray(a) for a in pa) if pa is not None \
            else None
        paired = jnp.asarray(trie.build_paired(units_np, sc_pair))
        ids, n = unigram_encode_batch(
            paired, jnp.asarray(scores), jnp.asarray(arr),
            jnp.asarray(lens.astype(np.int32)),
            jnp.float32(model.min_score - 10.0),
            max_depth=D, unk_id=model.unk_id, root_state=root_state,
            arcs=arcs, bands=bands)
        outs.append((np.asarray(ids), np.asarray(n)))
    # the 2-column path is host-verified across the whole suite, so
    # 3-col == 2-col equality IS the conformance statement
    assert np.array_equal(outs[0][0], outs[1][0])
    assert np.array_equal(outs[0][1], outs[1][1])
