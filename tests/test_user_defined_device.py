"""Device paths for models with USER_DEFINED symbols (bpe_model.cc:84-131,
model_interface.cc:143, normalizer.cc:239-243).

Fixtures: {bpe,unigram}_user_300.model trained by OUR trainer with
--user_defined_symbols=<sep>,① (① is rewritten to "1" by nmt_nfkc unless
the user-symbol matcher passes it through — exercising the normalizer
coupling); golds are the reference spm_encode ids over
user_test_corpus.txt (scripts in the fixture-generation session; host
path verified 0/214 mismatches vs the binary at generation time).

The point under test: TpuTokenizer must take the DEVICE path (no host
fallback) and still match the reference ids bit-for-bit — frozen span
split for BPE, boosted-score lattice for unigram, and user-trie
pass-through in the device normalizer for both."""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _cases():
    # binary read, split on \n ONLY: short botchan lines carry their
    # original \r mid-string after symbol injection, and text-mode
    # universal newlines would split there (CRLF gotcha)
    raw = open(os.path.join(FIX, "user_test_corpus.txt"), "rb").read()
    lines = raw.split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()
    return [ln.decode("utf-8", "surrogateescape") for ln in lines]


@pytest.mark.parametrize("model", ["bpe_user_300", "unigram_user_300"])
def test_user_defined_device_bit_exact(model):
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(os.path.join(FIX, model + ".model"))
    tok = TpuTokenizer(sp)
    # the device path must actually engage
    assert not tok.norm.user_host_only
    assert tok.norm.u_units is not None
    if tok._bpe is not None:
        assert not tok._bpe.host_only
    lines = _cases()
    gold = [list(map(int, ln.split())) for ln in open(
        os.path.join(FIX, model.split("_")[0] + "_user.ids.txt")
    ).read().splitlines()]
    got = tok.encode(lines)
    bad = [i for i in range(len(lines)) if got[i] != gold[i]]
    assert not bad, (len(bad), bad[:5], lines[bad[0]] if bad else None)


@pytest.mark.parametrize("model", ["bpe_user_300", "unigram_user_300"])
def test_user_symbols_not_sorted(tmp_path, model):
    """Device path with user symbols NOT in byte-sorted vocab order.

    The shipped fixtures happen to list '<sep>' before '①' (byte-sorted
    already); swapping them exposed an index-order mismatch between the
    normalizer user trie (sorted-dedup rank) and the BPE pair tables
    (vocab order) — frozen spans mapped to the wrong piece id (advisor
    r4 high finding). Gold = the exact host path on the same swapped
    model, which is order-insensitive by construction."""
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.proto.spec import ModelProto, PieceType
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    mp = ModelProto.parse(
        open(os.path.join(FIX, model + ".model"), "rb").read())
    ud = [i for i, p in enumerate(mp.pieces)
          if p.type == PieceType.USER_DEFINED]
    assert len(ud) == 2
    a, b = ud
    pa, pb = mp.pieces[a], mp.pieces[b]
    assert pa.piece < pb.piece  # shipped fixture is coincidentally sorted
    mp.pieces[a], mp.pieces[b] = pb, pa
    path = tmp_path / (model + "_swapped.model")
    path.write_bytes(mp.serialize())

    sp = SentencePieceProcessor(str(path))
    tok = TpuTokenizer(sp)
    assert not tok.norm.user_host_only
    if tok._bpe is not None:
        assert not tok._bpe.host_only
    lines = _cases()
    gold = [sp.encode_as_ids(ln) for ln in lines]
    got = tok.encode(lines)
    bad = [i for i in range(len(lines)) if got[i] != gold[i]]
    assert not bad, (len(bad), bad[:5],
                     (got[bad[0]], gold[bad[0]]) if bad else None)


def test_user_defined_normalize_alignment():
    """normalize_with_offsets through the user trie matches the exact
    host normalizer (string AND norm_to_orig)."""
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(
        os.path.join(FIX, "unigram_user_300.model"))
    tok = TpuTokenizer(sp)
    texts = ["a<sep>b", "①x ① <sep>", "  lead <sep> trail  ", "①"]
    dev = tok.normalize_with_offsets(texts)
    for t, (s_dev, align_dev) in zip(texts, dev):
        s_host, align_host = sp.normalizer.normalize(t)
        if isinstance(s_host, bytes):
            s_host = s_host.decode("utf-8", "surrogateescape")
        assert s_dev == s_host, (t, s_dev, s_host)
        assert list(align_dev) == list(align_host), (t, align_dev,
                                                     align_host)


def test_exotic_user_symbols_fall_back():
    """User pieces the device normalizer cannot carry (a raw space)
    set user_host_only and encode() stays on the exact host path."""
    from sentencepiece_tpu.tpu.normalize import NormalizerTables
    from sentencepiece_tpu import SentencePieceProcessor

    sp = SentencePieceProcessor(
        os.path.join(FIX, "unigram_user_300.model"))
    t = NormalizerTables(sp.model_proto.normalizer_spec,
                         user_pieces=[b"a b"])
    assert t.user_host_only
    t2 = NormalizerTables(sp.model_proto.normalizer_spec,
                          user_pieces=[b"\xe2\x96\x81x"])
    assert t2.user_host_only
