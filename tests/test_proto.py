"""Proto2 wire codec tests (vs reference src/sentencepiece_model.proto)."""

import pytest

from sentencepiece_tpu.proto.spec import (ModelProto, ModelType,
                                          NormalizerSpec, PieceType,
                                          SentencePiece, TrainerSpec)


def test_load_reference_model(test_model_path):
    m = ModelProto.load(test_model_path)
    assert len(m.pieces) == 1000
    assert m.pieces[0].piece == "<unk>"
    assert m.pieces[0].type == PieceType.UNKNOWN
    assert m.pieces[1].piece == "<s>"
    assert m.pieces[1].type == PieceType.CONTROL
    assert m.trainer_spec.model_type == ModelType.UNIGRAM
    assert m.trainer_spec.vocab_size == 1000
    assert m.normalizer_spec.name == "nfkc"
    assert len(m.normalizer_spec.precompiled_charsmap) > 0


def test_byte_exact_roundtrip(test_model_path, test_ja_model_path):
    for path in (test_model_path, test_ja_model_path):
        raw = open(path, "rb").read()
        assert ModelProto.parse(raw).serialize() == raw


def test_defaults():
    ts = TrainerSpec()
    assert ts.vocab_size == 8000
    assert ts.model_type == ModelType.UNIGRAM
    assert ts.character_coverage == pytest.approx(0.9995)
    assert ts.seed_sentencepiece_size == 1000000
    assert ts.shrinking_factor == pytest.approx(0.75)
    assert ts.max_sentence_length == 4192
    assert ts.num_sub_iterations == 2
    assert ts.max_sentencepiece_length == 16
    assert ts.unk_id == 0 and ts.bos_id == 1 and ts.eos_id == 2
    assert ts.pad_id == -1
    assert ts.unk_surface == " ⁇ "
    ns = NormalizerSpec()
    assert ns.add_dummy_prefix and ns.remove_extra_whitespaces
    assert ns.escape_whitespaces


def test_has_bits():
    ts = TrainerSpec()
    assert not ts.has("vocab_size")
    ts.vocab_size = 8000
    assert ts.has("vocab_size")
    raw = ts.serialize()
    ts2 = TrainerSpec.parse(raw)
    assert ts2.has("vocab_size") and not ts2.has("model_type")


def test_negative_int_roundtrip():
    ts = TrainerSpec(pad_id=-1)
    assert TrainerSpec.parse(ts.serialize()).pad_id == -1


def test_float_field():
    sp = SentencePiece(piece="x", score=-3.25)
    sp2 = SentencePiece.parse(sp.serialize())
    assert sp2.score == -3.25


def test_unknown_field_preserved():
    # craft bytes with an unknown field (tag 99, varint 7)
    from sentencepiece_tpu.proto.wire import encode_varint
    raw = TrainerSpec(vocab_size=100).serialize()
    raw += encode_varint((99 << 3) | 0) + encode_varint(7)
    ts = TrainerSpec.parse(raw)
    assert ts.serialize() == raw
