"""Processor facade tests against the reference pretrained models
(mirrors reference python/test/sentencepiece_test.py behavior)."""

import pytest

from sentencepiece_tpu import SentencePieceProcessor


@pytest.fixture(scope="module")
def sp(test_model_path):
    return SentencePieceProcessor(test_model_path)


@pytest.fixture(scope="module")
def jasp(test_ja_model_path):
    return SentencePieceProcessor(test_ja_model_path)


def test_ids(sp):
    assert len(sp) == 1000
    assert sp.piece_to_id("<unk>") == 0
    assert sp.piece_to_id("<s>") == 1
    assert sp.piece_to_id("</s>") == 2
    assert sp.id_to_piece(0) == "<unk>"
    assert sp.id_to_piece(1) == "<s>"
    assert sp.id_to_piece(2) == "</s>"
    assert sp.unk_id() == 0
    assert sp.bos_id() == 1
    assert sp.eos_id() == 2
    assert sp.pad_id() == -1
    for i in range(len(sp)):
        assert sp.piece_to_id(sp.id_to_piece(i)) == i


def test_roundtrip(sp):
    text = "I saw a girl with a telescope."
    pieces = sp.encode_as_pieces(text)
    ids = sp.encode_as_ids(text)
    assert len(pieces) == len(ids)
    assert sp.nbest_encode_as_pieces(text, 10)[0] == pieces
    assert sp.decode_pieces(pieces) == text
    assert sp.decode_ids(ids) == text
    for _ in range(20):
        assert sp.decode_pieces(
            sp.sample_encode_as_pieces(text, 64, 0.5)) == text
        assert sp.decode_pieces(
            sp.sample_encode_as_pieces(text, -1, 0.5)) == text


def test_ja_roundtrip(jasp):
    assert len(jasp) == 8000
    text = "吾輩は猫である。"
    pieces = jasp.encode_as_pieces(text)
    assert jasp.decode_pieces(pieces) == text
    for i in range(len(jasp)):
        assert jasp.piece_to_id(jasp.id_to_piece(i)) == i


def test_unknown(sp):
    # unknown chars produce one merged unk piece (verified vs spm_encode)
    assert sp.encode_as_ids("☠☣☢") == [4, 0]
    assert sp.encode_as_pieces("☠☣☢") == ["▁", "☠☣☢"]


def test_extra_options(sp):
    text = "hello world"
    base = sp.encode_as_ids(text)
    sp.set_encode_extra_options("bos:eos")
    with_be = sp.encode_as_ids(text)
    assert with_be == [sp.bos_id()] + base + [sp.eos_id()]
    sp.set_encode_extra_options("reverse")
    assert sp.encode_as_ids(text) == list(reversed(base))
    sp.set_encode_extra_options("reverse:bos:eos")
    assert sp.encode_as_ids(text) == ([sp.bos_id()] + list(reversed(base))
                                      + [sp.eos_id()])
    sp.set_encode_extra_options("")
    assert sp.encode_as_ids(text) == base


def test_invalid_extra_options(sp):
    with pytest.raises(ValueError):
        sp.set_encode_extra_options("nonsense")


def test_surface_offsets(sp):
    text = "Hello  World."  # double space collapses
    spt = sp.encode(text)
    assert spt.text == text
    # surfaces concatenate to the original text
    assert "".join(p.surface for p in spt.pieces) == text
    for p in spt.pieces:
        assert text.encode("utf-8")[p.begin:p.end].decode("utf-8") == p.surface


def test_serialized_proto(sp):
    raw = sp.encode_as_serialized_proto("hello")
    from sentencepiece_tpu.proto.spec import SentencePieceText
    spt = SentencePieceText.parse(raw)
    assert spt.text == "hello"
    assert [p.piece for p in spt.pieces] == sp.encode_as_pieces("hello")


def test_sample_seed_reproducible(sp):
    from sentencepiece_tpu.utils import rng
    rng.set_seed(42)
    a = [sp.sample_encode_as_ids("hello world", -1, 0.5) for _ in range(5)]
    rng.set_seed(42)
    b = [sp.sample_encode_as_ids("hello world", -1, 0.5) for _ in range(5)]
    assert a == b
    rng.set_seed(None)


def test_mock_model_di_hook(test_model_path):
    """DI hooks (sentencepiece_processor.h:434-443 SetModel): a canned
    EncodeResult model isolates PopulateSentencePieceText's surface/offset
    and adjacent-UNK merge logic (the reference's MockModel pattern,
    sentencepiece_processor_test.cc:39-86)."""
    sp = SentencePieceProcessor(test_model_path)
    real = sp.model

    class MockModel:
        def encode(self, normalized):
            # split normalized bytes into two canned halves
            h = max(1, len(normalized) // 2)
            return [(normalized[:h], 101), (normalized[h:], 102)]

        def __getattr__(self, name):
            return getattr(real, name)

    sp.set_model(MockModel())
    spt = sp.encode("hello")
    assert [p.id for p in spt.pieces] == [101, 102]
    assert "".join(p.surface for p in spt.pieces) == "hello"
    # begin/end byte offsets tile the original string
    assert spt.pieces[0].begin == 0
    assert spt.pieces[-1].end == len("hello")


def test_reference_binding_suite_mirror(sp, jasp):
    """The reference python/test/sentencepiece_test.py assertions, run
    verbatim against our binding (CamelCase surface + roundtrips +
    serialized protos)."""
    import numpy as np

    # test_load
    assert sp.GetPieceSize() == 1000
    for i in range(sp.GetPieceSize()):
        assert sp.PieceToId(sp.IdToPiece(i)) == i
    # test_roundtrip
    text = "I saw a girl with a telescope."
    ids = sp.EncodeAsIds(text)
    pieces1 = sp.EncodeAsPieces(text)
    pieces2 = sp.NBestEncodeAsPieces(text, 10)[0]
    assert pieces1 == pieces2
    assert sp.DecodePieces(pieces1) == text
    assert sp.DecodeIds(ids) == text
    rng = np.random.default_rng(0)
    for _ in range(20):
        assert sp.DecodePieces(
            sp.SampleEncodeAsPieces(text, 64, 0.5, rng=rng)) == text
        assert sp.DecodePieces(
            sp.SampleEncodeAsPieces(text, -1, 0.5, rng=rng)) == text
        assert sp.DecodeIds(
            sp.SampleEncodeAsIds(text, 64, 0.5, rng=rng)) == text
        assert sp.DecodeIds(
            sp.SampleEncodeAsIds(text, -1, 0.5, rng=rng)) == text
    # test_ja_roundtrip
    jtext = "吾輩は猫である。"
    jids = jasp.EncodeAsIds(jtext)
    jp = jasp.EncodeAsPieces(jtext)
    assert jasp.DecodePieces(jp) == jtext
    assert jasp.DecodeIds(jids) == jtext
    # test_unicode_roundtrip
    utext = "I saw a girl"
    assert sp.DecodePieces(sp.EncodeAsPieces(utext)) == utext
    # test_serialized_proto (both casings)
    assert sp.EncodeAsSerializedProto(text) != b""
    assert sp.SampleEncodeAsSerializedProto(text, 10, 0.2) != b""
    assert sp.NBestEncodeAsSerializedProto(text, 10) != b""
    assert sp.DecodePiecesAsSerializedProto(["foo", "bar"]) != b""
    assert sp.DecodeIdsAsSerializedProto([20, 30]) != b""
    assert sp.encode_as_serialized_proto(text) != b""
    assert sp.sample_encode_as_serialized_proto(text, 10, 0.2) != b""
    assert sp.nbest_encode_as_serialized_proto(text, 10) != b""
    assert sp.decode_pieces_as_serialized_proto(["foo", "bar"]) != b""
    assert sp.decode_ids_as_serialized_proto([20, 30]) != b""
    # __len__ / __getitem__ sugar
    assert len(sp) == 1000
    assert sp["<unk>"] == 0
