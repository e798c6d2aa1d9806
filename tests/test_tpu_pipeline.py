"""Device (CPU-backend) tests for the TPU normalize+encode pipeline.

The jitted programs are exact mirrors of the host paths; these tests pin
that equivalence on edge cases and corpus slices. The driver's bench runs
the same programs on real TPU hardware with a bit-exactness gate.
"""

import numpy as np
import pytest


EDGE = ["Hello World", "  lead", "trail  ", "  both  ", "", " ", "   ",
        "a  b", "double  space", "\tTab\tx", "▁literal", "x▁", "▁",
        "ＡＢＣ １２３", "ｶﾀｶﾅ", "Å Å", "à combine",
        b"bad\xffbyte".decode("utf8", "surrogateescape"),
        b"\x80start".decode("utf8", "surrogateescape"),
        "㍿ company", "mixed ▁ and  spaces ", "№5 ¼ ½", " ▁ ", "don’t"]


def _norm_case(spec, suffix, lines):
    from sentencepiece_tpu.normalizer.normalize import Normalizer
    from sentencepiece_tpu.tpu.normalize import BatchNormalizer

    host = Normalizer(spec, treat_whitespace_as_suffix=suffix)
    dev = BatchNormalizer(spec, treat_whitespace_as_suffix=suffix)
    raw = [l.encode("utf-8", "surrogateescape") for l in lines]
    N = max(32, max((len(b) for b in raw), default=1))
    arr = np.zeros((len(raw), N), np.uint8)
    lens = np.zeros(len(raw), np.int32)
    for i, b in enumerate(raw):
        arr[i, :len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    out, total = dev.normalize(arr, lens)
    out, total = np.asarray(out), np.asarray(total)
    for i, b in enumerate(raw):
        want = host.normalize(b)[0]
        got = out[i, :total[i]].tobytes()
        assert want == got, (lines[i], want, got)


@pytest.mark.parametrize("mutate", ["none", "suffix", "no_remove",
                                    "no_escape", "no_dummy", "identity"])
def test_device_normalizer_matches_host(mutate):
    from sentencepiece_tpu.proto.spec import NormalizerSpec
    from sentencepiece_tpu.train.facade import get_normalizer_spec

    suffix = mutate == "suffix"
    if mutate == "identity":
        spec = NormalizerSpec()
        spec.name = "identity"
    else:
        spec = get_normalizer_spec("nmt_nfkc")
        if mutate == "no_remove":
            spec.remove_extra_whitespaces = False
        elif mutate == "no_escape":
            spec.escape_whitespaces = False
        elif mutate == "no_dummy":
            spec.add_dummy_prefix = False
    _norm_case(spec, suffix, EDGE)


def test_pipeline_matches_processor(botchan_path):
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    tok = TpuTokenizer(sp)
    raw = open(botchan_path, "rb").read().split(b"\n")[:200]
    texts = [l.decode("utf-8", "surrogateescape") for l in raw if l]
    dev = tok.encode(texts)
    for t, d in zip(texts, dev):
        assert d == sp.encode_as_ids(t), t


def test_pipeline_extra_options():
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    tok = TpuTokenizer(sp, add_bos=True, add_eos=True, reverse=True)
    sp.set_encode_extra_options("reverse:bos:eos")
    texts = ["Hello world.", "I have a pen."]
    dev = tok.encode(texts)
    for t, d in zip(texts, dev):
        assert d == sp.encode_as_ids(t), t


def test_bpe_full_device_pipeline(fixtures_dir):
    """BPE TpuTokenizer runs normalize + utf8->cp + merge fully on device
    (utf8_to_cp_batch); ids match the host processor exactly."""
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(str(fixtures_dir / "bpe_en_300.model"))
    tok = TpuTokenizer(sp)
    lines = ["A cold day.", "", "  spaces  everywhere  ",
             "mixed ascii ＆ ｆｕｌｌｗｉｄｔｈ", "tails"]
    assert tok.encode(lines) == [sp.encode_as_ids(l) for l in lines]
