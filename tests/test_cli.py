"""CLI tools end-to-end (reference src/spm_*_main.cc parity is verified
out-of-band against the built reference binaries; these tests pin the
surfaces in-repo)."""

import io
import sys

import pytest


MODEL = "/root/reference/python/test/test_model.model"


class _FakeStdin:
    def __init__(self, text: str):
        self.buffer = io.BytesIO(text.encode("utf-8"))

    def read(self):
        return self.buffer.read().decode("utf-8")


def _run(main, argv, stdin_text=""):
    old_in, old_out = sys.stdin, sys.stdout
    sys.stdin = _FakeStdin(stdin_text)  # type: ignore[assignment]
    out = io.StringIO()
    sys.stdout = out
    try:
        main(argv)
    finally:
        sys.stdin, sys.stdout = old_in, old_out
    return out.getvalue()


def test_spm_encode_piece_and_id():
    from sentencepiece_tpu.cli import spm_encode

    from sentencepiece_tpu import SentencePieceProcessor

    sp = SentencePieceProcessor(MODEL)
    got = _run(spm_encode.main, [f"--model={MODEL}"], "Hello world.\n")
    assert got == " ".join(sp.encode_as_pieces("Hello world.")) + "\n"
    got = _run(spm_encode.main,
               [f"--model={MODEL}", "--output_format=id"], "Hello world.\n")
    assert got.strip() == "151 88 21 887 6"


def test_spm_encode_decode_roundtrip():
    from sentencepiece_tpu.cli import spm_decode, spm_encode

    ids = _run(spm_encode.main, [f"--model={MODEL}", "--output_format=id"],
               "I have a pen.\n")
    back = _run(spm_decode.main, [f"--model={MODEL}", "--input_format=id"],
                ids)
    assert back == "I have a pen.\n"


def test_spm_normalize_rule():
    from sentencepiece_tpu.cli import spm_normalize

    got = _run(spm_normalize.main,
               ["--normalization_rule_name=nmt_nfkc"], "ＡＢＣ  ｘ\n")
    assert got == "ABC x\n"


def test_spm_export_vocab():
    from sentencepiece_tpu.cli import spm_export_vocab

    got = _run(spm_export_vocab.main, [f"--model={MODEL}"])
    lines = got.split("\n")  # NOT splitlines: piece id 3 is a literal \r
    assert lines[0] == "<unk>\t0"
    assert len(lines) == 1001 and lines[-1] == ""


def _botchan_head(n):
    raw = open("/root/reference/data/botchan.txt", "rb").read()
    lines = raw.split(b"\n")[:n]
    return (b"\n".join(lines) + b"\n").decode("utf-8", "surrogateescape")


@pytest.mark.parametrize("fmt,fixture,n", [
    ("nbest_id", "unigram_en_nbest5.txt", 100),
    ("nbest_piece", "unigram_en_nbest5.pieces.txt", 50),
])
def test_spm_encode_nbest_formats(fixtures_dir, fmt, fixture, n):
    """nbest_id / nbest_piece output is byte-identical to the reference
    spm_encode (goldens from scripts/gen_train_fixtures.py), INCLUDING
    equal-score tie ordering."""
    from sentencepiece_tpu.cli import spm_encode

    got = _run(spm_encode.main,
               [f"--model={MODEL}", f"--output_format={fmt}",
                "--nbest_size=5"], _botchan_head(n))
    want = open(fixtures_dir / fixture, encoding="utf-8",
                newline="").read()
    assert got == want


@pytest.mark.parametrize("fmt", ["sample_id", "sample_piece"])
def test_spm_encode_sample_formats(fmt):
    """sample_* formats draw under the documented numpy PRNG contract
    (the reference's thread_local mt19937 stream is unreproducible by
    design, util.cc:379-382): verify one valid lossless segmentation per
    line."""
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.cli import spm_encode

    sp = SentencePieceProcessor(MODEL)
    text = "I have a pen.\nHello world.\n"
    got = _run(spm_encode.main,
               [f"--model={MODEL}", f"--output_format={fmt}",
                "--nbest_size=-1", "--alpha=0.5"], text)
    out_lines = got.split("\n")[:-1]
    assert len(out_lines) == 2
    for line, inp in zip(out_lines, ["I have a pen.", "Hello world."]):
        toks = line.split(" ")
        assert toks
        if fmt == "sample_id":
            assert sp.decode_ids([int(t) for t in toks]) == inp
        else:
            assert sp.decode_pieces(toks) == inp


@pytest.mark.parametrize("fmt", ["proto", "sample_proto", "nbest_proto"])
def test_spm_encode_proto_formats_run_silently(fmt):
    """The reference CLI exercises the proto paths but writes nothing
    (spm_encode_main.cc:127-131 — WriteLine commented out); ours mirrors
    that."""
    from sentencepiece_tpu.cli import spm_encode

    got = _run(spm_encode.main,
               [f"--model={MODEL}", f"--output_format={fmt}",
                "--nbest_size=2"], "Hello world.\n")
    assert got == ""


def test_unknown_flag_errors():
    from sentencepiece_tpu.cli import spm_encode

    with pytest.raises(SystemExit):
        _run(spm_encode.main, [f"--model={MODEL}", "--nope=1"], "")
