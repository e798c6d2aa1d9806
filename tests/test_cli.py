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


def test_unknown_flag_errors():
    from sentencepiece_tpu.cli import spm_encode

    with pytest.raises(SystemExit):
        _run(spm_encode.main, [f"--model={MODEL}", "--nope=1"], "")
