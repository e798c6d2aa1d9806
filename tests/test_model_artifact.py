"""Serialized .model artifact byte-parity with the reference CLI.

The reference `spm_train` binary sets every flag-backed spec field
explicitly (spm_train_main.cc:161-201), and only meta pieces carry an
explicit `type` on the wire (trainer_interface.cc:497: set_type is never
called for NORMAL pieces). Our CLI reproduces both, so the whole .model
file — pieces, scores, specs, charsmap — is byte-identical to the
reference binary's output (modulo the embedded model_prefix string,
which names the output file itself).

`model_sha256.json` holds sha256 digests of reference-binary-trained
models for 8 configurations (4 model types x EN/JA, fixed prefixes); the
fast configurations are retrained here with our CLI and digest-compared.
"""

import hashlib
import json
import os
import subprocess
import sys

import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
GOLD = json.load(open(os.path.join(FIX, "train", "model_sha256.json")))

EN = "/root/reference/data/botchan.txt"
JA = "/root/reference/data/wagahaiwa_nekodearu.txt"

CASES = [
    ("m_unigram_bot", EN, "unigram", 300),
    ("m_bpe_bot", EN, "bpe", 300),
    ("m_word_bot", EN, "word", 300),
    ("m_char_bot", EN, "char", 300),
    ("m_word_wag", JA, "word", 900),
    ("m_char_wag", JA, "char", 400),
]
# (m_unigram_wag / m_bpe_wag at vocab 2000 are in the goldens too; they
# take minutes to train so the byte-parity claim for them was verified
# at fixture-generation time, not per-CI-run.)


@pytest.mark.skipif(not os.path.exists(EN), reason="reference corpus")
@pytest.mark.parametrize("prefix,corpus,mt,vs",
                         CASES, ids=[c[0] for c in CASES])
def test_cli_model_bytes_match_reference(tmp_path, prefix, corpus, mt, vs):
    if f"{prefix}.model" not in GOLD:
        pytest.skip("no golden digest")
    subprocess.run(
        [sys.executable, "-m", "sentencepiece_tpu.cli.spm_train",
         f"--input={corpus}", f"--model_prefix={prefix}",
         f"--model_type={mt}", f"--vocab_size={vs}",
         "--character_coverage=0.98"],
        cwd=tmp_path, check=True, capture_output=True,
        env={**os.environ, "PYTHONPATH":
             os.path.dirname(os.path.dirname(os.path.abspath(__file__)))})
    got = hashlib.sha256(
        open(tmp_path / f"{prefix}.model", "rb").read()).hexdigest()
    assert got == GOLD[f"{prefix}.model"]


@pytest.mark.parametrize("mt,model,ids_file,corpus", [
    ("word", "word_en_300.model", "word_en.ids.txt", EN),
    ("char", "char_en_300.model", "char_en.ids.txt", EN),
    ("word", "word_ja_900.model", "word_ja.ids.txt", JA),
    ("char", "char_ja_400.model", "char_ja.ids.txt", JA),
])
def test_word_char_encode_bit_exact(mt, model, ids_file, corpus):
    """BASELINE.md scope: bit-exact ids vs reference spm_encode for the
    word and char models too (unigram/bpe gates live in bench.py and
    test_conformance)."""
    if not os.path.exists(corpus):
        pytest.skip("reference corpus")
    from sentencepiece_tpu import SentencePieceProcessor
    sp = SentencePieceProcessor(os.path.join(FIX, model))
    lines = open(corpus, "rb").read().split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()
    gold = [ln for ln in
            open(os.path.join(FIX, ids_file)).read().split("\n") if ln]
    assert len(lines) == len(gold)
    for ln, g in zip(lines, gold):
        ids = sp.encode_as_ids(ln.decode("utf-8", "surrogateescape"))
        assert " ".join(map(str, ids)) == g
