"""Device (CPU-backend) BPE merge-loop encoder vs reference golden ids.

Fixture bpe_en.ids.txt: reference spm_encode over botchan.txt using
tests/fixtures/bpe_en_300.model (trained by our trainer; byte-identical to
the reference spm_train output on the same corpus/flags)."""

import numpy as np


def _gold(fixtures_dir):
    return [list(map(int, l.split())) if l else []
            for l in open(fixtures_dir / "bpe_en.ids.txt").read()
            .splitlines()]


def test_bpe_device_bit_exact(botchan_path, fixtures_dir):
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.bpe_encode import BpeBatchEncoder

    sp = SentencePieceProcessor(str(fixtures_dir / "bpe_en_300.model"))
    enc = BpeBatchEncoder(sp)
    assert not enc.host_only
    raw = open(botchan_path, "rb").read().split(b"\n")
    if raw and raw[-1] == b"":
        raw.pop()
    lines = [l.decode("utf-8", "surrogateescape") for l in raw[:400]]
    gold = _gold(fixtures_dir)[:400]
    dev = enc.encode(lines)
    assert sum(1 for a, b in zip(dev, gold) if a != b) == 0


def test_bpe_pipeline_dispatch(fixtures_dir):
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(str(fixtures_dir / "bpe_en_300.model"))
    tok = TpuTokenizer(sp)
    texts = ["I have a pen.", "Absolutely marvelous.", "", "  ", "▁x"]
    dev = tok.encode(texts)
    for t, d in zip(texts, dev):
        assert d == sp.encode_as_ids(t), t
