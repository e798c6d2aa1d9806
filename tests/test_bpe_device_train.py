"""Device-engine BPE training over the (virtual 8-device) mesh.

Pair counts are histogrammed per shard and psum-reduced (tpu/bpe_train.py);
merge decisions are replicated. Equal-(freq,len) ties resolve by pair key
instead of merged-string bytes, so vocabularies are compared as sets with
high overlap (the exact host engine remains byte-identical to the
reference)."""

import pathlib

FIX = pathlib.Path(__file__).parent / "fixtures" / "train"


def test_bpe_device_engine(tmp_path):
    import jax
    from sentencepiece_tpu.train import facade
    from sentencepiece_tpu import SentencePieceProcessor

    assert len(jax.devices()) == 8

    corpus = FIX / "sub.txt"
    facade.train(
        f"--input={corpus} --model_prefix={tmp_path}/dev --model_type=bpe "
        "--vocab_size=300 --hard_vocab_limit=false --minloglevel=2",
        engine="device")
    facade.train(
        f"--input={corpus} --model_prefix={tmp_path}/ex --model_type=bpe "
        "--vocab_size=300 --hard_vocab_limit=false --minloglevel=2",
        engine="exact")
    dv = {l.split("\t")[0] for l in open(tmp_path / "dev.vocab",
                                         encoding="utf-8")}
    ex = {l.split("\t")[0] for l in open(tmp_path / "ex.vocab",
                                         encoding="utf-8")}
    assert len(dv & ex) / len(ex) > 0.95

    sp = SentencePieceProcessor(str(tmp_path / "dev.model"))
    ids = sp.encode_as_ids("I have a pen.")
    assert ids and sp.decode_ids(ids) == "I have a pen."
