"""Device-engine unigram training over the (virtual 8-device) mesh.

The device engine shards word lattices data-parallel and reduces expected
counts with psum (tpu/em.py; SURVEY.md §2.9). Float reduction order differs
from the exact host engine, so the trained piece sets are compared with a
high-overlap tolerance instead of byte equality."""

import pathlib

FIX = pathlib.Path(__file__).parent / "fixtures" / "train"


def test_unigram_device_engine(tmp_path):
    import jax
    from sentencepiece_tpu.train import facade
    from sentencepiece_tpu import SentencePieceProcessor

    assert len(jax.devices()) == 8  # conftest forces the virtual cpu mesh

    corpus = FIX / "sub.txt"
    facade.train(
        f"--input={corpus} --model_prefix={tmp_path}/dev "
        "--model_type=unigram --vocab_size=300 --hard_vocab_limit=false "
        "--minloglevel=2", engine="device")
    facade.train(
        f"--input={corpus} --model_prefix={tmp_path}/exact "
        "--model_type=unigram --vocab_size=300 --hard_vocab_limit=false "
        "--minloglevel=2", engine="exact")
    dv = {l.split("\t")[0] for l in open(tmp_path / "dev.vocab",
                                         encoding="utf-8")}
    ex = {l.split("\t")[0] for l in open(tmp_path / "exact.vocab",
                                         encoding="utf-8")}
    assert len(dv & ex) / len(ex) > 0.95

    sp = SentencePieceProcessor(str(tmp_path / "dev.model"))
    ids = sp.encode_as_ids("I have a pen.")
    assert ids and sp.decode_ids(ids) == "I have a pen."
