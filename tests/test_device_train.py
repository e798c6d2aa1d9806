"""Device-engine unigram training over the (virtual 8-device) mesh.

The device engine shards word lattices data-parallel and reduces expected
counts in a FIXED order (tpu/em.py fixed_order_psum; SURVEY.md §2.9), so
at a fixed global device count the trained artifact is byte-identical
across process layouts (tests/test_distributed.py). Against the exact
host engine the device transcendentals (XLA exp/log vs glibc) drift by
ULPs, which can flip near-threshold prune decisions — the analog of the
reference's own num_threads-dependent partial-merge order — so the
device-vs-exact oracle here is near-identity: ≥99% piece overlap and
tight score agreement on the shared pieces."""

import pathlib

import numpy as np

FIX = pathlib.Path(__file__).parent / "fixtures" / "train"


def _vocab(path):
    out = {}
    for line in open(path, encoding="utf-8"):
        piece, score = line.rstrip("\n").split("\t")
        out[piece] = float(score)
    return out


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
    dv = _vocab(tmp_path / "dev.vocab")
    ex = _vocab(tmp_path / "exact.vocab")
    common = set(dv) & set(ex)
    assert len(common) / len(ex) >= 0.99
    ds = np.array([dv[p] for p in common])
    es = np.array([ex[p] for p in common])
    np.testing.assert_allclose(ds, es, rtol=0, atol=2e-3)

    sp = SentencePieceProcessor(str(tmp_path / "dev.model"))
    ids = sp.encode_as_ids("I have a pen.")
    assert ids and sp.decode_ids(ids) == "I have a pen."
