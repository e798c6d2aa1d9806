"""Device-engine BPE training over the (virtual 8-device) mesh.

Pair counts are histogrammed per shard and psum-reduced (tpu/bpe_train.py);
merge decisions are replicated. Counts are integer-valued (order-exact
under psum) and the tie-break replicates the reference comparator — freq
desc, merged length asc, merged-string lex (bpe_model_trainer.cc:240-254)
— so the device engine's vocab is BYTE-IDENTICAL to the exact host
engine's (which is byte-identical to the reference), on any mesh size.
"""

import os
import pathlib

import pytest

FIX = pathlib.Path(__file__).parent / "fixtures" / "train"


@pytest.mark.parametrize("corpus,vocab", [("sub.txt", 300),
                                          ("subja.txt", 900)])
def test_bpe_device_engine_byte_exact(tmp_path, corpus, vocab):
    import jax
    from sentencepiece_tpu.train import facade
    from sentencepiece_tpu import SentencePieceProcessor

    assert len(jax.devices()) == 8

    flags = (f"--input={FIX / corpus} --model_type=bpe "
             f"--vocab_size={vocab} --hard_vocab_limit=false "
             "--minloglevel=2")
    facade.train(f"{flags} --model_prefix={tmp_path}/dev", engine="device")
    facade.train(f"{flags} --model_prefix={tmp_path}/ex", engine="exact")
    dev = (tmp_path / "dev.vocab").read_bytes()
    ex = (tmp_path / "ex.vocab").read_bytes()
    assert dev == ex  # byte equality, not overlap

    sp = SentencePieceProcessor(str(tmp_path / "dev.model"))
    text = "I have a pen." if corpus == "sub.txt" else "吾輩は猫である"
    ids = sp.encode_as_ids(text)
    assert ids and sp.decode_ids(ids) == text


@pytest.mark.parametrize("corpus,vocab", [("sub.txt", 300),
                                          ("subja.txt", 900)])
def test_bpe_sparse_engine_byte_exact(tmp_path, corpus, vocab, monkeypatch):
    """The sparse active-table engine (tpu/bpe_train_sparse.py — the
    scale path past the dense kernel's ~4k universe bound) reproduces
    the exact host engine byte-for-byte on the virtual mesh. Its
    tracked-position frequency semantics equal the reference's
    ComputeFreq position sets (overlap-forgetting included), validated
    at 8k on botchan against a full-active-set host oracle
    (scripts/oracle_bpe_active_set.py, docs/conformance.md)."""
    from sentencepiece_tpu.train import facade

    monkeypatch.setenv("SPM_BPE_TRAIN_KERNEL", "sparse")
    flags = (f"--input={FIX / corpus} --model_type=bpe "
             f"--vocab_size={vocab} --hard_vocab_limit=false "
             "--minloglevel=2")
    facade.train(f"{flags} --model_prefix={tmp_path}/sp", engine="device")
    monkeypatch.delenv("SPM_BPE_TRAIN_KERNEL")
    facade.train(f"{flags} --model_prefix={tmp_path}/ex", engine="exact")
    assert (tmp_path / "sp.vocab").read_bytes() == \
        (tmp_path / "ex.vocab").read_bytes()


def test_bpe_sparse_engine_mesh_size_invariant(tmp_path, monkeypatch):
    """Sparse-engine merge sequence is independent of the mesh size
    (integer pair counts, order-exact psum)."""
    from sentencepiece_tpu.train import facade

    monkeypatch.setenv("SPM_BPE_TRAIN_KERNEL", "sparse")
    flags = (f"--input={FIX / 'sub.txt'} --model_type=bpe --vocab_size=300 "
             "--hard_vocab_limit=false --minloglevel=2")
    facade.train(f"{flags} --model_prefix={tmp_path}/d8", engine="device")
    monkeypatch.setenv("SPM_DATA_MESH_DEVICES", "1")
    facade.train(f"{flags} --model_prefix={tmp_path}/d1", engine="device")
    assert (tmp_path / "d8.vocab").read_bytes() == \
        (tmp_path / "d1.vocab").read_bytes()


def test_bpe_device_engine_mesh_size_invariant(tmp_path):
    """Integer pair counts make the merge sequence independent of the
    device count (stronger than the reference, whose result depends on
    num_threads via partial-merge order)."""
    from sentencepiece_tpu.train import facade

    flags = (f"--input={FIX / 'sub.txt'} --model_type=bpe --vocab_size=300 "
             "--hard_vocab_limit=false --minloglevel=2")
    facade.train(f"{flags} --model_prefix={tmp_path}/d8", engine="device")
    os.environ["SPM_DATA_MESH_DEVICES"] = "1"
    try:
        facade.train(f"{flags} --model_prefix={tmp_path}/d1",
                     engine="device")
    finally:
        del os.environ["SPM_DATA_MESH_DEVICES"]
    assert (tmp_path / "d8.vocab").read_bytes() == \
        (tmp_path / "d1.vocab").read_bytes()


def test_bpe_sparse_wave_invariant_under_append_overflow(tmp_path,
                                                         monkeypatch):
    """r5 self-review finding #1: an epoch that ends on APPEND OVERFLOW
    leaves the table missing the overflowed new pairs; follow-on
    in-wave epochs must be no-ops (the threaded tbl_ok flag), not merge
    from the stale table. Forcing overflow on every merge
    (SITE_ROWS=1), wave=8 must equal wave=1 must equal the exact host
    engine."""
    from sentencepiece_tpu.train import facade

    monkeypatch.setenv("SPM_BPE_TRAIN_KERNEL", "sparse")
    monkeypatch.setenv("SPM_BPE_SPARSE_SITE_ROWS", "1")
    flags = (f"--input={FIX / 'sub.txt'} --model_type=bpe --vocab_size=300 "
             "--hard_vocab_limit=false --minloglevel=2")
    monkeypatch.setenv("SPM_BPE_SPARSE_WAVE", "8")
    facade.train(f"{flags} --model_prefix={tmp_path}/w8", engine="device")
    monkeypatch.setenv("SPM_BPE_SPARSE_WAVE", "1")
    facade.train(f"{flags} --model_prefix={tmp_path}/w1", engine="device")
    monkeypatch.delenv("SPM_BPE_TRAIN_KERNEL")
    monkeypatch.delenv("SPM_BPE_SPARSE_SITE_ROWS")
    facade.train(f"{flags} --model_prefix={tmp_path}/ex", engine="exact")
    w8 = (tmp_path / "w8.vocab").read_bytes()
    w1 = (tmp_path / "w1.vocab").read_bytes()
    ex = (tmp_path / "ex.vocab").read_bytes()
    assert w8 == w1
    assert w8 == ex
