"""Device-engine unigram training over the (virtual 8-device) mesh.

The device engine shards word lattices data-parallel and reduces expected
counts in a FIXED order (tpu/em.py fixed_order_psum; SURVEY.md §2.9), so
at a fixed global device count the trained artifact is byte-identical
across process layouts (tests/test_distributed.py).

Two conformance contracts, both covered here:

* exact-finish (default, SPM_DEVICE_EXACT_FINISH=auto): after the device
  EM loop exits, the trainer rewinds to a round-start snapshot and replays
  the tail of the loop through the host-exact float engine
  (train/unigram.py). Measured drift does not contract across replayed
  rounds, so on small corpora (<= SPM_DEVICE_EXACT_FINISH_SMALL words) the
  full trajectory is replayed and the artifact is BYTE-IDENTICAL to
  engine="exact"; at scale a cost-bounded tail is replayed and the
  tolerance contract below applies.

* pure device (SPM_DEVICE_EXACT_FINISH=0): the device transcendentals
  (XLA exp/log vs glibc) drift by ULPs, which can flip near-threshold
  prune decisions — the analog of the reference's own
  num_threads-dependent partial-merge order — so the oracle is
  near-identity: >=99% piece overlap and tight score agreement."""

import pathlib

import numpy as np

FIX = pathlib.Path(__file__).parent / "fixtures" / "train"


def _vocab(path):
    out = {}
    for line in open(path, encoding="utf-8"):
        piece, score = line.rstrip("\n").split("\t")
        out[piece] = float(score)
    return out


def _train(tmp_path, engine, **env):
    import os
    from sentencepiece_tpu.train import facade

    extra = env.pop("SPM_EXTRA", "")
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        facade.train(
            f"--input={FIX / 'sub.txt'} --model_prefix={tmp_path}/m "
            "--model_type=unigram --vocab_size=300 --hard_vocab_limit=false "
            f"--minloglevel=2 {extra}".strip(), engine=engine)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return ((tmp_path / "m.model").read_bytes(),
            (tmp_path / "m.vocab").read_bytes())


def test_unigram_device_engine_byte_equal(tmp_path):
    """engine="device" with the default exact-finish bridge emits the same
    artifact bytes as engine="exact" (VERDICT r2 item 6). Same model_prefix
    for both runs so the spec embedded in the .model is identical too."""
    import jax

    assert len(jax.devices()) == 8  # conftest forces the virtual cpu mesh
    exact_model, exact_vocab = _train(tmp_path, "exact")
    dev_model, dev_vocab = _train(tmp_path, "device")
    assert dev_vocab == exact_vocab
    assert dev_model == exact_model

    from sentencepiece_tpu import SentencePieceProcessor

    sp = SentencePieceProcessor(str(tmp_path / "m.model"))
    ids = sp.encode_as_ids("I have a pen.")
    assert ids and sp.decode_ids(ids) == "I have a pen."


def test_unigram_device_engine_pure(tmp_path):
    """Pure device mode (no exact-finish): near-identity tolerance oracle."""
    exact_model, exact_vocab = _train(tmp_path, "exact")
    del exact_model
    (tmp_path / "exact.vocab").write_bytes(exact_vocab)
    _train(tmp_path, "device", SPM_DEVICE_EXACT_FINISH="0")
    dv = _vocab(tmp_path / "m.vocab")
    ex = _vocab(tmp_path / "exact.vocab")
    common = set(dv) & set(ex)
    assert len(common) / len(ex) >= 0.99
    ds = np.array([dv[p] for p in common])
    es = np.array([ex[p] for p in common])
    np.testing.assert_allclose(ds, es, rtol=0, atol=2e-3)


def test_unigram_device_engine_sub_iterations(tmp_path):
    """engine="device" with a non-default --num_sub_iterations builds a
    matching round program (em2 bakes n_sub statically) and still
    emits the exact-engine artifact bytes."""
    exact_model, exact_vocab = _train(tmp_path, "exact",
                                      SPM_EXTRA="--num_sub_iterations=3")
    dev_model, dev_vocab = _train(tmp_path, "device",
                                  SPM_EXTRA="--num_sub_iterations=3")
    assert dev_vocab == exact_vocab
