"""N-best and subword-regularization sampling conformance.

* N-best: byte-identical to the reference `spm_encode
  --output_format=nbest_id`, INCLUDING equal-score tie ordering (the agenda
  emulates libstdc++'s std::priority_queue heap mechanics exactly —
  utils/stdheap.py).
* Sampling: the reference draws from a thread_local mt19937 seeded by
  random_device (util.cc:379-382) — unreproducible by design. Our PRNG
  contract: a caller-supplied (or utils.rng default) numpy Generator drives
  `std::discrete_distribution`-equivalent categorical draws over the exact
  forward-filtered lattice distribution. The tests verify the contract
  statistically: empirical segmentation frequencies must converge to the
  exact lattice probabilities.
"""

import math
from collections import Counter

import numpy as np


def test_nbest_fixture(fixtures_dir, botchan_path):
    from sentencepiece_tpu import SentencePieceProcessor

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    raw = open(botchan_path, "rb").read().split(b"\n")[:100]
    want = open(fixtures_dir / "unigram_en_nbest5.txt").read().splitlines()
    got = []
    for line in raw:
        for ids in sp.nbest_encode_as_ids(
                line.decode("utf-8", "surrogateescape"), 5):
            got.append(" ".join(map(str, ids)))
    assert got == want


def test_sample_distribution_matches_lattice():
    """Empirical sample frequencies ~ exact path probabilities (theta=1)."""
    from sentencepiece_tpu import SentencePieceProcessor

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    text = "apple"
    # exact path probabilities from the 20-best (covers ~all mass)
    nbests = sp.model.nbest_encode(
        sp.normalizer.normalize(text)[0], 20)
    logZ = None
    probs = {}
    scores = [s for _, s in nbests]
    m = max(scores)
    Z = sum(math.exp(s - m) for s in scores)
    for result, s in nbests:
        key = tuple(pid for _, pid in result)
        probs[key] = math.exp(s - m) / Z

    rng = np.random.default_rng(1234)
    n = 3000
    counts = Counter()
    for _ in range(n):
        ids = tuple(sp.sample_encode_as_ids(text, -1, 1.0, rng=rng))
        counts[ids] += 1
    # compare the top few segmentations
    top = sorted(probs.items(), key=lambda kv: -kv[1])[:4]
    for key, p in top:
        emp = counts.get(key, 0) / n
        assert abs(emp - p) < 0.04, (key, p, emp)


def test_sample_alpha_sharpens():
    """Large alpha (theta) concentrates on the Viterbi segmentation."""
    from sentencepiece_tpu import SentencePieceProcessor

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    text = "apple pie"
    viterbi = tuple(sp.encode_as_ids(text))
    rng = np.random.default_rng(7)
    hits = sum(
        tuple(sp.sample_encode_as_ids(text, -1, 50.0, rng=rng)) == viterbi
        for _ in range(50))
    assert hits >= 48


def test_sample_nbest_mode():
    """nbest_size > 1: sample from the n-best list
    (sentencepiece_processor.cc:636-646)."""
    from sentencepiece_tpu import SentencePieceProcessor

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    rng = np.random.default_rng(3)
    seen = set()
    for _ in range(60):
        seen.add(tuple(sp.sample_encode_as_ids("apple", 5, 0.5, rng=rng)))
    nbest = {tuple(ids) for ids in sp.nbest_encode_as_ids("apple", 5)}
    assert seen <= nbest
    assert len(seen) >= 2


def test_bpe_dropout(fixtures_dir):
    """BPE-dropout (sample_encode with theta = dropout prob): p=0 equals
    deterministic encode; p>0 produces varied, lossless segmentations."""
    from sentencepiece_tpu import SentencePieceProcessor

    sp = SentencePieceProcessor(str(fixtures_dir / "bpe_en_300.model"))
    text = "undesirable circumstances"
    base = sp.encode_as_pieces(text)
    rng = np.random.default_rng(0)
    assert sp.sample_encode_as_pieces(text, -1, 0.0, rng=rng) == base
    seen = {tuple(sp.sample_encode_as_pieces(text, -1, 0.4, rng=rng))
            for _ in range(25)}
    assert len(seen) > 3
    for seg in seen:
        assert sp.decode_pieces(list(seg)) == text


def test_device_lattice_sampling_distribution():
    """Device forward-filter/backward-sample (tpu/encode.py
    unigram_sample_batch) draws segmentations from the same distribution
    as the host lattice sampler (unigram_model.cc:385-442 semantics)."""
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    tok = TpuTokenizer(sp)
    S = 1500
    rng = np.random.default_rng(7)
    hr = np.random.default_rng(8)
    for theta, text in ((1.0, "hello"), (0.5, "worlds")):
        host = {}
        for _ in range(S):
            t = tuple(sp.sample_encode_as_ids(text, -1, theta, rng=hr))
            host[t] = host.get(t, 0) + 1
        dev = {}
        for o in tok.sample_encode([text] * S, -1, theta, rng=rng):
            dev[tuple(o)] = dev.get(tuple(o), 0) + 1
        # every mass point within 4 sigma of the host estimate
        for k in set(host) | set(dev):
            p = host.get(k, 0) / S
            q = dev.get(k, 0) / S
            sigma = (max(p * (1 - p), 1e-4) / S) ** 0.5
            assert abs(p - q) < 5 * sigma + 2 / S, (k, p, q)
        # decode losslessly
        for k in dev:
            assert sp.decode_ids(list(k)) == text


def test_device_bpe_dropout_distribution(fixtures_dir):
    """Device BPE-dropout (tpu/bpe_encode.py bpe_dropout_batch) matches
    the host agenda dropout distribution; p=0 equals deterministic."""
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(str(fixtures_dir / "bpe_en_300.model"))
    tok = TpuTokenizer(sp)
    text = "there"
    assert tok.sample_encode([text], -1, 0.0)[0] == sp.encode_as_ids(text)
    S = 1500
    p = 0.3
    hr = np.random.default_rng(5)
    host = {}
    for _ in range(S):
        k = tuple(sp.sample_encode_as_ids(text, -1, p, rng=hr))
        host[k] = host.get(k, 0) + 1
    dev = {}
    for o in tok.sample_encode([text] * S, -1, p,
                               rng=np.random.default_rng(6)):
        dev[tuple(o)] = dev.get(tuple(o), 0) + 1
    for k in set(host) | set(dev):
        ph, pd = host.get(k, 0) / S, dev.get(k, 0) / S
        sig = (max(ph * (1 - ph), 1e-4) / S) ** 0.5
        assert abs(ph - pd) < 5 * sig + 2 / S, (k, ph, pd)
        assert sp.decode_ids(list(k)) == text


def test_sample_golden_host(fixtures_dir):
    """The documented PRNG contract, enforced: a fixed-seed numpy PCG64
    Generator must reproduce the committed id sequences exactly, across
    numpy versions and platforms (scripts/gen_sampling_golden.py). A
    mismatch means the contract was broken — a breaking API event."""
    import json

    from sentencepiece_tpu import SentencePieceProcessor

    g = json.load(open(fixtures_dir / "sampling_golden.json"))
    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    rng = np.random.default_rng(g["seed"])
    for case in g["host"]:
        ids = sp.sample_encode_as_ids(case["text"], case["nbest"],
                                      case["alpha"], rng=rng)
        assert ids == case["ids"], case


def test_sample_golden_device(fixtures_dir):
    """Device sampling golden (CPU backend, which is what CI runs): the
    jax threefry stream keyed from the same fixed-seed Generator must
    reproduce the committed draws exactly."""
    import json

    import jax

    if jax.default_backend() != "cpu":  # fixture is backend-pinned
        import pytest

        pytest.skip("device sampling golden is pinned to the CPU backend")
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    g = json.load(open(fixtures_dir / "sampling_golden.json"))
    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    tok = TpuTokenizer(sp)
    texts = [c["text"] for c in g["host"][::4]]
    rng = np.random.default_rng(g["seed"])
    for case in g["device"]:
        res = tok.sample_encode(texts, case["nbest"], case["alpha"],
                                rng=rng)
        assert [list(r) for r in res] == case["ids"], case
