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


def test_bpe_device_bit_exact_ja(fixtures_dir):
    """JA device BPE vs the committed reference golden: fixture
    bpe_ja.ids.txt is reference spm_encode over wagahaiwa_nekodearu.txt
    with tests/fixtures/bpe_ja_900.model (reference-trained; our trainer
    reproduces its .vocab byte-identically — matrix case
    ja_bpe_900_nmt_nfkc)."""
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.bpe_encode import BpeBatchEncoder

    sp = SentencePieceProcessor(str(fixtures_dir / "bpe_ja_900.model"))
    enc = BpeBatchEncoder(sp)
    assert not enc.host_only
    raw = open("/root/reference/data/wagahaiwa_nekodearu.txt",
               "rb").read().split(b"\n")
    if raw and raw[-1] == b"":
        raw.pop()
    lines = [l.decode("utf-8", "surrogateescape") for l in raw[:400]]
    gold = [list(map(int, l.split())) if l else []
            for l in open(fixtures_dir / "bpe_ja.ids.txt").read()
            .splitlines()][:400]
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


def test_pair_lookup_bsearch_matches_dense(fixtures_dir, monkeypatch):
    """The big-table binary-search pair lookup (large-vocab BPE: ~100k
    pairs would blow up the one-hot's compile and runtime) is value-
    identical to the dense form — both on a synthetic 10k-key table and
    through a full encode with the threshold forced to 0."""
    import numpy as np
    import jax.numpy as jnp
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu import bpe_encode as be

    rng = np.random.default_rng(7)
    keys = np.unique(rng.integers(0, 1 << 30, 10_000).astype(np.int32))
    score = rng.standard_normal(len(keys)).astype(np.float32)
    new = rng.integers(0, 50_000, len(keys)).astype(np.int32)
    # half hits, half misses
    q = np.concatenate([rng.choice(keys, 500),
                        rng.integers(0, 1 << 30, 500).astype(np.int32)])
    valid = rng.random(1000) < 0.9
    sc_b, ns_b = be._pair_lookup_bsearch(
        jnp.asarray(keys), jnp.asarray(score), jnp.asarray(new),
        jnp.asarray(q), jnp.asarray(valid))
    sc_d, ns_d = be._pair_lookup_dense(
        jnp.asarray(keys), jnp.asarray(score), jnp.asarray(new),
        jnp.asarray(q), jnp.asarray(valid), block=512)
    assert np.array_equal(np.asarray(ns_b), np.asarray(ns_d))
    assert np.array_equal(np.asarray(sc_b), np.asarray(sc_d))

    # power-of-two table size regression: (n-1).bit_length() ran one
    # binary-search round short and missed index-1 keys at n=2^k
    for n in (4096 * 2, 4096 * 4):
        k2 = (np.arange(n) * 7 + 3).astype(np.int32)  # sorted, unique
        s2 = np.arange(n, dtype=np.float32)
        v2 = np.arange(n, dtype=np.int32)
        q2 = k2[[0, 1, 2, n - 2, n - 1]]
        sc2, ns2 = be._pair_lookup_bsearch(
            jnp.asarray(k2), jnp.asarray(s2), jnp.asarray(v2),
            jnp.asarray(q2), jnp.ones(5, bool))
        assert np.array_equal(np.asarray(ns2), [0, 1, 2, n - 2, n - 1])

    # full encode with every lookup forced through the bsearch path
    sp = SentencePieceProcessor(str(fixtures_dir / "bpe_en_300.model"))
    from sentencepiece_tpu.tpu.bpe_encode import BpeBatchEncoder
    texts = ["I have a pen.", "Absolutely marvelous.", "a  b", "▁x"]
    want = [sp.encode_as_ids(t) for t in texts]
    monkeypatch.setattr(be, "_DENSE_MAX_PAIRS", 0)
    got = BpeBatchEncoder(sp).encode(texts)
    assert got == want


def test_parallel_merge_kernel_matches_sequential(fixtures_dir):
    """bpe_encode_batch_parallel (batched best-pair merging + chain
    parity) reproduces the sequential scan's ids exactly."""
    import jax.numpy as jnp
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.bpe_encode import (BpeBatchEncoder,
                                                  bpe_encode_batch,
                                                  bpe_encode_batch_parallel)
    from sentencepiece_tpu.utils.unicode import utf8_to_unicode_text

    sp = SentencePieceProcessor(str(fixtures_dir / "bpe_en_300.model"))
    enc = BpeBatchEncoder(sp)
    texts = ["A cold day.", "aaaaaa bbb", "the theatre there",
             "mississippi", "", "xyzzy plugh"]
    cps_list = [utf8_to_unicode_text(sp.normalizer.normalize(t)[0])
                for t in texts]
    W = 64
    arr = np.zeros((8, W), np.int32)
    lens = np.zeros(8, np.int32)
    for j, c in enumerate(cps_list):
        arr[j, :len(c)] = c
        lens[j] = len(c)
    kw = dict(universe=enc.U, max_merges=W - 1, unk_id=enc.unk_id,
              pad_id=enc.pad_id)
    a1, n1, _ = bpe_encode_batch(enc.pair_keys, enc.pair_new,
                                 enc.pair_score, enc.cp_to_sym,
                                 enc.sym_to_id, jnp.asarray(arr),
                                 jnp.asarray(lens), **kw)
    a2, n2, _ = bpe_encode_batch_parallel(
        enc.pair_keys, enc.pair_new, enc.pair_score, enc.cp_to_sym,
        enc.sym_to_id, jnp.asarray(arr), jnp.asarray(lens), **kw)
    a1, n1, a2, n2 = map(np.asarray, (a1, n1, a2, n2))
    for j in range(len(texts)):
        assert a1[j, :n1[j]].tolist() == a2[j, :n2[j]].tolist()


def test_scan_merge_kernel_matches_sequential(fixtures_dir):
    """bpe_encode_batch_scan (alive-mask + propagate scans) reproduces
    the sequential scan's ids exactly, including same-symbol runs and
    chain parity."""
    import jax.numpy as jnp
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.bpe_encode import (BpeBatchEncoder,
                                                  bpe_encode_batch,
                                                  bpe_encode_batch_scan)
    from sentencepiece_tpu.utils.unicode import utf8_to_unicode_text

    sp = SentencePieceProcessor(str(fixtures_dir / "bpe_en_300.model"))
    enc = BpeBatchEncoder(sp)
    texts = ["A cold day.", "aaaaaa bbb", "the theatre there",
             "mississippi", "", "xyzzy plugh", "a", "  doubled  spaces "]
    cps_list = [utf8_to_unicode_text(sp.normalizer.normalize(t)[0])
                for t in texts]
    W = 64
    arr = np.zeros((8, W), np.int32)
    lens = np.zeros(8, np.int32)
    for j, c in enumerate(cps_list):
        arr[j, :len(c)] = c
        lens[j] = len(c)
    kw = dict(universe=enc.U, max_merges=W - 1, unk_id=enc.unk_id,
              pad_id=enc.pad_id)
    a1, n1, _ = bpe_encode_batch(enc.pair_keys, enc.pair_new,
                                 enc.pair_score, enc.cp_to_sym,
                                 enc.sym_to_id, jnp.asarray(arr),
                                 jnp.asarray(lens), **kw)
    a2, n2, _ = bpe_encode_batch_scan(
        enc.pair_keys, enc.pair_new, enc.pair_score, enc.cp_to_sym,
        enc.sym_to_id, jnp.asarray(arr), jnp.asarray(lens), **kw)
    a1, n1, a2, n2 = map(np.asarray, (a1, n1, a2, n2))
    for j in range(len(texts)):
        assert a1[j, :n1[j]].tolist() == a2[j, :n2[j]].tolist()


def test_parallel_merge_capacity_guard_uniform_depth():
    """Capacity-ladder decimation: when EVERY row needs many merge
    rounds, no phase may exit before the unfinished rows fit the next
    level — a uniform batch exercises the guard path and must stay
    byte-identical to the host encoder."""
    import os

    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(
        os.path.join(os.path.dirname(__file__),
                     "fixtures/bpe_en_300.model"))
    tok = TpuTokenizer(sp)
    # identical deep-merge content in every row (ladder can never shed
    # rows early), plus a couple of short rows
    deep = "the quick brown fox jumps over the lazy dog again and again"
    texts = [deep] * 120 + ["a", "ab intra"] * 4
    got = tok.encode(texts)
    want = [sp.encode_as_ids(t) for t in texts]
    assert got == want


def test_unused_pieces_device_path(fixtures_dir):
    """set_vocabulary-restricted BPE serving on device (VERDICT r4 item
    7): UNUSED pieces merge like NORMAL ones; only rows whose output
    holds an unused symbol re-encode on the host rev_merge path via the
    kernels' per-row flag. Gold = the exact host path (reference-
    validated for set_vocabulary in test_processor.py)."""
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.proto.spec import PieceType
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(str(fixtures_dir / "bpe_en_300.model"))
    # restrict to pieces of length <= 3: longer merged pieces flip to
    # UNUSED and must resegment at encode time
    keep = [sp.id_to_piece(i) for i in range(len(sp))
            if len(sp.id_to_piece(i)) <= 3]
    sp.set_vocabulary(keep)
    types = sp.model.types
    assert (types == PieceType.UNUSED).any()

    tok = TpuTokenizer(sp)
    assert tok._bpe is not None and not tok._bpe.host_only

    raw = open("/root/reference/data/botchan.txt", "rb").read()
    lines = [ln.decode("utf-8", "surrogateescape")
             for ln in raw.split(b"\n") if ln][:300]
    gold = [sp.encode_as_ids(ln) for ln in lines]
    got = tok.encode(lines)
    bad = [i for i in range(len(lines)) if got[i] != gold[i]]
    assert not bad, (len(bad), bad[:5])

    # the BpeBatchEncoder path (host-normalized) must agree too
    got2 = tok._bpe.encode(lines[:100])
    assert got2 == gold[:100]
