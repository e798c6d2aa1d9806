"""Pallas lattice-scan kernel vs a numpy reference (interpreter mode on the
CPU backend; the same kernel compiles via Mosaic on TPU — verified
out-of-band on hardware for both modes)."""

import numpy as np
import pytest


NEG_INF = -1e30


def _ref_alpha(sc, mode):
    W, P, K = sc.shape
    alpha = np.full((W, P + 1), NEG_INF, np.float64)
    alpha[:, 0] = 0.0
    for p in range(P):
        cand = np.full((W, K), -np.inf)
        for k in range(K):
            if p - k >= 0:
                cand[:, k] = alpha[:, p - k] + sc[:, p, k]
        m = cand.max(axis=1)
        if mode == "viterbi":
            alpha[:, p + 1] = np.maximum(m, NEG_INF)
        else:
            e = np.where(cand - m[:, None] > -60,
                         np.exp(np.clip(cand - m[:, None], -700, 0)), 0)
            alpha[:, p + 1] = np.where(m <= NEG_INF / 2, NEG_INF,
                                       m + np.log(e.sum(axis=1)))
    return alpha


@pytest.mark.parametrize("mode", ["viterbi", "logsumexp"])
def test_lattice_scan_kernel(mode):
    import jax.numpy as jnp
    from sentencepiece_tpu.tpu.pallas_kernels import lattice_scan_pallas

    rng = np.random.default_rng(0)
    W, P, K = 200, 24, 6
    sc = rng.normal(-3, 1, (W, P, K)).astype(np.float32)
    sc[rng.random((W, P, K)) < 0.4] = NEG_INF
    got = np.asarray(lattice_scan_pallas(jnp.asarray(sc), mode=mode,
                                         interpret=True))
    want = _ref_alpha(sc, mode)
    finite = want > NEG_INF / 2
    assert ((got <= NEG_INF / 2) == ~finite).all()
    assert np.allclose(got[finite], want[finite], atol=1e-3)


def test_viterbi_bp_matches_xla_scan_encode():
    """unigram_encode_batch(use_pallas=True) must be token-for-token
    identical to the production XLA-scan path (same recurrence, same
    longest-piece tie-break) on a real model over mixed-script text."""
    import jax.numpy as jnp
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.encode import unigram_encode_batch
    from sentencepiece_tpu.tpu.pipeline import pack_lines
    from sentencepiece_tpu.tpu.encode import UnigramBatchEncoder

    import os
    model = os.path.join(os.path.dirname(__file__),
                         "fixtures/unigram_en_1k.model")
    sp = SentencePieceProcessor(model)
    enc = UnigramBatchEncoder(sp)
    lines = [b"Hello world, this is a test.",
             b"the quick brown fox jumps over the lazy dog",
             b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
             "日本語テキスト混在 mixed".encode(),
             b"x", b""]
    arr, lens = pack_lines(lines, 64)
    kw = dict(max_depth=enc.max_depth, unk_id=enc.unk_id,
              root_state=enc.root_state)
    a, l = jnp.asarray(arr), jnp.asarray(lens)
    ids_x, n_x = unigram_encode_batch(
        enc.units, enc.lat_score_table, a, l, enc.unk_score, **kw)
    ids_p, n_p = unigram_encode_batch(
        enc.units, enc.lat_score_table, a, l, enc.unk_score,
        use_pallas=True, **kw)
    assert (np.asarray(n_x) == np.asarray(n_p)).all()
    assert (np.asarray(ids_x) == np.asarray(ids_p)).all()
