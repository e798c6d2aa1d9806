"""bench_loop_fn: the one-dispatch benchmark program must execute the
same pipeline as the production two-dispatch path (core == _pipeline_fn
outputs) and must actually iterate (the optimization_barrier dependency
keeps XLA from hoisting the body; checksum is iteration-dependent only
through real re-execution, so a hoisted body would still produce the
right value — what we CAN check cheaply is that the program runs and the
core outputs match)."""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.mark.parametrize("model", ["unigram_en_1k.model",
                                   "bpe_en_300.model",
                                   "word_en_300.model",
                                   "char_en_300.model"])
def test_core_matches_pipeline(model):
    import jax.numpy as jnp
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer, pack_lines

    sp = SentencePieceProcessor(os.path.join(FIX, model))
    tok = TpuTokenizer(sp)
    lines = [b"Hello world.", b"the quick brown fox", b"", b"a"]
    arr, lens = pack_lines(lines, 32)
    a, l = jnp.asarray(arr), jnp.asarray(lens)
    fn = tok._pipeline_fn(32)
    core, tables = tok._pipeline_core(32)
    want = fn(a, l)
    got = core(a, l, *tables)
    for w, g in zip(want, got):
        assert (np.asarray(w) == np.asarray(g)).all()
    # loop program runs end-to-end and yields a deterministic checksum
    loop = tok.bench_loop_fn(32)
    c1 = int(np.asarray(loop(a, l, 3)))
    c2 = int(np.asarray(loop(a, l, 3)))
    assert c1 == c2
