# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""On-chip cost of one em2 EM round at BASELINE config-5 scale.

Builds the REAL trainer state (multilingual corpus, real seed vocab,
native candidate pack) and times the packed single-program round
(tpu/em2.py) with the loop methodology where possible: the round fn is
dispatched N times back-to-back (each consuming the previous round's
scores — inherently un-hoistable) with ONE readback at the end; the
paired N=1 / N=1+k difference cancels dispatch and link latency
(docs/design.md rule 6).

Prints one JSON line: {"round_ms": ..., "pack_s": ..., "upload_s": ...,
"compile_s": ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> None:
    import logging

    logging.disable(logging.INFO)
    from make_multilingual import build
    from sentencepiece_tpu.utils import compile_cache, profiling
    from sentencepiece_tpu.proto.spec import (TrainerSpec, ModelType)
    from sentencepiece_tpu.train import facade
    from sentencepiece_tpu.train import unigram as U

    compile_cache.enable()
    build("/tmp/spm_multilingual.txt")
    ts = TrainerSpec()
    ts.input = ["/tmp/spm_multilingual.txt"]
    ts.model_type = ModelType.UNIGRAM
    ts.vocab_size = 32000
    ts.hard_vocab_limit = False
    ts.max_sentence_length = 512
    ns = facade.get_normalizer_spec("nmt_nfkc")
    facade.populate_normalizer_spec(ns)
    tr = U.Trainer(ts, ns, engine="device")
    tr.load_sentences()
    pieces = tr.make_seed_sentence_pieces()
    tr.split_sentences_by_whitespace()
    tr._native_tables = tr._build_tables_native(pieces)

    t0 = time.time()
    dev = U._DeviceEM2(tr, pieces)
    init_s = time.time() - t0
    pack_s = profiling._totals.get("em_pack", 0.0)
    upload_s = profiling._totals.get("em_upload", 0.0)

    scores = np.full(dev.num_seed, -10.0, np.float32)
    alive = np.ones(dev.num_seed, bool)
    for i, (_, sc) in enumerate(dev.seed_pieces):
        scores[i] = sc
    sc_d = dev.dist.put_replicated(scores, dev.mesh)
    al_d = dev.dist.put_replicated(alive, dev.mesh)
    fn = dev._round_fn(dev.n_sub)
    args = (dev._dest, dev._segpos) + tuple(dev._flags) \
        + tuple(dev._freqs)

    t0 = time.time()
    out = fn(sc_d, al_d, *args)
    float(np.asarray(out[3])[0])  # force: compile + first exec
    compile_s = time.time() - t0

    def run(n):
        s, a = sc_d, al_d
        o = None
        for _ in range(n):
            o = fn(s, a, *args)
            s, a = o[0], o[1]
        t0 = time.time()
        float(np.asarray(o[3])[0])
        return time.time() - t0

    run(1)
    a1 = min(run(1) for _ in range(2))
    a6 = min(run(6) for _ in range(2))
    round_ms = (a6 - a1) / 5 * 1000
    print(json.dumps({
        "words": len(tr.sentences), "seeds": dev.num_seed,
        "n_sub": dev.n_sub,
        "init_s": round(init_s, 2), "pack_s": round(pack_s, 2),
        "upload_s": round(upload_s, 2),
        "compile_plus_first_exec_s": round(compile_s, 1),
        "round_ms": round(round_ms, 1),
        "force_n1_s": round(a1, 2)}))


if __name__ == "__main__":
    main()
