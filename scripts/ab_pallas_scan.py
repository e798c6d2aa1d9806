# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""A/B benchmark: XLA lax.scan vs Mosaic (Pallas) kernel for the unigram
Viterbi lattice scan, on the real chip, same batch, interleaved windows.

Times ONLY unigram_encode_batch (not the full pipeline) on a resident
input, alternating implementations per window so link drift hits both
equally. Gates on bit-identical outputs first. Results recorded in
docs/design.md ("The Pallas question").
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
MODEL = "/root/reference/python/test/test_model.model"
if not os.path.exists(MODEL):
    MODEL = os.path.join(REPO, "tests/fixtures/unigram_en_1k.model")
CORPUS = "/root/reference/data/botchan.txt"


def main() -> None:
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.encode import (UnigramBatchEncoder,
                                              unigram_encode_batch)
    from sentencepiece_tpu.tpu.pipeline import pack_lines

    sp = SentencePieceProcessor(MODEL)
    enc = UnigramBatchEncoder(sp)
    raw = open(CORPUS, "rb").read().split(b"\n")
    lines = [ln for ln in raw if 0 < len(ln) <= 128]
    # encode() operates on NORMALIZED bytes; normalize on host here so the
    # timed program is exactly the lattice populate + scan + backtrace.
    norm = [sp.normalize(ln.decode("utf-8", "surrogateescape")).encode()
            for ln in lines]
    norm = [b for b in norm if len(b) <= 160]
    arr, lens = pack_lines(norm, 160)
    nbytes = int(lens.sum())
    a, l = jnp.asarray(arr), jnp.asarray(lens)
    kw = dict(max_depth=enc.max_depth, unk_id=enc.unk_id,
              root_state=enc.root_state)

    def run(use_pallas):
        return unigram_encode_batch(enc.units, enc.lat_score_table, a, l,
                                    enc.unk_score, use_pallas=use_pallas,
                                    **kw)

    # warm both (no readback), then gate bit-exactness (readback AFTER
    # the timed phase would be safer on this rig, but equal treatment of
    # both arms keeps the comparison fair either way).
    outs = {}
    for up in (False, True):
        outs[up] = run(up)
        jax.block_until_ready(outs[up])

    REPS, WINDOWS = 30, 6
    best = {False: None, True: None}
    for w in range(WINDOWS):
        for up in (False, True):
            t0 = time.time()
            for _ in range(REPS):
                r = run(up)
            jax.block_until_ready(r)
            dt = (time.time() - t0) / REPS
            b = best[up]
            best[up] = dt if b is None else min(b, dt)

    same = all(bool(jnp.array_equal(outs[False][i], outs[True][i]))
               for i in range(2))
    print(f"batch rows={arr.shape[0]} width=160 bytes={nbytes}")
    for up, label in ((False, "xla-scan"), (True, "pallas")):
        print(f"{label:9s} best {best[up]*1e3:7.2f} ms/batch  "
              f"{nbytes / best[up] / 1e9:6.2f} GB/s")
    print("bit-identical:", same)


if __name__ == "__main__":
    main()
