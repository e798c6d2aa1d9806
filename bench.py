#!/usr/bin/env python3
# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Driver benchmark: batched unigram encode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "bytes/s", "vs_baseline": N}

Baseline anchor: the reference README's ~50k sentences/sec CPU figure
(README.md:27) over botchan.txt's 64 B/line average = ~3.2 MB/s. The
conformance contract (ids bit-exact vs reference spm_encode) is enforced
against the golden fixture before timing; a mismatch fails the bench.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

MODEL = "/root/reference/python/test/test_model.model"
CORPUS = "/root/reference/data/botchan.txt"
GOLD = "/root/repo/tests/fixtures/unigram_en.ids.txt"
BASELINE_BYTES_PER_S = 50_000 * 64.0  # reference ~50k sent/s, 64 B avg line


def main() -> None:
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.encode import UnigramBatchEncoder

    sp = SentencePieceProcessor(MODEL)
    enc = UnigramBatchEncoder(sp)

    raw = open(CORPUS, "rb").read().split(b"\n")
    if raw and raw[-1] == b"":
        raw.pop()
    lines = [l.decode("utf-8", "surrogateescape") for l in raw]
    nbytes = sum(len(l) for l in raw)

    # correctness gate: bit-exact vs reference spm_encode fixture
    gold = [list(map(int, l.split())) for l in
            open(GOLD).read().splitlines()]
    ids = enc.encode(lines)
    bad = sum(1 for a, b in zip(ids, gold) if a != b)
    if bad:
        print(json.dumps({"metric": "encode bytes/s/chip (unigram, botchan)",
                          "value": 0, "unit": "bytes/s",
                          "vs_baseline": 0.0,
                          "error": f"{bad} lines mismatch golden ids"}))
        return

    # timed: end-to-end encode (host normalize + device lattice/Viterbi)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        enc.encode(lines)
    dt = (time.time() - t0) / reps

    value = nbytes / dt
    print(json.dumps({
        "metric": "encode bytes/s/chip (unigram, botchan, bit-exact)",
        "value": round(value, 1),
        "unit": "bytes/s",
        "vs_baseline": round(value / BASELINE_BYTES_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
