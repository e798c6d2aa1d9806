#!/usr/bin/env python3
# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""HOST encode throughput vs the reference spm_encode binary.

(The DEVICE pipeline is bench.py; this reproduces the README's host
encode numbers from the tree.) For unigram (test_model) and BPE
(bpe_en_300) on botchan.txt:

  * ref binary : wall clock of `spm_encode --output_format=id`
                 (includes its process startup + model load, exactly a
                 user's cost; reported with load time separately
                 estimated from an empty-input run)
  * per-call   : sp.encode_as_ids(line) in a Python loop — the honest
                 one-line-at-a-time API cost
  * batched    : sp.encode_as_ids_batch(lines) — one native call per
                 batch (fused normalize+encode in native.cc)

Ids are asserted identical to the reference binary's output first.
Prints one JSON line per row. Wall times on this rig swing 2-3x with
neighbor load; run when quiet and prefer ratios from one run.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CORPUS = "/root/reference/data/botchan.txt"
REF_BIN = "/tmp/refbuild2/src/spm_encode"
MODELS = [
    ("unigram", "/root/reference/python/test/test_model.model"),
    ("bpe", os.path.join(REPO, "tests/fixtures/bpe_en_300.model")),
]


def main() -> None:
    from sentencepiece_tpu import SentencePieceProcessor

    raw = open(CORPUS, "rb").read().split(b"\n")
    if raw and raw[-1] == b"":
        raw.pop()
    lines = [r.decode("utf-8", "surrogateescape") for r in raw]
    n = len(lines)

    for name, model in MODELS:
        if not (os.path.exists(model) and os.path.exists(REF_BIN)):
            print(json.dumps({"metric": f"host encode {name}",
                              "error": "model or reference binary missing"}))
            continue
        # reference binary (ids ground truth + wall time)
        t0 = time.time()
        ref = subprocess.run([REF_BIN, f"--model={model}",
                              "--output_format=id"],
                             stdin=open(CORPUS, "rb"), capture_output=True)
        ref_s = time.time() - t0
        t0 = time.time()
        subprocess.run([REF_BIN, f"--model={model}", "--output_format=id"],
                       stdin=subprocess.DEVNULL, capture_output=True)
        ref_load_s = time.time() - t0
        gold = [ln for ln in ref.stdout.decode().split("\n")][:n]

        sp = SentencePieceProcessor(model)
        # correctness gate
        ours = [" ".join(map(str, sp.encode_as_ids(t))) for t in lines]
        assert ours == gold, f"{name}: ids mismatch vs reference binary"

        t0 = time.time()
        for t in lines:
            sp.encode_as_ids(t)
        per_call_s = time.time() - t0
        t0 = time.time()
        sp.encode_as_ids_batch(lines)
        batch_s = time.time() - t0

        ref_rate = n / max(ref_s - ref_load_s, 1e-9)
        print(json.dumps({
            "metric": f"host encode lines/s ({name}, botchan, bit-exact)",
            "per_call": round(n / per_call_s, 1),
            "batched": round(n / batch_s, 1),
            "ref_binary": round(ref_rate, 1),
            "unit": "lines/s",
            "vs_baseline_per_call": round(n / per_call_s / ref_rate, 3),
            "vs_baseline_batched": round(n / batch_s / ref_rate, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
