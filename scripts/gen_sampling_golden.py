# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Pin the sampling PRNG contract with golden draws.

The reference's SampleEncode draws from a thread_local mt19937 seeded by
std::random_device (reference src/util.cc:379-382) — unreproducible by
design, so no cross-implementation golden can exist. What CAN be pinned
is OUR contract (docs/api.md "PRNG contract"): a numpy PCG64 Generator
with a fixed seed must yield the same id sequences forever, across
numpy/jax versions and platforms. This script freezes that sequence:

  * host path: SentencePieceProcessor.sample_encode_as_ids over the
    exact forward-filtered lattice distribution (models/unigram.py),
    nbest_size=-1 at several alphas plus nbest-draw (nbest_size=5);
  * device path: TpuTokenizer.sample_encode on the CPU backend (the
    jax threefry stream for a key derived from the same Generator —
    bit-stable for a fixed key; the fixture is backend-pinned to CPU,
    which is what CI runs).

Output: tests/fixtures/sampling_golden.json, verified by
tests/test_sampling.py::test_sample_golden_{host,device}. If this
fixture ever breaks, the PRNG contract changed — that is a breaking
API event, not a test to refresh casually.
"""

import json
import os
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SEED = 20260820
TEXTS = [
    "I have a pen.",
    "apple pie and orange juice",
    "Bookkeeping is underrated.",
    "吾輩は猫である。",
    "mixed latin と 漢字 words",
]


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import numpy as np
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    out = {"seed": SEED, "model": "reference python/test/test_model.model",
           "host": [], "device": [], "device_backend": "cpu"}

    rng = np.random.default_rng(SEED)
    for text in TEXTS:
        for nbest, alpha in [(-1, 0.1), (-1, 0.5), (-1, 1.0), (5, 0.5)]:
            ids = sp.sample_encode_as_ids(text, nbest, alpha, rng=rng)
            out["host"].append({"text": text, "nbest": nbest,
                                "alpha": alpha, "ids": ids})

    tok = TpuTokenizer(sp)
    rng = np.random.default_rng(SEED)
    for nbest, alpha in [(-1, 0.1), (-1, 1.0), (5, 0.5)]:
        res = tok.sample_encode(TEXTS, nbest, alpha, rng=rng)
        out["device"].append({"nbest": nbest, "alpha": alpha, "ids": res})

    path = REPO / "tests" / "fixtures" / "sampling_golden.json"
    path.write_text(json.dumps(out, indent=1, ensure_ascii=False) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
