# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""A/B benchmark: XLA lax.scan vs Mosaic (Pallas) kernel for the unigram
Viterbi lattice scan, on the real chip.

Methodology (see docs/design.md rule 6): each arm is a measurement
program — unigram_encode_batch executed N times inside one fori_loop
with a carry-XORed padding byte keeping the body loop-variant — timed
via paired N=1 / N=1+k dispatches with a forced scalar readback, which
cancels all host-link overhead. Arms alternate per window so link drift
hits both equally. Bit-exactness of pallas vs xla is gated first.
Results go to docs/design.md ("The Pallas question").
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
MODEL = "/root/reference/python/test/test_model.model"
if not os.path.exists(MODEL):
    MODEL = os.path.join(REPO, "tests/fixtures/unigram_en_1k.model")
CORPUS = "/root/reference/data/botchan.txt"
ITERS = int(os.environ.get("AB_ITERS", "24"))
WINDOWS = int(os.environ.get("AB_WINDOWS", "3"))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.encode import (UnigramBatchEncoder,
                                              unigram_encode_batch)
    from sentencepiece_tpu.tpu.pipeline import pack_lines

    sp = SentencePieceProcessor(MODEL)
    enc = UnigramBatchEncoder(sp)
    raw = open(CORPUS, "rb").read().split(b"\n")
    lines = [ln for ln in raw if 0 < len(ln) <= 128]
    norm = [sp.normalizer.normalize(
        ln.decode("utf-8", "surrogateescape"))[0]
            for ln in lines]
    norm = [b for b in norm if len(b) <= 160]
    arr, lens = pack_lines(norm, 160)
    nbytes = int(lens.sum())
    a, l = jnp.asarray(arr), jnp.asarray(lens)
    kw = dict(max_depth=enc.max_depth, unk_id=enc.unk_id,
              root_state=enc.root_state)

    def make_loop(use_pallas):
        @jax.jit
        def loop(batch, lengths, n, units, table, unk):
            def body(_, carry):
                b = batch.at[-1, 0].set(batch[-1, 0] ^ (carry & 1))
                ids, n_ids = unigram_encode_batch(
                    units, table, b, lengths, unk,
                    use_pallas=use_pallas, **kw)
                mix = jnp.sum(n_ids, dtype=jnp.int32)
                return (mix & 0xFF).astype(jnp.uint8) ^ carry
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))

        def fn(n):
            return loop(a, l, jnp.int32(n), enc.units,
                        enc.lat_score_table, enc.unk_score)
        return fn

    def run_to_scalar(fn, n):
        t0 = time.time()
        int(np.asarray(fn(n)))
        return time.time() - t0

    # bit-exactness gate (single readback per arm)
    outs = {}
    for up in (False, True):
        outs[up] = unigram_encode_batch(
            enc.units, enc.lat_score_table, a, l, enc.unk_score,
            use_pallas=up, **kw)
    same = all(bool(jnp.array_equal(outs[False][i], outs[True][i]))
               for i in range(2))
    print(f"bit-identical: {same}", flush=True)

    loops = {False: make_loop(False), True: make_loop(True)}
    for up in (False, True):
        run_to_scalar(loops[up], 1)  # compile + warm
        print(f"warm {'pallas' if up else 'xla'} done", flush=True)

    best = {False: None, True: None}
    for w in range(WINDOWS):
        for up in (False, True):
            d1 = run_to_scalar(loops[up], 1)
            dn = run_to_scalar(loops[up], 1 + ITERS)
            per = max(dn - d1, 1e-9) / ITERS
            b = best[up]
            best[up] = per if b is None else min(b, per)
            print(f"w{w} {'pallas' if up else 'xla  '}: "
                  f"{per * 1e3:7.2f} ms/iter", flush=True)

    print(f"batch rows={arr.shape[0]} width=160 bytes={nbytes}")
    for up, label in ((False, "xla-scan"), (True, "pallas")):
        print(f"{label:9s} best {best[up] * 1e3:7.2f} ms/batch  "
              f"{nbytes / best[up] / 1e9:6.2f} GB/s")


if __name__ == "__main__":
    main()
