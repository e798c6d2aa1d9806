# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Oracle experiment: where does the reference BPE trainer's ACTIVE-SET
restriction change the trained vocab?

The reference limits each pop's candidates to the top max(1000,
5% * cache) bigrams by frequency, refreshed every 100 merges, with the
equal-frequency cutoff decided by libstdc++ unordered_map iteration
order + std::partial_sort internals (bpe_model_trainer.cc:156-183,
234-237). A device engine selecting the GLOBAL argmax (freq desc, len
asc, string lex asc) therefore matches the reference only until the
first pop whose true best pair was excluded by that cutoff — host-only
state that no corpus-derived computation can reproduce.

This script measures the divergence point: it trains botchan at 8k
twice through the exact host engine — once with the faithful active-set
machinery, once with the active set widened to ALL bigrams — and
reports the first differing vocab line.

Result (2026-08-19, recorded in docs/conformance.md): byte-identical
through piece 4263; piece 4264 is '.6' (global) vs '.5' (active-set) —
an equal-frequency cutoff tie. The device trainers
(tpu/bpe_train*.py) therefore document global-argmax selection as a
deviation and gate their byte-exactness tests below the measured
divergence point.

Usage: python scripts/oracle_bpe_active_set.py [vocab_size]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import time

    from sentencepiece_tpu.train import facade
    from sentencepiece_tpu.train import bpe as bpe_mod
    import sentencepiece_tpu.native as native

    vocab = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    flags = ("--input=/root/reference/data/botchan.txt --model_type=bpe "
             f"--vocab_size={vocab} --hard_vocab_limit=false "
             "--minloglevel=2")

    # force the monkeypatchable Python loop (the native core has the
    # active-set machinery baked in)
    def no_native(*a, **k):
        raise RuntimeError("disabled")

    native.bpe_train_merges_native = no_native

    t0 = time.time()
    facade.train(flags + " --model_prefix=/tmp/oracle_active",
                 engine="exact")
    print(f"active-set arm: {time.time() - t0:.1f}s", flush=True)

    def update_all(self):
        symbols = []
        for s in self._cache.values():
            if s.left is not None and s.right is not None:
                if s.freq <= 0:
                    self._compute_freq(s)
                symbols.append(s)
        self._active = set(symbols)
        self._active_list = sorted(self._active, key=lambda s: s.cidx)

    bpe_mod.Trainer._update_active_symbols = update_all
    t0 = time.time()
    facade.train(flags + " --model_prefix=/tmp/oracle_global",
                 engine="exact")
    print(f"global-argmax arm: {time.time() - t0:.1f}s", flush=True)

    a = open("/tmp/oracle_active.vocab", "rb").read()
    g = open("/tmp/oracle_global.vocab", "rb").read()
    if a == g:
        print("BYTE-EQUAL")
        return
    la, lg = a.split(b"\n"), g.split(b"\n")
    for i, (x, y) in enumerate(zip(la, lg)):
        if x != y:
            print(f"DIVERGED at vocab line {i}: active={x[:40]} "
                  f"global={y[:40]}")
            break


if __name__ == "__main__":
    main()
