# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""A/B the MXU-gather parameter space at the pipeline's exact shapes.

Loop-program timings (docs/design.md rule 6) for the table lookups the
unigram pipeline actually performs, across d2 / col_bits / serial
variants — so retuning after a kernel rewrite costs one script run:

  vocab-walk : paired vocab trie (4608x2), 1M lanes, d2 in {16,32,64},
               col_bits (32,32) vs (32,16), vs the serial row gather
  charsmap   : paired 44k trie, 1M lanes, serial vs MXU d2 in {32,64}
  score      : f32[1000] table, B*N*D lanes, d2 in {8,16,32}

Run one case per process (argv: vocab|charsmap|score) so a wedge
doesn't take the rest down.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timed(fn, label):
    t0 = time.time()
    int(np.asarray(fn(1)))
    warm = time.time() - t0
    t0 = time.time()
    int(np.asarray(fn(2)))
    d2v = time.time() - t0
    t0 = time.time()
    int(np.asarray(fn(8)))
    d8v = time.time() - t0
    per = (d8v - d2v) / 6
    log(f"{label}: {per*1e3:8.2f} ms/iter (warm {warm:.1f}s)")


def main():
    case = sys.argv[1] if len(sys.argv) > 1 else "vocab"
    import jax
    import jax.numpy as jnp
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu import trie

    sp = SentencePieceProcessor("/root/reference/python/test/test_model.model")
    L = 8192 * 128
    rng = np.random.default_rng(0)

    def mk(table, idx0, form, **kw):
        @jax.jit
        def loop(table, idx, n):
            def body(_, carry):
                i = idx.at[0].set(idx[0] ^ (carry & 1))
                if form == "serial":
                    v = trie._gather(table, i.astype(jnp.uint32))
                else:
                    v = trie.gather_mxu(table, i, **kw)
                if v.ndim > 1:
                    v = v[..., 0]
                return (jnp.sum(v.astype(jnp.int32)) & 0xFF).astype(
                    jnp.int32) ^ carry
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        def fn(n):
            return loop(table, idx0, jnp.int32(n))
        return fn

    if case == "vocab":
        units = jnp.asarray(trie.build_paired(sp.model.trie.units))
        U = int(units.shape[0])
        idx0 = jnp.asarray(rng.integers(0, U, L).astype(np.int32))
        timed(mk(units, idx0, "serial"), "vocab serial row")
        for d2 in (16, 32, 64):
            for cb in ((32, 32), (32, 16)):
                timed(mk(units, idx0, "mxu", d2=d2, col_bits=cb),
                      f"vocab mxu d2={d2} col_bits={cb}")
        return

    if case == "charsmap":
        from sentencepiece_tpu.tpu.normalize import NormalizerTables
        t = NormalizerTables(sp.model_proto.normalizer_spec)
        U = int(t.units.shape[0])
        idx0 = jnp.asarray(rng.integers(0, U, L).astype(np.int32))
        timed(mk(t.units, idx0, "serial"), f"charsmap({U}) serial row")
        for d2 in (32, 64, 128):
            timed(mk(t.units, idx0, "mxu", d2=d2, col_bits=(32, 16)),
                  f"charsmap mxu d2={d2}")
        return

    if case == "score":
        scores = jnp.asarray(
            rng.standard_normal(1000).astype(np.float32)).view(jnp.uint32)
        LD = 8192 * 129 * 15
        idx0 = jnp.asarray(rng.integers(0, 1000, LD).astype(np.int32))
        timed(mk(scores, idx0, "serial"), "score serial")
        for d2 in (8, 16, 32):
            timed(mk(scores, idx0, "mxu", d2=d2),
                  f"score mxu d2={d2}")
        return

    raise SystemExit(f"unknown case {case}")


if __name__ == "__main__":
    main()
