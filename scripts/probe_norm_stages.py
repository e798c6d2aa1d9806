# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""On-chip stage breakdown for the device normalizer.

Times loop programs (bench methodology) over the bench batch for the
normalizer's internal stages:

  walk     _charsmap_longest (trie walk) + _utf8_class
  chain    + the chunk-chain branch (scan or fast, whichever the batch
             takes — also reports which one)
  full     normalize_batch

Emits one JSON line with the deltas.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
CORPUS = "/root/reference/data/botchan.txt"
MODEL = os.path.join(REPO, "tests/fixtures/bpe_en_300.model")
WIDTH = 128


def main() -> None:
    import jax
    import jax.numpy as jnp

    model = sys.argv[1] if len(sys.argv) > 1 else MODEL
    corpus = sys.argv[2] if len(sys.argv) > 2 else CORPUS
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer, pack_lines
    from sentencepiece_tpu.tpu import normalize as tn

    sp = SentencePieceProcessor()
    sp.load(model)
    tok = TpuTokenizer(sp)
    t = tok.norm

    raw = open(corpus, "rb").read().split(b"\n")
    lines = [ln for ln in raw if ln and len(ln) <= WIDTH]
    rows = 1 << max(1, (len(lines) - 1)).bit_length()
    lines = (lines * ((rows // len(lines)) + 1))[:rows]
    arr, lens = pack_lines(lines, WIDTH)
    nbytes = int(lens.sum())
    w_enc = tok.pick_enc_width(arr, lens, WIDTH)

    n_arcs = tuple(t.arcs) if t.arcs is not None else ()
    u_tbl = (t.u_units,) if t.u_units is not None else ()
    tables = (t.units, t.esc_pool, t.v_attr, t.ws_arr, t.fffd_arr) \
        + n_arcs + u_tbl
    NA = len(n_arcs)
    vbits = max(8, int(t.esc_pool.shape[0]).bit_length())

    def walk(batch, lengths, *tabs):
        mlen, mval = tn._charsmap_longest(
            tabs[0], batch, lengths, max_rule_len=t.max_rule_len,
            root_state=t.root_state, arcs=tabs[5:5 + NA] or None,
            value_bits=vbits)
        cl, vu = tn._utf8_class(batch, lengths)
        return mlen + cl, mval + vu

    def full(batch, lengths, *tabs):
        return tn.normalize_batch(
            *tabs[:5], batch, lengths, max_rule_len=t.max_rule_len,
            root_state=t.root_state, n_out=w_enc, ws_len=t.ws_len,
            max_rep_len=t.max_rep_len,
            add_dummy_prefix=t.add_dummy_prefix,
            remove_extra_whitespaces=t.remove_extra_whitespaces,
            escape_whitespaces=t.escape_whitespaces, suffix=t.suffix,
            arcs=tabs[5:5 + NA] if NA else None,
            u_units=tabs[5 + NA] if u_tbl else None,
            u_max_len=t.u_max_len, u_root_state=t.u_root_state)

    # which branch does this batch take?
    mlen, mval = tn._charsmap_longest(
        t.units, jnp.asarray(arr), jnp.asarray(lens.astype(np.int32)),
        max_rule_len=t.max_rule_len, root_state=t.root_state,
        arcs=n_arcs or None, value_bits=vbits)
    matched_rows = int(np.asarray(jnp.sum(jnp.any(mlen > 0, axis=1))))

    def loopify(stage):
        @jax.jit
        def loop(batch, lengths, n, *tabs):
            def body(_, carry):
                b = batch.at[-1, 0].set(batch[-1, 0] ^ (carry & 1))
                o1, o2 = stage(b, lengths, *tabs)[:2]
                mix = (jnp.sum(o2.reshape(o2.shape[0], -1)[:, 0]
                               .astype(jnp.int32))
                       + jnp.sum(o1.reshape(o1.shape[0], -1)[:, 0]
                                 .astype(jnp.int32)))
                return (mix & 0xFF).astype(jnp.uint8) ^ carry
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
        return lambda n: int(np.asarray(
            loop(arr, lens.astype(np.int32), jnp.int32(n), *tables)))

    out = {"rows": rows, "width": WIDTH, "w_enc": w_enc, "bytes": nbytes,
           "matched_rows": matched_rows,
           "corpus": os.path.basename(corpus)}
    for name, stage in (("walk", walk), ("full", full)):
        run = loopify(stage)
        run(1)
        run(1)
        n = 30
        t0 = time.monotonic()
        run(n)
        dt = time.monotonic() - t0
        out[name + "_ms"] = round(1e3 * dt / n, 2)
        print(f"[probe] {name}: {out[name + '_ms']} ms/batch",
              file=sys.stderr, flush=True)
    out["rest_ms"] = round(out["full_ms"] - out["walk_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
