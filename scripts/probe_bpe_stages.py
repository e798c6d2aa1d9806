# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""On-chip stage breakdown for the device BPE pipeline.

Times three loop programs over the SAME bench batch (botchan, width
128, the bench.py configuration) with the bench's carry-dependent
fori_loop methodology (pipeline.py::bench_loop_fn — immune to
enqueue-ack timing on the tunneled rig):

  norm      normalize_batch only
  norm+cp   + utf8_to_cp_batch
  full      + merge loop + emit tail (the shipping pipeline)

The deltas attribute per-batch milliseconds to each stage so perf work
aims at the real hot stage instead of the modeled one (the roofline in
scripts/roofline.py prices lookup classes only; this measures the glue
too). Emits one JSON line.
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
BPE_MODEL = os.path.join(REPO, "tests/fixtures/bpe_en_300.model")
WIDTH = 128


def main() -> None:
    import jax
    import jax.numpy as jnp

    model = sys.argv[1] if len(sys.argv) > 1 else BPE_MODEL
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer, pack_lines
    from sentencepiece_tpu.tpu.bpe_encode import utf8_to_cp_batch

    sp = SentencePieceProcessor()
    sp.load(model)
    tok = TpuTokenizer(sp)

    raw = open(CORPUS, "rb").read().split(b"\n")
    lines = [ln for ln in raw if ln and len(ln) <= WIDTH]
    rows = 1 << max(1, (len(lines) - 1)).bit_length()
    lines = (lines * ((rows // len(lines)) + 1))[:rows]
    arr, lens = pack_lines(lines, WIDTH)
    nbytes = int(lens.sum())
    w_enc = tok.pick_enc_width(arr, lens, WIDTH)
    core, tables = tok._pipeline_core(WIDTH, w_enc)

    # rebuild the stage prefixes exactly as _pipeline_core composes them
    t = tok.norm
    n_arcs = tuple(t.arcs) if t.arcs is not None else ()
    NA = len(n_arcs)
    u_tbl = (t.u_units,) if t.u_units is not None else ()
    NT = 5 + NA + len(u_tbl)
    from sentencepiece_tpu.tpu import normalize as tpu_normalize

    def norm_only(batch, lengths, *tabs):
        nt = tabs[:NT]
        norm_out, norm_len = tpu_normalize.normalize_batch(
            *nt[:5], batch, lengths,
            max_rule_len=t.max_rule_len, root_state=t.root_state,
            n_out=w_enc, ws_len=t.ws_len, max_rep_len=t.max_rep_len,
            add_dummy_prefix=t.add_dummy_prefix,
            remove_extra_whitespaces=t.remove_extra_whitespaces,
            escape_whitespaces=t.escape_whitespaces, suffix=t.suffix,
            arcs=nt[5:5 + NA] if NA else None,
            u_units=nt[5 + NA] if u_tbl else None,
            u_max_len=t.u_max_len, u_root_state=t.u_root_state)
        return norm_out, norm_len

    w_cp = min(WIDTH + 16, w_enc)

    def norm_cp(batch, lengths, *tabs):
        norm_out, norm_len = norm_only(batch, lengths, *tabs)
        cps, cp_len = utf8_to_cp_batch(
            norm_out, jnp.minimum(norm_len, w_enc), out_w=w_cp)
        return cps, cp_len

    def loopify(stage):
        @jax.jit
        def loop(batch, lengths, n, *tabs):
            def body(_, carry):
                b = batch.at[-1, 0].set(batch[-1, 0] ^ (carry & 1))
                o1, o2 = stage(b, lengths, *tabs)[:2]
                mix = jnp.sum(o2, dtype=jnp.int32) + jnp.sum(
                    o1[:, :1].astype(jnp.int32))
                return (mix & 0xFF).astype(jnp.uint8) ^ carry
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
        return lambda n: int(np.asarray(
            loop(arr, lens.astype(np.int32), jnp.int32(n), *tables)))

    def full_stage(batch, lengths, *tabs):
        ids, n_ids, overflow = core(batch, lengths, *tabs)
        return ids, n_ids

    out = {"rows": rows, "width": WIDTH, "w_enc": w_enc,
           "bytes": nbytes, "model": os.path.basename(model)}
    for name, stage in (("norm", norm_only), ("norm_cp", norm_cp),
                        ("full", full_stage)):
        run = loopify(stage)
        run(1)  # compile + warm
        run(1)
        n = 30
        t0 = time.monotonic()
        run(n)
        dt = time.monotonic() - t0
        out[name + "_ms"] = round(1e3 * dt / n, 2)
        print(f"[probe] {name}: {out[name + '_ms']} ms/batch",
              file=sys.stderr, flush=True)
    out["cp_delta_ms"] = round(out["norm_cp_ms"] - out["norm_ms"], 2)
    out["merge_delta_ms"] = round(out["full_ms"] - out["norm_cp_ms"], 2)
    out["full_mb_s"] = round(nbytes / (out["full_ms"] / 1e3) / 1e6, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
