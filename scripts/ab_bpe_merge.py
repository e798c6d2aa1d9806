# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""A/B benchmark: linked-list/one-hot-matmul BPE merge kernel
(bpe_encode_batch_parallel) vs the propagate-scan kernel
(bpe_encode_batch_scan), on the real chip, through the FULL pipeline
(the bench.py program), plus a stage breakdown (normalize only /
normalize+utf8->cp) so the merge loop's own cost is isolated.

Methodology: docs/design.md rule 6 — each arm is a fori_loop
measurement program timed via paired N=1 / N=1+k dispatches with a
scalar readback; arms alternate per window so link drift hits both.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
CORPUS = "/root/reference/data/botchan.txt"
MODEL = os.path.join(REPO, "tests/fixtures/bpe_en_300.model")
ITERS = int(os.environ.get("AB_ITERS", "24"))
WINDOWS = int(os.environ.get("AB_WINDOWS", "3"))
WIDTH = 128


def main() -> None:
    import jax
    import jax.numpy as jnp
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu import normalize as tpu_normalize
    from sentencepiece_tpu.tpu.bpe_encode import utf8_to_cp_batch
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer, pack_lines

    raw = open(CORPUS, "rb").read().split(b"\n")
    lines = [ln for ln in raw if len(ln) <= WIDTH]
    arr, lens = pack_lines(lines, WIDTH)
    nbytes = int(lens.sum())
    a, l = jnp.asarray(arr), jnp.asarray(lens)

    sp = SentencePieceProcessor(MODEL)
    tok = TpuTokenizer(sp)
    w_enc = tok.pick_enc_width(arr, lens, WIDTH)
    print(f"rows={arr.shape[0]} width={WIDTH} w_enc={w_enc} bytes={nbytes}",
          flush=True)

    t = tok.norm
    n_arcs = tuple(t.arcs) if t.arcs is not None else ()
    norm_tables = (t.units, t.esc_pool, t.v_attr, t.ws_arr,
                   t.fffd_arr) + n_arcs
    w_cp = min(WIDTH + 16, w_enc)

    def norm_core(batch, lengths, *nt):
        norm_out, norm_len = tpu_normalize.normalize_batch(
            *nt[:5], batch, lengths,
            max_rule_len=t.max_rule_len, root_state=t.root_state,
            n_out=w_enc, ws_len=t.ws_len, max_rep_len=t.max_rep_len,
            add_dummy_prefix=t.add_dummy_prefix,
            remove_extra_whitespaces=t.remove_extra_whitespaces,
            escape_whitespaces=t.escape_whitespaces, suffix=t.suffix,
            arcs=nt[5:] if len(nt) > 5 else None)
        return norm_out, jnp.minimum(norm_len, w_enc)

    def make_stage_loop(stage):
        @jax.jit
        def loop(batch, lengths, n, *tabs):
            def body(_, carry):
                b = batch.at[-1, 0].set(batch[-1, 0] ^ (carry & 1))
                if stage == "norm":
                    norm_out, enc_len = norm_core(b, lengths, *tabs)
                    mix = jnp.sum(enc_len, dtype=jnp.int32)
                else:  # norm + utf8->cp
                    norm_out, enc_len = norm_core(b, lengths, *tabs)
                    norm_out, enc_len = jax.lax.optimization_barrier(
                        (norm_out, enc_len))
                    cps, cp_len = utf8_to_cp_batch(norm_out, enc_len,
                                                   out_w=w_cp)
                    mix = jnp.sum(cp_len, dtype=jnp.int32)
                return (mix & 0xFF).astype(jnp.uint8) ^ carry
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))

        def fn(n):
            return loop(a, l, jnp.int32(n), *norm_tables)
        return fn

    def make_pipeline_loop(kernel):
        os.environ["SPM_BPE_KERNEL"] = kernel
        loop = tok.bench_loop_fn(WIDTH, w_enc)
        return lambda n: loop(a, l, n)

    arms = {
        "norm     ": make_stage_loop("norm"),
        "norm+utf8": make_stage_loop("utf8"),
        "parallel ": make_pipeline_loop("parallel"),
        "scan     ": make_pipeline_loop("scan"),
    }

    def run_to_scalar(fn, n):
        t0 = time.time()
        int(np.asarray(fn(n)))
        return time.time() - t0

    for name, fn in arms.items():
        t0 = time.time()
        run_to_scalar(fn, 1)
        print(f"warm {name} ({time.time() - t0:.1f}s)", flush=True)

    best = {k: None for k in arms}
    for w in range(WINDOWS):
        for name, fn in arms.items():
            d1 = run_to_scalar(fn, 1)
            dn = run_to_scalar(fn, 1 + ITERS)
            per = max(dn - d1, 1e-9) / ITERS
            b = best[name]
            best[name] = per if b is None else min(b, per)
            print(f"w{w} {name}: {per * 1e3:8.2f} ms/iter", flush=True)

    print()
    for name, v in best.items():
        print(f"{name} best {v * 1e3:8.2f} ms/batch  "
              f"{nbytes / v / 1e6:7.2f} MB/s", flush=True)


if __name__ == "__main__":
    main()
