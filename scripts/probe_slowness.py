# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Localize where the unigram pipeline's on-chip time goes.

Loop-program timings (docs/design.md rule 6) for: a matmul calibration
(is the chip fast at ALL?), the trie-walk lattice populate alone, the
Viterbi scan alone (populate hoisted out of the loop), and the full
pipeline. Every program's total queued runtime is kept under ~40 s (the
rig's worker watchdog kills longer queues).

Run stages via argv so each process measures ONE thing and a crash
doesn't take the rest down: probe_slowness.py {matmul|populate|scan|full}
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timed_loop(loop_fn, ns, budget_s=40.0):
    """Time loop_fn(n) for growing n, via forced scalar readback; stop
    scaling when the projected next run would blow the watchdog budget."""
    per = None
    base = None
    for n in ns:
        if per is not None and per * n > budget_s:
            log(f"  (skip n={n}: projected {per*n:.0f}s > budget)")
            break
        t0 = time.time()
        int(np.asarray(loop_fn(n)))
        dt = time.time() - t0
        log(f"  n={n}: {dt:.2f}s")
        if n == 1:
            base = dt
        elif base is not None:
            per = (dt - base) / (n - 1)
            log(f"  per-iter: {per*1e3:.1f} ms")
    return per


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "matmul"
    import jax
    import jax.numpy as jnp

    if stage == "matmul":
        # 4096^2 f32 matmul = 137 GFLOP/iter; ~3-7 ms on a healthy v5e.
        x = jnp.ones((4096, 4096), jnp.float32)

        @jax.jit
        def mloop(x, n):
            def body(_, c):
                y = x.at[0, 0].set(c[0, 0])
                return y @ x * jnp.float32(1e-6)
            return jax.lax.fori_loop(0, n, body, x)

        def fn(n):
            return mloop(x, jnp.int32(n))[0, 0]
        log("matmul calibration")
        timed_loop(fn, [1, 2, 5, 17, 65])
        return

    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer, pack_lines
    from sentencepiece_tpu.tpu import encode as enc_mod

    sp = SentencePieceProcessor("/root/reference/python/test/test_model.model")
    tok = TpuTokenizer(sp)
    enc = enc_mod.UnigramBatchEncoder(sp)
    raw = open("/root/reference/data/botchan.txt", "rb").read().split(b"\n")
    short = [ln for ln in raw if len(ln) <= 128]
    arr, lens = pack_lines(short, 128)
    a, l = jnp.asarray(arr), jnp.asarray(lens)
    w_enc = tok.pick_enc_width(arr, lens, 128)
    log(f"batch {arr.shape} enc width {w_enc}")

    if stage == "full":
        loop = tok.bench_loop_fn(128, w_enc)

        def fn(n):
            return loop(a, l, n)
        log("full pipeline loop")
        timed_loop(fn, [1, 2, 5, 17])
        return

    if stage == "walk":
        # charsmap longest-match walk alone (the early-exit while_loop)
        from sentencepiece_tpu.tpu import normalize as tn
        t = tok.norm

        @jax.jit
        def wloop(batch, lengths, n, units):
            def body(_, carry):
                b = batch.at[-1, 0].set(batch[-1, 0] ^ (carry & 1))
                mlen, mval = tn._charsmap_longest(
                    units, b, lengths, max_rule_len=t.max_rule_len,
                    root_state=t.root_state)
                mix = jnp.sum(mlen + mval, dtype=jnp.int32)
                return (mix & 0xFF).astype(jnp.uint8) ^ carry
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))

        def fn(n):
            return wloop(a, l, jnp.int32(n), t.units)
        log("charsmap-walk loop")
        timed_loop(fn, [1, 2, 5, 17, 65])
        return

    if stage == "normalize":
        from sentencepiece_tpu.tpu import normalize as tn
        t = tok.norm

        @jax.jit
        def nloop(batch, lengths, n, *tabs):
            def body(_, carry):
                b = batch.at[-1, 0].set(batch[-1, 0] ^ (carry & 1))
                norm_out, norm_len = tn.normalize_batch(
                    *tabs, b, lengths,
                    max_rule_len=t.max_rule_len, root_state=t.root_state,
                    n_out=w_enc, ws_len=t.ws_len,
                    max_rep_len=t.max_rep_len,
                    add_dummy_prefix=t.add_dummy_prefix,
                    remove_extra_whitespaces=t.remove_extra_whitespaces,
                    escape_whitespaces=t.escape_whitespaces,
                    suffix=t.suffix, arcs=t.arcs)
                mix = jnp.sum(norm_len, dtype=jnp.int32)
                return (mix & 0xFF).astype(jnp.uint8) ^ carry
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))

        tabs = (t.units, t.esc_pool, t.v_attr, t.ws_arr, t.fffd_arr)

        def fn(n):
            return nloop(a, l, jnp.int32(n), *tabs)
        log("normalize-only loop (charsmap walk)")
        timed_loop(fn, [1, 2, 5, 17])
        return

    if stage == "encode":
        # the whole encode stage (populate + scan + backtrace + compact)
        @jax.jit
        def eloop(batch, lengths, n, units, table, unk):
            def body(_, carry):
                b = batch.at[-1, 0].set(batch[-1, 0] ^ (carry & 1))
                ids, n_ids = enc_mod.unigram_encode_batch(
                    units, table, b, lengths, unk,
                    max_depth=enc.max_depth, unk_id=enc.unk_id,
                    root_state=enc.root_state)
                mix = jnp.sum(n_ids, dtype=jnp.int32)
                return (mix & 0xFF).astype(jnp.uint8) ^ carry
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))

        def fn(n):
            return eloop(a, l, jnp.int32(n), enc.units,
                         enc.lat_score_table, enc.unk_score)
        log("encode-stage loop (populate+scan+backtrace+compact)")
        timed_loop(fn, [1, 2, 5, 17])
        return

    if stage == "smallbatch":
        # 1024 rows instead of 8192: per-iter time proportional to rows
        # = element-level serialization; constant = per-op overhead
        # (e.g. the worker interpreting HLO ops) — fix is fewer, bigger
        # ops (a Pallas megakernel), not different gathers.
        arr2, lens2 = pack_lines(short[:1000], 128)
        a2, l2 = jnp.asarray(arr2), jnp.asarray(lens2)
        log(f"small batch {arr2.shape}")
        loop = tok.bench_loop_fn(128)

        def fn(n):
            return loop(a2, l2, n)
        timed_loop(fn, [1, 2, 5, 17])
        return

    kw = dict(D=enc.max_depth, unk_id=enc.unk_id, root_state=enc.root_state)

    if stage == "populate":
        @jax.jit
        def ploop(batch, lengths, n, units, table, unk):
            def body(_, carry):
                b = batch.at[-1, 0].set(batch[-1, 0] ^ (carry & 1))
                sc_end, id_end = enc_mod._populate_lattice(
                    units, table, b, lengths, unk, **kw)
                mix = jnp.sum(id_end[:, :, 0], dtype=jnp.int32)
                return (mix & 0xFF).astype(jnp.uint8) ^ carry
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))

        def fn(n):
            return ploop(a, l, jnp.int32(n), enc.units,
                         enc.lat_score_table, enc.unk_score)
        log("populate-only loop (trie-walk gathers)")
        timed_loop(fn, [1, 2, 5, 17])
        return

    if stage == "scan":
        # populate ONCE outside the loop; iterate only the Viterbi scan
        @jax.jit
        def sloop(batch, lengths, n, units, table, unk):
            sc_end, _ = enc_mod._populate_lattice(
                units, table, batch, lengths, unk, **kw)
            D = kw["D"]
            B = batch.shape[0]

            def body(_, carry):
                sc = sc_end.at[-1, 1, 0].set(
                    sc_end[-1, 1, 0] + (carry & 1).astype(jnp.float32))

                def vit_step(win, sc_p):
                    cand = win + sc_p
                    rev = cand[:, ::-1]
                    am = jnp.argmax(rev, axis=1)
                    best_p = jnp.take_along_axis(
                        rev, am[:, None], axis=1)[:, 0]
                    new_win = jnp.concatenate(
                        [best_p[:, None], win[:, :D - 1]], axis=1)
                    return new_win, am.astype(jnp.int8)

                win0 = jnp.full((B, D), enc_mod.NEG_INF,
                                jnp.float32).at[:, 0].set(0.0)
                _, bp = jax.lax.scan(vit_step, win0,
                                     jnp.swapaxes(sc[:, 1:, :], 0, 1))
                mix = jnp.sum(bp.astype(jnp.int32))
                return (mix & 0xFF).astype(jnp.uint8) ^ carry
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))

        def fn(n):
            return sloop(a, l, jnp.int32(n), enc.units,
                         enc.lat_score_table, enc.unk_score)
        log("scan-only loop (Viterbi lax.scan)")
        timed_loop(fn, [1, 2, 5, 17])
        return

    raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
