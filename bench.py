#!/usr/bin/env python3
# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Driver benchmark: full tokenization pipeline throughput on one TPU chip.

Prints one JSON line per pipeline (the headline unigram metric LAST so a
single-line parser records it):
  {"metric": ..., "value": N, "unit": "bytes/s", "vs_baseline": N}

What is measured (both BASELINE.md encode metrics):
  * BPE:     charsmap normalize + utf8->codepoints + batched merge scan
  * unigram: charsmap normalize + lattice Viterbi encode
each over botchan.txt, batched and input-resident, best of three timing
windows. Correctness is gated (untimed): every device-path line must
reproduce the reference spm_encode token ids bit-for-bit (fixtures
tests/fixtures/{unigram,bpe}_en.ids.txt), and lines the device path
doesn't cover (longer than the packed width, or overflowing after
normalization) are checked through the host path.

Baseline anchor: the reference README's ~50k sentences/sec CPU figure
(README.md:27) at botchan's 64 B/line = ~3.2 MB/s.

Roofline framing: the pipeline is bound by TABLE LOOKUPS, which XLA
lowers to a per-element scalar loop on this TPU target (~7.2 ns per
gathered element — scripts/probe_gather.py); HBM bandwidth and the MXU
are >1000x away from binding. The measured figure sits within ~2x of
the sum of the program's gather element counts times that rate; the
remaining headroom is compare-reduce/matmul reformulations of the
lookups (docs/design.md rule 7). Throughput is per chip and the
pipeline is collective-free, so mesh data parallelism scales it
linearly.

Rig notes (tunneled single chip): device->host readbacks can stall
dispatches, and the relay session occasionally WEDGES outright (socket
established, remote never replies — observed 2026-08-17). Defenses:
  * the timed loops run before ANY readback and keep inputs resident;
  * the correctness gate compares ON DEVICE and reads back only a few
    scalars/masks per model instead of downloading every id;
  * the whole measurement runs in a child process under a supervisor
    that kills and relaunches it if it makes no progress (fresh
    processes get working relay sessions even while a wedged one hangs).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
UNIGRAM_MODEL = "/root/reference/python/test/test_model.model"
BPE_MODEL = os.path.join(REPO, "tests/fixtures/bpe_en_300.model")
WORD_MODEL = os.path.join(REPO, "tests/fixtures/word_en_300.model")
CHAR_MODEL = os.path.join(REPO, "tests/fixtures/char_en_300.model")
CORPUS = "/root/reference/data/botchan.txt"
GOLD_UNIGRAM = os.path.join(REPO, "tests/fixtures/unigram_en.ids.txt")
GOLD_BPE = os.path.join(REPO, "tests/fixtures/bpe_en.ids.txt")
GOLD_WORD = os.path.join(REPO, "tests/fixtures/word_en.ids.txt")
GOLD_CHAR = os.path.join(REPO, "tests/fixtures/char_en.ids.txt")
BASELINE_BYTES_PER_S = 50_000 * 64.0  # reference ~50k sent/s, 64 B avg line
WIDTH = 128

if not os.path.exists(UNIGRAM_MODEL):  # reference mount is rig-specific
    UNIGRAM_MODEL = os.path.join(REPO, "tests/fixtures/unigram_en_1k.model")
    GOLD_UNIGRAM = None

# Attempt 1 gets a longer leash: a cold compilation-cache run pays
# ~5 min of XLA compiles before any timing (the persistent cache only
# fills on compile COMPLETION, so killing mid-compile forfeits the work).
ATTEMPT_TIMEOUT_S = int(os.environ.get("SPM_BENCH_ATTEMPT_TIMEOUT", "600"))
FIRST_ATTEMPT_TIMEOUT_S = int(
    os.environ.get("SPM_BENCH_FIRST_ATTEMPT_TIMEOUT", "1800"))
ATTEMPTS = int(os.environ.get("SPM_BENCH_ATTEMPTS", "4"))


def _note(msg: str) -> None:
    """Progress to stderr (stdout carries only the JSON result lines)."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


ITERS = int(os.environ.get("SPM_BENCH_ITERS", "49"))
WINDOWS = int(os.environ.get("SPM_BENCH_WINDOWS", "3"))


def _run_to_scalar(loop, a, l, n):
    """Dispatch the n-iteration loop program and FORCE completion by
    reading the checksum back (on this rig async dispatch acks at
    enqueue, so wall-clocking a dispatch loop + block_until_ready can
    measure the enqueue rate, not the chip; a data readback is the only
    trustworthy completion point)."""
    t0 = time.time()
    c = int(np.asarray(loop(a, l, n)))
    return time.time() - t0, c


def _time_pipeline(loop, a, l, batch_bytes, iters=ITERS, windows=WINDOWS):
    """Per-batch device time from paired loop dispatches: the pipeline
    runs (1+iters) times and once inside single fori_loop programs; the
    difference isolates pure on-device per-iteration time, cancelling
    dispatch/readback/link overhead (which on the tunneled rig is both
    large and drifting). Best of N windows. The window size adapts to a
    first n=1 estimate so one program's queued runtime stays well under
    the rig's ~60 s worker watchdog."""
    best = None
    for _ in range(windows):
        dt1, c1 = _run_to_scalar(loop, a, l, 1)
        if best is None:
            iters = max(2, min(iters, int(20.0 / max(dt1, 0.05))))
            _note(f"  window size: {1 + iters} iters "
                  f"(n=1 took {dt1:.2f}s)")
        dtn, cn = _run_to_scalar(loop, a, l, 1 + iters)
        per_iter = max(dtn - dt1, 1e-9) / iters
        best = per_iter if best is None else min(best, per_iter)
    return batch_bytes / best


def _load_gold(path):
    return [list(map(int, ln.split())) for ln in
            open(path).read().splitlines()]


def _device_gate(fn, a, l, short_gold):
    """Bit-exactness check with ONE small readback.

    Dispatches the pipeline once more on the resident batch and compares
    ids/lengths against the packed gold on device; reads back only
    (bad_count, overflow_mask). Returns (n_bad_device, overflow_mask).
    Rows beyond the real batch (pack_lines pads the row count) carry
    glen -1 = don't-care."""
    import jax
    import jax.numpy as jnp

    ids, n_ids, overflow = fn(a, l)
    B = int(a.shape[0])
    out_cap = int(ids.shape[1])
    gold = np.full((B, out_cap), -1, np.int32)
    glen = np.full((B,), -1, np.int32)
    for i, g in enumerate(short_gold):
        glen[i] = len(g)
        gold[i, :len(g)] = g

    @jax.jit
    def compare(ids, n_ids, overflow, gold, glen):
        care = glen >= 0
        pos = jnp.arange(ids.shape[1], dtype=jnp.int32)[None, :]
        eq = jnp.where(pos < glen[:, None], ids == gold, True)
        row_ok = (n_ids == glen) & jnp.all(eq, axis=1)
        bad = care & ~overflow & ~row_ok
        return jnp.sum(bad, dtype=jnp.int32), overflow & care

    nbad, oflow = compare(ids, n_ids, overflow, jnp.asarray(gold),
                          jnp.asarray(glen))
    return int(nbad), np.asarray(oflow)


def child_main() -> None:
    import jax
    import jax.numpy as jnp
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer, pack_lines

    raw = open(CORPUS, "rb").read().split(b"\n")
    if raw and raw[-1] == b"":
        raw.pop()
    short_idx = [i for i, ln in enumerate(raw) if len(ln) <= WIDTH]
    short = [raw[i] for i in short_idx]
    arr, lens = pack_lines(short, WIDTH)
    batch_bytes = int(lens.sum())
    a, l = jnp.asarray(arr), jnp.asarray(lens)

    def run_model(name, model, gold_path, label):
        """Construct, compile, time, gate and EMIT one pipeline's
        metric line. Per-model so a wedge while compiling the second
        model cannot lose the first's already-measured result (the
        supervisor salvages every parsed line from a failed attempt;
        compile-cache entries persist per completed compile, so even
        killed attempts make incremental progress)."""
        _note(f"{name}: construct tokenizer")
        sp = SentencePieceProcessor(model)
        tok = TpuTokenizer(sp)
        # batch-adaptive encode width (host-side normalized-length
        # bound): the program the user's encode() would dispatch
        w_enc = tok.pick_enc_width(arr, lens, WIDTH)
        _note(f"{name}: encode width {w_enc} (cap {tok.enc_width(WIDTH)})")
        fn = tok._pipeline_fn(WIDTH, w_enc)
        loop = tok.bench_loop_fn(WIDTH, w_enc)
        _note(f"{name}: warm dispatch (compile if cold)")
        _run_to_scalar(loop, a, l, 1)
        _note(f"{name}: timed windows")
        value = _time_pipeline(loop, a, l, batch_bytes)
        _note(f"{name}: timed done ({value / 1e6:.2f} MB/s)")
        entry = {"metric": label, "value": round(value, 1),
                 "unit": "bytes/s",
                 "vs_baseline": round(value / BASELINE_BYTES_PER_S, 4)}
        if gold_path is not None:
            _note(f"{name}: device gate")
            gold = _load_gold(gold_path)
            short_gold = [gold[i] for i in short_idx]
            nbad, oflow = _device_gate(fn, a, l, short_gold)
            # host path covers what the device batch didn't: long lines
            # + normalization-overflow rows (pure CPU, no relay risk)
            _note(f"{name}: host-path gate (device bad={nbad}, "
                  f"overflow={int(oflow.sum())})")
            host_rows = [i for i in range(len(raw)) if len(raw[i]) > WIDTH]
            host_rows += [short_idx[j] for j in range(len(short_idx))
                          if oflow[j]]
            nbad_host = sum(
                1 for i in host_rows
                if sp.encode_as_ids(
                    raw[i].decode("utf-8", "surrogateescape")) != gold[i])
            if nbad or nbad_host:
                entry.update(value=0, vs_baseline=0.0,
                             error=(f"{nbad} device / {nbad_host} host "
                                    f"lines mismatch reference ids"))
        return entry

    # BPE first, then word/char (VERDICT r2 item 8: all four model
    # types carry a driver-visible device throughput), headline unigram
    # LAST (a single-line parser records the final line)
    bpe_entry = run_model(
        "bpe", BPE_MODEL, GOLD_BPE,
        "encode bytes/s/chip (normalize+bpe merge scan, botchan, "
        "bit-exact)")
    print(json.dumps(bpe_entry), flush=True)
    word_entry = run_model(
        "word", WORD_MODEL, GOLD_WORD,
        "encode bytes/s/chip (normalize+word span encode, botchan, "
        "bit-exact)")
    print(json.dumps(word_entry), flush=True)
    char_entry = run_model(
        "char", CHAR_MODEL, GOLD_CHAR,
        "encode bytes/s/chip (normalize+char span encode, botchan, "
        "bit-exact)")
    print(json.dumps(char_entry), flush=True)
    uni_entry = run_model(
        "unigram", UNIGRAM_MODEL, GOLD_UNIGRAM,
        "encode bytes/s/chip (normalize+unigram viterbi, botchan, "
        "bit-exact)")
    uni_entry["bpe_bytes_per_s"] = bpe_entry["value"]
    uni_entry["word_bytes_per_s"] = word_entry["value"]
    uni_entry["char_bytes_per_s"] = char_entry["value"]
    print(json.dumps(uni_entry), flush=True)


def _extra_targets() -> dict:
    """The two remaining BASELINE.md driver targets, measured host-side
    (no relay involvement): BPE-train merges/s (byte-exactness-gated vs
    the reference binary when present) and multi-process EM weak-scaling
    efficiency. Failure-tolerant: each runs in a subprocess under a
    timeout and is simply omitted on any error."""
    extras: dict = {}
    try:
        # generous timeout: bench_train rebuilds the reference binary on
        # demand when /tmp was wiped (scripts/build_reference.sh, ~4 min)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench_train.py")],
            capture_output=True, text=True, timeout=1500).stdout
        for ln in out.splitlines():
            try:
                d = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if d["metric"].startswith("bpe train"):
                extras["bpe_train_merges_per_s"] = d["value"]
                extras["bpe_train_byte_exact"] = d.get("exact")
                if d["vs_baseline"]:
                    extras["bpe_train_vs_ref_binary"] = d["vs_baseline"]
            elif d["metric"].startswith("unigram train"):
                extras["unigram_train_s"] = d["value"]
                extras["unigram_train_byte_exact"] = d.get("exact")
                if d["vs_baseline"]:
                    extras["unigram_train_ref_over_ours"] = d["vs_baseline"]
    except Exception as e:  # noqa: BLE001 - never risk the headline line
        _note(f"extra target bench_train failed: {e}")
    got_scaling = False
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench_scaling.py")],
            env={**os.environ, "SPM_BENCH_CHILD": "",
                 "SPM_SCALING_PROCESSES": "2"},
            capture_output=True, text=True, timeout=1500).stdout
        for ln in out.splitlines():
            try:
                d = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if "multiprocess" in d:
                extras["em_scaling_2proc_efficiency"] = (
                    d["multiprocess"]["efficiency_vs_1proc"])
                extras["em_scaling_note"] = (
                    "virtual-CPU-device harness; cross-device traffic is "
                    "one psum of the expected-count vector per step")
                got_scaling = True
    except Exception as e:  # noqa: BLE001
        _note(f"extra target bench_scaling failed: {e}")
    if not got_scaling:
        # live run timed out or crashed (virtual CPU devices share cores
        # with whatever else the host runs; the XLA CPU collective
        # rendezvous aborts at 40 s of skew): report the committed
        # measurement instead, marked as such
        try:
            d = json.load(open(os.path.join(REPO, "SCALING_r03.json")))
            extras["em_scaling_2proc_efficiency"] = (
                d["multiprocess"]["efficiency_vs_1proc"])
            extras["em_scaling_note"] = (
                "from committed SCALING_r03.json (live rerun unavailable "
                "in this bench window); real-corpus E-step, 2 real "
                "jax.distributed processes")
        except Exception as e:  # noqa: BLE001
            _note(f"scaling fallback failed: {e}")
    return extras


def _roofline() -> dict:
    """Modeled lookup-cost ceilings (scripts/roofline.py): counts the
    pipelines' gather/one-hot/matmul work units eagerly on the CPU
    backend and prices them at the measured rates of design.md rule 7.
    Returns {"unigram": ceiling_bytes_per_s, "bpe": ...} or {}."""
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/roofline.py")],
            capture_output=True, text=True, timeout=900).stdout
        for ln in out.splitlines():
            try:
                d = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if "unigram" in d and "bpe" in d:
                return {k: v["modeled_ceiling_bytes_per_s"]
                        for k, v in d.items()}
    except Exception as e:  # noqa: BLE001
        _note(f"roofline model failed: {e}")
    return {}


def _emit(lines: list) -> None:
    """Print result lines, folding the host-side BASELINE targets into
    the FINAL (headline) line and the modeled roofline denominator into
    every pipeline line (VERDICT r2 item 4: emit modeled_ceiling +
    achieved_pct so throughput regressions in the lookup paths are
    visible against the cost model, not just the baseline anchor)."""
    extras = _extra_targets()
    ceilings = _roofline()
    for i, ln in enumerate(lines):
        d = json.loads(ln)
        which = ("bpe" if "bpe" in d["metric"]
                 else "word" if "word span" in d["metric"]
                 else "char" if "char span" in d["metric"]
                 else "unigram")
        if ceilings.get(which):
            d["modeled_ceiling_bytes_per_s"] = ceilings[which]
            d["achieved_pct"] = round(
                100.0 * d["value"] / ceilings[which], 1)
            d["roofline_note"] = (
                "lookup-cost floor (gathers/one-hot/matmul at measured "
                "rates, scripts/roofline.py); elementwise glue unpriced")
        if i == len(lines) - 1:
            d.update(extras)
        print(json.dumps(d))


def main() -> None:
    if os.environ.get("SPM_BENCH_CHILD") == "1":
        child_main()
        return
    # Supervisor: run the measurement in a child; if the relay session
    # wedges (no output for the attempt window), kill THAT pid and retry
    # with a fresh process/session. Parsed metric lines from FAILED
    # attempts are salvaged — the child emits each model's line as soon
    # as it is gated, and completed XLA compiles persist in the cache,
    # so every attempt makes progress even when a later stage wedges.
    last_err = "no attempts ran"
    best: list = []
    for attempt in range(1, ATTEMPTS + 1):
        tmo = FIRST_ATTEMPT_TIMEOUT_S if attempt == 1 else ATTEMPT_TIMEOUT_S
        _note(f"attempt {attempt}/{ATTEMPTS} (timeout {tmo}s)")
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "SPM_BENCH_CHILD": "1"},
            stdout=subprocess.PIPE, stderr=sys.stderr, text=True)
        timed_out = False
        try:
            out, _ = p.communicate(timeout=tmo)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()  # salvage buffered stdout
            timed_out = True
        lines = []
        for ln in (out or "").splitlines():
            if not ln.strip():
                continue
            try:
                json.loads(ln)
                lines.append(ln)
            except json.JSONDecodeError:
                pass
        if len(lines) > len(best):
            best = lines
        if not timed_out and p.returncode == 0 and lines:
            _emit(lines)
            return
        last_err = (f"attempt {attempt} "
                    + ("wedged (killed)" if timed_out
                       else f"rc={p.returncode}")
                    + f"; salvaged {len(lines)} metric lines")
        _note(last_err)
    if best:
        _emit(best)
        return
    _emit([json.dumps({
        "metric": "encode bytes/s/chip (normalize+unigram viterbi, "
                  "botchan, bit-exact)",
        "value": 0, "unit": "bytes/s", "vs_baseline": 0.0,
        "error": last_err})])


if __name__ == "__main__":
    main()
