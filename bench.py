#!/usr/bin/env python3
# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Driver benchmark: full tokenization pipeline throughput on one TPU chip.

Prints one JSON line per pipeline, the headline unigram metric LAST (a
single-line parser records the final line):
  {"metric": ..., "value": N, "unit": "bytes/s", "vs_baseline": N}

What is measured:
  * unigram: charsmap normalize + lattice Viterbi encode     (botchan EN)
  * BPE:     charsmap normalize + utf8->codepoints + merge   (botchan EN)
  * unigram JA: the same unigram pipeline over wagahai (CJK text: most
    rows take the dense lattice lanes the EN batch rarely exercises)
  * word/char: normalize + span encode                       (botchan EN)
each batched and input-resident, best of three timing windows.
Correctness is gated (untimed): every device-path line must reproduce
the reference spm_encode token ids bit-for-bit (fixtures
tests/fixtures/*.ids.txt); rows the device path doesn't cover (longer
than the packed width, or overflowing after normalization) are checked
through the host path.

Baseline anchor: the reference README's ~50k sentences/sec CPU figure
(README.md:27) at botchan's 64 B/line = ~3.2 MB/s.

Rig notes (tunneled single chip): the relay session STOCHASTICALLY
WEDGES — a dispatch or readback never returns while the socket stays
established (observed 2026-08-17, 2026-08-20 r03 driver run, 2026-08-20
09:13). A fresh process gets a working session even while the wedged one
hangs. Defenses, in order of importance:
  * a per-STAGE WATCHDOG inside the child: every device-touching stage
    arms a deadline; exceeding it logs the stage name and hard-exits so
    the supervisor can retry — a wedge costs one stage budget, not the
    whole window;
  * the supervisor streams the child's stdout, salvages every metric
    line the moment it is printed, and passes completed metrics to the
    next attempt so retries skip finished models;
  * an overall DEADLINE: the supervisor always emits whatever it has
    (worst case: an explicit error line) and exits 0 before the driver
    window can kill it silently;
  * the timed loops run as single fori_loop programs before any
    readback (async dispatch acks at enqueue on this rig, so only a
    data readback is a trustworthy completion point), and the
    correctness gate compares ON DEVICE, reading back only two scalars;
  * compiled programs persist in the jax compilation cache
    (tpu/pipeline.py), and bench.py reseeds that cache from
    scripts/cache_seed/ when /tmp was wiped, so driver-time attempts
    never pay a multi-minute cold compile.
"""

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(REPO, "tests/fixtures")
UNIGRAM_MODEL = "/root/reference/python/test/test_model.model"
JA_MODEL = "/root/reference/python/test/test_ja_model.model"
BPE_MODEL = os.path.join(FIX, "bpe_en_300.model")
WORD_MODEL = os.path.join(FIX, "word_en_300.model")
CHAR_MODEL = os.path.join(FIX, "char_en_300.model")
CORPUS = "/root/reference/data/botchan.txt"
CORPUS_JA = "/root/reference/data/wagahaiwa_nekodearu.txt"
BASELINE_BYTES_PER_S = 50_000 * 64.0  # reference ~50k sent/s, 64 B avg line
WIDTH = 128
WIDTH_JA = 512  # wagahai is long-prose: 512 B covers 83% of lines

if not os.path.exists(UNIGRAM_MODEL):  # reference mount is rig-specific
    UNIGRAM_MODEL = os.path.join(FIX, "unigram_en_1k.model")

# metric key -> (corpus, width, model path, gold fixture, metric string)
MODELS = {
    "unigram": (CORPUS, WIDTH, UNIGRAM_MODEL,
                os.path.join(FIX, "unigram_en.ids.txt"),
                "encode bytes/s/chip (normalize+unigram viterbi, botchan, "
                "bit-exact)"),
    "bpe": (CORPUS, WIDTH, BPE_MODEL, os.path.join(FIX, "bpe_en.ids.txt"),
            "encode bytes/s/chip (normalize+bpe merge scan, botchan, "
            "bit-exact)"),
    "unigram_ja": (CORPUS_JA, WIDTH_JA, JA_MODEL,
                   os.path.join(FIX, "unigram_ja.ids.txt"),
                   "encode bytes/s/chip (normalize+unigram viterbi, "
                   "wagahai JA, bit-exact)"),
    "bpe_ja": (CORPUS_JA, WIDTH_JA, os.path.join(FIX, "bpe_ja_900.model"),
               os.path.join(FIX, "bpe_ja.ids.txt"),
               "encode bytes/s/chip (normalize+bpe merge scan, "
               "wagahai JA, bit-exact)"),
    "word": (CORPUS, WIDTH, WORD_MODEL, os.path.join(FIX, "word_en.ids.txt"),
             "encode bytes/s/chip (normalize+word span encode, botchan, "
             "bit-exact)"),
    "char": (CORPUS, WIDTH, CHAR_MODEL, os.path.join(FIX, "char_en.ids.txt"),
             "encode bytes/s/chip (normalize+char span encode, botchan, "
             "bit-exact)"),
}
# child measures the headline FIRST (salvage priority); the supervisor
# emits in this order with the headline LAST
CHILD_ORDER = ["unigram", "bpe", "unigram_ja", "bpe_ja", "word", "char"]
EMIT_ORDER = ["bpe", "unigram_ja", "bpe_ja", "word", "char", "unigram"]

DEADLINE_S = int(os.environ.get("SPM_BENCH_DEADLINE", "1380"))
ATTEMPTS = int(os.environ.get("SPM_BENCH_ATTEMPTS", "6"))
ITERS = int(os.environ.get("SPM_BENCH_ITERS", "49"))
WINDOWS = int(os.environ.get("SPM_BENCH_WINDOWS", "3"))
CACHE_DIR = "/tmp/sentencepiece_tpu_jax_cache"
SEED_DIR = os.path.join(REPO, "scripts", "cache_seed")


def _note(msg: str) -> None:
    """Progress to stderr (stdout carries only the JSON result lines)."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def _seed_cache() -> None:
    """Reseed the persistent XLA compile cache from the committed seed
    (the bench's own programs, ~a dozen entries) when /tmp was wiped.
    A stale or mismatching seed entry is simply a cache miss."""
    if not os.path.isdir(SEED_DIR):
        return
    os.makedirs(CACHE_DIR, exist_ok=True)
    n = 0
    for f in os.listdir(SEED_DIR):
        dst = os.path.join(CACHE_DIR, f)
        if not os.path.exists(dst):
            import shutil

            shutil.copyfile(os.path.join(SEED_DIR, f), dst)
            n += 1
    if n:
        _note(f"seeded compile cache with {n} committed entries")


class Watchdog(threading.Thread):
    """Per-stage deadline enforcement inside the child. The main thread
    arms a (stage, budget) before every step that can wedge on the relay
    (a wedged dispatch/readback never returns, so only a SEPARATE thread
    can notice); on expiry the child logs the stage and hard-exits with
    code 3 for the supervisor to retry in a fresh process."""

    def __init__(self):
        super().__init__(daemon=True)
        self._lock = threading.Lock()
        self._stage = ""
        self._deadline = None
        self.start()

    def arm(self, stage: str, budget_s: float) -> None:
        with self._lock:
            self._stage = stage
            self._deadline = time.monotonic() + budget_s

    def disarm(self) -> None:
        with self._lock:
            self._deadline = None

    def run(self) -> None:
        while True:
            time.sleep(2)
            with self._lock:
                expired = (self._deadline is not None
                           and time.monotonic() > self._deadline)
                stage = self._stage
            if expired:
                _note(f"WATCHDOG: stage '{stage}' exceeded its budget — "
                      f"likely a wedged relay session; exiting for retry")
                os._exit(3)


def _run_to_scalar(loop, a, l, n):
    """Dispatch the n-iteration loop program and FORCE completion by
    reading the checksum back (on this rig async dispatch acks at
    enqueue, so wall-clocking a dispatch loop + block_until_ready can
    measure the enqueue rate, not the chip; a data readback is the only
    trustworthy completion point)."""
    t0 = time.time()
    c = int(np.asarray(loop(a, l, n)))
    return time.time() - t0, c


def _time_pipeline(wd, name, loop, a, l, batch_bytes,
                   iters=ITERS, windows=WINDOWS):
    """Per-batch device time from paired loop dispatches: the pipeline
    runs (1+iters) times and once inside single fori_loop programs; the
    difference isolates pure on-device per-iteration time, cancelling
    dispatch/readback/link overhead (which on the tunneled rig is both
    large and drifting). Best of N windows. The window size adapts to a
    first n=1 estimate so one program's queued runtime stays well under
    the rig's ~60 s worker watchdog."""
    best = None
    for _ in range(windows):
        wd.arm(f"{name}: timed window (n=1)", 90)
        dt1, c1 = _run_to_scalar(loop, a, l, 1)
        if best is None:
            iters = max(2, min(iters, int(20.0 / max(dt1, 0.05))))
            _note(f"  window size: {1 + iters} iters "
                  f"(n=1 took {dt1:.2f}s)")
        wd.arm(f"{name}: timed window (n={1 + iters})", 120 + 40 * dt1)
        dtn, cn = _run_to_scalar(loop, a, l, 1 + iters)
        per_iter = max(dtn - dt1, 1e-9) / iters
        best = per_iter if best is None else min(best, per_iter)
    wd.disarm()
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
        glen[i] = min(len(g), out_cap)
        gold[i, :glen[i]] = g[:out_cap]
        if len(g) > out_cap:  # cannot match: force the host path
            glen[i] = -1
    @jax.jit
    def compare(ids, n_ids, overflow, gold, glen):
        care = glen >= 0
        pos = jnp.arange(ids.shape[1], dtype=jnp.int32)[None, :]
        eq = jnp.where(pos < glen[:, None], ids == gold, True)
        row_ok = (n_ids == glen) & jnp.all(eq, axis=1)
        bad = care & ~overflow & ~row_ok
        return jnp.sum(bad, dtype=jnp.int32), (overflow | ~care) & (glen != -2)

    glen2 = np.where(glen == -1, -2, glen)  # -2: pad row, no host check
    for i, g in enumerate(short_gold):
        if glen[i] == -1:
            glen2[i] = -1  # truncated gold: host-check this row
    nbad, oflow = compare(ids, n_ids, overflow, jnp.asarray(gold),
                          jnp.asarray(glen2))
    return int(nbad), np.asarray(oflow)[:len(short_gold)]


def child_main() -> None:
    _seed_cache()
    import jax  # noqa: F401 - initialize before any timing
    import jax.numpy as jnp
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer, pack_lines

    wd = Watchdog()
    attempt = int(os.environ.get("SPM_BENCH_ATTEMPT", "1"))
    # cold-compile leash: the first attempt may compile programs the
    # persistent cache has never seen (multi-minute XLA compiles);
    # killing mid-compile forfeits the work, so budget generously once
    compile_budget = 900 if attempt == 1 else 300
    have = set(filter(None, os.environ.get("SPM_BENCH_HAVE", "").split(",")))

    def run_model(key) -> None:
        corpus, width, model, gold_path, label = MODELS[key]
        raw = open(corpus, "rb").read().split(b"\n")
        if raw and raw[-1] == b"":
            raw.pop()
        short_idx = [i for i, ln in enumerate(raw) if len(ln) <= width]
        short = [raw[i] for i in short_idx]
        arr, lens = pack_lines(short, width)
        batch_bytes = int(lens.sum())
        a, l = jnp.asarray(arr), jnp.asarray(lens)

        _note(f"{key}: construct tokenizer")
        wd.arm(f"{key}: construct", 120)
        sp = SentencePieceProcessor(model)
        tok = TpuTokenizer(sp)
        # batch-adaptive encode width (host-side normalized-length
        # bound): the program the user's encode() would dispatch
        w_enc = tok.pick_enc_width(arr, lens, width)
        _note(f"{key}: encode width {w_enc} (cap {tok.enc_width(width)})")
        fn = tok._pipeline_fn(width, w_enc)
        loop = tok.bench_loop_fn(width, w_enc)
        _note(f"{key}: warm dispatch (compile if cold, "
              f"budget {compile_budget}s)")
        wd.arm(f"{key}: warm dispatch", compile_budget)
        _run_to_scalar(loop, a, l, 1)
        _note(f"{key}: timed windows")
        value = _time_pipeline(wd, key, loop, a, l, batch_bytes)
        _note(f"{key}: timed done ({value / 1e6:.2f} MB/s)")
        entry = {"metric": label, "value": round(value, 1),
                 "unit": "bytes/s",
                 "vs_baseline": round(value / BASELINE_BYTES_PER_S, 4)}
        if gold_path is not None and os.path.exists(gold_path):
            _note(f"{key}: device gate")
            gold = _load_gold(gold_path)
            short_gold = [gold[i] for i in short_idx]
            wd.arm(f"{key}: device gate", 180 if attempt == 1 else 120)
            nbad, oflow = _device_gate(fn, a, l, short_gold)
            # host path covers what the device batch didn't: long lines
            # + normalization-overflow rows (pure CPU, no relay risk)
            _note(f"{key}: host-path gate (device bad={nbad}, "
                  f"overflow={int(oflow.sum())})")
            wd.arm(f"{key}: host gate", 600)
            host_rows = [i for i in range(len(raw)) if len(raw[i]) > width]
            host_rows += [short_idx[j] for j in range(len(short_idx))
                          if oflow[j]]
            nbad_host = sum(
                1 for i in host_rows
                if sp.encode_as_ids(
                    raw[i].decode("utf-8", "surrogateescape")) != gold[i])
            wd.disarm()
            if nbad or nbad_host:
                entry.update(value=0, vs_baseline=0.0,
                             error=(f"{nbad} device / {nbad_host} host "
                                    f"lines mismatch reference ids"))
        entry["_k"] = key
        print(json.dumps(entry), flush=True)

    for key in CHILD_ORDER:
        if key in have:
            continue
        if key == "unigram_ja" and not os.path.exists(JA_MODEL):
            _note("unigram_ja: reference JA model absent on this rig; "
                  "skipping")
            print(json.dumps({"_k": key, "_skip": True}), flush=True)
            continue
        run_model(key)


def _extra_targets(budget_s: float) -> dict:
    """The two remaining BASELINE.md driver targets, measured host-side
    (no relay involvement): BPE-train merges/s (byte-exactness-gated vs
    the reference binary when present) and multi-process EM scaling
    efficiency. Each runs in a subprocess under what is left of the
    bench deadline; when the live run cannot fit, the committed
    measurement is reported and marked as such."""
    extras: dict = {}
    t_end = time.monotonic() + budget_s
    tmo = max(60, min(900, t_end - time.monotonic() - 240))
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench_train.py")],
            capture_output=True, text=True, timeout=tmo).stdout
        for ln in out.splitlines():
            try:
                d = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if "DEVICE engine" in d["metric"]:
                # on-chip trainer lines (VERDICT r4 item 3) — labeled
                # separately from the host-engine lines
                if d["metric"].startswith("bpe train"):
                    extras["bpe_train_merges_per_s_device"] = d["value"]
                    extras["bpe_train_device_exact"] = d.get("exact")
                    if d.get("first_divergent_line") is not None:
                        extras["bpe_train_device_first_divergence"] = \
                            d["first_divergent_line"]
                        extras["bpe_train_device_piece_overlap_pct"] = \
                            d.get("piece_overlap_pct")
                    if d.get("vs_baseline"):
                        extras["bpe_train_device_vs_ref_binary"] = \
                            d["vs_baseline"]
                elif d["metric"].startswith("unigram train"):
                    extras["unigram_train_s_device"] = d["value"]
                    extras["unigram_train_device_exact"] = d.get("exact")
                    if d.get("vs_baseline"):
                        extras["unigram_train_device_ref_over_ours"] = \
                            d["vs_baseline"]
            elif d["metric"].startswith("bpe train"):
                extras["bpe_train_merges_per_s_host"] = d["value"]
                extras["bpe_train_merges_per_s"] = d["value"]
                extras["bpe_train_byte_exact"] = d.get("exact")
                if d["vs_baseline"]:
                    extras["bpe_train_vs_ref_binary"] = d["vs_baseline"]
            elif d["metric"].startswith("unigram train"):
                extras["unigram_train_s_host"] = d["value"]
                extras["unigram_train_s"] = d["value"]
                extras["unigram_train_byte_exact"] = d.get("exact")
                if d["vs_baseline"]:
                    extras["unigram_train_ref_over_ours"] = d["vs_baseline"]
    except Exception as e:  # noqa: BLE001 - never risk the headline line
        _note(f"extra target bench_train failed: {e}")
    if "bpe_train_merges_per_s" not in extras:
        try:  # fall back to the last committed full measurement
            for rn in ("BENCH_r03.json", "BENCH_r02.json"):
                d = json.load(open(os.path.join(REPO, rn))).get("parsed")
                if d and d.get("bpe_train_merges_per_s"):
                    extras["bpe_train_merges_per_s"] = (
                        d["bpe_train_merges_per_s"])
                    extras["bpe_train_byte_exact"] = d.get(
                        "bpe_train_byte_exact")
                    extras["bpe_train_note"] = (
                        f"from committed {rn} (live rerun did not fit "
                        f"the bench window)")
                    break
        except Exception as e:  # noqa: BLE001
            _note(f"bpe_train fallback failed: {e}")
    got_scaling = False
    tmo = max(60, min(900, t_end - time.monotonic() - 120))
    if tmo > 200:
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench_scaling.py")],
                env={**os.environ, "SPM_BENCH_CHILD": "",
                     "SPM_SCALING_PROCESSES": "2"},
                capture_output=True, text=True, timeout=tmo).stdout
            for ln in out.splitlines():
                try:
                    d = json.loads(ln)
                except json.JSONDecodeError:
                    continue
                if "multiprocess" in d:
                    extras["em_scaling_2proc_efficiency"] = (
                        d["multiprocess"]["efficiency_vs_1proc"])
                    extras["em_scaling_note"] = (
                        "live 2-process jax.distributed real-corpus "
                        "E-step")
                    got_scaling = True
        except Exception as e:  # noqa: BLE001
            _note(f"extra target bench_scaling failed: {e}")
    if not got_scaling:
        # live run did not fit or crashed (virtual CPU devices share
        # cores with whatever else the host runs): report the committed
        # measurement instead, marked as such
        try:
            for rn in ("SCALING_r04.json", "SCALING_r03.json"):
                p = os.path.join(REPO, rn)
                if not os.path.exists(p):
                    continue
                d = json.load(open(p))
                extras["em_scaling_2proc_efficiency"] = (
                    d["multiprocess"]["efficiency_vs_1proc"])
                extras["em_scaling_note"] = (
                    f"from committed {rn} (live rerun unavailable in "
                    f"this bench window); real-corpus E-step, 2 real "
                    f"jax.distributed processes")
                break
        except Exception as e:  # noqa: BLE001
            _note(f"scaling fallback failed: {e}")
    return extras


def _roofline(budget_s: float) -> dict:
    """Modeled lookup-cost ceilings (scripts/roofline.py): counts the
    pipelines' gather/one-hot/matmul work units eagerly on the CPU
    backend and prices them at the measured rates of design.md rule 7.
    Returns {"unigram": ceiling_bytes_per_s, "bpe": ...} or {}."""
    if budget_s < 120:
        return {}
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/roofline.py")],
            capture_output=True, text=True,
            timeout=min(600, budget_s)).stdout
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


def _emit(results: dict, deadline: float) -> None:
    """Print result lines in canonical order (headline LAST), folding
    the host-side BASELINE targets into the headline line and the
    modeled roofline denominator into every covered pipeline line."""
    extras = _extra_targets(max(0, deadline - time.monotonic()))
    ceilings = _roofline(max(0, deadline - time.monotonic()))
    keys = [k for k in EMIT_ORDER
            if k in results and not results[k].get("_skip")]
    for i, k in enumerate(keys):
        d = dict(results[k])
        d.pop("_k", None)
        which = "unigram" if k == "unigram_ja" else k
        if ceilings.get(which) and k != "unigram_ja":
            d["modeled_ceiling_bytes_per_s"] = ceilings[which]
            d["achieved_pct"] = round(
                100.0 * d["value"] / ceilings[which], 1)
            d["roofline_note"] = (
                "lookup-cost floor (gathers/one-hot/matmul at measured "
                "rates, scripts/roofline.py); elementwise glue unpriced")
        if i == len(keys) - 1:
            d.update(extras)
            for ok in keys[:-1]:
                d[f"{ok}_bytes_per_s"] = results[ok].get("value")
        print(json.dumps(d))


def _backend_alive(budget_s: int = 150) -> bool:
    """Probe whether the device backend initializes at all, in a
    SUBPROCESS with a hard timeout: when the relay process is dead
    (observed r5: jax.devices() blocks forever inside the PJRT client
    — no error, no timeout), every child attempt would burn its full
    window discovering the same thing."""
    try:
        r = subprocess.run(
            [sys.executable, "-u", "-c",
             "import jax; print(len(jax.devices()))"],
            capture_output=True, timeout=budget_s, text=True)
        return r.returncode == 0 and r.stdout.strip().isdigit()
    except subprocess.TimeoutExpired:
        return False
    except Exception:  # noqa: BLE001
        return False


def _emit_fallback_from_committed() -> bool:
    """Relay-dead salvage: re-emit the last committed round's parsed
    lane values, each clearly labeled as a fallback. Returns True if
    something was emitted."""
    for rn in ("BENCH_r04.json", "BENCH_r03.json", "BENCH_r02.json"):
        try:
            d = json.load(open(os.path.join(REPO, rn))).get("parsed")
        except Exception:  # noqa: BLE001
            continue
        if not d or not d.get("value"):
            continue
        out = dict(d)
        out["note"] = (
            f"RELAY DEAD: device backend init hung in this bench "
            f"window; values replayed from committed {rn} (measured on "
            f"this rig in an earlier round), NOT a fresh measurement")
        print(json.dumps(out), flush=True)
        return True
    return False


def main() -> None:
    if os.environ.get("SPM_BENCH_CHILD") == "1":
        child_main()
        return
    _seed_cache()
    deadline = time.monotonic() + DEADLINE_S
    results: dict = {}
    want = [k for k in CHILD_ORDER]
    attempt = 0
    if not _backend_alive():
        _note("backend init probe hung — relay looks dead; retrying "
              "once after 60s")
        time.sleep(60)
        if not _backend_alive():
            _note("relay still dead: emitting committed-round fallback")
            if _emit_fallback_from_committed():
                return
            attempt = ATTEMPTS  # fall through to the error line
    while attempt < ATTEMPTS:
        missing = [k for k in want if k not in results]
        if not missing:
            break
        remaining = deadline - time.monotonic()
        if remaining < 120:
            _note(f"deadline: emitting {len(results)} salvaged lines")
            break
        attempt += 1
        tmo = min(remaining - 60, 1200 if attempt == 1 else 480)
        _note(f"attempt {attempt}/{ATTEMPTS} (timeout {int(tmo)}s, "
              f"missing: {','.join(missing)})")
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "SPM_BENCH_CHILD": "1",
                 "SPM_BENCH_ATTEMPT": str(attempt),
                 "SPM_BENCH_HAVE": ",".join(results)},
            stdout=subprocess.PIPE, stderr=sys.stderr, text=True)

        def read_lines():
            for ln in p.stdout:
                ln = ln.strip()
                if not ln:
                    continue
                try:
                    d = json.loads(ln)
                except json.JSONDecodeError:
                    continue
                if d.get("_k"):
                    results[d["_k"]] = d
                    _note(f"  salvaged: {d['_k']}")

        t = threading.Thread(target=read_lines, daemon=True)
        t.start()
        try:
            p.wait(timeout=tmo)
        except subprocess.TimeoutExpired:
            p.kill()
        t.join(timeout=10)
        if p.returncode == 0:
            continue  # loop re-checks what is still missing
        _note(f"attempt {attempt} exited rc={p.returncode}")
    if any(not results[k].get("_skip") for k in results):
        _emit(results, deadline)
        return
    print(json.dumps({
        "metric": "encode bytes/s/chip (normalize+unigram viterbi, "
                  "botchan, bit-exact)",
        "value": 0, "unit": "bytes/s", "vs_baseline": 0.0,
        "error": f"no metric line survived {ATTEMPTS} attempts / "
                 f"{DEADLINE_S}s (wedged relay sessions?)"}))


if __name__ == "__main__":
    main()
