# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""BASELINE config 5, run for real: 32k unigram + 32k BPE trained to
completion on the sharded multilingual corpus (botchan EN + wagahai JA
+ generated Latin/CJK mix), device engines on the mesh.

Emits one JSON object (commit as CONFIG5.json) with wall time and the
trainer's per-phase breakdown for each model, plus sanity stats
(piece counts, encode round-trips on samples from each language).

Backend: runs on whatever jax backend is attached (the real chip under
axon; force CPU with SPM_CONFIG5_CPU=1 — the CPU-mesh run of the BPE
side takes hours and exists only for debugging at smaller vocabs via
SPM_CONFIG5_VOCAB).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

VOCAB = int(os.environ.get("SPM_CONFIG5_VOCAB", "32000"))
MAX_SENT = int(os.environ.get("SPM_CONFIG5_MAX_SENT", "512"))
CORPUS = os.environ.get("SPM_CONFIG5_CORPUS", "/tmp/spm_multilingual.txt")
OUT = os.environ.get("SPM_CONFIG5_OUT", os.path.join(REPO, "CONFIG5.json"))


def _run_reference(model_type: str) -> dict:
    """Time the reference spm_train binary on the IDENTICAL corpus and
    flags (bpe_model_trainer.cc:186-326 / unigram_model_trainer.cc:
    539-603) — the wall the device engine has to beat, recorded in the
    same file (VERDICT r4 item 1/4)."""
    import subprocess
    import time

    binary = os.environ.get("SPM_REF_TRAIN", "/tmp/refbuild2/src/spm_train")
    if not os.path.exists(binary):
        return {"error": f"missing {binary} (run scripts/build_reference.sh)"}
    prefix = f"/tmp/config5_ref_{model_type}_{VOCAB}"
    t0 = time.time()
    try:
        subprocess.run(
            [binary, f"--input={CORPUS}", f"--model_type={model_type}",
             f"--vocab_size={VOCAB}", "--hard_vocab_limit=false",
             f"--max_sentence_length={MAX_SENT}", "--minloglevel=2",
             f"--model_prefix={prefix}"], check=True,
            capture_output=True)
    except Exception as e:  # noqa: BLE001 - never lose the device entry
        return {"error": f"{type(e).__name__}: {e}",
                "wall_s": round(time.time() - t0, 1)}
    return {"wall_s": round(time.time() - t0, 1), "prefix": prefix}


def _vocab_divergence(ours_prefix: str, ref_prefix: str) -> dict:
    """Artifact comparison vs the reference 32k vocab: line overlap,
    first divergent line index, and (piece-set) Jaccard overlap. The
    sparse device engine's only documented deviation is the
    active-set-cutoff tie order (docs/conformance.md §5) — this
    quantifies it at full scale instead of asserting it."""
    try:
        ours = open(ours_prefix + ".vocab", encoding="utf-8",
                    errors="surrogateescape").read().splitlines()
        ref = open(ref_prefix + ".vocab", encoding="utf-8",
                   errors="surrogateescape").read().splitlines()
    except OSError as e:
        return {"error": str(e)}
    first_div = next((i for i, (a, b) in enumerate(zip(ours, ref))
                      if a != b), min(len(ours), len(ref))
                     if len(ours) != len(ref) else -1)
    set_o = {l.split("\t")[0] for l in ours}
    set_r = {l.split("\t")[0] for l in ref}
    inter = len(set_o & set_r)
    return {
        "lines_ours": len(ours), "lines_ref": len(ref),
        "first_divergent_line": first_div,
        "identical_lines": sum(a == b for a, b in zip(ours, ref)),
        "piece_overlap": inter,
        "piece_jaccard": round(inter / max(len(set_o | set_r), 1), 6),
    }


def main() -> None:
    if os.environ.get("SPM_CONFIG5_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from make_multilingual import build
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.train import facade
    from sentencepiece_tpu.utils import profiling

    build(CORPUS)
    result = {"corpus": CORPUS,
              "corpus_bytes": os.path.getsize(CORPUS),
              "vocab_size": VOCAB, "max_sentence_length": MAX_SENT}

    samples = ["I have a pen and a book.", "吾輩は猫である。名前はまだ無い。",
               "mixed latin と 漢字 words"]

    models = tuple(os.environ.get("SPM_CONFIG5_MODELS",
                                  "bpe,unigram").split(","))
    # two runs per model by default: the first pays XLA compiles (the
    # persistent compile cache makes them one-time per shape —
    # utils/compile_cache.py), the second is the production wall. Both
    # are recorded; the headline wall_s is the WARM one, wall_cold_s
    # keeps the compile-included number honest.
    n_runs = int(os.environ.get("SPM_CONFIG5_RUNS", "2"))
    for model_type in models:
        prefix = f"/tmp/config5_{model_type}_{VOCAB}"
        flags = (f"--input={CORPUS} --model_type={model_type} "
                 f"--vocab_size={VOCAB} --hard_vocab_limit=false "
                 f"--max_sentence_length={MAX_SENT} --minloglevel=1 "
                 f"--model_prefix={prefix}")
        if model_type == "bpe":
            os.environ["SPM_BPE_TRAIN_KERNEL"] = "sparse"
        t0 = time.time()
        try:
            walls = []
            for _run in range(max(n_runs, 1)):
                profiling._totals.clear()
                t0 = time.time()
                facade.train(flags, engine="device")
                walls.append(time.time() - t0)
            wall = walls[-1]
            sp = SentencePieceProcessor(prefix + ".model")
            n_pieces = len(sp)
            roundtrip = all(
                sp.decode_ids(sp.encode_as_ids(s)) == s for s in samples)
            entry = {
                "wall_s": round(wall, 1),
                "pieces": n_pieces,
                "roundtrip_ok": roundtrip,
                "phases_s": {k: round(v, 2)
                             for k, v in sorted(profiling._totals.items())},
            }
            if len(walls) > 1:
                entry["wall_cold_s"] = round(walls[0], 1)
                entry["note"] = ("wall_s is the warm-compile-cache run; "
                                 "wall_cold_s includes one-time XLA "
                                 "compiles")
        except Exception as e:  # noqa: BLE001 - record, keep going
            entry = {"error": f"{type(e).__name__}: {e}",
                     "wall_s": round(time.time() - t0, 1)}
        finally:
            os.environ.pop("SPM_BPE_TRAIN_KERNEL", None)
        if os.environ.get("SPM_CONFIG5_NO_REF") != "1":
            ref = _run_reference(model_type)
            entry["reference_binary"] = ref
            if "prefix" in ref and "error" not in entry:
                entry["vs_reference_artifact"] = _vocab_divergence(
                    prefix, ref["prefix"])
                entry["device_vs_ref_wall"] = round(
                    entry["wall_s"] / max(ref["wall_s"], 1e-9), 3)
            # the HOST engine at the same scale: wall + byte-exactness
            # vs the reference artifact (measured r5: unigram 32k is
            # BYTE-IDENTICAL on the multilingual corpus)
            if "prefix" in ref:
                import time as _t
                hp = f"/tmp/config5_host_{model_type}_{VOCAB}"
                th = _t.time()
                try:
                    facade.train(flags.replace(
                        f"--model_prefix={prefix}",
                        f"--model_prefix={hp}"))
                    hw = round(_t.time() - th, 1)
                    ident = (open(hp + ".vocab", "rb").read()
                             == open(ref["prefix"] + ".vocab",
                                     "rb").read())
                    entry["host_engine"] = {
                        "wall_s": hw,
                        "byte_identical_to_reference": bool(ident),
                        "vs_ref_wall": round(
                            hw / max(ref["wall_s"], 1e-9), 3)}
                except Exception as e:  # noqa: BLE001
                    entry["host_engine"] = {
                        "error": f"{type(e).__name__}: {e}"}
        result[model_type] = entry
        print(json.dumps({model_type: entry}), file=sys.stderr, flush=True)

    import jax

    result["backend"] = jax.devices()[0].platform
    result["n_devices"] = len(jax.devices())
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
