# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Regenerate the trainer conformance goldens from the REFERENCE binaries.

Reads tests/fixtures/train/matrix.json (the flag matrix that
tests/test_train_conformance.py sweeps), runs the reference ``spm_train``
for every case, and copies the resulting ``.vocab`` into
tests/fixtures/train/<name>.vocab. Also regenerates the encode goldens
(tests/fixtures/{unigram,bpe}_{en,ja}.ids.txt and the nbest fixture) with
the reference ``spm_encode``.

The reference build must share our normalization data; build it as
documented in .claude/skills/verify/SKILL.md:

    cp -r /root/reference /tmp/refsrc && chmod -R u+w /tmp/refsrc
    python scripts/gen_normalization_rule_h.py \
        /tmp/refsrc/src/normalization_rule.h
    mkdir -p /tmp/refbuild2 && cd /tmp/refbuild2
    cmake /tmp/refsrc -DCMAKE_BUILD_TYPE=Release -DSPM_ENABLE_SHARED=OFF
    make -j8 spm_train spm_encode

Override binary locations with SPM_REF_TRAIN / SPM_REF_ENCODE.
"""

import json
import os
import pathlib
import shutil
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
FIX = REPO / "tests" / "fixtures"
TRAIN_FIX = FIX / "train"
REF_TRAIN = os.environ.get("SPM_REF_TRAIN", "/tmp/refbuild2/src/spm_train")
REF_ENCODE = os.environ.get("SPM_REF_ENCODE", "/tmp/refbuild2/src/spm_encode")

# encode goldens: (ids fixture, model, corpus, extra spm_encode args)
ENCODE_CASES = [
    ("unigram_en.ids.txt", "/root/reference/python/test/test_model.model",
     "/root/reference/data/botchan.txt", []),
    ("unigram_ja.ids.txt", "/root/reference/python/test/test_ja_model.model",
     "/root/reference/data/wagahaiwa_nekodearu.txt", []),
    ("bpe_en.ids.txt", str(FIX / "bpe_en_300.model"),
     "/root/reference/data/botchan.txt", []),
    ("bpe_ja.ids.txt", str(FIX / "bpe_ja_900.model"),
     "/root/reference/data/wagahaiwa_nekodearu.txt", []),
]


def run_train(case: dict, outdir: pathlib.Path) -> pathlib.Path:
    prefix = outdir / case["name"]
    cmd = [REF_TRAIN, f"--input={TRAIN_FIX / case['corpus']}",
           f"--model_prefix={prefix}", "--minloglevel=2",
           *case["flags"].split()]
    subprocess.run(cmd, check=True)
    return prefix


def main() -> None:
    if not os.path.exists(REF_TRAIN):
        sys.exit(f"reference spm_train not found at {REF_TRAIN}; "
                 "build it per the module docstring")
    matrix = json.loads((TRAIN_FIX / "matrix.json").read_text())
    with tempfile.TemporaryDirectory() as td:
        outdir = pathlib.Path(td)
        for case in matrix:
            prefix = run_train(case, outdir)
            shutil.copy(str(prefix) + ".vocab",
                        TRAIN_FIX / (case["name"] + ".vocab"))
            print("wrote", case["name"] + ".vocab")
            if case["name"] == "ja_bpe_900_nmt_nfkc":
                # the committed JA BPE model backing the encode golden
                shutil.copy(str(prefix) + ".model",
                            FIX / "bpe_ja_900.model")
                print("wrote bpe_ja_900.model")

        for ids_name, model, corpus, extra in ENCODE_CASES:
            out = subprocess.run(
                [REF_ENCODE, f"--model={model}", "--output_format=id",
                 *extra],
                stdin=open(corpus, "rb"), capture_output=True, check=True)
            (FIX / ids_name).write_bytes(out.stdout)
            print("wrote", ids_name)

        # deterministic n-best goldens (tie order is part of the contract)
        for out_name, fmt, n in (("unigram_en_nbest5.txt", "nbest_id", 100),
                                 ("unigram_en_nbest5.pieces.txt",
                                  "nbest_piece", 50)):
            lines = open("/root/reference/data/botchan.txt",
                         "rb").read().split(b"\n")[:n]
            out = subprocess.run(
                [REF_ENCODE,
                 "--model=/root/reference/python/test/test_model.model",
                 f"--output_format={fmt}", "--nbest_size=5"],
                input=b"\n".join(lines) + b"\n", capture_output=True,
                check=True)
            (FIX / out_name).write_bytes(out.stdout)
            print("wrote", out_name)


if __name__ == "__main__":
    main()
