# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Deterministic multilingual training corpus (BASELINE config 5).

botchan (EN) + wagahaiwa_nekodearu (JA, CJK) + a generated Latin/CJK
mix: pseudo-words sampled from the two corpora's character inventories
with a fixed PRNG, so every process (and every rerun) builds the same
bytes. ~3 MB total.
"""

import os

import numpy as np

BOTCHAN = "/root/reference/data/botchan.txt"
WAGAHAI = "/root/reference/data/wagahaiwa_nekodearu.txt"


def build(path: str, mix_lines: int = 48000, seed: int = 0) -> str:
    if os.path.exists(path):
        return path
    rng = np.random.RandomState(seed)
    en = open(BOTCHAN, "rb").read()
    ja = open(WAGAHAI, "rb").read()
    latin = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    cjk = sorted({c for c in ja.decode("utf-8", "surrogateescape")
                  if ord(c) >= 0x3000})
    out = [en.rstrip(b"\n"), ja.rstrip(b"\n")]
    lines = []
    for _ in range(mix_lines):
        parts = []
        for _ in range(rng.randint(3, 9)):
            if rng.rand() < 0.5:
                n = rng.randint(2, 9)
                parts.append("".join(latin[i] for i in
                                     rng.randint(0, len(latin), n)))
            else:
                n = rng.randint(1, 5)
                parts.append("".join(cjk[i] for i in
                                     rng.randint(0, len(cjk), n)))
        lines.append(" ".join(parts).encode("utf-8"))
    out.append(b"\n".join(lines))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(b"\n".join(out) + b"\n")
    os.replace(tmp, path)
    return path


if __name__ == "__main__":
    import sys

    p = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spm_multilingual.txt"
    build(p)
    print(p, os.path.getsize(p), "bytes")
