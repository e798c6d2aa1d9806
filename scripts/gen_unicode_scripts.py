#!/usr/bin/env python3
# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Generate the compact unicode-script range table data asset.

Equivalent of the reference's ``data/gen_unicode_scripts_code.pl`` (which
emits ``src/unicode_script_map.h``): parses the Unicode ``Scripts.txt``
database into sorted (start, end, script) ranges stored as a small TSV asset
loaded by ``sentencepiece_tpu.utils.unicode_script``.

Usage: python scripts/gen_unicode_scripts.py /path/to/Scripts.txt
"""

import re
import sys
import os

LINE_RE = re.compile(r"^([0-9A-F]{4,6})(?:\.\.([0-9A-F]{4,6}))?\s*;\s*(\w+)")


def main(scripts_txt: str) -> None:
    ranges = []
    with open(scripts_txt, encoding="utf-8") as f:
        for line in f:
            m = LINE_RE.match(line)
            if not m:
                continue
            lo = int(m.group(1), 16)
            hi = int(m.group(2), 16) if m.group(2) else lo
            ranges.append((lo, hi, m.group(3)))
    ranges.sort()
    # merge adjacent ranges with the same script
    merged = []
    for lo, hi, name in ranges:
        if merged and merged[-1][2] == name and merged[-1][1] + 1 == lo:
            merged[-1] = (merged[-1][0], hi, name)
        else:
            merged.append((lo, hi, name))
    out = os.path.join(os.path.dirname(__file__), "..", "sentencepiece_tpu",
                       "data", "unicode_scripts.tsv")
    with open(out, "w", encoding="utf-8") as f:
        for lo, hi, name in merged:
            f.write(f"{lo:X}\t{hi:X}\t{name}\n")
    print(f"wrote {out}: {len(merged)} ranges "
          f"({len({r[2] for r in merged})} scripts)")


if __name__ == "__main__":
    main(sys.argv[1])
