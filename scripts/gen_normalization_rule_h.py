#!/usr/bin/env python3
# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Emit a C++ ``normalization_rule.h`` embedding the four precompiled
charsmap blobs.

Dev-time equivalent of the reference's ``compile_charsmap_main.cc:103-155``
(which needs ICU at build time). We compile the charsmaps with
``sentencepiece_tpu.normalizer.builder`` instead, so a reference checkout that
lacks the generated header (it is ICU-generated and not in the tree) can be
built for golden-fixture generation, with byte-identical blobs on both sides.

Usage: python scripts/gen_normalization_rule_h.py OUTPUT_PATH
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sentencepiece_tpu.normalizer import builder  # noqa: E402

RULES = ["nfkc", "nmt_nfkc", "nfkc_cf", "nmt_nfkc_cf"]

HEADER = """#ifndef NORMALIZATION_RULE_H_
#define NORMALIZATION_RULE_H_
#include <cstdio>
namespace sentencepiece {
namespace {

struct BinaryBlob {
 const char *name;
 size_t size;
 const char *data;
};

"""

FOOTER = """
}  // namespace
}  // namespace sentencepiece
#endif  // NORMALIZATION_RULE_H_
"""


def to_octal_literal(data: bytes, width: int = 16) -> str:
    """C string literal with every byte octal-escaped (always unambiguous)."""
    lines = []
    for i in range(0, len(data), width):
        chunk = data[i:i + width]
        lines.append('"' + "".join(f"\\{b:03o}" for b in chunk) + '"')
    return "\n".join(lines) if lines else '""'


def main(out_path: str) -> None:
    blobs = [(name, builder.get_precompiled_charsmap(name)) for name in RULES]
    parts = [HEADER, "constexpr BinaryBlob kNormalizationRules_blob[] = {\n"]
    for name, blob in blobs:
        parts.append(f'{{ "{name}", {len(blob)},\n')
        parts.append(to_octal_literal(blob))
        parts.append("},\n")
    parts.append("};\n")
    parts.append(
        f"constexpr size_t kNormalizationRules_size = {len(blobs)};\n")
    parts.append(FOOTER)
    with open(out_path, "w") as f:
        f.write("".join(parts))
    total = sum(len(b) for _, b in blobs)
    print(f"wrote {out_path}: {len(blobs)} blobs, {total} bytes")


if __name__ == "__main__":
    main(sys.argv[1])
