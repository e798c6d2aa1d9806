# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""compile_charsmap CLI (reference src/compile_charsmap_main.cc).

Builds the four NFKC-variant normalization rule blobs (using Python
unicodedata instead of ICU) and emits them either as raw `.charsmap` blob
files, as TSV rule tables, or as a C++ ``normalization_rule.h`` header in
the reference's format (via scripts/gen_normalization_rule_h.py's
emitter). Also round-trip-verifies each blob by decompilation like the
reference main does."""

import sys

from . import Flags

SPEC = {
    "output_format": ("s", "header",
                      "output format. choose from header, blob, or tsv"),
    "output_dir": ("s", ".", "output directory"),
    "output": ("s", "normalization_rule.h",
               "header filename (output_format=header)"),
}

RULES = ["nfkc", "nmt_nfkc", "nfkc_cf", "nmt_nfkc_cf"]


def main(argv=None) -> None:
    import os

    from ..normalizer import builder, charsmap as charsmap_lib

    flags = Flags(SPEC, "compile_charsmap")
    flags.parse(sys.argv[1:] if argv is None else argv)

    blobs = []
    for name in RULES:
        blob = builder.get_precompiled_charsmap(name)
        # verify round trip (compile_charsmap_main.cc does the same)
        cmap = charsmap_lib.decompile_charsmap(blob)
        assert cmap, f"{name}: decompile failed"
        blobs.append((name, blob))
        print(f"{name}: {len(blob)} bytes, {len(cmap)} rules",
              file=sys.stderr)

    if flags.output_format == "header":
        HEADER = ("#ifndef NORMALIZATION_RULE_H_\n"
                  "#define NORMALIZATION_RULE_H_\n#include <cstdio>\n"
                  "namespace sentencepiece {\nnamespace {\n\n"
                  "struct BinaryBlob {\n const char *name;\n size_t size;\n"
                  " const char *data;\n};\n\n")
        FOOTER = ("\n}  // namespace\n}  // namespace sentencepiece\n"
                  "#endif  // NORMALIZATION_RULE_H_\n")

        def to_octal_literal(data: bytes, width: int = 16) -> str:
            lines = []
            for i in range(0, len(data), width):
                chunk = data[i:i + width]
                lines.append('"' + "".join(f"\\{b:03o}" for b in chunk)
                             + '"')
            return "\n".join(lines) if lines else '""'

        path = os.path.join(flags.output_dir, flags.output)
        parts = [HEADER,
                 "constexpr BinaryBlob kNormalizationRules_blob[] = {\n"]
        for name, blob in blobs:
            parts.append(f'{{ "{name}", {len(blob)},\n')
            parts.append(to_octal_literal(blob))
            parts.append("},\n")
        parts.append("};\n")
        parts.append(
            f"constexpr size_t kNormalizationRules_size = {len(blobs)};\n")
        parts.append(FOOTER)
        with open(path, "w") as f:
            f.write("".join(parts))
    elif flags.output_format == "blob":
        for name, blob in blobs:
            with open(os.path.join(flags.output_dir,
                                   f"{name}.charsmap"), "wb") as f:
                f.write(blob)
    elif flags.output_format == "tsv":
        for name, blob in blobs:
            cmap = charsmap_lib.decompile_charsmap(blob)
            with open(os.path.join(flags.output_dir, f"{name}.tsv"), "w",
                      encoding="utf-8") as f:
                f.write(charsmap_lib.save_charsmap_tsv(cmap))
    else:
        raise SystemExit(
            f"ERROR: Unknown output format: {flags.output_format}")


if __name__ == "__main__":
    main()
