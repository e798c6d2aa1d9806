# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""spm_export_vocab CLI (reference src/spm_export_vocab_main.cc)."""

import sys

from . import Flags, open_output

SPEC = {
    "output": ("s", "", "Output filename"),
    "model": ("s", "", "input model file name"),
    "output_format": ("s", "txt", "output format. choose from txt or proto"),
}


def main(argv=None) -> None:
    from ..proto.spec import ModelProto
    from ..train.interface import _cpp_float_str

    flags = Flags(SPEC, "spm_export_vocab")
    flags.parse(sys.argv[1:] if argv is None else argv)
    if not flags.model:
        raise SystemExit("ERROR: --model must not be empty\n\n"
                         + flags.usage())
    mp = ModelProto.load(flags.model)
    if flags.output_format == "txt":
        out = open_output(flags.output)
        for piece in mp.pieces:
            out.write(f"{piece.piece}\t{_cpp_float_str(piece.score)}\n")
        if out is not sys.stdout:
            out.close()
    elif flags.output_format == "proto":
        with open(flags.output, "wb") as f:
            f.write(mp.serialize())
    else:
        raise SystemExit(
            f"ERROR: Unknown output format: {flags.output_format}")


if __name__ == "__main__":
    main()
