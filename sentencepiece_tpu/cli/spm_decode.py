# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""spm_decode CLI (reference src/spm_decode_main.cc)."""

import sys

from . import Flags, open_output, read_lines

SPEC = {
    "model": ("s", "", "model file name"),
    "output": ("s", "", "output filename"),
    "input_format": ("s", "piece", "choose from piece or id"),
    "output_format": ("s", "string", "choose from string or proto"),
    "extra_options": ("s", "",
                      "':' separated decoder extra options, e.g., "
                      "\"reverse\""),
}


def main(argv=None) -> None:
    from ..processor import SentencePieceProcessor

    flags = Flags(SPEC, "spm_decode")
    flags.parse(sys.argv[1:] if argv is None else argv)
    if not flags.model:
        raise SystemExit("ERROR: --model must not be empty\n\n"
                         + flags.usage())
    sp = SentencePieceProcessor(flags.model)
    if flags.extra_options:
        sp.set_decode_extra_options(flags.extra_options)
    out = open_output(flags.output)

    for line in read_lines(flags.rest):
        pieces = line.split(" ") if line else []
        if flags.input_format == "piece":
            detok = sp.decode_pieces(pieces)
        elif flags.input_format == "id":
            detok = sp.decode_ids([int(x) for x in pieces if x])
        else:
            raise SystemExit(
                f"ERROR: Unknown input format: {flags.input_format}")
        if flags.output_format == "string":
            out.write(detok + "\n")
        elif flags.output_format != "proto":
            raise SystemExit(
                f"ERROR: Unknown output format: {flags.output_format}")
    if out is not sys.stdout:
        out.close()


if __name__ == "__main__":
    main()
