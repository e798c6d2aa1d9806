# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""spm_encode CLI (reference src/spm_encode_main.cc)."""

import sys

from . import Flags, open_output, read_lines

SPEC = {
    "model": ("s", "", "model file name"),
    "output_format": ("s", "piece",
                      "choose from piece, id, proto, nbest_piece, "
                      "nbest_id, nbest_proto, sample_piece, sample_id, "
                      "or sample_proto"),
    "output": ("s", "", "output filename"),
    "extra_options": ("s", "",
                      "':' separated encoder extra options, e.g., "
                      "\"reverse:bos:eos\""),
    "nbest_size": ("i", 10, "NBest size"),
    "alpha": ("f", 0.5, "Smoothing parameter for sampling mode."),
    "vocabulary": ("s", "",
                   "Restrict the vocabulary. The encoder only emits the "
                   "tokens in \"vocabulary\" file"),
    "vocabulary_threshold": ("i", 0,
                             "Words with frequency < threshold will be "
                             "treated as OOV"),
    "generate_vocabulary": ("b", False,
                            "Generates vocabulary file instead of "
                            "segmentation"),
}


def main(argv=None) -> None:
    from ..processor import SentencePieceProcessor
    from ..train.interface import sorted_freq_desc

    flags = Flags(SPEC, "spm_encode")
    flags.parse(sys.argv[1:] if argv is None else argv)
    if not flags.model:
        raise SystemExit("ERROR: --model must not be empty\n\n"
                         + flags.usage())
    sp = SentencePieceProcessor(flags.model)
    if flags.extra_options:
        sp.set_encode_extra_options(flags.extra_options)
    if flags.vocabulary:
        sp.load_vocabulary(flags.vocabulary, flags.vocabulary_threshold)
    out = open_output(flags.output)
    fmt = flags.output_format
    vocab = {}

    def w(line: str) -> None:
        out.write(line + "\n")

    if (fmt in ("id", "piece") and not flags.generate_vocabulary
            and not flags.extra_options):
        # batched fast path: chunked encode_as_{ids,pieces}_batch (the
        # fused native normalize+encode when eligible), same output as
        # encode().pieces
        buf = []

        def flush():
            if fmt == "id":
                for ids in sp.encode_as_ids_batch(buf):
                    w(" ".join(map(str, ids)))
            else:
                for pieces in sp.encode_as_pieces_batch(buf):
                    w(" ".join(pieces))
            buf.clear()

        for line in read_lines(flags.rest):
            buf.append(line)
            if len(buf) >= 8192:
                flush()
        flush()
        if out is not sys.stdout:
            out.close()
        return

    for line in read_lines(flags.rest):
        if flags.generate_vocabulary:
            spt = sp.encode(line)
            for piece in spt.pieces:
                if (not sp.is_unknown(piece.id)
                        and not sp.is_control(piece.id)):
                    vocab[piece.piece] = vocab.get(piece.piece, 0) + 1
        elif fmt == "piece":
            w(" ".join(p.piece for p in sp.encode(line).pieces))
        elif fmt == "id":
            w(" ".join(str(p.id) for p in sp.encode(line).pieces))
        elif fmt == "proto":
            sp.encode(line)
        elif fmt == "sample_piece":
            w(" ".join(sp.sample_encode_as_pieces(line, flags.nbest_size,
                                                  flags.alpha)))
        elif fmt == "sample_id":
            w(" ".join(map(str, sp.sample_encode_as_ids(
                line, flags.nbest_size, flags.alpha))))
        elif fmt == "sample_proto":
            sp.sample_encode(line, flags.nbest_size, flags.alpha)
        elif fmt == "nbest_piece":
            for result in sp.nbest_encode_as_pieces(line, flags.nbest_size):
                w(" ".join(result))
        elif fmt == "nbest_id":
            for result in sp.nbest_encode_as_ids(line, flags.nbest_size):
                w(" ".join(map(str, result)))
        elif fmt == "nbest_proto":
            sp.nbest_encode(line, flags.nbest_size)
        else:
            raise SystemExit(f"ERROR: Unknown output format: {fmt}")

    if flags.generate_vocabulary:
        for piece, freq in sorted_freq_desc(vocab.items()):
            w(f"{piece}\t{freq}")
    if out is not sys.stdout:
        out.close()


if __name__ == "__main__":
    main()
