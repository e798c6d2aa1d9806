# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""spm_normalize CLI (reference src/spm_normalize_main.cc)."""

import sys

from . import Flags, open_output, read_lines

SPEC = {
    "model": ("s", "", "Model file name"),
    "use_internal_normalization": ("b", False,
                                   "Use NormalizerSpec \"as-is\" (without "
                                   "adding meta symbols) for normalization."),
    "normalization_rule_name": ("s", "",
                                "Normalization rule name. Choose from nfkc "
                                "or identity"),
    "normalization_rule_tsv": ("s", "", "Normalization rule TSV file. "),
    "remove_extra_whitespaces": ("b", True, "Remove extra whitespaces"),
    "decompile": ("b", False,
                  "Decompile compiled charamap and output it as TSV."),
    "output": ("s", "", "Output filename"),
}


def main(argv=None) -> None:
    from ..normalizer import charsmap as charsmap_lib
    from ..normalizer.normalize import Normalizer
    from ..proto.spec import ModelProto, NormalizerSpec
    from ..train import facade

    flags = Flags(SPEC, "spm_normalize")
    flags.parse(sys.argv[1:] if argv is None else argv)

    spec = NormalizerSpec()
    if flags.normalization_rule_tsv:
        spec.normalization_rule_tsv = flags.normalization_rule_tsv
        facade.populate_normalizer_spec(spec)
    elif flags.normalization_rule_name:
        spec.name = flags.normalization_rule_name
        facade.populate_normalizer_spec(spec)
    elif flags.model:
        mp = ModelProto.load(flags.model)
        if mp.normalizer_spec is not None:
            spec = mp.normalizer_spec
    else:
        raise SystemExit("ERROR: Sets --model, --normalization_rule_tsv, "
                         "or --normalization_rule_name flag.")

    # Uses the normalizer spec encoded in the model_pb (main.cc:90-107)
    if not flags.use_internal_normalization:
        spec.add_dummy_prefix = False     # do not add dummy prefix
        spec.escape_whitespaces = False   # do not output meta symbol
        spec.remove_extra_whitespaces = flags.remove_extra_whitespaces

    out = open_output(flags.output)
    if flags.decompile:
        cmap = charsmap_lib.decompile_charsmap(spec.precompiled_charsmap)
        out.write(charsmap_lib.save_charsmap_tsv(cmap))
    else:
        normalizer = Normalizer(spec)
        for line in read_lines(flags.rest):
            out.write(normalizer.normalize_string(line) + "\n")
    if out is not sys.stdout:
        out.close()


if __name__ == "__main__":
    main()
