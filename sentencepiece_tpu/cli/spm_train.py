# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""spm_train CLI (reference src/spm_train_main.cc).

Every TrainerSpec/NormalizerSpec field is a flag; like the reference main,
every field is SET explicitly on the spec (so the serialized model carries
explicit presence for all of them — artifact byte-parity with reference-
trained models)."""

import sys

from . import Flags
from ..proto.spec import ModelType, NormalizerSpec, TrainerSpec

_TS = TrainerSpec()
_NS = NormalizerSpec()

SPEC = {
    "input": ("s", "", "comma separated list of input sentences"),
    "input_format": ("s", _TS.input_format, "Input format. text or tsv."),
    "model_prefix": ("s", "", "output model prefix"),
    "model_type": ("s", "unigram",
                   "model algorithm: unigram, bpe, word or char"),
    "vocab_size": ("i", _TS.vocab_size, "vocabulary size"),
    "accept_language": ("s", "",
                        "comma-separated list of languages this model can "
                        "accept"),
    "self_test_sample_size": ("i", _TS.self_test_sample_size,
                              "the size of self test samples"),
    "character_coverage": ("f", _TS.character_coverage,
                           "character coverage to determine the minimum "
                           "symbols"),
    "input_sentence_size": ("i", _TS.input_sentence_size,
                            "maximum size of sentences the trainer loads"),
    "shuffle_input_sentence": ("b", _TS.shuffle_input_sentence,
                               "Randomly sample input sentences in advance. "
                               "Valid when --input_sentence_size > 0"),
    "seed_sentencepiece_size": ("i", _TS.seed_sentencepiece_size,
                                "the size of seed sentencepieces"),
    "shrinking_factor": ("f", _TS.shrinking_factor,
                         "Keeps top shrinking_factor pieces with respect to "
                         "the loss"),
    "num_threads": ("i", _TS.num_threads,
                    "number of threads for training"),
    "num_sub_iterations": ("i", _TS.num_sub_iterations,
                           "number of EM sub-iterations"),
    "max_sentencepiece_length": ("i", _TS.max_sentencepiece_length,
                                 "maximum length of sentence piece"),
    "max_sentence_length": ("i", _TS.max_sentence_length,
                            "maximum length of sentence in byte"),
    "split_by_unicode_script": ("b", _TS.split_by_unicode_script,
                                "use Unicode script to split sentence "
                                "pieces"),
    "split_by_number": ("b", _TS.split_by_number,
                        "split tokens by numbers (0-9)"),
    "split_by_whitespace": ("b", _TS.split_by_whitespace,
                            "use a white space to split sentence pieces"),
    "treat_whitespace_as_suffix": ("b", False,
                                   "treat whitespace marker as suffix "
                                   "instead of prefix."),
    "control_symbols": ("s", "", "comma separated list of control symbols"),
    "user_defined_symbols": ("s", "",
                             "comma separated list of user defined "
                             "symbols"),
    "normalization_rule_name": ("s", "nmt_nfkc",
                                "Normalization rule name. Choose from "
                                "nfkc or identity"),
    "normalization_rule_tsv": ("s", "", "Normalization rule TSV file. "),
    "add_dummy_prefix": ("b", _NS.add_dummy_prefix,
                         "Add dummy whitespace at the beginning of text"),
    "remove_extra_whitespaces": ("b", _NS.remove_extra_whitespaces,
                                 "Removes leading, trailing, and duplicate "
                                 "internal whitespace"),
    "hard_vocab_limit": ("b", _TS.hard_vocab_limit,
                         "If set to false, --vocab_size is considered as a "
                         "soft limit."),
    "use_all_vocab": ("b", _TS.use_all_vocab,
                      "If set to true, use all tokens as vocab. Valid for "
                      "word/char models."),
    "unk_id": ("i", _TS.unk_id, "Override UNK (<unk>) id."),
    "bos_id": ("i", _TS.bos_id,
               "Override BOS (<s>) id. Set -1 to disable BOS."),
    "eos_id": ("i", _TS.eos_id,
               "Override EOS (</s>) id. Set -1 to disable EOS."),
    "pad_id": ("i", _TS.pad_id,
               "Override PAD (<pad>) id. Set -1 to disable PAD."),
    "unk_piece": ("s", _TS.unk_piece, "Override UNK (<unk>) piece."),
    "bos_piece": ("s", _TS.bos_piece, "Override BOS (<s>) piece."),
    "eos_piece": ("s", _TS.eos_piece, "Override EOS (</s>) piece."),
    "pad_piece": ("s", _TS.pad_piece, "Override PAD (<pad>) piece."),
    "unk_surface": ("s", _TS.unk_surface,
                    "Dummy surface string for <unk>."),
}

_TRAINER_SCALARS = [
    "input_format", "vocab_size", "self_test_sample_size",
    "character_coverage", "input_sentence_size", "shuffle_input_sentence",
    "seed_sentencepiece_size", "shrinking_factor", "num_threads",
    "num_sub_iterations", "max_sentencepiece_length", "max_sentence_length",
    "split_by_unicode_script", "split_by_number", "split_by_whitespace",
    "treat_whitespace_as_suffix", "hard_vocab_limit", "use_all_vocab",
    "unk_id", "bos_id", "eos_id", "pad_id", "unk_piece", "bos_piece",
    "eos_piece", "pad_piece", "unk_surface", "model_prefix",
]
_TRAINER_REPEATED = ["input", "accept_language", "control_symbols",
                     "user_defined_symbols"]
_NORMALIZER_SCALARS = ["add_dummy_prefix", "remove_extra_whitespaces"]

# TPU-native extensions (no reference analog): device-mesh training engine
# + multi-host process wiring (SURVEY.md §2.9)
SPEC.update({
    "engine": ("s", "exact",
               "training engine: exact (host, byte-identical to the "
               "reference) or device (data-parallel over the jax device "
               "mesh)"),
    "distributed_coordinator": ("s", "",
                                "host:port of rank 0 for multi-host "
                                "training (jax.distributed)"),
    "distributed_num_processes": ("i", 0, "number of training processes"),
    "distributed_process_id": ("i", -1, "this process's rank"),
})


def main(argv=None) -> None:
    from ..train import facade

    flags = Flags(SPEC, "spm_train")
    flags.parse(sys.argv[1:] if argv is None else argv)
    if not flags.input or not flags.model_prefix:
        raise SystemExit("ERROR: --input and --model_prefix must not be "
                         "empty\n\n" + flags.usage())

    if flags.distributed_coordinator or flags.distributed_num_processes:
        from .. import distributed
        distributed.initialize(
            coordinator_address=flags.distributed_coordinator or None,
            num_processes=flags.distributed_num_processes or None,
            process_id=(flags.distributed_process_id
                        if flags.distributed_process_id >= 0 else None))

    trainer_spec = TrainerSpec()
    normalizer_spec = NormalizerSpec()
    for name in _TRAINER_SCALARS:
        setattr(trainer_spec, name, flags.values[name])
    for name in _TRAINER_REPEATED:
        v = flags.values[name]
        if v:
            setattr(trainer_spec, name, v.split(","))
    trainer_spec.model_type = ModelType.value(flags.model_type)
    for name in _NORMALIZER_SCALARS:
        setattr(normalizer_spec, name, flags.values[name])
    normalizer_spec.name = flags.normalization_rule_name
    normalizer_spec.normalization_rule_tsv = flags.normalization_rule_tsv
    facade.train(trainer_spec=trainer_spec, normalizer_spec=normalizer_spec,
                 engine=flags.engine)


if __name__ == "__main__":
    main()
