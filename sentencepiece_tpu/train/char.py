# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Char trainer (reference src/char_model_trainer.cc:30-60).

required_chars (already coverage-filtered by LoadSentences) -> pieces with
scores log(freq) - log(sum), freq-descending.
"""

from __future__ import annotations

import math

import numpy as np

from ..proto.spec import ModelProto, ModelType
from .interface import TrainerInterface, sorted_freq_desc


class Trainer(TrainerInterface):
    def train(self) -> ModelProto:
        assert self.normalizer_spec.escape_whitespaces
        assert self.trainer_spec.model_type == ModelType.CHAR
        self.load_sentences()

        vocab_size = self.trainer_spec.vocab_size - len(self.meta_pieces)
        assert vocab_size >= 0
        total = sum(self.required_chars.values())
        logsum = np.float32(math.log(total))
        assert not self.final_pieces
        for cp, f in sorted_freq_desc(self.required_chars.items()):
            if (not self.trainer_spec.use_all_vocab
                    and len(self.final_pieces) == vocab_size):
                break
            self.final_pieces.append(
                (chr(cp), float(np.float32(math.log(f) - float(logsum)))))
        if self.trainer_spec.use_all_vocab:
            self.trainer_spec.vocab_size = (len(self.final_pieces)
                                            + len(self.meta_pieces))
        return self.save()
