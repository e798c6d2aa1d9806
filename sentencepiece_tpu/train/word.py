# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Word trainer (reference src/word_model_trainer.cc:29-76).

Whitespace-token frequencies -> top vocab_size words with scores
log(freq) - log(sum). Float narrowing mirrors the reference: logsum is
float32 (`const float logsum = log(sum)`), the subtraction is double, the
stored score is float32.
"""

from __future__ import annotations

import math

import numpy as np

from ..models.base import split_into_words
from ..proto.spec import ModelProto, ModelType
from .interface import TrainerInterface, UNK_STR, sorted_freq_desc


class Trainer(TrainerInterface):
    def train(self) -> ModelProto:
        assert self.normalizer_spec.escape_whitespaces
        assert self.trainer_spec.model_type == ModelType.WORD
        self.load_sentences()

        freq = {}
        for s, f in self.sentences:
            raw = s.encode("utf-8", errors="surrogateescape")
            for w in split_into_words(raw):
                key = w.decode("utf-8", errors="surrogateescape")
                freq[key] = freq.get(key, 0) + f

        vocab_size = self.trainer_spec.vocab_size - len(self.meta_pieces)
        assert vocab_size >= 0
        total = sum(freq.values())
        logsum = np.float32(math.log(total))
        assert not self.final_pieces
        for w, f in sorted_freq_desc(freq.items()):
            if UNK_STR in w:
                continue
            if (not self.trainer_spec.use_all_vocab
                    and len(self.final_pieces) == vocab_size):
                break
            self.final_pieces.append(
                (w, float(np.float32(math.log(f) - float(logsum)))))
        if self.trainer_spec.use_all_vocab:
            self.trainer_spec.vocab_size = (len(self.final_pieces)
                                            + len(self.meta_pieces))
        return self.save()
