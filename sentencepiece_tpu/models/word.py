# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Word model (reference src/word_model.cc:33-45): one piece per
whitespace-delimited word (U+2581 boundaries after normalization)."""

from __future__ import annotations

from .base import EncodeResult, ModelBase, split_into_words


class WordModel(ModelBase):
    def encode(self, normalized: bytes) -> EncodeResult:
        if not normalized:
            return []
        ts = self.model_proto.trainer_spec
        suffix = bool(ts.treat_whitespace_as_suffix) if ts else False
        return [(w, self.piece_to_id(w))
                for w in split_into_words(normalized, suffix)]
