# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Model factory (reference src/model_factory.cc:26)."""

from __future__ import annotations

from ..proto.spec import ModelProto, ModelType
from .base import ModelBase
from .bpe import BpeModel
from .char import CharModel
from .unigram import UnigramModel
from .word import WordModel

_MODELS = {
    ModelType.UNIGRAM: UnigramModel,
    ModelType.BPE: BpeModel,
    ModelType.WORD: WordModel,
    ModelType.CHAR: CharModel,
}


def create(model_proto: ModelProto) -> ModelBase:
    ts = model_proto.trainer_spec
    model_type = ts.model_type if ts is not None else ModelType.UNIGRAM
    cls = _MODELS.get(model_type)
    if cls is None:
        raise ValueError(f"unknown model_type: {model_type}")
    return cls(model_proto)
