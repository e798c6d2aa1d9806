# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Model/config schema messages, wire-compatible with the reference artifact.

Mirrors reference src/sentencepiece_model.proto (field numbers, defaults,
semantics) so `.model` files produced by the reference load here unchanged
and vice versa. The protos double as the configuration schema: every
behavior-affecting parameter lives in TrainerSpec / NormalizerSpec, and a
trained model embeds both specs (reference sentencepiece_model.proto:236-275).
"""

from __future__ import annotations

from typing import List

from .wire import (
    Field,
    Message,
    K_BOOL,
    K_BYTES,
    K_ENUM,
    K_FLOAT,
    K_INT32,
    K_MESSAGE,
    K_STRING,
    K_UINT32,
)


class ModelType:
    """TrainerSpec.ModelType (reference sentencepiece_model.proto:45-50)."""

    UNIGRAM = 1
    BPE = 2
    WORD = 3
    CHAR = 4

    _NAMES = {1: "unigram", 2: "bpe", 3: "word", 4: "char"}
    _VALUES = {v: k for k, v in _NAMES.items()}

    @classmethod
    def name(cls, v: int) -> str:
        return cls._NAMES[v]

    @classmethod
    def value(cls, name: str) -> int:
        return cls._VALUES[name.lower()]


class TrainerSpec(Message):
    """Training configuration (reference sentencepiece_model.proto:21-189)."""

    FIELDS = [
        Field(1, "input", K_STRING, repeated=True),
        Field(7, "input_format", K_STRING),
        Field(2, "model_prefix", K_STRING),
        Field(3, "model_type", K_ENUM, default=ModelType.UNIGRAM),
        Field(4, "vocab_size", K_INT32, default=8000),
        Field(5, "accept_language", K_STRING, repeated=True),
        Field(6, "self_test_sample_size", K_INT32, default=0),
        Field(10, "character_coverage", K_FLOAT, default=0.9995),
        Field(11, "input_sentence_size", K_INT32, default=0),
        Field(19, "shuffle_input_sentence", K_BOOL, default=True),
        Field(12, "mining_sentence_size", K_INT32, default=0),
        Field(13, "training_sentence_size", K_INT32, default=0),
        Field(14, "seed_sentencepiece_size", K_INT32, default=1000000),
        Field(15, "shrinking_factor", K_FLOAT, default=0.75),
        Field(18, "max_sentence_length", K_INT32, default=4192),
        Field(16, "num_threads", K_INT32, default=16),
        Field(17, "num_sub_iterations", K_INT32, default=2),
        Field(20, "max_sentencepiece_length", K_INT32, default=16),
        Field(21, "split_by_unicode_script", K_BOOL, default=True),
        Field(23, "split_by_number", K_BOOL, default=True),
        Field(22, "split_by_whitespace", K_BOOL, default=True),
        Field(24, "treat_whitespace_as_suffix", K_BOOL, default=False),
        Field(30, "control_symbols", K_STRING, repeated=True),
        Field(31, "user_defined_symbols", K_STRING, repeated=True),
        Field(33, "hard_vocab_limit", K_BOOL, default=True),
        Field(34, "use_all_vocab", K_BOOL, default=False),
        Field(40, "unk_id", K_INT32, default=0),
        Field(41, "bos_id", K_INT32, default=1),
        Field(42, "eos_id", K_INT32, default=2),
        Field(43, "pad_id", K_INT32, default=-1),
        Field(45, "unk_piece", K_STRING, default="<unk>"),
        Field(46, "bos_piece", K_STRING, default="<s>"),
        Field(47, "eos_piece", K_STRING, default="</s>"),
        Field(48, "pad_piece", K_STRING, default="<pad>"),
        Field(44, "unk_surface", K_STRING, default=" ⁇ "),
    ]


class NormalizerSpec(Message):
    """Normalization configuration (reference sentencepiece_model.proto:192-221)."""

    FIELDS = [
        Field(1, "name", K_STRING),
        Field(2, "precompiled_charsmap", K_BYTES),
        Field(3, "add_dummy_prefix", K_BOOL, default=True),
        Field(4, "remove_extra_whitespaces", K_BOOL, default=True),
        Field(5, "escape_whitespaces", K_BOOL, default=True),
        Field(6, "normalization_rule_tsv", K_STRING),
    ]


class SelfTestSample(Message):
    FIELDS = [
        Field(1, "input", K_STRING),
        Field(2, "expected", K_STRING),
    ]


class SelfTestData(Message):
    """Embedded self-test samples (reference sentencepiece_model.proto:224-234)."""

    FIELDS = [
        Field(1, "samples", K_MESSAGE, repeated=True, message_type=SelfTestSample),
    ]


class PieceType:
    """ModelProto.SentencePiece.Type (reference sentencepiece_model.proto:242-250)."""

    NORMAL = 1
    UNKNOWN = 2
    CONTROL = 3
    USER_DEFINED = 4
    UNUSED = 5


class SentencePiece(Message):
    FIELDS = [
        Field(1, "piece", K_STRING),
        Field(2, "score", K_FLOAT),
        Field(3, "type", K_ENUM, default=PieceType.NORMAL),
    ]


class ModelProto(Message):
    """The self-contained model artifact (reference sentencepiece_model.proto:240-275)."""

    FIELDS = [
        Field(1, "pieces", K_MESSAGE, repeated=True, message_type=SentencePiece),
        Field(2, "trainer_spec", K_MESSAGE, message_type=TrainerSpec),
        Field(3, "normalizer_spec", K_MESSAGE, message_type=NormalizerSpec),
        Field(4, "self_test_data", K_MESSAGE, message_type=SelfTestData),
    ]

    @classmethod
    def load(cls, path: str) -> "ModelProto":
        with open(path, "rb") as f:
            return cls.parse(f.read())

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.serialize())


class SentencePieceTextPiece(Message):
    """One segmented piece with surface span (reference sentencepiece.proto:24-51)."""

    FIELDS = [
        Field(1, "piece", K_STRING),
        Field(2, "id", K_UINT32),
        Field(3, "surface", K_STRING),
        Field(4, "begin", K_UINT32),
        Field(5, "end", K_UINT32),
    ]


class SentencePieceText(Message):
    """Segmentation result with byte offsets (reference sentencepiece.proto:23-67)."""

    FIELDS = [
        Field(1, "text", K_STRING),
        Field(2, "pieces", K_MESSAGE, repeated=True, message_type=SentencePieceTextPiece),
        Field(3, "score", K_FLOAT),
    ]


class NBestSentencePieceText(Message):
    FIELDS = [
        Field(1, "nbests", K_MESSAGE, repeated=True, message_type=SentencePieceText),
    ]


__all__: List[str] = [
    "ModelType",
    "TrainerSpec",
    "NormalizerSpec",
    "SelfTestData",
    "SelfTestSample",
    "PieceType",
    "SentencePiece",
    "ModelProto",
    "SentencePieceText",
    "SentencePieceTextPiece",
    "NBestSentencePieceText",
]
