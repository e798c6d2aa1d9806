# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""sentencepiece-tpu: a TPU-native subword tokenizer framework.

A from-scratch re-design of the SentencePiece capability set
(unigram/BPE/word/char training + encoding, NFKC-style normalization,
self-contained model artifacts) for JAX/XLA/Pallas on TPU:

  * text lives as padded uint8/int32 arrays in HBM
  * tries are flat int32 transition tables driven by gather kernels
  * encode is a batched lattice-scan (unigram) / merge-scan (BPE) jit program
  * training reductions (EM expected counts, BPE pair counts) run data-
    parallel over a device mesh with psum over ICI

Host API (`SentencePieceProcessor`, `SentencePieceTrainer`) is drop-in
compatible with the reference python package and bit-exact on token ids.
"""

from . import distributed
from .processor import SentencePieceProcessor
from .train.facade import SentencePieceTrainer
from .proto.spec import (ModelProto, ModelType, NormalizerSpec, PieceType,
                         TrainerSpec)

__version__ = "0.1.0"

__all__ = [
    "SentencePieceProcessor",
    "SentencePieceTrainer",
    "distributed",
    "ModelProto",
    "ModelType",
    "NormalizerSpec",
    "PieceType",
    "TrainerSpec",
    "__version__",
]
