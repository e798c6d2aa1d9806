# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Training layer: the four vocabulary learners + shared corpus pipeline.

Layer map (SURVEY.md L6): interface.py mirrors src/trainer_interface.{h,cc};
word.py / char.py / bpe.py / unigram.py mirror the four
``*_model_trainer.{h,cc}``; facade.py mirrors src/sentencepiece_trainer.{h,cc}
plus the generated spec_parser.h flag reflection. Device-parallel hot paths
(unigram EM E-step, BPE pair counting) live in sentencepiece_tpu.tpu.
"""

from .facade import SentencePieceTrainer, train  # noqa: F401
