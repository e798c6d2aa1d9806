# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""TPU compute path: batched jitted encode / training kernels.

This package is the analog of the reference's ``tensorflow/`` ops layer
(reference tensorflow/sentencepiece_processor_ops.cc) — the ML-framework-
native tokenizer — except the models themselves also *run* on the device:
text is padded uint8 arrays in HBM, the vocab trie is a gather table, and
segmentation is lax scans over a dense lattice.
"""

from .encode import UnigramBatchEncoder  # noqa: F401
