# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Character model (reference src/char_model.cc:41-58): one piece per
unicode char, with user-defined symbols matched as atomic units."""

from __future__ import annotations

from .base import EncodeResult, ModelBase


class CharModel(ModelBase):
    def encode(self, normalized: bytes) -> EncodeResult:
        if not normalized:
            return []
        out: EncodeResult = []
        pos = 0
        n = len(normalized)
        while pos < n:
            mblen, _ = self.matcher.prefix_match(normalized, pos)
            w = normalized[pos:pos + mblen]
            out.append((w, self.piece_to_id(w)))
            pos += mblen
        return out
