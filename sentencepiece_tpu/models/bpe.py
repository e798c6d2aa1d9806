# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""BPE segmentation: greedy best-pair merging (reference src/bpe_model.cc).

Exact semantics reproduced:
  * initial split into chars, with user-defined symbols frozen as atomic
    units via the prefix matcher (bpe_model.cc:120-131)
  * agenda ordered by (score desc, left index asc) (bpe_model.cc:57-60)
  * stale agenda entries dropped by the size check (bpe_model.cc:148-151)
  * pieces flagged UNUSED by SetVocabulary are re-expanded recursively with
    the rev_merge table (bpe_model.cc:84-87, 171-189)

Additionally implements BPE-dropout (Provilkov et al. 2019) as
``sample_encode(theta=p)``: each valid popped merge is skipped with
probability p, under the package PRNG contract (numpy Generator). The
v0.1.82 reference has no BPE sampling; this matches the capability added
to later SentencePiece releases.
"""

from __future__ import annotations

import heapq
from typing import Dict, List, Tuple

from .base import EncodeResult, ModelBase


class BpeModel(ModelBase):
    _native_enc = None

    def _native_encoder(self):
        """C++ agenda merge for models without UNUSED pieces (those need
        rev_merge resegmentation, handled by the Python path)."""
        if self._native_enc is None:
            try:
                from ..proto.spec import PieceType
                from .. import native as native_mod
                import numpy as np

                if bool((self.types == PieceType.UNUSED).any()):
                    self._native_enc = False
                    return None
                matcher_units = None
                if self.matcher is not None and not self.matcher.empty:
                    matcher_units = self.matcher._trie.units
                # trie over pieces map (built like the unigram model's)
                from ..utils import darts as darts_mod

                keys = sorted(self.pieces)
                trie = darts_mod.build(keys,
                                       [self.pieces[k] for k in keys])
                enc = native_mod.NativeBpeEncoder(
                    trie.units, np.asarray(self.scores, np.float32),
                    self.unk_id, matcher_units)
                self._native_enc = enc if enc.ok else False
            except Exception:
                self._native_enc = False
        return self._native_enc or None

    def encode(self, normalized: bytes) -> EncodeResult:
        native = self._native_encoder()
        if native is not None and normalized:
            r = native.encode(normalized)
            if r is not None:
                ids, starts, lens = r
                out = []
                for i in range(len(ids)):
                    w = normalized[starts[i]:starts[i] + lens[i]]
                    pid = int(ids[i])
                    if pid == self.unk_id:
                        pid = self.piece_to_id(w)  # reserved pieces too
                    out.append((w, pid))
                return out
        return self._encode_impl(normalized, 0.0, None)

    def sample_encode(self, normalized: bytes, theta: float,
                      rng=None) -> EncodeResult:
        """BPE-dropout: theta = per-merge dropout probability."""
        if rng is None:
            from ..utils.rng import get_generator

            rng = get_generator()
        return self._encode_impl(normalized, float(theta), rng)

    def _encode_impl(self, normalized: bytes, dropout_p: float,
                     rng) -> EncodeResult:
        if not normalized:
            return []
        data = normalized

        # Split into character sequence; freeze user-defined symbol matches.
        piece_start: List[int] = []
        piece_len: List[int] = []
        freeze: List[bool] = []
        pos = 0
        n = len(data)
        while pos < n:
            mblen, found = self.matcher.prefix_match(data, pos)
            piece_start.append(pos)
            piece_len.append(mblen)
            freeze.append(found)
            pos += mblen
        num = len(piece_start)
        if num == 0:
            return []

        # Symbol list as (start, length) spans over `data`; empty = merged away.
        sym_start = piece_start[:]
        sym_len = piece_len[:]
        prev = [i - 1 for i in range(num)]
        nxt = [i + 1 if i + 1 < num else -1 for i in range(num)]

        rev_merge: Dict[bytes, Tuple[bytes, bytes]] = {}
        agenda: List[Tuple[float, int, int, int]] = []  # (-score, left, seq, size)
        seq = 0

        def maybe_add_pair(left: int, right: int) -> None:
            nonlocal seq
            if left == -1 or right == -1 or freeze[left] or freeze[right]:
                return
            piece = data[sym_start[left]:sym_start[left] + sym_len[left]
                         + sym_len[right]]
            vid = self.pieces.get(piece)
            if vid is None:
                return
            heapq.heappush(agenda,
                           (-float(self.scores[vid]), left, seq, len(piece)))
            seq += 1
            if self.is_unused(vid):
                rev_merge[piece] = (
                    data[sym_start[left]:sym_start[left] + sym_len[left]],
                    data[sym_start[right]:sym_start[right] + sym_len[right]])

        for i in range(1, num):
            maybe_add_pair(i - 1, i)

        while agenda:
            neg_score, left, _, size = heapq.heappop(agenda)
            right = nxt[left]
            # Stale checks (bpe_model.cc:148-151).
            if (sym_len[left] == 0 or right == -1 or sym_len[right] == 0
                    or sym_len[left] + sym_len[right] != size):
                continue
            if dropout_p > 0.0 and rng.random() < dropout_p:
                continue  # BPE-dropout: skip this merge
            # Merge right into left.
            sym_len[left] += sym_len[right]
            nxt[left] = nxt[right]
            if nxt[right] >= 0:
                prev[nxt[right]] = left
            sym_len[right] = 0
            maybe_add_pair(prev[left], left)
            maybe_add_pair(left, nxt[left])

        def resegment(w: bytes, output: EncodeResult) -> None:
            vid = self.piece_to_id(w)
            if not self.is_unused(vid):
                output.append((w, vid))
                return
            p = rev_merge.get(w)
            if p is None:
                output.append((w, vid))
                return
            resegment(p[0], output)
            resegment(p[1], output)

        output: EncodeResult = []
        index = 0
        while index != -1:
            w = data[sym_start[index]:sym_start[index] + sym_len[index]]
            resegment(w, output)
            index = nxt[index]
        return output
