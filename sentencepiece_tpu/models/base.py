# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Model base: piece/id maps, reserved ids, user-symbol matcher.

Mirrors reference src/model_interface.{h,cc}: pieces are split into the
normal map (NORMAL / USER_DEFINED / UNUSED types) and the reserved map
(CONTROL / UNKNOWN) (model_interface.cc:101-144); user-defined symbols feed a
PrefixMatcher that is also injected into the normalizer so user symbols
survive normalization as atomic units (sentencepiece_processor.cc:126-129).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..normalizer.normalize import PrefixMatcher
from ..proto.spec import ModelProto, PieceType

EncodeResult = List[Tuple[bytes, int]]  # (piece bytes, vocab id)
NBestEncodeResult = List[Tuple[EncodeResult, float]]

SPACE_SYMBOL = b"\xe2\x96\x81"


def split_into_words(text: bytes, treat_whitespace_as_suffix: bool = False
                     ) -> List[bytes]:
    """Split on U+2581 boundaries (reference model_interface.cc:155-192)."""
    from ..utils.unicode import one_char_len

    n = len(text)
    result: List[bytes] = []
    begin = 0
    if treat_whitespace_as_suffix:
        if begin < n:
            result.append(b"")
        while begin < n:
            mblen = min(one_char_len(text[begin]), n - begin)
            is_ws = text[begin:begin + mblen] == SPACE_SYMBOL
            result[-1] = result[-1] + text[begin:begin + mblen]
            begin += mblen
            if begin < n and is_ws:
                result.append(b"")
    else:
        while begin < n:
            mblen = min(one_char_len(text[begin]), n - begin)
            if begin == 0 or text[begin:begin + mblen] == SPACE_SYMBOL:
                result.append(b"")
            result[-1] = result[-1] + text[begin:begin + mblen]
            begin += mblen
    return result


class ModelBase:
    """Shared state and accessors for all four segmentation models."""

    def __init__(self, model_proto: ModelProto):
        self.model_proto = model_proto
        self.pieces: Dict[bytes, int] = {}       # NORMAL/USER_DEFINED/UNUSED
        self.reserved_id_map: Dict[bytes, int] = {}  # CONTROL/UNKNOWN
        self.unk_id = -1
        self._piece_bytes: List[bytes] = []
        self._scores: np.ndarray = np.zeros(0, np.float32)
        self._types: np.ndarray = np.zeros(0, np.int32)
        self.matcher: Optional[PrefixMatcher] = None
        self._initialize_pieces()

    # -- init ----------------------------------------------------------------
    def _initialize_pieces(self) -> None:
        user_defined = []
        n = len(self.model_proto.pieces)
        self._scores = np.zeros(n, np.float32)
        self._types = np.zeros(n, np.int32)
        for i, sp in enumerate(self.model_proto.pieces):
            piece = sp.piece.encode("utf-8", errors="surrogateescape")
            if not piece:
                raise ValueError("piece must not be empty.")
            t = sp.type
            self._types[i] = t
            self._scores[i] = sp.score
            self._piece_bytes.append(piece)
            target = (self.pieces if t in (PieceType.NORMAL,
                                           PieceType.USER_DEFINED,
                                           PieceType.UNUSED)
                      else self.reserved_id_map)
            if piece in target:
                raise ValueError(f"{sp.piece} is already defined.")
            target[piece] = i
            if t == PieceType.USER_DEFINED:
                user_defined.append(piece)
            if t == PieceType.UNKNOWN:
                if self.unk_id >= 0:
                    raise ValueError("unk is already defined.")
                self.unk_id = i
        if self.unk_id == -1:
            raise ValueError("unk is not defined.")
        self.matcher = PrefixMatcher(user_defined)

    # -- accessors (reference model_interface.h:117-315) ---------------------
    def piece_to_id(self, piece: bytes) -> int:
        if isinstance(piece, str):
            piece = piece.encode("utf-8", errors="surrogateescape")
        rid = self.reserved_id_map.get(piece)
        if rid is not None:
            return rid
        return self.pieces.get(piece, self.unk_id)

    def id_to_piece(self, idx: int) -> bytes:
        return self._piece_bytes[idx]

    def get_piece_size(self) -> int:
        return len(self._piece_bytes)

    def get_score(self, idx: int) -> float:
        return float(self._scores[idx])

    def is_unknown(self, idx: int) -> bool:
        return int(self._types[idx]) == PieceType.UNKNOWN

    def is_control(self, idx: int) -> bool:
        return int(self._types[idx]) == PieceType.CONTROL

    def is_unused(self, idx: int) -> bool:
        return int(self._types[idx]) == PieceType.UNUSED

    def is_user_defined(self, idx: int) -> bool:
        return int(self._types[idx]) == PieceType.USER_DEFINED

    @property
    def scores(self) -> np.ndarray:
        return self._scores

    @property
    def types(self) -> np.ndarray:
        return self._types

    def _spec_piece(self, name: str, default: str) -> str:
        ts = self.model_proto.trainer_spec
        if ts is None:
            return default
        v = getattr(ts, name)
        return v if v else default

    def unk_piece(self) -> str:
        return self._spec_piece("unk_piece", "<unk>")

    def bos_piece(self) -> str:
        return self._spec_piece("bos_piece", "<s>")

    def eos_piece(self) -> str:
        return self._spec_piece("eos_piece", "</s>")

    def pad_piece(self) -> str:
        return self._spec_piece("pad_piece", "<pad>")

    # -- interface -----------------------------------------------------------
    def encode(self, normalized: bytes) -> EncodeResult:
        raise NotImplementedError

    def nbest_encode(self, normalized: bytes, nbest_size: int
                     ) -> NBestEncodeResult:
        raise NotImplementedError("This model does not support NBestEncode.")

    def sample_encode(self, normalized: bytes, theta: float,
                      rng=None) -> EncodeResult:
        raise NotImplementedError("This model does not support SampleEncode.")
