# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""SentencePieceProcessor: the user-facing host API.

Facade over normalizer + model, mirroring reference
src/sentencepiece_processor.{h,cc}: model loading with embedded self-test
replay (sentencepiece_processor.cc:119-157), encode with offset realignment
and adjacent-UNK merging (:488-576), sample/nbest dispatch (:622-659), decode
with unk_surface substitution (:670-733), extra options "reverse:bos:eos"
(:945-1023), and vocabulary restriction (:203-274).

The batched jit-able TPU API lives in ``sentencepiece_tpu.batch``; this class
is the exact scalar engine and the conformance reference for it.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np

from .models import factory
from .models.base import EncodeResult
from .normalizer.normalize import Normalizer
from .proto.spec import (ModelProto, ModelType, NBestSentencePieceText,
                         PieceType, SentencePieceText, SentencePieceTextPiece)

_SPACE_SYMBOL = b"\xe2\x96\x81"
_DEFAULT_UNK_SURFACE = " ⁇ "

_EXTRA_OPTIONS = {"bos": "bos", "eos": "eos", "reverse": "reverse"}


class _FusedBpeAdapter:
    """ids interface over native.FusedBpeEncoder: resolves unk spans
    through the full piece map (reserved pieces included, models/bpe.py)
    and applies the adjacent-unknown merge — both skipped entirely for
    batches with no unknown spans (the common case)."""

    def __init__(self, sp: "SentencePieceProcessor", fe):
        self.sp = sp
        self.fe = fe

    def encode_ids_batch(self, raws):
        r = self.fe.encode_batch(raws)
        if r is None:
            return None
        ids, starts, lens, off, norm, norm_off = r
        m = int(off[-1])
        idsv = ids[:m]
        unk_id = self.fe.enc.unk_id
        unk_pos = np.nonzero(idsv == unk_id)[0]
        if not len(unk_pos):
            return idsv, off
        # only rows CONTAINING an unk need Python resolution; runs of
        # clean rows between them pass through as single views
        bad = np.unique(np.searchsorted(off, unk_pos, side="right") - 1)
        is_unknown = self.sp.model.is_unknown
        p2i = self.sp.model.piece_to_id
        lens_out = np.diff(off)
        parts = []
        prev_end = 0
        for i in bad.tolist():
            a, b = int(off[i]), int(off[i + 1])
            if a > prev_end:
                parts.append(idsv[prev_end:a])
            base = int(norm_off[i])
            row: List[int] = []
            prev_unk = False
            for k in range(a, b):
                pid = int(idsv[k])
                if pid == unk_id:
                    w = norm[base + starts[k]:
                             base + starts[k] + lens[k]].tobytes()
                    pid = p2i(w)
                unk = is_unknown(pid)
                if not (unk and prev_unk):
                    row.append(pid)
                prev_unk = unk
            parts.append(np.asarray(row, np.int32))
            lens_out[i] = len(row)
            prev_end = b
        if prev_end < m:
            parts.append(idsv[prev_end:m])
        res_off = np.zeros(len(raws) + 1, np.int64)
        np.cumsum(lens_out, out=res_off[1:])
        return np.concatenate(parts) if parts else idsv[:0], res_off

    def encode_ids(self, raw):
        r = self.fe.encode_one(raw)
        if r is None:
            return None
        ids, starts, lens, norm, n_ids = r  # scratch views: consume now
        out = ids[:n_ids].tolist()
        unk_id = self.fe.enc.unk_id
        if unk_id not in out:
            return out
        is_unknown = self.sp.model.is_unknown
        p2i = self.sp.model.piece_to_id
        res: List[int] = []
        prev_unk = False
        for k, pid in enumerate(out):
            if pid == unk_id:
                pid = p2i(norm[starts[k]:starts[k] + lens[k]].tobytes())
            unk = is_unknown(pid)
            if not (unk and prev_unk):
                res.append(pid)
            prev_unk = unk
        return res

TextInput = Union[str, bytes]


class SentencePieceProcessor:
    def __init__(self, model_file: Optional[str] = None,
                 model_proto: Optional[Union[ModelProto, bytes]] = None):
        self.model_proto: Optional[ModelProto] = None
        self.model = None
        self.normalizer: Optional[Normalizer] = None
        self._encode_extra_options: List[str] = []
        self._decode_extra_options: List[str] = []
        if model_file is not None:
            self.load(model_file)
        elif model_proto is not None:
            if isinstance(model_proto, (bytes, bytearray)):
                self.load_from_serialized_proto(bytes(model_proto))
            else:
                self.load_model_proto(model_proto)

    # -- loading --------------------------------------------------------------
    def load(self, model_file: str) -> None:
        with open(model_file, "rb") as f:
            self.load_from_serialized_proto(f.read())

    def load_from_serialized_proto(self, serialized: bytes) -> None:
        self.load_model_proto(ModelProto.parse(serialized))

    def load_model_proto(self, model_proto: ModelProto) -> None:
        self.model_proto = model_proto
        self.model = factory.create(model_proto)
        ts = model_proto.trainer_spec
        ns = model_proto.normalizer_spec
        suffix = bool(ts.treat_whitespace_as_suffix) if ts else False
        self.normalizer = Normalizer(ns, suffix)
        self.normalizer.set_prefix_matcher(self.model.matcher)
        self._fused = None
        # Self-test replay (sentencepiece_processor.cc:137-154).
        std = model_proto.self_test_data
        if std is not None:
            errors = []
            for s in std.samples:
                result = " ".join(self.encode_as_pieces(s.input))
                if s.expected != result:
                    errors.append((s.input, s.expected, result))
            if errors:
                raise RuntimeError(f"Self-test failures: {errors[:3]}")

    # -- DI hooks for tests (sentencepiece_processor.cc:1030-1042) ------------
    def set_model(self, model) -> None:
        self.model = model
        self._fused = None

    def set_normalizer(self, normalizer: Normalizer) -> None:
        self.normalizer = normalizer
        self._fused = None

    _fused = None

    def _fused_encoder(self):
        """Fully-native ids path (normalize + Viterbi + UNK merge in one
        library call); None when the model/normalizer combination isn't
        eligible. The Python composition below stays the spec."""
        if self._fused is None:
            try:
                from .models.unigram import UnigramModel
                from .models.bpe import BpeModel
                from . import native as native_mod

                f = False
                if (isinstance(self.model, UnigramModel)
                        and self.model.unk_id >= 0):
                    enc = self.model._native_encoder()
                    norm = self.normalizer._native_impl()
                    if enc is not None and norm is not None:
                        fe = native_mod.FusedUnigramEncoder(norm, enc)
                        f = fe if fe.ok else False
                elif isinstance(self.model, BpeModel):
                    enc = self.model._native_encoder()
                    norm = self.normalizer._native_impl()
                    if enc is not None and norm is not None:
                        fe = native_mod.FusedBpeEncoder(norm, enc)
                        f = _FusedBpeAdapter(self, fe) if fe.ok else False
                self._fused = f
            except Exception:
                self._fused = False
        return self._fused or None

    # -- extra options ---------------------------------------------------------
    def set_encode_extra_options(self, extra_options: str) -> None:
        self._encode_extra_options = self._parse_extra_options(extra_options)

    def set_decode_extra_options(self, extra_options: str) -> None:
        self._decode_extra_options = self._parse_extra_options(extra_options)

    def _parse_extra_options(self, extra_option: str) -> List[str]:
        if not extra_option:
            return []
        out = []
        for s in extra_option.split(":"):
            if s not in _EXTRA_OPTIONS:
                raise ValueError(f'option "{s}" is not available.')
            if s == "bos" and self.is_unknown(
                    self.piece_to_id(self.model.bos_piece())):
                raise ValueError(f"id for `{self.model.bos_piece()}` "
                                 "is not defined.")
            if s == "eos" and self.is_unknown(
                    self.piece_to_id(self.model.eos_piece())):
                raise ValueError(f"id for `{self.model.eos_piece()}` "
                                 "is not defined.")
            out.append(s)
        return out

    def _apply_extra_options(self, options: List[str],
                             spt: SentencePieceText) -> None:
        for opt in options:
            if opt == "reverse":
                spt.pieces = list(reversed(spt.pieces))
            elif opt == "eos":
                p = SentencePieceTextPiece()
                p.id = self.piece_to_id(self.model.eos_piece())
                p.piece = self.model.eos_piece()
                spt.pieces = spt.pieces + [p]
            elif opt == "bos":
                p = SentencePieceTextPiece()
                p.id = self.piece_to_id(self.model.bos_piece())
                p.piece = self.model.bos_piece()
                spt.pieces = [p] + spt.pieces

    # -- vocabulary restriction -------------------------------------------------
    def set_vocabulary(self, valid_vocab: Sequence[str]) -> None:
        """Flip out-of-vocab NORMAL pieces to UNUSED
        (sentencepiece_processor.cc:203-241)."""
        ts = self.model_proto.trainer_spec
        if ts.model_type not in (ModelType.UNIGRAM, ModelType.BPE):
            raise ValueError(
                "Vocabulary constraint is only enabled in subword units.")
        from .utils.unicode import one_char_len

        vocab = set(valid_vocab)
        for piece in self.model_proto.pieces:
            if piece.type in (PieceType.CONTROL, PieceType.UNKNOWN,
                              PieceType.USER_DEFINED):
                continue
            raw = piece.piece.encode("utf-8", errors="surrogateescape")
            if piece.piece in vocab or one_char_len(raw[0]) == len(raw):
                piece.type = PieceType.NORMAL
            else:
                piece.type = PieceType.UNUSED
        self.load_model_proto(self.model_proto)

    def reset_vocabulary(self) -> None:
        for piece in self.model_proto.pieces:
            if piece.type == PieceType.UNUSED:
                piece.type = PieceType.NORMAL
        self.load_model_proto(self.model_proto)

    def load_vocabulary(self, filename: str, threshold: int) -> None:
        vocab = []
        with open(filename, "rb") as f:
            # ReadLine semantics: split on \n ONLY — \r can be a real
            # piece (CRLF corpora tokenize it); splitlines() would split it
            lines = f.read().split(b"\n")
            if lines and lines[-1] == b"":
                lines.pop()
            for raw in lines:
                line = raw.decode("utf-8", errors="surrogateescape")
                v = line.split("\t")
                assert len(v) >= 1 and v[0]
                freq = int(v[1]) if len(v) >= 2 else 1
                if freq >= threshold:
                    vocab.append(v[0])
        self.set_vocabulary(vocab)

    # -- encode ------------------------------------------------------------------
    def _encode_spt(self, text: TextInput, result: EncodeResult,
                    normalized: bytes, norm_to_orig: np.ndarray
                    ) -> SentencePieceText:
        """PopulateSentencePieceText (sentencepiece_processor.cc:488-551)."""
        raw = text.encode("utf-8", errors="surrogateescape") if isinstance(text, str) else bytes(text)
        spt = SentencePieceText()
        pieces: List[SentencePieceTextPiece] = []
        consumed = 0
        is_prev_unk = False
        for w, pid in result:
            assert w, "Empty piece is not allowed."
            is_unk = self.model.is_unknown(pid)
            if self.model.is_control(pid):
                p = SentencePieceTextPiece()
                p.piece = w.decode("utf-8", errors="surrogateescape")
                p.id = pid
                b = int(norm_to_orig[consumed])
                p.begin = b
                p.end = b
                p.surface = ""
                pieces.append(p)
            else:
                begin, end = consumed, consumed + len(w)
                orig_begin = int(norm_to_orig[begin])
                orig_end = int(norm_to_orig[end])
                surface = raw[orig_begin:orig_end]
                if is_prev_unk and is_unk:
                    last = pieces[-1]
                    last.piece = last.piece + w.decode("utf-8",
                                                       errors="surrogateescape")
                    last.surface = (last.surface
                                    + surface.decode("utf-8",
                                                     errors="surrogateescape"))
                    last.end = orig_end
                else:
                    p = SentencePieceTextPiece()
                    p.piece = w.decode("utf-8", errors="surrogateescape")
                    p.id = pid
                    p.surface = surface.decode("utf-8",
                                               errors="surrogateescape")
                    p.begin = orig_begin
                    p.end = orig_end
                    pieces.append(p)
                consumed += len(w)
            is_prev_unk = is_unk
        assert consumed == len(normalized), \
            "all normalized characters are not consumed."
        spt.pieces = pieces
        self._apply_extra_options(self._encode_extra_options, spt)
        spt.text = raw.decode("utf-8", errors="surrogateescape")
        return spt

    def encode(self, text: TextInput) -> SentencePieceText:
        normalized, norm_to_orig = self.normalizer.normalize(text)
        result = self.model.encode(normalized)
        return self._encode_spt(text, result, normalized, norm_to_orig)

    def encode_as_pieces(self, text: TextInput):
        """Fast path: piece strings only (adjacent-UNK pieces concatenate,
        mirroring PopulateSentencePieceText's merge without computing
        surfaces/offsets). Accepts a single text or a list."""
        if isinstance(text, (list, tuple)):
            return self.encode_as_pieces_batch(text)
        if self._encode_extra_options:
            return [p.piece for p in self.encode(text).pieces]
        fused = self._fused_encoder()
        if fused is not None and hasattr(fused, "encode_pieces_batch"):
            raw = (text.encode("utf-8", errors="surrogateescape")
                   if isinstance(text, str) else bytes(text))
            r = fused.encode_pieces_batch([raw])
            if r is not None:
                _ids, off, starts, lens, norm, _noff = r
                return [norm[starts[k]:starts[k] + lens[k]].tobytes()
                        .decode("utf-8", errors="surrogateescape")
                        for k in range(int(off[1]))]
        normalized, _ = self.normalizer.normalize(text)
        result = self.model.encode(normalized)
        pieces: List[str] = []
        prev_unk = False
        is_unknown = self.model.is_unknown
        for w, pid in result:
            unk = is_unknown(pid)
            piece = w.decode("utf-8", errors="surrogateescape")
            if unk and prev_unk:
                pieces[-1] += piece
            else:
                pieces.append(piece)
            prev_unk = unk
        return pieces

    def encode_as_ids(self, text: TextInput):
        """Fast path: ids only — skips surface/offset realignment (which
        PopulateSentencePieceText computes for the full proto result) but
        keeps its adjacent-UNK merge and extra options
        (sentencepiece_processor.cc:506-521, 945-979). Accepts a single
        text or a list of texts (reference python binding behavior)."""
        if isinstance(text, (list, tuple)):
            return self.encode_as_ids_batch(text)
        if self._encode_extra_options:
            return [p.id for p in self.encode(text).pieces]
        fused = self._fused_encoder()
        if fused is not None:
            raw = (text.encode("utf-8", errors="surrogateescape")
                   if isinstance(text, str) else bytes(text))
            r = fused.encode_ids(raw)
            if r is not None:
                return r
        normalized, _ = self.normalizer.normalize(text)
        result = self.model.encode(normalized)
        ids: List[int] = []
        prev_unk = False
        is_unknown = self.model.is_unknown
        for _w, pid in result:
            unk = is_unknown(pid)
            if not (unk and prev_unk):
                ids.append(pid)
            prev_unk = unk
        return ids

    def encode_as_pieces_batch(self, texts) -> List[List[str]]:
        """Batched pieces: one native call per batch when eligible."""
        if not self._encode_extra_options:
            fused = self._fused_encoder()
            if fused is not None and hasattr(fused, "encode_pieces_batch"):
                raws = [(t.encode("utf-8", errors="surrogateescape")
                         if isinstance(t, str) else bytes(t)) for t in texts]
                r = fused.encode_pieces_batch(raws)
                if r is not None:
                    _ids, off, starts, lens, norm, noff = r
                    out = []
                    for i in range(len(texts)):
                        base = int(noff[i])
                        out.append([
                            norm[base + starts[k]:
                                 base + starts[k] + lens[k]].tobytes()
                            .decode("utf-8", errors="surrogateescape")
                            for k in range(int(off[i]), int(off[i + 1]))])
                    return out
        return [self.encode_as_pieces(t) for t in texts]

    def encode_as_ids_batch(self, texts) -> List[List[int]]:
        """Batched ids: one native call per batch when eligible."""
        if not self._encode_extra_options:
            fused = self._fused_encoder()
            if fused is not None:
                raws = [(t.encode("utf-8", errors="surrogateescape")
                         if isinstance(t, str) else bytes(t)) for t in texts]
                r = fused.encode_ids_batch(raws)
                if r is not None:
                    ids, off = r
                    return [ids[off[i]:off[i + 1]].tolist()
                            for i in range(len(texts))]
        return [self.encode_as_ids(t) for t in texts]

    def nbest_encode(self, text: TextInput, nbest_size: int
                     ) -> NBestSentencePieceText:
        normalized, norm_to_orig = self.normalizer.normalize(text)
        nbests = self.model.nbest_encode(normalized, nbest_size)
        assert nbests, "NBestEncode returns empty result."
        out = NBestSentencePieceText()
        lst = []
        for result, score in nbests:
            spt = self._encode_spt(text, result, normalized, norm_to_orig)
            spt.score = score
            lst.append(spt)
        out.nbests = lst
        return out

    def nbest_encode_as_pieces(self, text: TextInput, nbest_size: int
                               ) -> List[List[str]]:
        return [[p.piece for p in spt.pieces]
                for spt in self.nbest_encode(text, nbest_size).nbests]

    def nbest_encode_as_ids(self, text: TextInput, nbest_size: int
                            ) -> List[List[int]]:
        return [[p.id for p in spt.pieces]
                for spt in self.nbest_encode(text, nbest_size).nbests]

    def sample_encode(self, text: TextInput, nbest_size: int, alpha: float,
                      rng=None) -> SentencePieceText:
        """Dispatch on nbest_size sign (sentencepiece_processor.cc:622-659)."""
        if nbest_size > 512:
            raise ValueError("nbest_size must be nbest_size <= 512")
        normalized, norm_to_orig = self.normalizer.normalize(text)
        if nbest_size in (0, 1):
            result = self.model.encode(normalized)
        elif nbest_size > 1:
            nbests = self.model.nbest_encode(normalized, nbest_size)
            assert nbests, "NBestEncode returns empty result."
            probs = np.array([np.exp(alpha * s) for _, s in nbests])
            probs /= probs.sum()
            if rng is None:
                from .utils.rng import get_generator
                rng = get_generator()
            result = nbests[int(rng.choice(len(nbests), p=probs))][0]
        else:
            result = self.model.sample_encode(normalized, alpha, rng=rng)
        return self._encode_spt(text, result, normalized, norm_to_orig)

    def sample_encode_as_pieces(self, text: TextInput, nbest_size: int,
                                alpha: float, rng=None) -> List[str]:
        return [p.piece
                for p in self.sample_encode(text, nbest_size, alpha, rng).pieces]

    def sample_encode_as_ids(self, text: TextInput, nbest_size: int,
                             alpha: float, rng=None) -> List[int]:
        return [p.id
                for p in self.sample_encode(text, nbest_size, alpha, rng).pieces]

    # -- decode --------------------------------------------------------------
    def _unk_surface(self) -> str:
        ts = self.model_proto.trainer_spec if self.model_proto else None
        if ts is not None and ts.has("unk_surface"):
            return ts.unk_surface
        return _DEFAULT_UNK_SURFACE

    def decode_pieces_to_spt(self, pieces: Sequence[str]) -> SentencePieceText:
        """Reference Decode (sentencepiece_processor.cc:670-733)."""
        spt = SentencePieceText()
        plist = []
        for w in pieces:
            p = SentencePieceTextPiece()
            p.piece = w
            p.id = self.piece_to_id(w)
            plist.append(p)
        spt.pieces = plist
        self._apply_extra_options(self._decode_extra_options, spt)

        unk_surface = self._unk_surface()
        text = ""
        for p in spt.pieces:
            piece = p.piece
            if self.is_control(p.id):
                surface = ""
            elif self.is_unknown(p.id):
                surface = (unk_surface if self.id_to_piece(p.id) == piece
                           else piece)
            else:
                if not text:
                    # strip BOS whitespace prefix
                    if piece.startswith("▁"):
                        piece = piece[len("▁"):]
                surface = piece.replace("▁", " ")
            p.surface = surface
            p.begin = len(text.encode("utf-8", errors="surrogateescape"))
            text += surface
            p.end = len(text.encode("utf-8", errors="surrogateescape"))
        spt.text = text
        return spt

    def decode_pieces(self, pieces: Sequence[str]) -> str:
        return self.decode_pieces_to_spt(pieces).text

    def decode_ids_to_spt(self, ids: Sequence[int]) -> SentencePieceText:
        return self.decode_pieces_to_spt(
            [self.id_to_piece(int(i)) for i in ids])

    def decode_ids(self, ids: Sequence[int]) -> str:
        return self.decode_ids_to_spt(ids).text

    # -- serialized-proto variants (for parity with bindings) -----------------
    def encode_as_serialized_proto(self, text: TextInput) -> bytes:
        return self.encode(text).serialize()

    def sample_encode_as_serialized_proto(self, text: TextInput,
                                          nbest_size: int, alpha: float
                                          ) -> bytes:
        return self.sample_encode(text, nbest_size, alpha).serialize()

    def nbest_encode_as_serialized_proto(self, text: TextInput,
                                         nbest_size: int) -> bytes:
        return self.nbest_encode(text, nbest_size).serialize()

    def decode_pieces_as_serialized_proto(self, pieces: Sequence[str]) -> bytes:
        return self.decode_pieces_to_spt(pieces).serialize()

    def decode_ids_as_serialized_proto(self, ids: Sequence[int]) -> bytes:
        return self.decode_ids_to_spt(ids).serialize()

    # -- accessors ---------------------------------------------------------------
    def get_piece_size(self) -> int:
        return self.model.get_piece_size()

    def piece_to_id(self, piece: str) -> int:
        return self.model.piece_to_id(
            piece.encode("utf-8", errors="surrogateescape") if isinstance(piece, str) else piece)

    def id_to_piece(self, idx: int) -> str:
        return self.model.id_to_piece(idx).decode("utf-8",
                                                  errors="surrogateescape")

    def get_score(self, idx: int) -> float:
        return self.model.get_score(idx)

    def is_unknown(self, idx: int) -> bool:
        return self.model.is_unknown(idx)

    def is_control(self, idx: int) -> bool:
        return self.model.is_control(idx)

    def is_unused(self, idx: int) -> bool:
        return self.model.is_unused(idx)

    def unk_id(self) -> int:
        i = self.piece_to_id(self.model.unk_piece())
        return i if self.is_unknown(i) else -1

    def bos_id(self) -> int:
        i = self.piece_to_id(self.model.bos_piece())
        return i if self.is_control(i) else -1

    def eos_id(self) -> int:
        i = self.piece_to_id(self.model.eos_piece())
        return i if self.is_control(i) else -1

    def pad_id(self) -> int:
        i = self.piece_to_id(self.model.pad_piece())
        return i if self.is_control(i) else -1

    # -- pythonic sugar (parity with the reference SWIG binding) --------------
    def __len__(self) -> int:
        return self.get_piece_size()

    def __getitem__(self, piece: str) -> int:
        return self.piece_to_id(piece)

    # CamelCase aliases (the reference python binding exposes both).
    Load = load
    LoadOrDie = load  # binding alias (sentencepiece.py: dies on failure;
    #                   here load() already raises)
    LoadFromSerializedProto = load_from_serialized_proto
    Encode = encode
    EncodeAsPieces = encode_as_pieces
    EncodeAsIds = encode_as_ids
    NBestEncodeAsPieces = nbest_encode_as_pieces
    NBestEncodeAsIds = nbest_encode_as_ids
    SampleEncodeAsPieces = sample_encode_as_pieces
    SampleEncodeAsIds = sample_encode_as_ids
    DecodePieces = decode_pieces
    DecodeIds = decode_ids
    EncodeAsSerializedProto = encode_as_serialized_proto
    SampleEncodeAsSerializedProto = sample_encode_as_serialized_proto
    NBestEncodeAsSerializedProto = nbest_encode_as_serialized_proto
    DecodePiecesAsSerializedProto = decode_pieces_as_serialized_proto
    DecodeIdsAsSerializedProto = decode_ids_as_serialized_proto
    GetPieceSize = get_piece_size
    PieceToId = piece_to_id
    IdToPiece = id_to_piece
    GetScore = get_score
    IsUnknown = is_unknown
    IsControl = is_control
    IsUnused = is_unused
    SetEncodeExtraOptions = set_encode_extra_options
    SetDecodeExtraOptions = set_decode_extra_options
    SetVocabulary = set_vocabulary
    ResetVocabulary = reset_vocabulary
    LoadVocabulary = load_vocabulary
