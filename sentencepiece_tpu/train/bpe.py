# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""BPE trainer (reference src/bpe_model_trainer.{h,cc}).

Exact-output host implementation of the greedy pair-merge loop:

  * symbols interned by 64-bit FingerprintCat of child fingerprints in a
    libstdc++-exact unordered_map emulation (bpe_model_trainer.cc:57;
    utils/stdhashtable.py) — the map's iteration order feeds
    UpdateActiveSymbols' partial_sort, whose equal-frequency cutoff
    behavior is observable in the merge tail at large vocab sizes;
  * per-symbol position sets ordered by (sid, left, right)
    (std::set<uint64> of sid<<32|left<<16|right, bpe_model_trainer.h:84-101);
  * lazy ComputeFreq with overlap dedup — "AAA" counts one "AA" — and stale
    position erasure with overlap-tracker reset (cc:85-116);
  * active set = top max(1000, 5% of cache) by freq via a faithful
    std::partial_sort port, refreshed every 100 merges (cc:156-183,
    234-237); the argmax scan visits it in symbol-creation order
    (standing in for std::set<Symbol*> pointer order);
  * best-pair tie-break: freq desc, then char-length asc, then UTF-8 string
    asc (cc:240-254);
  * merge applied at every stored position in ascending order, resetting
    neighbor-pair freqs and adding the two new neighbor pairs (cc:283-309);
  * piece score = -merge_rank (cc:269-270); required chars appended after
    the merge loop (cc:317-321).

The device-parallel pair-count path lives in sentencepiece_tpu.tpu
.bpe_train; this module is the byte-exact conformance engine.
"""

from __future__ import annotations

import bisect
import logging
from typing import Dict, List, Optional, Set, Tuple

from ..proto.spec import ModelProto, ModelType
from ..utils.stdhashtable import StdUnorderedMap, fingerprint_cat
from ..utils.stdheap import std_partial_sort, std_partial_sort_freq_desc
from .interface import TrainerInterface, UNK_CHAR, sorted_freq_desc

log = logging.getLogger("sentencepiece_tpu.train")


class _Symbol:
    __slots__ = ("left", "right", "chars", "is_unk", "freq", "positions",
                 "key", "cidx", "str", "ub", "nch", "pos_sorted")

    def __init__(self):
        self.left: Optional["_Symbol"] = None
        self.right: Optional["_Symbol"] = None
        self.chars: Tuple[int, ...] = ()
        self.is_unk = False
        self.freq = 0
        self.positions: Set[int] = set()
        self.key = None   # 64-bit fingerprint (reference Symbol::fp)
        self.cidx = 0     # creation order (stands in for pointer order)
        self.str = ""     # cached string / utf8 (chars are immutable)
        self.ub = b""
        self.nch = 0
        self.pos_sorted: Optional[List[int]] = None

    @property
    def is_bigram(self) -> bool:
        return self.left is not None and self.right is not None

    def to_string(self) -> str:
        return self.str

    def utf8(self) -> bytes:
        return self.ub


def _encode_pos(sid: int, l: int, r: int) -> int:
    assert 0 <= l <= 0xFFFF and 0 <= r <= 0xFFFF, \
        "BPE sentence has more than 65536 symbols"
    return (sid << 32) | (l << 16) | r


def _decode_pos(n: int) -> Tuple[int, int, int]:
    return n >> 32, (n >> 16) & 0xFFFF, n & 0xFFFF


class Trainer(TrainerInterface):
    """``engine="exact"`` (default): host merge loop, byte-identical vocab
    vs the reference. ``engine="device"``: dense pair-count histogram +
    merge loop on the jax device mesh with psum reduction
    (tpu/bpe_train.py) — the scale path; falls back to exact when the
    symbol universe exceeds the dense-histogram bound."""

    def __init__(self, trainer_spec, normalizer_spec, engine: str = "exact"):
        super().__init__(trainer_spec, normalizer_spec)
        assert engine in ("exact", "device")
        self.engine = engine
        # symbols_cache_ emulates the reference's
        # unordered_map<uint64, Symbol*> INCLUDING iteration order (see
        # utils/stdhashtable.py): UpdateActiveSymbols' partial_sort cutoff
        # among equal-frequency symbols observes it, and so therefore does
        # the trained merge tail at large vocab sizes.
        self._cache: StdUnorderedMap = StdUnorderedMap()
        self._active: Set[_Symbol] = set()
        self._active_list: List[_Symbol] = []  # cidx asc; lazily pruned
        # (left.key, right.key) -> Symbol|None memo over _get_pair_symbol:
        # skips the fingerprint + hashtable walk for repeated pair queries.
        # Entries are dropped when the symbol is erased from the cache
        # (the reference then allocates a FRESH Symbol on next query).
        self._pair_memo: Dict[Tuple[int, int], Optional[_Symbol]] = {}
        self._symbols: List[List[Optional[_Symbol]]] = []
        self._n_created = 0

    # -- symbol interning ------------------------------------------------------
    def _get_char_symbol(self, c: int) -> _Symbol:
        freq = self.required_chars.get(c, 1)
        s = self._cache.get(c)
        if s is not None:
            return s
        s = _Symbol()
        s.is_unk = (c == UNK_CHAR)
        s.chars = (c,)
        s.str = chr(c)
        s.ub = s.str.encode("utf-8", errors="surrogateescape")
        s.nch = 1
        s.freq = freq
        s.key = c  # fp of a char symbol is the codepoint (cc:57-63)
        s.cidx = self._n_created
        self._n_created += 1
        self._cache.insert(c, s)
        return s

    _MISS = object()

    def _get_pair_symbol(self, left: Optional[_Symbol],
                         right: Optional[_Symbol]) -> Optional[_Symbol]:
        if left is None or right is None or left.is_unk or right.is_unk:
            return None
        memo_key = (left.key, right.key)
        hit = self._pair_memo.get(memo_key, self._MISS)
        if hit is not self._MISS:
            return hit
        key = fingerprint_cat(left.key, right.key)
        s = self._cache.get(key)
        if s is not None:
            self._pair_memo[memo_key] = s
            return s
        chars = left.chars + right.chars
        if not self.is_valid_sentencepiece(chars):
            self._pair_memo[memo_key] = None
            return None
        s = _Symbol()
        s.left = left
        s.right = right
        s.chars = chars
        s.str = left.str + right.str
        s.ub = left.ub + right.ub
        s.nch = len(chars)
        s.key = key
        s.cidx = self._n_created
        self._n_created += 1
        self._cache.insert(key, s)
        self._pair_memo[memo_key] = s
        return s

    # -- lazy frequency (bpe_model_trainer.cc:85-116) ---------------------------
    def _compute_freq(self, symbol: _Symbol) -> None:
        if symbol.freq > 0:
            return
        prev_sid, prev_right = -1, 0
        kept: List[int] = []
        freq = 0
        syms = self._symbols
        ps = symbol.pos_sorted
        if ps is None or len(ps) != len(symbol.positions):
            ps = sorted(symbol.positions)
        for enc in ps:
            sid, l, r = _decode_pos(enc)
            if ((sid == prev_sid and l == prev_right)
                    or syms[sid][l] is not symbol.left
                    or syms[sid][r] is not symbol.right):
                prev_sid, prev_right = -1, 0
            else:
                freq += self.sentences[sid][1]
                prev_sid, prev_right = sid, r
                kept.append(enc)
        symbol.freq = freq
        symbol.positions = set(kept)
        symbol.pos_sorted = kept  # enumerated ascending -> sorted

    def _get_next_index(self, sid: int, index: int) -> int:
        row = self._symbols[sid]
        for i in range(index + 1, len(row)):
            if row[i] is not None:
                return i
        return -1

    def _get_prev_index(self, sid: int, index: int) -> int:
        row = self._symbols[sid]
        for i in range(index - 1, -1, -1):
            if row[i] is not None:
                return i
        return -1

    def _add_new_pair(self, sid: int, left: int, right: int) -> None:
        if left == -1 or right == -1:
            return
        symbol = self._get_pair_symbol(self._symbols[sid][left],
                                       self._symbols[sid][right])
        if symbol is not None:
            if symbol not in self._active:
                self._active.add(symbol)
                bisect.insort(self._active_list, symbol,
                              key=lambda s: s.cidx)
            symbol.positions.add(_encode_pos(sid, left, right))

    def _reset_freq(self, sid: int, left: int, right: int,
                    best: _Symbol) -> None:
        if left == -1 or right == -1:
            return
        symbol = self._get_pair_symbol(self._symbols[sid][left],
                                       self._symbols[sid][right])
        if symbol is not None and symbol is not best:
            symbol.freq = 0

    def _update_active_symbols(self) -> None:
        """Top max(1000, 5%·cache) bigrams by freq (cc:156-183), with the
        reference's EXACT tie behavior: candidates enumerate in the
        emulated unordered_map iteration order and go through a faithful
        std::partial_sort (freq-desc comparator only), so WHICH
        equal-frequency symbols survive the cutoff matches libstdc++."""
        symbols = []
        for s in self._cache.values():
            if s.left is not None and s.right is not None:
                if s.freq <= 0:
                    self._compute_freq(s)
                symbols.append(s)
        if not symbols:
            self._active = set()
            self._active_list = []
            return
        k_min, k_ratio = 1000, 0.05
        size = min(max(k_min, int(len(self._cache) * k_ratio)), len(symbols))
        std_partial_sort_freq_desc(symbols, size)
        log.info("Updating active symbols. max_freq=%d min_freq=%d",
                 symbols[0].freq, symbols[size - 1].freq)
        self._active = set(symbols[:size])
        self._active_list = sorted(self._active, key=lambda s: s.cidx)

    # -- main loop (cc:186-326) --------------------------------------------------
    def train(self) -> ModelProto:
        assert self.normalizer_spec.escape_whitespaces
        assert self.trainer_spec.model_type == ModelType.BPE
        self.load_sentences()
        if self.trainer_spec.split_by_whitespace:
            self.split_sentences_by_whitespace()

        if self.engine == "exact":
            # C++ merge core with REAL libstdc++ containers — identical by
            # construction to the emulated loop below (the validated spec);
            # falls through to Python when the native library is absent.
            vt = (self.trainer_spec.vocab_size - len(self.meta_pieces)
                  - len(self.required_chars))
            assert vt >= 0, "vocab_size too small for alphabet"
            merged = None
            try:
                from .. import native

                merged = native.bpe_train_merges_native(
                    [t for t, _ in self.sentences],
                    [f for _, f in self.sentences],
                    self.required_chars, self.trainer_spec, vt)
            except Exception:
                merged = None
            if merged is not None:
                for piece in merged:
                    self.final_pieces.append(
                        (piece, -float(len(self.final_pieces))))
                for cp, _freq in sorted_freq_desc(
                        self.required_chars.items()):
                    self.final_pieces.append(
                        (chr(cp), -float(len(self.final_pieces))))
                return self.save()

        self._symbols = []
        for s, _freq in self.sentences:
            self._symbols.append([self._get_char_symbol(ord(c)) for c in s])
        for sid, row in enumerate(self._symbols):
            for i in range(1, len(row)):
                self._add_new_pair(sid, i - 1, i)

        vocab_size = (self.trainer_spec.vocab_size - len(self.meta_pieces)
                      - len(self.required_chars))
        assert vocab_size >= 0, "vocab_size too small for alphabet"
        dup = set()
        assert not self.final_pieces

        if self.engine == "device":
            import os

            from ..tpu import bpe_train, bpe_train_sparse

            force_sparse = os.environ.get("SPM_BPE_TRAIN_KERNEL") == "sparse"
            merged = None
            if not force_sparse:
                merged = bpe_train.train_device_bpe(
                    self, n_merges=vocab_size + 64)
            if merged is None:
                # sparse active-table engine: no dense-histogram universe
                # bound — reference-scale vocabs (32k+) run on the mesh
                merged = bpe_train_sparse.train_device_bpe_sparse(
                    self, n_merges=vocab_size + 64)
            if merged is not None:
                for s in merged:
                    if s in dup:
                        continue
                    dup.add(s)
                    self.final_pieces.append(
                        (s, -float(len(self.final_pieces))))
                    if len(self.final_pieces) >= vocab_size:
                        break
                for cp, _freq in sorted_freq_desc(
                        self.required_chars.items()):
                    self.final_pieces.append(
                        (chr(cp), -float(len(self.final_pieces))))
                return self.save()
            log.warning("device BPE engine unavailable for this corpus "
                        "size; using the exact host engine")

        while len(self.final_pieces) < vocab_size:
            if len(self.final_pieces) % 100 == 0:
                self._update_active_symbols()
            best: Optional[_Symbol] = None
            best_key = None
            # std::set<Symbol*> iterates in pointer order; allocation
            # order stands in for it (symbols are never freed mid-train).
            # _active_list is kept cidx-sorted; entries discarded from the
            # set are skipped here and dropped at the next rebuild.
            active = self._active
            for symbol in self._active_list:
                if symbol not in active:
                    continue
                if symbol.freq <= 0:
                    self._compute_freq(symbol)
                key = (-symbol.freq, symbol.nch, symbol.ub)
                if best is None or key < best_key:
                    best, best_key = symbol, key
            if best is None:
                log.warning("No valid symbol found")
                break
            bs = best.to_string()
            if bs in dup:
                self._cache.erase(best.key)
                self._pair_memo.pop((best.left.key, best.right.key), None)
                self._active.discard(best)
                continue
            dup.add(bs)
            self.final_pieces.append(
                (bs, -float(len(self.final_pieces))))
            if len(self.final_pieces) % 20 == 0:
                log.info("Added: freq=%d size=%d all=%d active=%d piece=%s",
                         best.freq, len(self.final_pieces),
                         len(self._cache), len(self._active), bs)

            bps = best.pos_sorted
            if bps is None or len(bps) != len(best.positions):
                bps = sorted(best.positions)
            for enc in bps:
                sid, left, right = _decode_pos(enc)
                row = self._symbols[sid]
                if row[left] is None:
                    continue
                assert row[right] is not None
                nxt = self._get_next_index(sid, right)
                prv = self._get_prev_index(sid, left)
                self._reset_freq(sid, prv, left, best)
                self._reset_freq(sid, right, nxt, best)
                row[left] = best
                row[right] = None
                self._add_new_pair(sid, prv, left)
                self._add_new_pair(sid, left, nxt)

            self._cache.erase(best.key)
            self._pair_memo.pop((best.left.key, best.right.key), None)
            self._active.discard(best)

        for cp, _freq in sorted_freq_desc(self.required_chars.items()):
            symbol = self._get_char_symbol(cp)
            self.final_pieces.append(
                (symbol.to_string(), -float(len(self.final_pieces))))

        return self.save()
