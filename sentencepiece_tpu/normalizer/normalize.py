# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Text normalizer: longest-match string rewriting with byte alignment.

Host-exact mirror of reference src/normalizer.cc:88-300, re-expressed as an
array program: the data-dependent per-position trie walks are hoisted into
one dense vectorized pass (``prefix_matches_dense``) over the whole input,
after which assembly is a linear chunk scan. The same two-phase structure is
what the batched TPU kernel uses.

Semantics reproduced exactly:
  * longest charsmap rule match per position; user-defined symbols matched
    first and passed through verbatim (normalizer.cc:239-243)
  * unmatched position: one valid UTF-8 char, or U+FFFD consuming ONE byte
    for malformed input (normalizer.cc:271-291)
  * remove_extra_whitespaces: leading/trailing/duplicate space removal
  * add_dummy_prefix: U+2581 prefix (or suffix in
    treat_whitespace_as_suffix mode), escape_whitespaces: ' ' -> U+2581
  * norm_to_orig: for each normalized byte, the byte offset in the original
    input of the chunk that produced it; plus a final sentinel
    (len == len(normalized)+1, normalizer.cc:206-208)
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from . import charsmap as charsmap_lib
from ..utils.unicode import is_valid_decode_utf8, one_char_len

SPACE_SYMBOL = b"\xe2\x96\x81"  # U+2581 LOWER ONE EIGHTH BLOCK
REPLACEMENT_CHAR = b"\xef\xbf\xbd"  # U+FFFD


class PrefixMatcher:
    """Longest-prefix matcher over a string set (normalizer.cc:343-405)."""

    def __init__(self, strings):
        strings = sorted(set(s.encode("utf-8", errors="surrogateescape") if isinstance(s, str) else bytes(s)
                             for s in strings))
        from ..utils import darts
        self._trie = darts.build(strings) if strings else None
        self._max_len = max((len(s) for s in strings), default=0)
        self._lead_bytes = bytes(sorted(set(s[0] for s in strings)))

    @property
    def empty(self) -> bool:
        return self._trie is None

    def prefix_match(self, data: bytes, pos: int = 0) -> Tuple[int, bool]:
        """Returns (consumed_bytes, found). Without a match: one char."""
        if self._trie is None:
            return min(len(data) - pos, one_char_len(data[pos])), False
        results = self._trie.common_prefix_search(data, pos)
        if not results:
            return min(len(data) - pos, one_char_len(data[pos])), False
        return max(l for _, l in results), True

    def prefix_matches_dense(self, data: np.ndarray) -> np.ndarray:
        """int32[n]: longest user-symbol match length at each position, 0 if none."""
        n = len(data)
        if self._trie is None or n == 0:
            return np.zeros(n, dtype=np.int32)
        vals = self._trie.prefix_matches_dense(data, self._max_len)
        depth = np.arange(1, self._max_len + 1, dtype=np.int32)
        hit = vals >= 0
        return np.where(hit, depth[None, :], 0).max(axis=1)

    def global_replace(self, data: bytes, replacement: bytes) -> bytes:
        """Replace every matched entry with ``replacement`` (normalizer.cc:391-405)."""
        if self._trie is None or not any(
                data.find(b) >= 0 for b in self._lead_bytes):
            # no pattern lead byte present -> nothing can match
            return bytes(data)
        out = bytearray()
        pos = 0
        while pos < len(data):
            mblen, found = self.prefix_match(data, pos)
            if found:
                out += replacement
            else:
                out += data[pos:pos + mblen]
            pos += mblen
        return bytes(out)


class Normalizer:
    """Exact normalizer runtime (reference src/normalizer.{h,cc})."""

    def __init__(self, spec, treat_whitespace_as_suffix: bool = False):
        """``spec``: a proto.spec.NormalizerSpec."""
        self.spec = spec
        self.treat_whitespace_as_suffix = treat_whitespace_as_suffix
        self.matcher: Optional[PrefixMatcher] = None
        blob = spec.precompiled_charsmap
        if blob:
            self.trie, self.pool = charsmap_lib.decode_blob(blob)
            self._pool_np = np.frombuffer(self.pool, dtype=np.uint8)
            self._max_rule_len = None  # lazy: BFS is costly on big blobs
        else:
            self.trie, self.pool = None, b""
            self._pool_np = np.zeros(0, np.uint8)
            self._max_rule_len = 0

    def set_prefix_matcher(self, matcher: Optional[PrefixMatcher]) -> None:
        self.matcher = matcher
        self._native = None  # rebuild lazily with the matcher trie

    _native = None

    def _native_impl(self):
        """Fast C++ scan (native/native.cc spm_normalize); exact parity
        with the Python path below, which remains the spec + fallback."""
        if self._native is None:
            try:
                from .. import native as native_mod

                matcher_units = None
                if self.matcher is not None and not self.matcher.empty:
                    matcher_units = self.matcher._trie.units
                n = native_mod.NativeNormalizer(
                    None if self.trie is None else self.trie.units,
                    self.pool,
                    bool(self.spec.add_dummy_prefix),
                    bool(self.spec.remove_extra_whitespaces),
                    bool(self.spec.escape_whitespaces),
                    bool(self.treat_whitespace_as_suffix),
                    matcher_units)
                self._native = n if n.ok else False
            except Exception:
                self._native = False
        return self._native or None

    # -- per-position precomputation (the vectorized trie pass) -------------
    def _match_table(self, data: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(length int32[n], value int32[n]): longest charsmap rule match per
        position (length 0 = no match), mirroring NormalizePrefix's longest-
        rule scan (normalizer.cc:245-269)."""
        n = len(data)
        if self.trie is None or n == 0:
            return np.zeros(n, np.int32), np.full(n, -1, np.int32)
        if self._max_rule_len is None:
            self._max_rule_len = self.trie.max_key_length()
        vals = self.trie.prefix_matches_dense(data, self._max_rule_len)
        depth = np.arange(1, self._max_rule_len + 1, dtype=np.int32)
        hit = vals >= 0
        lengths = np.where(hit, depth[None, :], 0).max(axis=1)
        idx = np.where(hit, depth[None, :], 0).argmax(axis=1)
        values = vals[np.arange(n), idx]
        return lengths, values

    def _replacement(self, value: int) -> bytes:
        end = self.pool.index(0, value)
        return self.pool[value:end]

    # -- NormalizePrefix (scalar, used by chunk scan) ------------------------
    def _normalize_prefix(self, data: bytes, pos: int,
                          rule_len: np.ndarray, rule_val: np.ndarray,
                          user_len: Optional[np.ndarray]
                          ) -> Tuple[bytes, int]:
        if user_len is not None and user_len[pos] > 0:
            ln = int(user_len[pos])
            return data[pos:pos + ln], ln
        ln = int(rule_len[pos])
        if ln > 0:
            return self._replacement(int(rule_val[pos])), ln
        valid, mblen = is_valid_decode_utf8(data, pos)
        if not valid:
            return REPLACEMENT_CHAR, 1
        return data[pos:pos + mblen], mblen

    # -- full Normalize ------------------------------------------------------
    def normalize(self, text) -> Tuple[bytes, np.ndarray]:
        """Returns (normalized utf-8 bytes, norm_to_orig int64[len+1])."""
        data = text.encode("utf-8", errors="surrogateescape") if isinstance(text, str) else bytes(text)
        if not data:
            return b"", np.zeros(0, dtype=np.int64)

        native = self._native_impl()
        if native is not None:
            r = native.normalize(data)
            if r is not None:
                return r
            # pathological charsmap expansion: exact Python path below

        arr = np.frombuffer(data, dtype=np.uint8)
        rule_len, rule_val = self._match_table(arr)
        user_len = None
        if self.matcher is not None and not self.matcher.empty:
            user_len = self.matcher.prefix_matches_dense(arr)

        spec = self.spec
        remove_ws = spec.remove_extra_whitespaces
        escape_ws = spec.escape_whitespaces
        n = len(data)

        consumed = 0
        pos = 0
        # Ignores heading space (normalizer.cc:103-112).
        if remove_ws:
            while pos < n:
                rep, ln = self._normalize_prefix(data, pos, rule_len, rule_val,
                                                 user_len)
                if rep != b" ":
                    break
                pos += ln
                consumed += ln
        if pos >= n:
            return b"", np.zeros(0, dtype=np.int64)

        out = bytearray()
        n2o: List[int] = []
        ws = SPACE_SYMBOL if escape_ws else b" "

        def add_ws():
            out.extend(ws)
            for _ in range(len(ws)):
                n2o.append(consumed)

        if not self.treat_whitespace_as_suffix and spec.add_dummy_prefix:
            add_ws()

        is_prev_space = remove_ws
        while pos < n:
            rep, ln = self._normalize_prefix(data, pos, rule_len, rule_val,
                                             user_len)
            sp = rep
            # Removes heading spaces in the piece if the previous piece ends
            # with whitespace (normalizer.cc:160-163).
            while is_prev_space and sp[:1] == b" ":
                sp = sp[1:]
            if sp:
                for byte in sp:
                    if escape_ws and byte == 0x20:
                        out.extend(SPACE_SYMBOL)
                        for _ in range(len(SPACE_SYMBOL)):
                            n2o.append(consumed)
                    else:
                        out.append(byte)
                        n2o.append(consumed)
                is_prev_space = sp.endswith(b" ")
            consumed += ln
            pos += ln
            if not remove_ws:
                is_prev_space = False

        # Ignores trailing space (normalizer.cc:191-201).
        if remove_ws:
            space = SPACE_SYMBOL if escape_ws else b" "
            while bytes(out).endswith(space):
                length = len(out) - len(space)
                assert length >= 0
                consumed = n2o[length]
                del out[length:]
                del n2o[length:]

        if self.treat_whitespace_as_suffix and spec.add_dummy_prefix:
            add_ws()

        n2o.append(consumed)
        assert len(n2o) == len(out) + 1
        return bytes(out), np.asarray(n2o, dtype=np.int64)

    def normalize_string(self, text) -> str:
        normalized, _ = self.normalize(text)
        return normalized.decode("utf-8", errors="surrogateescape")
