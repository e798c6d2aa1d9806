# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Normalization-rule builder (reference src/builder.{h,cc}).

Compiles CharsMap rule tables into precompiled charsmap blobs and constructs
the named rule sets. The reference builds its NFKC variants with ICU at
dev time (builder.cc:310-366, guarded by ENABLE_NFKC_COMPILE) and ships the
result as binary blobs; we follow the same strategy:

  * the base ``nfkc`` CharsMap ships as a data asset decompiled from a
    reference-produced model artifact (bit-identical to the reference's
    compiled table);
  * ``nmt_nfkc`` is derived from it by the exact explicit deltas of
    BuildNmtNFKCMap (builder.cc:376-448) — those deltas are plain codepoint
    lists, no ICU needed, so the derivation is exact;
  * the ``*_cf`` variants apply Unicode case folding
    (builder.cc:459-481); we use Python's per-codepoint case folding,
    which tracks the same Unicode tables.

``identity`` is the empty map (builder.cc:285-288).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

from . import charsmap as charsmap_lib
from .charsmap import CharsMap

_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")

# The nmt extra whitespace rules (builder.cc:383-399).
_NMT_WS = (0x0009, 0x000A, 0x000C, 0x000D, 0x1680, 0x200B, 0x200E, 0x200F,
           0x2028, 0x2029, 0x2581, 0xFEFF, 0xFFFD, 0x200C, 0x200D)
# ASCII/C1 control characters deleted by nmt rules (builder.cc:401-433).
_NMT_DELETE = tuple(range(0x0001, 0x0009)) + (0x000B,) + tuple(
    range(0x000E, 0x0020)) + (0x007F, 0x008F, 0x009F)


def normalize_chars(chars_map: CharsMap, src: Tuple[int, ...],
                    max_len: int) -> Tuple[int, ...]:
    """Greedy longest-match normalization of a codepoint sequence
    (reference builder.cc Normalize helper, :336-365)."""
    assert max_len >= 1
    out = []
    i = 0
    n = len(src)
    while i < n:
        matched = None
        for ln in range(min(max_len, n - i), 0, -1):
            key = src[i:i + ln]
            if key in chars_map:
                matched = (chars_map[key], ln)
                break
        if matched is None:
            out.append(src[i])
            i += 1
        else:
            out.extend(matched[0])
            i += matched[1]
    return tuple(out)


def remove_redundant_map(chars_map: CharsMap) -> CharsMap:
    """Drop rules derivable from shorter rules (builder.cc:622-654)."""
    new_map: CharsMap = {}
    max_len = 0
    for src, trg in chars_map.items():
        max_len = max(max_len, len(src))
        if len(src) == 1:
            new_map[src] = trg
    assert max_len > 0
    for ln in range(2, max_len + 1):
        for src, trg in chars_map.items():
            if len(src) == ln and trg != normalize_chars(new_map, src, ln - 1):
                new_map[src] = trg
    for src, trg in chars_map.items():
        got = normalize_chars(new_map, src, max_len)
        if got != trg:
            raise ValueError(f"redundant-map check failed for {src}: {got} != {trg}")
    return new_map


@functools.lru_cache(maxsize=None)
def _base_nfkc_map() -> CharsMap:
    """The shipped NFKC rule table (see module docstring)."""
    path = os.path.join(_DATA_DIR, "nfkc.tsv")
    with open(path, "r", encoding="utf-8") as f:
        return charsmap_lib.load_charsmap_tsv(f.read())


def build_nfkc_map() -> CharsMap:
    return dict(_base_nfkc_map())


def build_nmt_nfkc_map() -> CharsMap:
    """NFKC + NMT whitespace/control handling (builder.cc:376-448)."""
    m = build_nfkc_map()
    for cp in _NMT_WS:
        m[(cp,)] = (0x20,)
    for cp in _NMT_DELETE:
        m[(cp,)] = ()
    # FULL-WIDTH TILDE is intentionally left unnormalized (builder.cc:441).
    m.pop((0xFF5E,), None)
    return remove_redundant_map(m)


def _case_fold_cp(cp: int) -> Tuple[int, ...]:
    folded = chr(cp).casefold()
    return tuple(ord(c) for c in folded)


def merge_unicode_case_fold_map(chars_map: CharsMap) -> CharsMap:
    """Apply case folding to targets and add per-char folds
    (builder.cc:459-481). The reference uses ICU u_foldCase per codepoint
    (single-codepoint result); we keep only single-codepoint folds for the
    per-char additions to match that contract."""
    m: CharsMap = {}
    for src, trg in chars_map.items():
        new_trg = []
        for c in trg:
            f = _case_fold_cp(c)
            new_trg.extend(f if len(f) == 1 else (c,))
        m[src] = tuple(new_trg)
    for cp in range(1, 0x110000):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        if (cp,) in m:
            continue
        f = _case_fold_cp(cp)
        if len(f) == 1 and f[0] != cp:
            m[(cp,)] = f
    return remove_redundant_map(m)


def build_nfkc_cf_map() -> CharsMap:
    return merge_unicode_case_fold_map(build_nfkc_map())


def build_nmt_nfkc_cf_map() -> CharsMap:
    return merge_unicode_case_fold_map(build_nmt_nfkc_map())


_BUILDERS = {
    "nfkc": build_nfkc_map,
    "nmt_nfkc": build_nmt_nfkc_map,
    "nfkc_cf": build_nfkc_cf_map,
    "nmt_nfkc_cf": build_nmt_nfkc_cf_map,
}


@functools.lru_cache(maxsize=None)
def get_precompiled_charsmap(name: str) -> bytes:
    """Named rule -> blob (reference builder.cc:280-299). Prefers a shipped
    precompiled asset; falls back to compiling the rule table."""
    if name == "identity":
        return b""
    path = os.path.join(_DATA_DIR, f"{name}.charsmap")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return f.read()
    builder = _BUILDERS.get(name)
    if builder is None:
        raise ValueError(f"No precompiled charsmap is found: {name}")
    return charsmap_lib.compile_charsmap(builder())
