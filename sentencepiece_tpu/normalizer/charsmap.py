# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Precompiled charsmap blob codec: compile / decompile / decode.

Blob layout (reference src/normalizer.cc:305-337):
    <u32 LE trie_blob_size> <darts unit array> <replacement pool>
where the trie maps UTF-8 rule keys to offsets into the '\\0'-delimited
replacement pool.

Compilation (reference src/builder.cc:161-225): dedupe target strings into
the pool, build the double array over sorted keys, and verify that no key
position can yield more than kMaxTrieResultsSize(=32) prefix matches.
Decompilation (builder.cc:228-277) walks the trie back to a CharsMap.

A ``CharsMap`` is ``dict[tuple[int,...] codepoints -> tuple[int,...]]``
(reference builder.h: ``std::map<Chars, Chars>``).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

from ..utils import darts
from ..utils.unicode import encode_utf8, utf8_to_unicode_text

CharsMap = Dict[Tuple[int, ...], Tuple[int, ...]]

# reference normalizer.h kMaxTrieResultsSize
MAX_TRIE_RESULTS_SIZE = 32


def decode_blob(blob: bytes) -> Tuple[darts.DoubleArray, bytes]:
    """Split a precompiled charsmap blob into (trie, replacement pool)."""
    if len(blob) <= 4:
        raise ValueError("Blob for normalization rule is broken.")
    (trie_size,) = struct.unpack("<I", blob[:4])
    if trie_size >= len(blob):
        raise ValueError("Blob for normalization rule is broken.")
    trie_blob = blob[4:4 + trie_size]
    pool = blob[4 + trie_size:]
    return darts.DoubleArray.from_blob(trie_blob), pool


def encode_blob(trie: darts.DoubleArray, pool: bytes) -> bytes:
    trie_blob = trie.to_blob()
    return struct.pack("<I", len(trie_blob)) + trie_blob + pool


def compile_charsmap(chars_map: CharsMap) -> bytes:
    """CharsMap -> precompiled blob (reference builder.cc:161-225)."""
    # Dedupe normalized (target) strings into the pool, keyed by content.
    pool_index: Dict[bytes, int] = {}
    pool = bytearray()
    keys: List[bytes] = []
    values: List[int] = []
    for src in sorted(chars_map):
        trg = chars_map[src]
        key = b"".join(encode_utf8(c) for c in src)
        val = b"".join(encode_utf8(c) for c in trg)
        if not key:
            raise ValueError("empty rule source")
        off = pool_index.get(val)
        if off is None:
            off = len(pool)
            pool += val + b"\0"
            pool_index[val] = off
        keys.append(key)
        values.append(off)
    trie = darts.build(keys, values)
    # Verify the shared-prefix bound the runtime's stack array relies on
    # (builder.cc:207-222 / normalizer.cc:249-260).
    for key in keys:
        n = len(trie.common_prefix_search(key))
        if n >= MAX_TRIE_RESULTS_SIZE:
            raise ValueError("cannot build; too many shared prefixes")
    return encode_blob(trie, bytes(pool))


def decompile_charsmap(blob: bytes) -> CharsMap:
    """Blob -> CharsMap by enumerating all trie keys (builder.cc:228-277)."""
    trie, pool = decode_blob(blob)
    out: CharsMap = {}
    units = trie.units

    def value_at(base: int) -> int:
        return int(units[base] & np.uint32(0x7FFFFFFF))

    def walk(base: int, prefix: bytes):
        unit0 = units[base] if base < len(units) else None
        for c in range(1, 256):
            pos = base ^ c
            if pos >= len(units):
                continue
            u = units[pos]
            if int(u & np.uint32((1 << 31) | 0xFF)) != c:
                continue
            nbase = pos ^ int((u >> np.uint32(10)) << ((u & np.uint32(512)) >> np.uint32(6)))
            key = prefix + bytes([c])
            if u & np.uint32(1 << 8):  # has_leaf
                off = value_at(nbase)
                end = pool.index(0, off)
                out[tuple(utf8_to_unicode_text(key))] = tuple(
                    utf8_to_unicode_text(pool[off:end]))
            walk(nbase, key)

    root_base = int((units[0] >> np.uint32(10))
                    << ((units[0] & np.uint32(512)) >> np.uint32(6)))
    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(10000)
    try:
        walk(root_base, b"")
    finally:
        sys.setrecursionlimit(old)
    return out


def load_charsmap_tsv(text: str) -> CharsMap:
    """Parse the TSV rule format (reference builder.cc:539-580).

    Each line: hex codepoints space-separated <tab> hex codepoints, with
    optional trailing comment after a second tab.
    """
    out: CharsMap = {}
    # ReadLine semantics: \n only (a stray \r stays in the field and fails
    # hex parsing, exactly like the reference's lexical_cast)
    for line in text.split("\n"):
        if not line:
            continue
        fields = line.split("\t")
        if len(fields) < 1 or not fields[0]:
            continue
        src = tuple(int(x, 16) for x in fields[0].split() if x)
        trg: Tuple[int, ...] = ()
        if len(fields) >= 2 and fields[1]:
            trg = tuple(int(x, 16) for x in fields[1].split() if x)
        if not src:
            continue
        out[src] = trg
    return out


def save_charsmap_tsv(chars_map: CharsMap) -> str:
    lines = []
    for src in sorted(chars_map):
        trg = chars_map[src]
        lines.append(" ".join(f"{c:04X}" for c in src) + "\t"
                     + " ".join(f"{c:04X}" for c in trg))
    return "\n".join(lines) + ("\n" if lines else "")
