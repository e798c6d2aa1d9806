# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""UTF-8 codec with the reference's exact semantics, vectorized over numpy.

Mirrors the behavior of reference src/util.{h,cc} string_util:: functions
(OneCharLen util.h:389-392, DecodeUTF8 util.cc:187-220, EncodeUTF8
util.cc:250+, IsValidDecodeUTF8 util.h:462-465): malformed sequences decode to
U+FFFD consuming exactly one byte; surrogates and values > U+10FFFF are
invalid; a literal 3-byte U+FFFD counts as valid.

Text in this framework lives as uint8 byte arrays; these helpers produce the
per-byte structural arrays (char starts, char lengths, codepoints) that the
array-program encode/normalize kernels consume.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

UNICODE_ERROR = 0xFFFD

# OneCharLen lookup over the top nibble of the lead byte
# (reference util.h:390: "\1\1\1\1\1\1\1\1\1\1\1\1\2\2\3\4").
_ONE_CHAR_LEN = np.array([1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 3, 4],
                         dtype=np.int32)


def one_char_len(lead_byte: int) -> int:
    """Claimed length of a UTF-8 char from its lead byte (util.h:389-392)."""
    return int(_ONE_CHAR_LEN[(lead_byte & 0xFF) >> 4])


def is_valid_codepoint(c: int) -> bool:
    """Reference util.h:411-413."""
    return (0 <= c < 0xD800) or (0xE000 <= c <= 0x10FFFF)


def decode_utf8(buf: bytes, pos: int = 0) -> Tuple[int, int]:
    """Decode one codepoint at ``pos``; returns (codepoint, consumed_bytes).

    Exact port of the reference semantics (util.cc:187-220): invalid
    sequences return (U+FFFD, 1).
    """
    n = len(buf)
    b0 = buf[pos]
    if b0 < 0x80:
        return b0, 1
    remaining = n - pos
    if remaining >= 2 and (b0 & 0xE0) == 0xC0:
        b1 = buf[pos + 1]
        cp = ((b0 & 0x1F) << 6) | (b1 & 0x3F)
        if (b1 & 0xC0) == 0x80 and cp >= 0x80 and is_valid_codepoint(cp):
            return cp, 2
    elif remaining >= 3 and (b0 & 0xF0) == 0xE0:
        b1, b2 = buf[pos + 1], buf[pos + 2]
        cp = ((b0 & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
        if ((b1 & 0xC0) == 0x80 and (b2 & 0xC0) == 0x80 and cp >= 0x800
                and is_valid_codepoint(cp)):
            return cp, 3
    elif remaining >= 4 and (b0 & 0xF8) == 0xF0:
        b1, b2, b3 = buf[pos + 1], buf[pos + 2], buf[pos + 3]
        cp = (((b0 & 0x07) << 18) | ((b1 & 0x3F) << 12) | ((b2 & 0x3F) << 6)
              | (b3 & 0x3F))
        if ((b1 & 0xC0) == 0x80 and (b2 & 0xC0) == 0x80 and (b3 & 0xC0) == 0x80
                and cp >= 0x10000 and is_valid_codepoint(cp)):
            return cp, 4
    return UNICODE_ERROR, 1


def is_valid_decode_utf8(buf: bytes, pos: int = 0) -> Tuple[bool, int]:
    """(valid, consumed). A literal 3-byte U+FFFD is valid (util.h:462-465)."""
    cp, mblen = decode_utf8(buf, pos)
    return (cp != UNICODE_ERROR or mblen == 3), mblen


def encode_utf8(c: int) -> bytes:
    """Encode a codepoint; out-of-range becomes U+FFFD (util.cc:250+)."""
    if c <= 0x7F:
        return bytes([c])
    if c <= 0x7FF:
        return bytes([0xC0 | (c >> 6), 0x80 | (c & 0x3F)])
    if c > 0x10FFFF:
        c = UNICODE_ERROR
    if c <= 0xFFFF:
        return bytes([0xE0 | (c >> 12), 0x80 | ((c >> 6) & 0x3F),
                      0x80 | (c & 0x3F)])
    return bytes([0xF0 | (c >> 18), 0x80 | ((c >> 12) & 0x3F),
                  0x80 | ((c >> 6) & 0x3F), 0x80 | (c & 0x3F)])


def utf8_to_unicode_text(buf: bytes) -> list:
    """bytes -> list of codepoints with reference decode semantics."""
    out = []
    pos = 0
    n = len(buf)
    while pos < n:
        cp, mblen = decode_utf8(buf, pos)
        out.append(cp)
        pos += mblen
    return out


def unicode_text_to_utf8(cps) -> bytes:
    return b"".join(encode_utf8(c) for c in cps)


# ---------------------------------------------------------------------------
# Vectorized structural analysis over byte arrays.
# ---------------------------------------------------------------------------

def one_char_len_array(b: np.ndarray) -> np.ndarray:
    """Per-byte OneCharLen (meaningful only at char starts)."""
    return _ONE_CHAR_LEN[(b.astype(np.int32) & 0xFF) >> 4]


def char_structure(data: bytes):
    """Vectorized char segmentation following OneCharLen chunking.

    Mirrors Lattice::SetSentence (reference unigram_model.cc:147-162), which
    advances by min(OneCharLen(lead), remaining) regardless of validity.

    Returns:
      starts: int64[num_chars] byte offset of each char start
      lens:   int64[num_chars] byte length of each char (clipped at end)
    """
    n = len(data)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    b = np.frombuffer(data, dtype=np.uint8)
    lens_all = one_char_len_array(b).astype(np.int64)
    # Jump-chain: starts are found by iterated doubling over next-pointers.
    nxt = np.minimum(np.arange(n, dtype=np.int64) + lens_all, n)
    # Mark char starts: walk from 0 following nxt. Use a boolean sieve:
    starts_mask = np.zeros(n + 1, dtype=bool)
    pos = 0
    # The walk is data-dependent; do it with a compiled-ish loop over a
    # precomputed next array (fast: one python step per *char*).
    starts = []
    while pos < n:
        starts.append(pos)
        pos = nxt[pos]
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.append(starts[1:], n)
    del starts_mask
    return starts, ends - starts
