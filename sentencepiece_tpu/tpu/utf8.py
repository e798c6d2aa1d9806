# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Array-namespace-generic UTF-8 byte classification.

ONE implementation of the validity/length classifier and the
covered-continuation propagation, shared by the device normalizer
(jax.numpy) and the host-side width estimator (numpy) — the two MUST
agree byte-for-byte: the host estimate is only an upper bound because
the device classification matches it, and the normalizer fast-path
predicate relies on the same coverage argument (see
normalize.py / pipeline.pick_enc_width).

``xp`` is numpy or jax.numpy; inputs are 2D [B, N].
"""

from __future__ import annotations


def utf8_class(xp, batch, lengths):
    """(char_len int32[B,N], valid bool[B,N]) per byte position,
    mirroring string_util::IsValidDecodeUTF8: structural checks +
    overlong/surrogate/range. ``batch`` is uint8, evaluated at EVERY
    position (continuation-byte starts classify invalid)."""
    B, N = batch.shape
    b = batch.astype(xp.int32)
    bp = xp.concatenate([b, xp.zeros((B, 4), xp.int32)], axis=1)
    b1, b2, b3 = bp[:, 1:N + 1], bp[:, 2:N + 2], bp[:, 3:N + 3]
    c1 = (b1 & 0xC0) == 0x80
    c2 = (b2 & 0xC0) == 0x80
    c3 = (b3 & 0xC0) == 0x80
    rem = lengths[:, None] - xp.arange(N, dtype=xp.int32)[None, :]

    is1 = b < 0x80
    cp2 = ((b & 0x1F) << 6) | (b1 & 0x3F)
    is2 = ((b & 0xE0) == 0xC0) & c1 & (rem >= 2) & (cp2 >= 0x80)
    cp3 = ((b & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
    is3 = (((b & 0xF0) == 0xE0) & c1 & c2 & (rem >= 3)
           & (cp3 >= 0x800) & ~((cp3 >= 0xD800) & (cp3 <= 0xDFFF)))
    cp4 = (((b & 0x07) << 18) | ((b1 & 0x3F) << 12)
           | ((b2 & 0x3F) << 6) | (b3 & 0x3F))
    is4 = (((b & 0xF8) == 0xF0) & c1 & c2 & c3
           & (cp4 >= 0x10000) & (cp4 <= 0x10FFFF))

    char_len = xp.where(
        is1, 1, xp.where(is2, 2, xp.where(is3, 3, xp.where(is4, 4, 1)))
    ).astype(xp.int32)
    valid = is1 | is2 | is3 | is4
    return char_len, valid


def covered_continuations(xp, batch, valid, char_len):
    """bool[B,N]: position is a continuation byte lying inside the span
    of a valid char start at most 3 bytes back (with only continuation
    bytes in between). The conservative-simplicity proof in
    normalize.py hinges on exactly this predicate."""
    B, N = batch.shape
    is_cont = (batch & 0xC0) == 0x80
    covered = xp.zeros((B, N), bool)
    for j in (1, 2, 3):
        v = xp.concatenate(
            [xp.zeros((B, j), bool), valid[:, :N - j]], axis=1)
        cl_j = xp.concatenate(
            [xp.zeros((B, j), xp.int32), char_len[:, :N - j]], axis=1)
        conts = xp.ones((B, N), bool)
        for i in range(1, j):
            conts = conts & xp.concatenate(
                [xp.zeros((B, i), bool), is_cont[:, :N - i]], axis=1)
        covered = covered | (v & (cl_j > j) & conts)
    return covered
