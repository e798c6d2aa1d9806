# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""ctypes bindings for the native host runtime (native.cc).

The shared library is built on demand (g++ -O2, a few seconds, cached next
to the source). Every entry point has a pure-Python fallback elsewhere in
the package; ``available()`` reports whether the fast path loaded.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger("sentencepiece_tpu.native")

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "native.cc")
_lock = threading.Lock()
_lib = None
_tried = False


def _so_path() -> str:
    # The source hash is baked into the filename so a stale binary can
    # never shadow an edited native.cc (mtimes are unreliable after a
    # fresh git checkout).
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_DIR, f"_native-{h}.so")


def _build(so: str) -> bool:
    tmp = so + ".tmp"
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(tmp, so)
        return True
    except Exception as e:  # pragma: no cover
        log.warning("native build failed: %s", e)
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("SPM_TPU_DISABLE_NATIVE") == "1":
            # CI fallback row: exercise the pure-Python paths.
            return None
        so = _so_path()
        if not os.path.exists(so):
            if not _build(so):
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:  # pragma: no cover
            log.warning("native load failed: %s", e)
            return None
        lib.spm_darts_build.restype = ctypes.c_int64
        lib.spm_darts_build.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_void_p)]
        lib.spm_darts_build_banded.restype = ctypes.c_int64
        lib.spm_darts_build_banded.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64)]
        lib.spm_normalize.restype = ctypes.c_int64
        lib.spm_normalize.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,      # units
            ctypes.c_void_p, ctypes.c_int64,      # pool
            ctypes.c_void_p, ctypes.c_int64,      # matcher units
            ctypes.c_void_p, ctypes.c_int64,      # data
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]  # out, cap, n2o
        lib.spm_sais.restype = None
        lib.spm_sais.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_int64, ctypes.c_int64]
        lib.spm_cumsum_mask.restype = None
        lib.spm_cumsum_mask.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_void_p]
        lib.spm_charoffs_utf8.restype = None
        lib.spm_charoffs_utf8.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                          ctypes.c_int64, ctypes.c_void_p]
        lib.spm_free.argtypes = [ctypes.c_void_p]
        lib.spm_free_i64.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def darts_build(keys: Sequence[bytes],
                values: Optional[Sequence[int]] = None
                ) -> Optional[np.ndarray]:
    """Fast double-array build; returns uint32 unit array or None if the
    native library is unavailable. Same contract as utils.darts.build."""
    lib = _load()
    if lib is None:
        return None
    n = len(keys)
    if values is None:
        order = sorted(range(n), key=lambda i: keys[i])
        values = [0] * n
        for rank, i in enumerate(order):
            values[i] = rank
    pairs = sorted(zip(keys, values))
    for i, (k, v) in enumerate(pairs):
        if not k:
            raise ValueError("empty key not allowed")
        if 0 in k:
            raise ValueError("NUL byte in key not allowed")
        if not (0 <= v < (1 << 31)):
            raise ValueError(f"value out of range: {v}")
        if i and pairs[i - 1][0] == k:
            raise ValueError(f"duplicate key: {k!r}")
    concat = b"".join(k for k, _ in pairs)
    offs = np.zeros(n + 1, np.int64)
    offs[1:] = np.cumsum([len(k) for k, _ in pairs])
    vals = np.asarray([v for _, v in pairs], np.int32)
    keys_np = np.frombuffer(concat, np.uint8)
    out_ptr = ctypes.c_void_p()
    n_units = lib.spm_darts_build(
        keys_np.ctypes.data_as(ctypes.c_void_p),
        offs.ctypes.data_as(ctypes.c_void_p),
        vals.ctypes.data_as(ctypes.c_void_p),
        n, ctypes.byref(out_ptr))
    if n_units < 0:
        return None
    buf = np.ctypeslib.as_array(
        ctypes.cast(out_ptr, ctypes.POINTER(ctypes.c_uint32)),
        shape=(n_units,)).copy()
    lib.spm_free(out_ptr)
    return buf


def darts_build_banded(keys: Sequence[bytes],
                       values: Optional[Sequence[int]] = None):
    """Depth-banded double-array build (device lattice-trie variant —
    see native.cc spm_darts_build_banded). Returns (units uint32[U],
    bands list[(lo, hi)]) with bands[k] covering every depth-k node
    position, or None when native is unavailable or the table is not
    bandable (caller falls back to the unbanded build)."""
    lib = _load()
    if lib is None:
        return None
    n = len(keys)
    if values is None:
        order = sorted(range(n), key=lambda i: keys[i])
        values = [0] * n
        for rank, i in enumerate(order):
            values[i] = rank
    pairs = sorted(zip(keys, values))
    for i, (k, v) in enumerate(pairs):
        if not k or 0 in k or not (0 <= v < (1 << 31)):
            raise ValueError(f"bad key/value: {k!r} {v}")
        if i and pairs[i - 1][0] == k:
            raise ValueError(f"duplicate key: {k!r}")
    concat = b"".join(k for k, _ in pairs)
    offs = np.zeros(n + 1, np.int64)
    offs[1:] = np.cumsum([len(k) for k, _ in pairs])
    vals = np.asarray([v for _, v in pairs], np.int32)
    keys_np = np.frombuffer(concat, np.uint8)
    out_ptr = ctypes.c_void_p()
    bands_ptr = ctypes.c_void_p()
    n_bands = ctypes.c_int64()
    n_units = lib.spm_darts_build_banded(
        keys_np.ctypes.data_as(ctypes.c_void_p),
        offs.ctypes.data_as(ctypes.c_void_p),
        vals.ctypes.data_as(ctypes.c_void_p),
        n, ctypes.byref(out_ptr), ctypes.byref(bands_ptr),
        ctypes.byref(n_bands))
    if n_units < 0:
        return None
    buf = np.ctypeslib.as_array(
        ctypes.cast(out_ptr, ctypes.POINTER(ctypes.c_uint32)),
        shape=(n_units,)).copy()
    lib.spm_free(out_ptr)
    nb = int(n_bands.value)
    braw = np.ctypeslib.as_array(
        ctypes.cast(bands_ptr, ctypes.POINTER(ctypes.c_int64)),
        shape=(2 * nb,)).copy()
    lib.spm_free_i64(bands_ptr)
    bands = [(int(braw[2 * i]), int(braw[2 * i + 1])) for i in range(nb)]
    return buf, bands


class NativeNormalizer:
    """Fast host normalizer over a charsmap blob + optional user matcher."""

    def __init__(self, units: Optional[np.ndarray], pool: bytes,
                 add_dummy_prefix: bool, remove_extra_whitespaces: bool,
                 escape_whitespaces: bool, suffix: bool,
                 matcher_units: Optional[np.ndarray] = None):
        self.lib = _load()
        self.units = (np.ascontiguousarray(units, np.uint32)
                      if units is not None else None)
        self.pool = np.frombuffer(pool, np.uint8) if pool else None
        self.matcher = (np.ascontiguousarray(matcher_units, np.uint32)
                        if matcher_units is not None else None)
        self.flags = (int(add_dummy_prefix), int(remove_extra_whitespaces),
                      int(escape_whitespaces), int(suffix))

    @property
    def ok(self) -> bool:
        return self.lib is not None

    def normalize_batch(self, lines, num_threads: int = 1):
        """CSR batch normalize: list[bytes] -> (out uint8[], off int64[]).
        One library call for a whole corpus; None on failure. Runs on
        ``num_threads`` (the reference's corpus-normalization pool,
        trainer_interface.cc:361-372); output is byte-identical at any
        thread count."""
        if not getattr(self.lib, "_nbatch_ready", False):
            self.lib.spm_normalize_batch.restype = ctypes.c_int64
            self.lib.spm_normalize_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int]
            self.lib._nbatch_ready = True
        n_lines = len(lines)
        off = np.zeros(n_lines + 1, np.int64)
        np.cumsum(np.fromiter((len(b) for b in lines), np.int64, n_lines),
                  out=off[1:])
        data = np.frombuffer(b"".join(lines), np.uint8) if off[-1] else \
            np.zeros(1, np.uint8)
        out_off = np.zeros(n_lines + 1, np.int64)
        # 4x covers real text (ws escaping is 3x); retry at the NFKC
        # worst-case 13x only if some line overflows its slab
        for factor in (4, 13):
            cap = int(off[-1]) * factor + 16 * n_lines + 16
            out = np.empty(cap, np.uint8)
            nb = self.lib.spm_normalize_batch(
                None if self.units is None else
                ctypes.c_void_p(self.units.ctypes.data),
                0 if self.units is None else len(self.units),
                None if self.pool is None else
                ctypes.c_void_p(self.pool.ctypes.data),
                0 if self.pool is None else len(self.pool),
                None if self.matcher is None else
                ctypes.c_void_p(self.matcher.ctypes.data),
                0 if self.matcher is None else len(self.matcher),
                *self.flags,
                ctypes.c_void_p(data.ctypes.data),
                ctypes.c_void_p(off.ctypes.data), n_lines,
                ctypes.c_void_p(out.ctypes.data), cap,
                ctypes.c_void_p(out_off.ctypes.data),
                int(num_threads), factor)
            if nb >= 0:
                return out, out_off
            if nb != -2:
                return None
        return None

    def normalize(self, data: bytes):
        """Returns (normalized bytes, n2o) or None when the native path
        can't serve this input (e.g. a charsmap rule expands past the
        retry bound) — callers fall back to the exact Python path."""
        n = len(data)
        cap = n * 13 + 16
        d = np.frombuffer(data, np.uint8)
        for _ in range(4):  # grow-and-retry on -2 (rule expanded past 13x)
            out = np.empty(cap, np.uint8)
            n2o = np.empty(cap + 1, np.int64)
            olen = self.lib.spm_normalize(
                None if self.units is None else
                self.units.ctypes.data_as(ctypes.c_void_p),
                0 if self.units is None else len(self.units),
                None if self.pool is None else
                self.pool.ctypes.data_as(ctypes.c_void_p),
                0 if self.pool is None else len(self.pool),
                None if self.matcher is None else
                self.matcher.ctypes.data_as(ctypes.c_void_p),
                0 if self.matcher is None else len(self.matcher),
                d.ctypes.data_as(ctypes.c_void_p) if n else None, n,
                *self.flags,
                out.ctypes.data_as(ctypes.c_void_p), cap,
                n2o.ctypes.data_as(ctypes.c_void_p))
            if olen >= 0:
                if olen == 0 and n2o[0] < 0:
                    # reference early return (empty input / all-space
                    # heading skip): alignment stays EMPTY
                    return b"", np.zeros(0, np.int64)
                return out[:olen].tobytes(), n2o[:olen + 1].copy()
            if olen != -2:
                return None
            cap *= 8
        return None


def cumsum_mask(mask: np.ndarray) -> Optional[np.ndarray]:
    """Inclusive int64 prefix sum of a bool/uint8 mask; None if native
    is unavailable."""
    lib = _load()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask, np.uint8)
    out = np.empty(len(m), np.int64)
    lib.spm_cumsum_mask(m.ctypes.data_as(ctypes.c_void_p),
                        ctypes.c_int64(len(m)),
                        out.ctypes.data_as(ctypes.c_void_p))
    return out


def charoffs_utf8(blob: bytes, offs: np.ndarray) -> Optional[np.ndarray]:
    """Char counts of ``blob[:offs[i]]`` for ascending byte offsets;
    None if native is unavailable."""
    lib = _load()
    if lib is None:
        return None
    o = np.ascontiguousarray(offs, np.int64)
    out = np.empty(len(o), np.int64)
    lib.spm_charoffs_utf8(blob, o.ctypes.data_as(ctypes.c_void_p),
                          ctypes.c_int64(len(o)),
                          out.ctypes.data_as(ctypes.c_void_p))
    return out


def sais(arr: np.ndarray, alphabet: int) -> Optional[np.ndarray]:
    """SA-IS suffix array of an int32 array; None if native unavailable.

    A unique smallest sentinel is appended internally (the core assumes
    the with-sentinel convention); the returned SA excludes it."""
    lib = _load()
    if lib is None:
        return None
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.int32)
    t = np.empty(n + 1, np.int32)
    t[:n] = np.asarray(arr, np.int32) + 1
    t[n] = 0
    sa = np.empty(n + 1, np.int32)
    lib.spm_sais(t.ctypes.data_as(ctypes.c_void_p),
                 sa.ctypes.data_as(ctypes.c_void_p), n + 1, alphabet + 2)
    assert sa[0] == n
    return sa[1:].copy()


def _estep_sig(lib):
    if getattr(lib, "_estep_ready", False):
        return
    lib.spm_unigram_estep.restype = ctypes.c_int
    lib.spm_unigram_estep.argtypes = [
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_float, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64)]
    lib.spm_unigram_viterbi_paths.restype = ctypes.c_int
    lib.spm_unigram_viterbi_paths.argtypes = [
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_float, ctypes.c_void_p, ctypes.c_void_p]
    lib._estep_ready = True


class UnigramEStepTables:
    """Flattened word candidate tables shared by the native E-step and
    Viterbi batch (built once per training run against the seed vocab)."""

    def __init__(self, word_len, cand_off, cand_pos, cand_len, cand_sid,
                 freqs):
        self.word_len = np.ascontiguousarray(word_len, np.int32)
        self.cand_off = np.ascontiguousarray(cand_off, np.int64)
        self.cand_pos = np.ascontiguousarray(cand_pos, np.int32)
        self.cand_len = np.ascontiguousarray(cand_len, np.int32)
        self.cand_sid = np.ascontiguousarray(cand_sid, np.int32)
        self.freqs = np.ascontiguousarray(freqs, np.int64)
        self.n_words = len(self.word_len)


def unigram_estep(tables: "UnigramEStepTables", seed_to_cur, scores,
                  unk_score: float, num_threads: int):
    """float32-exact E-step (native threads, reference merge order).
    Returns (expected float32[num_cur], obj float, ntok int) or None."""
    lib = _load()
    if lib is None:
        return None
    _estep_sig(lib)
    s2c = np.ascontiguousarray(seed_to_cur, np.int32)
    sc = np.ascontiguousarray(scores, np.float32)
    num_cur = len(sc)
    expected = np.zeros(num_cur, np.float32)
    obj = ctypes.c_float()
    ntok = ctypes.c_int64()
    all_freq = int(tables.freqs[:tables.n_words].sum())
    rc = lib.spm_unigram_estep(
        tables.n_words,
        tables.word_len.ctypes.data_as(ctypes.c_void_p),
        tables.cand_off.ctypes.data_as(ctypes.c_void_p),
        tables.cand_pos.ctypes.data_as(ctypes.c_void_p),
        tables.cand_len.ctypes.data_as(ctypes.c_void_p),
        tables.cand_sid.ctypes.data_as(ctypes.c_void_p),
        s2c.ctypes.data_as(ctypes.c_void_p),
        sc.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_float(unk_score),
        tables.freqs.ctypes.data_as(ctypes.c_void_p),
        all_freq, num_threads, num_cur,
        expected.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(obj), ctypes.byref(ntok))
    if rc != 0:
        return None
    return expected, float(obj.value), int(ntok.value)


def unigram_viterbi_paths(tables: "UnigramEStepTables", seed_to_cur, scores,
                          unk_score: float):
    """Viterbi piece-id paths per word: (ids int32[], offsets int64[W+1])."""
    lib = _load()
    if lib is None:
        return None
    _estep_sig(lib)
    s2c = np.ascontiguousarray(seed_to_cur, np.int32)
    sc = np.ascontiguousarray(scores, np.float32)
    cap = int(tables.word_len.sum())
    out_ids = np.zeros(max(cap, 1), np.int32)
    out_off = np.zeros(tables.n_words + 1, np.int64)
    rc = lib.spm_unigram_viterbi_paths(
        tables.n_words,
        tables.word_len.ctypes.data_as(ctypes.c_void_p),
        tables.cand_off.ctypes.data_as(ctypes.c_void_p),
        tables.cand_pos.ctypes.data_as(ctypes.c_void_p),
        tables.cand_len.ctypes.data_as(ctypes.c_void_p),
        tables.cand_sid.ctypes.data_as(ctypes.c_void_p),
        s2c.ctypes.data_as(ctypes.c_void_p),
        sc.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_float(unk_score),
        out_ids.ctypes.data_as(ctypes.c_void_p),
        out_off.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    return out_ids, out_off


def _encode_sig(lib):
    if getattr(lib, "_enc_ready", False):
        return
    lib.spm_unigram_encode.restype = ctypes.c_int64
    lib.spm_unigram_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_float, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib._enc_ready = True


class NativeUnigramEncoder:
    """Host Viterbi encode against pre-folded lattice scores (user-defined
    rule applied, UNUSED = -inf); same construction as tpu/encode.py."""

    def __init__(self, units: np.ndarray, lat_scores: np.ndarray,
                 unk_id: int, unk_score: float):
        self.lib = _load()
        self.units = np.ascontiguousarray(units, np.uint32)
        self.scores = np.ascontiguousarray(lat_scores, np.float32)
        self.unk_id = unk_id
        self.unk_score = float(unk_score)

    @property
    def ok(self) -> bool:
        return self.lib is not None

    def encode(self, data: bytes):
        """Returns (ids, starts, lens) int32 arrays or None on failure."""
        n = len(data)
        if n == 0:
            return (np.zeros(0, np.int32),) * 3
        _encode_sig(self.lib)
        d = np.frombuffer(data, np.uint8)
        ids = np.empty(n, np.int32)
        starts = np.empty(n, np.int32)
        lens = np.empty(n, np.int32)
        cnt = self.lib.spm_unigram_encode(
            self.units.ctypes.data_as(ctypes.c_void_p), len(self.units),
            self.scores.ctypes.data_as(ctypes.c_void_p),
            self.unk_id, ctypes.c_float(self.unk_score),
            d.ctypes.data_as(ctypes.c_void_p), n,
            ids.ctypes.data_as(ctypes.c_void_p),
            starts.ctypes.data_as(ctypes.c_void_p),
            lens.ctypes.data_as(ctypes.c_void_p))
        if cnt < 0:
            return None
        return ids[:cnt], starts[:cnt], lens[:cnt]


class NativeBpeEncoder:
    """Host BPE agenda merge in C++ (real std::priority_queue = the
    reference comparator exactly). The wrapper resolves unk-span ids
    through the full piece_to_id (reserved pieces included)."""

    def __init__(self, units, scores, unk_id: int,
                 matcher_units=None):
        self.lib = _load()
        if self.lib is not None and not getattr(self.lib, "_bpe_ready", 0):
            self.lib.spm_bpe_encode.restype = ctypes.c_int64
            self.lib.spm_bpe_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
            self.lib._bpe_ready = True
        self.units = np.ascontiguousarray(units, np.uint32)
        self.scores = np.ascontiguousarray(scores, np.float32)
        self.matcher = (np.ascontiguousarray(matcher_units, np.uint32)
                        if matcher_units is not None else None)
        self.unk_id = unk_id

    @property
    def ok(self) -> bool:
        return self.lib is not None

    def encode(self, data: bytes):
        n = len(data)
        if n == 0:
            return (np.zeros(0, np.int32),) * 3
        d = np.frombuffer(data, np.uint8)
        ids = np.empty(n, np.int32)
        starts = np.empty(n, np.int32)
        lens = np.empty(n, np.int32)
        cnt = self.lib.spm_bpe_encode(
            self.units.ctypes.data_as(ctypes.c_void_p), len(self.units),
            self.scores.ctypes.data_as(ctypes.c_void_p),
            None if self.matcher is None else
            self.matcher.ctypes.data_as(ctypes.c_void_p),
            0 if self.matcher is None else len(self.matcher),
            self.unk_id,
            d.ctypes.data_as(ctypes.c_void_p), n,
            ids.ctypes.data_as(ctypes.c_void_p),
            starts.ctypes.data_as(ctypes.c_void_p),
            lens.ctypes.data_as(ctypes.c_void_p))
        if cnt < 0:
            return None
        return ids[:cnt], starts[:cnt], lens[:cnt]


def unigram_prune_nbest(word_len, cand_off, cand_pos, cand_len, cand_cur,
                        scores, unk_score: float, num_threads: int = 1):
    """Per-piece 2-best classification for PruneSentencePieces.
    Returns (always_keep uint8[n], alt_ids int32[], alt_off int64[n+1])."""
    lib = _load()
    if lib is None:
        return None
    if not getattr(lib, "_prune_ready", False):
        lib.spm_unigram_prune_nbest.restype = ctypes.c_int
        lib.spm_unigram_prune_nbest.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_float,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32]
        lib._prune_ready = True
    wl = np.ascontiguousarray(word_len, np.int32)
    co = np.ascontiguousarray(cand_off, np.int64)
    cp = np.ascontiguousarray(cand_pos, np.int32)
    cl = np.ascontiguousarray(cand_len, np.int32)
    cc = np.ascontiguousarray(cand_cur, np.int32)
    sc = np.ascontiguousarray(scores, np.float32)
    n = len(wl)
    ak = np.zeros(n, np.uint8)
    cap = max(int(wl.sum()), 1)
    alt_ids = np.zeros(cap, np.int32)
    alt_off = np.zeros(n + 1, np.int64)
    rc = lib.spm_unigram_prune_nbest(
        n, wl.ctypes.data_as(ctypes.c_void_p),
        co.ctypes.data_as(ctypes.c_void_p),
        cp.ctypes.data_as(ctypes.c_void_p),
        cl.ctypes.data_as(ctypes.c_void_p),
        cc.ctypes.data_as(ctypes.c_void_p),
        sc.ctypes.data_as(ctypes.c_void_p), ctypes.c_float(unk_score),
        ak.ctypes.data_as(ctypes.c_void_p),
        alt_ids.ctypes.data_as(ctypes.c_void_p),
        alt_off.ctypes.data_as(ctypes.c_void_p), int(num_threads))
    if rc != 0:
        return None
    return ak, alt_ids, alt_off


def _utf32_concat(strings):
    """(uint32 codepoint concat, int64 offsets) for a list of str."""
    joined = "".join(strings)
    cps = np.frombuffer(
        joined.encode("utf-32-le", errors="surrogatepass"), np.uint32)
    off = np.zeros(len(strings) + 1, np.int64)
    np.cumsum(np.fromiter((len(s) for s in strings), np.int64,
                          len(strings)), out=off[1:])
    return cps, off


def substring_match(words, keys, max_len: int, num_threads: int = 1):
    """CSR candidate tables: for every word, all (pos, len, key_id) whose
    substring is in ``keys`` — (pos asc, len asc) order, matching the host
    trainer's table-construction loops. Returns
    (cand_off int64[n+1], cand_pos, cand_len, cand_sid int32[]) or None."""
    lib = _load()
    if lib is None:
        return None
    if not getattr(lib, "_ssm_ready", False):
        lib.spm_substring_match.restype = ctypes.c_int64
        lib.spm_substring_match.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32]
        lib._ssm_ready = True
    wc, wo = _utf32_concat(words)
    kc, ko = _utf32_concat(keys)
    lens = wo[1:] - wo[:-1]
    ml = np.minimum(lens, max_len)
    cap = max(int((lens * ml - ml * (ml - 1) // 2).sum()), 1)
    out_pos = np.empty(cap, np.int32)
    out_len = np.empty(cap, np.int32)
    out_sid = np.empty(cap, np.int32)
    out_off = np.zeros(len(words) + 1, np.int64)
    m = lib.spm_substring_match(
        len(words), wo.ctypes.data_as(ctypes.c_void_p),
        wc.ctypes.data_as(ctypes.c_void_p),
        len(keys), ko.ctypes.data_as(ctypes.c_void_p),
        kc.ctypes.data_as(ctypes.c_void_p), max_len,
        out_pos.ctypes.data_as(ctypes.c_void_p),
        out_len.ctypes.data_as(ctypes.c_void_p),
        out_sid.ctypes.data_as(ctypes.c_void_p),
        out_off.ctypes.data_as(ctypes.c_void_p), cap, int(num_threads))
    if m < 0:
        return None
    return out_off, out_pos[:m], out_len[:m], out_sid[:m]


class FusedUnigramEncoder:
    """One-call normalize + Viterbi + adjacent-UNK merge for a batch of
    lines: the whole per-line hot path runs in C++ with a single ctypes
    crossing per batch (sentencepiece_processor.cc Encode's composition of
    Normalizer + UnigramModel, ids output)."""

    def __init__(self, norm: "NativeNormalizer", enc: "NativeUnigramEncoder"):
        self.lib = _load()
        if self.lib is not None and not getattr(self.lib, "_fused_ready", 0):
            self.lib.spm_unigram_encode_ids_batch.restype = ctypes.c_int64
            self.lib.spm_unigram_encode_ids_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,   # charsmap units
                ctypes.c_void_p, ctypes.c_int64,   # pool
                ctypes.c_void_p, ctypes.c_int64,   # matcher units
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int64,   # encoder trie
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_float,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p]
            self.lib._fused_ready = True
        self.norm = norm
        self.enc = enc
        n = norm
        self._args_head = (
            None if n.units is None else
            ctypes.c_void_p(n.units.ctypes.data),
            0 if n.units is None else len(n.units),
            None if n.pool is None else ctypes.c_void_p(n.pool.ctypes.data),
            0 if n.pool is None else len(n.pool),
            None if n.matcher is None else
            ctypes.c_void_p(n.matcher.ctypes.data),
            0 if n.matcher is None else len(n.matcher),
            *n.flags,
            ctypes.c_void_p(enc.units.ctypes.data), len(enc.units),
            ctypes.c_void_p(enc.scores.ctypes.data), enc.unk_id,
            ctypes.c_float(enc.unk_score))

    @property
    def ok(self) -> bool:
        return self.lib is not None and self.norm.ok and self.enc.ok

    def encode_ids_batch(self, lines):
        """lines: list of utf-8 bytes. Returns (ids int32[], off int64[])
        CSR or None on failure."""
        n_lines = len(lines)
        off = np.zeros(n_lines + 1, np.int64)
        np.cumsum(np.fromiter((len(b) for b in lines), np.int64, n_lines),
                  out=off[1:])
        data = np.frombuffer(b"".join(lines), np.uint8) if off[-1] else \
            np.zeros(1, np.uint8)
        # normalization can expand 13x; every normalized char yields <=1 id,
        # +1 dummy prefix per line
        cap = int(off[-1]) * 13 + 16 * n_lines + 16
        out_ids = np.empty(cap, np.int32)
        out_off = np.zeros(n_lines + 1, np.int64)
        m = self.lib.spm_unigram_encode_ids_batch(
            *self._args_head,
            ctypes.c_void_p(data.ctypes.data),
            ctypes.c_void_p(off.ctypes.data), n_lines,
            ctypes.c_void_p(out_ids.ctypes.data), cap,
            ctypes.c_void_p(out_off.ctypes.data),
            None, 0, None, None, None)
        if m < 0:
            return None
        return out_ids, out_off

    def encode_pieces_batch(self, lines):
        """Like encode_ids_batch but also returns merged-token spans into
        the normalized bytes: (ids, off, starts, lens, norm, norm_off)."""
        n_lines = len(lines)
        off = np.zeros(n_lines + 1, np.int64)
        np.cumsum(np.fromiter((len(b) for b in lines), np.int64, n_lines),
                  out=off[1:])
        data = np.frombuffer(b"".join(lines), np.uint8) if off[-1] else \
            np.zeros(1, np.uint8)
        cap = int(off[-1]) * 13 + 16 * n_lines + 16
        out_ids = np.empty(cap, np.int32)
        out_off = np.zeros(n_lines + 1, np.int64)
        out_starts = np.empty(cap, np.int32)
        out_lens = np.empty(cap, np.int32)
        out_norm = np.empty(cap, np.uint8)
        out_norm_off = np.zeros(n_lines + 1, np.int64)
        m = self.lib.spm_unigram_encode_ids_batch(
            *self._args_head,
            ctypes.c_void_p(data.ctypes.data),
            ctypes.c_void_p(off.ctypes.data), n_lines,
            ctypes.c_void_p(out_ids.ctypes.data), cap,
            ctypes.c_void_p(out_off.ctypes.data),
            ctypes.c_void_p(out_norm.ctypes.data), cap,
            ctypes.c_void_p(out_norm_off.ctypes.data),
            ctypes.c_void_p(out_starts.ctypes.data),
            ctypes.c_void_p(out_lens.ctypes.data))
        if m < 0:
            return None
        return out_ids, out_off, out_starts, out_lens, out_norm, \
            out_norm_off

    def encode_ids(self, data: bytes):
        """Single line -> list[int] ids, or None on failure.

        Uses persistent per-instance scratch (grown geometrically) and
        cached ctypes pointers: the batch framing (cumsum/join/6 array
        allocations) costs more than the encode itself at one line.
        Not thread-safe per instance (neither is the reference
        processor)."""
        if self.lib is None:
            return None
        cap = len(data) * 13 + 32
        sc = getattr(self, "_one", None)
        if sc is None or sc[0] < cap:
            cap = max(cap, 4096)
            ids = np.empty(cap, np.int32)
            off = np.zeros(2, np.int64)
            inoff = np.zeros(2, np.int64)
            sc = self._one = (cap, ids, off, inoff,
                              ctypes.c_void_p(ids.ctypes.data),
                              ctypes.c_void_p(off.ctypes.data),
                              ctypes.c_void_p(inoff.ctypes.data))
        cap, ids, off, inoff, p_ids, p_off, p_inoff = sc
        inoff[1] = len(data)
        m = self.lib.spm_unigram_encode_ids_batch(
            *self._args_head, ctypes.c_char_p(data or b"\x00"), p_inoff, 1,
            p_ids, cap, p_off, None, 0, None, None, None)
        if m < 0:
            return None
        return ids[:off[1]].tolist()


class FusedBpeEncoder:
    """One-call normalize + BPE merge for a batch of lines (ids + spans +
    normalized bytes out; unk spans are resolved by the caller through the
    full piece map, matching models/bpe.py's native wrapper)."""

    def __init__(self, norm: "NativeNormalizer", enc: "NativeBpeEncoder"):
        self.lib = _load()
        if self.lib is not None and not getattr(self.lib, "_fbpe_ready", 0):
            self.lib.spm_bpe_encode_ids_batch.restype = ctypes.c_int64
            self.lib.spm_bpe_encode_ids_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
            self.lib._fbpe_ready = True
        self.norm = norm
        self.enc = enc
        n = norm
        self._args_head = (
            None if n.units is None else
            ctypes.c_void_p(n.units.ctypes.data),
            0 if n.units is None else len(n.units),
            None if n.pool is None else ctypes.c_void_p(n.pool.ctypes.data),
            0 if n.pool is None else len(n.pool),
            None if n.matcher is None else
            ctypes.c_void_p(n.matcher.ctypes.data),
            0 if n.matcher is None else len(n.matcher),
            *n.flags,
            ctypes.c_void_p(enc.units.ctypes.data), len(enc.units),
            ctypes.c_void_p(enc.scores.ctypes.data),
            None if enc.matcher is None else
            ctypes.c_void_p(enc.matcher.ctypes.data),
            0 if enc.matcher is None else len(enc.matcher),
            enc.unk_id)

    @property
    def ok(self) -> bool:
        return self.lib is not None

    def encode_batch(self, lines):
        """Returns (ids int32[], starts, lens, off int64[n+1],
        norm uint8[], norm_off int64[n+1]) or None."""
        n_lines = len(lines)
        off = np.zeros(n_lines + 1, np.int64)
        np.cumsum(np.fromiter((len(b) for b in lines), np.int64, n_lines),
                  out=off[1:])
        data = np.frombuffer(b"".join(lines), np.uint8) if off[-1] else \
            np.zeros(1, np.uint8)
        norm_cap = int(off[-1]) * 13 + 16 * n_lines + 16
        cap = norm_cap
        out_ids = np.empty(cap, np.int32)
        out_starts = np.empty(cap, np.int32)
        out_lens = np.empty(cap, np.int32)
        out_off = np.zeros(n_lines + 1, np.int64)
        out_norm = np.empty(norm_cap, np.uint8)
        out_norm_off = np.zeros(n_lines + 1, np.int64)
        m = self.lib.spm_bpe_encode_ids_batch(
            *self._args_head,
            ctypes.c_void_p(data.ctypes.data),
            ctypes.c_void_p(off.ctypes.data), n_lines,
            ctypes.c_void_p(out_ids.ctypes.data),
            ctypes.c_void_p(out_starts.ctypes.data),
            ctypes.c_void_p(out_lens.ctypes.data),
            cap, ctypes.c_void_p(out_off.ctypes.data),
            ctypes.c_void_p(out_norm.ctypes.data), norm_cap,
            ctypes.c_void_p(out_norm_off.ctypes.data))
        if m < 0:
            return None
        return (out_ids, out_starts, out_lens, out_off, out_norm,
                out_norm_off)

    def encode_one(self, data: bytes):
        """Single line -> (ids, starts, lens, norm, n_ids) VIEWS into
        persistent per-instance scratch (valid until the next call), or
        None. Skips the batch framing — see
        FusedUnigramEncoder.encode_ids. Not thread-safe per instance."""
        if self.lib is None:
            return None
        cap = len(data) * 13 + 32
        sc = getattr(self, "_one", None)
        if sc is None or sc[0] < cap:
            cap = max(cap, 4096)
            ids = np.empty(cap, np.int32)
            starts = np.empty(cap, np.int32)
            lens = np.empty(cap, np.int32)
            norm = np.empty(cap, np.uint8)
            off = np.zeros(2, np.int64)
            noff = np.zeros(2, np.int64)
            inoff = np.zeros(2, np.int64)
            sc = self._one = (
                cap, ids, starts, lens, norm, off, noff, inoff,
                ctypes.c_void_p(ids.ctypes.data),
                ctypes.c_void_p(starts.ctypes.data),
                ctypes.c_void_p(lens.ctypes.data),
                ctypes.c_void_p(norm.ctypes.data),
                ctypes.c_void_p(off.ctypes.data),
                ctypes.c_void_p(noff.ctypes.data),
                ctypes.c_void_p(inoff.ctypes.data))
        (cap, ids, starts, lens, norm, off, noff, inoff,
         p_ids, p_starts, p_lens, p_norm, p_off, p_noff, p_inoff) = sc
        inoff[1] = len(data)
        m = self.lib.spm_bpe_encode_ids_batch(
            *self._args_head, ctypes.c_char_p(data or b"\x00"), p_inoff, 1,
            p_ids, p_starts, p_lens, cap, p_off, p_norm, cap, p_noff)
        if m < 0:
            return None
        return ids, starts, lens, norm, int(off[1])


def esa_nodes(arr, sa):
    """Suffix-tree internal nodes (L, R, depth) int32[m, 3] in esa.hxx
    emission order, or None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    if not getattr(lib, "_esa_ready", False):
        lib.spm_esa_nodes.restype = ctypes.c_int64
        lib.spm_esa_nodes.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64]
        lib._esa_ready = True
    a = np.ascontiguousarray(arr, np.int32)
    s = np.ascontiguousarray(sa, np.int32)
    n = len(a)
    cap = n + 1
    out = np.empty((cap, 3), np.int32)
    m = lib.spm_esa_nodes(a.ctypes.data_as(ctypes.c_void_p),
                          s.ctypes.data_as(ctypes.c_void_p), n,
                          out.ctypes.data_as(ctypes.c_void_p), cap)
    if m < 0:
        return None
    return out[:m]


def bpe_train_merges_native(sentences, freqs, required_chars, spec,
                            vocab_target: int):
    """Full BPE merge loop in C++ with real libstdc++ containers (the
    iteration-order/tie mechanics train/bpe.py emulates). Returns the
    merged piece strings in creation order, or None if unavailable.
    ``sentences``: list[str] (post whitespace-split), ``freqs``:
    list[int], ``required_chars``: dict codepoint->freq, ``spec``: the
    TrainerSpec (validity flags), ``vocab_target``: number of merges."""
    lib = _load()
    if lib is None:
        return None
    if not getattr(lib, "_bpetrain_ready", False):
        lib.spm_bpe_train.restype = ctypes.c_int64
        lib.spm_bpe_train.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p]
        lib._bpetrain_ready = True
    from ..utils import unicode_script

    los, his, ids, _names = unicode_script._tables()
    wc, wo = _utf32_concat(sentences)
    fr = np.ascontiguousarray(freqs, np.int64)
    rc = np.fromiter(required_chars.keys(), np.uint32, len(required_chars))
    rf = np.fromiter(required_chars.values(), np.int64,
                     len(required_chars))
    slo = np.ascontiguousarray(los, np.int32)
    shi = np.ascontiguousarray(his, np.int32)
    sid = np.ascontiguousarray(ids, np.int32)
    cap = max(int(wo[-1]) * 4 + 1024, 4096)
    out_cps = np.empty(cap, np.uint32)
    out_off = np.zeros(vocab_target + 2, np.int64)
    out_n = ctypes.c_int64(0)
    rcv = rc.ctypes.data_as(ctypes.c_void_p) if len(rc) else None
    rfv = rf.ctypes.data_as(ctypes.c_void_p) if len(rf) else None
    nb = lib.spm_bpe_train(
        wo.ctypes.data_as(ctypes.c_void_p),
        wc.ctypes.data_as(ctypes.c_void_p), len(sentences),
        fr.ctypes.data_as(ctypes.c_void_p),
        rcv, rfv, len(rc),
        int(spec.max_sentencepiece_length),
        int(bool(spec.treat_whitespace_as_suffix)),
        int(bool(spec.split_by_whitespace)),
        int(bool(spec.split_by_number)),
        int(bool(spec.split_by_unicode_script)),
        slo.ctypes.data_as(ctypes.c_void_p),
        shi.ctypes.data_as(ctypes.c_void_p),
        sid.ctypes.data_as(ctypes.c_void_p), len(slo),
        unicode_script.script_id("Common"),
        unicode_script.script_id("Han"),
        unicode_script.script_id("Hiragana"),
        unicode_script.script_id("Katakana"),
        vocab_target,
        out_cps.ctypes.data_as(ctypes.c_void_p), cap,
        out_off.ctypes.data_as(ctypes.c_void_p), ctypes.byref(out_n))
    if nb < 0:
        return None
    n = out_n.value
    full = out_cps[:nb].tobytes().decode("utf-32-le",
                                         errors="surrogatepass")
    return [full[int(out_off[i]):int(out_off[i + 1])] for i in range(n)]


def digamma_batch(x):
    """Exact digamma over a float64 array (C++, glibc log) or None."""
    lib = _load()
    if lib is None:
        return None
    if not getattr(lib, "_dg_ready", False):
        lib.spm_digamma.restype = None
        lib.spm_digamma.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int64]
        lib._dg_ready = True
    xa = np.ascontiguousarray(x, np.float64)
    out = np.empty(len(xa), np.float64)
    lib.spm_digamma(xa.ctypes.data_as(ctypes.c_void_p),
                    out.ctypes.data_as(ctypes.c_void_p), len(xa))
    return out


def prune_losses(freq, F_occ, vsum, always_keep, alt_ids, alt_off):
    """Candidate losses for PruneSentencePieces (exact float arithmetic
    in C++). Returns (flags uint8[m] 0=skip/1=keep/2=candidate,
    losses float32[m]) or None."""
    lib = _load()
    if lib is None:
        return None
    if not getattr(lib, "_ploss_ready", False):
        lib.spm_prune_losses.restype = ctypes.c_int
        lib.spm_prune_losses.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_float,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
        lib._ploss_ready = True
    fr = np.ascontiguousarray(freq, np.float32)
    fo = np.ascontiguousarray(F_occ, np.float32)
    ak = np.ascontiguousarray(always_keep, np.uint8)
    ai = np.ascontiguousarray(alt_ids, np.int32)
    ao = np.ascontiguousarray(alt_off, np.int64)
    m = len(fr)
    flags = np.zeros(m, np.uint8)
    losses = np.zeros(m, np.float32)
    lib.spm_prune_losses(
        fr.ctypes.data_as(ctypes.c_void_p),
        fo.ctypes.data_as(ctypes.c_void_p), ctypes.c_float(vsum),
        ak.ctypes.data_as(ctypes.c_void_p),
        ai.ctypes.data_as(ctypes.c_void_p),
        ao.ctypes.data_as(ctypes.c_void_p), m,
        flags.ctypes.data_as(ctypes.c_void_p),
        losses.ctypes.data_as(ctypes.c_void_p))
    return flags, losses


def prune_freqs(path_ids, path_off, ws, m: int, nthreads: int):
    """Viterbi path stats for the prune phase: replays the reference's
    per-thread strided float32 accumulation (unigram_model_trainer.cc:
    389-424) in C. Returns (freq f32[m], F_occ f32[m], vsum) or None."""
    lib = _load()
    if lib is None:
        return None
    if not getattr(lib, "_pfreq_ready", False):
        lib.spm_prune_freqs.restype = ctypes.c_int
        lib.spm_prune_freqs.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib._pfreq_ready = True
    pi = np.ascontiguousarray(path_ids, np.int32)
    po = np.ascontiguousarray(path_off, np.int64)
    w = np.ascontiguousarray(ws, np.float32)
    n_s = len(po) - 1
    freq = np.empty(m, np.float32)
    F_occ = np.empty(m, np.float32)
    vsum = np.zeros(1, np.float32)
    lib.spm_prune_freqs(
        pi.ctypes.data_as(ctypes.c_void_p),
        po.ctypes.data_as(ctypes.c_void_p),
        w.ctypes.data_as(ctypes.c_void_p), n_s, m, nthreads,
        freq.ctypes.data_as(ctypes.c_void_p),
        F_occ.ctypes.data_as(ctypes.c_void_p),
        vsum.ctypes.data_as(ctypes.c_void_p))
    return freq, F_occ, vsum[0]


def seed_filter(arr, sa, nodes_lrd, spec, num_threads: int = 1):
    """Seed node filtering (validity + boundary + score) in C++, threaded
    over disjoint node ranges (output independent of thread count).
    Returns (node_idx int32[m], score int64[m]) or None."""
    lib = _load()
    if lib is None:
        return None
    if not getattr(lib, "_seedf_ready", False):
        lib.spm_seed_filter.restype = ctypes.c_int64
        lib.spm_seed_filter.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32]
        lib._seedf_ready = True
    from ..utils import unicode_script

    los, his, ids, _ = unicode_script._tables()
    a = np.ascontiguousarray(arr, np.int32)
    s = np.ascontiguousarray(sa, np.int32)
    nd = np.ascontiguousarray(nodes_lrd, np.int32)
    n = len(nd)
    slo = np.ascontiguousarray(los, np.int32)
    shi = np.ascontiguousarray(his, np.int32)
    sid = np.ascontiguousarray(ids, np.int32)
    out_idx = np.empty(n, np.int32)
    out_score = np.empty(n, np.int64)
    m = lib.spm_seed_filter(
        a.ctypes.data_as(ctypes.c_void_p),
        s.ctypes.data_as(ctypes.c_void_p),
        nd.ctypes.data_as(ctypes.c_void_p), n,
        int(spec.max_sentencepiece_length),
        int(bool(spec.treat_whitespace_as_suffix)),
        int(bool(spec.split_by_whitespace)),
        int(bool(spec.split_by_number)),
        int(bool(spec.split_by_unicode_script)),
        slo.ctypes.data_as(ctypes.c_void_p),
        shi.ctypes.data_as(ctypes.c_void_p),
        sid.ctypes.data_as(ctypes.c_void_p), len(slo),
        unicode_script.script_id("Common"),
        unicode_script.script_id("Han"),
        unicode_script.script_id("Hiragana"),
        unicode_script.script_id("Katakana"),
        out_idx.ctypes.data_as(ctypes.c_void_p),
        out_score.ctypes.data_as(ctypes.c_void_p),
        int(num_threads))
    if m < 0:
        return None
    return out_idx[:m], out_score[:m]


def em2_pack(wlen, wfreq, wcls, wrow, wcol, csr, classes, row_lo, row_hi,
             lane_base, K: int, num_seed: int, shapes):
    """One em2 mesh shard's packed arrays (tpu/em2.py::build_shard_arrays
    run in C): returns (flags u8[R,C] per class, freq f32[R,C] per class,
    dest int32[n_cand] sid-sorted, seg_pos int32[num_seed+1]) or None."""
    lib = _load()
    if lib is None:
        return None
    if not getattr(lib, "_em2p_ready", False):
        lib.spm_em2_pack.restype = ctypes.c_int64
        lib.spm_em2_pack.argtypes = [
            ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib._em2p_ready = True
    n = len(wlen)
    wlen = np.ascontiguousarray(wlen, np.int32)
    wfreq = np.ascontiguousarray(wfreq, np.float32)
    wcls = np.ascontiguousarray(wcls, np.int32)
    wrow = np.ascontiguousarray(wrow, np.int32)
    wcol = np.ascontiguousarray(wcol, np.int32)
    coff = np.ascontiguousarray(csr[0], np.int64)
    cpos = np.ascontiguousarray(csr[1], np.int32)
    clen = np.ascontiguousarray(csr[2], np.int32)
    csid = np.ascontiguousarray(csr[3], np.int32)
    ncls = len(classes)
    cls_c = np.ascontiguousarray(classes, np.int32)
    rlo = np.ascontiguousarray(row_lo, np.int32)
    rhi = np.ascontiguousarray(row_hi, np.int32)
    lbase = np.ascontiguousarray(lane_base, np.int64)
    flags = [np.zeros(sh, np.uint8) for sh in shapes]
    freq = [np.zeros(sh, np.float32) for sh in shapes]
    fptr = (ctypes.c_void_p * ncls)(
        *[f.ctypes.data_as(ctypes.c_void_p).value for f in flags])
    qptr = (ctypes.c_void_p * ncls)(
        *[f.ctypes.data_as(ctypes.c_void_p).value for f in freq])
    cap = int(len(cpos))
    dest = np.empty(max(cap, 1), np.int32)
    seg_pos = np.full(num_seed + 1, -1, np.int32)
    m = lib.spm_em2_pack(
        n, wlen.ctypes.data_as(ctypes.c_void_p),
        wfreq.ctypes.data_as(ctypes.c_void_p),
        wcls.ctypes.data_as(ctypes.c_void_p),
        wrow.ctypes.data_as(ctypes.c_void_p),
        wcol.ctypes.data_as(ctypes.c_void_p),
        coff.ctypes.data_as(ctypes.c_void_p),
        cpos.ctypes.data_as(ctypes.c_void_p),
        clen.ctypes.data_as(ctypes.c_void_p),
        csid.ctypes.data_as(ctypes.c_void_p),
        ncls, cls_c.ctypes.data_as(ctypes.c_void_p),
        rlo.ctypes.data_as(ctypes.c_void_p),
        rhi.ctypes.data_as(ctypes.c_void_p),
        lbase.ctypes.data_as(ctypes.c_void_p),
        int(K), int(num_seed),
        ctypes.cast(fptr, ctypes.c_void_p),
        ctypes.cast(qptr, ctypes.c_void_p),
        dest.ctypes.data_as(ctypes.c_void_p),
        seg_pos.ctypes.data_as(ctypes.c_void_p), cap)
    if m < 0:
        return None
    return flags, freq, dest[:m].copy(), seg_pos
