# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Shared trainer pipeline (reference src/trainer_interface.{h,cc}).

Covers: spec verification (trainer_interface.cc:49-91), corpus loading with
text/TSV formats, too-long-line filtering and reservoir sampling
(:269-345), corpus normalization with meta-piece masking (:349-383),
character coverage / required chars / rare-char→UNK rewrite (:386-445),
IsValidSentencePiece (:178-267), whitespace pre-tokenization (:465-477),
meta-piece assembly (:578-643), and model serialization with embedded
self-test samples (:479-570).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..normalizer.normalize import Normalizer, PrefixMatcher
from ..proto.spec import (ModelProto, ModelType, NormalizerSpec, PieceType,
                          SelfTestData, SelfTestSample,
                          SentencePiece as SentencePieceProto, TrainerSpec)
from ..utils import unicode_script
from ..utils.unicode import is_valid_codepoint

log = logging.getLogger("sentencepiece_tpu.train")

WS_CHAR = 0x2581
WS_STR = "▁"
UNK_CHAR = 0x2585
UNK_STR = "▅"
UPP_BOUNDARY_CHAR = 0x0009
UPP_BOUNDARY_STR = "\t"

Sentence = Tuple[str, int]  # (text, freq)


def fast_cumsum(x: "np.ndarray") -> "np.ndarray":
    """int64 inclusive prefix sum at memory-bound speed.

    numpy's cumsum runs a scalar loop with per-element ufunc overhead;
    for corpus-sized bool masks (tens of MB) that is hundreds of
    milliseconds per call, so those route to a single-pass C loop in
    native.cc. (An earlier revision used torch.cumsum instead — the
    cumsum itself was fast but a cold `import torch` costs ~1.9 s of
    process time, which dominated every training run on this host.)"""
    if x.dtype in (np.bool_, np.uint8) and x.size >= (1 << 18):
        from .. import native
        out = native.cumsum_mask(x)
        if out is not None:
            return out
    return np.cumsum(x, dtype=np.int64)


def _key_bytes(k):
    return k.encode("utf-8", errors="surrogateescape") if isinstance(k, str) else k


def sorted_freq_desc(items) -> List[Tuple]:
    """freq desc, ties by key ascending (bytes order for strings, matching
    C++ std::string operator<)."""
    return sorted(items, key=lambda kv: (-kv[1], _key_bytes(kv[0])
                                         if isinstance(kv[0], (str, bytes))
                                         else kv[0]))


def verify_spec(spec: TrainerSpec) -> None:
    """trainer_interface.cc:49-91."""
    def check(cond, msg):
        if not cond:
            raise ValueError(f"TrainerSpec check failed: {msg}")

    check(len(spec.input) > 0, "input required")
    check(spec.vocab_size > 0, "vocab_size > 0")
    if spec.model_type in (ModelType.UNIGRAM, ModelType.BPE):
        check(not spec.use_all_vocab,
              "--use_all_vocab=true is valid for WORD/CHAR model.")
    rng = [("character_coverage", 0.98, 1.0),
           ("max_sentencepiece_length", 1, 512),
           ("num_sub_iterations", 1, 10),
           ("num_threads", 1, 128),
           ("self_test_sample_size", 0, 1000),
           ("shrinking_factor", 0.5, 0.95),
           ("max_sentence_length", 10, 1073741824)]
    for name, lo, hi in rng:
        v = getattr(spec, name)
        check(lo <= v <= hi, f"{name}={v} not in [{lo},{hi}]")
    check(spec.input_sentence_size <= 0 or spec.input_sentence_size > 100,
          "input_sentence_size")
    for p in ("unk_piece", "bos_piece", "eos_piece", "pad_piece"):
        check(bool(getattr(spec, p)), f"{p} must not be empty")


class Mt19937:
    """std::mt19937 (Knuth init_genrand seeding + standard tempering) —
    the exact engine behind the reference's fixed-seed reservoir
    (util.h:749-778)."""

    N, M = 624, 397
    MATRIX_A = 0x9908B0DF
    UPPER = 0x80000000
    LOWER = 0x7FFFFFFF

    def __init__(self, seed: int):
        mt = [0] * self.N
        mt[0] = seed & 0xFFFFFFFF
        for i in range(1, self.N):
            mt[i] = (1812433253 * (mt[i - 1] ^ (mt[i - 1] >> 30)) + i) \
                & 0xFFFFFFFF
        self.mt = mt
        self.idx = self.N

    def _generate(self) -> None:
        mt = self.mt
        for i in range(self.N):
            y = (mt[i] & self.UPPER) | (mt[(i + 1) % self.N] & self.LOWER)
            v = mt[(i + self.M) % self.N] ^ (y >> 1)
            if y & 1:
                v ^= self.MATRIX_A
            mt[i] = v
        self.idx = 0

    def __call__(self) -> int:
        if self.idx >= self.N:
            self._generate()
        y = self.mt[self.idx]
        self.idx += 1
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y ^= y >> 18
        return y & 0xFFFFFFFF


def std_uniform_int(eng: Mt19937, urange: int) -> int:
    """libstdc++ (GCC 12) uniform_int_distribution<size_t>(0, urange)(eng)
    over a 32-bit engine: Lemire downscaling
    (bits/uniform_int_dist.h _S_nd<uint64>, validated against a compiled
    harness)."""
    urngrange = 0xFFFFFFFF
    if urange >= urngrange:
        assert urange == urngrange, "upscaling path not needed (< 2^32)"
        return eng()
    uerange = urange + 1
    product = eng() * uerange
    low = product & 0xFFFFFFFF
    if low < uerange:
        threshold = (0x100000000 - uerange) % uerange
        while low < threshold:
            product = eng() * uerange
            low = product & 0xFFFFFFFF
    return product >> 32


class ReservoirSampler:
    """Reservoir sampling matching reference util.h:749-778 exactly:
    std::uniform_int_distribution<size_t>(0, total-1) over std::mt19937
    with the fixed seed — emulated engine + libstdc++ downscaling, so the
    sampled subset is byte-identical to the reference binary's."""

    def __init__(self, size: int, seed: int):
        self.size = size
        self.total = 0
        self.items: List = []
        self._eng = Mt19937(seed)

    def add(self, item) -> None:
        if self.size == 0:
            return
        self.total += 1
        if len(self.items) < self.size:
            self.items.append(item)
        else:
            j = std_uniform_int(self._eng, self.total - 1)
            if j < self.size:
                self.items[j] = item


class TrainerInterface:
    """Base trainer: corpus pipeline + serialization."""

    def __init__(self, trainer_spec: TrainerSpec,
                 normalizer_spec: NormalizerSpec):
        self.trainer_spec = trainer_spec
        self.normalizer_spec = normalizer_spec
        self.sentences: List[Sentence] = []
        self.required_chars: Dict[int, int] = {}  # codepoint -> freq
        self.final_pieces: List[Tuple[str, float]] = []
        self.self_test_samples: List[str] = []
        self.meta_pieces: Dict[int, Tuple[str, int]] = {}
        verify_spec(trainer_spec)
        self._init_meta_pieces()

    # -- meta pieces (trainer_interface.cc:578-643) ---------------------------
    def _init_meta_pieces(self) -> None:
        ts = self.trainer_spec
        has_unk = False

        def insert_id(idx: int, w: str) -> None:
            nonlocal has_unk
            if idx < 0:
                return
            if (idx >= ts.vocab_size or idx in self.meta_pieces
                    or (has_unk and w == ts.unk_piece)):
                raise ValueError(f"invalid meta piece id {idx} for {w}")
            if w == ts.unk_piece:
                has_unk = True
            t = (PieceType.UNKNOWN if w == ts.unk_piece
                 else PieceType.CONTROL)
            self.meta_pieces[idx] = (w, t)

        insert_id(ts.unk_id, ts.unk_piece)
        insert_id(ts.bos_id, ts.bos_piece)
        insert_id(ts.eos_id, ts.eos_piece)
        insert_id(ts.pad_id, ts.pad_piece)
        if not has_unk:
            raise ValueError(f"{ts.unk_piece} must be defined.")

        dup = set()
        next_id = [0]

        def insert_meta_symbol(w: str, t: int) -> None:
            if w in dup:
                raise ValueError(f"{w} is already defined.")
            dup.add(w)
            if w == ts.unk_piece:
                raise ValueError(
                    f"{ts.unk_piece} must not be defined with "
                    "--control_symbols and --user_defined_symbols.")
            if w == ts.bos_piece and ts.bos_id >= 0:
                self.meta_pieces[ts.bos_id] = (w, t)
            elif w == ts.eos_piece and ts.eos_id >= 0:
                self.meta_pieces[ts.eos_id] = (w, t)
            elif w == ts.pad_piece and ts.pad_id >= 0:
                self.meta_pieces[ts.pad_id] = (w, t)
            else:
                while next_id[0] in self.meta_pieces:
                    next_id[0] += 1
                self.meta_pieces[next_id[0]] = (w, t)

        for w in ts.control_symbols:
            insert_meta_symbol(w, PieceType.CONTROL)
        for w in ts.user_defined_symbols:
            insert_meta_symbol(w, PieceType.USER_DEFINED)

    # -- piece validity (trainer_interface.cc:178-267) -------------------------
    _iv_cfg = None

    def is_valid_sentencepiece(self, cps) -> bool:
        # spec fields hoisted out of the hot path (proto attribute lookup
        # dominates otherwise); the spec is fixed once training starts
        cfg = self._iv_cfg
        if cfg is None:
            ts = self.trainer_spec
            cfg = self._iv_cfg = (
                ts.max_sentencepiece_length, ts.treat_whitespace_as_suffix,
                ts.split_by_whitespace, ts.split_by_number,
                ts.split_by_unicode_script)
        max_len, ws_suffix, split_ws, split_num, split_script = cfg
        n = len(cps)
        if n == 0 or n > max_len:
            return False
        ANY = -1
        han = unicode_script.script_id("Han")
        hira = unicode_script.script_id("Hiragana")
        kata = unicode_script.script_id("Katakana")
        get_script = unicode_script.get_script
        prev_script = ANY
        for pos, c in enumerate(cps):
            if c == UNK_CHAR or c == 0x0000 or c == UPP_BOUNDARY_CHAR:
                return False
            if c == 0x0020:
                log.warning("space must not be included in normalized string.")
                return False
            if not is_valid_codepoint(c):
                return False
            if c == WS_CHAR:
                if ws_suffix:
                    if ((split_ws and pos < n - 1)
                            or (not split_ws and pos < n - 1 and pos == 0)):
                        return False
                else:
                    if ((split_ws and pos > 0)
                            or (not split_ws and pos > 0 and pos == n - 1)):
                        return False
            else:
                s = get_script(c)
                if s == hira or s == kata or c == 0x30FC:
                    s = han
                if not split_num and 0x30 <= c <= 0x39:
                    s = ANY
                if (split_script and s != ANY
                        and prev_script != ANY and prev_script != s):
                    return False
                prev_script = s
        return True

    def valid_substring_mask(self, arr: "np.ndarray", offs: "np.ndarray",
                             lens: "np.ndarray") -> "np.ndarray":
        """Vectorized is_valid_sentencepiece over substrings
        ``arr[offs[k]:offs[k]+lens[k]]`` of one codepoint array — the seed
        phase checks ~1e5 suffix-tree nodes against the same corpus, so the
        per-position predicates are precomputed once and each node reduces
        to prefix-sum lookups. Semantics identical to the scalar method."""
        import numpy as np
        ts = self.trainer_spec
        n = len(arr)
        ANY = -1
        han = unicode_script.script_id("Han")
        hira = unicode_script.script_id("Hiragana")
        kata = unicode_script.script_id("Katakana")

        bad = ((arr == UNK_CHAR) | (arr == 0x0000)
               | (arr == UPP_BOUNDARY_CHAR) | (arr == 0x0020)
               | ~(((arr >= 0) & (arr < 0xD800))
                   | ((arr >= 0xE000) & (arr <= 0x10FFFF))))
        ws = (arr == WS_CHAR) & ~bad
        s = unicode_script.get_script_array(
            np.where(bad, 0x41, arr)).astype(np.int64)
        s = np.where((s == hira) | (s == kata) | (arr == 0x30FC), han, s)
        if not ts.split_by_number:
            s = np.where((arr >= 0x30) & (arr <= 0x39), ANY, s)
        # previous non-ws, non-bad position (bad positions poison the whole
        # substring anyway, so their script values are irrelevant)
        is_char = ~ws & ~bad
        idx = np.arange(n)
        prev_char = np.maximum.accumulate(np.where(is_char, idx, -1))
        prevnw = np.full(n, -1, np.int64)
        if n > 1:
            prevnw[1:] = prev_char[:-1]
        pv = np.where(prevnw >= 0, s[np.maximum(prevnw, 0)], ANY)
        pairbad = (is_char & (prevnw >= 0) & (s != ANY) & (pv != ANY)
                   & (s != pv))
        # next char position at-or-after i (for the first-char exclusion)
        nextnw = np.full(n + 1, n, np.int64)
        rev = np.where(is_char[::-1], idx[::-1], n)
        nextnw[:n] = np.minimum.accumulate(rev)[::-1]

        def psum(x):
            out = np.zeros(n + 1, np.int64)
            out[1:] = fast_cumsum(x)
            return out

        Bbad, Bws, Bpair = psum(bad), psum(ws), psum(pairbad)

        o = np.asarray(offs, np.int64)
        D = np.asarray(lens, np.int64)
        e = o + D
        valid = (D > 0) & (D <= ts.max_sentencepiece_length)
        valid &= (Bbad[e] - Bbad[o]) == 0
        if ts.treat_whitespace_as_suffix:
            if ts.split_by_whitespace:
                valid &= (Bws[np.maximum(e - 1, o)] - Bws[o]) == 0
            else:
                valid &= ~((D > 1) & ws[o])
        else:
            if ts.split_by_whitespace:
                valid &= (Bws[e] - Bws[np.minimum(o + 1, e)]) == 0
            else:
                valid &= ~((D > 1) & ws[np.maximum(e - 1, 0)])
        if ts.split_by_unicode_script:
            f = nextnw[o]  # first char position in range (or >= e)
            lo = np.minimum(np.where(f < e, f + 1, e), e)
            valid &= (Bpair[e] - Bpair[lo]) == 0
        return valid

    # -- corpus loading (trainer_interface.cc:269-462) -------------------------
    def load_sentences(self) -> None:
        ts = self.trainer_spec
        assert not self.sentences and not self.required_chars
        if ts.input_format not in ("", "text", "tsv"):
            raise ValueError("Supported formats are 'text' and 'tsv'.")
        is_tsv = ts.input_format == "tsv"

        sampler: Optional[ReservoirSampler] = None
        if ts.input_sentence_size > 0 and ts.shuffle_input_sentence:
            sampler = ReservoirSampler(ts.input_sentence_size, 12345678)
        test_sampler = ReservoirSampler(ts.self_test_sample_size, 12345678)

        too_long = 0
        stop = False
        # fast path: plain text, no reservoir, no self-test sampling, no
        # early stop — every per-line decision is byte-level, so the
        # corpus stays as bytes until the (native) normalizer pass. No
        # RNG is consumed (ReservoirSampler.add with size 0 returns
        # before drawing), so this is stream-identical to the slow loop.
        fast_bytes = (not is_tsv and sampler is None
                      and ts.self_test_sample_size == 0
                      and ts.input_sentence_size <= 0)
        if fast_bytes:
            unk_b = UNK_STR.encode("utf-8")
            maxlen = ts.max_sentence_length
            for filename in ts.input:
                log.info("Loading corpus: %s", filename)
                with open(filename, "rb") as f:
                    chunks = f.read().split(b"\n")
                if chunks and chunks[-1] == b"":
                    chunks.pop()
                too_long += sum(1 for r in chunks if len(r) > maxlen)
                self.sentences.extend(
                    (r, 1) for r in chunks
                    if r and len(r) <= maxlen and unk_b not in r)
        for filename in (() if fast_bytes else ts.input):
            if stop:
                break
            log.info("Loading corpus: %s", filename)
            with open(filename, "rb") as f:
                chunks = f.read().split(b"\n")
                if chunks and chunks[-1] == b"":
                    chunks.pop()  # ReadLine yields no line after final \n
                for raw in chunks:
                    sentence = raw.decode("utf-8", errors="surrogateescape")
                    freq = 1
                    if is_tsv:
                        v = sentence.split("\t")
                        if len(v) != 2:
                            raise ValueError(
                                f"Input format must be: word <tab> freq. "
                                f"{sentence}")
                        sentence, freq = v[0], int(v[1])
                        if freq < 1:
                            raise ValueError("freq must be >= 1")
                    if not sentence:
                        continue
                    if len(raw) > ts.max_sentence_length:
                        too_long += 1
                        continue
                    if UNK_STR in sentence:
                        log.info("Reserved chars are found. Skipped: %s",
                                 sentence)
                        continue
                    test_sampler.add(sentence)
                    if sampler is not None:
                        sampler.add((sentence, freq))
                    else:
                        self.sentences.append((sentence, freq))
                        if (ts.input_sentence_size > 0
                                and len(self.sentences)
                                >= ts.input_sentence_size):
                            stop = True
                            break
        if sampler is not None:
            self.sentences = list(sampler.items)
        self.self_test_samples = list(test_sampler.items)
        if too_long:
            log.info("Skipped %d too long sentences.", too_long)

        # normalization with meta-piece masking (:349-383)
        normalizer = Normalizer(self.normalizer_spec,
                                treat_whitespace_as_suffix=False)
        meta_set = [w for w, _ in self.meta_pieces.values()]
        matcher = PrefixMatcher(meta_set)
        nat = normalizer._native_impl()
        batch = None
        if nat is not None:
            raws = ([t for t, _ in self.sentences] if fast_bytes else
                    [t.encode("utf-8", errors="surrogateescape")
                     for t, _ in self.sentences])
            batch = nat.normalize_batch(raws,
                                        num_threads=ts.num_threads)
        if batch is not None:
            out, off = batch
            # the native output buffer is over-allocated (4x corpus);
            # slice BEFORE tobytes so only the valid bytes copy
            blob = out[:int(off[len(self.sentences)])].tobytes()
            rep = UPP_BOUNDARY_STR.encode()
            # meta surfaces almost never occur in a corpus: when none
            # does, global_replace is the identity on every line, so the
            # whole corpus can decode in ONE call and split by
            # byte->char offset arithmetic (valid UTF-8 has exactly one
            # char per non-continuation byte) — byte-identical to the
            # per-line loop at C speed. Malformed bytes (strict decode
            # fails) or present meta surfaces fall back to the loop.
            whole: Optional[str] = None
            if not any(m.encode("utf-8") in blob for m in meta_set if m):
                try:
                    whole = blob.decode("utf-8")
                except UnicodeDecodeError:
                    whole = None
            if whole is not None:
                offs = np.asarray(off, np.int64)[:len(self.sentences) + 1]
                # per-line char offset = count of char-start bytes below
                # each byte offset. The native op fuses mask + prefix-sum
                # + gather into one blob pass. (Earlier forms: an
                # np.add.reduceat paid ~12 us of ufunc overhead PER
                # SEGMENT — 5.4 s on a 26 MB corpus of ~450k lines; a
                # full materialized prefix-sum wrote 8 bytes per corpus
                # byte — ~0.5 s at 14 MB.)
                from .. import native
                coff = native.charoffs_utf8(blob, offs)
                if coff is None:
                    barr = np.frombuffer(blob, np.uint8)
                    mask = (barr & 0xC0) != 0x80
                    cum = np.zeros(len(barr) + 1, np.int64)
                    cum[1:] = fast_cumsum(mask)
                    coff = cum[offs]
                sents = [(whole[coff[i]:coff[i + 1]], freq)
                         for i, (_t, freq) in enumerate(self.sentences)]
            else:
                sents = [(matcher.global_replace(
                              blob[off[i]:off[i + 1]], rep).decode(
                                  "utf-8", errors="surrogateescape"), freq)
                         for i, (_t, freq) in enumerate(self.sentences)]
        else:
            sents = [(matcher.global_replace(
                          normalizer.normalize(
                              t if isinstance(t, str) else
                              t.decode("utf-8",
                                       errors="surrogateescape"))[0],
                          UPP_BOUNDARY_STR.encode()).decode(
                              "utf-8", errors="surrogateescape"), freq)
                     for t, freq in self.sentences]
        # Empty-sentence removal MUST replicate the reference's
        # swap-with-last loop verbatim (trainer_interface.cc:373-380): the
        # resulting sentence ORDER feeds the suffix-array seed indices,
        # EM thread striding, and BPE position ids — all tie-breakers.
        # (The swapped-in element is not rechecked, exactly like the C++.)
        # (the reference's per-line space CHECK runs here; ours is the
        # corpus-level `arr == 0x0020` scan below — same error, one pass
        # instead of 450k substring scans)
        i = 0
        while i < len(sents):
            if not sents[i][0]:
                last = len(sents) - 1
                sents[i] = sents[last]
                sents.pop()
            i += 1
        self.sentences = sents

        # char frequencies (:386-409), vectorized over the corpus
        # codepoint array (same counting as the scalar loop in git history)
        corpus_cat = "".join(s for s, _ in self.sentences)
        arr = np.frombuffer(
            corpus_cat.encode("utf-32-le", errors="surrogatepass"),
            np.uint32).view(np.int32)  # codepoints < 2^31: view is exact
        s_lens_np = np.fromiter((len(s) for s, _ in self.sentences),
                                np.int64, len(self.sentences))
        s_freqs_np = np.fromiter((f for _, f in self.sentences), np.int64,
                                 len(self.sentences))
        if bool((arr == 0x0020).any()):  # 0x20 is always a valid codepoint
            raise ValueError(
                "space must not be included in normalized string.")
        if (s_freqs_np == 1).all():
            # plain-text corpora: unweighted integer bincount (exact).
            # Validity (nonzero, non-surrogate, <= 0x10FFFF) is a pure
            # VALUE predicate, so instead of mask-selecting a copy of the
            # corpus array, count everything and zero the invalid bins.
            cnt_full = np.bincount(arr)
            cnt_full[:1] = 0
            if len(cnt_full) > 0xD800:
                cnt_full[0xD800:0xE000] = 0
            uniq = np.nonzero(cnt_full)[0]
            cnt = cnt_full[uniq]
        else:
            valid_m = ((arr < 0xD800)
                       | ((arr >= 0xE000) & (arr <= 0x10FFFF))) & (arr > 0)
            w_rep = np.repeat(s_freqs_np, s_lens_np)
            cnt_full = np.bincount(
                arr, weights=np.where(valid_m, w_rep, 0).astype(np.float64))
            uniq = np.nonzero(cnt_full)[0]
            cnt = cnt_full[uniq].astype(np.int64)  # exact below 2^53
        chars_count: Dict[int, int] = {
            int(u): int(c) for u, c in zip(uniq, cnt)}
        all_chars_count = int(cnt.sum())
        log.info("all chars count=%d", all_chars_count)

        # required chars by coverage (:411-428)
        accumulated = 0
        for cp, freq in sorted_freq_desc(chars_count.items()):
            # `const float coverage` — float32 narrowing is observable at
            # exact cutoff boundaries (trainer_interface.cc:413)
            coverage = (float(np.float32(accumulated / all_chars_count))
                        if all_chars_count else 0)
            if (not ts.use_all_vocab
                    and coverage >= ts.character_coverage):
                log.info("Done: %.4f%% characters are covered.",
                         100.0 * coverage)
                break
            accumulated += freq
            if cp == 0x0020:
                raise ValueError("space in normalized string")
            if cp == UPP_BOUNDARY_CHAR:
                continue
            self.required_chars[cp] = freq
        log.info("Alphabet size=%d", len(self.required_chars))
        assert UNK_CHAR not in self.required_chars

        # rare chars -> UNK (:432-445): only codepoints actually present
        # and not required need translating, so str.translate does the
        # whole corpus at C speed
        req = self.required_chars
        bad = [int(u) for u in uniq if int(u) not in req]
        if bad:
            # rare chars are rare: locate the affected sentences via the
            # corpus codepoint array, then rewrite each from its codepoint
            # slice (UNK_STR is one char, so the rewrite preserves length —
            # a str.translate with a large dict pays a hash probe per char,
            # ~0.2 s/train on a 14 MB JA corpus)
            flag = np.zeros(0x110000, bool)
            flag[np.asarray(bad, np.int64)] = True
            pos_bad = np.nonzero(flag[arr])[0]
            if len(pos_bad):
                ends = np.cumsum(s_lens_np)
                starts = ends - s_lens_np
                for si in np.unique(np.searchsorted(
                        ends, pos_bad, side="right")).tolist():
                    seg = arr[starts[si]:ends[si]].copy()
                    seg[flag[seg]] = UNK_CHAR
                    s_new = seg.view(np.uint32).tobytes().decode(
                        "utf-32-le", errors="surrogatepass")
                    self.sentences[si] = (s_new, self.sentences[si][1])

        if ts.model_type not in (ModelType.WORD, ModelType.CHAR):
            if (len(self.required_chars) + len(self.meta_pieces)
                    > ts.vocab_size):
                raise ValueError(
                    "Vocabulary size is smaller than required_chars. "
                    f"{ts.vocab_size} vs "
                    f"{len(self.required_chars) + len(self.meta_pieces)}. "
                    "Increase vocab_size or decrease character_coverage "
                    "with --character_coverage option.")
        log.info("Done! preprocessed %d sentences.", len(self.sentences))

    def split_sentences_by_whitespace(self) -> None:
        """trainer_interface.cc:465-477: sentence list -> word-freq list.

        str-level equivalent of models/base.split_into_words (U+2581 is
        one char, so the byte walk reduces to str.split with the
        delimiter re-attached: prefix mode glues it to the following
        word, suffix mode to the preceding one)."""
        WS = "▁"
        suffix = bool(self.trainer_spec.treat_whitespace_as_suffix)
        tokens: Dict[str, int] = {}
        get = tokens.get
        # text corpora are all freq==1: count raw split parts with one
        # C-speed Counter and re-attach the marker on the ~unique keys
        # only, instead of a per-word dict update (same multiset of
        # words -> identical counts; sorted_freq_desc re-sorts, so
        # accumulation order is immaterial)
        if not suffix and all(f == 1 for _, f in self.sentences):
            from collections import Counter
            rests: List[str] = []
            firsts: List[str] = []
            for s, _ in self.sentences:
                parts = s.split(WS)
                if parts[0]:
                    firsts.append(parts[0])
                rests.extend(parts[1:])
            tokens = {}
            for k, v in Counter(rests).items():
                tokens[WS + k] = v
            for k, v in Counter(firsts).items():
                tokens[k] = tokens.get(k, 0) + v
            self.sentences = sorted_freq_desc(tokens.items())
            log.info("Tokenized into %d words", len(self.sentences))
            return
        for s, freq in self.sentences:
            parts = s.split(WS)
            if suffix:
                for p in parts[:-1]:
                    w = p + WS
                    tokens[w] = get(w, 0) + freq
                if parts[-1]:
                    w = parts[-1]
                    tokens[w] = get(w, 0) + freq
            else:
                if parts[0]:
                    w = parts[0]
                    tokens[w] = get(w, 0) + freq
                for p in parts[1:]:
                    w = WS + p
                    tokens[w] = get(w, 0) + freq
        self.sentences = sorted_freq_desc(tokens.items())
        log.info("Tokenized into %d words", len(self.sentences))

    # -- serialization (trainer_interface.cc:479-576) --------------------------
    def serialize(self) -> ModelProto:
        ts = self.trainer_spec
        model_proto = ModelProto()
        dup = set()
        pieces: List[SentencePieceProto] = []

        def check_piece(piece: str) -> None:
            if not piece:
                raise ValueError("empty piece")
            if piece in dup:
                raise ValueError(f"{piece} is already defined")
            dup.add(piece)

        fid = 0
        for idx in range(ts.vocab_size):
            if idx in self.meta_pieces:
                w, t = self.meta_pieces[idx]
                sp = SentencePieceProto()
                sp.piece = w
                sp.type = t
                sp.score = 0.0
                assert t != PieceType.NORMAL
                check_piece(w)
                pieces.append(sp)
            elif fid < len(self.final_pieces):
                w, score = self.final_pieces[fid]
                fid += 1
                sp = SentencePieceProto()
                sp.piece = w
                sp.score = score
                # type left UNSET for NORMAL pieces: the reference only
                # calls set_type for meta pieces (trainer_interface.cc:497),
                # so a normal piece's type field is absent on the wire.
                check_piece(w)
                pieces.append(sp)
        assert fid == len(self.final_pieces), \
            f"{fid} != {len(self.final_pieces)}"
        model_proto.pieces = pieces
        model_proto.trainer_spec = ts.copy()
        model_proto.normalizer_spec = self.normalizer_spec.copy()
        if not ts.hard_vocab_limit or ts.model_type == ModelType.CHAR:
            assert ts.vocab_size >= len(pieces)
            model_proto.trainer_spec.vocab_size = len(pieces)
        else:
            if ts.vocab_size != len(pieces):
                raise RuntimeError(
                    f"vocab_size {ts.vocab_size} != pieces {len(pieces)}; "
                    "set --hard_vocab_limit=false to allow a smaller vocab")
        return model_proto

    def save_model(self, filename: str) -> ModelProto:
        log.info("Saving model: %s", filename)
        model_proto = self.serialize()
        if self.self_test_samples:
            from ..processor import SentencePieceProcessor

            sp = SentencePieceProcessor(model_proto=model_proto)
            std = SelfTestData()
            samples = []
            for inp in self.self_test_samples:
                sample = SelfTestSample()
                sample.input = inp
                sample.expected = " ".join(sp.encode_as_pieces(inp))
                samples.append(sample)
            std.samples = samples
            model_proto.self_test_data = std
        with open(filename, "wb") as f:
            f.write(model_proto.serialize())
        return model_proto

    def save_vocab(self, filename: str,
                   model_proto: Optional[ModelProto] = None) -> None:
        log.info("Saving vocabs: %s", filename)
        if model_proto is None:
            model_proto = self.serialize()
        with open(filename, "w", encoding="utf-8") as f:
            for piece in model_proto.pieces:
                score = piece.score
                # C++ ostream prints float with %g-style 6 sig digits
                f.write(f"{piece.piece}\t{_cpp_float_str(score)}\n")

    def save(self) -> ModelProto:
        proto = self.save_model(self.trainer_spec.model_prefix + ".model")
        # the pieces are identical either way (self_test_data is the only
        # post-serialize mutation); reuse the proto instead of rebuilding
        # the vocab-size object tree a second time
        self.save_vocab(self.trainer_spec.model_prefix + ".vocab", proto)
        return proto

    # -- entry point -----------------------------------------------------------
    def train(self) -> ModelProto:
        raise NotImplementedError


def _cpp_float_str(v: float) -> str:
    """Format a float the way `std::ostringstream << float` does (%g, 6
    significant digits; -0 keeps its sign)."""
    return f"{float(v):.6g}"
