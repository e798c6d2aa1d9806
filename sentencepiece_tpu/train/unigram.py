# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Unigram LM trainer (reference src/unigram_model_trainer.{h,cc}).

Pipeline (unigram_model_trainer.cc:539-603):
  seed via suffix-tree internal nodes (:124-225) → EM loop
  [num_sub_iterations × (E-step :237-287, digamma M-step :47-57,298-332)]
  → prune to max(desired, 0.75·n) (:337-491) until ≤ 1.1·vocab_size →
  finalize (:497-537) → save.

Two engines compute the E-step / Viterbi statistics:

  * the HOST engine (this module): scalar float32 arithmetic replaying the
    reference's exact accumulation order, including the per-thread strided
    partial sums merged in thread order (RunEStep :252-280) — the
    conformance reference;
  * the DEVICE engine (sentencepiece_tpu.tpu.em): batched forward/backward
    over dense word lattices with `psum` count reduction over the device
    mesh — the production path for large corpora.

Training lattices are built ONCE against the seed vocabulary: every later
vocabulary is a subset of the seed, so each word's candidate-node table
(pos, len, seed_id) is fixed and per-iteration lattices are just masked
views plus dynamic UNK fallback (reference rebuilds a darts trie per
iteration instead, unigram_model_trainer.cc:97-119).

Reference quirks reproduced on purpose:
  * the training model has no UNKNOWN piece; UNK lattice nodes carry
    ``unk_id_ = 0`` (model_interface.h:336) and therefore leak marginal
    mass into piece 0 for sentences containing rare-char rewrites;
  * PruneSentencePieces normalizes the alternative logsum with
    ``alternatives.size()`` — the OUTER vector length, i.e. the vocab size
    — not the per-piece alternative count (unigram_model_trainer.cc:442).
"""

from __future__ import annotations

import logging
import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..proto.spec import ModelProto, ModelType
from .interface import TrainerInterface, UNK_CHAR, sorted_freq_desc
from . import suffix

log = logging.getLogger("sentencepiece_tpu.train")

K_UNK_PENALTY = 10.0
SENTENCE_BOUNDARY = 0x0000
F32 = np.float32


def digamma(x: float) -> float:
    """unigram_model_trainer.cc:22-40 (double precision)."""
    result = 0.0
    while x < 7:
        result -= 1.0 / x
        x += 1
    x -= 0.5
    xx = 1.0 / x
    xx2 = xx * xx
    xx4 = xx2 * xx2
    result += (math.log(x) + (1.0 / 24.0) * xx2 - (7.0 / 960.0) * xx4
               + (31.0 / 8064.0) * xx4 * xx2
               - (127.0 / 30720.0) * xx4 * xx4)
    return result


def _f32(x: float) -> float:
    return float(F32(x))


def digamma_vec(x: np.ndarray) -> np.ndarray:
    """Vectorized digamma, bit-identical to the scalar: every step is
    element-local IEEE double arithmetic in the same order; only log goes
    through libm scalar (np.log is not bit-identical to math.log)."""
    x = np.asarray(x, np.float64).copy()
    res = np.zeros_like(x)
    for _ in range(7):
        m = x < 7
        if not m.any():
            break
        res[m] -= 1.0 / x[m]
        x[m] += 1.0
    x = x - 0.5
    xx = 1.0 / x
    xx2 = xx * xx
    xx4 = xx2 * xx2
    t = np.array([math.log(v) for v in x], np.float64)
    t = t + (1.0 / 24.0) * xx2
    t = t - (7.0 / 960.0) * xx4
    t = t + (31.0 / 8064.0) * xx4 * xx2
    t = t - (127.0 / 30720.0) * xx4 * xx4
    return res + t


def log_sum_exp_f32(x: float, y: float, init_mode: bool) -> float:
    """float32 LogSumExp step (unigram_model.cc:51-63). Every float-typed
    C++ sub-expression rounds to float32; exp/log run in double."""
    if init_mode:
        return _f32(y)
    vmin, vmax = (x, y) if x < y else (y, x)
    if vmax > _f32(vmin + 50.0):
        return _f32(vmax)
    return _f32(vmax + math.log(math.exp(_f32(vmin - vmax)) + 1.0))


class _WordLattice:
    """Candidate nodes of one word against the seed vocab, plus the
    per-iteration masked view."""

    __slots__ = ("length", "cand")  # cand: list of (pos, len, seed_id)

    def __init__(self, length: int, cand: List[Tuple[int, int, int]]):
        self.length = length
        self.cand = cand


class Trainer(TrainerInterface):
    """``engine="exact"`` (default): float32-exact host EM — byte-identical
    trained vocab vs the reference. ``engine="device"``: batched lattice EM
    on the jax device mesh (tpu/em.py) — the scale path; data-parallel over
    words with psum count reduction, piece scores within float tolerance of
    the exact engine (different reduction order)."""

    def __init__(self, trainer_spec, normalizer_spec, engine: str = "exact",
                 checkpoint_path: Optional[str] = None):
        super().__init__(trainer_spec, normalizer_spec)
        self.desired_vocab_size = int(trainer_spec.vocab_size * 1.1)
        assert engine in ("exact", "device")
        self.engine = engine
        # Mid-train checkpointing (the reference has none — training
        # reruns on failure, SURVEY.md §5): the EM outer loop state is just
        # the piece list, so each round persists (pieces, round) and a
        # restarted run resumes from it.
        self.checkpoint_path = checkpoint_path

    def _save_ckpt(self, pieces, rnd: int) -> None:
        if not self.checkpoint_path:
            return
        import json

        tmp = self.checkpoint_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"round": rnd,
                       "pieces": [[w, float(s)] for w, s in pieces]}, f)
        import os

        os.replace(tmp, self.checkpoint_path)

    def _load_ckpt(self):
        if not self.checkpoint_path:
            return None
        import json
        import os

        if not os.path.exists(self.checkpoint_path):
            return None
        with open(self.checkpoint_path, encoding="utf-8") as f:
            d = json.load(f)
        log.info("Resuming EM from checkpoint round %d (%d pieces)",
                 d["round"], len(d["pieces"]))
        return d["round"], [(w, float(s)) for w, s in d["pieces"]]

    # -- seed pieces (unigram_model_trainer.cc:124-225) ------------------------
    def make_seed_sentence_pieces(self) -> List[Tuple[str, float]]:
        assert self.sentences and self.required_chars
        # corpus codepoint array + char freqs, vectorized (the scalar loop
        # this replaces is in git history; sorted_freq_desc ties are keyed,
        # so dict insertion order is immaterial)
        corpus = "".join(s + "\x00" for s, _ in self.sentences)
        arr = np.frombuffer(
            corpus.encode("utf-32-le", errors="surrogatepass"),
            np.uint32).view(np.int32)  # codepoints < 2^31: view is exact
        s_lens = np.fromiter((len(s) for s, _ in self.sentences), np.int64,
                             len(self.sentences))
        s_freqs = np.fromiter((f for _, f in self.sentences), np.int64,
                              len(self.sentences))
        if (s_freqs == 1).all():
            cnt_full = np.bincount(arr)  # unweighted: exact int counts
            uniq = np.nonzero(cnt_full)[0]
            cnt = cnt_full[uniq]
        else:
            w_rep = np.repeat(s_freqs, s_lens + 1)
            cnt_full = np.bincount(arr, weights=w_rep.astype(np.float64))
            uniq = np.nonzero(cnt_full)[0]
            cnt = cnt_full[uniq].astype(np.int64)  # exact below 2^53
        all_chars: Dict[str, int] = {
            chr(int(u)): int(c) for u, c in zip(uniq, cnt)
            if int(u) != UNK_CHAR and int(u) != SENTENCE_BOUNDARY}
        n = len(arr)
        log.info("Making suffix array... (%d chars)", n)
        sa, nodes = suffix.internal_nodes(arr)
        log.info("Extracting frequent sub strings... (%d nodes)", len(nodes))

        # Vectorized node filter (scalar spec: the D<=1 / sentence-boundary
        # / is_valid_sentencepiece chain below in git history; semantics
        # identical, run as prefix-sum lookups over the corpus array).
        kidx_a: Optional[np.ndarray] = None
        try:
            from .. import native

            r = native.seed_filter(arr, sa, np.asarray(nodes, np.int32),
                                   self.trainer_spec,
                                   num_threads=self.trainer_spec.num_threads)
            if r is not None:
                kidx_a, score_a = r
                kidx_a = kidx_a.astype(np.int64)
        except Exception:
            kidx_a = None
        if kidx_a is None:
            nd = np.asarray(nodes, np.int64).reshape(-1, 3)
            L_a, R_a, D_a = nd[:, 0], nd[:, 1], nd[:, 2]
            off_a = sa[L_a].astype(np.int64)
            hb = np.zeros(len(arr) + 1, np.int64)
            from .interface import fast_cumsum
            hb[1:] = fast_cumsum(arr == SENTENCE_BOUNDARY)
            keep = (D_a > 1) & (hb[off_a + D_a] == hb[off_a])
            keep &= self.valid_substring_mask(arr, off_a, D_a)
            kidx_a = np.nonzero(keep)[0]
            score_a = (R_a[kidx_a] - L_a[kidx_a]) * D_a[kidx_a]

        seed: List[Tuple[str, float]] = [
            (w, float(f)) for w, f in sorted_freq_desc(all_chars.items())]
        # Sorted(substr_index): score desc, node index asc — numpy lexsort
        # truncated to the seed budget instead of a Python tuple sort
        need = max(0, self.trainer_spec.seed_sentencepiece_size - len(seed))
        order = np.lexsort((kidx_a, -score_a))[:need]
        ksel = kidx_a[order]
        # select the ~seed-budget rows BEFORE widening: nodes/sa are
        # corpus-sized int32 tables and a full astype costs hundreds of
        # MB of copies
        nd_all = (nodes if isinstance(nodes, np.ndarray)
                  else np.asarray(nodes, np.int64).reshape(-1, 3))
        nd_sel = nd_all[ksel].astype(np.int64)
        offs_sel = np.asarray(sa)[nd_sel[:, 0]].astype(np.int64)
        dep_sel = nd_sel[:, 2]
        # substrings have depth > 1 (seed filter), so they can never
        # collide with the single-char all_chars entries
        words = [corpus[o:o + d] for o, d in
                 zip(offs_sel.tolist(), dep_sel.tolist())]
        scores = score_a[order].tolist()

        # ToLogProb with float32 running sum (unigram_model_trainer.cc:42-55).
        # np.cumsum over float32 IS the serial float32 addition chain
        # (accumulate has no pairwise variant), so the final element
        # equals the reference's `float sum += score` loop bit for bit —
        # pinned by the byte-identical .vocab conformance fixtures.
        sc32 = np.empty(len(seed) + len(words), np.float32)
        sc32[:len(seed)] = [f for _, f in seed]
        sc32[len(seed):] = score_a[order]
        acc = sc32.cumsum(dtype=np.float32)[-1] if len(sc32) else F32(0.0)
        logsum = _f32(math.log(float(acc)))
        # scores live as float32 in the pieces vector BEFORE ToLogProb, so
        # the log reads the narrowed value (visible for counts >= 2^24).
        # math.log (glibc double) per UNIQUE narrowed score — substring
        # scores are small-integer products, so uniques are few.
        uq, inv = np.unique(sc32, return_inverse=True)
        lp = np.fromiter((_f32(math.log(float(u)) - logsum) for u in uq),
                         np.float64, len(uq))[inv]
        seed = [(w, s) for (w, _), s in zip(seed, lp[:len(seed)].tolist())]
        seed.extend(zip(words, lp[len(seed):].tolist()))
        log.info("Initialized %d seed sentencepieces", len(seed))
        return seed

    # -- lattice tables ---------------------------------------------------------
    def _build_word_tables(self, pieces: List[Tuple[str, float]]
                           ) -> List[_WordLattice]:
        """Candidate substring table per word against the seed vocab."""
        piece_index = {w: i for i, (w, _) in enumerate(pieces)}
        max_len = self.trainer_spec.max_sentencepiece_length
        tables = []
        for s, _freq in self.sentences:
            L = len(s)
            cand: List[Tuple[int, int, int]] = []
            for pos in range(L):
                for ln in range(1, min(max_len, L - pos) + 1):
                    sid = piece_index.get(s[pos:pos + ln])
                    if sid is not None:
                        cand.append((pos, ln, sid))
            tables.append(_WordLattice(L, cand))
        return tables

    def _build_tables_native(self, pieces):
        """Candidate tables built by the native substring matcher (hash
        index over the seed pieces) — same CSR data as
        _build_word_tables + _flatten_tables, without the Python
        substring loop."""
        try:
            from .. import native

            if not native.available():
                return None
            words = [s for s, _ in self.sentences]
            r = native.substring_match(
                words, [w for w, _ in pieces],
                self.trainer_spec.max_sentencepiece_length,
                num_threads=self.trainer_spec.num_threads)
            if r is None:
                return None
            cand_off, cand_pos, cand_len, cand_sid = r
            return native.UnigramEStepTables(
                [len(w) for w in words], cand_off, cand_pos, cand_len,
                cand_sid, [f for _, f in self.sentences])
        except Exception:
            return None

    # -- EM (host exact engine) -------------------------------------------------
    def _flatten_tables(self, tables):
        """Flattened CSR candidate arrays for the native E-step/Viterbi
        (same data as the per-word tables; identical float semantics run in
        C++ threads instead of the Python emulation)."""
        try:
            from .. import native

            if not native.available():
                return None
            word_len = [t.length for t in tables]
            cand_off = [0]
            cand_pos, cand_len, cand_sid = [], [], []
            for t in tables:
                for pos, ln, sid in t.cand:
                    cand_pos.append(pos)
                    cand_len.append(ln)
                    cand_sid.append(sid)
                cand_off.append(len(cand_pos))
            freqs = [f for _, f in self.sentences]
            return native.UnigramEStepTables(word_len, cand_off, cand_pos,
                                             cand_len, cand_sid, freqs)
        except Exception:
            return None

    _native_tables = None

    def _run_estep(self, pieces, scores, seed_to_cur, tables):
        if self._native_tables is not None:
            from .. import native

            min_score = min(scores)
            unk_score = _f32(min_score - K_UNK_PENALTY)
            r = native.unigram_estep(
                self._native_tables, seed_to_cur,
                np.asarray(scores, np.float32), unk_score,
                self.trainer_spec.num_threads)
            if r is not None:
                return r
        return self._run_estep_host(pieces, scores, seed_to_cur, tables)

    def _run_estep_host(self, pieces, scores, seed_to_cur, tables
                        ) -> Tuple[np.ndarray, float, int]:
        """Exact float32 E-step with reference threading layout
        (unigram_model_trainer.cc:237-287)."""
        ts = self.trainer_spec
        nthreads = ts.num_threads
        m = len(pieces)
        min_score = min(sc for sc in scores)
        unk_score = _f32(min_score - K_UNK_PENALTY)
        expected = [np.zeros(m, F32) for _ in range(nthreads)]
        objs = [F32(0.0) for _ in range(nthreads)]
        ntokens = [0] * nthreads
        all_freq = sum(f for _, f in self.sentences)

        for tid in range(nthreads):
            exp_t = expected[tid]
            for si in range(tid, len(self.sentences), nthreads):
                freq = self.sentences[si][1]
                fZ, n_vit = self._marginal_one(
                    tables[si], scores, seed_to_cur, unk_score, exp_t, freq)
                ntokens[tid] += n_vit
                objs[tid] = F32(objs[tid] - F32(fZ / float(F32(all_freq))))
        # merge in thread order (:274-280)
        obj = objs[0]
        ntok = ntokens[0]
        exp0 = expected[0]
        for tidx in range(1, nthreads):
            obj = F32(obj + objs[tidx])
            ntok += ntokens[tidx]
            exp0 = (exp0 + expected[tidx]).astype(F32)
        import os
        dumpf = os.environ.get("SPM_DUMP_EXPECTED")
        if dumpf:  # conformance debugging vs the patched reference binary
            with open(dumpf, "ab") as fh:
                fh.write(np.uint32(len(exp0)).tobytes())
                fh.write(exp0.astype("<f4").tobytes())
        return exp0, float(obj), ntok

    def _iter_nodes(self, table: _WordLattice, seed_to_cur):
        """Yield lattice nodes (pos, len, cur_id, is_unk) in reference
        insertion order (begin asc, length asc), with UNK fallback where no
        single-char piece survives (unigram_model.cc:595-603). UNK carries
        id 0 (model_interface.h:336 default unk_id_)."""
        nodes: List[Tuple[int, int, int, bool]] = []
        by_pos: Dict[int, List[Tuple[int, int]]] = {}
        for pos, ln, sid in table.cand:
            cur = seed_to_cur[sid]
            if cur >= 0:
                by_pos.setdefault(pos, []).append((ln, cur))
        for pos in range(table.length):
            lst = by_pos.get(pos, [])
            has_single = any(ln == 1 for ln, _ in lst)
            for ln, cur in lst:
                nodes.append((pos, ln, cur, False))
            if not has_single:
                nodes.append((pos, 1, 0, True))
        return nodes

    def _marginal_one(self, table, scores, seed_to_cur, unk_score,
                      exp_t: np.ndarray, freq: int) -> Tuple[float, int]:
        """PopulateMarginal + Viterbi token count for one word, float32-exact
        (unigram_model.cc:222-261, 272-328)."""
        L = table.length
        if L == 0:
            return 0.0, 0
        wf = float(F32(freq))  # `float freq` parameter narrowing
        nodes = self._iter_nodes(table, seed_to_cur)
        n = len(nodes)
        node_score = [unk_score if unk else scores[cur]
                      for (_, _, cur, unk) in nodes]
        # alpha/beta over nodes + BOS/EOS
        BOS, EOS = n, n + 1
        alpha = [0.0] * (n + 2)
        beta = [0.0] * (n + 2)
        ends_at: List[List[int]] = [[] for _ in range(L + 1)]
        begins_at: List[List[int]] = [[] for _ in range(L + 1)]
        ends_at[0].append(BOS)
        begins_at[L].append(EOS)
        for k, (pos, ln, _, _) in enumerate(nodes):
            begins_at[pos].append(k)
            ends_at[pos + ln].append(k)
        ns_full = node_score + [0.0, 0.0]

        # forward (insertion order = begin asc; BOS first at pos 0)
        for pos in range(L + 1):
            for r in begins_at[pos]:
                acc = 0.0
                for j, lnode in enumerate(ends_at[pos]):
                    acc = log_sum_exp_f32(
                        acc, _f32(ns_full[lnode] + alpha[lnode]), j == 0)
                alpha[r] = acc
        Z = alpha[EOS]
        # backward
        for pos in range(L, -1, -1):
            for lnode in ends_at[pos]:
                acc = 0.0
                for j, r in enumerate(begins_at[pos]):
                    acc = log_sum_exp_f32(
                        acc, _f32(ns_full[r] + beta[r]), j == 0)
                beta[lnode] = acc
        # expected counts: alpha+score+beta-Z is a float expression chain
        # (unigram_model.cc:318-323); the += target is float32
        for k, (pos, ln, cur, unk) in enumerate(nodes):
            nid = 0 if unk else cur
            if nid >= 0:
                e = _f32(_f32(_f32(alpha[k] + node_score[k]) + beta[k]) - Z)
                # PopulateMarginal takes `float freq`: the int64 narrows to
                # float32 at the call (visible once freq >= 2^24)
                term = wf * math.exp(e)
                # C++ `float += double` adds in double, rounds once
                exp_t[nid] = F32(float(exp_t[nid]) + term)
        # Viterbi token count (float32, strict '>', insertion order)
        best_score = [None] * (L + 1)
        best_node = [-1] * (L + 1)
        best_score[0] = 0.0
        bt = [0.0] * n
        for k, (pos, ln, _, _) in enumerate(nodes):
            if best_score[pos] is None:
                continue
            s = _f32(best_score[pos] + node_score[k])
            bt[k] = s
            e = pos + ln
            if best_score[e] is None or s > best_score[e]:
                best_score[e] = s
                best_node[e] = k
        ntok = 0
        p = L
        while p > 0:
            k = best_node[p]
            if k < 0:
                break
            ntok += 1
            p = nodes[k][0]
        return _f32(wf * Z), ntok  # `return freq * Z` — float32 multiply

    def _run_mstep(self, pieces, expected
                   ) -> Tuple[List[Tuple[str, float]], np.ndarray]:
        """Digamma Bayesian M-step (unigram_model_trainer.cc:298-332).

        Returns (new_pieces, kept_input_indices)."""
        assert len(pieces) == len(expected)
        exp_arr = np.asarray(expected, np.float32)
        keep_m = ~(exp_arr < F32(0.5))
        kept = exp_arr[keep_m]
        # sequential float32 total (np.add.at applies adds in order)
        tbuf = np.zeros(1, F32)
        np.add.at(tbuf, np.zeros(len(kept), np.intp), kept)
        total = tbuf[0]
        words = [w for (w, _), k in zip(pieces, keep_m) if k]
        logsum = _f32(digamma(float(total)))  # `const float logsum`
        xs = kept.astype(np.float64)
        try:
            from .. import native

            dg = native.digamma_batch(xs)
        except Exception:
            dg = None
        if dg is None:
            dg = digamma_vec(xs)
        # `digamma(c) - logsum` narrows to float per piece — one
        # vectorized float32 round replays the scalar chain
        res = (np.asarray(dg, np.float64) - logsum).astype(
            np.float32).astype(np.float64)
        return list(zip(words, res.tolist())), np.nonzero(keep_m)[0]

    # -- prune (unigram_model_trainer.cc:337-491) -------------------------------
    def _prune_pieces(self, pieces, scores, seed_to_cur, tables,
                      seed_index_of) -> List[Tuple[str, float]]:
        ts = self.trainer_spec
        m = len(pieces)
        min_score = min(scores)
        unk_score = _f32(min_score - K_UNK_PENALTY)

        always_keep = [True] * m
        alternatives: List[List[int]] = [[] for _ in range(m)]
        # per-piece 2-best over the piece's own string. Matching the piece
        # strings directly against the CURRENT piece set yields exactly the
        # candidates the Python path gets from the seed index after the
        # seed_to_cur>=0 filter (current pieces are a subset of the seed).
        native_done = False
        try:
            from .. import native

            if native.available():
                words = [w for w, _ in pieces]
                r0 = native.substring_match(
                    words, words,
                    self.trainer_spec.max_sentencepiece_length,
                    num_threads=self.trainer_spec.num_threads)
                if r0 is not None:
                    co, cp_, cl_, cc_ = r0
                    r = native.unigram_prune_nbest(
                        [len(w) for w in words], co, cp_, cl_, cc_,
                        np.asarray(scores, np.float32), unk_score,
                        num_threads=self.trainer_spec.num_threads)
                    if r is not None:
                        ak, alt_ids, alt_off = r
                        # bool list built lazily (only the non-native loss
                        # fallback reads it per piece)
                        always_keep = None
                        alternatives = None  # CSR below, sliced lazily
                        native_done = True
        except Exception:
            pass
        if not native_done:
            piece_tables = self._build_piece_tables(pieces, seed_index_of)
            for i in range(m):
                nbests = self._nbest2(piece_tables[i], scores, seed_to_cur,
                                      unk_score)
                if len(nbests) == 1:
                    always_keep[i] = True
                elif len(nbests[0]) >= 2:
                    always_keep[i] = False
                elif len(nbests[0]) == 1:
                    always_keep[i] = True
                    alternatives[i] = nbests[1]

        # Viterbi path stats over the corpus, threaded layout (:389-424).
        # Paths come from the native batch when available (identical float
        # semantics); the per-thread float32 accumulation + merge order is
        # replayed here either way.
        flat = None
        if self._native_tables is not None:
            from .. import native

            flat = native.unigram_viterbi_paths(
                self._native_tables, seed_to_cur,
                np.asarray(scores, np.float32), unk_score)
        nthreads = ts.num_threads
        n_s = len(self.sentences)
        vsum = F32(0.0)
        freq = np.zeros(m, F32)
        F_arr = None
        inverted: Optional[List[List[int]]] = None
        if flat is not None:
            # Replay of the reference's per-thread strided accumulation
            # (unigram_model_trainer.cc:389-424) — per-thread float32
            # chains + tid-order merge, and the occurrence-stream chain
            # behind ``freq(vocab[i])`` (the inverted index) — run in C
            # (native.cc spm_prune_freqs; a vectorized np.add.at replay
            # of the same order lives in git history, ~0.25 s/train at
            # 14 MB in ragged-gather glue).
            out_ids, out_off = flat
            ws_arr = np.fromiter((f for _, f in self.sentences), np.float32,
                                 n_s)
            pf = native.prune_freqs(out_ids, out_off, ws_arr, m, nthreads)
            if pf is not None:
                freq, F_arr, vsum = pf
            else:
                lens_all = out_off[1:] - out_off[:-1]
                starts_all = out_off[:-1]
                vbuf = np.zeros(1, F32)
                occ_ids_parts, occ_w_parts = [], []
                for tid in range(nthreads):
                    sel = np.arange(tid, n_s, nthreads)
                    # per-thread vsum: sequential float32 adds over stride
                    vb = np.zeros(1, F32)
                    np.add.at(vb, np.zeros(len(sel), np.intp), ws_arr[sel])
                    np.add.at(vbuf, np.zeros(1, np.intp), vb)
                    # ragged gather of this thread's paths, sentence order
                    L = lens_all[sel]
                    tot = int(L.sum())
                    base = np.repeat(starts_all[sel], L)
                    cum = np.cumsum(L) - L
                    idx = base + (np.arange(tot, dtype=np.int64)
                                  - np.repeat(cum, L))
                    ids_t = out_ids[idx]
                    w_t = np.repeat(ws_arr[sel], L)
                    keep = ids_t >= 0
                    ids_t, w_t = ids_t[keep], w_t[keep]
                    ft = np.zeros(m, F32)
                    np.add.at(ft, ids_t, w_t)
                    freq = (freq + ft).astype(F32)
                    occ_ids_parts.append(ids_t)
                    occ_w_parts.append(w_t)
                vsum = vbuf[0]
                F_arr = np.zeros(m, F32)
                np.add.at(F_arr, np.concatenate(occ_ids_parts),
                          np.concatenate(occ_w_parts))
        else:
            vsums = [F32(0.0)] * nthreads
            freqs = [np.zeros(m, F32) for _ in range(nthreads)]
            inverteds: List[List[List[int]]] = [
                [[] for _ in range(m)] for _ in range(nthreads)]
            for tid in range(nthreads):
                for si in range(tid, n_s, nthreads):
                    w_freq = self.sentences[si][1]
                    vsums[tid] = F32(vsums[tid] + F32(w_freq))
                    path = self._viterbi_ids(tables[si], scores, seed_to_cur,
                                             unk_score)
                    for nid in path:
                        if nid >= 0:
                            freqs[tid][nid] = F32(freqs[tid][nid] + w_freq)
                            inverteds[tid][nid].append(si)
            inverted = [[] for _ in range(m)]
            for tid in range(nthreads):
                vsum = F32(vsum + vsums[tid])
                freq = (freq + freqs[tid]).astype(F32)
                for i in range(m):
                    inverted[i].extend(inverteds[tid][i])

        # `const float sum = std::accumulate(..., 0.0)`: accumulates in
        # DOUBLE (0.0 literal) but the result narrows to float32 — and all
        # downstream arithmetic on it is float-typed in C++
        # (unigram_model_trainer.cc:423). Observable once counts are large
        # enough that float32 rounds (caught on a 14 MB corpus).
        if native_done and F_arr is not None:
            # same float chain, run natively (native/native.cc
            # spm_prune_losses)
            from .. import native

            r = native.prune_losses(freq, F_arr, vsum, ak, alt_ids, alt_off)
            if r is not None:
                flags, losses = r
                sel = np.nonzero(flags == 1)[0].tolist()
                new_pieces = [pieces[i] for i in sel]
                cand_idx = np.nonzero(flags == 2)[0]
                # tolist() narrows float32 -> python float elementwise, the
                # same chain as float(np.float32(x)) without scalar boxing
                candidates = list(zip(cand_idx.tolist(),
                                      losses[cand_idx].tolist()))
                pruned_size = max(self.desired_vocab_size,
                                  int(ts.shrinking_factor * m))
                for i, _loss in sorted(candidates,
                                       key=lambda p: (-p[1], p[0])):
                    if len(new_pieces) == pruned_size:
                        break
                    new_pieces.append(pieces[i])
                    sel.append(i)
                return new_pieces, sel
        if always_keep is None:
            always_keep = ak.astype(bool).tolist()
        sum_f = F32(np.sum(freq.astype(np.float64)))
        logsum = _f32(math.log(float(sum_f)))
        candidates: List[Tuple[int, float]] = []
        new_pieces: List[Tuple[str, float]] = []
        sel: List[int] = []
        for i in range(m):
            alts = (alternatives[i] if alternatives is not None
                    else alt_ids[alt_off[i]:alt_off[i + 1]].tolist())
            if freq[i] == 0 or not always_keep[i]:
                continue
            elif not alts:
                new_pieces.append(pieces[i])
                sel.append(i)
            else:
                if F_arr is not None:
                    F = F_arr[i]
                else:
                    F = F32(0.0)
                    for si in inverted[i]:
                        F = F32(F + F32(self.sentences[si][1]))
                F = _f32(F / vsum)
                logprob_sp = _f32(math.log(float(freq[i])) - logsum)
                # NOTE: alternatives.size() == vocab size (reference quirk).
                # `sum + freq[i] * (alternatives.size() - 1)` is a FLOAT
                # expression in C++: the size_t converts to float, the
                # multiply and add round to float32 (:461).
                inner = F32(sum_f + F32(freq[i] * F32(m - 1)))
                logsum_alt = _f32(math.log(float(inner)))
                logprob_alt = F32(0.0)
                for nid in alts:
                    # `logprob_alt += (log(freq[n] + freq[i]) - logsum_alt)`:
                    # float32 add inside the log; the difference stays
                    # DOUBLE and `float += double` adds in double, rounding
                    # once on assignment
                    logprob_alt = F32(
                        float(logprob_alt)
                        + (math.log(float(F32(freq[nid] + freq[i])))
                           - logsum_alt))
                loss = _f32(F * _f32(logprob_sp - logprob_alt))
                candidates.append((i, loss))
        pruned_size = max(self.desired_vocab_size,
                          int(ts.shrinking_factor * m))
        # Sorted(candidates): loss desc, index asc
        for i, _loss in sorted(candidates, key=lambda p: (-p[1], p[0])):
            if len(new_pieces) == pruned_size:
                break
            new_pieces.append(pieces[i])
            sel.append(i)
        return new_pieces, sel

    def _build_piece_tables(self, pieces, seed_index_of):
        max_len = self.trainer_spec.max_sentencepiece_length
        tables = []
        for w, _ in pieces:
            L = len(w)
            cand = []
            for pos in range(L):
                for ln in range(1, min(max_len, L - pos) + 1):
                    sid = seed_index_of.get(w[pos:pos + ln])
                    if sid is not None:
                        cand.append((pos, ln, sid))
            tables.append(_WordLattice(L, cand))
        return tables

    def _viterbi_ids(self, table, scores, seed_to_cur, unk_score
                     ) -> List[int]:
        """Viterbi piece ids, float32-exact (UNK nodes yield id 0 as in the
        trainer model; reference guards on node->id >= 0 which is always
        true here)."""
        L = table.length
        nodes = self._iter_nodes(table, seed_to_cur)
        node_score = [unk_score if unk else scores[cur]
                      for (_, _, cur, unk) in nodes]
        best_score = [None] * (L + 1)
        best_node = [-1] * (L + 1)
        best_score[0] = 0.0
        for k, (pos, ln, _, _) in enumerate(nodes):
            if best_score[pos] is None:
                continue
            s = _f32(best_score[pos] + node_score[k])
            e = pos + ln
            if best_score[e] is None or s > best_score[e]:
                best_score[e] = s
                best_node[e] = k
        path = []
        p = L
        while p > 0:
            k = best_node[p]
            if k < 0:
                return []
            pos, ln, cur, unk = nodes[k]
            path.append(0 if unk else cur)
            p = pos
        path.reverse()
        return path

    def _nbest2(self, table, scores, seed_to_cur, unk_score
                ) -> List[List[int]]:
        """2-best paths (ids) via A* like Lattice::NBest
        (unigram_model.cc:339-478); returns list of id-paths."""
        import heapq

        L = table.length
        nodes = self._iter_nodes(table, seed_to_cur)
        n = len(nodes)
        node_score = [unk_score if unk else scores[cur]
                      for (_, _, cur, unk) in nodes]
        BOS, EOS = n, n + 1
        ns_full = node_score + [0.0, 0.0]
        node_begin = [pos for (pos, _, _, _) in nodes] + [0, L]
        ends_at: List[List[int]] = [[] for _ in range(L + 1)]
        ends_at[0].append(BOS)
        for k, (pos, ln, _, _) in enumerate(nodes):
            ends_at[pos + ln].append(k)
        # Viterbi backtrace scores
        best_score = [None] * (L + 1)
        best_score[0] = 0.0
        bt = [0.0] * (n + 2)
        for k, (pos, ln, _, _) in enumerate(nodes):
            if best_score[pos] is None:
                continue
            s = _f32(best_score[pos] + node_score[k])
            bt[k] = s
            e = pos + ln
            if best_score[e] is None or s > best_score[e]:
                best_score[e] = s
        bt[BOS] = 0.0
        bt[EOS] = best_score[L] if best_score[L] is not None else 0.0

        counter = 0
        hyps: List[Tuple[int, Optional[int], float, float]] = []
        agenda: List[Tuple[float, int, int]] = []

        def push(node, parent, fx, gx):
            nonlocal counter
            hyps.append((node, parent, fx, gx))
            heapq.heappush(agenda, (-fx, counter, len(hyps) - 1))
            counter += 1

        push(EOS, None, ns_full[EOS], ns_full[EOS])
        results: List[List[int]] = []
        while agenda:
            _, _, hi = heapq.heappop(agenda)
            node, parent, fx, gx = hyps[hi]
            if node == BOS:
                path = []
                cur = parent
                while cur is not None:
                    nd = hyps[cur][0]
                    if nd != EOS:
                        pos, ln, cid, unk = nodes[nd]
                        path.append(0 if unk else cid)
                    cur = hyps[cur][1]
                results.append(path)
                if len(results) == 2:
                    break
                continue
            for lnode in ends_at[node_begin[node]]:
                push(lnode, hi, _f32(bt[lnode] + gx),
                     _f32(ns_full[lnode] + gx))
        return results

    # -- finalize (unigram_model_trainer.cc:497-537) ----------------------------
    def _finalize(self, pieces) -> List[Tuple[str, float]]:
        min_score = min(sc for _, sc in pieces)
        final: Dict[str, float] = {}
        sp = dict(pieces)
        min_score_penalty = 0.0
        k_delta = 0.0001
        for cp, _f in sorted_freq_desc(self.required_chars.items()):
            s = chr(cp)
            if s in sp:
                final[s] = sp[s]
            else:
                final[s] = _f32(min_score + min_score_penalty)
                min_score_penalty += k_delta
        vocab_size = self.trainer_spec.vocab_size - len(self.meta_pieces)
        assert vocab_size > 0
        for w, sc in sorted_freq_desc(pieces):
            if w in final:
                continue
            if len(final) == vocab_size:
                break
            final[w] = sc
        return sorted_freq_desc(final.items())

    # -- main loop (unigram_model_trainer.cc:539-603) ---------------------------
    def train(self) -> ModelProto:
        from ..utils import profiling

        ts = self.trainer_spec
        assert ts.model_type == ModelType.UNIGRAM
        assert self.normalizer_spec.escape_whitespaces
        with profiling.phase("load_sentences"):
            self.load_sentences()

        with profiling.phase("seed_pieces"):
            pieces = self.make_seed_sentence_pieces()  # seed vocab
        seed_pieces = list(pieces)
        seed_index_of = {w: i for i, (w, _) in enumerate(seed_pieces)}

        if ts.split_by_whitespace:
            self.split_sentences_by_whitespace()
        log.info("Using %d sentences for EM training", len(self.sentences))

        with profiling.phase("build_lattices"):
            tables = None
            self._native_tables = self._build_tables_native(seed_pieces)
            if self._native_tables is None:
                tables = self._build_word_tables(seed_pieces)
                self._native_tables = self._flatten_tables(tables)

        # Every current piece IS a seed piece (EM/prune only ever drop),
        # so the current->seed index map can be carried as an array and
        # updated by the keep-index lists the steps already compute —
        # make_maps then has no per-piece Python loop.
        cur_sidx = np.arange(len(seed_pieces), dtype=np.int64)

        def make_maps(cur_pieces):
            scores = [sc for _, sc in cur_pieces]
            seed_to_cur = np.full(len(seed_pieces), -1, np.int64)
            seed_to_cur[cur_sidx] = np.arange(len(cur_pieces),
                                              dtype=np.int64)
            return scores, seed_to_cur

        if self.engine == "device":
            import os as _os2

            # em2 holds the whole packed lattice (~24 B/lane of live
            # f32 temporaries per sub-iteration) in HBM at once; the r4
            # bucket engine (v1) chunks rows per dispatch instead, so
            # corpora whose per-chip lane share would blow HBM fall
            # back to it automatically. ~37M chars/chip fits a 16 GB
            # v5e with a 2x margin.
            choice = _os2.environ.get("SPM_DEVICE_EM", "v2")
            if choice != "v1":
                import jax as _jax

                K_ = ts.max_sentencepiece_length
                chars = sum(len(w) + 1 for w, _ in self.sentences)
                ndev = max(len(_jax.devices()), 1)
                lanes_per_dev = chars * K_ // ndev
                cap = int(_os2.environ.get(
                    "SPM_DEVICE_EM2_MAX_LANES", str(600_000_000)))
                if lanes_per_dev > cap:
                    log.info(
                        "device EM: %d lanes/chip exceeds the em2 HBM "
                        "budget (%d); using the chunked v1 engine",
                        lanes_per_dev, cap)
                    choice = "v1"
                # Compile-viability gate, TPU backend only: the em2
                # round program XLA-compiles in seconds on the CPU
                # backend at any scale (config-5/43M lanes: measured
                # r5), and in ~45 s wall TOTAL at wagahai-8k scale
                # (~5M lanes) on the chip — but at config-5 scale the
                # TPU compile never returned within a 13-minute budget
                # (staged probe, 2026-08-21: pack 0.6 s, upload 0.4 s,
                # lower 1.1 s, then >11 min inside compile; three
                # independent runs). A trainer that spends minutes in
                # the compiler loses to the 4.4 s reference binary by
                # construction, so large corpora route to the chunked
                # v1 engine (58-75 s at config 5 on this rig) until
                # the compile is tamed. Force with SPM_DEVICE_EM=v2.
                tpu_cap = int(_os2.environ.get(
                    "SPM_DEVICE_EM2_TPU_MAX_LANES", str(16_000_000)))
                if (choice != "v1"
                        and _os2.environ.get("SPM_DEVICE_EM") != "v2"
                        and _jax.devices()[0].platform == "tpu"
                        and lanes_per_dev > tpu_cap):
                    log.info(
                        "device EM: %d lanes/chip exceeds the em2 TPU "
                        "compile-viability bound (%d); using the "
                        "chunked v1 engine", lanes_per_dev, tpu_cap)
                    choice = "v1"
            if choice == "v1":
                dev = _DeviceEM(self, seed_pieces)
            else:
                dev = _DeviceEM2(self, seed_pieces)
        rnd = 0
        ckpt = self._load_ckpt()
        if ckpt is not None:
            rnd, pieces = ckpt
            cur_sidx = np.fromiter(
                (seed_index_of[w] for w, _ in pieces), np.int64,
                len(pieces))
        # Exact-finish bridge (VERDICT r2 item 6): the device E-step's
        # transcendentals (XLA exp/log) drift from glibc's by ULPs, so a
        # pure-device run emits an artifact whose floats differ from the
        # conformance engine's. The artifact scores all come from the EM
        # rounds (prune never rewrites scores), so rewinding to a round-start
        # snapshot and replaying the tail of the loop through the host-exact
        # engine repairs them (unigram_model_trainer.cc:298-332,497-537).
        # Measured on tests/fixtures/train/sub.txt: the drift does NOT
        # contract over replayed rounds (41/30/25/30 differing vocab lines at
        # depth 1..4), so byte-equality with engine="exact" requires replaying
        # the FULL trajectory. Policy (SPM_DEVICE_EXACT_FINISH):
        #   "auto" (default) — corpora with <= SPM_DEVICE_EXACT_FINISH_SMALL
        #       words (default 65536) replay every round => byte-equal
        #       artifact ("when corpus size permits"); larger corpora replay
        #       the longest tail whose estimated cost (sum of per-round piece
        #       counts, the E-step's cost driver) stays within 25% of the
        #       whole trajectory's — prune shrinks 0.75x/round so this tail
        #       is several rounds at a few percent of total EM time.
        #   integer K — replay exactly the last K rounds (0 disables).
        import os as _os
        finish_mode = ("0" if self.engine != "device" else
                       _os.environ.get("SPM_DEVICE_EXACT_FINISH", "auto"))
        em_engine = self.engine
        snaps: List[Tuple[list, np.ndarray]] = []

        def _finish_rewind_index() -> int:
            """Snapshot index to rewind to, or -1 to skip the replay."""
            if finish_mode != "auto":
                k = int(finish_mode)
                return len(snaps) - k if k > 0 else -1
            small = int(_os.environ.get(
                "SPM_DEVICE_EXACT_FINISH_SMALL", "65536"))
            if len(self.sentences) <= small:
                return 0
            costs = [len(p) for p, _ in snaps]
            budget = 0.25 * sum(costs)
            idx, spend = len(snaps) - 1, 0.0
            while idx > 0 and spend + costs[idx - 1] <= budget:
                idx -= 1
                spend += costs[idx]
            return idx

        while True:
            snaps.append((list(pieces), cur_sidx.copy()))
            with profiling.phase("em_round"), profiling.phase(
                    "em_round_device" if em_engine == "device"
                    else "em_round_exact"):
                if em_engine == "device":
                    # one dispatch wave for all sub-iterations (see
                    # _DeviceEM.em_rounds)
                    pieces, stats = dev.em_rounds(pieces,
                                                  ts.num_sub_iterations)
                    cur_sidx = dev.last_sidx
                    for it, (obj, ntok) in enumerate(stats):
                        log.info("EM sub_iter=%d size=%d obj=%s "
                                 "num_tokens=%d num_tokens/piece=%.4f",
                                 it, len(pieces), obj, ntok,
                                 ntok / max(len(pieces), 1))
                else:
                    for it in range(ts.num_sub_iterations):
                        scores, seed_to_cur = make_maps(pieces)
                        expected, obj, ntok = self._run_estep(
                            pieces, scores, seed_to_cur, tables)
                        pieces, kept = self._run_mstep(pieces, expected)
                        cur_sidx = cur_sidx[kept]
                        log.info("EM sub_iter=%d size=%d obj=%s "
                                 "num_tokens=%d num_tokens/piece=%.4f",
                                 it, len(pieces), obj, ntok,
                                 ntok / max(len(pieces), 1))
            if len(pieces) <= self.desired_vocab_size:
                if em_engine == "device":
                    idx = max(_finish_rewind_index(), 0) \
                        if finish_mode != "0" else -1
                    if finish_mode == "auto" or (
                            finish_mode != "0" and int(finish_mode) > 0):
                        pieces, cur_sidx = snaps[idx]
                        em_engine = "exact"
                        log.info(
                            "exact-finish: replaying final %d of %d EM "
                            "round(s) host-exact from %d pieces",
                            len(snaps) - idx, len(snaps), len(pieces))
                        continue
                break
            with profiling.phase("prune"):
                scores, seed_to_cur = make_maps(pieces)
                pieces, kept = self._prune_pieces(
                    pieces, scores, seed_to_cur, tables, seed_index_of)
                cur_sidx = cur_sidx[np.asarray(kept, np.int64)]
            rnd += 1
            self._save_ckpt(pieces, rnd)

        with profiling.phase("finalize"):
            self.final_pieces = self._finalize(pieces)
        return self.save()


class _DeviceEM2:
    """Packed single-program device EM driver (tpu/em2.py) — the r5
    engine: one dispatch + one readback per EM round, sort-mediated
    table ops, compact candidate upload. Interface-compatible with
    _DeviceEM (em_rounds / em_step / last_sidx); SPM_DEVICE_EM=v1
    selects the r4 bucket engine."""

    def __init__(self, trainer: Trainer, seed_pieces):
        from ..tpu import em2
        from .. import distributed as dist
        from ..utils import profiling

        self.em2 = em2
        self.dist = dist
        self.seed_pieces = seed_pieces
        self.seed_index = {w: i for i, (w, _) in enumerate(seed_pieces)}
        self.num_seed = len(seed_pieces)
        words = trainer.sentences
        self.all_freq = float(sum(f for _, f in words))
        K = trainer.trainer_spec.max_sentencepiece_length
        self.n_sub = trainer.trainer_spec.num_sub_iterations
        self.mesh = dist.data_mesh("dp")
        ndev = self.mesh.size

        # CSR candidates vs the seed vocab: reuse the native tables the
        # trainer already built (same data the host E-step consumes);
        # pure-Python fallback derives it from _build_word_tables.
        nt = trainer._native_tables
        if nt is not None:
            csr = (nt.cand_off, nt.cand_pos, nt.cand_len, nt.cand_sid)
        else:
            tables = trainer._build_word_tables(seed_pieces)
            off = [0]
            pos, lns, sids = [], [], []
            for t in tables:
                for p, ln, sid in t.cand:
                    pos.append(p)
                    lns.append(ln)
                    sids.append(sid)
                off.append(len(pos))
            csr = (np.asarray(off, np.int64), np.asarray(pos, np.int32),
                   np.asarray(lns, np.int32), np.asarray(sids, np.int32))

        with profiling.phase("em_pack"):
            classes, n_rows, placements = em2.plan_packing(words)
            Rg = [max(dist.pad_rows(max(r, 1), self.mesh), ndev)
                  for r in n_rows]
            rows_per_shard = [r // ndev for r in Rg]
            self.shapes = [(rows_per_shard[c], classes[c])
                           for c in range(len(classes))]
            lanes = sum(R * K * C for (R, C) in self.shapes)

            # global per-shard candidate counts (deterministic on every
            # process): word -> shard via its class row
            cand_off = np.asarray(csr[0], np.int64)
            per_word = cand_off[1:] - cand_off[:-1]
            shard_counts = np.zeros(ndev, np.int64)
            for c, pl in enumerate(placements):
                if not pl:
                    continue
                p = np.asarray(pl, np.int64)
                shard = p[:, 1] // rows_per_shard[c]
                np.add.at(shard_counts, shard, per_word[p[:, 0]])
            n_cand_pad = max(int(shard_counts.max()), 1)

            # build this process's local device shards — native C pass
            # (native.em2_pack) with the numpy builder as fallback;
            # both produce bit-identical streams (same within-segment
            # dest order)
            lo0, hi0 = dist.local_row_range(Rg[0], self.mesh)
            n_local = (hi0 - lo0) // rows_per_shard[0]
            first_shard = lo0 // rows_per_shard[0]
            fl_parts = [[] for _ in classes]
            fq_parts = [[] for _ in classes]
            dest_parts, segpos_parts = [], []
            from .. import native as native_mod

            use_native = native_mod.available()
            if use_native:
                wcls = np.full(len(words), -1, np.int32)
                wrow = np.zeros(len(words), np.int32)
                wcol = np.zeros(len(words), np.int32)
                for c, pl in enumerate(placements):
                    if not pl:
                        continue
                    p = np.asarray(pl, np.int64)
                    wcls[p[:, 0]] = c
                    wrow[p[:, 0]] = p[:, 1]
                    wcol[p[:, 0]] = p[:, 2]
                wlen_a = np.fromiter((len(w) for w, _ in words),
                                     np.int32, len(words))
                wfreq_a = np.fromiter((f for _, f in words),
                                      np.float32, len(words))
                lane_bases = np.zeros(len(classes), np.int64)
                b = 0
                for c in range(len(classes)):
                    lane_bases[c] = b
                    b += rows_per_shard[c] * K * classes[c]
            for s in range(n_local):
                g = first_shard + s
                lo = [g * rows_per_shard[c] for c in range(len(classes))]
                hi = [(g + 1) * rows_per_shard[c]
                      for c in range(len(classes))]
                r = None
                if use_native:
                    r = native_mod.em2_pack(
                        wlen_a, wfreq_a, wcls, wrow, wcol, csr, classes,
                        lo, hi, lane_bases, K, self.num_seed,
                        [(rows_per_shard[c], classes[c])
                         for c in range(len(classes))])
                if r is not None:
                    fls, fqs, dest, seg_pos = r
                else:
                    fls, fqs, dest, seg_pos = em2.build_shard_arrays(
                        words, csr, K, self.num_seed, classes,
                        placements, lo, hi)
                for c in range(len(classes)):
                    fl_parts[c].append(np.asarray(fls[c]).reshape(
                        rows_per_shard[c], classes[c]))
                    fq_parts[c].append(np.asarray(fqs[c]).reshape(
                        rows_per_shard[c], classes[c]))
                # pad candidates to the common per-shard stream length
                # with dump-lane entries (dest == lanes): their scores
                # scatter off the end and their marginals read 0
                dest_parts.append(np.pad(
                    dest, (0, n_cand_pad - len(dest)),
                    constant_values=lanes))
                segpos_parts.append(seg_pos)

        with profiling.phase("em_upload"):
            self._flags = [dist.put_sharded(np.concatenate(fl_parts[c]),
                                            self.mesh)
                           for c in range(len(classes))]
            self._freqs = [dist.put_sharded(np.concatenate(fq_parts[c]),
                                            self.mesh)
                           for c in range(len(classes))]
            self._dest = dist.put_sharded(np.concatenate(dest_parts),
                                          self.mesh)
            self._segpos = dist.put_sharded(
                np.concatenate(segpos_parts), self.mesh)
        self.K = K
        self._rounds = {}
        self._round_fn(self.n_sub)

    def _round_fn(self, n_iters: int):
        if n_iters not in self._rounds:
            self._rounds[n_iters] = self.em2.make_round_fn(
                self.shapes, self.K, self.num_seed, n_iters, "dp",
                self.mesh)
        return self._rounds[n_iters]

    def em_step(self, pieces):
        new_pieces, stats = self.em_rounds(pieces, 1)
        return (new_pieces, stats[0][0], stats[0][1])

    def em_rounds(self, pieces, n_iters: int):
        from ..utils import profiling

        round_fn = self._round_fn(n_iters)
        scores = np.full(self.num_seed, self.em2.NEG_INF, np.float32)
        alive = np.zeros(self.num_seed, bool)
        for w, sc in pieces:
            si = self.seed_index.get(w)
            if si is not None:
                scores[si] = sc
                alive[si] = True
        with profiling.phase("em_upload"):
            sc_d = self.dist.put_replicated(scores, self.mesh)
            al_d = self.dist.put_replicated(alive, self.mesh)
        with profiling.phase("em_dispatch"):
            sc_d, al_d, _exp, objs, ntoks = round_fn(
                sc_d, al_d, self._dest, self._segpos,
                *self._flags, *self._freqs)
        with profiling.phase("em_readback"):
            new_scores = np.asarray(sc_d)
            new_alive = np.asarray(al_d)
            objs = np.asarray(objs)
            ntoks = np.asarray(ntoks)
        stats = [(float(objs[i]) / self.all_freq, int(ntoks[i]))
                 for i in range(n_iters)]
        self.last_sidx = np.nonzero(new_alive)[0].astype(np.int64)
        new_pieces = [(self.seed_pieces[i][0], float(new_scores[i]))
                      for i in self.last_sidx.tolist()]
        return new_pieces, stats


class _DeviceEM:
    """Sharded device E/M-step driver for the unigram trainer.

    Replaces the reference E-step thread pool
    (unigram_model_trainer.cc:237-287) with tpu/em.py: word lattices built
    once against the seed vocab, corpus data-parallel over the device mesh,
    expected counts reduced with psum over the mesh axis (SURVEY.md §2.9)."""

    def __init__(self, trainer: Trainer, seed_pieces):
        import jax
        from jax.sharding import PartitionSpec as P
        from ..tpu import em
        from .. import distributed as dist

        self.em = em
        self.dist = dist
        self.seed_pieces = seed_pieces
        self.seed_index = {w: i for i, (w, _) in enumerate(seed_pieces)}
        words = trainer.sentences
        max_len = trainer.trainer_spec.max_sentencepiece_length
        # Per-process corpus sharding (SURVEY.md §2.9): each process builds
        # + uploads only its own contiguous row slice of each padded word
        # table. Words are LENGTH-BUCKETED (powers of two from 16) so the
        # dense (W, P, K) lattice of each bucket pads to its own bound
        # rather than the global max word length: whitespace-free scripts
        # make whole sentences single "words" (JA: 170+ chars), and one
        # such word would otherwise size every row — at BASELINE config 5
        # the single-table form wanted a 19.7 GB HBM allocation
        # (s32[218805,175,16], the 16-lane minor tiling to 128). Bucket
        # membership is computed from GLOBAL word order, so every process
        # layout builds the same buckets and fixed_order_psum keeps the
        # artifact byte-identical across layouts.
        self.mesh = dist.data_mesh("dp")
        gmax = max((len(w) for w, _ in words), default=1)
        bounds = []
        b = 16
        while b < gmax:
            bounds.append(b)
            b *= 2
        bounds.append(b)
        self.all_freq = float(sum(f for _, f in words))
        self.num_seed = len(seed_pieces)
        # Rows per dispatch are also bounded: an E-step over (C, P, K)
        # holds ~15 live f32[C, P, K] temporaries whose 16-lane minor
        # tiles to 128 on TPU, so unbounded C exhausts HBM (config 5's
        # 217k-word small bucket wanted 28.8 GB). Chunks pad to powers
        # of two so the per-(rows, width) compile count stays bounded;
        # estep_all sums chunk partials in fixed order.
        import os as _os
        max_rows = int(_os.environ.get("SPM_DEVICE_EM_MAX_ROWS", "16384"))
        max_rows = dist.pad_rows(max_rows, self.mesh)
        self.buckets = []
        prev = 0
        for ub in bounds:
            idxs = [wi for wi, (w, _) in enumerate(words)
                    if prev < len(w) <= ub or (prev == 0 and len(w) == 0)]
            prev = ub
            for c0 in range(0, len(idxs), max_rows):
                chunk = idxs[c0:c0 + max_rows]
                n = len(chunk)
                npad = 1
                while npad < n:
                    npad *= 2
                Wp = dist.pad_rows(min(npad, max_rows), self.mesh)
                lo, hi = dist.local_row_range(Wp, self.mesh)
                sel = [words[j] for j in chunk[lo:min(hi, n)]]
                lat, lens, freqs = em.build_word_lattices(
                    sel, self.seed_index, max_len,
                    pad_words_to=hi - lo, max_word_len=min(ub, gmax))
                self.buckets.append((dist.put_sharded(lat, self.mesh),
                                     dist.put_sharded(lens, self.mesh),
                                     dist.put_sharded(freqs, self.mesh)))
        num_seed = self.num_seed

        import functools as ft
        from jax import shard_map

        @jax.jit
        @ft.partial(shard_map, mesh=self.mesh,
                    in_specs=(P("dp"), P("dp"), P("dp"), P(), P()),
                    out_specs=(P(), P(), P()), check_vma=False)
        def _estep(lat_s, lens_s, freqs_s, score_table, alive_mask):
            return em.estep(lat_s, lens_s, freqs_s, score_table, alive_mask,
                            num_seed=num_seed, axis_name="dp")

        self._estep_fn = _estep

    def estep_all(self, sc_d, al_d):
        """One E-step over every length bucket: per-bucket programs (one
        compile per bucket width), partials combined in fixed bucket
        order — part of the device engine's determinism contract.

        On the multi-device CPU backend the dispatches are serialized
        with block_until_ready: XLA's threaded CPU runtime interleaves
        concurrently-dispatched programs across the virtual devices, and
        two in-flight programs that both carry collectives deadlock the
        rendezvous (observed as 40 s all_gather termination timeouts).
        TPU executes one program at a time per core, so the async
        pipeline stays there."""
        import jax

        serialize = (len(self.buckets) > 1 and self.mesh.size > 1
                     and jax.devices()[0].platform == "cpu")
        exp = obj = ntok = None
        for lat, lens, freqs in self.buckets:
            e, o, t = self._estep_fn(lat, lens, freqs, sc_d, al_d)
            if serialize:
                jax.block_until_ready(e)
            exp = e if exp is None else exp + e
            obj = o if obj is None else obj + o
            ntok = t if ntok is None else ntok + t
        return exp, obj, ntok

    def em_step(self, pieces):
        new_pieces, stats = self.em_rounds(pieces, 1)
        return (new_pieces, stats[0][0], stats[0][1])

    def em_rounds(self, pieces, n_iters: int):
        """Run n_iters E/M sub-iterations with ONE host sync at the end:
        all device steps dispatch asynchronously (no interleaved
        readbacks — on tunneled rigs a readback between dispatches costs
        ~1.2 s each). Returns (new_pieces, [(obj, ntok) per iter])."""
        import jax.numpy as jnp
        import jax

        from ..utils import profiling

        scores = np.full(self.num_seed, self.em.NEG_INF, np.float32)
        alive = np.zeros(self.num_seed, bool)
        for w, sc in pieces:
            si = self.seed_index.get(w)
            if si is not None:
                scores[si] = sc
                alive[si] = True
        with profiling.phase("em_upload"):
            sc_d = self.dist.put_replicated(scores, self.mesh)
            al_d = self.dist.put_replicated(alive, self.mesh)
        stats_d = []
        with profiling.phase("em_dispatch"):
            for _ in range(n_iters):
                expected, obj, ntok = self.estep_all(sc_d, al_d)
                sc_d, al_d = self.em.mstep(expected, al_d)
                stats_d.append((obj, ntok))
        with profiling.phase("em_readback"):
            new_scores = np.asarray(sc_d)
            new_alive = np.asarray(al_d)
        stats = [(float(np.asarray(o)) / self.all_freq,
                  int(np.asarray(t))) for o, t in stats_d]
        # seed indices of the surviving pieces, in emission order — the
        # train loop carries these so make_maps stays loop-free
        self.last_sidx = np.nonzero(new_alive)[0].astype(np.int64)
        new_pieces = [(self.seed_pieces[i][0], float(new_scores[i]))
                      for i in self.last_sidx.tolist()]
        return new_pieces, stats
