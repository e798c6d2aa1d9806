# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Unigram LM segmentation: dense lattice Viterbi / n-best / sampling /
marginals.

Re-expresses reference src/unigram_model.{h,cc} without pointer lattices:
a sentence's lattice is a set of arrays (begin char pos, char len, vocab id,
score) produced by one vectorized trie pass (Model::PopulateNodes,
unigram_model.cc:535-604), followed by scans:

  * Viterbi (unigram_model.cc:222-261): left-to-right max-sum. The reference
    iterates end nodes in insertion order (begin position ascending) with a
    strict '>' comparison, so ties resolve to the node with the smallest
    begin (longest piece); we reproduce that exactly.
  * PopulateMarginal (unigram_model.cc:272-328): forward/backward logsumexp
    in the reference's accumulation order (bit-exact E-step counts).
  * NBest (unigram_model.cc:339-478): exact A* from EOS with the Viterbi
    backtrace score as the (exact) heuristic, agenda shrink at 100k.
  * Sample (unigram_model.cc:488-526): forward filter / backward sample.
    PRNG contract: the reference uses a thread-local mt19937 seeded from
    random_device (util.cc:379-382) — unreproducible by design. We define
    the sampling distribution identically but draw from a caller-supplied
    numpy Generator (see sentencepiece_tpu.utils.rng).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from ..utils import darts
from ..utils.unicode import char_structure
from .base import EncodeResult, ModelBase, NBestEncodeResult

K_UNK_PENALTY = 10.0  # reference unigram_model.cc:550
_FLT_MAX = np.finfo(np.float32).max
_FLT_MIN = np.finfo(np.float32).tiny  # FLT_MIN = smallest positive normal


def log_sum_exp(x: float, y: float, init_mode: bool) -> float:
    """Reference unigram_model.cc:51-63 (float32 semantics approximated in
    float64 for the host path; the EM trainer pins this down)."""
    if init_mode:
        return y
    vmin, vmax = min(x, y), max(x, y)
    if vmax > vmin + 50:
        return vmax
    return vmax + math.log(math.exp(vmin - vmax) + 1.0)


class DenseLattice:
    """Array-form lattice over unicode positions.

    Nodes are stored in reference insertion order (begin ascending, and
    within a begin position, trie-match order: byte length ascending, UNK
    last), which makes reference tie-break semantics a plain first-max scan.
    """

    __slots__ = ("data", "starts", "lens", "num_chars", "begin", "clen",
                 "ids", "scores", "byte_off", "byte_len")

    def __init__(self, data: bytes, starts: np.ndarray, lens: np.ndarray,
                 begin: np.ndarray, clen: np.ndarray, ids: np.ndarray,
                 scores: np.ndarray):
        self.data = data
        self.starts = starts
        self.lens = lens
        self.num_chars = len(starts)
        self.begin = begin
        self.clen = clen
        self.ids = ids
        self.scores = scores
        ends_b = np.append(starts, len(data))
        self.byte_off = starts[begin] if len(begin) else np.zeros(0, np.int64)
        self.byte_len = (ends_b[begin + clen] - self.byte_off
                         if len(begin) else np.zeros(0, np.int64))

    def piece_bytes(self, k: int) -> bytes:
        o = int(self.byte_off[k])
        return self.data[o:o + int(self.byte_len[k])]

    # -- Viterbi -------------------------------------------------------------
    def viterbi(self) -> List[int]:
        """Returns node indices of the best path (may be empty for len 0)."""
        L = self.num_chars
        if L == 0:
            return []
        begin, clen, scores = self.begin, self.clen, self.scores
        n_nodes = len(begin)
        # best_score[p], best_node[p]: best path ending exactly at char p.
        best_score = np.full(L + 1, -np.inf, dtype=np.float64)
        best_node = np.full(L + 1, -1, dtype=np.int64)
        best_score[0] = 0.0  # BOS
        bt = np.zeros(n_nodes, dtype=np.float64)
        # Nodes are sorted by begin; process in order (ends strictly later).
        for k in range(n_nodes):
            b = int(begin[k])
            s = best_score[b] + float(scores[k])
            bt[k] = s
            e = b + int(clen[k])
            # strict '>' keeps the earliest-inserted (smallest begin) winner
            if s > best_score[e]:
                best_score[e] = s
                best_node[e] = k
        # Backtrace from EOS at position L.
        path: List[int] = []
        p = L
        while p > 0:
            k = int(best_node[p])
            if k < 0:
                return []
            path.append(k)
            p = int(begin[k])
        path.reverse()
        return path

    # -- forward/backward ----------------------------------------------------
    def _node_order_key(self):
        """Node ids grouped by begin (insertion order is already begin-sorted)."""
        return None

    def forward(self, theta: float = 1.0) -> np.ndarray:
        """alpha[node] in the reference accumulation order
        (unigram_model.cc:290-298 / 494-502). Index n_nodes = BOS, +1 = EOS."""
        L = self.num_chars
        begin, clen, scores = self.begin, self.clen, self.scores
        n = len(begin)
        alpha = np.zeros(n + 2, dtype=np.float64)  # [nodes..., BOS, EOS]
        BOS, EOS = n, n + 1
        # end_nodes[pos] in insertion order; BOS ends at 0 and is first.
        ends_at: List[List[int]] = [[] for _ in range(L + 1)]
        ends_at[0].append(BOS)
        for k in range(n):
            ends_at[int(begin[k]) + int(clen[k])].append(k)
        node_score = np.concatenate([scores.astype(np.float64), [0.0, 0.0]])
        node_begin = np.concatenate([begin.astype(np.int64), [0, L]])
        # begin_nodes[pos]: nodes sorted by begin already; EOS at L.
        k = 0
        for pos in range(L + 1):
            rnodes: List[int] = []
            while k < n and int(begin[k]) == pos:
                rnodes.append(k)
                k += 1
            if pos == L:
                rnodes.append(EOS)
            for r in rnodes:
                acc = 0.0
                for j, l in enumerate(ends_at[pos]):
                    acc = log_sum_exp(acc, theta * node_score[l] + alpha[l],
                                      j == 0)
                alpha[r] = acc
        return alpha

    def backward(self) -> np.ndarray:
        """beta[node] (unigram_model.cc:303-311)."""
        L = self.num_chars
        begin, clen, scores = self.begin, self.clen, self.scores
        n = len(begin)
        beta = np.zeros(n + 2, dtype=np.float64)
        BOS, EOS = n, n + 1
        begins_at: List[List[int]] = [[] for _ in range(L + 1)]
        for k in range(n):
            begins_at[int(begin[k])].append(k)
        begins_at[L].append(EOS)
        ends_at: List[List[int]] = [[] for _ in range(L + 1)]
        ends_at[0].append(BOS)
        for k in range(n):
            ends_at[int(begin[k]) + int(clen[k])].append(k)
        node_score = np.concatenate([scores.astype(np.float64), [0.0, 0.0]])
        for pos in range(L, -1, -1):
            for l in ends_at[pos]:
                acc = 0.0
                for j, r in enumerate(begins_at[pos]):
                    acc = log_sum_exp(acc, node_score[r] + beta[r], j == 0)
                beta[l] = acc
        return beta

    def populate_marginal(self, freq: float, expected: np.ndarray) -> float:
        """Adds expected piece counts; returns freq * logZ
        (unigram_model.cc:272-328)."""
        L = self.num_chars
        if L == 0:
            return 0.0
        alpha = self.forward()
        beta = self.backward()
        n = len(self.begin)
        EOS = n + 1
        Z = alpha[EOS]
        for k in range(n):
            vid = int(self.ids[k])
            if vid >= 0:
                expected[vid] += freq * math.exp(
                    alpha[k] + float(self.scores[k]) + beta[k] - Z)
        return freq * Z

    # -- NBest (A*) -----------------------------------------------------------
    def nbest(self, nbest_size: int) -> List[List[int]]:
        if nbest_size < 1:
            return []
        if nbest_size == 1:
            return [self.viterbi()]
        L = self.num_chars
        begin, clen, scores = self.begin, self.clen, self.scores
        n = len(begin)
        BOS, EOS = n, n + 1
        # Viterbi backtrace scores (h(x)) in float32, like the reference
        # (Node::backtrace_score is float): fx tie-ordering is observable.
        f32 = np.float32
        best_score = np.full(L + 1, -np.inf, dtype=np.float64)
        best_score[0] = 0.0
        bt = np.zeros(n + 2, dtype=np.float64)
        for k in range(n):
            b = int(begin[k])
            s = float(f32(best_score[b] + float(scores[k])))
            bt[k] = s
            e = b + int(clen[k])
            if s > best_score[e]:
                best_score[e] = s
        bt[BOS] = 0.0
        bt[EOS] = best_score[L]
        node_score = np.concatenate([scores.astype(np.float64), [0.0, 0.0]])
        node_begin = np.concatenate([begin.astype(np.int64), [0, L]])
        ends_at: List[List[int]] = [[] for _ in range(L + 1)]
        ends_at[0].append(BOS)
        for k in range(n):
            ends_at[int(begin[k]) + int(clen[k])].append(k)

        # Hypothesis: (node, parent_hyp, fx, gx); agenda emulates the
        # reference's std::priority_queue EXACTLY, including equal-fx pop
        # order (unigram_model.cc:391-405 + libstdc++ heap mechanics),
        # because n-best tie ordering is observable output.
        from ..utils.stdheap import StdPriorityQueue

        hyps: List[Tuple[int, Optional[int], float, float]] = []
        agenda: StdPriorityQueue = StdPriorityQueue(
            lambda a, b: hyps[a][2] < hyps[b][2])

        def push(node: int, parent: Optional[int], fx: float, gx: float):
            hyps.append((node, parent, fx, gx))
            agenda.push(len(hyps) - 1)

        push(EOS, None, node_score[EOS], node_score[EOS])
        results: List[List[int]] = []
        K_MAX_AGENDA, K_MIN_AGENDA = 100000, 512
        while len(agenda):
            hi = agenda.pop()
            node, parent, fx, gx = hyps[hi]
            if node == BOS:
                path = []
                cur = parent
                while cur is not None:
                    nd = hyps[cur][0]
                    if nd != EOS:
                        path.append(nd)
                    cur = hyps[cur][1]
                results.append(path)
                if len(results) == nbest_size:
                    break
                continue
            for l in ends_at[int(node_begin[node])]:
                # float32 adds (Hypothesis::fx/gx are float)
                push(l, hi, float(np.float32(bt[l] + gx)),
                     float(np.float32(node_score[l] + gx)))
            if len(agenda) >= K_MAX_AGENDA:
                # shrink: pop the top into a fresh agenda
                # (unigram_model.cc:450-461)
                keep = min(K_MIN_AGENDA, nbest_size * 10)
                new_agenda = StdPriorityQueue(
                    lambda a, b: hyps[a][2] < hyps[b][2])
                for _ in range(min(keep, len(agenda))):
                    new_agenda.push(agenda.pop())
                agenda = new_agenda
        return results

    # -- sampling -------------------------------------------------------------
    def sample(self, theta: float, rng: np.random.Generator) -> List[int]:
        L = self.num_chars
        if L == 0:
            return []
        alpha = self.forward(theta=theta)
        begin, clen = self.begin, self.clen
        n = len(begin)
        BOS, EOS = n, n + 1
        node_score = np.concatenate(
            [self.scores.astype(np.float64), [0.0, 0.0]])
        node_begin = np.concatenate([begin.astype(np.int64), [0, L]])
        ends_at: List[List[int]] = [[] for _ in range(L + 1)]
        ends_at[0].append(BOS)
        for k in range(n):
            ends_at[int(begin[k]) + int(clen[k])].append(k)
        results: List[int] = []
        Z = alpha[EOS]
        node = EOS
        while True:
            cand = ends_at[int(node_begin[node])]
            probs = np.array(
                [math.exp(alpha[l] + theta * node_score[l] - Z) for l in cand])
            probs = probs / probs.sum()
            node = cand[int(rng.choice(len(cand), p=probs))]
            if node == BOS:
                break
            Z = alpha[node]
            results.append(node)
        results.reverse()
        return results


class UnigramModel(ModelBase):
    """Unigram model runtime (reference unigram_model.cc:677-778)."""

    def __init__(self, model_proto):
        super().__init__(model_proto)
        from ..proto.spec import PieceType

        normal_mask = self.types == PieceType.NORMAL
        if normal_mask.any():
            self.min_score = float(self.scores[normal_mask].min())
            self.max_score = float(self.scores[normal_mask].max())
        else:
            # FLT_MAX / FLT_MIN inits (unigram_model.cc:682-683)
            self.min_score = float(_FLT_MAX)
            self.max_score = float(_FLT_MIN)
        keys = sorted(self.pieces)
        self.trie = darts.build(keys, [self.pieces[k] for k in keys])
        self.max_piece_len = max((len(k) for k in keys), default=0)

    # -- lattice construction (PopulateNodes, unigram_model.cc:535-604) ------
    def build_lattice(self, normalized: bytes) -> DenseLattice:
        data = normalized
        starts, lens = char_structure(data)
        L = len(starts)
        arr = np.frombuffer(data, dtype=np.uint8)
        nbytes = len(data)
        # byte offset -> char index (only valid at char starts)
        byte2char = np.full(nbytes + 1, -1, dtype=np.int64)
        byte2char[starts] = np.arange(L)
        byte2char[nbytes] = L
        vals = self.trie.prefix_matches_dense(arr, min(self.max_piece_len,
                                                       nbytes))
        begin_l: List[int] = []
        clen_l: List[int] = []
        ids_l: List[int] = []
        score_l: List[float] = []
        unk_score = self.min_score - K_UNK_PENALTY
        types = self.types
        scores = self.scores
        from ..proto.spec import PieceType

        for ci in range(L):
            bo = int(starts[ci])
            has_single = False
            row = vals[bo]
            for d in range(row.shape[0]):
                vid = int(row[d])
                if vid < 0:
                    continue
                end_b = bo + d + 1
                ec = int(byte2char[end_b]) if end_b <= nbytes else -1
                if ec < 0:
                    continue  # match not on a char boundary (defensive)
                length = ec - ci
                if types[vid] == PieceType.UNUSED:
                    continue
                begin_l.append(ci)
                clen_l.append(length)
                ids_l.append(vid)
                if types[vid] == PieceType.USER_DEFINED:
                    score_l.append(length * self.max_score + 1.0)
                else:
                    score_l.append(float(scores[vid]))
                if length == 1:
                    has_single = True
            if not has_single:
                begin_l.append(ci)
                clen_l.append(1)
                ids_l.append(self.unk_id)
                score_l.append(unk_score)
        return DenseLattice(
            data, starts, lens,
            np.asarray(begin_l, dtype=np.int64),
            np.asarray(clen_l, dtype=np.int64),
            np.asarray(ids_l, dtype=np.int64),
            np.asarray(score_l, dtype=np.float32))

    def _to_result(self, lattice: DenseLattice, path: List[int]
                   ) -> EncodeResult:
        return [(lattice.piece_bytes(k), int(lattice.ids[k])) for k in path]

    _native_enc = None

    def _native_encoder(self):
        if self._native_enc is None:
            try:
                from ..proto.spec import PieceType
                from .. import native as native_mod

                scores = np.array(self.scores, np.float32)
                char_lens = np.array(
                    [len(p.decode("utf-8", errors="surrogateescape"))
                     for p in self._piece_bytes], np.int64)
                user = self.types == PieceType.USER_DEFINED
                scores = np.where(
                    user, (char_lens * self.max_score + 1.0).astype(
                        np.float32), scores)
                scores = np.where(self.types == PieceType.UNUSED,
                                  np.float32(-1e30), scores)
                enc = native_mod.NativeUnigramEncoder(
                    self.trie.units, scores, self.unk_id,
                    float(np.float32(self.min_score - K_UNK_PENALTY)))
                self._native_enc = enc if enc.ok else False
            except Exception:
                self._native_enc = False
        return self._native_enc or None

    def encode(self, normalized: bytes) -> EncodeResult:
        if not normalized:
            return []
        native = self._native_encoder()
        if native is not None:
            r = native.encode(normalized)
            if r is not None:
                ids, starts, lens = r
                return [(normalized[starts[i]:starts[i] + lens[i]],
                         int(ids[i])) for i in range(len(ids))]
        lattice = self.build_lattice(normalized)
        return self._to_result(lattice, lattice.viterbi())

    def nbest_encode(self, normalized: bytes, nbest_size: int
                     ) -> NBestEncodeResult:
        if not normalized:
            return [([], 0.0)]
        nbest_size = max(1, min(nbest_size, 1024))  # unigram_model.cc:735
        lattice = self.build_lattice(normalized)
        out: NBestEncodeResult = []
        for path in lattice.nbest(nbest_size):
            score = float(sum(float(lattice.scores[k]) for k in path))
            out.append((self._to_result(lattice, path), score))
        return out

    def sample_encode(self, normalized: bytes, theta: float,
                      rng: Optional[np.random.Generator] = None
                      ) -> EncodeResult:
        if not normalized:
            return []
        if rng is None:
            from ..utils.rng import get_generator
            rng = get_generator()
        lattice = self.build_lattice(normalized)
        return self._to_result(lattice, lattice.sample(theta, rng))
