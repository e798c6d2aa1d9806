# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Batched unigram encode on TPU: trie-gather lattice populate + Viterbi scan.

TPU-native form of the reference encode hot path
(sentencepiece_processor.cc:562-576 → unigram_model.cc:535-604 PopulateNodes
→ :222-261 Viterbi), as one jitted array program over a padded batch.

Design notes (byte-indexed lattice):
  * The lattice is indexed by BYTE position, not char position. Vocab pieces
    are valid UTF-8, so every trie match begins and ends on a char boundary
    automatically; non-boundary byte positions are simply unreachable in the
    Viterbi recursion and cost nothing. This removes all char-compaction
    scatters — the depth-d walk writes its match lane directly.
  * The trie walk is D = max-piece-byte-length steps; each step is one
    XOR-addressed gather over the darts unit table in HBM, batched over all
    (row, byte) lanes at once (unigram_model.cc:535-604 ran this loop per
    position on the host).
  * Viterbi is a length-N `lax.scan` carrying a D-wide rolling window of
    best-path scores. The reference's tie-break (strict '>' over nodes in
    insertion order = longest piece first, unigram_model.cc:248-259) becomes
    a first-argmax over the byte-length-descending candidate vector.
  * Backtrace + reverse-compaction + adjacent-UNK merge
    (sentencepiece_processor.cc:506-521) are masked gathers/cumsum scatters.

Score rules folded into the tables: user-defined pieces score
`char_len*max_score + 1.0` (unigram_model.cc:590); positions with no
single-char piece get a `min_score - 10` UNK node (:550,:595-603).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import trie

NEG_INF = float(np.float32(-1e30))


def _populate_lattice(units, lat_score_table, batch, lengths, unk_score,
                      *, D, unk_id, root_state, arcs=None, bands=None):
    """Lattice populate shared by the encode / sample / n-best
    kernels: trie walk -> end-aligned (scores, ids) bands. Extracted
    verbatim from the encode kernel; tracing inlines it, so the
    emitted XLA is identical (validated against the pre-refactor
    optimized HLO). The historical fusion pathologies came from
    traced CONSTANTS, not function structure."""
    B, N = batch.shape
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    in_range = pos < lengths[:, None]
    is_start = in_range & ((batch & 0xC0) != 0x80)

    # char byte-length at char starts (valid UTF-8 after normalization)
    lead = batch
    charlen = jnp.where(
        lead < 0x80, 1,
        jnp.where(lead < 0xE0, 2, jnp.where(lead < 0xF0, 3, 4))).astype(
            jnp.int32)

    # -- lattice populate: end-aligned id/score bands --------------------------
    # id_end[b, p, j] = piece id of the byte-length-(j+1) match ENDING at
    # byte p (i.e. starting at p-(j+1)); -1 if none.
    # The walk is written inline in exactly this shape because XLA's fusion
    # heuristics are fragile here: a traced root-state broadcast or a
    # refactored step function can serialize the gathers (500x) and blow up
    # compile time. root_state is a static Python int (host-precomputed).
    batch_pad = jnp.concatenate([batch, jnp.zeros((B, D), jnp.uint8)], axis=1)
    label_mask = jnp.uint32((1 << 31) | 0xFF)
    has_leaf_bit = jnp.uint32(1 << 8)
    # depth-0 step peeled: only 256 reachable table positions from the
    # root, so a 256-row one-hot replaces the full-table gather
    with_sc = int(units.shape[1]) >= 3
    state, alive, val0, sc0 = trie.step_root(units, batch, is_start,
                                             root_state=root_state)
    id_lanes = [val0]
    sc_lanes = [sc0] if with_sc else None
    d_start = 1
    if arcs is not None and D > 1:
        # depth-1 peeled too: the live depth-2 arcs are few (an 8k EN
        # vocab: 123), so a one-hot key match replaces the table gather
        c2 = batch_pad[:, 1:N + 1].astype(jnp.int32)
        key = batch.astype(jnp.int32) * 256 + c2
        live1 = alive & ((pos + 1) < lengths[:, None])
        state, alive, val1, sc1 = trie.step_pair(
            arcs[0], arcs[1], arcs[2], key, live1, state,
            arc_w2=arcs[3] if (with_sc and len(arcs) >= 4) else None)
        id_lanes.append(val1)
        if with_sc:
            if sc1 is None:     # arcs built without scores
                sc1 = jnp.full((B, N), NEG_INF, jnp.float32)
            sc_lanes.append(sc1)
        d_start = 2
    vbits = max(8, int(lat_score_table.shape[0] - 1).bit_length())
    for d in range(d_start, D):
        if bands is not None and d + 1 >= len(bands):
            # no trie node is this deep: the lane is statically empty
            id_lanes.append(jnp.full((B, N), -1, jnp.int32))
            if with_sc:
                sc_lanes.append(jnp.full((B, N), NEG_INF, jnp.float32))
            continue
        c = batch_pad[:, d:N + d].astype(jnp.uint32)
        byte_ok = (pos + d) < lengths[:, None]
        live = alive & byte_ok
        node = state ^ c
        # units is the PAIRED table (trie.build_paired): one row lookup
        # yields the transition unit AND the leaf value; the MXU one-hot
        # digit gather beats the serial row gather ~14x at vocab-trie
        # sizes (trie.gather_mxu). leaf values are piece ids < V
        # (static from the score table), so the value column usually
        # needs 2 byte planes, not 4 — every MXU-gather stage's cost
        # scales with planes.
        cb = (32, vbits, 32) if with_sc else (32, vbits)
        if bands is not None:
            # depth-banded trie (native.darts_build_banded): step d only
            # ever reaches depth-(d+1) node positions, which live in
            # band d+1 — gather from that SLICE, so per-step cost
            # scales with the band (a few hundred units) instead of the
            # whole table. Dead lanes clip to the slice and fail the
            # label check like the full-table walk's row-0 read.
            lo, hi = bands[d + 1]
            local = jnp.clip(node.astype(jnp.int32) - lo, 0, hi - lo - 1)
            local = jnp.where(live, local, 0)
            # d2=8 won the on-chip sweep (1/2/8/16/32): the
            # [lanes, d2*planes] f32 matmul output dominates HBM once K
            # is band-sized, but too-small d2 grows the one-hot LHS
            row = trie.gather_mxu(units[lo:hi], local, d2=8, col_bits=cb)
        elif int(units.shape[0]) <= 16384:
            safe = jnp.where(live, node, jnp.uint32(0))
            row = trie.gather_mxu(units, safe, d2=32, col_bits=cb)
        else:
            # big unbanded tries: the serial row gather measured faster
            # in context than the MXU form
            safe = jnp.where(live, node, jnp.uint32(0))
            row = trie._gather(units, safe)
        unit = row[..., 0]
        ok = live & ((unit & label_mask) == c)
        state = jnp.where(ok, node ^ trie.offsets(unit), state)
        has_leaf = ok & ((unit & has_leaf_bit) != 0)
        val = jnp.where(has_leaf, row[..., 1].astype(jnp.int32),
                        jnp.int32(-1))
        if with_sc:
            sc_lanes.append(jnp.where(
                has_leaf,
                jax.lax.bitcast_convert_type(row[..., 2], jnp.float32),
                jnp.float32(NEG_INF)))
        alive = ok
        id_lanes.append(val)

    # UNK fallback where no single-char piece covers the char start
    # (unigram_model.cc:595-603): the UNK node spans one char (1-4 bytes).
    # Insert it into lane charlen-1 when that lane has no match there.
    # The lane select/insert is D-local, so it's a 15-wide one-hot
    # compare — the old take_along + scatter pair cost two serial
    # B*N-element ops (~7 ns each on TPU).
    lat_ids = jnp.stack(id_lanes, axis=2)  # [B, N, D] start-aligned
    cl = jnp.clip(charlen - 1, 0, D - 1)
    lane_oh = (jnp.arange(D, dtype=jnp.int32)[None, None, :]
               == cl[:, :, None])                          # [B, N, D]
    lane_at_cl = jnp.sum(jnp.where(lane_oh, lat_ids + 1, 0), axis=2) - 1
    need_unk = is_start & (lane_at_cl < 0)
    is_unk_node = lane_oh & need_unk[:, :, None]
    lat_ids = jnp.where(is_unk_node, unk_id, lat_ids)

    if with_sc:
        # scores rode along in the walk's row gathers (score-paired
        # table) — no separate [B, N, D]-lane score gather at all
        lat_sc = jnp.stack(sc_lanes, axis=2)
        lat_sc = jnp.where(lat_ids >= 0, lat_sc, NEG_INF)
    else:
        vsafe = jnp.maximum(lat_ids, 0)
        # score lookup over [B, N, D] lanes: one-hot compare-reduce
        # beats the serial-loop gather for small vocabs (~4x at V=1000;
        # crossover near V~2500 — trie.gather_small rationale)
        V = int(lat_score_table.shape[0])
        if V <= 512:
            sc_v = trie.gather_small(lat_score_table, vsafe)
        elif V <= 65536:
            fscore = lat_score_table.view(jnp.uint32) if (
                lat_score_table.dtype == jnp.float32) else lat_score_table
            sc_v = trie.gather_mxu(
                fscore, vsafe,
                d2=16 if fscore.shape[0] <= 8192 else 128).view(
                    jnp.float32)
        else:
            # very large vocabs: the MXU one-hot's cost grows with V
            # while the serial gather is V-independent (~7 ns/elem) —
            # crossover near 100k entries
            sc_v = trie._gather(lat_score_table, vsafe)
        lat_sc = jnp.where(lat_ids >= 0, sc_v, NEG_INF)
    lat_sc = jnp.where(is_unk_node, unk_score, lat_sc)

    # end-align: x_end[b, p, j] = x[b, p-(j+1), j] for p in 0..N
    def end_align(lat, fill):
        cols = []
        for j in range(D):
            shifted = jnp.concatenate(
                [jnp.full((B, j + 1), fill, lat.dtype),
                 lat[:, :N - j, j]], axis=1)  # length N+1
            cols.append(shifted)
        return jnp.stack(cols, axis=2)  # [B, N+1, D]

    return end_align(lat_sc, NEG_INF), end_align(lat_ids, -1)


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "unk_id", "root_state", "add_bos",
                     "add_eos", "reverse", "bos_id", "eos_id", "pad_id",
                     "use_pallas", "bands"))
def unigram_encode_batch(units: jnp.ndarray,
                         lat_score_table: jnp.ndarray,
                         batch: jnp.ndarray,
                         lengths: jnp.ndarray,
                         unk_score: jnp.ndarray,
                         *,
                         max_depth: int,
                         unk_id: int,
                         root_state: int = 0,
                         add_bos: bool = False,
                         add_eos: bool = False,
                         reverse: bool = False,
                         bos_id: int = 1,
                         eos_id: int = 2,
                         pad_id: int = 0,
                         use_pallas: bool = False,
                         arcs=None,
                         bands=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode normalized UTF-8 bytes to token ids.

    Args:
      units: uint32[U] darts unit table over vocab pieces.
      lat_score_table: float32[V] per-piece lattice score with the
        user-defined rule pre-applied; -inf for UNUSED pieces.
      batch: uint8[B, N] normalized bytes, zero-padded.
      lengths: int32[B] byte lengths.
      unk_score: float32[] = min_score - kUnkPenalty.
      max_depth: max piece byte length D (static).

    Returns:
      (ids int32[B, N+2], out_lengths int32[B]); rows padded with pad_id.
    """
    B, N = batch.shape
    # pieces longer than the padded width can never match, and the
    # adaptive encode width may undercut a big-piece model's max depth
    # (word models); the clamp is exact
    D = min(max_depth, N)
    sc_end, id_end = _populate_lattice(
        units, lat_score_table, batch, lengths, unk_score,
        D=D, unk_id=unk_id, root_state=root_state, arcs=arcs, bands=bands)

    # -- Viterbi scan ----------------------------------------------------------
    # glue audit (either scan form): per position, window add + reversed
    # argmax/select + window shift over [B, D] (~6 passes), N positions
    trie.count_glue(B * N * D, 6)
    if use_pallas:
        # Honor the Mosaic VMEM budget: the kernel's scoped footprint is
        # ~2x (outputs [N+1, Bpad] f32+i32 + one [N, D, 128] block); past
        # ~110 MB (pallas_kernels._compiler_params cap) Mosaic cannot
        # place it, so wide-batch x wide-width dispatches take the XLA
        # scan instead (same recurrence, same tie-break).
        pad8 = lambda n: -(-n // 8) * 8
        Bpad = -(-B // 128) * 128
        vmem_need = 2 * (2 * pad8(N + 1) * Bpad * 4
                         + pad8(N) * D * 128 * 4) + (4 << 20)
        use_pallas = vmem_need <= (110 << 20)
    if use_pallas:
        # Mosaic lattice-scan kernel (A/B alternative; same recurrence +
        # longest-piece tie-break — see pallas_kernels.viterbi_bp_pallas).
        from .pallas_kernels import viterbi_bp_pallas
        # dynamic position bound: padded width N is sized for worst-case
        # normalization expansion; real batches stop at max(lengths)
        _, bp_wb = viterbi_bp_pallas(sc_end[:, 1:, :],
                                     max_p=jnp.max(lengths))  # [B, N+1]
        bp = bp_wb.T                                      # [N+1, B]
    else:
        def vit_step(win, sc_p):
            # win[:, j] = best[p-1-j]; sc_p[:, j] = score of len-(j+1)
            # piece @ p
            cand = win + sc_p
            rev = cand[:, ::-1]
            am = jnp.argmax(rev, axis=1)  # first max = longest (tie-break)
            best_p = jnp.take_along_axis(rev, am[:, None], axis=1)[:, 0]
            kchoice = (D - am).astype(jnp.int32)
            new_win = jnp.concatenate([best_p[:, None], win[:, :D - 1]],
                                      axis=1)
            return new_win, (kchoice, best_p)

        win0 = jnp.full((B, D), NEG_INF, jnp.float32).at[:, 0].set(0.0)
        _, (bp, _) = jax.lax.scan(vit_step, win0,
                                  jnp.swapaxes(sc_end[:, 1:, :], 0, 1))
        bp = jnp.concatenate([jnp.ones((1, B), jnp.int32), bp],
                             axis=0)  # [N+1, B]

    # -- backtrace: pointer doubling -------------------------------------------
    # The old form was a max-tokens-over-batch while_loop of serial [B]
    # gathers (~0.2 ms x ~68 steps = most of the post-Viterbi cost). The
    # chain p -> p - bp[p] is a functional graph with 0 absorbing, so
    # the whole path from each row's length unrolls in log2(N) rounds of
    # row-local MXU reads: square the jump table (f, f^2, f^4, ...) and
    # batch-fill path[j] = f^j(L). No loop, no serial gathers.
    rows = jnp.arange(B)
    # glue audit: id_best one-hot select counts itself below; the
    # doubling-fill clips/wheres + reverse-compact cumsum/selects are
    # ~10 passes over [B, N]
    trie.count_glue(B * N, 10 + max(1, int(N).bit_length()))
    bpT = bp.T                                     # [B, N+1]
    P1 = N + 1
    posP = jnp.arange(P1, dtype=jnp.int32)[None, :]
    # id of the best piece ending at p (D-lane one-hot select; bp >= 1)
    kk = jnp.clip(bpT - 1, 0, D - 1)
    lane_oh2 = (jnp.arange(D, dtype=jnp.int32)[None, None, :]
                == kk[:, :, None])
    id_best = jnp.sum(jnp.where(lane_oh2, id_end, 0), axis=2)  # [B, N+1]
    vbp = max(8, (P1 - 1).bit_length())
    f = jnp.clip(posP - jnp.maximum(bpT, 1), 0, P1 - 1)
    path = jnp.zeros((B, N), jnp.int32)
    path = path.at[:, 0].set(jnp.minimum(lengths, P1 - 1))
    Mk = f
    filled = 1
    while filled < N:
        take = min(filled, N - filled)
        seg = trie.taa_mxu(Mk, path[:, :take], value_bits=vbp)
        path = path.at[:, filled:filled + take].set(seg)
        filled += take
        if filled < N:
            Mk = trie.taa_mxu(Mk, Mk, value_bits=vbp)  # f^(2k)
    rev_mask = path > 0                            # [B, N]
    rev_mask = rev_mask & (lengths > 0)[:, None]
    # piece-id read width follows the score table (advisor r4: a fixed
    # 24 would truncate vocabularies with ids >= 2^24)
    vid = max(8, int(lat_score_table.shape[0]).bit_length())
    rev_ids = jnp.where(
        rev_mask, trie.taa_mxu(id_best, path, value_bits=vid), -1)
    T = jnp.sum(rev_mask, axis=1, dtype=jnp.int32)

    # reverse-compact + adjacent-UNK merge (sentencepiece_processor.cc:
    # 506-521) fused into ONE scatter from the reverse-order tokens:
    # forward position i corresponds to reverse index j = T-1-i, whose
    # forward predecessor is rev j+1 — so the merge predicate and the
    # post-merge output index are computable directly in reverse order
    # (suffix count of kept tokens), skipping the take_along compaction.
    t = jnp.arange(N, dtype=jnp.int32)[None, :]
    nxt_rev = jnp.concatenate(
        [rev_ids[:, 1:], jnp.full((B, 1), -1, rev_ids.dtype)], axis=1)
    in_tok = t < T[:, None]
    nxt_in = (t + 1) < T[:, None]
    keep = in_tok & ~((rev_ids == unk_id) & nxt_in & (nxt_rev == unk_id))
    rc_incl = jnp.flip(jnp.cumsum(jnp.flip(keep, axis=1), axis=1,
                                  dtype=jnp.int32), axis=1)
    newT = rc_incl[:, 0]
    # row-local scatter -> MXU one-hot; dropped lanes pile into column
    # N+1, which the set() below overwrites
    out = trie.scatter_rowlocal_mxu(
        jnp.where(keep, rev_ids, pad_id),
        jnp.where(keep, rc_incl - 1, N + 1), N + 2, fill=pad_id,
        value_bits=max(8, int(lat_score_table.shape[0]).bit_length()))
    out = out.at[:, N + 1].set(pad_id)

    # -- extra options: reverse / bos / eos (ApplyExtraOptions order) ---------
    M = N + 2
    tt = jnp.arange(M, dtype=jnp.int32)[None, :]
    if reverse:
        src = jnp.clip(newT[:, None] - 1 - tt, 0, M - 1)
        rev = jnp.take_along_axis(out, src, axis=1)
        out = jnp.where(tt < newT[:, None], rev, pad_id)
    if add_bos:
        shifted = jnp.concatenate(
            [jnp.full((B, 1), bos_id, jnp.int32), out[:, :M - 1]], axis=1)
        out = jnp.where(tt <= newT[:, None], shifted, pad_id)
        out = out.at[:, 0].set(bos_id)
        newT = newT + 1
    if add_eos:
        out = out.at[rows, jnp.clip(newT, 0, M - 1)].set(eos_id)
        newT = newT + 1
        out = jnp.where(tt < newT[:, None], out, pad_id)
    return out, newT


def _per_row(value, n: int) -> np.ndarray:
    """Resolve a scalar-or-sequence parameter to a float32[n] vector (the
    TF ops accept nbest_size/alpha as scalars or per-row tensors,
    sentencepiece_processor_ops.cc:120-158)."""
    arr = np.asarray(value, np.float32)
    if arr.ndim == 0:
        return np.full(n, float(arr), np.float32)
    if arr.shape != (n,):
        raise ValueError(f"per-row parameter must be scalar or length {n}, "
                         f"got shape {arr.shape}")
    return arr


def bucketed(payloads, BUCKETS, MAX_BATCH, run, unpack):
    """Shared host bucketing: sort by length, group into (MAX_BATCH,
    bucket) padded batches, dispatch ``run(arr, lens, group_no)`` and
    scatter ``unpack(result, j)`` back to input order. ``payloads``
    are bytes (uint8 packing) or int sequences (int32 packing)."""
    order = sorted(range(len(payloads)), key=lambda i: len(payloads[i]))
    results = [None] * len(payloads)
    i = 0
    gno = 0
    pending = []
    while i < len(order):
        blen = len(payloads[order[i]])
        bucket = next((b for b in BUCKETS if blen <= b), None)
        if bucket is None:
            # longer than the largest configured bucket: round up to the
            # next power of two so the line still encodes exactly (one
            # extra compile per distinct overflow width, rare by design)
            bucket = BUCKETS[-1]
            while bucket < blen:
                bucket *= 2
        group = []
        while (i < len(order) and len(group) < MAX_BATCH
               and len(payloads[order[i]]) <= bucket):
            group.append(order[i])
            i += 1
        B = len(group)
        Bp = 8
        while Bp < B:
            Bp *= 2
        first = payloads[group[0]]
        if isinstance(first, (bytes, bytearray)):
            arr = np.zeros((Bp, bucket), np.uint8)
            lens = np.zeros(Bp, np.int32)
            for j, gi in enumerate(group):
                b = payloads[gi][:bucket]
                arr[j, :len(b)] = np.frombuffer(b, np.uint8)
                lens[j] = len(b)
        else:
            arr = np.zeros((Bp, bucket), np.int32)
            lens = np.zeros(Bp, np.int32)
            for j, gi in enumerate(group):
                c = payloads[gi][:bucket]
                arr[j, :len(c)] = c
                lens[j] = len(c)
        pending.append((group, run(arr, lens, gno, group)))
        gno += 1
    for group, res in pending:
        for j, gi in enumerate(group):
            results[gi] = unpack(res, j, gi)
    return results


class UnigramBatchEncoder:
    """Host wrapper: normalize on host, segment on device in length buckets.

    The analog of the reference TF ``SentencepieceEncodeDense`` op
    (tensorflow/sentencepiece_processor_ops.cc:250-305,387) — except the
    per-row encode itself runs on the TPU instead of looping on the host.
    """

    BUCKETS = (128, 512, 2048, 4096)
    MAX_BATCH = 1024

    def __init__(self, processor, add_bos=False, add_eos=False,
                 reverse=False, pad_id: Optional[int] = None):
        from ..models.unigram import UnigramModel, K_UNK_PENALTY
        from ..proto.spec import PieceType

        model = processor.model
        if not isinstance(model, UnigramModel):
            raise TypeError("UnigramBatchEncoder requires a unigram model")
        self.processor = processor
        self.model = model
        # depth-banded device trie (native.darts_build_banded): every
        # depth-k node position lives in one 256-aligned band, so walk
        # step d gathers from band d+1's SLICE instead of the whole
        # table — per-step lookup cost scales with the band, not the
        # trie (EN 8k vocab: <=768-unit bands vs 4608; JA: <=6144 vs
        # 29952, which also moves JA off the serial-gather path).
        # Fallback to the host model's (unbanded) trie when native is
        # unavailable or the table is not bandable.
        units_np = model.trie.units
        self.bands = None
        try:
            from .. import native
            keys_b = list(model.pieces)
            r = native.darts_build_banded(
                keys_b, [model.pieces[k] for k in keys_b])
            if r is not None:
                units_np, bands = r
                self.bands = tuple(bands)
        except Exception:
            pass
        types = model.types
        # fold user-defined / unused rules into one score table
        # (unigram_model.cc:584-593)
        scores = np.array(model.scores, np.float32)
        char_lens = np.array(
            [len(p.decode("utf-8", errors="surrogateescape"))
             for p in model._piece_bytes], np.int64)
        user = types == PieceType.USER_DEFINED
        scores = np.where(user,
                          (char_lens * model.max_score + 1.0).astype(
                              np.float32), scores)
        scores = np.where(types == PieceType.UNUSED, NEG_INF, scores)
        self.lat_score_table = jnp.asarray(scores)
        # score-paired table: the walk's row gather returns the FOLDED
        # leaf score too, removing the whole [B, N, D]-lane score-table
        # gather (23.6 ms/batch at JA scale — trie.build_paired). TPU
        # only: large fresh compiles of the 3-column programs late in
        # the one-process CPU test suite abort the XLA CPU compiler
        # (LLVM-state dependent; each program compiles fine in a fresh
        # process). The CPU fallback keeps the 2-column table + score
        # gather; the 3-column path's exactness is enforced on the real
        # device by bench.py's bit-exact gates and by the direct
        # small-program test in test_units.py.
        import jax as _jax
        sc_pair = scores if _jax.default_backend() != "cpu" else None
        self.units = jnp.asarray(trie.build_paired(units_np, sc_pair))
        # root base precomputed on host: keeps the device walk free of a
        # traced scalar broadcast (degrades XLA fusion badly, see above)
        u0 = int(units_np[0])
        self.root_state = int((u0 >> 10) << (((u0 >> 9) & 1) << 3))
        pa = trie.build_pair_arcs(units_np, self.root_state,
                                  leaf_scores=sc_pair)
        self.arcs = (tuple(jnp.asarray(a) for a in pa)
                     if pa is not None else None)
        keys = list(model.pieces)
        # D >= 4 so the UNK node's lane (one char = up to 4 bytes) exists
        self.max_depth = max(max((len(k) for k in keys), default=1), 4)
        self.unk_score = jnp.float32(model.min_score - K_UNK_PENALTY)
        self.unk_id = model.unk_id
        self.add_bos = add_bos
        self.add_eos = add_eos
        self.reverse = reverse
        self.bos_id = processor.bos_id()
        self.eos_id = processor.eos_id()
        self.pad_id = pad_id if pad_id is not None else max(
            processor.pad_id(), 0)

    def _device_encode(self, arr: np.ndarray, lens: np.ndarray):
        return unigram_encode_batch(
            self.units, self.lat_score_table,
            jnp.asarray(arr), jnp.asarray(lens), self.unk_score,
            max_depth=self.max_depth, unk_id=self.unk_id,
            root_state=self.root_state,
            add_bos=self.add_bos, add_eos=self.add_eos, reverse=self.reverse,
            bos_id=self.bos_id, eos_id=self.eos_id, pad_id=self.pad_id,
            arcs=self.arcs, bands=self.bands)

    def _bucketed(self, payloads, run, unpack):
        return bucketed(payloads, self.BUCKETS, self.MAX_BATCH, run, unpack)

    def _normalize_all(self, texts: Sequence[str]) -> List[bytes]:
        norm = self.processor.normalizer
        return [norm.normalize(t)[0] for t in texts]

    def encode_to_padded(self, texts: Sequence[str]
                         ) -> Tuple[np.ndarray, np.ndarray]:
        """Dense (ids, lengths) over one padded batch (single bucket)."""
        normed = self._normalize_all(texts)
        N = max((len(b) for b in normed), default=1)
        for bucket in self.BUCKETS:
            if N <= bucket:
                N = bucket
                break
        B = len(normed)
        arr = np.zeros((B, N), np.uint8)
        lens = np.zeros(B, np.int32)
        for i, b in enumerate(normed):
            bb = b[:N]
            arr[i, :len(bb)] = np.frombuffer(bb, np.uint8)
            lens[i] = len(bb)
        out, n = self._device_encode(arr, lens)
        return np.asarray(out), np.asarray(n)

    def encode(self, texts: Sequence[str]) -> List[List[int]]:
        """Ragged ids per text; inputs are bucketed by normalized byte
        length and batch rows padded to fixed sizes, so the jitted program
        compiles at most once per (batch, length) bucket pair."""
        normed = self._normalize_all(texts)

        def run(arr, lens, _g, _group):
            out, n = self._device_encode(arr, lens)
            return np.asarray(out), np.asarray(n)

        return self._bucketed(
            normed, run, lambda r, j, _gi: r[0][j, :r[1][j]].tolist())

    def sample_from_nbest(self, texts: Sequence[str], nbest_size: int,
                          alpha, rng=None) -> List[List[int]]:
        """Device n-best sampling (the processor's nbest_size>1 dispatch,
        sentencepiece_processor.cc:636-646): k-best Viterbi on device,
        then one softmax(alpha * score) draw per row via Gumbel-max.
        ``alpha`` may be a scalar or a per-row sequence (the TF op's
        per-row attribute resolution, ops.cc:244-305)."""
        if rng is None:
            from ..utils.rng import get_generator

            rng = get_generator()
        K = max(1, min(int(nbest_size), 512))
        alphas = _per_row(alpha, len(texts))
        normed = self._normalize_all(texts)

        def run(arr, lens, _g, _group):
            rev_ids, n_toks, scores, valid = unigram_nbest_batch(
                self.units, self.lat_score_table, jnp.asarray(arr),
                jnp.asarray(lens), self.unk_score,
                max_depth=self.max_depth, unk_id=self.unk_id, k=K,
                root_state=self.root_state, arcs=self.arcs,
                bands=self.bands)
            return (np.asarray(rev_ids), np.asarray(n_toks),
                    np.asarray(scores), np.asarray(valid))

        def unpack(res, j, gi):
            rev_ids, n_toks, scores, valid = res
            v = valid[j]
            sc = scores[j][v]
            probs = np.exp(alphas[gi] * sc)
            probs /= probs.sum()
            pick = int(rng.choice(len(sc), p=probs))
            r = int(np.nonzero(v)[0][pick])
            ids = rev_ids[j, r, :int(n_toks[j, r])][::-1]
            return _apply_row_opts(
                ids, self.unk_id, self.add_bos, self.add_eos,
                self.reverse, self.bos_id, self.eos_id)

        return self._bucketed(normed, run, unpack)

    def nbest_ids(self, texts: Sequence[str], n: int,
                  processor=None) -> List[List[List[int]]]:
        """Byte-exact n-best ids on device (VERDICT r4 item 10).

        The device k-best scan returns the correct PATH SET but an
        implementation-defined order within equal scores (the
        reference's tie order is libstdc++-heap pop history,
        unigram_model.cc:391-405 / utils/stdheap.py — host-only
        state). Exactness is recovered the same way as rev_merge rows:
        every candidate path is RE-SCORED on the host with the
        reference's float chain (the A* hypothesis fold: a float32
        right-fold of piece scores from EOS, models/unigram.py), sorted
        by that score; a row whose top n+1 rescored scores contain an
        exact tie — the only case where score order under-determines
        the output — falls back to the tie-exact host n-best. The
        device runs k = n+4 so boundary candidates are visible to the
        tie check.
        """
        K = max(1, min(int(n) + 4, 512))
        normed = self._normalize_all(texts)
        f32 = np.float32

        def run(arr, lens, _g, _group):
            rev_ids, n_toks, scores, valid = unigram_nbest_batch(
                self.units, self.lat_score_table, jnp.asarray(arr),
                jnp.asarray(lens), self.unk_score,
                max_depth=self.max_depth, unk_id=self.unk_id, k=K,
                root_state=self.root_state, arcs=self.arcs,
                bands=self.bands)
            return (np.asarray(rev_ids), np.asarray(n_toks),
                    np.asarray(valid), arr.shape[1])

        host_scores = np.asarray(self.lat_score_table, np.float32)

        def host_fallback(gi):
            res = processor.nbest_encode_as_ids(texts[gi], n)
            return [[int(t) for t in path] for path in res]

        def unpack(res, j, gi):
            rev_ids, n_toks, valid, bucket = res
            if len(normed[gi]) > bucket and processor is not None:
                return host_fallback(gi)
            paths = []
            for r in range(K):
                if not valid[j, r]:
                    continue
                ids = rev_ids[j, r, :int(n_toks[j, r])]
                # reference hypothesis score: float32 right-fold from
                # EOS (A* gx accumulation) — ids are reverse-order
                # already, which IS the fold order. UNK nodes score
                # min_score-10, not the UNK piece's table entry
                # (unigram_model.cc:595-603).
                unk_sc = f32(np.asarray(self.unk_score))
                acc = f32(0.0)
                for t in ids:
                    if t < 0:
                        continue
                    sc = unk_sc if t == self.unk_id else host_scores[t]
                    acc = f32(sc + acc)
                paths.append((float(acc), ids[::-1]))
            paths.sort(key=lambda p: -p[0])
            top = paths[:n + 1]
            tie = any(top[i][0] == top[i + 1][0]
                      for i in range(len(top) - 1))
            # cut-boundary soundness: when the device returned a FULL
            # k candidates, paths outside its set have device-score <=
            # the worst returned one; their host score is within the
            # cross-engine per-path drift bound EPS of that. Unless the
            # n-th best clears the worst returned score by more than
            # 2*EPS, an excluded path could outrank it — fall back.
            # (#valid < k means the lattice has < k paths total: the
            # set is complete and no cut exists.)
            cut_risk = False
            if len(paths) >= K and len(paths) > n:
                worst = paths[-1][0]
                span = max(abs(paths[n - 1][0]), abs(worst), 1.0)
                eps = 2.0 * len(normed[gi]) * np.float32(span) * 1.2e-7
                cut_risk = (paths[n - 1][0] - worst) <= 2.0 * eps
            if (tie or cut_risk) and processor is not None:
                return host_fallback(gi)
            return [
                _apply_row_opts(p[1], self.unk_id, self.add_bos,
                                self.add_eos, self.reverse, self.bos_id,
                                self.eos_id)
                for p in paths[:n]]

        return self._bucketed(normed, run, unpack)

    def sample(self, texts: Sequence[str], alpha,
               rng=None) -> List[List[int]]:
        """Device lattice sampling (unigram_sample_batch) with the same
        bucketing as encode(). ``alpha`` may be a scalar or a per-row
        sequence. The jax PRNG key is seeded from the caller's numpy
        Generator (docs/conformance.md RNG contract)."""
        if rng is None:
            from ..utils.rng import get_generator

            rng = get_generator()
        key = jax.random.PRNGKey(int(rng.integers(0, 2**63 - 1)))
        alphas = _per_row(alpha, len(texts))
        normed = self._normalize_all(texts)

        def run(arr, lens, g, group):
            nonlocal key
            key, sub = jax.random.split(key)
            av = np.zeros(arr.shape[0], np.float32)
            av[:len(group)] = alphas[group]
            out, n = unigram_sample_batch(
                self.units, self.lat_score_table,
                jnp.asarray(arr), jnp.asarray(lens), self.unk_score,
                jnp.asarray(av), sub,
                max_depth=self.max_depth, unk_id=self.unk_id,
                root_state=self.root_state,
                add_bos=self.add_bos, add_eos=self.add_eos,
                reverse=self.reverse, bos_id=self.bos_id,
                eos_id=self.eos_id, pad_id=self.pad_id, arcs=self.arcs,
                bands=self.bands)
            return np.asarray(out), np.asarray(n)

        return self._bucketed(
            normed, run, lambda r, j, _gi: r[0][j, :r[1][j]].tolist())


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "unk_id", "root_state", "add_bos",
                     "add_eos", "reverse", "bos_id", "eos_id", "pad_id",
                     "bands"))
def unigram_sample_batch(units: jnp.ndarray,
                         lat_score_table: jnp.ndarray,
                         batch: jnp.ndarray,
                         lengths: jnp.ndarray,
                         unk_score: jnp.ndarray,
                         theta: jnp.ndarray,
                         key: jax.Array,
                         *,
                         max_depth: int,
                         unk_id: int,
                         root_state: int = 0,
                         add_bos: bool = False,
                         add_eos: bool = False,
                         reverse: bool = False,
                         bos_id: int = 1,
                         eos_id: int = 2,
                         pad_id: int = 0,
                         arcs=None,
                         bands=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Subword-regularization sampling on device: forward-filter
    backward-sample over the byte-indexed lattice (the device analog of
    Lattice::Sample, unigram_model.cc:385-442; theta = inverse
    temperature). One categorical draw per emitted piece via Gumbel-max
    over the D-wide candidate window; paths are drawn with probability
    proportional to exp(theta * path_score), exactly the reference
    distribution (PRNG stream aside — jax.random here, mt19937 there).

    The lattice populate below intentionally repeats unigram_encode_batch's
    inline walk: hoisting it into a shared helper has broken XLA's gather
    fusion before (see the design note at the top of this module)."""
    B, N = batch.shape
    # pieces longer than the padded width can never match, and the
    # adaptive encode width may undercut a big-piece model's max depth
    # (word models); the clamp is exact
    D = min(max_depth, N)
    sc_end, id_end = _populate_lattice(
        units, lat_score_table, batch, lengths, unk_score,
        D=D, unk_id=unk_id, root_state=root_state, arcs=arcs, bands=bands)
    # inverse temperature (theta * score, like Lattice::Sample); theta is
    # PER-ROW [B] — the TF op resolves nbest_size/alpha per batch row
    # (sentencepiece_processor_ops.cc:244-305). NEG_INF fills stay
    # sentinels.
    theta = jnp.broadcast_to(theta, (B,))
    sc_end = jnp.where(sc_end > NEG_INF / 2,
                       theta[:, None, None] * sc_end, sc_end)

    # -- forward filter: A[p] = LSE_j(A[p-1-j] + sc_end[p, j]) ----------------
    def fwd_step(win, sc_p):
        cand = win + sc_p
        mx = jnp.max(cand, axis=1)
        safe_mx = jnp.maximum(mx, NEG_INF / 2)
        a_p = jnp.where(
            mx > NEG_INF / 2,
            safe_mx + jnp.log(jnp.sum(
                jnp.exp(cand - safe_mx[:, None]), axis=1)),
            NEG_INF)
        new_win = jnp.concatenate([a_p[:, None], win[:, :D - 1]], axis=1)
        return new_win, a_p

    win0 = jnp.full((B, D), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    _, A = jax.lax.scan(fwd_step, win0, jnp.swapaxes(sc_end[:, 1:, :], 0, 1))
    A = jnp.concatenate([jnp.zeros((1, B), jnp.float32), A], axis=0)
    A_bt = A.T  # [B, N+1]

    # -- backward sample: categorical over the candidate window --------------
    rows = jnp.arange(B)
    jr = jnp.arange(D, dtype=jnp.int32)[None, :]
    gumbel = jax.random.gumbel(key, (N, B, D), jnp.float32)

    # early-exit backward sampler (see the encode backtrace note): runs
    # max-tokens-over-batch steps, consuming the same gumbel row per
    # step index as the full-length scan did
    def samp_cond(s):
        i, p, _ = s
        return (i < N) & jnp.any(p > 0)

    def samp_body(s):
        i, p, buf = s
        g_p = jax.lax.dynamic_slice_in_dim(gumbel, i, 1, axis=0)[0]
        active = p > 0
        psafe = jnp.maximum(p, 0)
        prev_idx = jnp.clip(psafe[:, None] - 1 - jr, 0, N)
        a_prev = jnp.take_along_axis(A_bt, prev_idx, axis=1)
        sc_p = sc_end[rows, psafe, :]
        valid = (psafe[:, None] - 1 - jr) >= 0
        logits = jnp.where(valid, a_prev + sc_p, NEG_INF)
        ksel = jnp.argmax(logits + g_p, axis=1).astype(jnp.int32) + 1
        tok = id_end[rows, psafe, jnp.clip(ksel - 1, 0, D - 1)]
        row = jnp.where(active, tok * 2 + 1, 0)  # bit0 = active
        buf = jax.lax.dynamic_update_slice(buf, row[None, :], (i, 0))
        return i + 1, jnp.where(active, p - ksel, p), buf

    _, _, buf = jax.lax.while_loop(
        samp_cond, samp_body,
        (jnp.int32(0), lengths, jnp.zeros((N, B), jnp.int32)))
    rev_mask = (buf & 1).astype(jnp.bool_).T
    rev_ids = jnp.where(rev_mask, buf.T >> 1, -1)
    T = jnp.sum(rev_mask, axis=1, dtype=jnp.int32)

    # fused reverse-compact + adjacent-UNK merge (same one-scatter form
    # as unigram_encode_batch — see the note there)
    t = jnp.arange(N, dtype=jnp.int32)[None, :]
    nxt_rev = jnp.concatenate(
        [rev_ids[:, 1:], jnp.full((B, 1), -1, rev_ids.dtype)], axis=1)
    in_tok = t < T[:, None]
    nxt_in = (t + 1) < T[:, None]
    keep = in_tok & ~((rev_ids == unk_id) & nxt_in & (nxt_rev == unk_id))
    rc_incl = jnp.flip(jnp.cumsum(jnp.flip(keep, axis=1), axis=1,
                                  dtype=jnp.int32), axis=1)
    newT = rc_incl[:, 0]
    out = trie.scatter_rowlocal_mxu(
        jnp.where(keep, rev_ids, pad_id),
        jnp.where(keep, rc_incl - 1, N + 1), N + 2, fill=pad_id,
        value_bits=max(8, int(lat_score_table.shape[0]).bit_length()))
    out = out.at[:, N + 1].set(pad_id)

    M = N + 2
    tt = jnp.arange(M, dtype=jnp.int32)[None, :]
    if reverse:
        src = jnp.clip(newT[:, None] - 1 - tt, 0, M - 1)
        rev = jnp.take_along_axis(out, src, axis=1)
        out = jnp.where(tt < newT[:, None], rev, pad_id)
    if add_bos:
        shifted = jnp.concatenate(
            [jnp.full((B, 1), bos_id, jnp.int32), out[:, :M - 1]], axis=1)
        out = jnp.where(tt <= newT[:, None], shifted, pad_id)
        out = out.at[:, 0].set(bos_id)
        newT = newT + 1
    if add_eos:
        out = out.at[rows, jnp.clip(newT, 0, M - 1)].set(eos_id)
        newT = newT + 1
        out = jnp.where(tt < newT[:, None], out, pad_id)
    return out, newT


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "unk_id", "k", "root_state", "bands"))
def unigram_nbest_batch(units: jnp.ndarray,
                        lat_score_table: jnp.ndarray,
                        batch: jnp.ndarray,
                        lengths: jnp.ndarray,
                        unk_score: jnp.ndarray,
                        *,
                        max_depth: int,
                        unk_id: int,
                        k: int,
                        root_state: int = 0,
                        arcs=None,
                        bands=None):
    """K-best Viterbi on device (SURVEY §2.8's n-best plan): the encode
    scan's D-wide window widened to [D, K] per-position score ranks, with
    lax.top_k merging D*K candidates per step and packed (j, rank)
    backpointers. Paths come out score-ordered; equal-score tie ORDER is
    implementation-defined here (the host A* nbest remains the
    tie-order-exact path, models/unigram.py).

    Returns (rev_ids int32[B, K, N] reverse-order tokens (-1 padded),
    n_toks int32[B, K], scores float32[B, K], valid bool[B, K]).

    The lattice populate repeats the inline walk (see the fusion note at
    the top of this module)."""
    B, N = batch.shape
    # pieces longer than the padded width can never match, and the
    # adaptive encode width may undercut a big-piece model's max depth
    # (word models); the clamp is exact
    D = min(max_depth, N)
    K = k
    sc_end, id_end = _populate_lattice(
        units, lat_score_table, batch, lengths, unk_score,
        D=D, unk_id=unk_id, root_state=root_state, arcs=arcs, bands=bands)

    # -- K-best forward scan --------------------------------------------------
    # window win[b, j, r] = r-th best score at position p-1-j; candidates
    # flattened with j DESC major (longest piece preferred on ties, like
    # the Viterbi first-argmax).
    def step(win, sc_p):
        cand = win + sc_p[:, :, None]           # [B, D, K]
        flat = cand[:, ::-1, :].reshape(B, D * K)
        vals, idx = jax.lax.top_k(flat, K)      # [B, K]
        new_win = jnp.concatenate([vals[:, None, :], win[:, :D - 1, :]],
                                  axis=1)
        return new_win, (vals, idx.astype(jnp.int32))

    win0 = jnp.full((B, D, K), NEG_INF, jnp.float32).at[:, 0, 0].set(0.0)
    _, (A, BP) = jax.lax.scan(step, win0,
                              jnp.swapaxes(sc_end[:, 1:, :], 0, 1))
    # A: [N, B, K] scores; BP: [N, B, K] flat (j_desc, rank) indices
    zero_col = jnp.full((1, B, K), NEG_INF, jnp.float32).at[0, :, 0].set(0.0)
    A = jnp.concatenate([zero_col, A], axis=0)          # [N+1, B, K]
    BP = jnp.concatenate([jnp.zeros((1, B, K), jnp.int32), BP], axis=0)

    A_b = jnp.swapaxes(A, 0, 1).reshape(B, (N + 1) * K)
    BP_b = jnp.swapaxes(BP, 0, 1).reshape(B, (N + 1) * K)

    rk = jnp.arange(K, dtype=jnp.int32)[None, :]
    p0 = jnp.broadcast_to(lengths[:, None], (B, K)).astype(jnp.int32)
    scores = jnp.take_along_axis(A_b, p0 * K + rk, axis=1)   # [B, K]
    valid = scores > NEG_INF / 2

    # -- backtrace of all K ranks in lockstep (early-exit while_loop) ---------
    def bt_cond(s):
        i, p, _, _ = s
        return (i < N) & jnp.any(p > 0)

    def bt_body(s):
        i, p, r, buf = s
        active = p > 0
        psafe = jnp.maximum(p, 0)
        packed = jnp.take_along_axis(BP_b, psafe * K + r, axis=1)
        j = (D - 1 - packed // K).astype(jnp.int32)
        r_next = (packed % K).astype(jnp.int32)
        tok = jnp.take_along_axis(
            id_end.reshape(B, (N + 1) * D),
            psafe * D + jnp.clip(j, 0, D - 1), axis=1)
        row = jnp.where(active, tok * 2 + 1, 0)  # bit0 = active
        buf = jax.lax.dynamic_update_slice(buf, row[None, :, :], (i, 0, 0))
        return (i + 1, jnp.where(active, p - (j + 1), p),
                jnp.where(active, r_next, r), buf)

    _, _, _, buf = jax.lax.while_loop(
        bt_cond, bt_body,
        (jnp.int32(0), p0, jnp.broadcast_to(rk, (B, K)),
         jnp.zeros((N, B, K), jnp.int32)))
    rev_mask = (buf & 1).astype(jnp.bool_)
    rev_ids = jnp.where(rev_mask, buf >> 1, -1)
    rev_ids = jnp.moveaxis(rev_ids, 0, 2)    # [B, K, N]
    n_toks = jnp.sum(rev_mask, axis=0, dtype=jnp.int32)  # [B, K]
    return rev_ids, n_toks, scores, valid



def _apply_row_opts(ids, unk_id, add_bos, add_eos, reverse, bos_id, eos_id):
    """Host tail for device n-best rows: adjacent-UNK merge + extra
    options in ApplyExtraOptions order (reverse, bos, eos)."""
    merged = []
    prev_unk = False
    for t in ids:
        unk = t == unk_id
        if not (unk and prev_unk):
            merged.append(int(t))
        prev_unk = unk
    if reverse:
        merged.reverse()
    if add_bos:
        merged.insert(0, bos_id)
    if add_eos:
        merged.append(eos_id)
    return merged
