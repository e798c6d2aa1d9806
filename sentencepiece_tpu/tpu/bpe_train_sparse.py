# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Sparse device BPE training: active-table merge loop on the mesh.

Scales the device BPE trainer past the dense U^2 histogram's ~4k symbol
bound (tpu/bpe_train.py) to reference-scale vocabularies (32k+), keeping
the corpus sharded over the data mesh. TPU-native re-expression of the
reference's lazily-maintained sparse pair sets + active-symbol heap
(bpe_model_trainer.cc:156-183,233-314, bpe_model_trainer.h:84-101):

  * the corpus shard is a dense [W, L] symbol array with HOLES (-1) —
    merged-away positions are never compacted; "next symbol" is a
    log-depth associative propagate scan (pure VPU), so a merge step
    never scatters the corpus;
  * pair frequencies replicate the reference's TRACKED-POSITION
    semantics, not raw corpus adjacency: ComputeFreq permanently erases
    overlap-skipped positions (``positions = set(kept)``,
    bpe_model_trainer.cc:85-116 / train/bpe.py:187), so an occurrence
    whose overlapping predecessor is later consumed by a DIFFERENT
    merge stays forgotten (botchan: '▁www…' rows keep a real (w,w)
    adjacency that the reference no longer counts). The device carries
    a persistent per-lane ``tracked`` mask: initialized to the
    chain-parity-kept occurrences of the load-time corpus, invalidated
    whenever a lane's symbol or partner changes, and re-established
    only for pairs involving the freshly merged symbol (the reference's
    _add_new_pair), with chain dedup applied at creation — equivalent
    because every reference symbol's first ComputeFreq runs at the pop
    immediately after its positions are added. A pair's frequency is
    then a plain masked sum over tracked lanes;
  * counts in the replicated ACTIVE TABLE of K entries are UPPER
    BOUNDS: tracked counts only decrease (new adjacencies always
    involve the newest symbol). Selection runs a while_loop: take the
    tuple-argmin (count desc, merged length asc, merged string lex asc,
    key asc) over the table, recount THAT key exactly (one elementwise
    pass over tracked lanes + psum), write it back, and stop when the
    winner's exact count survives — mirroring ComputeFreq-at-pop;
  * each applied merge discovers its new pairs ((x,new), (new,y),
    (new,new)) from the site rows only: rows containing sites are
    compacted (bounded by ``site_rows``), pair lanes sorted + segment-
    summed per shard, all_gathered, and re-reduced — exact counts at
    creation, like the reference's _add_new_pair position inserts;
  * when the table can no longer prove the global best (winner tuple
    >= the refresh floor) or has no room for appends, the epoch ends
    and a REFRESH recounts every present pair from the corpus shard
    (sort + segment-sum), merges shards via all_gather, orders all
    records with ONE variadic lax.sort keyed (count desc, len asc,
    chars..., key), and rebuilds the table + floor record;
  * duplicate piece strings (two symbol paths to the same string) are
    detected ON DEVICE against the emitted-piece array and skipped
    without applying — matching the reference's dup pop
    (bpe_model_trainer.cc:276-281 analog in train/bpe.py:341-345).

Semantics contract (``engine="device"``, documented in
docs/conformance.md): counts replicate the reference's tracked-position
frequency exactly (see above), including dup-string pops (the winner's
tracked lanes are erased without applying, matching the reference's
symbol erasure with position loss); selection is a GLOBAL argmax — the
reference restricts candidates to an active set of top max(1000,
5%*cache) symbols whose equal-frequency cutoff depends on libstdc++
unordered_map iteration order + partial_sort internals
(bpe_model_trainer.cc:156-183), which is host-only state. The two
engines are byte-identical until the first cutoff tie event
(scripts/oracle_bpe_active_set.py measures: botchan 8k diverges at piece
4264). Final tie-break beyond (freq, length, string) is smallest pair
key (the reference uses symbol creation order). The merge sequence is
invariant to mesh size and process count: pair counts are
integer-valued f32 (exact psum below 2^24).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from . import trie
from .bpe_encode import _prefix_last_alive, _suffix_first_alive
from .bpe_train import SCRIPT_ANY, SCRIPT_MIXED

NEG = jnp.float32(-1e30)
KEY_EMPTY = jnp.int32(-1)
CHR_PAD = jnp.int32(0x7FFFFFFF)  # sorts AFTER every real codepoint

# status codes returned by the epoch program
ST_REFRESH = 0     # floor reached / selection stuck (table still valid)
ST_DONE = 1        # n_merges emitted
ST_NO_PAIRS = 2    # corpus has no mergeable pair left
ST_REFRESH_STALE = 3  # append overflow: table is MISSING new pairs


def _lane_keys(sym, universe):
    """(key, alive): key = sym*U + next_alive_sym per lane (-1 when the
    lane is dead or has no alive successor)."""
    alive = sym >= 0
    nsym = _suffix_first_alive(sym, alive, jnp.int32(-1))
    valid = alive & (nsym >= 0)
    key = jnp.where(valid, sym * universe + nsym, -1)
    return key, alive


def _chain_parity_keep(cand, key, alive):
    """Overlap dedup among candidate occurrence lanes: consecutive
    alive-order candidates with the SAME key form overlap chains; keep
    alternate members, leftmost first (the reference's ComputeFreq
    dedup, bpe_model_trainer.cc:85-116)."""
    pkey = _prefix_last_alive(jnp.where(cand, key, -3), alive,
                              jnp.int32(-2))
    pcand = _prefix_last_alive(cand, alive, False)
    cont = cand & pcand & (pkey == key)
    c = jnp.cumsum(cand, axis=1, dtype=jnp.int32)
    start_mark = jnp.where(cand & ~cont, c, 0)
    seg_base = jax.lax.associative_scan(jnp.maximum, start_mark, axis=1)
    return cand & ((c - seg_base) % 2 == 0)


def _pair_lanes(sym, universe):
    """Initial tracked-position mask: every valid pair lane of the
    load-time corpus, chain-deduped. Returns (key, tracked, alive)."""
    key, alive = _lane_keys(sym, universe)
    cand = key >= 0
    return key, _chain_parity_keep(cand, key, alive), alive


def _segment_totals(keys_sorted, w_sorted, sentinel):
    """(is_start, totals): per-lane segment start mask over sorted keys
    and, at start lanes, the segment's summed weight. Uses only scans —
    no gathers."""
    n = keys_sorted.shape[-1]
    prev = jnp.concatenate(
        [jnp.full(keys_sorted.shape[:-1] + (1,), -3, keys_sorted.dtype),
         keys_sorted[..., :-1]], axis=-1)
    start = (keys_sorted != prev) & (keys_sorted != sentinel)
    boundary = keys_sorted != prev
    csum = jnp.cumsum(w_sorted, axis=-1)
    csum_prev = jnp.concatenate(
        [jnp.zeros(keys_sorted.shape[:-1] + (1,), w_sorted.dtype),
         csum[..., :-1]], axis=-1)
    # csum at the last lane of each segment = csum_prev at the NEXT
    # boundary (fill: total sum for the final segment)
    total = csum[..., -1:]
    last_in_seg = _suffix_first_alive(
        csum_prev.reshape(1, -1), boundary.reshape(1, -1),
        jnp.float32(0)).reshape(csum_prev.shape)
    # fill for the final segment: no later boundary -> suffix fill is 0;
    # patch with the row total
    has_later = _suffix_first_alive(
        jnp.ones_like(boundary, jnp.int32).reshape(1, -1),
        boundary.reshape(1, -1), jnp.int32(0)).reshape(boundary.shape)
    last_in_seg = jnp.where(has_later == 1, last_in_seg, total)
    totals = last_in_seg - csum_prev
    return start, jnp.where(start, totals, 0.0)


def _merged_chars(s_chr, s_len, l, r, Lp):
    """chars of piece l ++ piece r, CHR_PAD-padded, for record lanes."""
    cl = trie._gather(s_chr, l)                      # [n, Lp]
    cr = trie._gather(s_chr, r)
    ll = trie._gather(s_len, l)
    lr = trie._gather(s_len, r)
    j = jnp.arange(Lp, dtype=jnp.int32)[None, :]
    idx_r = jnp.clip(j - ll[:, None], 0, Lp - 1)
    crr = jnp.take_along_axis(cr, idx_r, axis=1)
    out = jnp.where(j < ll[:, None], cl,
                    jnp.where(j < (ll + lr)[:, None], crr, CHR_PAD))
    return out, ll + lr


def _pair_valid(l, r, s_len, s_wsp, s_wsi, s_scr, s_val, max_piece_len):
    """IsValidSentencePiece composition rules for a merged pair — same
    decomposition the dense kernel validates byte-exactly
    (tpu/bpe_train.py step(); trainer_interface.cc:178-267)."""
    len_l = trie._gather(s_len, l)
    len_r = trie._gather(s_len, r)
    ok = (trie._gather(s_val.astype(jnp.int32), l) > 0)
    ok &= (trie._gather(s_val.astype(jnp.int32), r) > 0)
    ok &= (len_l + len_r) <= max_piece_len
    wsi_l = trie._gather(s_wsi.astype(jnp.int32), l) > 0
    wsp_r = trie._gather(s_wsp.astype(jnp.int32), r) > 0
    wsi_r = trie._gather(s_wsi.astype(jnp.int32), r) > 0
    ok &= ~wsi_l & ~wsp_r & ~wsi_r
    scr_l = trie._gather(s_scr, l)
    scr_r = trie._gather(s_scr, r)
    compat = (((scr_l == SCRIPT_ANY) | (scr_r == SCRIPT_ANY)
               | (scr_l == scr_r))
              & (scr_l != SCRIPT_MIXED) & (scr_r != SCRIPT_MIXED))
    return ok & compat


def _tuple_less(cnt_a, len_a, chr_a, key_a, cnt_b, len_b, chr_b, key_b, Lp):
    """(cnt desc, len asc, chars lex asc, key asc) tuple compare a < b.

    The char chain is UNROLLED (static Lp), not a fori_loop: unrolled
    compare/select chains fuse into one elementwise kernel, while a
    fori body is a separate sequenced launch per depth — the r5
    epoch-program op-count diet (the merge loop runs this 2x/merge)."""
    lt = cnt_a > cnt_b
    eq = cnt_a == cnt_b
    lt = lt | (eq & (len_a < len_b))
    eq = eq & (len_a == len_b)
    for i in range(Lp):
        ca = chr_a[i]
        cb = chr_b[i]
        lt = lt | (eq & (ca < cb))
        eq = eq & (ca == cb)
    return lt | (eq & (key_a < key_b))


def _tuple_argmin_rec(cnt, len2, chr2, key, mask, Lp):
    """The tuple-minimum record (cnt desc, len asc, chars lex asc, key
    asc) over masked records, via Lp UNROLLED elementwise reduction
    passes (no sort, no fori — see _tuple_less on why unrolled).
    Returns (found, cnt, len, chr[Lp], key)."""
    BIGI = jnp.int32(2**31 - 1)
    found = jnp.any(mask)
    m = mask
    c = jnp.max(jnp.where(m, cnt, -1.0))
    m = m & (cnt == c)
    l = jnp.min(jnp.where(m, len2, BIGI))
    m = m & (len2 == l)
    for j in range(Lp):
        ch = jnp.where(m, chr2[:, j], BIGI)
        m = m & (ch == jnp.min(ch))
    k = jnp.min(jnp.where(m, key, BIGI))
    idx = jnp.argmax(m & (key == k)).astype(jnp.int32)
    w_chr = jax.lax.dynamic_slice(chr2, (idx, jnp.int32(0)), (1, Lp))[0]
    return found, c, l, w_chr, k


def make_programs(*, universe: int, n_merges: int, max_piece_len: int,
                  table_k: int, site_rows: int, new_cap: int,
                  dist_cap: int, axis_name: str, mesh):
    """Build the (refresh, epoch) shard_map'd programs for one config."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    U = universe
    Lp = max_piece_len
    K = table_k
    # append headroom: refresh leaves these slots empty for the epoch's
    # new-pair appends (see refresh_impl comment)
    K_EFF = max(1, K - int(os.environ.get(
        "SPM_BPE_SPARSE_APPEND_HEADROOM", str(K // 4))))
    # per-DISPATCH merge cap: one epoch program must finish well under
    # the rig's ~60 s device watchdog (an uncapped epoch at config-5
    # scale ran minutes and got the TPU worker killed, 2026-08-20);
    # the driver just dispatches another refresh+epoch pair
    E_CAP = int(os.environ.get("SPM_BPE_SPARSE_EPOCH_CAP", "384"))
    ndev = mesh.size

    # ---------------- refresh: full recount + table rebuild ----------------
    def refresh_impl(sym, tracked, freqs, s_len, s_wsp, s_wsi, s_scr,
                     s_val, s_chr):
        W, L = sym.shape
        key, _ = _lane_keys(sym, U)
        SENT = jnp.int32(2**31 - 1)
        flatk = jnp.where(tracked, key, SENT).reshape(-1)
        flatw = jnp.where(tracked, freqs,
                          jnp.zeros((), jnp.float32)).reshape(-1)
        ks, ws = jax.lax.sort((flatk, flatw), num_keys=1)
        start, totals = _segment_totals(ks, ws, SENT)
        ridx = jnp.cumsum(start) - 1
        dk = jnp.full((dist_cap + 1,), SENT, jnp.int32)
        dc = jnp.zeros((dist_cap + 1,), jnp.float32)
        tgt = jnp.where(start, jnp.minimum(ridx, dist_cap), dist_cap)
        dk = trie._scatter_set(dk[None, :], jnp.zeros_like(tgt), tgt,
                               ks)[0, :dist_cap]
        dc = trie._scatter_set(dc[None, :], jnp.zeros_like(tgt), tgt,
                               totals)[0, :dist_cap]
        overflow = jnp.sum(start, dtype=jnp.int32) > dist_cap
        # merge shards
        gk = jax.lax.all_gather(dk, axis_name).reshape(-1)
        gc = jax.lax.all_gather(dc, axis_name).reshape(-1)
        overflow = jax.lax.psum(overflow.astype(jnp.int32), axis_name) > 0
        ks2, cs2 = jax.lax.sort((gk, gc), num_keys=1)
        start2, tot2 = _segment_totals(ks2, cs2, SENT)
        n2 = ks2.shape[0]
        l2 = jnp.where(ks2 != SENT, ks2 // U, 0)
        r2 = jnp.where(ks2 != SENT, ks2 % U, 0)
        valid = start2 & (ks2 != SENT)
        valid &= _pair_valid(l2, r2, s_len, s_wsp, s_wsi, s_scr, s_val, Lp)
        chr2, len2 = _merged_chars(s_chr, s_len, l2, r2, Lp)
        # drop already-emitted duplicate strings? NO — the reference
        # re-creates dup symbols fresh; they are skipped at pop time.
        cnt2 = jnp.where(valid, tot2, -1.0)
        # Table cut: top-K by (count desc, len asc, KEY asc) — ONE
        # 3-operand sort instead of the old (2+Lp+1)-operand full-tuple
        # variadic sort, whose bitonic expansion at 2M records never
        # finished TPU compilation (r03's config-5 compile-helper OOM;
        # 2026-08-20 probe: >10 min and counting). The cut order drops
        # the chars component, so within a (count, len) tie group that
        # STRADDLES the cut the chosen members differ from the
        # reference's string-lex order. Exactness is preserved by two
        # elementwise tuple-argmin passes (no sort, chars included):
        #   * the FLOOR becomes the true tuple-min of the EXCLUDED
        #     records, so the epoch's pop guard (full _tuple_less) still
        #     fires exactly when an excluded record could beat the
        #     table's best;
        #   * the refresh also returns the EXACT global-best record;
        #     the epoch consumes it as its first pop, which guarantees
        #     forward progress when the true best fell outside the cut
        #     (the guard would otherwise refresh forever).
        BIGI = jnp.int32(2**31 - 1)
        posi = valid & (cnt2 > 0)          # zero-count records never pop
        ic = cnt2.astype(jnp.int32)        # exact: integral f32 < 2^24
        negk1 = jnp.where(posi, -((ic << 5) | (31 - len2)), BIGI)
        keyo = jnp.where(posi, ks2, SENT)
        G = int(ks2.shape[0])
        iota = jnp.arange(G, dtype=jnp.int32)
        sk1, skeys, sidx = jax.lax.sort((negk1, keyo, iota), num_keys=2)
        # Fill only K_eff = K - headroom slots: each applied merge
        # APPENDS its new pairs into free slots, and a full table forces
        # ST_REFRESH after every single merge (measured: 1 merge per
        # 0.6 s refresh+epoch pair at config-5 scale — hours). The
        # reserved slots let an epoch run hundreds of merges between
        # refreshes; the floor moves up to the (K_eff+1)-th record,
        # which only makes the guard (and the exact-winner fallback)
        # fire sooner, never wrongly.
        top = sidx[:K]
        tval = (sk1[:K] != BIGI) & (jnp.arange(K) < K_EFF)
        t_key = jnp.where(tval, trie._gather(ks2, top), KEY_EMPTY)
        t_cnt = jnp.where(tval, trie._gather(cnt2, top), 0.0)
        t_len = jnp.where(tval, trie._gather(len2, top), 0)
        t_chr = jnp.where(tval[:, None], trie._gather(chr2, top),
                          jnp.full((K, Lp), CHR_PAD, jnp.int32))
        # excluded = records at sorted rank >= K_eff, identified by
        # lexicographic (negk1, key) >= the K_eff-th sorted record
        thr1 = sk1[K_EFF]
        thrk = skeys[K_EFF]
        excl = posi & ((negk1 > thr1)
                       | ((negk1 == thr1) & (keyo >= thrk)))
        has_floor, f_c, f_l, f_ch, f_k = _tuple_argmin_rec(
            cnt2, len2, chr2, ks2, excl, Lp)
        fl_cnt = jnp.where(has_floor, f_c, NEG)
        fl_len = jnp.where(has_floor, f_l, 0)
        fl_chr = jnp.where(has_floor, f_ch,
                           jnp.full((Lp,), CHR_PAD, jnp.int32))
        fl_key = jnp.where(has_floor, f_k, SENT)
        has_w, w_c, w_l, w_ch, w_k = _tuple_argmin_rec(
            cnt2, len2, chr2, ks2, posi, Lp)
        w_key = jnp.where(has_w, w_k, jnp.int32(-1))
        w_cnt = jnp.where(has_w, w_c, 0.0)
        w_len = jnp.where(has_w, w_l, 0)
        w_chr = jnp.where(has_w, w_ch,
                          jnp.full((Lp,), CHR_PAD, jnp.int32))
        return (t_key, t_cnt, t_len, t_chr, fl_cnt, fl_len, fl_chr,
                fl_key, w_key, w_cnt, w_len, w_chr, overflow)

    # ---------------- epoch: merge steps until refresh/done ----------------
    def epoch_impl(sym, tracked, freqs, t_key, t_cnt, t_len, t_chr,
                   fl_cnt, fl_len, fl_chr, fl_key,
                   w_key, w_cnt, w_len, w_chr,
                   s_len, s_wsp, s_wsi, s_scr, s_val, s_chr,
                   ml, mr, mf, e_len, e_chr, next_id, k_done, use_w0,
                   tbl_ok0):
        W, L = sym.shape
        SENT = jnp.int32(2**31 - 1)
        BIG = jnp.int32(2**31 - 1)

        def recount_on(key_c, tracked_c, wkey):
            """Exact global tracked-position count of one pair key —
            the device ComputeFreq (bpe_model_trainer.cc:85-116). The
            lane keys are CARRIED loop state (r5): recomputing them was
            a full-lane propagate scan per select iteration."""
            s = jnp.sum(jnp.where(tracked_c & (key_c == wkey),
                                  freqs, 0.0))
            return jax.lax.psum(s, axis_name)

        def table_argmin(t_key_c, t_cnt_c, t_len_c, t_chr_c):
            """index of the tuple-min (cnt desc, len, lex, key) entry.
            Char passes unrolled (see _tuple_less)."""
            occ = t_key_c >= 0
            m = jnp.max(jnp.where(occ, t_cnt_c, NEG))
            msk = occ & (t_cnt_c == m)
            ml_ = jnp.min(jnp.where(msk, t_len_c, BIG))
            msk &= t_len_c == ml_
            for j in range(Lp):
                c = jnp.where(msk, t_chr_c[:, j], BIG)
                msk = msk & (c == jnp.min(c))
            kk = jnp.min(jnp.where(msk, t_key_c, BIG))
            idx = jnp.argmax(msk & (t_key_c == kk)).astype(jnp.int32)
            return idx, m

        def select(key_c, tracked_c, t_key_c, t_cnt_c, t_len_c, t_chr_c):
            """Resolve the exact global-best table entry.
            Returns (t_key, t_cnt, winner_idx, exact_cnt, ok, stuck).

            The first argmin+recount is PEELED out of the while_loop:
            table counts are upper bounds that usually survive their
            recount (the winner's count only changed if a recent merge
            touched its occurrences), so the common case runs zero
            while iterations — the loop body's ~dozens of sequenced
            micro-ops only execute on genuinely stale entries."""
            def step(t_key_i, t_cnt_i, idx, exact):
                c1, m = table_argmin(t_key_i, t_cnt_i, t_len_c, t_chr_c)
                has = m > 0.5
                wkey = t_key_i[c1]
                ex = jnp.where(has, recount_on(key_c, tracked_c, wkey), 0.0)
                t_cnt_i = t_cnt_i.at[c1].set(jnp.where(has, ex, 0.0))
                resolved = has & (ex == m)
                # count can hit 0 (all occurrences were consumed by
                # earlier sibling merges): drop the entry
                t_key_i = jnp.where((ex < 0.5) & has,
                                    t_key_i.at[c1].set(KEY_EMPTY), t_key_i)
                done_now = resolved | ~has
                return (t_key_i, t_cnt_i,
                        jnp.where(resolved, c1, idx),
                        jnp.where(resolved, ex,
                                  jnp.where(has, exact, 0.0)),
                        done_now)

            def cond(st):
                t_key_i, t_cnt_i, idx, exact, done, iters = st
                return (~done) & (iters < 2 * K)

            def body(st):
                t_key_i, t_cnt_i, idx, exact, done, iters = st
                t_key_i, t_cnt_i, idx, exact, done_now = step(
                    t_key_i, t_cnt_i, idx, exact)
                return (t_key_i, t_cnt_i, idx, exact, done_now,
                        iters + 1)

            tk0, tc0, idx0, ex0, done0 = step(
                t_key_c, t_cnt_c, jnp.int32(-1), jnp.float32(0.0))
            st0 = (tk0, tc0, idx0, ex0, done0, jnp.int32(1))
            t_key_o, t_cnt_o, idx, exact, done, iters = \
                jax.lax.while_loop(cond, body, st0)
            ok = idx >= 0
            return t_key_o, t_cnt_o, idx, exact, ok, iters >= 2 * K

        def step_cond(st):
            (sym_c, tracked_c, key_c, alive_c, t_key_c, t_cnt_c,
             t_len_c, t_chr_c,
             s_len_c, s_wsp_c, s_wsi_c, s_scr_c, s_val_c, s_chr_c, ml_c,
             mr_c, mf_c, e_len_c, e_chr_c, nid, k_c, status, use_w) = st
            return (status < 0) & (nid - next_id < E_CAP)

        def step_body(st):
            (sym_c, tracked_c, key_c, alive_c, t_key_c, t_cnt_c,
             t_len_c, t_chr_c,
             s_len_c, s_wsp_c, s_wsi_c, s_scr_c, s_val_c, s_chr_c, ml_c,
             mr_c, mf_c, e_len_c, e_chr_c, nid, k_c, status, use_w) = st

            t_key_c, t_cnt_c, c1, exact, ok, stuck = select(
                key_c, tracked_c, t_key_c, t_cnt_c, t_len_c, t_chr_c)

            # exact-winner override: the FIRST pop after a refresh
            # consumes the refresh's tuple-argmin record directly. The
            # table's (cnt, len, key) cut can exclude the true best
            # inside a straddling tie group; the provided record is the
            # exact global best, so no floor doubt and no livelock.
            w_ok = w_key >= 0
            ok = jnp.where(use_w, w_ok, ok)
            stuck = jnp.where(use_w, False, stuck)
            exact = jnp.where(use_w, w_cnt, exact)

            has_floor = fl_cnt > NEG / 2
            # floor guard: the winner must beat the best excluded-at-
            # refresh record, whose count can only have decreased
            c1s = jnp.maximum(c1, 0)
            wlen0 = jnp.where(use_w, w_len, t_len_c[c1s])
            wchr0 = jnp.where(use_w, w_chr, t_chr_c[c1s])
            wkey0 = jnp.where(use_w, w_key, t_key_c[c1s])
            beats_floor = _tuple_less(
                exact, wlen0, wchr0, wkey0,
                fl_cnt, fl_len, fl_chr, fl_key, Lp)
            need_refresh = ~use_w & (stuck | (~ok & has_floor)
                                     | (ok & has_floor & ~beats_floor))
            no_pairs = ~ok & ~has_floor

            # dup piece string: the reference pops it, erases the symbol
            # WITH its positions, and applies nothing (train/bpe.py:341)
            slot = jnp.arange(e_len_c.shape[0], dtype=jnp.int32)
            isdup = ok & ~need_refresh & jnp.any(
                (e_len_c == wlen0) & (slot < k_c)
                & jnp.all(e_chr_c == wchr0[None, :], axis=1))
            apply_it = ok & ~need_refresh & ~isdup

            wkey = jnp.where(ok, wkey0, -1)
            bl = jnp.where(apply_it, wkey // U, 0)
            br = jnp.where(apply_it, wkey % U, 0)

            # ---- apply at the tracked occurrences ----------------------
            key, alive = key_c, alive_c  # carried loop state (r5)
            if True:
                # dup: forget the pair's tracked positions; consumed
                # winners (dup or applied) leave the table by KEY match
                # (the exact-winner pop may sit in any slot, or none)
                tracked_c = jnp.where(isdup,
                                      tracked_c & ~(key == wkey), tracked_c)
                clr = (isdup | apply_it) & (t_key_c == wkey)
                t_key_c = jnp.where(clr, KEY_EMPTY, t_key_c)
                t_cnt_c = jnp.where(clr, 0.0, t_cnt_c)
            hit = apply_it & tracked_c & (key == wkey)
            absorbed = alive & _prefix_last_alive(hit, alive, False)
            sym_n = jnp.where(hit, nid, sym_c)
            sym_n = jnp.where(absorbed, -1, sym_n)
            # tracked-mask update: a lane's tracking dies when its
            # symbol or partner changes; only merged-symbol pairs are
            # re-added (_add_new_pair), chain-deduped at creation
            next_kept = _suffix_first_alive(hit, alive, False)
            newly = (hit | (alive & ~absorbed & next_kept))
            key_n, alive_n = _lane_keys(sym_n, U)
            newly = newly & (key_n >= 0)
            keep_new = _chain_parity_keep(newly, key_n, alive_n)
            tracked_n = ((tracked_c & ~hit & ~absorbed & ~next_kept)
                         | keep_new)
            tracked_n = jnp.where(apply_it, tracked_n, tracked_c)
            sym_n = jnp.where(apply_it, sym_n, sym_c)
            key_nn = jnp.where(apply_it, key_n, key_c)
            alive_nn = jnp.where(apply_it, alive_n, alive_c)

            # ---- attribute + emit updates ------------------------------
            nids = nid
            s_len_n = s_len_c.at[nids].set(
                jnp.where(apply_it, s_len_c[bl] + s_len_c[br], 0))
            s_wsp_n = s_wsp_c.at[nids].set(
                jnp.where(apply_it, s_wsp_c[bl], False))
            s_wsi_n = s_wsi_c.at[nids].set(
                jnp.where(apply_it,
                          s_wsi_c[bl] | s_wsp_c[br] | s_wsi_c[br], False))
            new_scr = jnp.where(
                s_scr_c[bl] == SCRIPT_ANY, s_scr_c[br],
                jnp.where(s_scr_c[br] == SCRIPT_ANY, s_scr_c[bl],
                          jnp.where(s_scr_c[bl] == s_scr_c[br],
                                    s_scr_c[bl], SCRIPT_MIXED)))
            s_scr_n = s_scr_c.at[nids].set(jnp.where(apply_it, new_scr, 0))
            s_val_n = s_val_c.at[nids].set(apply_it)
            jpos = jnp.arange(Lp, dtype=jnp.int32)
            mchr = jnp.where(jpos < wlen0, wchr0, 0)  # s_chr pads with 0
            s_chr_n = s_chr_c.at[nids].set(jnp.where(apply_it, mchr, 0))
            ks = jnp.maximum(k_c, 0)
            ml_n = ml_c.at[ks].set(jnp.where(apply_it, bl, ml_c[ks]))
            mr_n = mr_c.at[ks].set(jnp.where(apply_it, br, mr_c[ks]))
            mf_n = mf_c.at[ks].set(jnp.where(apply_it, exact, mf_c[ks]))
            e_len_n = e_len_c.at[ks].set(
                jnp.where(apply_it, wlen0, e_len_c[ks]))
            e_chr_n = e_chr_c.at[ks].set(
                jnp.where(apply_it, wchr0, e_chr_c[ks]))

            # ---- new-pair discovery (exact counts at creation) ---------
            isnew = apply_it & (sym_n == nid)
            row_has = jnp.any(isnew, axis=1)
            n_rows = jnp.sum(row_has, dtype=jnp.int32)
            sr = min(site_rows, W)
            if sr >= W:
                # full-width variant (the driver's early-phase program,
                # r5): every row is a "site row" — no compaction, no
                # row-count overflow; costs one corpus-wide sort per
                # merge instead of a refresh per overflowing merge
                sub_frq = freqs
                touch = keep_new & apply_it
                skey = key_n
            else:
                ridx = jnp.argsort(~row_has)[:sr]
                sub_frq = freqs[ridx]
                # the freshly-tracked lanes carry exactly the
                # reference's _add_new_pair position inserts; sum them
                # per distinct key
                touch = keep_new[ridx] & apply_it
                skey = key_n[ridx]
            flatk = jnp.where(touch, skey, SENT).reshape(-1)
            flatw = jnp.where(touch, sub_frq, 0.0).reshape(-1)
            kss, wss = jax.lax.sort((flatk, flatw), num_keys=1)
            start, totals = _segment_totals(kss, wss, SENT)
            rrank = jnp.cumsum(start) - 1
            nk = jnp.full((new_cap + 1,), SENT, jnp.int32)
            nc = jnp.zeros((new_cap + 1,), jnp.float32)
            tgt = jnp.where(start, jnp.minimum(rrank, new_cap), new_cap)
            nk = trie._scatter_set(nk[None, :], jnp.zeros_like(tgt), tgt,
                                   kss)[0, :new_cap]
            nc = trie._scatter_set(nc[None, :], jnp.zeros_like(tgt), tgt,
                                   totals)[0, :new_cap]
            row_ovf = (n_rows > sr) if sr < W else jnp.bool_(False)
            dis_ovf = jnp.sum(start, dtype=jnp.int32) > new_cap
            # merge shards' new pairs
            gk = jax.lax.all_gather(nk, axis_name).reshape(-1)
            gc = jax.lax.all_gather(nc, axis_name).reshape(-1)
            ovf = jax.lax.psum((row_ovf | dis_ovf).astype(jnp.int32),
                               axis_name) > 0
            ks2, cs2 = jax.lax.sort((gk, gc), num_keys=1)
            start2, tot2 = _segment_totals(ks2, cs2, SENT)
            l2 = jnp.where(ks2 != SENT, ks2 // U, 0)
            r2 = jnp.where(ks2 != SENT, ks2 % U, 0)
            nvalid = start2 & (ks2 != SENT) & apply_it & ~ovf
            nvalid &= _pair_valid(l2, r2, s_len_n, s_wsp_n, s_wsi_n,
                                  s_scr_n, s_val_n, Lp)
            chr2, len2 = _merged_chars(s_chr_n, s_len_n, l2, r2, Lp)
            # sub-floor appends can never pop before the next refresh
            # (the guard requires beating the floor), so spend no table
            # slots on them — this is what lets an epoch run to the
            # floor instead of dying on append overflow
            nvalid &= ~has_floor | _tuple_less(
                jnp.where(nvalid, tot2, -1.0), len2, chr2.T, ks2,
                fl_cnt, fl_len, fl_chr, fl_key, Lp)
            n_new = jnp.sum(nvalid, dtype=jnp.int32)
            # append into free table slots
            free = t_key_c < 0
            n_free = jnp.sum(free, dtype=jnp.int32)
            slot_order = jnp.argsort(~free).astype(jnp.int32)  # free first
            nrank = jnp.cumsum(nvalid) - 1
            can = nvalid & (nrank < n_free)
            slots = trie._gather(slot_order,
                                 jnp.where(can, jnp.minimum(nrank, K - 1),
                                           0))
            slots = jnp.where(can, slots, K)  # drop lane

            # scatter with [K+1] guard row
            def app(vec, vals, fill_row):
                v = jnp.concatenate([vec, fill_row])
                v = trie._scatter_set(v[None, :], jnp.zeros_like(slots),
                                      slots, vals)[0]
                return v[:K]
            t_key_c = app(t_key_c, jnp.where(can, ks2, 0),
                          jnp.zeros((1,), t_key_c.dtype))
            t_cnt_c = app(t_cnt_c, jnp.where(can, tot2, 0.0),
                          jnp.zeros((1,), t_cnt_c.dtype))
            t_len_c = app(t_len_c, jnp.where(can, len2, 0),
                          jnp.zeros((1,), t_len_c.dtype))
            # chars: one guarded row scatter
            slots_b = jax.lax.optimization_barrier(slots)
            tc = jnp.concatenate(
                [t_chr_c, jnp.zeros((1, Lp), jnp.int32)], axis=0)
            tc = tc.at[slots_b].set(
                jnp.where(can[:, None], chr2, 0), mode="drop")
            t_chr_c = jax.lax.optimization_barrier(tc)[:K]
            append_ovf = apply_it & ((n_new > n_free) | ovf)

            k_n = k_c + jnp.where(apply_it, 1, 0)
            nid_n = nid + jnp.where(apply_it, 1, 0)
            status_n = jnp.where(
                no_pairs, ST_NO_PAIRS,
                jnp.where(k_n >= n_merges, ST_DONE,
                          jnp.where(append_ovf, ST_REFRESH_STALE,
                                    jnp.where(need_refresh,
                                              ST_REFRESH,
                                              -1)))).astype(jnp.int32)
            return (sym_n, tracked_n, key_nn, alive_nn,
                    t_key_c, t_cnt_c, t_len_c, t_chr_c,
                    s_len_n, s_wsp_n, s_wsi_n, s_scr_n, s_val_n, s_chr_n,
                    ml_n, mr_n, mf_n, e_len_n, e_chr_n, nid_n, k_n,
                    status_n, jnp.zeros((), jnp.bool_))

        key0, alive0 = _lane_keys(sym, U)
        # tbl_ok0: the table-staleness flag threaded by the driver. An
        # epoch that ends on append overflow leaves the table MISSING
        # the overflowed new pairs — unlike a floor exit, follow-on
        # epochs could not detect that and would merge from the stale
        # table (wrong merge order; caught by the r5 self-review's
        # empirical repro). With the flag, such epochs start in
        # ST_REFRESH and apply nothing.
        st0 = (sym, tracked, key0, alive0, t_key, t_cnt, t_len, t_chr,
               s_len, s_wsp, s_wsi, s_scr, s_val, s_chr, ml, mr, mf,
               e_len, e_chr, next_id, k_done,
               jnp.where(tbl_ok0, jnp.int32(-1), jnp.int32(ST_REFRESH)),
               use_w0)
        out = jax.lax.while_loop(step_cond, step_body, st0)
        # ALSO return the table state so the host driver can dispatch
        # another epoch without an intervening refresh (r5: the r4
        # driver refreshed unconditionally before every epoch — ~8x
        # more refreshes than the floor/append logic requires); the
        # carried (key, alive) lane state stays internal. tbl_ok_out
        # propagates staleness to the next in-wave epoch.
        status_out = out[-2]
        tbl_ok_out = tbl_ok0 & (status_out != ST_REFRESH_STALE)
        return out[:2] + out[4:-1] + (tbl_ok_out,)

    shard = P(axis_name)
    rep = P()
    refresh = jax.jit(shard_map(
        refresh_impl, mesh=mesh,
        in_specs=(shard, shard, shard) + (rep,) * 6,
        out_specs=(rep,) * 13, check_vma=False))
    epoch = jax.jit(shard_map(
        epoch_impl, mesh=mesh,
        in_specs=(shard, shard, shard) + (rep,) * 27,
        out_specs=(shard, shard) + (rep,) * 19, check_vma=False))
    return refresh, epoch


def init_tracked(sym_np: np.ndarray) -> np.ndarray:
    """Load-time tracked-position mask (host): every pair occurrence of
    the initial corpus, chain-parity deduped — what the reference's
    corpus scan + first ComputeFreq keeps. Mirrors _pair_lanes; rows are
    dense at load (no holes), so the lanes are simply positions.

    Vectorized: a run of n+1 equal symbols contributes pair lanes whose
    in-run offsets alternate kept/skipped."""
    W, L = sym_np.shape
    alive = sym_np >= 0
    nxt = np.concatenate([sym_np[:, 1:],
                          np.full((W, 1), -1, sym_np.dtype)], axis=1)
    valid = alive & (nxt >= 0)
    same = np.concatenate([np.zeros((W, 1), bool),
                           sym_np[:, 1:] == sym_np[:, :-1]], axis=1)
    in_run = valid & (sym_np == nxt)
    pos = np.arange(L)[None, :]
    starts = np.where(same, -1, pos)
    run_start = np.maximum.accumulate(starts, axis=1)
    parity_keep = ((pos - run_start) % 2) == 0
    return valid & np.where(in_run, parity_keep, True)


class _SparseState:
    """Programs + device state of one sparse-BPE training, shared by
    the production driver and the scaling benchmark."""


def prepare_sparse_engine(trainer, n_merges: int,
                          table_k: int = 8192,
                          site_rows: int = 2048,
                          new_cap: int = 1024):
    """Build the (refresh, epoch) programs and upload the packed corpus
    + symbol state. Returns a _SparseState or None when the config
    cannot run on device (universe too large for int32 pair keys,
    piece length / count bounds). The wave-loop driver
    (train_device_bpe_sparse) and bench_scaling.py both drive it."""
    from ..train.interface import UNK_CHAR
    from ..utils import unicode_script
    from .. import distributed as dist

    from ..utils import profiling

    table_k = int(os.environ.get("SPM_BPE_SPARSE_TABLE_K", table_k))
    site_rows = int(os.environ.get("SPM_BPE_SPARSE_SITE_ROWS", site_rows))
    new_cap = int(os.environ.get("SPM_BPE_SPARSE_NEW_CAP", new_cap))
    words = trainer.sentences
    ts = trainer.trainer_spec
    chars = sorted({c for w, _ in words for c in w})
    char_id = {c: i for i, c in enumerate(chars)}
    A = len(chars)
    U = A + n_merges
    SEP = U  # permanent word separator: s_val False => never pairs
    if U + 1 >= 46341:  # l*(U+1) + r must fit int32
        return None
    # The refresh's 3-operand cut sort packs (count, merged len) as
    # -((count << 5) | (31 - len)): len > 31 flips the key sign and a
    # count >= 2^26 overflows into the sign bit (advisor r4 low
    # finding). Both bounds are host-checkable up front — decline the
    # device engine (facade falls back) instead of corrupting the cut.
    if ts.max_sentencepiece_length > 31:
        return None
    # bound at 2^24, the tighter of the two limits: above it the f32
    # count arithmetic itself stops being integral (the "exact psum
    # below 2^24" contract in the module docstring). The bound is the
    # TRUE maximum single-pair frequency (merged pairs only shrink
    # counts and new pairs are bounded by their parents'), computed
    # vectorized — the r5 self-review caught an earlier total-positions
    # bound that declined valid ~17 MB+ corpora by 10-100x.
    if words:
        import numpy as _np

        char_ids = {c: i for i, c in
                    enumerate(sorted({c for w, _ in words for c in w}))}
        _A = len(char_ids) + 1
        pair_keys_l, pair_w_l = [], []
        for w, f in words:
            if len(w) < 2:
                continue
            ids = _np.fromiter((char_ids[c] for c in w), _np.int64,
                               len(w))
            pair_keys_l.append(ids[:-1] * _A + ids[1:])
            pair_w_l.append(_np.full(len(w) - 1, f, _np.int64))
        if pair_keys_l:
            pk = _np.concatenate(pair_keys_l)
            pw = _np.concatenate(pair_w_l)
            uniq, inv = _np.unique(pk, return_inverse=True)
            maxcnt = int(_np.bincount(inv, weights=pw).max())
            if maxcnt >= (1 << 24):
                return None

    # Pack words into rows of width C with SEP symbols between words
    # (freqs become per-LANE). One word per row wastes ~90% of the lanes
    # on real corpora (the row width is pinned by the longest
    # whitespace-free "word" — a whole JA sentence), and every refresh
    # sorts all lanes: the config-5 corpus went from 38M to ~3.7M lanes
    # with packing, which is also what lets the refresh program compile
    # on a v5e. SEP is alive (so no hole bridging across words) but all
    # its pairs are invalid, exactly like a row edge.
    maxw = max((len(w) for w, _ in words), default=1)
    C = -(-max(128, maxw + 1) // 128) * 128
    rows_syms, rows_freqs = [], []
    cur_s: list = []
    cur_f: list = []
    for w, f in words:
        ids = [char_id[c] for c in w]
        if cur_s and len(cur_s) + 1 + len(ids) > C:
            rows_syms.append(cur_s)
            rows_freqs.append(cur_f)
            cur_s, cur_f = [], []
        if cur_s:
            cur_s.append(SEP)
            cur_f.append(0.0)
        cur_s.extend(ids)
        cur_f.extend([float(f)] * len(ids))
    if cur_s:
        rows_syms.append(cur_s)
        rows_freqs.append(cur_f)
    R = len(rows_syms)
    mesh = dist.data_mesh("dp")
    Rp = dist.pad_rows(R, mesh)
    lo, hi = dist.local_row_range(Rp, mesh)
    L = C
    sym = np.full((hi - lo, C), -1, np.int32)
    freqs = np.zeros((hi - lo, C), np.float32)
    for i, ridx in enumerate(range(lo, min(hi, R))):
        s = rows_syms[ridx]
        sym[i, :len(s)] = s
        freqs[i, :len(s)] = rows_freqs[ridx]

    han = unicode_script.script_id("Han")
    hira = unicode_script.script_id("Hiragana")
    kata = unicode_script.script_id("Katakana")
    Lp = ts.max_sentencepiece_length
    # arrays sized U+1: the last slot is SEP (all-zero attrs, s_val
    # False => every pair with SEP is invalid)
    s_chr = np.zeros((U + 1, Lp), np.int32)
    s_len = np.zeros(U + 1, np.int32)
    s_wsp = np.zeros(U + 1, bool)
    s_wsi = np.zeros(U + 1, bool)
    s_scr = np.zeros(U + 1, np.int32)
    s_val = np.zeros(U + 1, bool)
    for c, i in char_id.items():
        cp = ord(c)
        s_len[i] = 1
        s_chr[i, 0] = cp
        s_wsp[i] = cp == 0x2581
        s_val[i] = cp not in (UNK_CHAR, 0, 9, 0x20)
        if cp == 0x2581:
            scr = SCRIPT_ANY
        else:
            scr = unicode_script.get_script(cp)
            if scr in (hira, kata) or cp == 0x30FC:
                scr = han
            if not ts.split_by_number and 0x30 <= cp <= 0x39:
                scr = SCRIPT_ANY
            if not ts.split_by_unicode_script:
                scr = SCRIPT_ANY
        s_scr[i] = scr

    lanes = (hi - lo) * L
    lane_cap = 1 << max(10, min(21, int(np.ceil(np.log2(max(lanes, 2))))))
    # Adaptive distinct-record budget: the refresh's buffers (and its
    # 3-operand cut sort) scale with dist_cap, so size it from the
    # corpus's MEASURED initial distinct-pair count (GLOBAL — identical
    # in every process layout) with 4x headroom for merge-created pair
    # types, instead of the lane worst case. config 5: 221k distinct ->
    # 2^20 instead of 2^21. Device-side overflow detection still guards
    # exactness (overflow -> engine declines, facade falls back).
    pair_set = set()
    for w, _ in words:
        prev = -1
        for c in w:
            cur = char_id[c]
            if prev >= 0:
                pair_set.add(prev * (U + 1) + cur)
            prev = cur
    init_distinct = max(len(pair_set), 1)
    auto_cap = 1 << max(17, (4 * init_distinct - 1).bit_length())
    dist_cap = min(auto_cap, lane_cap)
    dist_cap = int(os.environ.get("SPM_BPE_SPARSE_DIST_CAP", dist_cap))
    K = int(min(table_k, dist_cap // 2))  # keep K < ndev*dist_cap

    refresh, epoch = make_programs(
        universe=U + 1, n_merges=n_merges, max_piece_len=Lp, table_k=K,
        site_rows=site_rows, new_cap=new_cap, dist_cap=dist_cap,
        axis_name="dp", mesh=mesh)
    # full-width epoch for the early phase: big merges touch more rows
    # than site_rows (and create more distinct pairs than new_cap), and
    # post-fix those epochs correctly stop at one merge + refresh —
    # hours at scale. The driver dispatches this variant while
    # ST_REFRESH_STALE keeps firing; per-merge it pays one corpus-wide
    # sort instead (design.md rule 7/23 scale).
    Wl = hi - lo
    _, epoch_big = make_programs(
        universe=U + 1, n_merges=n_merges, max_piece_len=Lp, table_k=K,
        site_rows=max(Wl, 1), new_cap=min(max(new_cap, 8192), dist_cap),
        dist_cap=dist_cap, axis_name="dp", mesh=mesh)

    if os.environ.get("SPM_BPE_SPARSE_COMPILE_ONLY"):
        # Diagnostic / cache-prewarm mode: AOT-compile the two programs
        # (in the order the training loop would dispatch them) and stop.
        import sys
        import time as _time

        def _sd(a):
            return jax.ShapeDtypeStruct(a.shape, a.dtype)
        W = hi - lo
        print(f"[sparse-bpe] W={W} C={C} lanes={W * C} U={U} "
              f"dist_cap={dist_cap} K={K} Lp={Lp} new_cap={new_cap} "
              f"site_rows={site_rows}", file=sys.stderr, flush=True)
        trk_s = jax.ShapeDtypeStruct((W, C), np.bool_)
        args_r = (_sd(sym), trk_s, _sd(freqs), _sd(s_len), _sd(s_wsp),
                  _sd(s_wsi), _sd(s_scr), _sd(s_val), _sd(s_chr))
        only = os.environ.get("SPM_BPE_SPARSE_COMPILE_ONLY")
        if only in ("1", "refresh"):
            t0 = _time.time()
            lowered = refresh.lower(*args_r)
            print(f"[sparse-bpe] refresh lowered in {_time.time()-t0:.1f}s",
                  file=sys.stderr, flush=True)
            lowered.compile()
            print(f"[sparse-bpe] refresh compiled in {_time.time()-t0:.1f}s",
                  file=sys.stderr, flush=True)
        if only == "refresh":
            return None
        t_key_s = jax.ShapeDtypeStruct((K,), np.int32)
        t_cnt_s = jax.ShapeDtypeStruct((K,), np.float32)
        t_len_s = jax.ShapeDtypeStruct((K,), np.int32)
        t_chr_s = jax.ShapeDtypeStruct((K, Lp), np.int32)
        fl_s = (jax.ShapeDtypeStruct((), np.float32),
                jax.ShapeDtypeStruct((), np.int32),
                jax.ShapeDtypeStruct((Lp,), np.int32),
                jax.ShapeDtypeStruct((), np.int32),
                jax.ShapeDtypeStruct((), np.int32),   # w_key
                jax.ShapeDtypeStruct((), np.float32),  # w_cnt
                jax.ShapeDtypeStruct((), np.int32),   # w_len
                jax.ShapeDtypeStruct((Lp,), np.int32))  # w_chr
        args_e = ((_sd(sym), trk_s, _sd(freqs),
                   t_key_s, t_cnt_s, t_len_s, t_chr_s)
                  + fl_s
                  + (_sd(s_len), _sd(s_wsp), _sd(s_wsi), _sd(s_scr),
                     _sd(s_val), _sd(s_chr),
                     jax.ShapeDtypeStruct((n_merges,), np.int32),
                     jax.ShapeDtypeStruct((n_merges,), np.int32),
                     jax.ShapeDtypeStruct((n_merges,), np.float32),
                     jax.ShapeDtypeStruct((n_merges,), np.int32),
                     jax.ShapeDtypeStruct((n_merges, Lp), np.int32),
                     jax.ShapeDtypeStruct((), np.int32),
                     jax.ShapeDtypeStruct((), np.int32),
                     jax.ShapeDtypeStruct((), np.bool_),
                     jax.ShapeDtypeStruct((), np.bool_)))
        t0 = _time.time()
        lowered = epoch.lower(*args_e)
        print(f"[sparse-bpe] epoch lowered in {_time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        lowered.compile()
        print(f"[sparse-bpe] epoch compiled in {_time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        raise SystemExit(0)  # probe mode: never fall through to training

    with profiling.phase("bpe_upload_corpus"):
        sym_d = dist.put_sharded(sym, mesh)
        tracked_d = dist.put_sharded(init_tracked(sym), mesh)
        freqs_d = dist.put_sharded(freqs, mesh)
    rep = lambda x: dist.put_replicated(x, mesh)
    s_len_d, s_wsp_d, s_wsi_d = rep(s_len), rep(s_wsp), rep(s_wsi)
    s_scr_d, s_val_d, s_chr_d = rep(s_scr), rep(s_val), rep(s_chr)
    ml = rep(np.full(n_merges, -1, np.int32))
    mr = rep(np.full(n_merges, -1, np.int32))
    mf = rep(np.zeros(n_merges, np.float32))
    e_len = rep(np.zeros(n_merges, np.int32))
    e_chr = rep(np.full((n_merges, Lp), 0x7FFFFFFF, np.int32))
    next_id = rep(np.int32(A))
    k_done = rep(np.int32(0))

    st = _SparseState()
    st.refresh, st.epoch = refresh, epoch
    st.epoch_big = epoch_big
    st.sym_d, st.tracked_d, st.freqs_d = sym_d, tracked_d, freqs_d
    st.s_len_d, st.s_wsp_d, st.s_wsi_d = s_len_d, s_wsp_d, s_wsi_d
    st.s_scr_d, st.s_val_d, st.s_chr_d = s_scr_d, s_val_d, s_chr_d
    st.ml, st.mr, st.mf, st.e_len, st.e_chr = ml, mr, mf, e_len, e_chr
    st.next_id, st.k_done = next_id, k_done
    st.chars, st.A, st.mesh, st.rep = chars, A, mesh, rep
    st.n_merges = n_merges
    st.n_lanes = sym.size * mesh.size
    return st


def train_device_bpe_sparse(trainer, n_merges: int,
                            table_k: int = 8192,
                            site_rows: int = 2048,
                            new_cap: int = 1024):
    """Host driver for the sparse active-table engine. Returns merged
    piece strings in merge order, or None when the config cannot run on
    device."""
    from ..utils import profiling

    st = prepare_sparse_engine(trainer, n_merges, table_k, site_rows,
                               new_cap)
    if st is None:
        return None
    refresh, epoch = st.refresh, st.epoch
    epoch_big = st.epoch_big
    sym_d, tracked_d, freqs_d = st.sym_d, st.tracked_d, st.freqs_d
    s_len_d, s_wsp_d, s_wsi_d = st.s_len_d, st.s_wsp_d, st.s_wsi_d
    s_scr_d, s_val_d, s_chr_d = st.s_scr_d, st.s_val_d, st.s_chr_d
    ml, mr, mf, e_len, e_chr = st.ml, st.mr, st.mf, st.e_len, st.e_chr
    next_id, k_done = st.next_id, st.k_done
    chars, A, rep = st.chars, st.A, st.rep

    # Dispatch WAVES of epochs between host readbacks: on the tunneled
    # rig the first device->host readback permanently degrades later
    # dispatch latency (~1.2 s each, design.md rule 5), so reading
    # status/overflow after every epoch made the wall time sync-bound.
    # r5 change: the table state is THREADED between epochs and a
    # refresh runs only when an epoch reports ST_REFRESH (the r4
    # driver refreshed unconditionally before every epoch — ~E_CAP/R
    # times more refreshes than the floor/append logic requires).
    # Epochs dispatched after an in-wave ST_REFRESH are harmless
    # no-ops: their first pop hits the floor guard and exits without
    # applying anything; their stats are discarded below.
    wave = max(1, int(os.environ.get("SPM_BPE_SPARSE_WAVE", "8")))
    import sys as _sys
    import time as _time
    verbose = os.environ.get("SPM_BPE_SPARSE_VERBOSE") == "1"
    t_start = _time.time()
    if verbose:
        print(f"[sparse-bpe] entering wave loop (wave={wave})",
              file=_sys.stderr, flush=True)
    use_w_t = rep(np.ones((), np.bool_))
    use_w_f = rep(np.zeros((), np.bool_))
    tbl_ok = use_w_t
    prev_k, stalls = -1, 0
    done = False
    need_refresh = True
    # early-phase program selection: big merges overflow the compacted
    # site-row/new-pair caps (ST_REFRESH_STALE); dispatch the
    # full-width epoch until an epoch completes without staleness
    stale_mode = True
    it = 0
    # runaway guard only: no-op epochs (post-overflow stale, or
    # post-floor) count iterations, so the bound scales with the wave;
    # real non-progress is caught by the stall counter
    it_cap = wave * (n_merges + 16)
    t_phase = _time.time()
    while not done and it < it_cap:
        stats = []
        overflow_d = None
        for _ in range(wave):
            it += 1
            if need_refresh:
                (t_key, t_cnt, t_len, t_chr, fl_cnt, fl_len, fl_chr,
                 fl_key, w_key, w_cnt, w_len, w_chr,
                 overflow_d) = refresh(sym_d, tracked_d, freqs_d,
                                       s_len_d, s_wsp_d, s_wsi_d,
                                       s_scr_d, s_val_d, s_chr_d)
                use_w = use_w_t
                tbl_ok = use_w_t
                need_refresh = False
            ep = epoch_big if stale_mode else epoch
            out = ep(sym_d, tracked_d, freqs_d, t_key, t_cnt, t_len,
                     t_chr, fl_cnt, fl_len, fl_chr, fl_key,
                     w_key, w_cnt, w_len, w_chr,
                     s_len_d, s_wsp_d, s_wsi_d, s_scr_d, s_val_d,
                     s_chr_d, ml, mr, mf, e_len, e_chr, next_id,
                     k_done, use_w, tbl_ok)
            (sym_d, tracked_d, t_key, t_cnt, t_len, t_chr, s_len_d,
             s_wsp_d, s_wsi_d, s_scr_d, s_val_d, s_chr_d, ml, mr, mf,
             e_len, e_chr, next_id, k_done, status, tbl_ok) = out
            use_w = use_w_f
            stats.append((overflow_d, status, k_done))
            overflow_d = None
        if verbose:
            print(f"[sparse-bpe] it={it} k={int(np.asarray(k_done))}"
                  f"/{n_merges} {_time.time() - t_start:.0f}s",
                  file=_sys.stderr, flush=True)
        # phase accounting: wave 1 pays lowering + compile (cache miss)
        pk = ("bpe_first_wave_incl_compile" if it <= wave
              else "bpe_merge_waves")
        profiling._totals[pk] = (profiling._totals.get(pk, 0.0)
                                 + _time.time() - t_phase)
        t_phase = _time.time()
        # one sync for the whole wave
        for overflow, status, k_d in stats:
            if overflow is not None and bool(np.asarray(overflow)):
                return None  # distinct pairs exceed the shard cap
            stat = int(np.asarray(status))
            k_now = int(np.asarray(k_d))
            if stat in (ST_DONE, ST_NO_PAIRS):
                done = True
                break
            if stat in (ST_REFRESH, ST_REFRESH_STALE):
                # epochs after this one were no-ops (floor exits
                # re-derive their guard; stale exits start ST_REFRESH
                # via the threaded tbl_ok flag); refresh and go on
                stale_mode = stat == ST_REFRESH_STALE
                stalls = stalls + 1 if k_now == prev_k else 0
                prev_k = k_now
                need_refresh = True
                break
            stale_mode = False
            stalls = stalls + 1 if k_now == prev_k else 0
            prev_k = k_now
            if stalls >= 3:  # no merges across refreshes: give up
                done = True
                break
        else:
            continue
        if stalls >= 3:
            done = True
    ml_h = np.asarray(ml)
    mr_h = np.asarray(mr)
    strings = list(chars) + [None] * n_merges
    out_strings = []
    for k in range(n_merges):
        if ml_h[k] < 0:
            break
        s = strings[ml_h[k]] + strings[mr_h[k]]
        strings[A + k] = s
        out_strings.append(s)
    return out_strings
