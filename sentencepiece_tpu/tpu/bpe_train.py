# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Device BPE training: segmented pair-count + merge loop on the mesh.

TPU-native form of the reference BPE trainer's inner machinery
(bpe_model_trainer.cc): the lazily-maintained pair-position sets and
active-symbol heap become, per merge step,

  1. a dense pair-count histogram over the (growing) symbol universe,
     scatter-added from every TRACKED adjacent pair in the corpus shard —
     a persistent per-lane mask replicating the reference's
     ComputeFreq position-set semantics exactly (overlap dedup at
     creation, permanent forgetting of overlap-skipped occurrences,
     re-adds only for merged-symbol pairs, dup pops erase positions;
     see tpu/bpe_train_sparse.py's module docstring for the argument);
  2. `jax.lax.psum` of the histogram over the data-parallel mesh axis (the
     multi-host reduction of SURVEY.md §2.9: corpus sharded by words,
     merge decisions replicated);
  3. argmax with exact integer-safe tie-breaks (freq desc, then combined
     length asc, then smallest pair key) over a validity matrix derived
     from per-symbol attributes — length, whitespace structure, and
     unicode-script class (the IsValidSentencePiece rules,
     trainer_interface.cc:178-267);
  4. vectorized merge application at non-overlapping occurrences plus a
     compaction so adjacency stays position+1.

The merge SEQUENCE (l, r universe ids per step) is the only readback;
piece strings are reconstructed on the host. Tie-breaks replicate the
reference comparator exactly (bpe_model_trainer.cc:240-254): freq desc,
then merged length asc, then lexicographic order of the merged string —
the lex pass compares per-symbol codepoint tables position by position
(UTF-8 byte order equals codepoint order, so codepoint lex == ToString()
lex) and is `cond`-gated so it only runs on actual (freq, len) ties.

Documented deviation from the reference: selection is a GLOBAL argmax —
the reference restricts candidates to its active set, whose
equal-frequency cutoff depends on libstdc++ container internals
(host-only state; measured divergence point:
scripts/oracle_bpe_active_set.py, docs/conformance.md). Universe
(alphabet + merges) is bounded by the dense histogram to ~4k symbols;
bigger runs use the sparse active-table engine (tpu/bpe_train_sparse.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import trie

SCRIPT_ANY = -1
SCRIPT_MIXED = -2


@functools.partial(
    jax.jit,
    static_argnames=("universe", "n_merges", "max_piece_len", "axis_name"))
def bpe_train_merges(sym0, tracked0, freqs, first_new_id, sym_len0,
                     sym_ws_prefix0, sym_ws_inner0, sym_script0,
                     sym_valid0, sym_chars0, *,
                     universe: int, n_merges: int, max_piece_len: int,
                     axis_name: Optional[str] = None):
    """Run the merge loop. Returns (merge_l, merge_r, merge_freq) arrays of
    length n_merges; entries are -1 / 0 once no valid pair remains, and
    (-2, -2) for steps that popped a duplicate piece string (skipped
    without applying, like the reference's dup pop).

    sym0 int32[W, L]: per-char symbol ids (-1 pad); tracked0 bool[W, L]:
    the load-time tracked-position mask (bpe_train_sparse.init_tracked)
    — pair frequency is the sum over TRACKED lanes, replicating the
    reference's ComputeFreq position-set semantics (overlap-skipped
    occurrences are permanently forgotten; see
    tpu/bpe_train_sparse.py's module docstring). freqs f32[W];
    first_new_id: universe id assigned to the first merge product.
    Per-symbol attribute vectors are sized [universe];
    sym_chars0 int32[universe, max_piece_len]: codepoints (0 pad) — the
    lex tie-break table.
    """
    W, L = sym0.shape
    U = universe
    Lp = max_piece_len
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]

    def histogram(sym, tracked):
        nxt_sym = jnp.concatenate(
            [sym[:, 1:], jnp.full((W, 1), -1, sym.dtype)], axis=1)
        counted = tracked & (sym >= 0) & (nxt_sym >= 0)
        key = jnp.where(counted, sym * U + nxt_sym, U * U)
        w = jnp.broadcast_to(freqs[:, None], (W, L))
        flat_key = jax.lax.optimization_barrier(key.reshape(-1))
        flat_w = jax.lax.optimization_barrier(
            jnp.where(counted, w, 0.0).reshape(-1))
        counts = jnp.zeros(U * U + 1, jnp.float32).at[flat_key].add(
            flat_w, mode="drop")
        return jax.lax.optimization_barrier(counts[:U * U])

    def step(carry, _):
        (sym, tracked, s_len, s_wsp, s_wsi, s_scr, s_val, s_chr,
         next_id) = carry
        counts = histogram(sym, tracked)
        if axis_name is not None:
            # pair counts are integer-valued float32 (sums of integer word
            # freqs), so psum is order-exact below 2^24 — the merge
            # sequence is independent of the process topology
            counts = jax.lax.psum(counts, axis_name)
        len_l = s_len[:, None]
        len_r = s_len[None, :]
        ok = (s_val[:, None] & s_val[None, :]
              & ((len_l + len_r) <= max_piece_len)
              # '▁' allowed only as piece prefix (prefix mode,
              # split_by_whitespace=true; trainer_interface.cc:222-240)
              & ~s_wsi[:, None] & ~s_wsp[None, :] & ~s_wsi[None, :])
        scr_l = s_scr[:, None]
        scr_r = s_scr[None, :]
        compat = (((scr_l == SCRIPT_ANY) | (scr_r == SCRIPT_ANY)
                   | (scr_l == scr_r))
                  & (scr_l != SCRIPT_MIXED) & (scr_r != SCRIPT_MIXED))
        ok = (ok & compat).reshape(-1)
        cnt2 = jnp.where(ok, counts, 0.0)
        # exact reference tie-break (bpe_model_trainer.cc:240-254), in
        # passes (single-pass composites lose integer precision in
        # float32): freq desc -> merged length asc -> merged-string lex
        m = jnp.max(cnt2)
        at_max = cnt2 >= m
        pair_len = (len_l + len_r).reshape(-1)
        neg_len = jnp.where(at_max, -pair_len.astype(jnp.float32), -jnp.inf)
        best_len = -jnp.max(neg_len)
        tie = at_max & (pair_len.astype(jnp.float32) == best_len)

        def lex_refine(mask):
            # among equal-(freq, total-length) pairs, keep the ones whose
            # merged codepoint string is lexicographically smallest; all
            # candidates share a total length, so scanning the first
            # max_piece_len concat positions fully orders them
            mask2 = mask.reshape(U, U)
            chars_t = s_chr.T  # [Lp, U]

            def body(j, mk):
                from_l = j < s_len  # [U] per left symbol
                idx_r = jnp.clip(j - s_len, 0, Lp - 1)
                cr = jax.lax.optimization_barrier(
                    chars_t[idx_r, :])  # [U, U]: [l, r] = chars[r, j-len_l]
                c = jnp.where(from_l[:, None], s_chr[:, j][:, None], cr)
                c = jnp.where(mk, c, jnp.int32(0x7FFFFFFF))
                return mk & (c == jnp.min(c))

            return jax.lax.fori_loop(0, Lp, body, mask2).reshape(-1)

        n_tied = jnp.sum(tie)
        tie = jax.lax.cond(n_tied > 1, lex_refine, lambda t: t, tie)
        best = jnp.argmax(tie).astype(jnp.int32)  # first survivor
        active = m > 0.5
        bl = best // U
        br = best % U

        # merged codepoints: chars[bl] ++ chars[br], 0-padded
        jpos = jnp.arange(Lp, dtype=jnp.int32)
        idx_r = jnp.clip(jpos - s_len[bl], 0, Lp - 1)
        merged = jnp.where(jpos < s_len[bl], s_chr[bl],
                           jnp.where(jpos < s_len[bl] + s_len[br],
                                     s_chr[br][idx_r], 0))
        mlen = s_len[bl] + s_len[br]
        # dup piece string: the reference pops it, erases the symbol WITH
        # its tracked positions, applies nothing (train/bpe.py:341-345)
        uid = jnp.arange(U, dtype=jnp.int32)
        prior = (uid >= first_new_id) & (uid < next_id)
        isdup = active & jnp.any(prior & (s_len == mlen)
                                 & jnp.all(s_chr == merged[None, :],
                                           axis=1))
        nxt_sym = jnp.concatenate(
            [sym[:, 1:], jnp.full((W, 1), -1, sym.dtype)], axis=1)
        pairhere = tracked & (sym == bl) & (nxt_sym == br)
        tracked = jnp.where(isdup, tracked & ~pairhere, tracked)
        applying = active & ~isdup
        # tracked lanes are already overlap-deduped (non-overlapping by
        # construction), so every tracked occurrence applies
        apply = applying & pairhere
        sym = jnp.where(apply, next_id, sym)
        kill = jnp.concatenate(
            [jnp.zeros((W, 1), bool), apply[:, :-1]], axis=1)
        sym = jnp.where(kill, -1, sym)
        # a lane's tracking dies when its symbol or partner changes:
        # apply sites (new symbol) and their LEFT neighbors (partner now
        # the merged symbol); killed lanes drop in the compaction;
        # re-adds happen below
        next_apply = jnp.concatenate(
            [apply[:, 1:], jnp.zeros((W, 1), bool)], axis=1)
        tracked = tracked & ~apply & ~next_apply
        # compact so adjacency stays +1 (tracked rides along)
        alive = sym >= 0
        tgt = jnp.cumsum(alive, axis=1, dtype=jnp.int32) - 1
        rows = jnp.arange(W, dtype=jnp.int32)[:, None]
        new_sym = jnp.full((W, L + 1), -1, jnp.int32)
        new_sym = trie._scatter_set(
            new_sym, jnp.broadcast_to(rows, (W, L)),
            jnp.where(alive, tgt, L), jnp.where(alive, sym, -1))
        new_trk = jnp.zeros((W, L + 1), jnp.int32)
        new_trk = trie._scatter_set(
            new_trk, jnp.broadcast_to(rows, (W, L)),
            jnp.where(alive, tgt, L), tracked.astype(jnp.int32))
        sym = new_sym[:, :L]
        tracked = new_trk[:, :L].astype(jnp.bool_)
        # re-track the merged symbol's new pairs ((x,new),(new,y)) with
        # chain dedup at creation — the reference's _add_new_pair +
        # first-ComputeFreq (see bpe_train_sparse.py's module docstring)
        nxt2 = jnp.concatenate(
            [sym[:, 1:], jnp.full((W, 1), -1, sym.dtype)], axis=1)
        cand = applying & ((sym == next_id) | (nxt2 == next_id)) \
            & (sym >= 0) & (nxt2 >= 0)
        keyl = sym * U + nxt2
        prev_cand = jnp.concatenate(
            [jnp.zeros((W, 1), bool), cand[:, :-1]], axis=1)
        prev_key = jnp.concatenate(
            [jnp.full((W, 1), -2, keyl.dtype), keyl[:, :-1]], axis=1)
        cont = cand & prev_cand & (prev_key == keyl)
        cc = jnp.cumsum(cand, axis=1, dtype=jnp.int32)
        start_mark = jnp.where(cand & ~cont, cc, 0)
        seg_base = jax.lax.associative_scan(jnp.maximum, start_mark, axis=1)
        keep_new = cand & ((cc - seg_base) % 2 == 0)
        tracked = jnp.where(cand, keep_new, tracked)

        s_len = s_len.at[next_id].set(jnp.where(applying, mlen, 0))
        s_wsp = s_wsp.at[next_id].set(jnp.where(applying, s_wsp[bl], False))
        s_wsi = s_wsi.at[next_id].set(
            jnp.where(applying, s_wsi[bl] | s_wsp[br] | s_wsi[br], False))
        new_scr = jnp.where(
            s_scr[bl] == SCRIPT_ANY, s_scr[br],
            jnp.where(s_scr[br] == SCRIPT_ANY, s_scr[bl],
                      jnp.where(s_scr[bl] == s_scr[br], s_scr[bl],
                                SCRIPT_MIXED)))
        s_scr = s_scr.at[next_id].set(jnp.where(applying, new_scr, 0))
        s_val = s_val.at[next_id].set(applying)
        s_chr = s_chr.at[next_id].set(jnp.where(applying, merged, 0))
        out = (jnp.where(applying, bl, jnp.where(isdup, -2, -1)),
               jnp.where(applying, br, jnp.where(isdup, -2, -1)),
               jnp.where(applying, m, 0.0))
        return ((sym, tracked, s_len, s_wsp, s_wsi, s_scr, s_val, s_chr,
                 next_id + jnp.where(applying, 1, 0)), out)

    carry0 = (sym0, tracked0, sym_len0, sym_ws_prefix0, sym_ws_inner0,
              sym_script0, sym_valid0, sym_chars0,
              jnp.asarray(first_new_id, jnp.int32))
    (_, (ml, mr, mf)) = jax.lax.scan(step, carry0, None, length=n_merges)
    return ml, mr, mf


def train_device_bpe(trainer, n_merges: int):
    """Host driver: build char symbols + attributes, run the device loop
    over the mesh, reconstruct merged piece strings in merge order."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from ..train.interface import UNK_CHAR
    from ..utils import unicode_script
    from .. import distributed as dist

    words = trainer.sentences
    ts = trainer.trainer_spec
    # alphabet = chars of the corpus, universe ids 0..A-1 (every process
    # derives it from the full word list, so it is identical everywhere)
    chars = sorted({c for w, _ in words for c in w})
    char_id = {c: i for i, c in enumerate(chars)}
    A = len(chars)
    U = A + n_merges
    if U >= 4096:
        return None  # dense histogram too large; host engine instead

    W = len(words)
    L = max((len(w) for w, _ in words), default=1)
    # per-process corpus shard (SURVEY.md §2.9)
    mesh = dist.data_mesh("dp")
    Wp = dist.pad_rows(W, mesh)
    lo, hi = dist.local_row_range(Wp, mesh)
    sym = np.full((hi - lo, L), -1, np.int32)
    freqs = np.zeros(hi - lo, np.float32)
    for i, (w, f) in enumerate(words[lo:min(hi, W)]):
        sym[i, :len(w)] = [char_id[c] for c in w]
        freqs[i] = f

    han = unicode_script.script_id("Han")
    hira = unicode_script.script_id("Hiragana")
    kata = unicode_script.script_id("Katakana")
    Lp = ts.max_sentencepiece_length
    s_chr = np.zeros((U, Lp), np.int32)
    s_len = np.zeros(U, np.int32)
    s_wsp = np.zeros(U, bool)
    s_wsi = np.zeros(U, bool)
    s_scr = np.zeros(U, np.int32)
    s_val = np.zeros(U, bool)
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

    from .bpe_train_sparse import init_tracked

    sym_d = dist.put_sharded(sym, mesh)
    tracked_d = dist.put_sharded(init_tracked(sym), mesh)
    freqs_d = dist.put_sharded(freqs, mesh)

    import functools as ft

    @jax.jit
    @ft.partial(shard_map, mesh=mesh,
                in_specs=(P("dp"), P("dp"), P("dp"), P(), P(), P(), P(),
                          P(), P(), P()),
                out_specs=(P(), P(), P()), check_vma=False)
    def run(sym_s, trk_s, freqs_s, fni, sl, swp, swi, ssc, sva, sch):
        return bpe_train_merges(
            sym_s, trk_s, freqs_s, fni, sl, swp, swi, ssc, sva, sch,
            universe=U, n_merges=n_merges,
            max_piece_len=Lp, axis_name="dp")

    ml, mr, mf = run(sym_d, tracked_d, freqs_d,
                     dist.put_replicated(np.int32(A), mesh),
                     dist.put_replicated(s_len, mesh),
                     dist.put_replicated(s_wsp, mesh),
                     dist.put_replicated(s_wsi, mesh),
                     dist.put_replicated(s_scr, mesh),
                     dist.put_replicated(s_val, mesh),
                     dist.put_replicated(s_chr, mesh))
    ml = np.asarray(ml)
    mr = np.asarray(mr)
    # reconstruct strings (-2 entries are dup pops: skipped, no new id)
    strings = list(chars) + [None] * n_merges
    out = []
    j = 0
    for k in range(n_merges):
        if ml[k] == -2:
            continue
        if ml[k] < 0:
            break
        s = strings[ml[k]] + strings[mr[k]]
        strings[A + j] = s
        j += 1
        out.append(s)
    return out
