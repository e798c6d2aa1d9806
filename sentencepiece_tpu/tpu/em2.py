# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Packed single-program unigram EM (v2 device engine).

TPU-native re-expression of the reference E-step thread pool
(unigram_model_trainer.cc:237-287), rebuilt from the r5 on-chip
measurements (scripts/probe_sparse_ops.py, scripts/probe_em_chip.py):

  * the r4 engine (tpu/em.py) dispatched ~17 bucket-shaped programs per
    sub-iteration and uploaded a DENSE (W, P, K) candidate lattice
    (~220 MB at BASELINE config 5, 8x again in HBM from the K=16 minor
    tiling, design.md rule 10) — on the tunneled rig the upload and the
    per-program first-execution costs dominated the training wall (r4:
    44.7 s of em_round; measured 2026-08-20: up to 200 s on a slow-wire
    day);
  * v2 packs all words into rows (a boundary lane after each word — the
    poisoned-separator idea of the sparse BPE packer, design.md rule
    11), in at most two width classes (128 + one for the longest
    words), so a whole EM round — both sub-iterations, E and M — is ONE
    program, ONE dispatch, ONE readback;
  * lattice arrays keep the row axis minor / col axis 128-aligned
    ([C, K, R] scan inputs, [R, C] planes), so nothing pays the 8x
    K-minor tiling of the old layout;
  * the two serial-rate table ops of the E-step — the per-lane score
    gather scores[lat_id] and the expected[] scatter-add — lower on
    this TPU to a ~7 ns/element scalar loop over every LANE (43M at
    config 5; ~0.3 s each per sub-iteration, design.md rule 7). v2
    routes both through the CANDIDATE STREAM instead (13M entries at
    config 5): the host uploads candidates SORTED BY PIECE ID with
    precomputed destination lanes, so scores broadcast per segment
    with a num_seed-sized scatter + a log-depth propagate, land in the
    lattice via ONE 13M-entry scatter, and marginals come back via ONE
    13M-entry gather + a segmented scan whose boundaries are static
    host data. No runtime sorts at all — a 43M-lane lax.sort costs
    ~8 min of TPU compile (the rule-14 compile bomb, remeasured r5),
    while these scatter/gathers compile instantly and run at ~0.1 s;
  * total upload is ~65 MB at config 5 (candidate dests + per-lane
    flags/freqs) instead of ~220 MB.

Float contract: identical per-lane arithmetic to tpu/em.py (logsumexp
window order, digamma M-step); the expected[] accumulation order is
the id-sorted candidate order within each shard instead of flat lane
order, via a log-depth segmented scan — both deviate from the
host-exact engine's sequential chains the same way, and the artifact
is repaired by the exact-finish replay (train/unigram.py). UNK routing
replicates em._node_scores: a len-1 lane with no surviving single-char
piece scores min_score-10 and its marginal mass accumulates to
expected[0].
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .em import fixed_order_psum

NEG_INF = -1e30
K_UNK_PENALTY = 10.0

F_START = 1    # word's first char col
F_ZEND = 2     # boundary col just past a word's last char
F_INWORD = 4   # char cols


# --------------------------------------------------------------------------
# host: global packing plan + per-shard arrays
# --------------------------------------------------------------------------

def plan_packing(words: List[Tuple[str, int]], c_main: int = 128):
    """Global packing plan: word -> (class, row, col), identical in
    every process layout. A word of L chars takes L+1 lanes (chars +
    boundary)."""
    maxw = max((len(w) for w, _ in words), default=1)
    classes = [c_main]
    if maxw + 1 > c_main:
        classes.append(-(-(maxw + 1) // 128) * 128)
    placements: List[list] = [[] for _ in classes]
    cur_row = [0] * len(classes)
    cur_col = [0] * len(classes)
    for wi, (w, _f) in enumerate(words):
        L = len(w)
        if L == 0:
            continue
        cls = 0 if L + 1 <= c_main else 1
        C = classes[cls]
        if cur_col[cls] + L + 1 > C:
            cur_row[cls] += 1
            cur_col[cls] = 0
        placements[cls].append((wi, cur_row[cls], cur_col[cls]))
        cur_col[cls] += L + 1
    n_rows = [cur_row[c] + (1 if placements[c] else 0)
              for c in range(len(classes))]
    return classes, n_rows, placements


def build_shard_arrays(words, csr, K: int, num_seed: int, classes,
                      placements, row_lo, row_hi):
    """Numpy arrays for one shard (vectorized; no per-candidate Python
    loop).

    Returns (flags u8 [R,C] per class, freq f32 [R,C] per class,
    dest int32 [n_cand] — lattice lane per candidate, candidates
    SORTED BY (sid, dest) — and seg_pos int32 [num_seed+1]: first
    stream index of piece j's candidates, -1 when absent).

    Lane numbering concatenates classes; class ci is [R, K, C]
    flattened (lane = base + (r*K + len-1)*C + col).
    """
    cand_off = np.asarray(csr[0], np.int64)
    cand_pos = np.asarray(csr[1], np.int64)
    cand_len = np.asarray(csr[2], np.int64)
    cand_sid = np.asarray(csr[3], np.int64)
    wfreq = np.fromiter((f for _, f in words), np.float32, len(words))
    wlen = np.fromiter((len(w) for w, _ in words), np.int64, len(words))
    flags_l, freq_l = [], []
    dest_parts, sid_parts = [], []
    lane_base = 0
    for cls, C in enumerate(classes):
        lo, hi = row_lo[cls], row_hi[cls]
        R = hi - lo
        flags = np.zeros((R, C), np.uint8)
        freq = np.zeros((R, C), np.float32)
        pl = placements[cls]
        p = np.asarray(pl, np.int64).reshape(-1, 3) if pl else \
            np.zeros((0, 3), np.int64)
        if len(p):
            p = p[(p[:, 1] >= lo) & (p[:, 1] < hi)]
        if len(p):
            wi, row, col = p[:, 0], p[:, 1] - lo, p[:, 2]
            L = wlen[wi]
            tot = int(L.sum())
            rep_row = np.repeat(row, L)
            rep_col = np.repeat(col, L) + (
                np.arange(tot, dtype=np.int64)
                - np.repeat(np.cumsum(L) - L, L))
            flat = rep_row * C + rep_col
            flags.reshape(-1)[flat] |= F_INWORD
            freq.reshape(-1)[flat] = np.repeat(wfreq[wi], L)
            flags[row, col] |= F_START
            flags[row, col + L] |= F_ZEND
            freq[row, col + L] = wfreq[wi]
            nc = cand_off[wi + 1] - cand_off[wi]
            ctot = int(nc.sum())
            if ctot:
                base = np.repeat(cand_off[wi], nc)
                ci = base + (np.arange(ctot, dtype=np.int64)
                             - np.repeat(np.cumsum(nc) - nc, nc))
                crow = np.repeat(row, nc)
                ccol = np.repeat(col, nc) + cand_pos[ci]
                clen = cand_len[ci]
                csid = cand_sid[ci]
                d = lane_base + (crow * K + clen - 1) * C + ccol
                dest_parts.append(d)
                sid_parts.append(csid)
        flags_l.append(flags)
        freq_l.append(freq)
        lane_base += R * K * C
    if dest_parts:
        dest = np.concatenate(dest_parts)
        sids = np.concatenate(sid_parts)
        # single int64 composite key instead of a 2-key lexsort (the
        # lexsort was the em_pack hot spot: ~1 s at config-5 scale);
        # keys are unique (dest is), so the order is total
        key = sids * np.int64(lane_base + 2) + dest
        order = np.argsort(key)
        dest = dest[order].astype(np.int32)
        sids = sids[order]
        first = np.concatenate(
            [[0], 1 + np.nonzero(sids[1:] != sids[:-1])[0]])
        seg_pos = np.full(num_seed + 1, -1, np.int32)
        seg_pos[sids[first]] = first.astype(np.int32)
    else:
        dest = np.zeros(0, np.int32)
        seg_pos = np.full(num_seed + 1, -1, np.int32)
    return flags_l, freq_l, dest, seg_pos


# --------------------------------------------------------------------------
# device: scan kernels
# --------------------------------------------------------------------------

def _propagate_last(vals, have, init):
    """Each position takes the most recent have-value (inclusive);
    init where none yet. Last-wins segment combinator."""
    def comb(a, b):
        av, ah = a
        bv, bh = b
        return jnp.where(bh, bv, av), ah | bh
    v, h = jax.lax.associative_scan(comb, (vals, have), axis=0)
    return jnp.where(h, v, init)


def _fwd_scan(sc_end_x, is_start_x, K):
    """alpha over cols. sc_end_x f32[C, K, R] (score of the len-j+1
    piece ENDING at col c); is_start_x bool[C, R]. -> alpha f32[C, R]."""
    R = sc_end_x.shape[2]
    win0 = jnp.full((K, R), NEG_INF, jnp.float32)

    def step(win, xs):
        se, st = xs
        a_c = jax.nn.logsumexp(win + se, axis=0)
        a_c = jnp.where(st, 0.0, a_c)
        win = jnp.concatenate([a_c[None, :], win[:K - 1]], axis=0)
        return win, a_c

    _, alpha = jax.lax.scan(step, win0, (sc_end_x, is_start_x))
    return alpha


def _bwd_scan(sc_x, is_zend_x, K):
    """beta over cols, right-to-left. sc_x f32[C, K, R] (score of the
    len-j+1 piece STARTING at col c). -> beta f32[C, R]."""
    R = sc_x.shape[2]
    win0 = jnp.full((K, R), NEG_INF, jnp.float32)

    def step(win, xs):
        se, zn = xs
        b_c = jax.nn.logsumexp(win + se, axis=0)
        b_c = jnp.where(zn, 0.0, b_c)
        win = jnp.concatenate([b_c[None, :], win[:K - 1]], axis=0)
        return win, b_c

    _, beta = jax.lax.scan(step, win0, (sc_x, is_zend_x), reverse=True)
    return beta


def _vit_scan(sc_end_x, is_start_x, is_zend_x, K):
    """Viterbi num_tokens: max scan carrying a token-count window (no
    backtrace). Tie -> largest piece length (matches em.py)."""
    R = sc_end_x.shape[2]
    win0 = jnp.full((K, R), NEG_INF, jnp.float32)
    twin0 = jnp.zeros((K, R), jnp.int32)

    def step(st, xs):
        win, twin, acc = st
        se, sst, zn = xs
        cand = win + se
        rev = cand[::-1]
        am = jnp.argmax(rev, axis=0)
        best = jnp.take_along_axis(rev, am[None, :], axis=0)[0]
        tok = jnp.take_along_axis(twin[::-1], am[None, :], axis=0)[0] + 1
        best = jnp.where(sst, 0.0, best)
        tok = jnp.where(sst, 0, tok)
        acc = acc + jnp.sum(jnp.where(zn, tok, 0))
        win = jnp.concatenate([best[None, :], win[:K - 1]], axis=0)
        twin = jnp.concatenate([tok[None, :], twin[:K - 1]], axis=0)
        return (win, twin, acc), None

    (_, _, acc), _ = jax.lax.scan(
        step, (win0, twin0, jnp.int32(0)), (sc_end_x, is_start_x,
                                            is_zend_x))
    return acc


# --------------------------------------------------------------------------
# device: one EM round (n_sub sub-iterations, E+M), single program
# --------------------------------------------------------------------------

def make_round_fn(shapes, K: int, num_seed: int, n_sub: int,
                  axis_name, mesh, collective: bool = True):
    """One EM round as a single dispatch.

    round(scores, alive, dest, seg_pos, *flags, *freqs) ->
        (scores', alive', expected_last, obj[n_sub], ntok[n_sub])

    shapes are PER-SHARD (R, C) per class; dest/seg_pos/flags/freqs
    shard over the mesh axis, scores/alive replicate.

    ``collective=False`` builds the measurement twin used by
    bench_scaling.py: the same program with the psum/all_gather
    removed (per-shard outputs, leading shard axis) — full minus
    local isolates the collective's per-step cost.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    NCLS = len(shapes)
    lanes = sum(R * K * C for (R, C) in shapes)
    eff_axis = axis_name if collective else None

    def sub_iter(scores_c, alive_c, dest, seg_pos, flags, freqs):
        n_cand = dest.shape[0]
        # scores/alive are replicated, so the min needs no collective
        min_score = jnp.min(jnp.where(alive_c, scores_c, jnp.inf))
        unk_score = min_score - K_UNK_PENALTY
        masked = jnp.where(alive_c, scores_c, jnp.float32(NEG_INF))

        # ---- scores -> candidate stream -> lattice lanes ----
        seg_ids = jnp.arange(num_seed + 1, dtype=jnp.int32)
        seg_vals = masked[jnp.clip(seg_ids, 0, num_seed - 1)]
        have = seg_pos >= 0
        pos = jnp.where(have, seg_pos, n_cand)
        buf = jnp.full((n_cand,), NEG_INF, jnp.float32)
        buf = buf.at[pos].set(jnp.where(have, seg_vals, NEG_INF),
                              mode="drop")
        bhave = jnp.zeros((n_cand,), jnp.bool_)
        bhave = bhave.at[pos].set(have, mode="drop")
        stream_sc = _propagate_last(buf, bhave, jnp.float32(NEG_INF))
        sc_flat = jnp.full((lanes + 1,), NEG_INF, jnp.float32)
        sc_flat = sc_flat.at[dest].set(stream_sc, mode="drop")
        sc_flat = sc_flat[:lanes]

        # ---- per-class lattice E ----
        obj = jnp.float32(0.0)
        ntok = jnp.int32(0)
        unk0 = jnp.float32(0.0)
        marg_parts = []
        base = 0
        for ci, (R, C) in enumerate(shapes):
            n = R * K * C
            sc_t = jax.lax.slice_in_dim(sc_flat, base, base + n
                                        ).reshape(R, K, C)
            base += n
            fl = flags[ci]
            in_word = (fl & F_INWORD) > 0
            is_start = (fl & F_START) > 0
            is_zend = (fl & F_ZEND) > 0
            k0 = sc_t[:, 0, :]
            k0_unk = in_word & (k0 <= NEG_INF / 2)
            sc_t = sc_t.at[:, 0, :].set(jnp.where(k0_unk, unk_score, k0))
            sc_x = jnp.transpose(sc_t, (2, 1, 0))          # [C, K, R]
            end_cols = []
            for j in range(K):
                pad = jnp.full((j + 1, 1, R), NEG_INF, jnp.float32)
                end_cols.append(jnp.concatenate(
                    [pad, sc_x[:C - j - 1, j:j + 1, :]], axis=0))
            sc_end_x = jnp.concatenate(end_cols, axis=1)
            st_x = jnp.transpose(is_start, (1, 0))
            zn_x = jnp.transpose(is_zend, (1, 0))
            alpha = jnp.transpose(_fwd_scan(sc_end_x, st_x, K), (1, 0))
            beta = jnp.transpose(_bwd_scan(sc_x, zn_x, K), (1, 0))
            zsrc = jnp.where(is_zend, alpha, 0.0)
            zrow = _suffix_propagate_row(zsrc, is_zend)     # [R, C]
            b_e = jnp.stack(
                [jnp.concatenate(
                    [beta[:, j + 1:],
                     jnp.full((R, j + 1), NEG_INF, jnp.float32)],
                    axis=1) for j in range(K)], axis=1)     # [R, K, C]
            marg = jnp.exp(alpha[:, None, :] + sc_t + b_e
                           - zrow[:, None, :])
            valid = sc_t > NEG_INF / 2
            marg = jnp.where(valid, marg, 0.0)
            marg = marg * freqs[ci][:, None, :]
            marg_parts.append(marg.reshape(-1))
            # UNK mass -> expected[0] (em.py node_id=0 routing): len-1
            # lanes with no static piece (k0cand False) are not in the
            # candidate stream; lanes whose static piece is DEAD land
            # in that piece's (masked-out) segment — both add here.
            unk0 = unk0 + jnp.sum(jnp.where(k0_unk, marg[:, 0, :], 0.0))
            obj = obj - jnp.sum(jnp.where(is_zend, freqs[ci] * alpha,
                                          0.0))
            ntok = ntok + _vit_scan(sc_end_x, st_x, zn_x, K)

        # ---- expected[]: lattice -> stream gather + segmented scan ----
        marg_flat = (jnp.concatenate(marg_parts) if NCLS > 1
                     else marg_parts[0])
        marg_aug = jnp.concatenate(
            [marg_flat, jnp.zeros((1,), jnp.float32)])
        stream_marg = marg_aug[dest]                        # [n_cand]
        seg_first = bhave  # identical scatter computed for the
        #                    score-broadcast side above

        def comb(a, b):
            va, fa = a
            vb, fb = b
            return jnp.where(fb, vb, va + vb), fa | fb

        sscan, _ = jax.lax.associative_scan(
            comb, (stream_marg, seg_first), axis=0)
        nxt = _next_occupied(seg_pos, n_cand)
        sp_end = jnp.where(nxt < n_cand, jnp.maximum(nxt - 1, 0),
                           jnp.maximum(n_cand - 1, 0))
        totals = jnp.where(have, sscan[jnp.clip(sp_end, 0,
                                                max(n_cand - 1, 0))],
                           0.0)
        expected = totals[:num_seed]
        # expected[0]: piece 0's own mass only while alive (when dead
        # its len-1 lanes were UNK-routed into unk0 already), plus all
        # UNK mass
        expected = expected.at[0].set(
            jnp.where(alive_c[0], expected[0], 0.0) + unk0)
        if eff_axis is not None:
            expected = fixed_order_psum(expected, eff_axis)
            obj = fixed_order_psum(obj, eff_axis)
            ntok = jax.lax.psum(ntok, eff_axis)
        # ---- M-step (em.mstep) ----
        keep = alive_c & (expected >= 0.5)
        total = jnp.sum(jnp.where(keep, expected, 0.0))
        logsum = jax.scipy.special.digamma(total)
        new_scores = jnp.where(
            keep,
            jax.scipy.special.digamma(jnp.where(keep, expected, 1.0))
            - logsum, NEG_INF).astype(jnp.float32)
        return new_scores, keep, expected, obj, ntok

    def impl(scores, alive, dest, seg_pos, *cls_arrays):
        flags = cls_arrays[:NCLS]
        freqs = cls_arrays[NCLS:]

        def body(carry, _):
            sc, al = carry
            sc2, al2, expected, obj, ntok = sub_iter(
                sc, al, dest, seg_pos, flags, freqs)
            return (sc2, al2), (expected, obj, ntok)

        (sc_f, al_f), (exps, objs, ntoks) = jax.lax.scan(
            body, (scores, alive), None, length=n_sub)
        if not collective:
            # per-shard outputs: leading shard axis for P(axis) specs
            return (sc_f[None], al_f[None], exps[-1][None],
                    objs[None], ntoks[None])
        return sc_f, al_f, exps[-1], objs, ntoks

    shard = P(axis_name)
    rep = P()
    out = (rep,) * 5 if collective else (shard,) * 5
    fn = jax.jit(shard_map(
        impl, mesh=mesh,
        in_specs=(rep, rep, shard, shard) + (shard,) * (2 * NCLS),
        out_specs=out, check_vma=False))
    return fn


def _suffix_propagate_row(vals, have):
    """Per-row: each col takes the value of the NEAREST have-col at or
    after it; 0 where none."""
    def comb(a, b):
        av, ah = a
        bv, bh = b
        return jnp.where(bh, bv, av), ah | bh
    rv = jnp.flip(vals, axis=1)
    rh = jnp.flip(have, axis=1)
    v, h = jax.lax.associative_scan(comb, (rv, rh), axis=1)
    return jnp.flip(jnp.where(h, v, 0.0), axis=1)


def _next_occupied(seg_pos, fill):
    """Per seg slot: the stream position of the NEAREST occupied slot
    strictly after it; fill when none."""
    have = seg_pos >= 0
    v = jnp.where(have, seg_pos, fill)

    def comb(a, b):
        av, ah = a
        bv, bh = b
        return jnp.where(bh, bv, av), ah | bh
    pv, ph = jax.lax.associative_scan(
        comb, (jnp.flip(v), jnp.flip(have)), axis=0)
    pv = jnp.flip(pv)   # nearest occupied at >= slot (inclusive)
    ph = jnp.flip(ph)
    nxt = jnp.concatenate([pv[1:], jnp.full((1,), fill, jnp.int32)])
    nh = jnp.concatenate([ph[1:], jnp.zeros((1,), jnp.bool_)])
    return jnp.where(nh, nxt, fill)
