# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Device normalizer: charsmap longest-match rewriting as a jitted program.

TPU-native form of reference src/normalizer.cc:88-300 (see also the host
mirror in sentencepiece_tpu/normalizer/normalize.py). One jitted program
normalizes a whole padded batch:

  1. charsmap longest-match per byte position — a D-step darts walk batched
     over all (row, byte) lanes (NormalizePrefix's per-position trie scan,
     normalizer.cc:245-269);
  2. vectorized UTF-8 validity/length classification (malformed bytes
     become U+FFFD consuming ONE byte, normalizer.cc:271-291);
  3. a chunk scan (`lax.scan`) that walks each row's chunk chain carrying
     the `is_prev_space` dedup state (normalizer.cc:160-189);
  4. output-centric byte assembly from a host-pre-escaped replacement
     pool (spaces already rewritten to U+2581 when escape_whitespaces):
     one chunk-id scatter + cummax maps every output position to its
     chunk, then a constant number of gathers produce the bytes;
  5. trailing-whitespace trim from chunk attributes (normalizer.cc:
     191-201): emissions are whole escaped codepoints, so the byte-level
     EndsWith strip decomposes into trailing fully-ws chunks plus a
     per-rule precomputed trailing-token count — including the reference
     quirk that the trim can consume literal U+2581 input chars and even
     the dummy prefix itself;
  6. dummy prefix prepended before the scan (prefix mode) or appended
     after the trim (suffix mode, normalizer.cc:153,204).

With ``with_alignment=True`` the same pass also emits the norm_to_orig
byte-alignment array (normalizer.cc:88-211, invariant :208): every
output byte maps to the INPUT offset of the chunk that emitted it — the
chunk scan already carries each chunk's input start, so alignment is
one more row-local MXU read off the which-chunk map, plus the
reference's edge rules (heading-space skip advances the dummy prefix's
mapping :103-112,153; the trailing trim's final entry takes the first
trimmed byte's mapping :191-206; suffix-mode ws maps like the final
entry :204).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import trie

SPACE_SYMBOL = b"\xe2\x96\x81"
FFFD = b"\xef\xbf\xbd"


def _valid_utf8(b: bytes) -> bool:
    try:
        b.decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False


class NormalizerTables:
    """Host-precomputed device tables for one NormalizerSpec.

    ``user_pieces`` (optional): the model's USER_DEFINED symbol byte
    strings. The reference normalizer consults a PrefixMatcher over
    them BEFORE the charsmap at every chunk start (normalizer.cc:
    239-243): a matched span passes through normalization verbatim (it
    is still subject to the per-byte space handling of the main loop,
    :160-189). The device walk mirrors that with a second darts trie
    whose longest match overrides the charsmap match. Pieces the device
    identity-chunk path cannot express exactly (raw 0x20 bytes or
    U+2581 — which interact with space escaping/trimming — NUL, or
    invalid UTF-8) set ``user_host_only`` and callers keep the exact
    host path."""

    def __init__(self, spec, treat_whitespace_as_suffix: bool = False,
                 user_pieces=None):
        from ..normalizer import charsmap as charsmap_lib

        self.u_units = None
        self.u_root_state = 0
        self.u_max_len = 0
        self.user_host_only = False
        if user_pieces:
            from ..utils import darts as darts_lib

            ok = all(
                p and b"\x00" not in p and b" " not in p
                and SPACE_SYMBOL not in p and _valid_utf8(p)
                for p in user_pieces)
            if not ok:
                self.user_host_only = True
            else:
                keys = sorted(set(bytes(p) for p in user_pieces))
                da = darts_lib.build(keys, list(range(len(keys))))
                self.u_units = jnp.asarray(trie.build_paired(da.units))
                u0 = int(da.units[0])
                self.u_root_state = int(
                    (u0 >> 10) << (((u0 >> 9) & 1) << 3))
                self.u_max_len = max(len(k) for k in keys)

        self.add_dummy_prefix = bool(spec.add_dummy_prefix)
        self.remove_extra_whitespaces = bool(spec.remove_extra_whitespaces)
        self.escape_whitespaces = bool(spec.escape_whitespaces)
        self.suffix = bool(treat_whitespace_as_suffix)
        self.ws = (SPACE_SYMBOL if self.escape_whitespaces else b" ")
        self.ws_len = len(self.ws)

        blob = spec.precompiled_charsmap or b""
        if blob:
            da, pool = charsmap_lib.decode_blob(blob)
            self.units = jnp.asarray(trie.build_paired(da.units))
            u0 = int(da.units[0])
            self.root_state = int((u0 >> 10) << (((u0 >> 9) & 1) << 3))
            self.max_rule_len = da.max_key_length()
            pa = trie.build_pair_arcs(da.units, self.root_state)
            self.arcs = (tuple(jnp.asarray(a) for a in pa)
                         if pa is not None else None)
            pool_b = bytes(pool)
        else:
            self.units = jnp.zeros((1, 2), jnp.uint32)
            self.root_state = 0
            self.max_rule_len = 0
            self.arcs = None
            pool_b = b""

        # Pre-escaped pool + per-offset chunk metadata. A rule value is a
        # byte offset into the NUL-delimited pool; we build, indexed by that
        # offset: escaped offset/length and the space-structure flags the
        # chunk scan needs (lead spaces, all-space, ends-with-space).
        P = len(pool_b)
        esc_pool = bytearray()
        self._v_esc_off = np.zeros(max(P, 1), np.int32)
        self._v_esc_len = np.zeros(max(P, 1), np.int32)
        self._v_lead_sp = np.zeros(max(P, 1), np.int32)
        self._v_all_sp = np.zeros(max(P, 1), bool)
        self._v_ends_sp = np.zeros(max(P, 1), bool)
        self._v_trail_ws = np.zeros(max(P, 1), np.int32)
        max_expand = 3  # FFFD: 3 output bytes per 1 malformed input byte
        off = 0
        while off < P:
            end = pool_b.index(0, off)
            rep = pool_b[off:end]
            esc = (rep.replace(b" ", SPACE_SYMBOL)
                   if self.escape_whitespaces else rep)
            self._v_esc_off[off] = len(esc_pool)
            self._v_esc_len[off] = len(esc)
            lead = len(rep) - len(rep.lstrip(b" "))
            self._v_lead_sp[off] = lead
            self._v_all_sp[off] = (len(rep) > 0
                                   and rep.strip(b" ") == b"")
            self._v_ends_sp[off] = rep.endswith(b" ")
            # trailing ws-TOKEN run of the escaped bytes (wsl-byte units
            # from the end — the EndsWith strip loop's unit), for the
            # chunk-attribute trailing-whitespace trim
            t, e = 0, bytes(esc)
            while e.endswith(self.ws):
                t += 1
                e = e[:-self.ws_len]
            self._v_trail_ws[off] = t
            esc_pool.extend(esc)
            off = end + 1
        self.esc_pool = jnp.asarray(
            np.frombuffer(bytes(esc_pool) + b"\x00", np.uint8))
        self.v_esc_off = jnp.asarray(self._v_esc_off)
        self.v_esc_len = jnp.asarray(self._v_esc_len)
        self.v_lead_sp = jnp.asarray(self._v_lead_sp)
        self.v_all_sp = jnp.asarray(self._v_all_sp)
        self.v_ends_sp = jnp.asarray(self._v_ends_sp)
        # packed per-value attr rows for ONE row-gather in the kernel:
        # (esc_off, esc_len, lead_sp, all_sp, ends_sp, trail_ws) — a
        # W-wide row gather costs ~1.4x a scalar gather (probe_gather),
        # vs 5-6 separate serial gathers.
        v_attr_np = np.stack(
            [self._v_esc_off, self._v_esc_len, self._v_lead_sp,
             self._v_all_sp.astype(np.int32),
             self._v_ends_sp.astype(np.int32), self._v_trail_ws],
            axis=1)
        if blob:
            # Appended rows P..P+255: the attr row of byte b's 1-BYTE rule
            # (never selected for bytes without one — a matched lane with
            # mlen==1 implies the rule exists). The kernel slices these
            # statically and serves 1-byte-rule lanes with a 256-key
            # one-hot instead of a full-lane v_attr row gather; multi-byte
            # matches are rare and go through a compacted gather
            # (_matched_attrs).
            u = np.asarray(da.units, np.uint32)
            offs = (u >> np.uint32(10)) << ((u & np.uint32(1 << 9))
                                            >> np.uint32(6))
            c = np.arange(256, dtype=np.uint32)
            n1 = np.minimum(np.uint32(self.root_state) ^ c,
                            np.uint32(len(u) - 1))
            u1 = u[n1]
            ok = (u1 & np.uint32((1 << 31) | 0xFF)) == c
            has_leaf = (u1 & np.uint32(1 << 8)) != 0
            leaf = (u[np.minimum(n1 ^ offs[n1], np.uint32(len(u) - 1))]
                    & np.uint32(0x7FFFFFFF)).astype(np.int64)
            b1 = np.where(ok & has_leaf, leaf, 0)
            byte_rows = v_attr_np[np.minimum(b1, len(v_attr_np) - 1)]
            byte_rows[~(ok & has_leaf)] = 0
            v_attr_np = np.concatenate([v_attr_np, byte_rows], axis=0)
        self.v_attr = jnp.asarray(v_attr_np)
        # cp-direct charsmap table (device fast path for multi-byte
        # chars): when EVERY rule key is valid UTF-8 — true for all
        # stock rules; guard via the same strict decode the device
        # classifier mirrors — a match can only start at a valid char
        # start (key bytes equal text bytes would otherwise form an
        # invalid char), and a multi-byte char's longest match is
        # either its own single-char rule or a longer rule flagged
        # here. cp_rule[cp] = (value+1) | extends<<30; 0 = no rule.
        # CJK batches then resolve their bulk through one dense-table
        # gather over compacted char lanes instead of full-lane deep
        # walk steps (_charsmap_longest).
        self.cp_rule = None
        if blob:
            try:
                items = da.items()
            except Exception:  # pragma: no cover - malformed blob
                items = None
            if items is not None and all(_valid_utf8(k) for k, _ in items):
                # [0x110000] cp rows: (value+1) | IS_SECOND<<29 |
                # EXTENDS<<30; then 256 byte rows holding IS_SECOND for
                # 1-byte chars (so the kernel's next-char check needs no
                # second dense gather). EXTENDS alone is too coarse —
                # e.g. every kana opens a combining-mark composition —
                # so the kernel demotes it unless the FOLLOWING char is
                # an actual rule-second-char (nmt_nfkc: 124 of them,
                # Hangul jamo + combining marks; absent from normal
                # text).
                cp_rule = np.zeros(0x110000 + 256, np.int32)
                ok_pack = True
                for k, v in items:
                    s = k.decode("utf-8")
                    c0 = ord(s[0])
                    nb0 = len(s[0].encode("utf-8"))
                    if v + 1 >= (1 << 29):
                        ok_pack = False
                        break
                    if len(k) == nb0:
                        cp_rule[c0] |= np.int32(v + 1)
                    else:
                        cp_rule[c0] |= np.int32(1 << 30)
                        cp1 = ord(s[1])
                        if cp1 < 0x80:
                            cp_rule[0x110000 + cp1] = 1
                        else:
                            cp_rule[cp1] |= np.int32(1 << 29)
                if ok_pack:
                    self.cp_rule = jnp.asarray(cp_rule)
        self.ws_arr = jnp.asarray(np.frombuffer(self.ws, np.uint8))
        self.fffd_arr = jnp.asarray(np.frombuffer(FFFD, np.uint8))
        # worst-case output bytes per input byte
        self.expand = max_expand
        self.max_rep_len = int(self._v_esc_len.max()) if P else 0

    def out_width(self, n_in: int) -> int:
        # dummy prefix + per-byte worst case expansion
        per_byte = max(self.expand,
                       self.max_rep_len,  # a 1-byte key rule
                       self.ws_len if self.escape_whitespaces else 1)
        return n_in * per_byte + self.ws_len + 4


def _utf8_class(batch: jnp.ndarray, lengths: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(char_len int32[B,N], valid bool[B,N]) per byte position —
    the SHARED classifier (tpu/utf8.py) instantiated on jax.numpy; the
    host-side width estimator (pipeline.pick_enc_width) runs the same
    code on numpy, which keeps the overflow-guard reasoning sound."""
    from . import utf8

    return utf8.utf8_class(jnp, batch, lengths)


def _charsmap_longest(units, batch, lengths, *, max_rule_len, root_state,
                      arcs=None, value_bits=32, cp_rule=None):
    """Longest charsmap match per byte position: (mlen, mval) int32[B,N].

    The walk is an early-exit ``while_loop`` over depth, not a fixed
    max_rule_len-step loop: a lane stays alive only while the trie has a
    longer rule continuing through its bytes, and real text kills every
    lane within a few steps (nmt_nfkc max_rule_len is 10, but measured
    alive-depth on botchan is 2 — ASCII only prefixes composition rules
    — and 5 on wagahai). Each skipped step saves a full-lane gather over
    the 44k-unit table, the normalizer's dominant cost."""
    B, N = batch.shape
    if max_rule_len == 0:
        return (jnp.zeros((B, N), jnp.int32),
                jnp.full((B, N), -1, jnp.int32))
    D = max_rule_len
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    bp = jnp.concatenate([batch, jnp.zeros((B, D), jnp.uint8)], axis=1)
    label_mask = jnp.uint32((1 << 31) | 0xFF)
    leaf_bit = jnp.uint32(1 << 8)
    # big tries (44k charsmap) measured faster with the serial row
    # gather pre-col_bits; SPM_TPU_CHARSMAP_MXU=1 flips them onto the
    # 6-plane MXU form for A/B (see docs/design.md rule 7)
    import os
    use_mxu = (int(units.shape[0]) <= 16384
               or os.environ.get("SPM_TPU_CHARSMAP_MXU") == "1")

    # -- depth-0 step, peeled: the root can only transition through 256
    # positions (root_state ^ byte), so the first full-table gather
    # collapses to a one-hot lookup over a 256-row slice (trie.step_root)
    state, alive, val0, _scr = trie.step_root(
        units, batch, pos < lengths[:, None], root_state=root_state)
    mlen = jnp.where(val0 >= 0, 1, 0)
    mval = val0
    d0 = 1
    if arcs is not None and D > 1:
        # depth-1 peeled via the live depth-2 arcs (nmt_nfkc: 333 — a
        # one-hot key match, ~10x cheaper than the 44k-table gather)
        c2 = bp[:, 1:N + 1].astype(jnp.int32)
        key = batch.astype(jnp.int32) * 256 + c2
        live1 = alive & ((pos + 1) < lengths[:, None])
        state, alive, val1, _scp = trie.step_pair(
            arcs[0], arcs[1], arcs[2], key, live1, state)
        mlen = jnp.where(val1 >= 0, 2, mlen)
        mval = jnp.where(val1 >= 0, val1, mval)
        d0 = 2

    if cp_rule is not None:
        # cp-direct fast path (NormalizerTables.cp_rule): every rule
        # key is valid UTF-8, so matches only start at valid char
        # starts, and a MULTI-BYTE char's longest match is either its
        # own single-char rule (cp_rule value) or a longer rule
        # (extends bit -> the ordinary byte walk). CJK batches resolve
        # their bulk through one dense-table gather over CAP-window
        # row-compacted char lanes — the deep walk then runs on the
        # rare extends lanes only, instead of taking full-lane steps
        # over mostly-mid-char positions (the old dense fallback).
        char_len, valid = _utf8_class(batch, lengths)
        in_r = pos < lengths[:, None]
        multi = in_r & valid & (char_len >= 2)
        # window sized to the width: EN-style batches have a handful of
        # multi-byte chars per row (curly quotes) and want a small
        # window; CJK rows have ~N/3 and want few trips
        CPW = max(16, N // 8)
        bp4 = jnp.concatenate([batch, jnp.zeros((B, 4), jnp.uint8)],
                              axis=1)
        N2c = int(bp4.shape[1])
        rkc = jnp.cumsum(multi, axis=1, dtype=jnp.int32) - 1
        max_cnt = jnp.max(jnp.sum(multi, axis=1, dtype=jnp.int32))
        colb = max(8, (N - 1).bit_length())
        posb_cp = jnp.broadcast_to(pos, (B, N)).astype(jnp.int32)

        def cp_cond(s):
            return s[0] * CPW < max_cnt

        def cp_body(s):
            r, fv = s
            sl = rkc - r * CPW
            in_win = multi & (sl >= 0) & (sl < CPW)
            slot = jnp.where(in_win, sl, CPW)
            col_c = trie.scatter_rowlocal_mxu(
                posb_cp, slot, CPW + 1, fill=N,
                value_bits=colb)[:, :CPW]
            cc = jnp.minimum(col_c, N - 1)
            rd = lambda off: trie.taa_mxu(
                bp4, jnp.minimum(cc + off, N2c - 1),
                value_bits=8).astype(jnp.int32)
            b0 = rd(0)
            b1 = rd(1) & 0x3F
            b2 = rd(2) & 0x3F
            b3 = rd(3) & 0x3F
            cl_c = trie.taa_mxu(char_len, cc, value_bits=8)
            cp = jnp.where(
                cl_c == 2, ((b0 & 0x1F) << 6) | b1,
                jnp.where(cl_c == 3,
                          ((b0 & 0x0F) << 12) | (b1 << 6) | b2,
                          ((b0 & 0x07) << 18) | (b1 << 12)
                          | (b2 << 6) | b3))
            e = trie._gather(cp_rule[:0x110000],
                             jnp.clip(cp, 0, 0x10FFFF))
            sl_safe = jnp.clip(sl, 0, CPW - 1)
            e_b = trie.taa_mxu(e, sl_safe, value_bits=32)
            return r + 1, jnp.where(in_win, e_b, fv)

        _, entry = jax.lax.while_loop(
            cp_cond, cp_body,
            (jnp.int32(0), jnp.zeros((B, N), jnp.int32)))
        ext = multi & (((entry >> 30) & 1) == 1)
        cp_val = entry & ((1 << 29) - 1)        # value+1; 0 = none
        # a multi-char rule can only continue into an actual
        # rule-second-char: sec[p] = this position starts one (1-byte
        # chars via the appended byte rows, multi-byte via bit 29 of
        # their own window entry); demote EXTENDS unless the char AFTER
        # this one is such a start — kana keep their combining-mark
        # compositions out of the byte walk on real text
        sec1 = trie.gather_mxu(
            cp_rule[0x110000:].astype(jnp.uint32),
            batch.astype(jnp.int32), d2=8, value_bits=8).astype(jnp.int32)
        sec = jnp.where(multi, (entry >> 29) & 1,
                        jnp.where(in_r & valid & (char_len == 1),
                                  sec1, 0))
        secp = jnp.concatenate(
            [sec, jnp.zeros((B, 4), jnp.int32)], axis=1)
        sec_next = jnp.where(
            char_len == 2, secp[:, 2:N + 2],
            jnp.where(char_len == 3, secp[:, 3:N + 3],
                      secp[:, 4:N + 4]))
        ext_real = ext & (sec_next > 0)
        cp_hit = multi & (cp_val > 0) & ~ext_real
        mlen = jnp.where(cp_hit, char_len, mlen)
        mval = jnp.where(cp_hit, cp_val - 1, mval)
        # the byte walk now only serves 1-byte-char lanes and lanes
        # whose longer rule could actually continue; invalid positions
        # can never match a valid-UTF-8 key
        alive = alive & (ext_real | (valid & (char_len == 1)))

    def w_cond(s):
        d, _, alive, _, _ = s
        return (d < D) & jnp.any(alive)

    def w_body(s):
        d, state, alive, mlen, mval = s
        c = jax.lax.dynamic_slice_in_dim(bp, d, N, axis=1).astype(
            jnp.uint32)
        live = alive & ((pos + d) < lengths[:, None])
        node = state ^ c
        safe = jnp.where(live, node, jnp.uint32(0))
        # units is the PAIRED table (trie.build_paired); MXU digit
        # gather for small tries (see encode.py walk note), serial row
        # gather for big ones (charsmap, 44k units — MXU form measured
        # slower there pre-col_bits)
        if use_mxu:
            row = trie.gather_mxu(
                units, safe, d2=32 if int(units.shape[0]) <= 16384 else 64,
                col_bits=(32, value_bits))
        else:
            row = trie._gather(units, safe)
        unit = row[..., 0]
        ok = live & ((unit & label_mask) == c)
        state = jnp.where(ok, node ^ trie.offsets(unit), state)
        has_leaf = ok & ((unit & leaf_bit) != 0)
        mlen = jnp.where(has_leaf, d + 1, mlen)
        mval = jnp.where(has_leaf, row[..., 1].astype(jnp.int32), mval)
        return d + 1, state, ok, mlen, mval

    # Depth >= d0 steps run on ROW-COMPACTED alive lanes when few
    # survive the peeled steps per row (EN text: only lanes whose
    # 2-byte prefix opens a longer rule — near zero per row; each
    # full-lane step would cost a ~10 ns/lane row gather, the
    # normalizer's residual dominant cost). The compaction itself is
    # all row-local MXU scatters/reads — the earlier flat
    # jnp.nonzero-over-B*N-lanes form cost ~10 ms/batch on its own
    # (XLA lowers the index scatter at the rule-7 serial rate). Dense
    # fallback when any row keeps more than CW lanes alive (CJK
    # batches, where most positions continue 3-byte rules). Batches
    # with NO alive lanes after the peeled steps (common for ASCII)
    # skip the deep walk entirely.
    CW = 16
    N2 = int(bp.shape[1])

    def dense_walk(op):
        state, alive, mlen, mval = op
        _, _, _, ml, mv = jax.lax.while_loop(
            w_cond, w_body, (jnp.int32(d0), state, alive, mlen, mval))
        return ml, mv

    def row_compact_walk(op):
        state, alive, mlen, mval = op
        rk = jnp.cumsum(alive, axis=1, dtype=jnp.int32) - 1
        slot = jnp.where(alive & (rk < CW), rk, CW)
        colb = max(8, (N - 1).bit_length())
        posb = jnp.broadcast_to(pos, (B, N)).astype(jnp.int32)
        col_c = trie.scatter_rowlocal_mxu(posb, slot, CW + 1, fill=N,
                                          value_bits=colb)[:, :CW]
        st_c = trie.scatter_rowlocal_mxu(
            state.astype(jnp.int32), slot, CW + 1, fill=0,
            value_bits=32)[:, :CW].astype(jnp.uint32)
        al_c = col_c < N
        ln_b = lengths[:, None]

        def c_cond(s):
            d = s[0]
            return (d < D) & jnp.any(s[2])

        def c_body(s):
            d, st, al, ml, mv = s
            cidx = jnp.minimum(col_c + d, N2 - 1)
            c = trie.taa_mxu(bp, cidx, value_bits=8).astype(jnp.uint32)
            live = al & ((col_c + d) < ln_b)
            node = st ^ c
            safe = jnp.where(live, node, jnp.uint32(0))
            r = trie._gather(units, safe)
            unit = r[..., 0]
            okk = live & ((unit & label_mask) == c)
            st = jnp.where(okk, node ^ trie.offsets(unit), st)
            hl = okk & ((unit & leaf_bit) != 0)
            ml = jnp.where(hl, d + 1, ml)
            mv = jnp.where(hl, r[..., 1].astype(jnp.int32), mv)
            return d + 1, st, okk, ml, mv

        mlc0 = jnp.zeros((B, CW), jnp.int32)
        mvc0 = jnp.full((B, CW), -1, jnp.int32)
        _, _, _, mlc, mvc = jax.lax.while_loop(
            c_cond, c_body, (jnp.int32(d0), st_c, al_c, mlc0, mvc0))
        # read improvements back through the slot map (row-local)
        rk_safe = jnp.clip(rk, 0, CW - 1)
        mlb = trie.taa_mxu(mlc, rk_safe,
                           value_bits=max(8, (D + 1).bit_length()))
        mvb = trie.taa_mxu(mvc, rk_safe, value_bits=32)
        sel = alive & (rk < CW) & (mvb >= 0)
        return (jnp.where(sel, mlb, mlen), jnp.where(sel, mvb, mval))

    def deep(op):
        row_alive = jnp.sum(op[1], axis=1, dtype=jnp.int32)
        return jax.lax.cond(jnp.max(row_alive) <= CW, row_compact_walk,
                            dense_walk, op)

    mlen, mval = jax.lax.cond(
        jnp.any(alive), deep, lambda op: (op[2], op[3]),
        (state, alive, mlen, mval))
    return mlen, mval


def _matched_attrs(v_attr, batch, mval, mlen, matched, in_range):
    """Six per-lane attr fields (esc_off, esc_len, lead, all, ends,
    trail), meaningful at MATCHED lanes only, without the full-lane
    v_attr row gather (~10 ns/lane — rule 7, the scan branch's dominant
    cost):

      * mlen==1 lanes (the common match on real corpora — e.g. the \\r
        delete rule hits every line of a CRLF corpus): the rule value
        is a function of the byte, so the attrs come from the 256
        byte-rule rows appended to v_attr — two 256-key one-hots over
        packed words;
      * mlen>1 lanes are rare: compact CAP of them PER ROW at a time
        with row-local MXU scatters (the earlier flat
        jnp.nonzero-over-B*N form cost ~10 ms/batch on its own — XLA
        lowers the index scatter at the rule-7 serial rate), row-gather
        just those attr rows, and read the packed words back through
        the per-row slot map. Rows with more than CAP such lanes take
        further trips of the same window loop (EN batches: 1 trip;
        dense-matched CJK rows: count/CAP trips — still cheaper than
        the full-lane row gather, and with no lax.cond fallback, whose
        operand-side one-hot reductions measured 5x slower than the
        same ops outside a cond).

    Field packing needs max_rep_len < 256 (caller guards)."""
    B, N = batch.shape
    P_rows = int(v_attr.shape[0])

    def pack(rows):
        w = (rows[:, 1] | (rows[:, 2] << 8) | (rows[:, 3] << 16)
             | (rows[:, 4] << 17) | (rows[:, 5] << 18))
        return w, rows[:, 0]

    m1 = matched & (mlen == 1) & in_range
    mm = matched & (mlen > 1) & in_range
    # both byte-rule columns in ONE MXU digit gather (two 256-key
    # gather_smalls measured 1.2 ms/batch; this form ~0)
    tail = v_attr[P_rows - 256:]
    bw, be = pack(tail)
    brow = trie.gather_mxu(
        jnp.stack([bw, be], axis=1).astype(jnp.uint32),
        batch.astype(jnp.int32), d2=8, col_bits=(26, 32))
    w1 = brow[..., 0].astype(jnp.int32)
    e1 = brow[..., 1].astype(jnp.int32)
    CAP = 8
    rk = jnp.cumsum(mm, axis=1, dtype=jnp.int32) - 1
    vb = max(8, P_rows.bit_length())
    max_cnt = jnp.max(jnp.sum(mm, axis=1, dtype=jnp.int32))

    def win_cond(s):
        return s[0] * CAP < max_cnt

    def win_body(s):
        r, w_a, e_a = s
        sl = rk - r * CAP
        in_win = mm & (sl >= 0) & (sl < CAP)
        slot = jnp.where(in_win, sl, CAP)
        val_c = trie.scatter_rowlocal_mxu(
            jnp.maximum(mval, 0), slot, CAP + 1, fill=0,
            value_bits=vb)[:, :CAP]
        cattr = trie._gather(v_attr, val_c)      # [B, CAP, 6]
        cw, ce = pack(cattr.reshape(-1, 6))
        cw = cw.reshape(B, CAP)
        ce = ce.reshape(B, CAP)
        sl_safe = jnp.clip(sl, 0, CAP - 1)
        wm = trie.taa_mxu(cw, sl_safe, value_bits=32)
        em = trie.taa_mxu(ce, sl_safe, value_bits=32)
        return (r + 1, jnp.where(in_win, wm, w_a),
                jnp.where(in_win, em, e_a))

    z = jnp.zeros((B, N), jnp.int32)
    _, wm_all, em_all = jax.lax.while_loop(
        win_cond, win_body, (jnp.int32(0), z, z))
    w = jnp.where(m1, w1, 0) | jnp.where(mm, wm_all, 0)
    e = jnp.where(m1, e1, 0) | jnp.where(mm, em_all, 0)
    return (e, w & 0xFF, (w >> 8) & 0xFF, (w >> 16) & 1,
            (w >> 17) & 1, w >> 18)


@functools.partial(
    jax.jit,
    static_argnames=("max_rule_len", "root_state", "n_out", "ws_len",
                     "max_rep_len", "add_dummy_prefix",
                     "remove_extra_whitespaces", "escape_whitespaces",
                     "suffix", "with_alignment", "u_max_len",
                     "u_root_state"))
def normalize_batch(units, esc_pool, v_attr, ws_arr, fffd_arr,
                    batch, lengths, *,
                    max_rule_len: int, root_state: int, n_out: int,
                    ws_len: int, max_rep_len: int,
                    add_dummy_prefix: bool, remove_extra_whitespaces: bool,
                    escape_whitespaces: bool, suffix: bool, arcs=None,
                    with_alignment: bool = False,
                    u_units=None, u_max_len: int = 0, u_root_state: int = 0,
                    cp_rule=None):
    """Normalize padded rows of raw bytes. Returns (out uint8[B, n_out],
    out_len int32[B]) — plus norm_to_orig int32[B, n_out + 1] when
    ``with_alignment`` (rows with out_len L use entries [0, L]; empty
    input rows have no meaningful entries, like the reference's empty
    early-return).

    ``u_units`` (+ statics): optional user-defined-symbol trie. A
    longest user match at a chunk start OVERRIDES the charsmap
    (normalizer.cc:239-243) and emits its span as an identity chunk
    (bytes verbatim; the NormalizerTables gate guarantees no spaces /
    U+2581 / invalid UTF-8 inside, so the space machinery is inert)."""
    B, N = batch.shape

    # rule values are offsets into the raw pool, which the escaped pool
    # bounds — static, so the MXU form can skip all-zero value planes
    vbits = max(8, int(esc_pool.shape[0]).bit_length())
    mlen, mval = _charsmap_longest(units, batch, lengths,
                                   max_rule_len=max_rule_len,
                                   root_state=root_state, arcs=arcs,
                                   value_bits=vbits, cp_rule=cp_rule)
    char_len, valid_utf8 = _utf8_class(batch, lengths)

    if u_units is not None and u_max_len > 0:
        u_len, u_val = _charsmap_longest(
            u_units, batch, lengths, max_rule_len=u_max_len,
            root_state=u_root_state, arcs=None, value_bits=32)
        u_found = u_val >= 0
        # user match takes absolute precedence at a chunk start
        mlen = jnp.where(u_found, 0, mlen)
        mval = jnp.where(u_found, -1, mval)
    else:
        u_len = jnp.zeros((B, N), jnp.int32)
        u_found = jnp.zeros((B, N), bool)

    # per-position chunk tables
    matched = mlen > 0
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    in_range = pos < lengths[:, None]
    cons = jnp.where(u_found, u_len,
                     jnp.where(matched, mlen,
                               jnp.where(valid_utf8, char_len, 1))
                     ).astype(jnp.int32)
    is_sp_byte = batch == 0x20
    KIND_POOL, KIND_RAW, KIND_FFFD, KIND_WS = 0, 1, 2, 3
    wsl = ws_len if escape_whitespaces else 1
    # trailing ws-token run of a RAW emission: the char U+2581 itself
    # when escaping (its bytes ARE the ws token)
    if escape_whitespaces:
        bp1 = jnp.concatenate([batch, jnp.zeros((B, 2), jnp.uint8)], axis=1)
        raw_is_ws = ((batch == 0xE2) & (bp1[:, 1:N + 1] == 0x96)
                     & (bp1[:, 2:N + 2] == 0x81) & (char_len == 3))
    else:
        raw_is_ws = jnp.zeros((B, N), bool)

    rows = jnp.arange(B)

    # -- chunk chain: sequential scan vs vectorized fast path ----------------
    # When a row has NO charsmap match and its bytes decode as clean
    # UTF-8, the chunk chain is exactly the char-start sequence and the
    # is_prev_space carry collapses to "previous byte was a space" (a
    # space char is 1 byte, so the byte before a char start is 0x20 iff
    # the previous CHAR was a space) — every per-chunk quantity becomes
    # a shift/where, no scan, no pool-attribute gather. Real corpora are
    # overwhelmingly in this regime (botchan: 0 matched rows; wagahai:
    # 35%). One traced predicate selects per BATCH: a batch with any
    # matched/malformed row takes the exact sequential branch.
    #
    # The simplicity predicate is conservative (proof sketch: in a row
    # where every non-continuation byte is a valid char start and every
    # continuation byte is covered by a valid char start within 3 bytes
    # — checked below — the greedy chain visits exactly the
    # non-continuation positions; a stray continuation byte forces the
    # check false because no valid start can cover it).
    from . import utf8 as utf8_mod
    is_cont = (batch & 0xC0) == 0x80
    covered = utf8_mod.covered_continuations(jnp, batch, valid_utf8,
                                             char_len)
    pos_ok = jnp.where(is_cont, covered, valid_utf8)
    any_complex = jnp.any(in_range & (matched | u_found | ~pos_ok))

    prev0 = jnp.full((B,), bool(remove_extra_whitespaces))

    # byte-rule split needs the 256 appended v_attr rows and the packed
    # field budget; custom charsmaps with giant replacements fall back
    # to the full row gather
    attr_split = (int(v_attr.shape[0]) >= 257 and 0 < max_rep_len < 256)

    def chunk_attrs():
        """Vectorized per-position chunk attributes (the scan/semi
        branches' shared prologue): emission length, kind, space
        bookkeeping, pool offset, trailing-ws-token run, and the
        normalizes-to-exactly-" " predicate."""
        vsafe = jnp.maximum(mval, 0)
        kind = jnp.where(
            matched, KIND_POOL,
            jnp.where(valid_utf8 & is_sp_byte, KIND_WS,
                      jnp.where(valid_utf8, KIND_RAW, KIND_FFFD)))
        if attr_split:
            (a_esc_off, a_esc_len, a_lead, a_all, a_ends,
             a_trail) = _matched_attrs(v_attr, batch, mval, mlen, matched,
                                       in_range)
        else:
            # all six per-value attributes in ONE row gather (a W-wide
            # row costs ~1.4x a scalar gather; six separate serial
            # gathers 6x)
            attr = trie._gather(v_attr, vsafe)   # [B, N, 6]
            a_esc_off, a_esc_len = attr[..., 0], attr[..., 1]
            a_lead, a_all, a_ends, a_trail = (attr[..., 2], attr[..., 3],
                                              attr[..., 4], attr[..., 5])
        # emission length (escaped), before leading-space strip;
        # user-symbol spans emit their bytes verbatim (identity chunk —
        # the tables gate guarantees no space/U+2581/invalid bytes, so
        # every other attribute's non-matched default is already right)
        emit0 = jnp.where(
            u_found, u_len,
            jnp.where(matched, a_esc_len,
                      jnp.where(valid_utf8,
                                jnp.where(is_sp_byte, wsl, char_len), 3)))
        lead_sp = jnp.where(matched, a_lead,
                            jnp.where(valid_utf8 & is_sp_byte, 1, 0))
        all_sp = jnp.where(matched, a_all > 0, valid_utf8 & is_sp_byte)
        ends_sp = jnp.where(matched, a_ends > 0, valid_utf8 & is_sp_byte)
        esc_off = jnp.where(matched, a_esc_off, 0)
        # trailing ws-token run of each position's emission (for the
        # trim): POOL = host-precomputed on the escaped replacement;
        # WS = 1 token; FFFD never matches the token.
        trail0 = jnp.where(
            matched, a_trail,
            jnp.where(valid_utf8 & is_sp_byte, 1,
                      jnp.where(valid_utf8 & raw_is_ws, 1, 0))).astype(
                          jnp.int32)

        # chunk normalized form == " " exactly (the heading-skip-loop
        # condition, normalizer.cc:106): a raw space byte, or a rule
        # whose replacement is the single space
        exact_pos = jnp.where(matched, (a_all > 0) & (a_esc_len == wsl),
                              valid_utf8 & is_sp_byte)
        return (emit0.astype(jnp.int32), kind.astype(jnp.int32),
                lead_sp.astype(jnp.int32), all_sp, ends_sp,
                esc_off.astype(jnp.int32), trail0, exact_pos)

    def scan_branch(_):
        (emit0, kind, lead_sp, all_sp, ends_sp, esc_off, trail0,
         exact_pos) = chunk_attrs()

        # early-exit chain walk: the loop runs max-chunks-over-batch
        # iterations (chunks per row <= chars per row — a 3x cut for
        # CJK text), not the padded width N; unvisited steps stay
        # emit=0 = transparent, which downstream already skips.
        #
        # The six per-position attributes the body needs pack into two
        # int32 words (bit budget static from max_rep_len/max_rule_len;
        # the one-word-per-attribute loop remains the fallback for
        # pathological custom charsmaps), so each step pays two [B]
        # gathers instead of seven.
        be_ = max(max(max_rep_len, 4), wsl, u_max_len).bit_length()
        bc_ = max(max_rule_len, 4, u_max_len).bit_length()
        packable = (3 * be_ + bc_ + 4) <= 31

        if packable:
            w0 = (emit0 | (kind << be_) | (all_sp.astype(jnp.int32)
                                           << (be_ + 2))
                  | (ends_sp.astype(jnp.int32) << (be_ + 3))
                  | (lead_sp << (be_ + 4)) | (cons << (2 * be_ + 4))
                  | (trail0 << (2 * be_ + 4 + bc_)))
            mask_e = (1 << be_) - 1

        def chunk_body(s):
            i, p, prev_sp, b_em, b_kd, b_src, b_tr, b_cs, b_xw = s
            active = p < lengths
            psafe = jnp.minimum(p, N - 1)
            if packable:
                v0 = w0[rows, psafe]
                c_emit0 = v0 & mask_e
                c_kind = (v0 >> be_) & 3
                c_sp = ((v0 >> (be_ + 2)) & 1).astype(jnp.bool_)
                c_ends = ((v0 >> (be_ + 3)) & 1).astype(jnp.bool_)
                c_lead = (v0 >> (be_ + 4)) & mask_e
                c_cons = (v0 >> (2 * be_ + 4)) & ((1 << bc_) - 1)
                c_trail0 = v0 >> (2 * be_ + 4 + bc_)
            else:
                c_emit0 = emit0[rows, psafe]
                c_kind = kind[rows, psafe]
                c_sp = all_sp[rows, psafe]
                c_ends = ends_sp[rows, psafe]
                c_lead = lead_sp[rows, psafe]
                c_cons = cons[rows, psafe]
                c_trail0 = trail0[rows, psafe]
            k = jnp.where(active & prev_sp, c_lead, 0)
            c_emit = jnp.maximum(c_emit0 - k * wsl, 0)
            c_src = jnp.where(c_kind == KIND_POOL,
                              esc_off[rows, psafe] + k * wsl,
                              psafe)  # raw/fffd read from input / const
            c_trail = jnp.minimum(c_trail0, c_emit // wsl)
            if remove_extra_whitespaces:
                # deletion rules (empty replacement) leave
                # is_prev_space untouched (normalizer.cc:165
                # `if (!sp.empty())`)
                upd = jnp.where(c_emit0 == 0, prev_sp,
                                c_ends | (c_sp & prev_sp))
            else:
                upd = jnp.zeros_like(prev_sp)
            new_prev = jnp.where(active, upd, prev_sp)
            new_p = jnp.where(active, p + c_cons, p)

            def put(buf, v):
                return jax.lax.dynamic_update_slice(buf, v[None, :], (i, 0))
            b_em = put(b_em, jnp.where(active, c_emit, 0))
            b_kd = put(b_kd, c_kind)
            b_src = put(b_src, c_src)
            b_tr = put(b_tr, jnp.where(active, c_trail, 0))
            b_cs = put(b_cs, psafe)  # chunk input start (norm_to_orig)
            # 0 = unvisited, 1 = normalizes to exactly " ", 2 = other
            b_xw = put(b_xw, jnp.where(
                active, jnp.where(exact_pos[rows, psafe], 1, 2), 0))
            return i + 1, new_p, new_prev, b_em, b_kd, b_src, b_tr, \
                b_cs, b_xw

        def chunk_cond(s):
            i, p = s[0], s[1]
            return (i < N) & jnp.any(p < lengths)

        z = jnp.zeros((N, B), jnp.int32)
        _, _, _, emits, kinds, srcs, trails, cstarts, exws = \
            jax.lax.while_loop(
                chunk_cond, chunk_body,
                (jnp.int32(0), jnp.zeros(B, jnp.int32), prev0,
                 z, z, z, z, z, z))
        return (emits.T, kinds.T, srcs.T, trails.T, cstarts.T, exws.T)

    def semi_branch(_):
        """Vectorized chain for batches whose every charsmap match is a
        ONE-BYTE rule on a one-byte char (the dominant real-corpus case:
        nmt_nfkc's \\r delete rule hits every line of a CRLF corpus,
        sending the whole batch down the sequential scan even though the
        chain is still exactly the char-start sequence). A 1-byte match
        consumes one byte — the same stride as the unmatched 1-byte char
        — so chunk starts stay the non-continuation positions and every
        per-chunk quantity from chunk_attrs() is already positional. The
        only true carry, is_prev_space, is a boolean affine recurrence
        prev' = a | (b & prev) per chunk (deletions are the identity,
        normalizer.cc:165), which composes associatively — one
        log-depth associative_scan replaces the N-step while_loop."""
        (emit0, kind, lead_sp, all_sp, ends_sp, esc_off, trail0,
         exact_pos) = chunk_attrs()
        is_chunk = in_range & ~is_cont
        if remove_extra_whitespaces:
            eff = is_chunk & (emit0 > 0)      # identity for deletions
            a_t = eff & ends_sp
            b_t = ~eff | all_sp
            # exclusive scan: position p folds the transfers of all
            # chunks strictly before it, applied to the row's prev0
            a_s = jnp.concatenate(
                [jnp.zeros((B, 1), bool), a_t[:, :N - 1]], axis=1)
            b_s = jnp.concatenate(
                [jnp.ones((B, 1), bool), b_t[:, :N - 1]], axis=1)

            def comb(x, y):     # y ∘ x (x earlier in the row)
                ax, bx = x
                ay, by = y
                return ay | (by & ax), by & bx

            aa, bb = jax.lax.associative_scan(comb, (a_s, b_s), axis=1)
            prev_sp = aa | (bb & prev0[:, None])
        else:
            prev_sp = jnp.zeros((B, N), bool)
        k = jnp.where(prev_sp & is_chunk, lead_sp, 0)
        emit = jnp.where(is_chunk, jnp.maximum(emit0 - k * wsl, 0), 0)
        posb = jnp.broadcast_to(pos, (B, N)).astype(jnp.int32)
        src = jnp.where(kind == KIND_POOL, esc_off + k * wsl, posb)
        trail = jnp.where(is_chunk, jnp.minimum(trail0, emit // wsl), 0)
        exw = jnp.where(is_chunk,
                        jnp.where(exact_pos, 1, 2), 0).astype(jnp.int32)
        return (emit.astype(jnp.int32), kind, src.astype(jnp.int32),
                trail.astype(jnp.int32), posb, exw)

    def fast_branch(_):
        is_chunk = in_range & ~is_cont
        prev_sp = jnp.concatenate(
            [jnp.broadcast_to(prev0[:, None], (B, 1)),
             is_sp_byte[:, :N - 1]], axis=1)
        if remove_extra_whitespaces:
            k = (prev_sp & is_sp_byte).astype(jnp.int32)
        else:
            k = jnp.zeros((B, N), jnp.int32)
        emit = jnp.where(
            is_chunk,
            jnp.where(is_sp_byte, wsl * (1 - k), char_len), 0)
        kind = jnp.where(is_sp_byte, KIND_WS, KIND_RAW).astype(jnp.int32)
        trail = jnp.where(is_sp_byte, 1 - k,
                          jnp.where(raw_is_ws, 1, 0)).astype(jnp.int32)
        trail = jnp.where(is_chunk, trail, 0)
        posb = jnp.broadcast_to(pos, (B, N)).astype(jnp.int32)
        exw = jnp.where(is_chunk,
                        jnp.where(is_sp_byte, 1, 2), 0).astype(jnp.int32)
        return (emit.astype(jnp.int32), kind, posb, trail, posb, exw)

    # three-way dispatch: clean rows -> fast; matches that each consume
    # exactly ONE char (mlen == char_len at a valid char start — e.g.
    # the \r delete and the U+FEFF BOM delete, the only matches CRLF
    # English corpora ever hit; no user symbols) -> semi (vectorized
    # chain, stride == char stride); anything else -> the exact
    # sequential scan
    semi_bad = in_range & (u_found | ~pos_ok
                           | (matched & ~((mlen == char_len)
                                          & valid_utf8)))

    def complex_side(_):
        return jax.lax.cond(jnp.any(semi_bad), scan_branch, semi_branch,
                            None)

    emits, kinds, srcs, trails, cstarts, exws = jax.lax.cond(
        any_complex, complex_side, fast_branch, None)

    # -- assembly (output-centric) -------------------------------------------
    # Old form: an R-iteration loop (R = max escaped replacement length,
    # up to ~40) scattering byte j of every chunk — ~3 serial
    # gather/scatter ops per iteration dominated the whole normalizer.
    # New form: ONE scatter of chunk ids at their output offsets + a
    # cummax turns "which chunk covers output position o" into a dense
    # map; then each output byte is produced by a constant number of
    # gathers regardless of R.
    dummy = wsl if add_dummy_prefix and not suffix else 0
    offs = jnp.cumsum(emits, axis=1, dtype=jnp.int32) - emits + dummy
    total = offs[:, -1] + emits[:, -1]

    O = n_out + 1
    ocols = jnp.arange(O, dtype=jnp.int32)[None, :]
    chunk_t = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :],
                               (B, N))
    # which-chunk-covers-output-o map and the per-output chunk reads are
    # all ROW-LOCAL (indices within the row's own span), so they run as
    # batched one-hot matmuls on the MXU instead of serial per-element
    # gathers (trie.taa_mxu rationale; ~15x at these widths). Rows that
    # overflow n_out can mark one column twice — their cid/out bytes
    # are garbage, but every overflow row is re-encoded on the exact
    # host path and masked out of the gate.
    mark_cols = jnp.where(emits > 0, jnp.minimum(offs, n_out), O)
    cid0 = trie.scatter_rowlocal_mxu(
        chunk_t, mark_cols, O, fill=-1,
        value_bits=max(8, (N - 1).bit_length()))
    cid = jax.lax.cummax(cid0, axis=1)

    # pack (offset, kind, src) of each chunk into one word so the
    # per-output gather is a single op. Bit widths are STATIC from
    # n_out and the pool size — a fixed 9-bit offset field silently
    # corrupted rows whose normalized output passed 511 bytes (caught
    # by test_device_normalizer_long_rows); when the three fields
    # cannot share 31 bits (wide buckets), src moves to a second word.
    ob = (n_out + 2).bit_length()
    sb = max(int(esc_pool.shape[0]) + 4 * wsl, N).bit_length()
    cidc = jnp.clip(cid, 0, N - 1)
    off_c = jnp.minimum(offs, n_out + 1)
    if ob + 2 + sb <= 31:
        pk = off_c | (kinds << ob) | (srcs << (ob + 2))   # [B, N] int32
        pk_o = trie.taa_mxu(pk, cidc, value_bits=ob + 2 + sb)
        off_o = pk_o & ((1 << ob) - 1)
        kind_o = (pk_o >> ob) & 3
        src_o = pk_o >> (ob + 2)
    else:
        pk = off_c | (kinds << ob)
        pk_o = trie.taa_mxu(pk, cidc, value_bits=ob + 2)
        off_o = pk_o & ((1 << ob) - 1)
        kind_o = (pk_o >> ob) & 3
        src_o = trie.taa_mxu(srcs, cidc, value_bits=sb)
    j_o = ocols - off_o

    # byte pool lookup: MXU digit gather with single-plane values
    pool_b = trie.gather_mxu(
        esc_pool.astype(jnp.uint32),
        jnp.clip(src_o + j_o, 0, len(esc_pool) - 1),
        d2=256, value_bits=8).astype(jnp.uint8)
    R = max(max_rep_len, 4)
    batch_pad = jnp.concatenate([batch, jnp.zeros((B, R), jnp.uint8)],
                                axis=1)
    raw_b = trie.taa_mxu(batch_pad,
                         jnp.clip(src_o + j_o, 0, N + R - 1),
                         value_bits=8)
    jsafe = jnp.clip(j_o, 0, 3)
    fffd_pad = jnp.concatenate([fffd_arr, jnp.zeros(1, jnp.uint8)])
    ws_pad = jnp.concatenate([ws_arr, jnp.zeros(1, jnp.uint8)])
    fffd_b = trie.gather_small(fffd_pad, jnp.minimum(jsafe, 3))
    ws_b = trie.gather_small(ws_pad, jnp.minimum(jsafe, wsl))
    val = jnp.where(
        kind_o == KIND_POOL, pool_b,
        jnp.where(kind_o == KIND_RAW, raw_b,
                  jnp.where(kind_o == KIND_FFFD, fffd_b, ws_b)))

    write = (cid >= 0) & (ocols < total[:, None])
    out = jnp.where(write, val, 0).astype(jnp.uint8)
    if dummy:
        pre = (ocols < dummy) & (lengths > 0)[:, None]
        out = jnp.where(pre, ws_pad[jnp.minimum(ocols, wsl)], out)
    # rows with zero input are empty regardless of dummy prefix
    total = jnp.where(lengths > 0, total, 0)
    untrimmed = total

    if with_alignment:
        # norm_to_orig before trim handling: every output byte maps to
        # the INPUT start of its covering chunk (normalizer.cc:166-177);
        # dummy-prefix bytes (cid -1) map to the heading-skip consumed
        # offset = input start of the first chunk whose normalized form
        # is not exactly " " (:103-112,153) — 0 without
        # remove_extra_whitespaces
        cs_o = trie.taa_mxu(cstarts, cidc,
                            value_bits=max(8, (N - 1).bit_length()))
        if remove_extra_whitespaces:
            first_nx = jnp.argmax(exws == 2, axis=1).astype(jnp.int32)
            prefix_consumed = jnp.take_along_axis(
                cstarts, first_nx[:, None], axis=1)[:, 0]
            # the reference's all-whitespace early return (:114-117):
            # empty output AND empty alignment
            early_empty = (lengths > 0) & ~jnp.any(exws == 2, axis=1)
        else:
            prefix_consumed = jnp.zeros((B,), jnp.int32)
            early_empty = jnp.zeros((B,), bool)
        n2o_full = jnp.where(cid >= 0, cs_o, prefix_consumed[:, None])

    # -- trailing whitespace trim (remove_extra_whitespaces) ------------------
    if remove_extra_whitespaces:
        # chunk-attribute form of the reference's byte-level EndsWith
        # strip loop: emissions are whole escaped codepoints, so every
        # stripped wsl-byte token lies inside one chunk — the strip is
        # the trailing run of fully-ws chunks plus the trailing token
        # run of the first non-fully-ws chunk (precomputed per value).
        fully = (emits > 0) & (trails * wsl == emits)
        transparent = emits == 0
        strippable = (fully | transparent)
        m = jnp.flip(jax.lax.cummin(
            jnp.flip(strippable.astype(jnp.int32), axis=1), axis=1),
            axis=1) > 0
        whole = jnp.sum(jnp.where(m, emits, 0), axis=1, dtype=jnp.int32)
        m_next = jnp.concatenate(
            [m[:, 1:], jnp.ones((B, 1), bool)], axis=1)
        boundary = ~m & m_next
        partial = jnp.sum(jnp.where(boundary, trails * wsl, 0), axis=1,
                          dtype=jnp.int32)
        stripped = total - whole - partial
        # if everything after the dummy prefix stripped, the prefix (a
        # ws token itself) strips too (the byte loop keeps going)
        stripped = jnp.where(stripped <= dummy, 0, stripped)
        total = jnp.where(lengths > 0, stripped, total)

    stripped = total  # post-trim, pre-suffix output length

    if suffix and add_dummy_prefix:
        # all-space rows under remove_extra_whitespaces stay empty (the
        # reference's leading-space pre-loop returns early,
        # normalizer.cc:103-121)
        put = lengths > 0
        if remove_extra_whitespaces:
            put = put & (total > 0)
        for j in range(wsl):
            out = out.at[rows, jnp.where(put, jnp.minimum(total + j, n_out),
                                         n_out)].set(ws_arr[j], mode="drop")
        total = jnp.where(put, total + wsl, total)

    if with_alignment:
        # the trim sets consumed to the first TRIMMED byte's mapping
        # (normalizer.cc:197); untouched rows end at the full consumed
        # input length. Suffix-mode ws bytes and the final entry both
        # carry that value (:204-206).
        strip_safe = jnp.minimum(stripped, n_out)
        at_strip = jnp.take_along_axis(
            n2o_full, strip_safe[:, None], axis=1)[:, 0]
        consumed_final = jnp.where(stripped < untrimmed, at_strip,
                                   lengths.astype(jnp.int32))
        o2 = jnp.arange(n_out + 1, dtype=jnp.int32)[None, :]
        n2o = jnp.where(o2 < stripped[:, None], n2o_full,  # [B, n_out+1]
                        consumed_final[:, None])
        return out[:, :n_out], total, n2o, early_empty

    return out[:, :n_out], total


class BatchNormalizer:
    """Host wrapper around the jitted device normalizer."""

    def __init__(self, spec, treat_whitespace_as_suffix: bool = False,
                 user_pieces=None):
        self.t = NormalizerTables(spec, treat_whitespace_as_suffix,
                                  user_pieces=user_pieces)

    def normalize(self, batch: np.ndarray, lengths: np.ndarray,
                  with_alignment: bool = False):
        """batch uint8[B, N] raw bytes -> (out uint8[B, n_out], len[B])
        (+ norm_to_orig int32[B, n_out + 1] and the all-whitespace
        early-return mask bool[B] when with_alignment)."""
        t = self.t
        n_out = t.out_width(batch.shape[1])
        return normalize_batch(
            t.units, t.esc_pool, t.v_attr, t.ws_arr, t.fffd_arr,
            jnp.asarray(batch), jnp.asarray(lengths),
            max_rule_len=t.max_rule_len, root_state=t.root_state,
            n_out=n_out, ws_len=t.ws_len, max_rep_len=t.max_rep_len,
            add_dummy_prefix=t.add_dummy_prefix,
            remove_extra_whitespaces=t.remove_extra_whitespaces,
            escape_whitespaces=t.escape_whitespaces, suffix=t.suffix,
            arcs=t.arcs, with_alignment=with_alignment,
            u_units=t.u_units, u_max_len=t.u_max_len,
            u_root_state=t.u_root_state, cp_rule=t.cp_rule)
