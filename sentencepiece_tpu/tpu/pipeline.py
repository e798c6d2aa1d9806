# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""End-to-end device tokenizer: normalize + segment in one jitted program.

The full reference encode hot path (sentencepiece_processor.cc:562-576 =
Normalize → Model::Encode) as a single XLA program over a padded batch:
raw UTF-8 bytes in, token ids out. Host work is reduced to numpy packing
of the input lines and unpadding of the results.

Rows whose normalized form overflows the static encode width (pathological
expansion; the charsmap worst case is ~13 bytes out per byte in) are
detected on device and re-encoded through the exact host path.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import normalize as tpu_normalize
from .encode import unigram_encode_batch

# Viterbi lattice scan implementation: the Mosaic kernel
# (pallas_kernels.viterbi_bp_pallas) measured 10% faster than the XLA
# lax.scan on chip (121 vs 135 ms/batch, docs/design.md "The Pallas
# question") and is the default on TPU; CPU runs the XLA scan (the
# Pallas interpreter is test-only). SPM_TPU_PALLAS_SCAN=1/0 overrides.


def _use_pallas_scan() -> bool:
    env = os.environ.get("SPM_TPU_PALLAS_SCAN", "")
    if env in ("0", "1"):
        return env == "1"
    import jax as _jax
    return _jax.default_backend() != "cpu"

# Persistent compilation cache: these programs are large (multi-minute XLA
# compiles on TPU); caching makes every process after the first fast.
# The directory is FINGERPRINTED by host CPU features + the XLA/platform
# env: the jax cache key does not fully cover the CPU AOT target, and
# loading an entry compiled under different flags SIGILLs/segfaults
# (observed: cpu_aot_loader machine-feature mismatch, then a segfault in
# get_executable_and_time during the test suite).
def _cache_fingerprint() -> str:
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:  # pragma: no cover
        flags = ""
    # the host CPU model is part of the key: XLA:CPU AOT entries bake
    # the compile machine's ISA features, and loading them on another
    # host warns/SIGILLs (cpu_aot_loader; observed r5 when a cache dir
    # outlived a machine change). TPU executables don't care, so the
    # only cost is a cold cache after a host swap.
    try:
        with open("/proc/cpuinfo") as f:
            cpu = next((ln for ln in f if ln.startswith("model name")), "")
    except OSError:  # pragma: no cover
        cpu = ""
    key = "|".join([flags, os.environ.get("XLA_FLAGS", ""),
                    os.environ.get("JAX_PLATFORMS", ""), cpu])
    return hashlib.sha256(key.encode()).hexdigest()[:10]


try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.environ.get("SPM_TPU_CACHE_DIR",
                                    "/tmp/sentencepiece_tpu_jax_cache"),
                     _cache_fingerprint()))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - older jax
    pass


def pack_lines(lines: Sequence[bytes], width: int, pad_rows_to: int = 8
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized numpy packing of byte strings into a padded matrix."""
    B = len(lines)
    Bp = pad_rows_to
    while Bp < B:
        Bp *= 2
    lens = np.fromiter((min(len(l), width) for l in lines), np.int32,
                       count=B)
    arr = np.zeros((Bp, width), np.uint8)
    if B:
        concat = np.frombuffer(
            b"".join(l[:width] for l in lines), np.uint8)
        starts = np.zeros(B, np.int64)
        starts[1:] = np.cumsum(lens[:-1])
        flat_idx = (np.repeat(np.arange(B, dtype=np.int64) * width, lens)
                    + np.arange(len(concat), dtype=np.int64)
                    - np.repeat(starts, lens))
        arr.reshape(-1)[flat_idx] = concat
    out_lens = np.zeros(Bp, np.int32)
    out_lens[:B] = lens
    return arr, out_lens


class TpuTokenizer:
    """Raw text -> ids entirely on device (the TF EncodeDense analog,
    tensorflow/sentencepiece_processor_ops.cc:387, with the model itself
    running on the TPU)."""

    BUCKETS = (128, 512, 2048, 4096)

    def __init__(self, processor, add_bos=False, add_eos=False,
                 reverse=False, pad_id: Optional[int] = None,
                 mesh=None, axis: str = "dp"):
        """``mesh``: optional jax.sharding.Mesh — batch rows shard over
        ``axis`` (pure data parallelism; XLA partitions the pipeline with
        no collectives, so it scales linearly over ICI)."""
        from .encode import UnigramBatchEncoder
        from ..proto.spec import ModelType, PieceType
        from ..utils import compile_cache

        compile_cache.enable()

        self.mesh = mesh
        self.mesh_axis = axis

        self.processor = processor
        ts = processor.model_proto.trainer_spec
        mt = ts.model_type if ts else ModelType.UNIGRAM
        self.model_type = mt
        self._bpe = None
        self.enc = None
        self._span = None
        self._host_opts = (add_bos, add_eos, reverse)
        if mt == ModelType.BPE:
            from .bpe_encode import BpeBatchEncoder

            self._bpe = BpeBatchEncoder(processor, add_bos=add_bos,
                                        add_eos=add_eos, reverse=reverse,
                                        pad_id=pad_id)
        elif mt == ModelType.UNIGRAM:
            self.enc = UnigramBatchEncoder(processor, add_bos=add_bos,
                                           add_eos=add_eos, reverse=reverse,
                                           pad_id=pad_id)
        else:
            # WORD/CHAR: device span-lookup segmentation (span_encode.py)
            from .span_encode import SpanBatchEncoder

            mode = "word" if mt == ModelType.WORD else "char"
            self._span = SpanBatchEncoder(processor, mode, add_bos=add_bos,
                                          add_eos=add_eos, reverse=reverse,
                                          pad_id=pad_id)
        suffix = bool(ts.treat_whitespace_as_suffix) if ts else False
        # user-defined symbols survive normalization as atomic spans
        # (the reference's PrefixMatcher injection,
        # sentencepiece_processor.cc:126-129, normalizer.cc:239-243);
        # the device normalizer carries them as a second trie. Exotic
        # pieces (spaces / U+2581 / invalid UTF-8) set user_host_only
        # and encode() keeps the exact host path.
        types = processor.model.types
        user_idx = np.nonzero(types == PieceType.USER_DEFINED)[0]
        user_pieces = [processor.model._piece_bytes[int(i)]
                       for i in user_idx]
        self.norm = tpu_normalize.NormalizerTables(
            processor.model_proto.normalizer_spec, suffix,
            user_pieces=user_pieces or None)
        self._fns = {}

    @staticmethod
    def enc_width(n_in: int) -> int:
        """Default (cap) encode-stage width for an input width: 1.5x + 8.

        Every lattice/merge stage's cost is linear in this width, so it is
        sized for REAL normalization expansion, not the worst case: text
        expands ~1.35x at most under nmt_nfkc + whitespace escaping
        (each space becomes a 3-byte U+2581; measured per-row p100 on
        botchan at width 128 is 111 bytes, wagahai 1.24x). Rows whose
        normalized form exceeds it are caught by the device overflow
        mask and re-encoded through the exact host path — correctness
        never depends on this bound (the true charsmap worst case is
        13x/byte, which no static width would chase)."""
        return 3 * n_in // 2 + 8

    def pick_enc_width(self, arr: np.ndarray, lens: np.ndarray,
                       n_in: int) -> int:
        """Batch-adaptive encode width: a host-side upper bound on each
        row's normalized byte length, quantized to multiples of 32
        (bounding the number of compiled programs) and capped at
        enc_width(n_in).

        The bound is exact for rows with no charsmap match: the dummy
        prefix plus, per input byte, ws_len for a space, 3 for a byte
        in a malformed sequence (U+FFFD), else 1 (collapse and trim
        only shrink). Charsmap replacements can exceed it — such rows
        flip the overflow mask and re-encode on the exact host path,
        the same guard the cap relies on. On ASCII text this runs the
        encode stage at ~n_in instead of 1.5x n_in."""
        from . import utf8

        cap = self.enc_width(n_in)
        B, N = arr.shape
        if B == 0:
            return cap
        pos_in = np.arange(N)[None, :] < lens[:, None]
        b = arr.astype(np.int32)
        # the SAME classifier the device normalizer runs (tpu/utf8.py,
        # instantiated on numpy here) — the overflow guard is sound
        # because both sides classify bytes identically
        char_len, valid = utf8.utf8_class(np, arr, lens.astype(np.int32))
        covered = utf8.covered_continuations(np, arr, valid, char_len)
        is_cont = (b & 0xC0) == 0x80
        # per-byte contribution: spaces emit the ws token, bytes inside
        # valid chars emit themselves, everything else FFFDs (3 bytes)
        wsl = self.norm.ws_len if self.norm.escape_whitespaces else 1
        contrib = np.where(
            b == 0x20, wsl,
            np.where(is_cont & covered, 1,
                     np.where(valid, 1, 3)))
        est = int((np.where(pos_in, contrib, 0)).sum(axis=1).max()
                  ) + (wsl if self.norm.add_dummy_prefix else 0)
        w = -(-(est + 8) // 32) * 32
        return min(max(w, 32), cap)

    def _pipeline_core(self, n_in: int, w_enc: Optional[int] = None):
        """(core, tables) for one input width: ``core(batch, lengths,
        *tables)`` is the whole pipeline as a pure function whose device
        tables are explicit arguments (never closed over — closed-over
        arrays bake into jitted traces as XLA constants, exploding
        compile time). Model config enters through the closure as plain
        Python scalars (static)."""
        t = self.norm
        enc = self.enc
        if w_enc is None:
            w_enc = self.enc_width(n_in)
        n_arcs = tuple(t.arcs) if t.arcs is not None else ()
        u_tbl = (t.u_units,) if t.u_units is not None else ()
        # the cp-direct charsmap path is a TPU optimization; composed
        # into the full pipeline it deterministically segfaults the XLA
        # CPU compiler late in the test suite (LLVM state dependent —
        # the same program compiles fine in a fresh process). CPU runs
        # keep the plain walk; the cp path's exactness is covered by a
        # direct normalize_batch test (test_units.py).
        use_cp = (t.cp_rule is not None
                  and jax.default_backend() != "cpu")
        cp_tbl = (t.cp_rule,) if use_cp else ()
        norm_tables = (t.units, t.esc_pool, t.v_attr, t.ws_arr,
                       t.fffd_arr) + n_arcs + u_tbl + cp_tbl
        NT = len(norm_tables)
        NA = len(n_arcs)

        def norm_stage(batch, lengths, *nt):
            norm_out, norm_len = tpu_normalize.normalize_batch(
                *nt[:5], batch, lengths,
                max_rule_len=t.max_rule_len, root_state=t.root_state,
                n_out=w_enc, ws_len=t.ws_len, max_rep_len=t.max_rep_len,
                add_dummy_prefix=t.add_dummy_prefix,
                remove_extra_whitespaces=t.remove_extra_whitespaces,
                escape_whitespaces=t.escape_whitespaces, suffix=t.suffix,
                arcs=nt[5:5 + NA] if NA else None,
                u_units=nt[5 + NA] if u_tbl else None,
                u_max_len=t.u_max_len, u_root_state=t.u_root_state,
                cp_rule=nt[NT - 1] if cp_tbl else None)
            overflow = norm_len > w_enc
            enc_len = jnp.minimum(norm_len, w_enc)
            # fusion fence: when both stages compile as ONE program, XLA
            # fuses normalizer output computation into the encoder's
            # walk, re-serializing gathers (measured +114 ms on the full
            # pipeline vs the sum of the stages)
            norm_out, enc_len = jax.lax.optimization_barrier(
                (norm_out, enc_len))
            return norm_out, enc_len, overflow

        if self._bpe is not None:
            from .bpe_encode import (utf8_to_cp_batch, merge_kernel,
                                     bpe_encode_batch_scan, user_frz_batch)
            bpe = self._bpe
            # user-defined symbols: frozen-span split on device (the
            # scan kernel carries the frz lanes; the parallel kernel
            # does not, so user models pin the scan kernel)
            user_dev = bool(bpe.user_pieces) and bool(u_tbl)
            bpe_merge = bpe_encode_batch_scan if user_dev \
                else merge_kernel()
            tables = norm_tables + (bpe.pair_keys, bpe.pair_new,
                                    bpe.pair_score, bpe.cp_to_sym,
                                    bpe.sym_to_id)

            # cp count <= min(input chars + dummy prefix, normalized
            # bytes) — only charsmap replacements expand CHAR counts,
            # and those rows overflow to the exact host path — so the
            # merge loop, whose cost is linear in width, runs at ~n_in
            # instead of the 1.5x byte width
            w_cp = min(n_in + 16, w_enc)

            def core_bpe(batch, lengths, *tabs):
                nt, bt = tabs[:NT], tabs[NT:]
                norm_out, enc_len, overflow = norm_stage(batch, lengths,
                                                         *nt)
                cps, cp_len = utf8_to_cp_batch(norm_out, enc_len,
                                               out_w=w_cp)
                overflow = overflow | (cp_len > w_cp)
                cp_len = jnp.minimum(cp_len, w_cp)
                kw = {}
                if user_dev:
                    kw["frz"] = user_frz_batch(
                        nt[5 + NA], norm_out, enc_len, w_cp=w_cp,
                        u_max_len=t.u_max_len,
                        u_root_state=t.u_root_state, U0=bpe.U0)
                ids, n_ids, bad_unused = bpe_merge(
                    bt[0], bt[1], bt[2], bt[3], bt[4], cps, cp_len,
                    universe=bpe.U, max_merges=w_cp - 1,
                    unk_id=bpe.unk_id, add_bos=bpe.add_bos,
                    add_eos=bpe.add_eos, reverse=bpe.reverse,
                    bos_id=bpe.bos_id, eos_id=bpe.eos_id,
                    pad_id=bpe.pad_id, pack_bits=bpe.pack_bits, **kw)
                # rows with an UNUSED piece in the output re-encode on
                # the exact host path (rev_merge resegmentation,
                # bpe_model.cc:171-189) through the overflow machinery
                return ids, n_ids, overflow | bad_unused

            return core_bpe, tables

        if self._span is not None:
            from .span_encode import span_encode_batch
            se = self._span
            s_arcs = tuple(se.arcs) if se.arcs is not None else ()
            su_tbl = (se.u_units,) if se.u_units is not None else ()
            tables = norm_tables + (se.units, se.zero_scores) \
                + su_tbl + s_arcs

            def core_span(batch, lengths, *tabs):
                nt, st = tabs[:NT], tabs[NT:NT + 2]
                rest = tabs[NT + 2:]
                su = rest[0] if su_tbl else None
                at = rest[len(su_tbl):] or None
                norm_out, enc_len, overflow = norm_stage(batch, lengths,
                                                         *nt)
                ids, n_ids = span_encode_batch(
                    st[0], st[1], norm_out, enc_len,
                    mode=se.mode, max_depth=se.max_depth,
                    unk_id=se.unk_id, root_state=se.root_state,
                    suffix=se.suffix, add_bos=se.add_bos,
                    add_eos=se.add_eos, reverse=se.reverse,
                    bos_id=se.bos_id, eos_id=se.eos_id, pad_id=se.pad_id,
                    arcs=at, bands=se.bands, u_units=su,
                    u_max_len=se.u_max_len,
                    u_root_state=se.u_root_state)
                return ids, n_ids, overflow

            return core_span, tables

        arcs = enc.arcs if enc.arcs is not None else ()
        tables = norm_tables + (enc.units, enc.lat_score_table,
                                enc.unk_score) + tuple(arcs)

        def core_unigram(batch, lengths, *tabs):
            nt, ut = tabs[:NT], tabs[NT:NT + 3]
            at = tabs[NT + 3:] if len(tabs) > NT + 3 else None
            norm_out, enc_len, overflow = norm_stage(batch, lengths, *nt)
            ids, n_ids = unigram_encode_batch(
                ut[0], ut[1], norm_out, enc_len, ut[2],
                max_depth=enc.max_depth, unk_id=enc.unk_id,
                root_state=enc.root_state,
                add_bos=enc.add_bos, add_eos=enc.add_eos,
                reverse=enc.reverse, bos_id=enc.bos_id, eos_id=enc.eos_id,
                pad_id=enc.pad_id, use_pallas=_use_pallas_scan(),
                arcs=at, bands=enc.bands)
            return ids, n_ids, overflow

        return core_unigram, tables

    def bench_loop_fn(self, n_in: int, w_enc: Optional[int] = None):
        """One-dispatch benchmark program: ``fn(batch, lengths, n)``
        runs the pipeline ``n`` times inside a ``fori_loop`` (dynamic
        trip count — one compile serves every window size) and returns
        a checksum scalar.

        The loop body XORs ONE byte of the input batch (last row, first
        column — a padding row whenever the row count was padded up, so
        results are unchanged) with a carry-derived bit, making every
        iteration data-dependent on the previous one; XLA cannot prove
        the pipeline ignores that byte, so the body cannot be hoisted
        out of the loop as loop-invariant. (A value-preserving
        ``optimization_barrier(carry & 0)`` XOR does NOT work: the
        ``& 0`` folds to a constant before the barrier and the body
        becomes hoistable.) Timing this program measures pure on-device
        execution — immune to async-dispatch acks and host-link latency
        (on the tunneled rig, ``block_until_ready`` can return at
        enqueue time, making dispatch-loop timing measure the enqueue
        rate, not the chip; see bench.py)."""
        core, tables = self._pipeline_core(n_in, w_enc)

        @jax.jit
        def loop(batch, lengths, n, *tabs):
            def body(_, carry):
                b = batch.at[-1, 0].set(batch[-1, 0] ^ (carry & 1))
                _, n_ids, overflow = core(b, lengths, *tabs)
                mix = jnp.sum(n_ids, dtype=jnp.int32) + jnp.sum(
                    overflow, dtype=jnp.int32)
                return (mix & 0xFF).astype(jnp.uint8) ^ carry
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))

        def fn(batch, lengths, n):
            return loop(batch, lengths, jnp.int32(n), *tables)

        return fn

    def _pipeline_fn(self, n_in: int, w_enc: Optional[int] = None):
        """The fused pipeline for one (input width, encode width) pair
        (cached): a thin wrapper binding the device tables to
        _pipeline_core."""
        key = (n_in, w_enc)
        if key in self._fns:
            return self._fns[key]
        core, tables = self._pipeline_core(n_in, w_enc)

        def fn(batch, lengths):
            return core(batch, lengths, *tables)

        self._fns[key] = fn
        return fn

    def _shard(self, arr, lens):
        """Pad rows to a mesh-divisible count and device_put with a
        batch-sharded layout; no-op without a mesh."""
        if self.mesh is None:
            return jnp.asarray(arr), jnp.asarray(lens)
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = self.mesh.shape[self.mesh_axis]
        B = arr.shape[0]
        Bp = -(-B // n_dev) * n_dev
        if Bp != B:
            arr = np.concatenate(
                [arr, np.zeros((Bp - B,) + arr.shape[1:], arr.dtype)])
            lens = np.concatenate([lens, np.zeros(Bp - B, lens.dtype)])
        sh = NamedSharding(self.mesh, P(self.mesh_axis))
        return (jax.device_put(arr, NamedSharding(self.mesh,
                                                  P(self.mesh_axis, None))),
                jax.device_put(lens, sh))

    def encode_to_padded(self, lines: Sequence[bytes], width: int
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        arr, lens = pack_lines(lines, width)
        fn = self._pipeline_fn(width, self.pick_enc_width(arr, lens, width))
        a, l = self._shard(arr, lens)
        ids, n_ids, overflow = fn(a, l)
        return ids, n_ids, overflow

    def normalize_with_offsets(self, texts: Sequence
                               ) -> List[Tuple[str, List[int]]]:
        """Device-side normalization WITH byte alignment: per text,
        (normalized string, norm_to_orig) exactly as the reference
        Normalizer::Normalize emits them (normalizer.cc:88-211; empty
        output => empty alignment) — the offsets/surface-bearing
        SentencePieceText APIs consume this mapping. One jitted pass
        produces bytes, lengths, and the alignment (tpu/normalize.py
        with_alignment)."""
        t = self.norm
        if t.user_host_only:
            return [self.processor.normalizer.normalize(
                s if isinstance(s, str)
                else bytes(s).decode("utf-8", "surrogateescape"))
                for s in texts]
        raw = [s.encode("utf-8", "surrogateescape") if isinstance(s, str)
               else bytes(s) for s in texts]
        width = max(8, max((len(b) for b in raw), default=8))
        arr, lens = pack_lines(raw, width)
        n_out = t.out_width(width)
        out, total, n2o, early = tpu_normalize.normalize_batch(
            t.units, t.esc_pool, t.v_attr, t.ws_arr, t.fffd_arr,
            jnp.asarray(arr), jnp.asarray(lens),
            max_rule_len=t.max_rule_len, root_state=t.root_state,
            n_out=n_out, ws_len=t.ws_len, max_rep_len=t.max_rep_len,
            add_dummy_prefix=t.add_dummy_prefix,
            remove_extra_whitespaces=t.remove_extra_whitespaces,
            escape_whitespaces=t.escape_whitespaces, suffix=t.suffix,
            arcs=t.arcs, with_alignment=True,
            u_units=t.u_units, u_max_len=t.u_max_len,
            u_root_state=t.u_root_state, cp_rule=t.cp_rule)
        out, total, n2o, early = (np.asarray(out), np.asarray(total),
                                  np.asarray(n2o), np.asarray(early))
        res = []
        for i, b in enumerate(raw):
            n = int(total[i])
            s = bytes(out[i, :n]).decode("utf-8", "surrogateescape")
            # empty input and the all-whitespace early return carry an
            # EMPTY alignment; an input normalized away by deletion
            # rules carries the size-1 alignment (normalizer.cc:94,115)
            align = [] if (not b or early[i]) else n2o[i, :n + 1].tolist()
            res.append((s, align))
        return res

    def encode(self, texts: Sequence) -> List[List[int]]:
        """Ragged ids per input text; inputs bucketed by raw byte length.

        All device work is dispatched before any result is read back:
        host<->device readbacks can stall subsequent dispatches on some
        interconnects, so the dispatch wave and the download wave are kept
        separate."""
        if self.norm.user_host_only:
            # user-defined symbols the device normalizer cannot carry
            # (spaces / U+2581 / invalid UTF-8): exact host path
            return [self.processor.encode_as_ids(
                t if isinstance(t, str)
                else bytes(t).decode("utf-8", "surrogateescape"))
                for t in texts]
        if self._bpe is not None and self._bpe.host_only:
            # unused pieces (rev_merge resegmentation): exact host path
            return self._bpe.encode(list(texts))
        if self._span is not None and self._span.host_only:
            # char model with user-defined symbols: multi-char spans via
            # the PrefixMatcher — exact host path
            add_bos, add_eos, reverse = self._host_opts
            opts = ":".join(o for o, f in
                            [("reverse", reverse), ("bos", add_bos),
                             ("eos", add_eos)] if f)
            if opts:
                self.processor.set_encode_extra_options(opts)
            return [self.processor.encode_as_ids(t) for t in texts]
        raw = [t.encode("utf-8", "surrogateescape") if isinstance(t, str)
               else bytes(t) for t in texts]
        order = sorted(range(len(raw)), key=lambda i: len(raw[i]))
        results: List[Optional[List[int]]] = [None] * len(raw)
        i = 0
        MAXB = 4096
        pending = []  # (group, bucket, device results)
        while i < len(order):
            blen = len(raw[order[i]])
            bucket = next((b for b in self.BUCKETS if blen <= b),
                          self.BUCKETS[-1])
            group = []
            while (i < len(order) and len(group) < MAXB
                   and len(raw[order[i]]) <= bucket):
                group.append(order[i])
                i += 1
            pending.append((group, bucket,
                            self.encode_to_padded(
                                [raw[g] for g in group], bucket)))
        for group, bucket, (ids, n_ids, overflow) in pending:
            ids = np.asarray(ids)
            n_ids = np.asarray(n_ids)
            overflow = np.asarray(overflow)
            for j, gi in enumerate(group):
                if overflow[j] or len(raw[gi]) > bucket:
                    results[gi] = self.processor.encode_as_ids(
                        raw[gi].decode("utf-8", "surrogateescape"))
                else:
                    results[gi] = ids[j, :n_ids[j]].tolist()
        return results  # type: ignore[return-value]

    # -- TF-ops-analog surfaces (tensorflow/sentencepiece_processor_ops.cc) --
    def encode_dense(self, texts: Sequence
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """(ids padded with pad_id, sequence lengths) — the
        SentencepieceEncodeDense analog (ops.cc:387,486-530)."""
        ragged = self.encode(texts)
        B = len(ragged)
        T = max((len(r) for r in ragged), default=1)
        pad = (self.enc.pad_id if self.enc is not None
               else self._bpe.pad_id if self._bpe is not None
               else self._span.pad_id if self._span is not None else 0)
        out = np.full((B, T), pad, np.int32)
        lens = np.zeros(B, np.int32)
        for i, r in enumerate(ragged):
            out[i, :len(r)] = r
            lens[i] = len(r)
        return out, lens

    def encode_sparse(self, texts: Sequence
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(indices [n,2], values [n], dense_shape [2]) — the
        SentencepieceEncodeSparse analog (ops.cc:531-580)."""
        ragged = self.encode(texts)
        indices = []
        values = []
        maxlen = 0
        for i, r in enumerate(ragged):
            maxlen = max(maxlen, len(r))
            for j, v in enumerate(r):
                indices.append((i, j))
                values.append(v)
        return (np.asarray(indices, np.int64).reshape(-1, 2),
                np.asarray(values, np.int32),
                np.asarray([len(ragged), maxlen], np.int64))

    def nbest_encode(self, texts: Sequence,
                     nbest_size: int) -> List[List[List[int]]]:
        """N-best segmentations per text (the processor's NBestEncode,
        unigram_model.cc:339-478). Unigram models run the device k-best
        scan with host rescoring + tie-gated fallback (byte-exact ids —
        see UnigramBatchEncoder.nbest_ids); other model families and
        host-only configurations delegate to the exact host path
        (the reference's non-unigram NBestEncode is 1-best)."""
        if (self.enc is None or self.norm.user_host_only
                or nbest_size <= 1):
            return [[list(map(int, p))
                     for p in self.processor.nbest_encode_as_ids(
                         t, nbest_size)] for t in texts]
        return self.enc.nbest_ids(list(texts), int(nbest_size),
                                  processor=self.processor)

    def sample_encode(self, texts: Sequence, nbest_size, alpha,
                      rng=None) -> List[List[int]]:
        """Per-ROW sampled segmentation — the TF ops' nbest_size/alpha
        path (ops.cc:244-305): both parameters accept a scalar or a
        per-row sequence, and each row dispatches independently —
        nbest 0/1 -> deterministic Encode; nbest < 0 -> lattice sampling
        (unigram, device forward-filter/backward-sample with per-row
        alpha) or BPE-dropout (device, grouped by dropout value);
        nbest > 1 -> n-best draw (unigram device k-best Viterbi).
        One batch can mix all of these."""
        from .encode import _per_row

        texts = list(texts)
        B = len(texts)
        if rng is None:
            from ..utils.rng import get_generator

            rng = get_generator()
        if self.norm.user_host_only:
            from .encode import _per_row as _pr

            nbh = _pr(nbest_size, B).astype(np.int64)
            alh = _pr(alpha, B)
            return [self.processor.sample_encode_as_ids(
                t, int(nbh[i]), float(alh[i]), rng=rng)
                if nbh[i] not in (0, 1) else self.processor.encode_as_ids(t)
                for i, t in enumerate(texts)]
        nb = _per_row(nbest_size, B).astype(np.int64)
        al = _per_row(alpha, B)
        results: List[Optional[List[int]]] = [None] * B

        det = [i for i in range(B) if nb[i] in (0, 1)]
        samp = [i for i in range(B) if nb[i] < 0]
        from_nbest = [i for i in range(B) if nb[i] > 1]

        if det:
            for i, r in zip(det, self.encode([texts[i] for i in det])):
                results[i] = r
        if samp:
            sub = [texts[i] for i in samp]
            if self.enc is not None:
                rs = self.enc.sample(sub, al[samp], rng=rng)
            elif self._bpe is not None and not self._bpe.host_only:
                # bpe_dropout_batch takes one dropout probability per
                # dispatch: group rows by value (few distinct in practice)
                rs: List[Optional[List[int]]] = [None] * len(sub)
                by_p = {}
                for j, i in enumerate(samp):
                    by_p.setdefault(float(al[i]), []).append(j)
                for p, js in sorted(by_p.items()):
                    out = self._bpe.sample([sub[j] for j in js], p, rng=rng)
                    for j, o in zip(js, out):
                        rs[j] = o
            else:
                rs = [self.processor.sample_encode_as_ids(
                          t, -1, float(a), rng=rng)
                      for t, a in zip(sub, al[samp])]
            for i, r in zip(samp, rs):
                results[i] = r
        if from_nbest:
            if self.enc is not None:
                by_k = {}
                for i in from_nbest:
                    by_k.setdefault(int(nb[i]), []).append(i)
                for k, rows in sorted(by_k.items()):
                    out = self.enc.sample_from_nbest(
                        [texts[i] for i in rows], k, al[rows], rng=rng)
                    for i, o in zip(rows, out):
                        results[i] = o
            else:
                for i in from_nbest:
                    results[i] = self.processor.sample_encode_as_ids(
                        texts[i], int(nb[i]), float(al[i]), rng=rng)
        return results  # type: ignore[return-value]

    def decode(self, ids_batch: Sequence[Sequence[int]]) -> List[str]:
        """Batched detokenization — the SentencepieceDecode analog
        (ops.cc:581-643)."""
        return [self.processor.decode_ids(list(ids)) for ids in ids_batch]

    # -- piece accessor ops (ops.cc GetPieceSize/PieceToId/IdToPiece/
    # GetPieceType registrations :486-643) --------------------------------
    def piece_size(self) -> int:
        return self.processor.get_piece_size()

    def piece_to_id(self, pieces: Sequence[str]) -> List[int]:
        return [self.processor.piece_to_id(p) for p in pieces]

    def id_to_piece(self, ids: Sequence[int]) -> List[str]:
        return [self.processor.id_to_piece(int(i)) for i in ids]

    def get_piece_type(self, ids: Sequence[int]) -> List[bool]:
        """True where the id is UNKNOWN/CONTROL/UNUSED (the TF op's
        "piece type" = not a real sentencepiece)."""
        return [self.processor.is_unknown(int(i))
                or self.processor.is_control(int(i))
                or self.processor.is_unused(int(i)) for i in ids]
