# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Pallas TPU kernels for the lattice recurrences.

The unigram lattice scans (Viterbi max-plus and forward logsumexp — the EM
E-step hot loop, reference unigram_model.cc:222-261, 272-328) are banded
recurrences over dense score arrays: pure shifted adds and reductions,
which Mosaic lowers well. One kernel invocation runs the whole recurrence
for a 128-word lane block entirely in VMEM; the K-deep alpha window is a
loop-carried register value updated with `pltpu.roll`, so nothing bounces
through HBM between positions.

Mosaic constraints shaped the layout (lane-dim dynamic indexing must be
128-aligned; there is no in-kernel reverse): WORDS live on the 128-lane
axis, POSITIONS on the leading axis (dynamic row reads/writes are allowed
there), and the piece-length axis sits on sublanes.

(The trie-walk table lookups stay in XLA with barrier-isolated gathers —
Mosaic's gather support cannot express XOR-addressed table walks; see
docs/design.md.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


def _compiler_params(P: int, K: int, Wp: int, n_out: int):
    """Mosaic params with an explicit VMEM budget. The default 16 MB
    scoped limit rejects wide batches: when the pallas_call sits inside
    a fori_loop program, XLA keeps the whole [P+1, Wp] outputs scoped in
    VMEM (double-buffered), which at JA widths (P=544, Wp=2048) is
    ~18 MB. A v5e core has 128 MB of VMEM; budget what the kernel
    actually touches, with 2x double-buffering headroom."""
    pad8 = lambda n: -(-n // 8) * 8
    block_in = pad8(P) * K * LANES * 4
    outs = n_out * pad8(P + 1) * Wp * 4
    need = 2 * (block_in + outs) + (4 << 20)
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(110 << 20, max(32 << 20, need)))


def _scan_kernel(sc_ref, out_ref, *, K: int, P: int, mode: str):
    """sc_ref: [P, K, 128] scores (sc[p, k, w] = piece of len k+1 ending at
    position p+1 of word w); out_ref: [P + 1, 128] alpha."""
    out_ref[0, :] = jnp.zeros((LANES,), jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (K, LANES), 0)
    win0 = jnp.where(row_ids == 0, 0.0, NEG_INF)  # win[j] = alpha[p - j]

    def body(p, win):
        cand = win + sc_ref[p]          # [K, 128]
        if mode == "viterbi":
            red = jnp.max(cand, axis=0)
        else:
            m = jnp.max(cand, axis=0)
            e = jnp.where(cand - m[None, :] > -60.0,
                          jnp.exp(cand - m[None, :]), 0.0)
            red = m + jnp.log(jnp.sum(e, axis=0))
            red = jnp.where(m <= NEG_INF / 2, NEG_INF, red)
        out_ref[p + 1, :] = red
        rolled = pltpu.roll(win, shift=1, axis=0)
        return jnp.where(row_ids == 0, red[None, :], rolled)

    jax.lax.fori_loop(0, P, body, win0)


def _auto_interpret() -> bool:
    """Interpret mode off the TPU (CPU tests); Mosaic-compile on TPU."""
    return jax.default_backend() == "cpu"


def _scan_bp_kernel(maxp_ref, sc_ref, alpha_ref, bp_ref, *, K: int, P: int):
    """Viterbi alpha + backpointer (chosen piece byte length) per position.

    Tie-break matches the XLA scan in encode.unigram_encode_batch (and the
    reference lattice, unigram_model.cc:222-261): among equal-score
    candidates pick the LONGEST piece — expressed reduction-style as the
    max k whose candidate equals the row max (no in-kernel reverse).

    ``maxp_ref`` (SMEM, shape (1,)) is a DYNAMIC position bound: the
    recurrence runs only positions < maxp_ref[0] (= max normalized byte
    length over the batch) instead of the static padded width P. The
    rows beyond the bound are zero-filled up front so the outputs stay
    deterministic; downstream backtraces never read past a row's own
    length, which is <= the bound."""
    alpha_ref[...] = jnp.zeros((P + 1, LANES), jnp.float32)
    bp_ref[...] = jnp.ones((P + 1, LANES), jnp.int32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (K, LANES), 0)
    klen = row_ids + 1
    win0 = jnp.where(row_ids == 0, 0.0, NEG_INF)  # win[j] = alpha[p - j]

    def body(p, win):
        cand = win + sc_ref[p]          # [K, 128]
        red = jnp.max(cand, axis=0)
        kbest = jnp.max(jnp.where(cand == red[None, :], klen, 0), axis=0)
        alpha_ref[p + 1, :] = red
        bp_ref[p + 1, :] = kbest
        rolled = pltpu.roll(win, shift=1, axis=0)
        return jnp.where(row_ids == 0, red[None, :], rolled)

    jax.lax.fori_loop(0, jnp.minimum(maxp_ref[0], P), body, win0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def viterbi_bp_pallas(sc_end: jnp.ndarray, max_p: jnp.ndarray | None = None,
                      interpret: bool | None = None):
    """(alpha[W, P+1] f32, bp[W, P+1] i32) for end-aligned sc_end[W, P, K].

    bp[w, p] is the byte length of the best piece ending at position p
    (bp[:, 0] = 1, unused) — drop-in for the lax.scan backpointers in
    unigram_encode_batch. ``interpret=None`` auto-selects interpreter
    mode on the CPU backend. ``max_p`` (optional int32 scalar) bounds
    the recurrence dynamically to the batch's real max length; rows
    past it come back zero-filled (alpha 0, bp 1)."""
    if interpret is None:
        interpret = _auto_interpret()
    W, P, K = sc_end.shape
    if max_p is None:
        max_p = jnp.int32(P)
    grid = (W + LANES - 1) // LANES
    Wp = grid * LANES
    sc_t = jnp.pad(sc_end.astype(jnp.float32), ((0, Wp - W), (0, 0), (0, 0)),
                   constant_values=NEG_INF).transpose(1, 2, 0)
    kern = functools.partial(_scan_bp_kernel, K=K, P=P)
    alpha, bp = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((P, K, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((P + 1, LANES), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((P + 1, LANES), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((P + 1, Wp), jnp.float32),
                   jax.ShapeDtypeStruct((P + 1, Wp), jnp.int32)),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(P, K, Wp, 2),
    )(jnp.reshape(max_p.astype(jnp.int32), (1,)), sc_t)
    return alpha.T[:W], bp.T[:W]


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def lattice_scan_pallas(sc_end: jnp.ndarray, mode: str = "viterbi",
                        interpret: bool = False) -> jnp.ndarray:
    """alpha[W, P+1] for end-aligned scores sc_end[W, P, K] float32.

    ``interpret=True`` runs the kernel in the Pallas interpreter (for CPU
    tests)."""
    W, P, K = sc_end.shape
    grid = (W + LANES - 1) // LANES
    Wp = grid * LANES
    # [W, P, K] -> [P, K, Wp]
    sc_t = jnp.pad(sc_end.astype(jnp.float32), ((0, Wp - W), (0, 0), (0, 0)),
                   constant_values=NEG_INF).transpose(1, 2, 0)
    kern = functools.partial(_scan_kernel, K=K, P=P, mode=mode)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((P, K, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((P + 1, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P + 1, Wp), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(P, K, Wp, 1),
    )(sc_t)
    return out.T[:W]
