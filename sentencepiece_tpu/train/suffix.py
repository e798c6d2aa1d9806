# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Suffix array + suffix-tree internal node enumeration.

Replaces the reference's vendored esaxx/sais (third_party/esaxx/{esa.hxx,
sais.hxx}) for unigram seed extraction (unigram_model_trainer.cc:163).
The suffix array is built with numpy prefix-doubling (O(n log n) lexsorts)
— the SA itself is unique, so any correct construction matches sais byte
for byte. The internal-node enumeration replicates esa.hxx:37-90's
stack-based traversal EXACTLY, because the reference tie-breaks seed
candidates by (score desc, node index asc) and the node index depends on
this emission order.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def suffix_array(arr: np.ndarray) -> np.ndarray:
    """SA of int array; native SA-IS when available, else numpy prefix
    doubling (the SA is unique, so both match sais byte for byte)."""
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.int64)
    try:
        from .. import native

        if int(arr.max()) < (1 << 30):
            sa = native.sais(arr, int(arr.max()) + 1)
            if sa is not None:
                # keep int32: the native consumers (esa_nodes,
                # seed_filter) take int32, and widening costs two
                # corpus-sized copies per train on the hot path
                return sa
    except Exception:
        pass
    rank = np.unique(arr, return_inverse=True)[1].astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    k = 1
    idx = np.arange(n, dtype=np.int64)
    while True:
        # key = (rank[i], rank[i+k]); -1 past the end
        rank2 = np.full(n, -1, np.int64)
        rank2[:n - k] = rank[k:]
        order = np.lexsort((rank2, rank))
        # recompute ranks
        key_r = rank[order]
        key_r2 = rank2[order]
        new_rank = np.empty(n, np.int64)
        diff = np.ones(n, bool)
        diff[1:] = (key_r[1:] != key_r[:-1]) | (key_r2[1:] != key_r2[:-1])
        new_rank[order] = np.cumsum(diff) - 1
        rank = new_rank
        sa = order
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def plcp_array(arr: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Permuted LCP (Karkkainen CPM'09), as in esa.hxx:41-59."""
    n = len(arr)
    psi = np.empty(n, np.int64)
    psi[sa[0]] = sa[n - 1]
    psi[sa[1:]] = sa[:-1]
    plcp = np.zeros(n, np.int64)
    h = 0
    for i in range(n):
        j = psi[i]
        while i + h < n and j + h < n and arr[i + h] == arr[j + h]:
            h += 1
        plcp[i] = h
        if h > 0:
            h -= 1
    return plcp


def internal_nodes(arr: np.ndarray
                   ) -> Tuple[np.ndarray, List[Tuple[int, int, int]]]:
    """(SA, [(L, R, D), ...]) in esa.hxx emission order.

    L/R bound the SA interval of the node; D is its string depth;
    freq of the substring = R - L.
    """
    n = len(arr)
    sa = suffix_array(arr)
    if n == 0:
        return sa, []
    try:
        from .. import native

        if int(arr.max()) <= 0x7FFFFFFF:
            nodes_np = native.esa_nodes(arr, sa)
            if nodes_np is not None:
                return sa, nodes_np
    except Exception:
        pass
    plcp = plcp_array(arr, sa)
    H = plcp[sa]
    H[0] = -1
    nodes: List[Tuple[int, int, int]] = []
    # esa.hxx:66-89 stack traversal, replicated verbatim
    stack: List[Tuple[int, int]] = [(-1, -1)]
    for i in range(n + 1):
        cur = (i, -1 if i == n else int(H[i]))
        cand = stack[-1]
        while cand[1] > cur[1]:
            if i - cand[0] > 1:
                nodes.append((cand[0], i, cand[1]))
            cur = (cand[0], cur[1])
            stack.pop()
            cand = stack[-1]
        if cand[1] < cur[1]:
            stack.append(cur)
        if i == n:
            break
        stack.append((i, n - int(sa[i]) + 1))
    return sa, nodes
