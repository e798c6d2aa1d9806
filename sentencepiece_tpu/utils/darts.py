# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Double-array trie: wire-compatible reader + builder, vectorized search.

The reference stores both the normalizer charsmap and the vocab matcher as
darts-clone double arrays (reference third_party/darts_clone/darts.h). The
on-disk unit format (32-bit little-endian units) is:

  internal unit:  bit31=0, bits[10..30]+bit9 encode offset, bit8=has_leaf,
                  bits[0..7]=label;  offset() = (u>>10) << ((u & 0x200) >> 6)
  leaf unit:      bit31=1, bits[0..30]=value

Traversal is pure XOR-addressed gather: child(pos, c) = base(pos) ^ c with
base(pos) = pos ^ offset(unit[pos]) (darts.h:468-505). We keep that format so
reference-produced blobs load here unchanged and blobs we compile load in the
reference, but re-express search as dense numpy/JAX array programs: a single
``prefix_matches_dense`` walk computes, for every byte position of the input
at once, the trie value at every match depth — the building block for both
the normalizer and the lattice populate kernels.

The builder here is a fresh double-array constructor (BFS placement with a
free-list); it emits valid darts-clone units but does not replicate
darts-clone's DAWG-based layout byte-for-byte (not required: the tries are
rebuilt from pieces at load time; only blob *semantics* must match).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_OFFSET_MAX_SMALL = 1 << 21
_IS_LEAF = np.uint32(1 << 31)
_HAS_LEAF = np.uint32(1 << 8)


def _offsets(units: np.ndarray) -> np.ndarray:
    """Vectorized DoubleArrayUnit::offset() (darts.h:72-74)."""
    return (units >> np.uint32(10)) << ((units & np.uint32(1 << 9)) >> np.uint32(6))


def _labels(units: np.ndarray) -> np.ndarray:
    """Vectorized DoubleArrayUnit::label() (darts.h:68-70)."""
    return units & np.uint32((1 << 31) | 0xFF)


class DoubleArray:
    """Reader over a darts-clone unit array."""

    def __init__(self, units: np.ndarray):
        assert units.dtype == np.uint32
        self.units = units
        self._max_key_len: Optional[int] = None

    @classmethod
    def from_blob(cls, blob: bytes) -> "DoubleArray":
        return cls(np.frombuffer(blob, dtype="<u4").astype(np.uint32))

    def to_blob(self) -> bytes:
        return self.units.astype("<u4").tobytes()

    def __len__(self) -> int:
        return len(self.units)

    # -- scalar searches (exact reference semantics) ------------------------
    def common_prefix_search(self, data: bytes, pos: int = 0,
                             max_results: Optional[int] = None
                             ) -> List[Tuple[int, int]]:
        """All (value, length) prefix matches of data[pos:] (darts.h:468-505)."""
        units = self.units
        results: List[Tuple[int, int]] = []
        node_pos = np.uint32(0)
        unit = units[0]
        node_pos = node_pos ^ _offsets(unit)
        n = len(data)
        for i in range(pos, n):
            c = np.uint32(data[i])
            node_pos = node_pos ^ c
            unit = units[int(node_pos)]
            if _labels(unit) != c:
                break
            node_pos = node_pos ^ _offsets(unit)
            if unit & _HAS_LEAF:
                results.append((int(units[int(node_pos)] & np.uint32(0x7FFFFFFF)),
                                i - pos + 1))
                if max_results is not None and len(results) >= max_results:
                    break
        return results

    def exact_match_search(self, key: bytes) -> int:
        """Value for ``key`` or -1 (darts.h:435-465)."""
        units = self.units
        node_pos = np.uint32(0)
        unit = units[0]
        for i in range(len(key)):
            node_pos = node_pos ^ _offsets(unit) ^ np.uint32(key[i])
            unit = units[int(node_pos)]
            if _labels(unit) != np.uint32(key[i]):
                return -1
        if not (unit & _HAS_LEAF):
            return -1
        leaf = units[int(node_pos ^ _offsets(unit))]
        return int(leaf & np.uint32(0x7FFFFFFF))

    # -- dense vectorized search --------------------------------------------
    def prefix_matches_dense(self, data: np.ndarray, max_depth: int
                             ) -> np.ndarray:
        """Trie values for every (position, match_length) pair at once.

        Args:
          data: uint8[n] input bytes.
          max_depth: maximum key length to probe (the longest key in the trie).

        Returns:
          values: int32[n, max_depth]; values[i, d] is the trie value of the
          length-(d+1) key match starting at byte i, or -1 if no such match.

        This is the array-program form of commonPrefixSearch run at all n
        positions simultaneously — the same access pattern the TPU kernel
        uses (gather over the unit table in HBM).
        """
        n = len(data)
        units = self.units
        values = np.full((n, max_depth), -1, dtype=np.int32)
        if n == 0:
            return values
        root_base = _offsets(units[0])
        state = np.full(n, root_base, dtype=np.uint32)
        alive = np.ones(n, dtype=bool)
        b = data.astype(np.uint32)
        idx = np.arange(n, dtype=np.int64)
        for d in range(max_depth):
            src = idx + d
            in_range = src < n
            c = np.where(in_range, b[np.minimum(src, n - 1)], np.uint32(0))
            node_pos = state ^ c
            # Gather; out-of-alive lanes read unit 0 harmlessly.
            node_pos_safe = np.where(alive & in_range, node_pos, np.uint32(0))
            unit = units[node_pos_safe]
            ok = alive & in_range & (_labels(unit) == c)
            state = np.where(ok, node_pos ^ _offsets(unit), state)
            leaf_pos = np.where(ok & ((unit & _HAS_LEAF) != 0), state,
                                np.uint32(0))
            leaf_unit = units[leaf_pos]
            has = ok & ((unit & _HAS_LEAF) != 0)
            values[:, d] = np.where(
                has, (leaf_unit & np.uint32(0x7FFFFFFF)).astype(np.int32), -1)
            alive = ok
            if not alive.any():
                break
        return values

    # -- structural queries --------------------------------------------------
    def items(self) -> List[Tuple[bytes, int]]:
        """Enumerate every (key, value) pair by BFS over reachable
        states (the inverse of build; used to derive device-side twin
        tables — e.g. the cp-direct charsmap — from wire blobs)."""
        units = self.units
        out: List[Tuple[bytes, int]] = []
        all_labels = np.arange(1, 256, dtype=np.uint32)
        # (state base, prefix, edge has_leaf) — the value row at base^0
        # is only meaningful when the ENTERING edge carried HAS_LEAF
        # (an unused slot's 0xFFFFFFFF filler also has bit 31 set)
        frontier = [(np.uint32(_offsets(units[0])), b"", False)]
        while frontier:
            nxt = []
            for base, prefix, has_leaf in frontier:
                slot0 = int(base)
                if has_leaf and slot0 < len(units):
                    u0 = units[slot0]
                    if u0 >> np.uint32(31):
                        out.append(
                            (prefix, int(u0 & np.uint32(0x7FFFFFFF))))
                slots = (base ^ all_labels).astype(np.int64)
                inb = slots < len(units)
                u = units[np.where(inb, slots, 0)]
                ok = inb & (_labels(u) == all_labels)
                for lab in np.nonzero(ok)[0]:
                    uu = u[lab]
                    nb = np.uint32(slots[lab]) ^ _offsets(uu)
                    nxt.append((nb,
                                prefix + bytes([int(all_labels[lab])]),
                                bool(uu & np.uint32(1 << 8))))
            frontier = nxt
            if len(out) > 10_000_000:
                raise RuntimeError("trie enumeration runaway")
        return out

    def max_key_length(self) -> int:
        """Longest key in the trie, by BFS over reachable states."""
        if self._max_key_len is not None:
            return self._max_key_len
        units = self.units
        all_labels = np.arange(1, 256, dtype=np.uint32)
        frontier = np.array([_offsets(units[0])], dtype=np.uint32)
        depth = 0
        seen_depth = 0
        while len(frontier):
            depth += 1
            flat = (frontier[:, None] ^ all_labels[None, :]).reshape(-1)
            labs = np.tile(all_labels, len(frontier))
            mask_inb = flat < len(units)
            flat = flat[mask_inb]
            labs = labs[mask_inb]
            u = units[flat]
            ok = _labels(u) == labs
            if ok.any():
                seen_depth = depth
            # next state base = slot ^ offset (slot == flat == base^label)
            nxt = flat[ok] ^ _offsets(u[ok])
            frontier = np.unique(nxt)
            if depth > 4096:
                raise RuntimeError("trie too deep / cyclic")
        self._max_key_len = seen_depth
        return seen_depth


def build(keys: Sequence[bytes], values: Optional[Sequence[int]] = None
          ) -> DoubleArray:
    """Build a double array from keys (values default to 0..n-1 rank order).

    Keys need not be pre-sorted (we sort internally, matching
    DoubleArray::build's requirement); values align with the *caller's* key
    order, like darts-clone. Uses the native builder when available
    (~50x faster); this Python path is the fallback and the spec.
    """
    try:
        from .. import native

        units = native.darts_build(list(keys), values)
        if units is not None:
            return DoubleArray(units)
    except Exception:
        pass
    n = len(keys)
    if values is None:
        order = sorted(range(n), key=lambda i: keys[i])
        values = [0] * n
        for rank, i in enumerate(order):
            values[i] = rank
    pairs = sorted(zip(keys, values))
    for k, v in pairs:
        if not k:
            raise ValueError("empty key not allowed")
        if 0 in k:
            raise ValueError("NUL byte in key not allowed")
        if not (0 <= v < (1 << 31)):
            raise ValueError(f"value out of range: {v}")

    # Build an explicit trie (children maps).
    children: List[Dict[int, int]] = [{}]
    terminal: Dict[int, int] = {}
    for k, v in pairs:
        node = 0
        for c in k:
            nxt = children[node].get(c)
            if nxt is None:
                children.append({})
                nxt = len(children) - 1
                children[node][c] = nxt
            node = nxt
        if node in terminal:
            raise ValueError(f"duplicate key: {k!r}")
        terminal[node] = v

    # Place nodes: XOR double-array with a free-slot bitmap. Each base value
    # must be used by at most ONE node: with XOR addressing, two nodes sharing
    # a base would make each one's children reachable from the other (label
    # check passes), producing false matches. darts-clone reserves offsets
    # exclusively for the same reason.
    size = 1024
    used = np.zeros(size, dtype=bool)        # slot occupied by a unit
    base_taken = np.zeros(size, dtype=bool)  # value used as some node's base
    units = np.zeros(size, dtype=np.uint32)
    used[0] = True

    def ensure(cap: int):
        nonlocal size, used, base_taken, units
        while cap >= size:
            grow = size
            size *= 2
            used = np.concatenate([used, np.zeros(grow, dtype=bool)])
            base_taken = np.concatenate([base_taken, np.zeros(grow, dtype=bool)])
            units = np.concatenate([units, np.zeros(grow, dtype=np.uint32)])

    def find_base(pos: int, labels: np.ndarray) -> int:
        # Search bases so that pos^base is encodable, the base is not yet any
        # node's base, and all child slots are free.
        # Offset encodable iff off < 2^21, or (off & 0xFF)==0 and off>>8 < 2^21.
        start = 1
        while True:
            ensure(start + 8192 + 256)
            bases = np.arange(start, start + 8192, dtype=np.uint32)
            offs = bases ^ np.uint32(pos)
            enc = (offs < _OFFSET_MAX_SMALL) | (
                ((offs & np.uint32(0xFF)) == 0)
                & ((offs >> np.uint32(8)) < _OFFSET_MAX_SMALL))
            slots = bases[:, None] ^ labels[None, :].astype(np.uint32)
            ensure(int(slots.max()))
            free = ~used[slots.astype(np.int64)]
            cand = enc & free.all(axis=1) & ~base_taken[bases.astype(np.int64)]
            hit = np.argmax(cand)
            if cand[hit]:
                return int(bases[hit])
            start += 8192

    def encode_offset(pos: int, base: int) -> np.uint32:
        off = pos ^ base
        if off < _OFFSET_MAX_SMALL:
            return np.uint32(off << 10)
        if off & 0xFF:
            raise RuntimeError("unencodable offset")
        return np.uint32(((off >> 8) << 10) | (1 << 9))

    # BFS placement; queue holds (trie_node, array_pos, entry_label).
    from collections import deque

    queue = deque([(0, 0, 0)])
    while queue:
        node, pos, entry_label = queue.popleft()
        kids = children[node]
        has_value = node in terminal
        labels = ([0] if has_value else []) + sorted(kids)
        labels_arr = np.array(labels, dtype=np.uint32)
        base = find_base(pos, labels_arr)
        ensure(int((np.uint32(base) ^ labels_arr.max()).item()) + 1)
        base_taken[base] = True
        # Mark slots used.
        for c in labels:
            slot = base ^ c
            ensure(slot)
            assert not used[slot]
            used[slot] = True
        # Write this node's unit.
        unit = encode_offset(pos, base)
        if has_value:
            unit |= _HAS_LEAF
        unit |= np.uint32(entry_label)
        units[pos] = unit
        if has_value:
            units[base] = _IS_LEAF | np.uint32(terminal[node])
        for c in sorted(kids):
            queue.append((kids[c], base ^ c, c))

    top = int(np.nonzero(used)[0].max()) + 1
    # Pad to a 256 boundary so any XOR access state^c (state a valid base,
    # c a byte) stays in bounds, as darts-clone's block allocator guarantees.
    # Filler 0xFFFFFFFF never label-matches (label() = 0x800000FF).
    padded = ((top - 1) | 255) + 1
    out = np.full(padded, 0xFFFFFFFF, dtype=np.uint32)
    out[:top] = units[:top]
    out[:top][~used[:top]] = 0xFFFFFFFF
    return DoubleArray(out)
