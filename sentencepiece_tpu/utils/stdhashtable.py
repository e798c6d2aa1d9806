# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""libstdc++-exact `std::unordered_map<uint64, T>` emulation + Fingerprint.

Why this exists: the reference BPE trainer's `UpdateActiveSymbols`
(bpe_model_trainer.cc:156-183) partial_sorts symbols pulled from an
`unordered_map<uint64, Symbol*>` in ITERATION ORDER, and at the cutoff
among equal-frequency symbols the retained active subset — and therefore
the trained merge tail — depends on that order. Byte-exact large-vocab BPE
training requires reproducing it.

libstdc++ `_Hashtable` facts emulated here:
  * one global singly-linked node list; buckets point at the node BEFORE
    their first node; iteration walks the global list;
  * insertion of a new node into an empty bucket splices it at the global
    list FRONT (and fixes up the bucket that previously owned the old
    front); insertion into a non-empty bucket splices after the bucket's
    before-node (i.e. at the bucket's front);
  * `std::hash<uint64>` is the identity; bucket = hash % bucket_count;
  * growth: `_Prime_rehash_policy` with max_load_factor 1.0 — on insert,
    if (size + 1) > bucket_count, rehash to the lowest prime >
    2 * bucket_count (via the prime list); rehash walks the global list in
    order re-splicing each node with the same front-insertion rule, which
    REVERSES each new bucket's chain relative to walk order;
  * erase unlinks from the global list and fixes bucket pointers.

`FingerprintCat`/`mix` are ports of util.h:604-650 (Bob Jenkins' 64-bit
mix), used as the symbol cache key.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple

M64 = (1 << 64) - 1

# libstdc++ __prime_list (hashtable-aux.cc) — enough of the prefix for
# vocab-scale maps.
PRIMES = [
    2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61,
    67, 71, 73, 79, 83, 89, 97, 103, 109, 113, 127, 137, 139, 149, 157,
    167, 179, 193, 199, 211, 227, 241, 257, 277, 293, 313, 337, 359, 383,
    409, 439, 467, 503, 541, 577, 619, 661, 709, 761, 823, 887, 953, 1031,
    1109, 1193, 1289, 1381, 1493, 1613, 1741, 1879, 2029, 2179, 2357,
    2549, 2753, 2971, 3209, 3469, 3739, 4027, 4349, 4703, 5087, 5503,
    5953, 6427, 6949, 7517, 8123, 8783, 9497, 10273, 11113, 12011, 12983,
    14033, 15173, 16411, 17749, 19183, 20753, 22447, 24281, 26267, 28411,
    30727, 33223, 35933, 38873, 42043, 45481, 49201, 53201, 57557, 62233,
    67307, 72817, 78779, 85229, 92203, 99733, 107897, 116731, 126271,
    136607, 147793, 159871, 172933, 187091, 202409, 218971, 236897,
    256279, 277261, 299951, 324503, 351061, 379787, 410857, 444487,
    480881, 520241, 562841, 608903, 658753, 712697, 771049, 834181,
    902483, 976369, 1056323, 1142821, 1236397, 1337629, 1447153, 1565659,
    1693859, 1832561, 1982627, 2144977, 2320627, 2510653, 2716249,
]


def mix64(a: int, b: int, c: int) -> Tuple[int, int, int]:
    """util.h:604-645 64-bit Jenkins mix (unsigned wraparound)."""
    a = (a - b - c) & M64
    a ^= c >> 43
    b = (b - c - a) & M64
    b ^= (a << 9) & M64
    c = (c - a - b) & M64
    c ^= b >> 8
    a = (a - b - c) & M64
    a ^= c >> 38
    b = (b - c - a) & M64
    b ^= (a << 23) & M64
    c = (c - a - b) & M64
    c ^= b >> 5
    a = (a - b - c) & M64
    a ^= c >> 35
    b = (b - c - a) & M64
    b ^= (a << 49) & M64
    c = (c - a - b) & M64
    c ^= b >> 11
    a = (a - b - c) & M64
    a ^= c >> 12
    b = (b - c - a) & M64
    b ^= (a << 18) & M64
    c = (c - a - b) & M64
    c ^= b >> 22
    return a, b, c


def fingerprint_cat(x: int, y: int) -> int:
    """util.h:646-650."""
    b = 0xE08C1D668B756F82
    _, _, y = mix64(x, b, y)
    return y


class _Node:
    __slots__ = ("key", "value", "nxt")

    def __init__(self, key: int, value):
        self.key = key
        self.value = value
        self.nxt: Optional["_Node"] = None


class StdUnorderedMap:
    """uint64-keyed unordered_map with libstdc++ iteration order."""

    def __init__(self):
        self._head: Optional[_Node] = None        # global list head
        self._size = 0
        self._nbkt = 1
        # bucket -> node BEFORE the bucket's first node; None = bucket
        # starts at global head; absent = empty bucket
        self._bbegin: Dict[int, Optional[_Node]] = {}
        self._nodes: Dict[int, _Node] = {}        # key -> node

    def __len__(self) -> int:
        return self._size

    def __contains__(self, key: int) -> bool:
        return key in self._nodes

    def get(self, key: int, default=None):
        n = self._nodes.get(key)
        return n.value if n is not None else default

    def __getitem__(self, key: int):
        return self._nodes[key].value

    def _bucket(self, key: int, nbkt: Optional[int] = None) -> int:
        return key % (nbkt or self._nbkt)

    def _insert_bucket_begin(self, bkt: int, node: _Node) -> None:
        """_M_insert_bucket_begin: splice node at bucket front."""
        before = self._bbegin.get(bkt, "EMPTY")
        if before == "EMPTY":
            # empty bucket: node goes to the global FRONT
            node.nxt = self._head
            if self._head is not None:
                # the old front's bucket now starts after `node`
                old_bkt = self._bucket(self._head.key)
                self._bbegin[old_bkt] = node
            self._head = node
            self._bbegin[bkt] = None
        else:
            first = self._head if before is None else before.nxt
            node.nxt = first
            if before is None:
                self._head = node
            else:
                before.nxt = node

    def _maybe_rehash(self) -> None:
        # first insert always resizes (_M_next_resize starts at 0)
        if self._nbkt != 1 and self._size + 1 <= self._nbkt:
            return
        # _Prime_rehash_policy::_M_need_rehash (max_load_factor 1.0):
        # min_bkts = max(new_size, 11 on the very first resize);
        # target = max(min_bkts + 1, 2 * bucket_count);
        # new = lowest prime in __prime_list >= target.
        size_after = self._size + 1
        min_bkts = max(size_after, 11 if self._nbkt == 1 else 0)
        need = max(min_bkts + 1, self._nbkt * 2)
        new_n = next(p for p in PRIMES if p >= need)
        # walk the global list in order, re-splicing into fresh buckets
        order: List[_Node] = []
        n = self._head
        while n is not None:
            order.append(n)
            n = n.nxt
        self._head = None
        self._bbegin = {}
        self._nbkt = new_n
        for node in order:
            node.nxt = None
            self._insert_bucket_begin(self._bucket(node.key), node)

    def insert(self, key: int, value) -> bool:
        """insert-if-absent; returns True if inserted."""
        if key in self._nodes:
            return False
        self._maybe_rehash()
        node = _Node(key, value)
        self._nodes[key] = node
        self._insert_bucket_begin(self._bucket(key), node)
        self._size += 1
        return True

    def erase(self, key: int) -> bool:
        node = self._nodes.pop(key, None)
        if node is None:
            return False
        bkt = self._bucket(key)
        before = self._bbegin[bkt]
        prev = self._head if before is not None else None
        if before is None and self._head is node:
            prev = None
        else:
            prev = before if before is not None else None
            if prev is None:
                prev = None
                cur = self._head
                while cur is not None and cur.nxt is not node:
                    cur = cur.nxt
                prev = cur
            else:
                cur = prev
                while cur.nxt is not node:
                    cur = cur.nxt
                prev = cur
        nxt = node.nxt
        # fix bucket begins
        nxt_bkt = self._bucket(nxt.key) if nxt is not None else None
        first_of_bkt = (self._head if before is None else before.nxt)
        if prev is None:
            self._head = nxt
        else:
            prev.nxt = nxt
        if first_of_bkt is node:
            # node was its bucket's first
            if nxt is not None and nxt_bkt == bkt:
                pass  # bucket begin (before-node) unchanged
            else:
                del self._bbegin[bkt]
                if nxt is not None:
                    # next node's bucket now begins at prev ( = node's prev )
                    self._bbegin[nxt_bkt] = prev
        else:
            if nxt is not None and nxt_bkt != bkt:
                self._bbegin[nxt_bkt] = prev if prev is not None else None
        self._size -= 1
        return True

    def items(self) -> Iterator[Tuple[int, object]]:
        n = self._head
        while n is not None:
            yield n.key, n.value
            n = n.nxt

    def values(self) -> Iterator[object]:
        n = self._head
        while n is not None:
            yield n.value
            n = n.nxt
