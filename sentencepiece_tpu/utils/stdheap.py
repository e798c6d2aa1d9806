# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""libstdc++-exact binary heap (std::priority_queue emulation).

The reference's n-best search pops hypotheses from a
``std::priority_queue<Hypothesis*, vector, fx-less>`` (unigram_model.cc:
391-405). Among EQUAL fx values the pop order is determined by libstdc++'s
``__push_heap`` / ``__adjust_heap`` mechanics, and the reference's n-best
output order depends on it — so we reproduce those algorithms verbatim
(max-heap with a strict less-than comparator, sift-up on push; pop moves
the last element into the hole via __adjust_heap's prefer-second-child
sift-down followed by a sift-up).
"""

from __future__ import annotations

from typing import Callable, List, TypeVar

T = TypeVar("T")


class StdPriorityQueue:
    """std::priority_queue with libstdc++ heap semantics.

    ``less(a, b)`` is the comparator (strict weak ordering); the TOP is the
    maximum element under it.
    """

    def __init__(self, less: Callable[[T, T], bool]):
        self._v: List[T] = []
        self._less = less

    def __len__(self) -> int:
        return len(self._v)

    def top(self) -> T:
        return self._v[0]

    def push(self, value: T) -> None:
        # std::push_heap: sift up while parent < value
        v = self._v
        v.append(value)
        hole = len(v) - 1
        top = 0
        while hole > top and self._less(v[(hole - 1) // 2], value):
            v[hole] = v[(hole - 1) // 2]
            hole = (hole - 1) // 2
        v[hole] = value

    def pop(self) -> T:
        # std::pop_heap + pop_back
        v = self._v
        result = v[0]
        value = v.pop()
        if v:
            self._adjust_heap(0, len(v), value)
        return result

    def _adjust_heap(self, hole: int, length: int, value: T) -> None:
        """libstdc++ __adjust_heap: sift the hole down along the larger
        child (preferring the SECOND child on ties), then sift ``value``
        up from the final hole (__push_heap)."""
        v = self._v
        top = hole
        second = hole
        while second < (length - 1) // 2:
            second = 2 * (second + 1)
            if self._less(v[second], v[second - 1]):
                second -= 1
            v[hole] = v[second]
            hole = second
        if length % 2 == 0 and second == (length - 2) // 2:
            second = 2 * (second + 1)
            v[hole] = v[second - 1]
            hole = second - 1
        # __push_heap(first, hole, top, value)
        while hole > top and self._less(v[(hole - 1) // 2], value):
            v[hole] = v[(hole - 1) // 2]
            hole = (hole - 1) // 2
        v[hole] = value

    def to_sorted_desc(self) -> List[T]:
        """Pop everything (heap order)."""
        out = []
        while self._v:
            out.append(self.pop())
        return out


def _push_heap(v: List[T], hole: int, top: int, value: T,
               less: Callable[[T, T], bool]) -> None:
    while hole > top and less(v[(hole - 1) // 2], value):
        v[hole] = v[(hole - 1) // 2]
        hole = (hole - 1) // 2
    v[hole] = value


def _adjust_heap(v: List[T], first: int, hole: int, length: int, value: T,
                 less: Callable[[T, T], bool]) -> None:
    top = hole
    second = hole
    while second < (length - 1) // 2:
        second = 2 * (second + 1)
        if less(v[first + second], v[first + second - 1]):
            second -= 1
        v[first + hole] = v[first + second]
        hole = second
    if length % 2 == 0 and second == (length - 2) // 2:
        second = 2 * (second + 1)
        v[first + hole] = v[first + second - 1]
        hole = second - 1
    # __push_heap within [first, first+length)
    while hole > top and less(v[first + (hole - 1) // 2], value):
        v[first + hole] = v[first + (hole - 1) // 2]
        hole = (hole - 1) // 2
    v[first + hole] = value


def std_partial_sort(v: List[T], middle: int,
                     less: Callable[[T, T], bool]) -> None:
    """Exact libstdc++ std::partial_sort(v.begin(), v.begin()+middle,
    v.end(), less) — heap-select then sort-heap. The order of EQUAL
    elements (and which of them survive the cutoff) matches libstdc++,
    which the reference's UpdateActiveSymbols depends on
    (bpe_model_trainer.cc:175-180)."""
    n = len(v)
    if n == 0:
        return
    # NOTE: middle == 0 is NOT a no-op in libstdc++ — __heap_select still
    # runs its sift loop against v[0], swapping "better" elements into
    # slot 0 one at a time; reproduced faithfully below.
    middle = min(middle, n)
    # __make_heap on [0, middle)
    if middle >= 2:
        parent = (middle - 2) // 2
        while True:
            value = v[parent]
            _adjust_heap(v, 0, parent, middle, value, less)
            if parent == 0:
                break
            parent -= 1
    # __heap_select: sift smaller-than-top elements in
    for i in range(middle, n):
        if less(v[i], v[0]):
            # __pop_heap(first, middle, i): move top to i, re-adjust
            value = v[i]
            v[i] = v[0]
            _adjust_heap(v, 0, 0, middle, value, less)
    # __sort_heap on [0, middle)
    last = middle
    while last > 1:
        last -= 1
        value = v[last]
        v[last] = v[0]
        _adjust_heap(v, 0, 0, last, value, less)


def std_partial_sort_freq_desc(v, middle: int) -> None:
    """std_partial_sort specialized to ``less(a, b) = a.freq > b.freq``
    (UpdateActiveSymbols' comparator) with the comparison inlined — the
    generic lambda dispatch dominates the trainer profile otherwise.
    Heap mechanics identical to std_partial_sort."""
    n = len(v)
    if n == 0:
        return
    middle = min(middle, n)

    def adjust(hole, length, value):
        top = hole
        second = hole
        vf = value.freq
        while second < (length - 1) // 2:
            second = 2 * (second + 1)
            if v[second].freq > v[second - 1].freq:
                second -= 1
            v[hole] = v[second]
            hole = second
        if length % 2 == 0 and second == (length - 2) // 2:
            second = 2 * (second + 1)
            v[hole] = v[second - 1]
            hole = second - 1
        while hole > top:
            parent = (hole - 1) // 2
            if not (v[parent].freq > vf):
                break
            v[hole] = v[parent]
            hole = parent
        v[hole] = value

    if middle >= 2:
        parent = (middle - 2) // 2
        while True:
            adjust(parent, middle, v[parent])
            if parent == 0:
                break
            parent -= 1
    top0 = v[0]
    for i in range(middle, n):
        if v[i].freq > top0.freq:
            value = v[i]
            v[i] = top0
            adjust(0, middle, value)
            top0 = v[0]
    # __sort_heap on [0, middle)
    last = middle
    while last > 1:
        last -= 1
        value = v[last]
        v[last] = v[0]
        adjust(0, last, value)
