# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Regression: charsmap rules whose replacement expands past the nominal
13x bound (the built-in NFKC worst case, U+FDFA) must not overflow the
native normalizer's output buffer.

A custom rule is legal via compile_charsmap / normalization_rule_tsv and
may expand arbitrarily — e.g. one byte -> 40 spaces, tripled again by
escape_whitespaces = 120x. The native spm_normalize now takes an output
capacity and returns a -2 sentinel; the single-string wrapper grows and
retries, the batch wrappers fall back to the exact Python path.
"""

import numpy as np
import pytest

from sentencepiece_tpu.normalizer import charsmap as charsmap_lib
from sentencepiece_tpu.normalizer.normalize import Normalizer
from sentencepiece_tpu.proto.spec import NormalizerSpec


def _spec(remove_extra_whitespaces):
    blob = charsmap_lib.compile_charsmap({(ord("A"),): tuple([0x20] * 40)})
    return NormalizerSpec(
        name="user_defined", precompiled_charsmap=blob,
        add_dummy_prefix=True,
        remove_extra_whitespaces=remove_extra_whitespaces,
        escape_whitespaces=True)


@pytest.mark.parametrize("remove_ws", [False, True])
def test_expanding_rule_matches_exact_path(remove_ws):
    spec = _spec(remove_ws)
    nz = Normalizer(spec)
    nz_exact = Normalizer(spec)
    nz_exact._native = False  # force the pure-Python reference path
    for text in ("AB" * 200, "A" * 200 + "B", "A", "xAx"):
        out, n2o = nz.normalize(text)
        out2, n2o2 = nz_exact.normalize(text)
        assert out == out2
        assert np.array_equal(n2o, n2o2)


def test_batch_path_falls_back_not_crashes():
    nz = Normalizer(_spec(False))
    native = nz._native_impl()
    if native is None:
        pytest.skip("native library unavailable")
    r = native.normalize_batch([b"AB" * 200] * 3)
    # either served with correct content or refused (None -> caller falls
    # back to the exact path); never a heap overflow
    if r is not None:
        out, off = r
        exact = Normalizer(_spec(False))
        exact._native = False
        want = exact.normalize("AB" * 200)[0]
        blob = out.tobytes()
        for i in range(3):
            assert blob[off[i]:off[i + 1]] == want
