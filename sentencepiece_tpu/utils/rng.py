# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""PRNG contract.

The reference draws sampling randomness from a thread-local mt19937 seeded
from std::random_device (reference src/util.cc:379-382) — unreproducible by
design. This framework pins a documented contract instead:

  * Host sampling uses a process-wide numpy ``Generator`` (PCG64). Call
    ``set_seed`` for reproducible runs; default seeding is OS entropy,
    matching the reference's behavior in spirit.
  * Device (JAX) sampling uses threefry keys derived from an explicit
    ``jax.random.key(seed)`` passed by the caller.
"""

from __future__ import annotations

import threading
from typing import Optional

import numpy as np

_state = threading.local()
_seed: Optional[int] = None


def set_seed(seed: Optional[int]) -> None:
    """Set the global sampling seed (None = fresh OS entropy per thread)."""
    global _seed
    _seed = seed
    _state.__dict__.clear()


def get_generator() -> np.random.Generator:
    gen = getattr(_state, "gen", None)
    if gen is None:
        gen = np.random.default_rng(_seed)
        _state.gen = gen
    return gen
