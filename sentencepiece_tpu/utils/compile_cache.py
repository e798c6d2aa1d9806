# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Persistent XLA compilation cache for the device engines.

The sparse BPE trainer's refresh/epoch programs cost 134 + 147 s of
TPU compile at BASELINE config-5 scale (docs/design.md rule 14), and
the device EM trainer compiles one E-step program per (rows, width)
bucket shape — all of it pure recomputation on every fresh process.
JAX's persistent compilation cache keyed by (HLO, backend, flags)
eliminates the recompiles across processes (measured on the axon v5e
rig: a 4.5 s compile replays in 0.16 s from a warm cache).

Enabled by every device-engine entry point (train facade, TpuTokenizer,
bench drivers). Opt-out: SPM_COMPILE_CACHE=0. Directory override:
SPM_COMPILE_CACHE=/path (default ~/.cache/sentencepiece_tpu/xla).
"""

from __future__ import annotations

import os

_done = False


def enable() -> None:
    """Idempotently point JAX at the persistent compile cache dir.

    Must run before the first jit compile to cover it; safe (no-op for
    already-compiled programs) at any time.
    """
    global _done
    if _done:
        return
    _done = True
    spec = os.environ.get("SPM_COMPILE_CACHE", "")
    if spec == "0":
        return
    try:
        import jax

        # CPU-only processes skip the persistent cache: XLA:CPU AOT
        # entries bake the compile machine's ISA features and another
        # host loading them warns/SIGILLs (observed 2026-08-20); CPU
        # compiles are cheap anyway. The win is the TPU backend.
        if jax.default_backend() == "cpu":
            return
        if spec and spec != "1":
            path = spec
        else:
            # same directory scheme as tpu/pipeline.py (one cache for
            # the whole package, fingerprinted by libtpu/XLA flags and
            # host CPU)
            from ..tpu import pipeline as _p

            path = os.path.join(
                os.environ.get("SPM_TPU_CACHE_DIR",
                               "/tmp/sentencepiece_tpu_jax_cache"),
                _p._cache_fingerprint())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # trainer programs worth caching compile in >= ~0.5 s; smaller
        # entries would thrash the dir with thousands of tiny kernels
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
    except Exception:  # pragma: no cover - cache is an optimization only
        pass
