# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Phase timing + optional device tracing.

The reference has no profiling beyond timestamped INFO logs at phase
boundaries (SURVEY.md §5); the TPU build adds structured per-phase wall
times and an env-gated `jax.profiler` trace:

  SPM_TPU_PROFILE_DIR=/tmp/trace  -> wraps phases in jax.profiler traces
  phase timings always log at INFO under `sentencepiece_tpu.profile`.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Dict, Iterator

log = logging.getLogger("sentencepiece_tpu.profile")

_totals: Dict[str, float] = {}


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    """Time a named phase; nest freely. Logs `phase <name>: <secs>`."""
    trace_dir = os.environ.get("SPM_TPU_PROFILE_DIR")
    ctx = contextlib.nullcontext()
    if trace_dir:
        try:
            import jax.profiler

            ctx = jax.profiler.TraceAnnotation(name)
        except Exception:  # pragma: no cover
            pass
    t0 = time.time()
    with ctx:
        yield
    dt = time.time() - t0
    _totals[name] = _totals.get(name, 0.0) + dt
    log.info("phase %s: %.3fs (total %.3fs)", name, dt, _totals[name])


@contextlib.contextmanager
def device_trace() -> Iterator[None]:
    """Whole-run jax.profiler trace when SPM_TPU_PROFILE_DIR is set."""
    trace_dir = os.environ.get("SPM_TPU_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    import jax.profiler

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("jax profiler trace written to %s", trace_dir)


def totals() -> Dict[str, float]:
    return dict(_totals)
