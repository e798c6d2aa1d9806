# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Measure the on-chip cost model of gather/scatter ops.

Hypothesis from stage timings: each gather op costs ~8-10 ms regardless
of element count (per-op, not per-element), which would make op COUNT
the thing to minimize. Loop-program timings for K sequential gathers of
M elements each, varying K and M independently.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from sentencepiece_tpu.tpu import trie

    table = jnp.arange(65536, dtype=jnp.uint32)

    def make_loop(K, M):
        idx0 = jnp.asarray(
            np.random.default_rng(0).integers(0, 65536, M).astype(np.int32))

        @jax.jit
        def loop(idx, n):
            def body(_, carry):
                i = idx.at[0].set(idx[0] ^ (carry & 1))
                acc = jnp.uint32(0)
                for _ in range(K):
                    v = trie._gather(table, i.astype(jnp.uint32))
                    acc = acc ^ v[0]
                    i = (i + 1) & 0xFFFF
                return (acc & 0xFF).astype(jnp.uint8) ^ carry.astype(
                    jnp.uint8)
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))

        def fn(n):
            return loop(idx0, jnp.int32(n))
        return fn

    for K, M in [(1, 8192), (16, 8192), (64, 8192),
                 (1, 1 << 20), (16, 1 << 20),
                 (1, 1 << 23)]:
        fn = make_loop(K, M)
        t0 = time.time()
        int(np.asarray(fn(1)))
        warm = time.time() - t0
        t0 = time.time()
        int(np.asarray(fn(2)))
        d2 = time.time() - t0
        t0 = time.time()
        int(np.asarray(fn(6)))
        d6 = time.time() - t0
        per = (d6 - d2) / 4
        log(f"K={K:3d} gathers x M={M:>8} elems: per-iter {per*1e3:8.2f} ms"
            f"  ({per/K*1e3:7.3f} ms/gather, "
            f"{per/(K*M)*1e9:8.3f} ns/elem; warm {warm:.1f}s)")

    # row-local one-hot lookup (trie.taa_mxu) vs the serial _taa, at the
    # pipeline's shapes — verifies the ~15x claim behind the 2026-08-18
    # rewrites and tunes _ROWLOCAL_MAX_N
    for B, N in [(8192, 128), (8192, 256), (2048, 1024), (1024, 2048)]:
        arr = jnp.asarray(
            np.random.default_rng(0).integers(0, 1 << 20, (B, N)
                                              ).astype(np.int32))
        idx0 = jnp.asarray(
            np.random.default_rng(1).integers(0, N, (B, N)).astype(
                np.int32))

        def mk(form):
            @jax.jit
            def loop(arr, idx, n):
                def body(_, carry):
                    i = idx.at[0, 0].set(idx[0, 0] ^ (carry & 1))
                    if form == "mxu":
                        v = trie.taa_mxu(arr, i)
                    else:
                        v = trie._taa(arr, i)
                    return (jnp.sum(v, dtype=jnp.int32)
                            & 0xFF).astype(jnp.int32) ^ carry
                return jax.lax.fori_loop(0, n, body, jnp.int32(0))

            def fn(n):
                return loop(arr, idx0, jnp.int32(n))
            return fn

        for form in ("mxu", "serial"):
            fn = mk(form)
            int(np.asarray(fn(1)))
            t0 = time.time()
            int(np.asarray(fn(2)))
            d2v = time.time() - t0
            t0 = time.time()
            int(np.asarray(fn(6)))
            d6v = time.time() - t0
            per = (d6v - d2v) / 4
            log(f"taa[{form:6s}] B={B} N={N}: {per*1e3:8.2f} ms "
                f"({per/(B*N)*1e9:6.2f} ns/lane)")


if __name__ == "__main__":
    main()
