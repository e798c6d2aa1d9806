# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""On-chip cost of the sparse-BPE trainer's primitive ops.

The r4 verdict puts the device BPE trainer at ~18-29 ms/merge
steady-state; beating the reference binary at config-5 scale needs
< 3 ms/merge. This probe prices each candidate building block at
config-5-like shapes ([W, C] ~ 4M corpus lanes) with the loop-program
methodology (docs/design.md rule 6): N executions inside one
lax.fori_loop whose body consumes the previous iteration's result, one
scalar readback, per-op time from paired N / N+k runs.

Emits one JSON line mapping op -> ms.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W = int(os.environ.get("SPM_PROBE_W", "16384"))
C = int(os.environ.get("SPM_PROBE_C", "256"))
SR = int(os.environ.get("SPM_PROBE_SR", "2048"))
N1 = 2
N2 = int(os.environ.get("SPM_PROBE_N", "18"))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from sentencepiece_tpu.tpu.bpe_encode import _suffix_first_alive
    from sentencepiece_tpu.tpu import trie
    from sentencepiece_tpu.utils import compile_cache

    compile_cache.enable()
    rng = np.random.RandomState(0)
    sym = rng.randint(0, 300, (W, C)).astype(np.int32)
    sym[rng.rand(W, C) < 0.3] = -1
    freqs = rng.rand(W, C).astype(np.float32)
    tracked = rng.rand(W, C) < 0.5
    U = 33000

    def loop(body, x0, n):
        def step(i, x):
            return body(x, i)
        return jax.lax.fori_loop(0, n, step, x0)

    ops = {}

    def timeit(name, fn, x0):
        f = jax.jit(lambda x, n: loop(fn, x, n), static_argnames=("n",))
        # compile both trip counts (same program: n is static here to
        # keep the harness simple; compile time excluded by timing only
        # post-warm calls)
        jax.block_until_ready(f(x0, N1))
        jax.block_until_ready(f(x0, N2))
        t0 = time.time()
        jax.block_until_ready(f(x0, N1))
        ta = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(f(x0, N2))
        tb = time.time() - t0
        ms = (tb - ta) / (N2 - N1) * 1000.0
        ops[name] = round(ms, 3)
        print(f"  {name}: {ms:.3f} ms", file=sys.stderr, flush=True)

    symj = jnp.asarray(sym)
    frqj = jnp.asarray(freqs)
    trkj = jnp.asarray(tracked)

    # 1. one full-lane suffix propagate scan (the _lane_keys core).
    # Consume the WHOLE scan output (sum) — consuming a slice lets XLA
    # collapse the scan to a per-row reduction and the timing reads 0.
    def op_scan(x, i):
        alive = x >= 0
        n = _suffix_first_alive(x, alive, jnp.int32(-1))
        return x + (jnp.sum(n) & 1)
    timeit("scan_full", op_scan, symj)

    # 2. elementwise recount pass (key compare + masked sum)
    def op_recount(x, i):
        key = x * U + jnp.roll(x, -1, axis=1)
        s = jnp.sum(jnp.where(trkj & (key == i), frqj, 0.0))
        return x + (s.astype(jnp.int32) & 1)
    timeit("recount_full", op_recount, symj)

    # 2b. segment-sum over sorted keys: sort + cumsum passes (the
    # sort-mediated scatter-add replacement)
    def op_segsum(x, i):
        k = (x + i).reshape(-1)
        ks, ws = jax.lax.sort((k, frqj.reshape(-1)), num_keys=1)
        csum = jnp.cumsum(ws)
        prev = jnp.concatenate([jnp.full((1,), -3, ks.dtype), ks[:-1]])
        start = ks != prev
        return x + (jnp.sum(jnp.where(start, csum, 0.0)).astype(jnp.int32)
                    & 1)
    timeit("sort_segsum_full", op_segsum, symj)

    # 3. flat 2-op sort over all lanes
    def op_sort_full(x, i):
        k = (x + i).reshape(-1)
        ks, ws = jax.lax.sort((k, frqj.reshape(-1)), num_keys=1)
        return x + (jnp.sum(ks) & 1)
    timeit("sort_full_2op", op_sort_full, symj)

    # 4. flat 2-op sort over SR*C lanes
    sub = jnp.asarray(sym[:SR])
    subf = jnp.asarray(freqs[:SR])

    def op_sort_sub(x, i):
        k = (x + i).reshape(-1)
        ks, ws = jax.lax.sort((k, subf.reshape(-1)), num_keys=1)
        return x + (jnp.sum(ks) & 1)
    timeit(f"sort_{SR}x{C}_2op", op_sort_sub, sub)

    # 5. row gather of SR rows
    ridx = jnp.asarray(rng.randint(0, W, SR).astype(np.int32))

    def op_rowgather(x, i):
        g = x[(ridx + i) % W]
        return x + (g[0, :1] & 1)
    timeit(f"rowgather_{SR}", op_rowgather, symj)

    # 6. row scatter of SR rows
    rows = jnp.asarray(sym[:SR])

    def op_rowscatter(x, i):
        y = x.at[(ridx + i) % W].set(rows)
        return y
    timeit(f"rowscatter_{SR}", op_rowscatter, symj)

    # 7. argsort over W rows (site-row compaction order)
    flags = jnp.asarray((rng.rand(W) < 0.1))

    def op_argsort_rows(x, i):
        order = jnp.argsort(~(flags ^ (x[:, 0] & 1).astype(bool)))
        return x + (order[0] & 1)
    timeit("argsort_rows", op_argsort_rows, symj)

    # 8. 3-op cut sort over 2^20 records
    G = 1 << 20
    a = jnp.asarray(rng.randint(0, 1 << 30, G).astype(np.int32))
    b = jnp.asarray(rng.randint(0, 1 << 30, G).astype(np.int32))
    c = jnp.arange(G, dtype=jnp.int32)

    def op_cutsort(x, i):
        s1, s2, s3 = jax.lax.sort((a + i, b, c), num_keys=2)
        return x + (jnp.sum(s1) & 1)
    timeit("cutsort_1M_3op", op_cutsort, symj)

    # 9. small-table ops: argsort over K=8192 + fori-Lp argmin over K
    K, Lp = 8192, 16
    tk = jnp.asarray(rng.randint(-1, 1 << 20, K).astype(np.int32))
    tc = jnp.asarray(rng.rand(K).astype(np.float32))
    tch = jnp.asarray(rng.randint(0, 1 << 20, (K, Lp)).astype(np.int32))

    def op_table(x, i):
        occ = tk >= (i & 1)
        m = jnp.max(jnp.where(occ, tc, -1.0))
        msk = occ & (tc == m)

        def body(j, mk):
            cc = jnp.where(mk, tch[:, j], 2**31 - 1)
            return mk & (cc == jnp.min(cc))
        msk = jax.lax.fori_loop(0, Lp, body, msk)
        order = jnp.argsort(~(tk < 0))
        return x + (jnp.argmax(msk).astype(jnp.int32) & 1) \
            + (order[0] & 1)
    timeit("table_argmin_K8192", op_table, symj)

    print(json.dumps({"W": W, "C": C, "lanes": W * C, "ops_ms": ops}))


if __name__ == "__main__":
    main()
