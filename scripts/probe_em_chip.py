#!/usr/bin/env python3
# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""On-chip throughput of the device unigram EM train step.

The device trainer's hot unit is ``em.train_step`` (lattice E-step with
psum-reduced expected counts + digamma M-step). This probe times it with
the loop-program methodology required on the tunneled rig (docs/design.md
rule 6): N EM iterations inside one ``lax.fori_loop`` — each iteration
consumes the previous iteration's score table, so the body is inherently
un-hoistable — one dispatch, one scalar readback, per-iteration time from
paired N=1 / N=1+k runs.

Shapes mirror bench_scaling.py (the CPU weak-scaling harness) so the two
reports are comparable: W words x P_LEN positions x K piece lanes.

Prints one JSON line: words/s per chip for one full EM iteration.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED_PIECES = 2048
W = int(os.environ.get("SPM_EM_PROBE_WORDS", "16384"))
P_LEN, K = 16, 8
ITERS = int(os.environ.get("SPM_EM_PROBE_ITERS", "8"))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from sentencepiece_tpu import distributed as dist
    from sentencepiece_tpu.tpu import em

    mesh = dist.data_mesh("dp")
    ndev = len(jax.devices())
    rng = np.random.RandomState(0)
    lat = rng.randint(-1, SEED_PIECES, (W, P_LEN, K)).astype(np.int32)
    lens = rng.randint(3, P_LEN + 1, W).astype(np.int32)
    freqs = rng.randint(1, 50, W).astype(np.float32)
    scores0 = np.log(np.full(SEED_PIECES, 1.0 / SEED_PIECES, np.float32))
    alive0 = np.ones(SEED_PIECES, bool)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P("dp"), P("dp"), P("dp"), P(), P(), P()),
                       out_specs=P(), check_vma=False)
    def loop(lat_s, lens_s, freqs_s, sc0, al0, n):
        def body(_, carry):
            sc, al = carry
            sc2, al2, _stats = em.train_step(
                lat_s, lens_s, freqs_s, sc, al,
                num_seed=SEED_PIECES, axis_name="dp")
            # keep the workload stable across iterations: the M-step only
            # ever shrinks `alive` and sends dropped scores to -inf, which
            # degenerates the lattice after a few rounds — reset dropped
            # pieces to their initial score (the carry still depends on
            # the previous iteration through the surviving scores, so the
            # body cannot be hoisted)
            return jnp.where(al2, sc2, sc0), al0
        sc, _ = jax.lax.fori_loop(0, n[0], body, (sc0, al0))
        return jnp.sum(sc)

    args = (dist.put_sharded(lat, mesh), dist.put_sharded(lens, mesh),
            dist.put_sharded(freqs, mesh),
            dist.put_replicated(scores0, mesh),
            dist.put_replicated(alive0, mesh))

    def run(n):
        t0 = time.time()
        v = float(np.asarray(loop(*args, dist.put_replicated(
            np.asarray([n], np.int32), mesh))))
        return time.time() - t0, v

    run(1)  # compile
    best = None
    for _ in range(3):
        dt1, _ = run(1)
        dtn, _ = run(1 + ITERS)
        per = max(dtn - dt1, 1e-9) / ITERS
        best = per if best is None else min(best, per)
    print(json.dumps({
        "metric": "device unigram EM words/s (one full train_step, "
                  "loop-program timing)",
        "value": round(W / best, 1), "unit": "words/s",
        "ms_per_step": round(best * 1000, 2),
        "ndev": ndev, "words": W, "seed_pieces": SEED_PIECES,
        "backend": jax.devices()[0].platform}))


if __name__ == "__main__":
    main()
