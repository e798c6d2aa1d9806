#!/usr/bin/env python3
# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Multi-device / multi-HOST scaling harness for the unigram EM train step.

Two modes:

* default: runs the sharded E-step (tpu/em.py: word lattices
  data-parallel, expected counts reduced over the mesh) at mesh sizes
  1..N within one process and reports weak-scaling efficiency.
* SPM_SCALING_PROCESSES=P: additionally spawns P REAL processes joined
  via jax.distributed (each owning n/P virtual CPU devices — the same
  code path as a TPU pod with P hosts) and reports 1-process -> P-process
  weak-scaling efficiency at a fixed global device count.

On this rig only one TPU chip is attached, so by default the harness uses
virtual CPU devices; on a real pod slice set SPM_SCALING_REAL=1 and it
runs unmodified over ICI/DCN.

Prints one JSON line.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SEED_PIECES = 2048
# words per device (weak scaling). The default matches real training
# shapes: a 14 MB corpus distills to ~100k distinct words, ~12k/device
# on an 8-device mesh — per-step collective latency (one psum of the
# expected-count vector) must amortize against that much E-step work,
# not a toy batch.
W_PER_DEV = int(os.environ.get("SPM_SCALING_WORDS_PER_DEV", "12288"))
P_LEN, K = 16, 8


def _make_batch(rng, n_words):
    import numpy as np
    lat = rng.randint(-1, SEED_PIECES, (n_words, P_LEN, K)).astype(np.int32)
    lens = rng.randint(3, P_LEN + 1, n_words).astype(np.int32)
    freqs = rng.randint(1, 50, n_words).astype(np.float32)
    return lat, lens, freqs


def _time_estep(mesh, lat, lens, freqs, scores, alive, reps=5):
    import functools
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from sentencepiece_tpu.tpu import em
    from sentencepiece_tpu import distributed as dist

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P("dp"), P("dp"), P("dp"), P(), P()),
                       out_specs=(P(), P(), P()), check_vma=False)
    def estep(l, ln, f, sc, al):
        return em.estep(l, ln, f, sc, al, num_seed=SEED_PIECES,
                        axis_name="dp")

    args = (dist.put_sharded(lat, mesh), dist.put_sharded(lens, mesh),
            dist.put_sharded(freqs, mesh),
            dist.put_replicated(scores, mesh),
            dist.put_replicated(alive, mesh))
    r = estep(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = estep(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / reps


def worker_main() -> None:
    """One rank of the multi-process run (SPM_SCALING_RANK set)."""
    rank = int(os.environ["SPM_SCALING_RANK"])
    nproc = int(os.environ["SPM_SCALING_NPROC"])
    port = os.environ["SPM_SCALING_PORT"]
    import jax
    if os.environ.get("SPM_SCALING_REAL", "") != "1":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from sentencepiece_tpu import distributed as dist

    if nproc > 1:
        dist.initialize(coordinator_address=f"localhost:{port}",
                        num_processes=nproc, process_id=rank)
    ndev = len(jax.devices())
    mesh = dist.data_mesh("dp")
    Wp = W_PER_DEV * ndev
    lo, hi = dist.local_row_range(Wp, mesh)
    # every rank generates the full deterministic batch, uploads its rows
    rng = np.random.RandomState(0)
    lat, lens, freqs = _make_batch(rng, Wp)
    scores = np.log(np.full(SEED_PIECES, 1.0 / SEED_PIECES, np.float32))
    alive = np.ones(SEED_PIECES, bool)
    dt = _time_estep(mesh, lat[lo:hi], lens[lo:hi], freqs[lo:hi],
                     scores, alive)
    if rank == 0:
        print(json.dumps({"ndev": ndev, "nproc": nproc,
                          "words_per_sec": Wp / dt,
                          "ms_per_step": dt * 1000}))


def _spawn_multiprocess(nproc: int, n_dev_total: int, port: int):
    """Run nproc ranks, each with n_dev_total/nproc devices; returns the
    rank-0 JSON result."""
    assert n_dev_total % nproc == 0
    procs = []
    for rank in range(nproc):
        env = dict(os.environ)
        env["SPM_SCALING_RANK"] = str(rank)
        env["SPM_SCALING_NPROC"] = str(nproc)
        env["SPM_SCALING_PORT"] = str(port)
        if env.get("SPM_SCALING_REAL", "") != "1":
            env["XLA_FLAGS"] = (
                f"--xla_force_host_platform_device_count="
                f"{n_dev_total // nproc}")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env))
    out0 = None
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        if p.returncode != 0:
            raise RuntimeError(f"scaling worker rank {rank} failed")
        if rank == 0:
            out0 = json.loads(out.decode().strip().splitlines()[-1])
    return out0


def main() -> None:
    n_target = int(os.environ.get("SPM_SCALING_DEVICES", "8"))
    n_procs = int(os.environ.get("SPM_SCALING_PROCESSES", "0"))
    if os.environ.get("SPM_SCALING_REAL", "") != "1":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_target}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np
    from jax.sharding import Mesh

    rng = np.random.RandomState(0)
    scores = np.log(np.full(SEED_PIECES, 1.0 / SEED_PIECES, np.float32))
    alive = np.ones(SEED_PIECES, bool)
    results = {}
    devices = jax.devices()
    sizes = [n for n in [1, 2, 4, 8, 16, 32] if n <= len(devices)]
    for n in sizes:
        mesh = Mesh(np.array(devices[:n]), axis_names=("dp",))
        lat, lens, freqs = _make_batch(rng, W_PER_DEV * n)
        dt = _time_estep(mesh, lat, lens, freqs, scores, alive)
        results[n] = (W_PER_DEV * n) / dt
        print(f"mesh={n}: {dt*1000:.1f} ms/step, "
              f"{results[n]:.0f} words/s", file=sys.stderr)

    base = results[sizes[0]] / sizes[0]
    eff = {n: results[n] / (n * base) for n in sizes}
    out = {
        "metric": "unigram EM E-step weak-scaling efficiency",
        "backend": jax.devices()[0].platform,
        "words_per_sec": {str(n): round(v, 1) for n, v in results.items()},
        "efficiency": {str(n): round(v, 3) for n, v in eff.items()},
        "value": round(eff[sizes[-1]], 3),
        "note": ("virtual CPU devices share physical cores, so cpu-backend "
                 "efficiency reflects host contention, not the collective: "
                 "the only cross-device traffic is one all_gather+sum of "
                 "the expected-count vector per step, negligible over ICI. "
                 "Set SPM_SCALING_REAL=1 on a pod slice to measure the "
                 "real thing."),
    }
    if n_procs > 1:
        # multi-HOST analog: same global device count, 1 vs n_procs
        # processes (jax.distributed + gloo on CPU; ICI/DCN on a pod)
        import socket
        s = socket.socket()
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
        s.close()
        one = _spawn_multiprocess(1, n_target, port)
        multi = _spawn_multiprocess(n_procs, n_target, port)
        mp_eff = multi["words_per_sec"] / one["words_per_sec"]
        out["multiprocess"] = {
            "global_devices": n_target,
            "words_per_sec_1proc": round(one["words_per_sec"], 1),
            f"words_per_sec_{n_procs}proc": round(
                multi["words_per_sec"], 1),
            "efficiency_vs_1proc": round(mp_eff, 3),
        }
        print(f"multiprocess {n_procs}x{n_target // n_procs}dev: "
              f"{multi['words_per_sec']:.0f} words/s vs 1x{n_target}dev "
              f"{one['words_per_sec']:.0f} ({mp_eff:.2f}x)",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    if os.environ.get("SPM_SCALING_RANK"):
        worker_main()
    else:
        main()
