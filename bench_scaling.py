#!/usr/bin/env python3
# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Multi-device / multi-HOST scaling of the REAL unigram EM train step.

The measured program is the trainer's own sharded E-step
(train/unigram.py::_DeviceEM -> tpu/em.py): word lattices built against
the real seed vocabulary of a real multilingual corpus (botchan EN +
wagahai JA + generated Latin/CJK mix, scripts/make_multilingual.py),
corpus rows data-parallel over the mesh, expected-count vector reduced
with one psum per step — exactly what `SentencePieceTrainer.Train(...,
engine="device")` dispatches on round 1 (the heaviest round: every seed
piece alive). No synthetic lattices anywhere.

Two modes:

* default: mesh sizes 1..N within one process; STRONG-scaling
  efficiency over the fixed corpus.
* SPM_SCALING_PROCESSES=P: additionally spawns P REAL processes joined
  via jax.distributed (each owning n/P virtual CPU devices — the same
  code path as a TPU pod with P hosts), each building + uploading ONLY
  its own corpus shard, and reports 1-process -> P-process efficiency
  at a fixed global device count.

On this rig only one TPU chip is attached, so by default the harness
uses virtual CPU devices; on a real pod slice set SPM_SCALING_REAL=1
and it runs unmodified over ICI/DCN.

Prints one JSON line.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

CORPUS = os.environ.get("SPM_SCALING_CORPUS", "/tmp/spm_multilingual.txt")
# max_sentence_length (bytes) bounds the lattice position extent; 512 is
# a real production flag value (the default 4192 admits 1400-char JA
# lines that pad every row's lattice to that width)
MAX_SENT = int(os.environ.get("SPM_SCALING_MAX_SENT", "512"))
SEED_CAP = int(os.environ.get("SPM_SCALING_SEED_CAP", "1000000"))
REPS = int(os.environ.get("SPM_SCALING_REPS", "3"))


def _build_workload():
    """(trainer, seed_pieces): the real trainer state up to the point
    round 1's E-step would dispatch. Deterministic — every process
    reconstructs identical state (distributed.py's replicated-host-phase
    design)."""
    from make_multilingual import build
    from sentencepiece_tpu.proto.spec import TrainerSpec, ModelType
    from sentencepiece_tpu.train import facade
    from sentencepiece_tpu.train import unigram as uni

    build(CORPUS)
    ts = TrainerSpec()
    ts.input = [CORPUS]
    ts.model_type = ModelType.UNIGRAM
    ts.vocab_size = 32000
    ts.hard_vocab_limit = False
    ts.max_sentence_length = MAX_SENT
    ts.seed_sentencepiece_size = SEED_CAP
    ns = facade.get_normalizer_spec("nmt_nfkc")
    facade.populate_normalizer_spec(ns)
    tr = uni.Trainer(ts, ns, engine="device")
    tr.load_sentences()
    pieces = tr.make_seed_sentence_pieces()
    if ts.split_by_whitespace:
        tr.split_sentences_by_whitespace()
    return tr, pieces


def _time_estep(dev, pieces, reps=REPS):
    """Per-step seconds of the real first-round E-step (all seeds
    alive), via the trainer's own jitted shard_map program."""
    import jax
    import numpy as np

    scores = np.full(dev.num_seed, dev.em.NEG_INF, np.float32)
    alive = np.zeros(dev.num_seed, bool)
    for w, sc in pieces:
        si = dev.seed_index.get(w)
        if si is not None:
            scores[si] = sc
            alive[si] = True
    sc_d = dev.dist.put_replicated(scores, dev.mesh)
    al_d = dev.dist.put_replicated(alive, dev.mesh)
    r = dev.estep_all(sc_d, al_d)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = dev.estep_all(sc_d, al_d)
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
    from sentencepiece_tpu import distributed as dist
    from sentencepiece_tpu.train.unigram import _DeviceEM

    if nproc > 1:
        dist.initialize(coordinator_address=f"localhost:{port}",
                        num_processes=nproc, process_id=rank)
    tr, pieces = _build_workload()
    dev = _DeviceEM(tr, pieces)
    dt = _time_estep(dev, pieces)
    if rank == 0:
        W = len(tr.sentences)
        print(json.dumps({"ndev": len(jax.devices()), "nproc": nproc,
                          "words": W, "seeds": dev.num_seed,
                          "words_per_sec": W / dt,
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
        out, _ = p.communicate(timeout=1800)
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
    from sentencepiece_tpu.train.unigram import _DeviceEM

    tr, pieces = _build_workload()
    W = len(tr.sentences)
    results = {}
    devices = jax.devices()
    sizes = [n for n in [1, 2, 4, 8, 16, 32] if n <= len(devices)]
    for n in sizes:
        os.environ["SPM_DATA_MESH_DEVICES"] = str(n)
        try:
            dev = _DeviceEM(tr, pieces)
            dt = _time_estep(dev, pieces)
        finally:
            del os.environ["SPM_DATA_MESH_DEVICES"]
        results[n] = W / dt
        print(f"mesh={n}: {dt*1000:.1f} ms/step, "
              f"{results[n]:.0f} words/s", file=sys.stderr)

    base = results[sizes[0]]
    eff = {n: results[n] / (n * base) for n in sizes}
    out = {
        "metric": ("unigram EM E-step strong-scaling efficiency "
                   "(real corpus, real seed vocab)"),
        "backend": jax.devices()[0].platform,
        "corpus": CORPUS,
        "words": W,
        "seed_pieces": len(pieces),
        "words_per_sec": {str(n): round(v, 1) for n, v in results.items()},
        "efficiency": {str(n): round(v, 3) for n, v in eff.items()},
        "value": round(eff[sizes[-1]], 3),
        "note": ("virtual CPU devices share physical cores, so cpu-backend "
                 "efficiency reflects host contention, not the collective: "
                 "the only cross-device traffic is one all_gather+sum of "
                 "the expected-count vector per step. Set "
                 "SPM_SCALING_REAL=1 on a pod slice to measure over "
                 "ICI/DCN."),
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
            "seed_pieces": multi["seeds"],
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
