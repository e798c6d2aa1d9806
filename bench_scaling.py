#!/usr/bin/env python3
# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Multi-device / multi-HOST scaling of the REAL device trainer programs.

The measured program is the trainer's own sharded E-step
(train/unigram.py::_DeviceEM -> tpu/em.py): word lattices built against
the real seed vocabulary of a real multilingual corpus (botchan EN +
wagahai JA + generated Latin/CJK mix, scripts/make_multilingual.py),
corpus rows data-parallel over the mesh, expected-count vector reduced
with one fixed-order all_gather+sum per step — exactly what
`SentencePieceTrainer.Train(..., engine="device")` dispatches on round 1
(the heaviest round: every seed piece alive). No synthetic lattices.

Modes:

* default: mesh sizes 1..N within one process; STRONG-scaling
  efficiency over the fixed corpus.
* SPM_SCALING_PROCESSES=P (single value or comma list, e.g. "2,4"):
  additionally runs P REAL processes joined via jax.distributed (each
  owning its own virtual CPU device(s) — the same code path as a TPU
  pod with P hosts), each building + uploading ONLY its own corpus
  shard. CORE-FAIR pinning: this host has few cores, so every
  configuration is pinned to the same cores-per-device budget
  (sched_setaffinity); otherwise the 1-process baseline gets all cores
  per device and the measurement reads as collective cost when it is
  actually host contention.
* every multi-process point also measures a LOCAL variant of the same
  program (axis_name=None: shard-local expected partials, no
  all_gather) — the full-minus-local delta isolates the COLLECTIVE
  cost per step from compute.

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


def _em_round_fns(dev):
    """(full, local) one-sub-iteration round callables for _DeviceEM2:
    ``full`` is the production program (fixed-order psum), ``local``
    the same program with the collective removed — full minus local
    isolates the collective's per-step cost."""
    from sentencepiece_tpu.tpu import em2

    full = dev._round_fn(1)
    local = em2.make_round_fn(dev.shapes, dev.K, dev.num_seed, 1,
                              "dp", dev.mesh, collective=False)
    args = (dev._dest, dev._segpos) + tuple(dev._flags)         + tuple(dev._freqs)

    def run_full(sc, al):
        return full(sc, al, *args)

    def run_local(sc, al):
        return local(sc, al, *args)

    return run_full, run_local


def _seed_state(dev, pieces):
    import numpy as np

    scores = np.full(dev.num_seed, dev.em2.NEG_INF, np.float32)
    alive = np.zeros(dev.num_seed, bool)
    for w, sc in pieces:
        si = dev.seed_index.get(w)
        if si is not None:
            scores[si] = sc
            alive[si] = True
    return (dev.dist.put_replicated(scores, dev.mesh),
            dev.dist.put_replicated(alive, dev.mesh))


def _time_fn(fn, sc_d, al_d, reps=REPS):
    import jax

    r = fn(sc_d, al_d)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(sc_d, al_d)
    jax.block_until_ready(r)
    return (time.time() - t0) / reps


def _build_bpe_workload():
    """The real BPE trainer state at the point the sparse engine would
    dispatch (train/bpe.py:296-311)."""
    from make_multilingual import build
    from sentencepiece_tpu.proto.spec import TrainerSpec, ModelType
    from sentencepiece_tpu.train import facade
    from sentencepiece_tpu.train import bpe as bpe_mod

    build(CORPUS)
    ts = TrainerSpec()
    ts.input = [CORPUS]
    ts.model_type = ModelType.BPE
    ts.vocab_size = 32000
    ts.hard_vocab_limit = False
    ts.max_sentence_length = MAX_SENT
    ns = facade.get_normalizer_spec("nmt_nfkc")
    facade.populate_normalizer_spec(ns)
    tr = bpe_mod.Trainer(ts, ns, engine="device")
    tr.load_sentences()
    if ts.split_by_whitespace:
        tr.split_sentences_by_whitespace()
    return tr


def _bpe_measure(epochs: int = 3) -> dict:
    """ms per merge of the sparse BPE engine's refresh+epoch programs
    (tpu/bpe_train_sparse.py) on the current mesh: one refresh, one
    warm epoch (compile + first merges), then ``epochs`` timed epochs
    with the table threaded exactly as the production driver does."""
    import numpy as np
    import jax
    from sentencepiece_tpu.tpu.bpe_train_sparse import (
        prepare_sparse_engine, ST_REFRESH, ST_REFRESH_STALE)

    os.environ.setdefault("SPM_BPE_SPARSE_EPOCH_CAP", "128")
    tr = _build_bpe_workload()
    st = prepare_sparse_engine(tr, n_merges=32000)
    if st is None:
        return {"bpe_error": "device engine declined this config"}

    def do_refresh(sym_d, tracked_d):
        return st.refresh(sym_d, tracked_d, st.freqs_d, st.s_len_d,
                          st.s_wsp_d, st.s_wsi_d, st.s_scr_d,
                          st.s_val_d, st.s_chr_d)

    state = [st.sym_d, st.tracked_d, None]

    ok_flag = [st.rep(np.ones((), np.bool_))]

    def do_epoch(table, use_w):
        # the FULL-WIDTH epoch variant: the benchmark times the first
        # few hundred merges, which is the early phase the production
        # driver also runs on this program (site-row/new-pair caps
        # overflow for big merges)
        out = st.epoch_big(state[0], state[1], st.freqs_d, *table[:4],
                       *table[4:12], st.s_len_d, st.s_wsp_d,
                       st.s_wsi_d, st.s_scr_d, st.s_val_d, st.s_chr_d,
                       st.ml, st.mr, st.mf, st.e_len, st.e_chr,
                       st.next_id, st.k_done, use_w, ok_flag[0])
        (state[0], state[1], tk, tc, tl, tch, st.s_len_d, st.s_wsp_d,
         st.s_wsi_d, st.s_scr_d, st.s_val_d, st.s_chr_d, st.ml, st.mr,
         st.mf, st.e_len, st.e_chr, st.next_id, st.k_done,
         status, ok_flag[0]) = out
        return (tk, tc, tl, tch) + tuple(table[4:12]), status

    use_t = st.rep(np.ones((), np.bool_))
    use_f = st.rep(np.zeros((), np.bool_))
    r = do_refresh(state[0], state[1])
    table = tuple(r[:12])
    # warm epoch: compile + the first merge burst
    table, status = do_epoch(table, use_t)
    jax.block_until_ready(status)
    t_ref0 = time.time()
    r2 = do_refresh(state[0], state[1])
    jax.block_until_ready(r2[0])
    ms_refresh = (time.time() - t_ref0) * 1000
    table = tuple(r2[:12])
    ok_flag[0] = st.rep(np.ones((), np.bool_))
    k0 = int(np.asarray(st.k_done))
    t0 = time.time()
    use = use_t
    stts = []
    for _ in range(epochs):
        table, status = do_epoch(table, use)
        use = use_f
        stts.append(status)
    jax.block_until_ready(stts[-1])
    dt = time.time() - t0
    k1 = int(np.asarray(st.k_done))
    merges = max(k1 - k0, 1)
    n_refresh_needed = sum(
        1 for x in stts
        if int(np.asarray(x)) in (ST_REFRESH, ST_REFRESH_STALE))
    return {"bpe_lanes": st.n_lanes,
            "bpe_merges_timed": merges,
            "bpe_ms_per_merge": dt / merges * 1000,
            "bpe_merges_per_s": merges / dt,
            "bpe_ms_refresh": ms_refresh,
            "bpe_epochs_wanting_refresh": n_refresh_needed}


def worker_main() -> None:
    """One rank of the multi-process run (SPM_SCALING_RANK set)."""
    rank = int(os.environ["SPM_SCALING_RANK"])
    nproc = int(os.environ["SPM_SCALING_NPROC"])
    port = os.environ["SPM_SCALING_PORT"]
    cpus = os.environ.get("SPM_SCALING_CPUS", "")
    if cpus:
        os.sched_setaffinity(0, {int(c) for c in cpus.split("+")})
    import jax
    if os.environ.get("SPM_SCALING_REAL", "") != "1":
        jax.config.update("jax_platforms", "cpu")
    from sentencepiece_tpu import distributed as dist
    from sentencepiece_tpu.train.unigram import _DeviceEM2

    if nproc > 1:
        dist.initialize(coordinator_address=f"localhost:{port}",
                        num_processes=nproc, process_id=rank)
    out = {"ndev": len(jax.devices()), "nproc": nproc}
    if os.environ.get("SPM_SCALING_WHAT", "em") == "bpe":
        out.update(_bpe_measure())
    else:
        tr, pieces = _build_workload()
        dev = _DeviceEM2(tr, pieces)
        sc_d, al_d = _seed_state(dev, pieces)
        run_full, run_local = _em_round_fns(dev)
        dt = _time_fn(run_full, sc_d, al_d)
        dt_local = _time_fn(run_local, sc_d, al_d)
        W = len(tr.sentences)
        out.update({"words": W, "seeds": dev.num_seed,
                    "words_per_sec": W / dt,
                    "ms_per_step": dt * 1000,
                    "ms_per_step_local": dt_local * 1000,
                    "ms_collective": (dt - dt_local) * 1000})
    if rank == 0:
        print(json.dumps(out))


def _spawn_multiprocess(nproc: int, n_dev_total: int, port: int,
                        cores_per_dev: float):
    """Run nproc ranks, each with n_dev_total/nproc devices, pinned to
    disjoint equal core sets; returns the rank-0 JSON result."""
    assert n_dev_total % nproc == 0
    ncores = len(os.sched_getaffinity(0))
    dev_per_rank = n_dev_total // nproc
    cores_per_rank = max(1, int(cores_per_dev * dev_per_rank))
    procs = []
    for rank in range(nproc):
        env = dict(os.environ)
        env["SPM_SCALING_RANK"] = str(rank)
        env["SPM_SCALING_NPROC"] = str(nproc)
        env["SPM_SCALING_PORT"] = str(port)
        lo = (rank * cores_per_rank) % ncores
        cores = [(lo + i) % ncores for i in range(cores_per_rank)]
        env["SPM_SCALING_CPUS"] = "+".join(map(str, sorted(set(cores))))
        if env.get("SPM_SCALING_REAL", "") != "1":
            env["XLA_FLAGS"] = (
                f"--xla_force_host_platform_device_count={dev_per_rank}")
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
    proc_list = [int(p) for p in
                 os.environ.get("SPM_SCALING_PROCESSES", "0").split(",")
                 if int(p or 0) > 1]
    if os.environ.get("SPM_SCALING_REAL", "") != "1":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_target}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    from sentencepiece_tpu.train.unigram import _DeviceEM2

    tr, pieces = _build_workload()
    W = len(tr.sentences)
    results = {}
    devices = jax.devices()
    sizes = [n for n in [1, 2, 4, 8, 16, 32] if n <= len(devices)]
    for n in sizes:
        os.environ["SPM_DATA_MESH_DEVICES"] = str(n)
        try:
            dev = _DeviceEM2(tr, pieces)
            sc_d, al_d = _seed_state(dev, pieces)
            run_full, _ = _em_round_fns(dev)
            dt = _time_fn(run_full, sc_d, al_d)
        finally:
            del os.environ["SPM_DATA_MESH_DEVICES"]
        results[n] = W / dt
        print(f"mesh={n}: {dt*1000:.1f} ms/step, "
              f"{results[n]:.0f} words/s", file=sys.stderr)

    base = results[sizes[0]]
    eff = {n: results[n] / (n * base) for n in sizes}
    ncores = len(os.sched_getaffinity(0))
    out = {
        "metric": ("unigram EM E-step strong-scaling efficiency "
                   "(real corpus, real seed vocab)"),
        "backend": jax.devices()[0].platform,
        "corpus": CORPUS,
        "words": W,
        "seed_pieces": len(pieces),
        "host_cores": ncores,
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
    for n_procs in proc_list:
        # multi-HOST analog at CORE-FAIR resources: P processes x 1
        # device each vs 1 process x P devices, every configuration
        # pinned to the same cores per device, so the efficiency delta
        # is process/collective overhead rather than core contention.
        import socket
        s = socket.socket()
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
        s.close()
        gdev = n_procs
        cpd = max(1, ncores // gdev)
        one = _spawn_multiprocess(1, gdev, port, cpd)
        multi = _spawn_multiprocess(n_procs, gdev, port + 1, cpd)
        mp_eff = multi["words_per_sec"] / one["words_per_sec"]
        out.setdefault("multiprocess_points", {})[str(n_procs)] = {
            "global_devices": gdev,
            "cores_per_device": cpd,
            "seed_pieces": multi["seeds"],
            "words_per_sec_1proc": round(one["words_per_sec"], 1),
            "words_per_sec_nproc": round(multi["words_per_sec"], 1),
            "efficiency_vs_1proc": round(mp_eff, 3),
            "ms_per_step_1proc": round(one["ms_per_step"], 1),
            "ms_per_step_nproc": round(multi["ms_per_step"], 1),
            "ms_collective_1proc": round(one["ms_collective"], 1),
            "ms_collective_nproc": round(multi["ms_collective"], 1),
            "ms_compute_nproc": round(multi["ms_per_step_local"], 1),
        }
        print(f"multiprocess {n_procs}x{gdev // n_procs}dev: "
              f"{multi['words_per_sec']:.0f} words/s vs 1x{gdev}dev "
              f"{one['words_per_sec']:.0f} ({mp_eff:.2f}x); collective "
              f"{multi['ms_collective']:.0f} ms of "
              f"{multi['ms_per_step']:.0f} ms/step", file=sys.stderr)
        if os.environ.get("SPM_SCALING_BPE", "1") == "1":
            # sparse BPE merge-loop scaling at the same core-fair
            # resources (VERDICT r4 item 8): 1xP-dev vs Px1-dev; the
            # ms/merge delta is the cross-process collective cost of
            # the epoch program's recount psums + append all_gathers
            os.environ["SPM_SCALING_WHAT"] = "bpe"
            try:
                bone = _spawn_multiprocess(1, gdev, port + 2, cpd)
                bmulti = _spawn_multiprocess(n_procs, gdev, port + 3,
                                             cpd)
            finally:
                del os.environ["SPM_SCALING_WHAT"]
            if "bpe_ms_per_merge" in bmulti:
                beff = (bone["bpe_ms_per_merge"]
                        / bmulti["bpe_ms_per_merge"])
                out.setdefault("bpe_multiprocess_points", {})[
                    str(n_procs)] = {
                    "global_devices": gdev,
                    "cores_per_device": cpd,
                    "lanes": bmulti["bpe_lanes"],
                    "merges_timed": bmulti["bpe_merges_timed"],
                    "ms_per_merge_1proc": round(
                        bone["bpe_ms_per_merge"], 2),
                    "ms_per_merge_nproc": round(
                        bmulti["bpe_ms_per_merge"], 2),
                    "ms_refresh_1proc": round(bone["bpe_ms_refresh"], 1),
                    "ms_refresh_nproc": round(
                        bmulti["bpe_ms_refresh"], 1),
                    "efficiency_vs_1proc": round(beff, 3),
                }
                print(f"bpe multiprocess {n_procs}: "
                      f"{bmulti['bpe_ms_per_merge']:.2f} ms/merge vs "
                      f"1proc {bone['bpe_ms_per_merge']:.2f} "
                      f"({beff:.2f}x)", file=sys.stderr)
            else:
                out["bpe_multiprocess_error"] = bmulti.get("bpe_error")
    if proc_list:
        # headline point (bench.py folds this into the driver line):
        # the LARGEST process count measured
        out["multiprocess"] = out["multiprocess_points"][str(proc_list[-1])]
    print(json.dumps(out))


if __name__ == "__main__":
    if os.environ.get("SPM_SCALING_RANK"):
        worker_main()
    else:
        main()
