# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Multi-HOST distributed training (SURVEY.md §2.9, VERDICT r1 item 1).

Spawns two REAL processes, each owning 4 virtual CPU devices, joined via
``jax.distributed.initialize`` into one 8-device global mesh. Each process
loads + uploads only its own shard of the word corpus; expected counts /
pair counts are psum-reduced across the process boundary (gloo on CPU, ICI
on a pod). Both ranks must produce identical artifacts, and the result must
match a single-process 8-device run of the same engine.
"""

import pathlib
import socket
import subprocess
import sys

import pytest

FIX = pathlib.Path(__file__).parent / "fixtures" / "train"
REPO = str(pathlib.Path(__file__).resolve().parents[1])

WORKER = r"""
import os, sys
rank = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
model_type = sys.argv[4]; corpus = sys.argv[5]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import sentencepiece_tpu as spt
spt.distributed.initialize(coordinator_address="localhost:" + port,
                           num_processes=2, process_id=rank)
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
from sentencepiece_tpu.train import facade
facade.train(
    f"--input={{corpus}} --model_prefix={{outdir}}/rank{{rank}} "
    f"--model_type={{model_type}} --vocab_size=300 "
    "--hard_vocab_limit=false --minloglevel=2", engine="device")
print("RANK", rank, "DONE")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_process_train(tmp_path, model_type):
    corpus = str(FIX / "sub.txt")
    port = str(_free_port())
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), port, str(tmp_path),
             model_type, corpus],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=str(tmp_path))
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err.decode(errors="replace")[-4000:]
    return tmp_path


def _vocab(path):
    return [l.rstrip("\n") for l in open(path, encoding="utf-8")]


@pytest.mark.parametrize("model_type", ["unigram", "bpe"])
def test_two_process_device_train(tmp_path, model_type):
    _run_two_process_train(tmp_path, model_type)

    v0 = _vocab(tmp_path / "rank0.vocab")
    v1 = _vocab(tmp_path / "rank1.vocab")
    # SPMD invariant: every rank reaches the identical artifact
    assert v0 == v1

    # must also match the single-process 8-device run of the same engine
    from sentencepiece_tpu.train import facade
    facade.train(
        f"--input={FIX / 'sub.txt'} --model_prefix={tmp_path}/single "
        f"--model_type={model_type} --vocab_size=300 "
        "--hard_vocab_limit=false --minloglevel=2", engine="device")
    vs = _vocab(tmp_path / "single.vocab")
    # BYTE equality: the device engines reduce float shard partials in a
    # fixed order (em.fixed_order_psum; BPE counts are integer-exact), so
    # the trained artifact is independent of the process layout.
    assert v0 == vs
