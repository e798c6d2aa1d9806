# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Multi-host distributed runtime (SURVEY.md §2.9).

The reference parallelizes training with a single-process ``std::thread``
pool (trainer_interface.cc:361-372, unigram_model_trainer.cc:252-270); the
TPU-native replacement scales the same reductions across *processes*: each
process loads its shard of the corpus into device memory, vocab state is
replicated, and expected-count / pair-count vectors are reduced with
``psum`` over the global mesh (ICI within a slice, DCN across slices).

Design: the cold host phases (sentence loading, seed vocab, prune,
finalize) run replicated — every process executes them deterministically on
the same inputs and reaches identical state, so no host-side communication
is ever needed; only the hot per-word device arrays are sharded by process.

Usage::

    import sentencepiece_tpu as spt
    spt.distributed.initialize()          # env-driven, or pass args
    spt.SentencePieceTrainer.Train(..., engine="device")

Verified by a real 2-process CPU-mesh train in tests/test_distributed.py.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """Join the multi-process JAX runtime (jax.distributed.initialize).

    With no arguments, reads SPM_COORDINATOR / SPM_NUM_PROCESSES /
    SPM_PROCESS_ID (falling back to JAX's own env autodetection on cloud
    TPU pods, where all three may be omitted). Idempotent.
    """
    global _initialized
    if _initialized:
        return
    import jax

    if coordinator_address is None:
        coordinator_address = os.environ.get("SPM_COORDINATOR")
    if num_processes is None and os.environ.get("SPM_NUM_PROCESSES"):
        num_processes = int(os.environ["SPM_NUM_PROCESSES"])
    if process_id is None and os.environ.get("SPM_PROCESS_ID"):
        process_id = int(os.environ["SPM_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True


def process_count() -> int:
    import jax
    return jax.process_count()


def process_index() -> int:
    import jax
    return jax.process_index()


def is_primary() -> bool:
    return process_index() == 0


def data_mesh(axis_name: str = "dp"):
    """1-D data-parallel mesh over every device of every process, ordered
    process-major (jax device ids are assigned process-major, so shard i of
    a P(axis) array lives on process i // local_device_count).

    SPM_DATA_MESH_DEVICES=k restricts the mesh to the first k devices
    (single-process only — used by scaling comparisons and dryruns)."""
    import jax
    from jax.sharding import Mesh
    devices = jax.devices()
    k = int(os.environ.get("SPM_DATA_MESH_DEVICES", "0"))
    if k and jax.process_count() == 1:
        devices = devices[:k]
    return Mesh(np.array(devices), axis_names=(axis_name,))


def pad_rows(n_rows: int, mesh=None) -> int:
    """Rows padded to a multiple of the mesh (default: global) device
    count."""
    if mesh is not None:
        n_dev = mesh.size
    else:
        import jax
        n_dev = len(jax.devices())
        k = int(os.environ.get("SPM_DATA_MESH_DEVICES", "0"))
        if k and jax.process_count() == 1:
            n_dev = min(n_dev, k)
    return -(-max(n_rows, 1) // n_dev) * n_dev


def local_row_range(total_padded: int,
                    mesh=None, axis_name: str = "dp") -> Tuple[int, int]:
    """This process's contiguous row slice of a P(axis)-sharded leading
    axis (total_padded must be a multiple of the global device count).

    Derived from the sharding's own index map — device ids must NOT be
    assumed process-contiguous (CPU multi-process ids are not)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    if mesh is None:
        mesh = data_mesh(axis_name)
    assert total_padded % mesh.size == 0, (total_padded, mesh.size)
    if jax.process_count() == 1:
        return 0, total_padded
    sharding = NamedSharding(mesh, P(axis_name))
    imap = sharding.addressable_devices_indices_map((total_padded,))
    starts = [idx[0].start or 0 for idx in imap.values()]
    stops = [idx[0].stop if idx[0].stop is not None else total_padded
             for idx in imap.values()]
    lo, hi = min(starts), max(stops)
    # make_array_from_process_local_data requires one contiguous local block
    assert hi - lo == sum(b - a for a, b in zip(starts, stops)), (
        "process-local shards are not contiguous; reorder the mesh")
    return lo, hi


def put_sharded(local_np: np.ndarray, mesh, axis_name: str = "dp"):
    """Assemble a global array sharded over the mesh's data axis from this
    process's local rows (single-process: plain device_put)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(local_np), sharding)
    return jax.make_array_from_process_local_data(sharding, local_np)


def put_replicated(full_np, mesh):
    """Replicate a host array (identical on every process) over the mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(full_np), sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(full_np))
