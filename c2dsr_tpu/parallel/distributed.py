"""Multi-host (multi-process) runtime initialization and data plumbing.

The reference is a single process on a single device (main.py:72-75); this
module is the N-host entry the north star requires: one JAX process per
host, a global device mesh spanning all of them, per-process input shards,
and XLA collectives riding ICI within a slice / DCN across slices.

Usage (one process per host):

    from c2dsr_tpu.parallel import distributed
    distributed.initialize("10.0.0.1:8476", num_processes=4, process_id=i)
    # jax.devices() is now global; build the mesh and Experiment as usual

Data contract: every process computes the SAME epoch permutation (seeded
iterators), takes its contiguous slice of each global batch
(pipeline.BatchIterator process sharding), and reassembles global arrays
with ``jax.make_array_from_process_local_data`` (mesh.global_batch).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """jax.distributed.initialize passthrough (no-op args -> env autodetect).

    Call BEFORE any other JAX API.  On TPU pods the three arguments are
    autodetected from the metadata server; on CPU/GPU loopback tests they
    are passed explicitly."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def all_gather_host(x):
    """Gather a data-sharded device array to a full host copy on every
    process (used to collect eval ranks)."""
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(x, tiled=True)
