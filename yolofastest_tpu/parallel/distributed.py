"""Multi-process (multi-host) data parallelism.

The reference is strictly single-process/single-GPU (SURVEY.md §2.3, no
torch.distributed anywhere); the TPU-native counterpart is
``jax.distributed`` + GSPMD: every process joins one coordinator, the mesh
spans ALL processes' devices, each host feeds only its local shard of the
global batch, and XLA reduces gradients over ICI/DCN.

Pieces:

* :func:`init_distributed` — one-call ``jax.distributed.initialize`` wrapper
  (no-op when single-process parameters are given).
* :func:`host_to_global` — turn a process-local numpy batch into a global
  sharded ``jax.Array`` (``jax.make_array_from_process_local_data``); for a
  fully-replicated sharding every process passes the whole array.  Falls
  back to plain ``device_put`` in single-process runs, so
  :class:`yolofastest_tpu.train.Trainer` uses ONE code path everywhere.

Validated by the multi-process CPU dry run (``__graft_entry__.
dryrun_multichip`` spawns N real processes x M virtual devices via
``tools/mp_dryrun_worker.py``) — no TPU pod needed to test the wiring.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the distributed runtime.

    With no arguments, ``jax.distributed.initialize()`` runs its cluster
    auto-detection (Cloud TPU pods, Slurm, OpenMPI, k8s, ...); if no cluster
    environment is detected this degrades to a single-process no-op — so the
    call is safe in every deployment.  For manual clusters (or the CPU dry
    run) pass ``host:port``, world size and rank explicitly.  Must be called
    before any other jax API touches the backend.
    """
    if num_processes == 1 and coordinator_address is None:
        return  # explicitly single process: nothing to join
    bare = (coordinator_address is None and num_processes is None
            and process_id is None)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except ValueError as e:
        # A bare call outside any cluster environment fails auto-detection
        # with exactly this ValueError — that (and only that) degrades to a
        # single-process no-op.  Any other failure (cluster detected but
        # coordinator unreachable, explicit parameters wrong, ...) must
        # surface: swallowing it would silently train divergent per-host
        # copies.
        if not (bare and "coordinator_address" in str(e)):
            raise


def host_to_global(sharding, arr) -> jax.Array:
    """Process-local host data -> global array with ``sharding``.

    * multi-process: ``arr`` is THIS host's portion along sharded dims (the
      full array for replicated shardings); the runtime assembles the global
      array without gathering data anywhere.
    * single-process: plain ``device_put``.
    """
    arr = np.asarray(arr)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, arr)
    return jax.device_put(arr, sharding)


def global_batch_size(per_host_batch: int) -> int:
    """Global batch implied by a per-host batch (what the jitted step sees)."""
    return per_host_batch * jax.process_count()
