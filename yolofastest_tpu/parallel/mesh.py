"""Device-mesh helpers: the framework's one place for sharding layout.

The reference has no distributed support at all (single GPU, SURVEY.md
§2.3); here parallelism is expressed purely through `jax.sharding` layouts —
XLA (GSPMD) inserts every collective:

* ``data`` axis — batch parallelism (gradient psum over ICI for training,
  batch-split serving for inference);
* optional ``spatial`` axis — splits image rows; convolutions get automatic
  halo exchanges, the spatial analogue of sequence parallelism for this
  vision workload (SURVEY.md §5 long-context note).

Used by :class:`yolofastest_tpu.train.Trainer` and the multi-chip dry run
(``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data',) or ('data', 'spatial') mesh.

    Defaults to all local devices on the data axis.
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devs) // n_spatial
    devs = devs[: n_data * n_spatial]
    if n_spatial > 1:
        return Mesh(devs.reshape(n_data, n_spatial), ("data", "spatial"))
    return Mesh(devs, ("data",))


def replicate(mesh: Mesh) -> NamedSharding:
    """Sharding for replicated arrays (params, optimizer state)."""
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Sharding for NHWC batches: batch over 'data', optionally image rows
    over 'spatial' (conv halo exchanges are inserted by GSPMD)."""
    if spatial and "spatial" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, *arrays, spatial: bool = False):
    """device_put a batch (images first, then rank<4 targets on 'data')."""
    out = []
    for a in arrays:
        spec = batch_sharding(mesh, spatial and a.ndim >= 3)
        out.append(jax.device_put(a, spec))
    return tuple(out) if len(out) > 1 else out[0]
