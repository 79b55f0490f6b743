"""Device mesh + sharding helpers: the framework's parallelism layer.

TPU-native replacement for the reference's only parallelism mechanism,
single-process `nn.DataParallel` (reference: train/trainer.py:43,
eval.py:529; SURVEY.md §2.3): a 1-D `Mesh(('data',))` over all local chips
(ICI), with the batch sharded on axis 0 and parameters replicated.  Instead
of DataParallel's per-step weight broadcast + output gather, weights stay
resident and XLA inserts psum collectives for gradient reduction under jit.

Multi-host scale-out uses the same mesh spanning hosts after
`jax.distributed.initialize` (DCN); nothing else changes.

BatchNorm under this mesh is sync-BN by construction: the jitted train step
sees the full (sharded) batch, so BN's batch reductions compile to global
cross-device psums.  Chosen deliberately over the reference's per-replica
DataParallel-BN so training numerics do not depend on the device count
(see models/backbone.py docstring and
tests/test_train_step.py::test_sync_bn_device_count_equivalence).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host scale-out over DCN: thin wrapper over
    jax.distributed.initialize (SURVEY.md §5.8).  After this, make_mesh()
    spans all hosts' devices and the same batch-sharded train step scales
    out with zero further changes (XLA routes gradient psums over ICI within
    a slice and DCN across)."""
    import jax

    kwargs = {}
    if coordinator_address:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) across the data axis; replicate trailing dims."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Device-put a pytree of host arrays with batch-dim sharding."""
    sharding = batch_sharding(mesh, axis_name)

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(batch: Any, multiple: int) -> tuple[Any, int]:
    """Pad every leaf's dim 0 up to a multiple (for even sharding); returns
    (padded_tree, original_batch_size).  Padding repeats the last element so
    BN statistics stay finite; callers mask metrics back to the true size."""
    leaves = jax.tree_util.tree_leaves(batch)
    n = leaves[0].shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return batch, n

    def pad(x):
        reps = np.concatenate([x, np.repeat(x[-1:], target - n, axis=0)], axis=0)
        return reps

    return jax.tree_util.tree_map(pad, batch), n
