"""Device-mesh data parallelism.

The reference's only parallelism strategy is DDP via HF Accelerate
(gigagan_pytorch.py:1898-1908,1987; SURVEY.md §2.2).  The TPU-native
equivalent: a 1-D `data` mesh over all chips; the batch is sharded on its
leading axis, params/opt-state are replicated, and XLA inserts the gradient
all-reduce over ICI when the jitted step combines sharded activations into
replicated parameter updates — no DDP wrapper, no hooks, no
find_unused_parameters (JAX grads are structural zeros, not hooks).

The CLIP contrastive pool — the reference's hand-written variable-size
all_gather autograd Function (distributed.py:20-70) — needs no code at all
under jit-with-shardings: the loss reads the global batch array and XLA
materializes the gather.  `losses.all_gather_batch` covers explicit
shard_map contexts.

Multi-host: `jax.distributed.initialize()` + the same mesh over
`jax.devices()` spans hosts; batches are per-host shards
(`shard_batch` uses `jax.make_array_from_process_local_data`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, spec: P = P("data")):
    """Device-put a host batch (pytree of arrays) sharded per `spec`
    (default: leading axis over the data mesh).  Works single- and
    multi-process: each process contributes its local shard."""
    sharding = NamedSharding(mesh, spec)

    def put(x):
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    return jax.device_put(tree, replicated_sharding(mesh))
