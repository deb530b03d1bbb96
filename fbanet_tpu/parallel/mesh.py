"""Device mesh + sharding helpers for data-parallel training and inference.

The reference's only parallelism is single-process multi-GPU
`torch.nn.DataParallel` (replicate module, scatter batch, gather outputs;
reference: fba_net/train.py.bak:83, fba_net/test.py:55) plus DALI dataset
sharding hooks (fba_net/pipeline/real_bsr_dataset.py:82-87). The TPU-native
equivalent (SURVEY.md §2.3): a 1-D `Mesh(("data",))` over all chips, batches
sharded on the leading axis, parameters replicated, and the gradient
all-reduce emitted by XLA as a `psum` over ICI — no hand-written collectives.

Multi-host: feed each process its dataset shard via
`RealBSRDataset(shard_id=jax.process_index(), num_shards=jax.process_count())`;
DCN never sits on the step's critical path.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Sequence[jax.Device] | None = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (for parameters / optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put a pytree of arrays with the batch axis sharded over `mesh`."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of `m` that is >= `n` (for batch padding)."""
    return -(-n // m) * m
