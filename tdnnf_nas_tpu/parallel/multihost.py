"""Multi-host initialization + host-sharded data feeding.

Replaces the reference's cluster execution model (`run.pl`/`queue.pl`
process dispatch + filesystem exchange, SURVEY.md §2.5/§5.8) with
`jax.distributed`: every host runs the same program, the dp mesh spans all
hosts (ICI within a slice, DCN across), each host feeds only its local
shard of the global batch via `make_array_from_process_local_data`, and
gradients all-reduce through the mesh — no model averaging, no .mdl files
in flight.

On a single host this degrades to the plain mesh path (tests use the
8-device CPU mesh).
"""

from __future__ import annotations

import os


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_from_env() -> None:
    """`jax.distributed.initialize` from standard env vars
    (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID) when present."""
    addr = os.environ.get("COORDINATOR_ADDRESS")
    if not addr:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ["NUM_PROCESSES"]),
        process_id=int(os.environ["PROCESS_ID"]),
    )


def global_mesh(axis_name: str = "dp") -> Mesh:
    """1-D dp mesh over ALL devices across hosts."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def host_batch_to_global(batch, mesh: Mesh):
    """Assemble a global sharded batch from each host's local shard.

    Every leaf's leading axis is the per-host batch; the global batch size is
    per_host * num_processes.
    """
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, batch)


def local_shard_range(num_items: int) -> tuple:
    """[start, end) of this host's contiguous shard of a dataset."""
    pc, pid = jax.process_count(), jax.process_index()
    per = num_items // pc
    start = pid * per
    end = num_items if pid == pc - 1 else start + per
    return start, end


def host_sharded_iterator(chunks, batch_size: int, mesh: Mesh, rng,
                          epochs=None):
    """Per-host egs feeding: each host shuffles and batches only its
    contiguous shard of the chunk list (the multi-host replacement of
    Kaldi's per-job egs archives, `train.py:477-549`), assembling global
    arrays of `batch_size` total across hosts.

    batch_size must divide evenly by process_count.
    """
    from tdnnf_nas_tpu.data import batch_iterator

    pc = jax.process_count()
    assert batch_size % pc == 0, (batch_size, pc)
    start, end = local_shard_range(len(chunks))
    local = chunks[start:end]
    for batch in batch_iterator(local, batch_size // pc, rng=rng,
                                epochs=epochs):
        yield host_batch_to_global(batch, mesh)
