"""Device mesh + data-parallel sharding.

TPU-native replacement for the reference's parallelism (SURVEY.md §2.5):
Kaldi runs N independent ``nnet3-chain-train`` GPU jobs on disjoint egs and
averages the models afterwards (`steps/libs/nnet3/train/common.py:108-190`)
— approximate, once per iteration, and the reason its natural-gradient
preconditioner exists.  Here the minibatch is sharded over a 1-D ``dp`` mesh
axis and the model state replicated; the single jitted train step then
yields an EXACT per-step gradient all-reduce, inserted by XLA's SPMD
partitioner as a psum over ICI — no model averaging, no filesystem exchange.

At this model scale (13–23M params) TP/PP are unnecessary (documented
explicitly per SURVEY.md §2.5); scaling is pure DP, multi-host via
`jax.distributed` + the same mesh spanning hosts (DCN for the inter-host
ring).  Sequence handling stays chunk-based (§5.7) — no sequence axis to
shard.

Usage:
    mesh = make_mesh()
    state = put_replicated(state, mesh)
    step = make_train_step(...)           # plain jitted step
    for batch in it:
        state, metrics = step(state, put_batch(batch, mesh), key)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def dp_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the dp axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_replicated(tree, mesh: Mesh):
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def put_batch(batch, mesh: Mesh):
    """Shard every leaf's leading (batch) axis across dp.

    Batch size must be divisible by the dp size (static shapes; the egs
    iterator guarantees fixed batch sizes).
    """
    s = dp_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def compress_batch_bf16(batch):
    """Cast the dense float payload (feats, i-vectors) to bf16 on the HOST
    before transfer — halves host->device bytes, the binding constraint of
    a tunnel-fed input pipeline.  Supervision arrays keep their dtypes
    (masks are already u8; weights are tiny).  Models cast inputs to their
    compute dtype anyway (bf16 at the flagship), so this loses nothing the
    bf16 A/B harness (docs/bf16_parity.json) hasn't already bounded."""
    import ml_dtypes

    out = dict(batch)
    for k in ("feats", "ivectors"):
        v = out.get(k)
        if v is not None and getattr(v, "dtype", None) == np.float32:
            out[k] = np.asarray(v).astype(ml_dtypes.bfloat16)
    return out


def pack_batch_bytes(batch):
    """Flatten a batch pytree into ONE contiguous uint8 buffer (host side).

    A remote-device (tunnel) transfer pays a round trip PER ARRAY: a batch
    of 7 leaves costs 7 RTTs even when the bytes are small — measured as
    the dominant, high-variance term of the sustained training loop
    (~0.5 s/step at ~70 ms RTT vs ~1.4 MB of payload).  One packed buffer
    pays one RTT; the device-side unpack (:func:`make_batch_unpacker`) is
    a jitted bitcast+reshape, i.e. free.

    Returns (buf, meta) where meta is a static (treedef, per-leaf spec)
    pair shared by every batch of the same shape.
    """
    leaves, treedef = jax.tree.flatten(batch)
    arrs = [np.ascontiguousarray(np.asarray(v)) for v in leaves]
    # keep the dtype OBJECT (ml_dtypes bfloat16's .str is an opaque 'V2')
    spec = tuple((a.shape, a.dtype, a.nbytes) for a in arrs)
    buf = np.concatenate([a.view(np.uint8).reshape(-1) for a in arrs])
    return buf, (treedef, spec)


def make_batch_unpacker(meta):
    """Jitted inverse of :func:`pack_batch_bytes` (runs on device)."""
    import jax.numpy as jnp

    treedef, spec = meta

    @jax.jit
    def unpack(buf):
        out, o = [], 0
        for shape, dtype, nbytes in spec:
            seg = buf[o:o + nbytes]
            dt = np.dtype(dtype)
            if dt.itemsize > 1:
                seg = jax.lax.bitcast_convert_type(
                    seg.reshape(-1, dt.itemsize), jnp.dtype(dt))
            else:
                seg = seg.astype(jnp.dtype(dt)) if dt != np.uint8 else seg
            out.append(seg.reshape(shape))
            o += nbytes
        return jax.tree.unflatten(treedef, out)

    return unpack


def prefetch_to_device(it, size: int = 2, mesh: Mesh = None,
                       payload_bf16: bool = False, pack: bool = False):
    """Wrap a host batch iterator with a background thread that stages the
    next ``size`` batches on device while the current step runs.

    Host->device copies are the dominant cost of a streamed input pipeline
    (especially through a remote-device tunnel); overlapping them with
    compute recovers most of the device-only throughput — the egs-feeding
    analogue of Kaldi's double-buffered example reader.  ``payload_bf16``
    additionally halves the transferred feature bytes
    (:func:`compress_batch_bf16`).
    """
    import queue as _queue
    import threading

    import jax.numpy as jnp

    q: "_queue.Queue" = _queue.Queue(maxsize=size)
    err = []
    stop = threading.Event()
    unpacker = []  # built on the first packed batch (static shapes)

    def put(x):
        if payload_bf16:
            x = compress_batch_bf16(x)
        if mesh is not None:
            return put_batch(x, mesh)
        if pack:
            buf, meta = pack_batch_bytes(x)
            if not unpacker:
                unpacker.append(make_batch_unpacker(meta))
            # one transfer; the jitted device-side unpack runs in the
            # consumer's dispatch stream (async, no host sync)
            return unpacker[0](jnp.asarray(buf))
        return jax.tree.map(jnp.asarray, x)

    def _enqueue(item) -> bool:
        """put with a stop-flag poll so the worker exits (and stops pinning
        staged device buffers) if the consumer abandons the generator."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except _queue.Full:
                continue
        return False

    def worker():
        try:
            for b in it:
                if not _enqueue(put(b)):
                    return
        except Exception as e:  # surface in the consumer
            err.append(e)
        finally:
            _enqueue(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            if err:
                raise err[0]
            b = q.get()
            if b is None:
                if err:
                    raise err[0]
                return
            yield b
    finally:
        stop.set()
