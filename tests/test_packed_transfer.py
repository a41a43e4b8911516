"""Packed single-buffer host->device batch transfer (parallel/mesh.py).

A remote-device tunnel pays a round trip per transferred array; packing
the whole batch pytree into one uint8 buffer and unpacking with a jitted
bitcast on device makes the sustained input pipeline pay ONE round trip
per step (bench.py sustained path).  These tests pin bit-exactness of the
roundtrip for every payload dtype the egs pipeline ships.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tdnnf_nas_tpu.parallel.mesh import (compress_batch_bf16,
                                         make_batch_unpacker,
                                         pack_batch_bytes)


def _roundtrip(batch):
    buf, meta = pack_batch_bytes(batch)
    out = make_batch_unpacker(meta)(buf)
    flat_in, td_in = jax.tree.flatten(batch)
    flat_out, td_out = jax.tree.flatten(out)
    assert td_in == td_out
    for a, b in zip(flat_in, flat_out):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype and a.shape == b.shape
        assert (np.ascontiguousarray(a).tobytes()
                == np.ascontiguousarray(b).tobytes())
    return buf


def test_pack_unpack_bit_exact_all_dtypes():
    rng = np.random.RandomState(0)
    batch = {
        "feats": rng.randn(4, 6, 5).astype(np.float32),
        "mask": (rng.rand(4, 3, 7) > 0.5).astype(np.uint8),
        "idx": rng.randint(0, 100, (4, 9)).astype(np.int32),
        "w": rng.randn(4, 9).astype(np.float32),
    }
    buf = _roundtrip(batch)
    assert buf.dtype == np.uint8
    assert buf.nbytes == sum(np.asarray(v).nbytes for v in batch.values())


def test_pack_unpack_bf16_payload():
    rng = np.random.RandomState(1)
    batch = compress_batch_bf16({
        "feats": rng.randn(3, 5, 8).astype(np.float32),
        "ivectors": rng.randn(3, 10).astype(np.float32),
        "mask": np.ones((3, 4), np.uint8),
    })
    _roundtrip(batch)


def test_pack_unpack_nested_supervision_pytree():
    from tdnnf_nas_tpu.graphs.supervision import ChunkSupervision

    rng = np.random.RandomState(2)
    s = 6
    sup = ChunkSupervision(
        trans=rng.rand(2, s, s).astype(np.float32),
        state_pdf=rng.randint(0, 4, (2, s)).astype(np.int32),
        init=rng.rand(2, s).astype(np.float32),
        final=rng.rand(2, s).astype(np.float32),
        mask=rng.rand(2, 3, s).astype(np.float32),
        next_w=rng.rand(2, s // 2).astype(np.float32),
        self_loop_prob=0.5,
    )
    batch = {"feats": rng.randn(2, 9, 4).astype(np.float32), "sup": sup}
    _roundtrip(batch)
    # static aux (self_loop_prob) survives the treedef
    buf, meta = pack_batch_bytes(batch)
    out = make_batch_unpacker(meta)(buf)
    assert out["sup"].self_loop_prob == 0.5


def test_prefetch_to_device_pack_parity():
    from tdnnf_nas_tpu.parallel.mesh import prefetch_to_device

    rng = np.random.RandomState(3)
    batches = [{"feats": rng.randn(2, 4, 3).astype(np.float32),
                "idx": rng.randint(0, 9, (2, 5)).astype(np.int32)}
               for _ in range(4)]
    plain = list(prefetch_to_device(iter(batches), size=2))
    packed = list(prefetch_to_device(iter(batches), size=2, pack=True))
    assert len(plain) == len(packed) == 4
    for p, q in zip(plain, packed):
        for k in p:
            np.testing.assert_array_equal(np.asarray(p[k]),
                                          np.asarray(q[k]))
