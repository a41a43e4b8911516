"""Binary egs shards + native streaming loader bindings.

The persistent-egs path of the framework (reference: `get_egs.sh` archives
+ the shuffling/copying C++ pipeline): chunks produced by `data/egs.make_egs`
are serialized once into TEGS shards (format documented in
native/egs_loader.cc) and streamed back at training time by the C++
prefetching loader — supervision stored in the compact linear-chain form
(next_w/pdf/init/final/mask) consumed by the O(S) numerator kernel.
"""

from __future__ import annotations

import ctypes
import struct
from typing import Iterator, Sequence

import numpy as np

from tdnnf_nas_tpu.data.egs import Chunk
from tdnnf_nas_tpu.data.native import get_lib, _f32p, _i32p
from tdnnf_nas_tpu.graphs.supervision import ChunkSupervision

_MAGIC = b"TEGS"
_VERSION = 1


def write_egs_file(chunks: Sequence[Chunk], path: str) -> None:
    c0 = chunks[0]
    t_in, feat_dim = c0.feats.shape
    t_out, max_states = c0.sup.mask.shape
    assert c0.sup.next_w is not None, "egs file requires compact supervision"
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<5i", _VERSION, len(chunks), t_in, feat_dim, t_out))
        f.write(struct.pack("<i", max_states))
        for ch in chunks:
            assert ch.feats.shape == (t_in, feat_dim)
            assert ch.sup.mask.shape == (t_out, max_states)
            f.write(np.ascontiguousarray(ch.feats, np.float32).tobytes())
            f.write(np.ascontiguousarray(ch.sup.next_w, np.float32).tobytes())
            f.write(np.ascontiguousarray(ch.sup.state_pdf, np.int32).tobytes())
            f.write(np.ascontiguousarray(ch.sup.init, np.float32).tobytes())
            f.write(np.ascontiguousarray(ch.sup.final, np.float32).tobytes())
            f.write((np.ascontiguousarray(ch.sup.mask) > 0)
                    .astype(np.uint8).tobytes())


class NativeEgsLoader:
    """Iterator of training batches from a TEGS shard, prefetched in C++.

    Yields {"feats": [B,T_in,F], "sup": batched ChunkSupervision (compact:
    dummy trans)} — the same structure batch_iterator produces.
    """

    def __init__(self, path: str, batch_size: int, queue_depth: int = 4,
                 seed: int = 0, self_loop_prob: float = 0.5):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._configure_lib()
        with open(path, "rb") as f:
            magic = f.read(4)
            assert magic == _MAGIC, magic
            version, num_chunks, t_in, feat_dim, t_out = struct.unpack(
                "<5i", f.read(20))
            (max_states,) = struct.unpack("<i", f.read(4))
        assert version == _VERSION
        self.num_chunks = num_chunks
        self.t_in, self.feat_dim = t_in, feat_dim
        self.t_out, self.max_states = t_out, max_states
        self.batch_size = batch_size
        self.self_loop_prob = self_loop_prob
        self._h = lib.egs_loader_create(path.encode(), batch_size, queue_depth,
                                        ctypes.c_uint64(seed))
        if not self._h:
            raise RuntimeError(f"failed to open egs shard {path}")

    def _configure_lib(self):
        lib = self._lib
        if getattr(lib, "_egs_configured", False):
            return
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.egs_loader_create.argtypes = [ctypes.c_char_p, ctypes.c_int32,
                                          ctypes.c_int32, ctypes.c_uint64]
        lib.egs_loader_create.restype = ctypes.c_void_p
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.egs_loader_next.argtypes = [ctypes.c_void_p, f32p, f32p, i32p,
                                        f32p, f32p, u8p]
        lib.egs_loader_next.restype = ctypes.c_int32
        lib.egs_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.egs_loader_destroy.restype = None
        lib._egs_configured = True

    def __iter__(self) -> Iterator[dict]:
        b, s = self.batch_size, self.max_states
        while True:
            feats = np.empty((b, self.t_in, self.feat_dim), np.float32)
            next_w = np.empty((b, s // 2), np.float32)
            pdf = np.empty((b, s), np.int32)
            init = np.empty((b, s), np.float32)
            final = np.empty((b, s), np.float32)
            mask = np.empty((b, self.t_out, s), np.uint8)
            ok = self._lib.egs_loader_next(
                self._h, _f32p(feats), _f32p(next_w), _i32p(pdf),
                _f32p(init), _f32p(final),
                mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            if not ok:
                return
            sup = ChunkSupervision(
                trans=np.zeros((b, 1, 1), np.float32),  # unused (compact path)
                state_pdf=pdf, init=init, final=final, mask=mask,
                next_w=next_w, self_loop_prob=self.self_loop_prob,
            )
            yield {"feats": feats, "sup": sup}

    def close(self):
        if self._h:
            self._lib.egs_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
