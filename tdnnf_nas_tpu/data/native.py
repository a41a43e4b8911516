"""ctypes bindings for the native (C++) egs/supervision builder.

Loads native/libegs.so, auto-building it with g++ on first use (the image
ships the native toolchain).  All entry points have pure-Python
equivalents (graphs/supervision.py, decode/scoring.py) used as the
reference semantics in tests; the native path exists so supervision-graph
construction for real training scales (millions of chunks) without
stalling the device step — the role Kaldi's C++ egs pipeline plays in the
reference (SURVEY.md §3.1 get_egs).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libegs.so")
_lock = threading.Lock()
_lib = None


_SOURCES = ("egs_builder.cc", "decoder.cc", "egs_loader.cc", "lattice.cc",
            "beam_sparse.cc")


def _build_lib() -> None:
    subprocess.run(
        ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17",
         "-o", _LIB_PATH]
        + [os.path.join(_NATIVE_DIR, s) for s in _SOURCES],
        check=True, capture_output=True,
    )


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        stale = (not os.path.exists(_LIB_PATH)) or any(
            os.path.getmtime(os.path.join(_NATIVE_DIR, s))
            > os.path.getmtime(_LIB_PATH)
            for s in _SOURCES
            if os.path.exists(os.path.join(_NATIVE_DIR, s))
        )
        if stale:
            try:
                _build_lib()
            except Exception:
                if not os.path.exists(_LIB_PATH):
                    return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        try:
            _bind_symbols(lib)
        except AttributeError:
            # stale prebuilt .so missing newer symbols (e.g. built before a
            # source was added and g++ unavailable to rebuild): treat the
            # whole native path as unavailable rather than half-working
            return None
        _lib = lib
        return _lib


def _bind_symbols(lib: ctypes.CDLL) -> None:
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.build_supervision_batch.argtypes = [
        i32p, i32p, i32p, i32p, f32p, i32p, i32p, f32p, f32p,
        ctypes.c_float, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
        f32p, i32p, f32p, f32p, f32p,
    ]
    lib.build_supervision_batch.restype = None
    lib.edit_distance_batch.argtypes = [i32p, i32p, i32p, i32p,
                                        ctypes.c_int32, i32p]
    lib.edit_distance_batch.restype = None
    lib.decode_nbest.argtypes = [
        f32p, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, f32p, i32p, f32p, f32p, i32p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
        ctypes.c_int32, ctypes.c_int32, i32p, i32p, f32p,
    ]
    lib.decode_nbest.restype = ctypes.c_int32
    lib.generate_lattice.argtypes = [
        f32p, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, f32p, i32p, f32p, f32p, i32p,
        ctypes.c_int32, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, i32p, i32p, f32p, f32p, i32p,
    ]
    lib.generate_lattice.restype = ctypes.c_int32
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.beam_decode_sparse_native.argtypes = [
        f32p, ctypes.c_int32, ctypes.c_int32,
        i64p, i32p, f32p, i32p, i32p, f32p,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.c_float, ctypes.c_float, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_float,
        ctypes.c_int32, i32p, i32p, f32p,
        ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, i32p, i32p, f32p, f32p, i32p, f32p,
    ]
    lib.beam_decode_sparse_native.restype = ctypes.c_int32


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ragged(seqs: Sequence[Sequence[int]]):
    offsets = np.zeros(len(seqs) + 1, np.int32)
    for i, s in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(s)
    flat = np.asarray([x for s in seqs for x in s], np.int32)
    if flat.size == 0:
        flat = np.zeros(1, np.int32)
    return flat, offsets


def build_supervision_batch_native(
    phone_seqs: Sequence[Sequence[int]],
    begin_seqs: Optional[Sequence[Sequence[int]]],
    end_seqs: Optional[Sequence[Sequence[int]]],
    lm_probs: np.ndarray,  # [P+1, P]
    fwd_pdf_table: np.ndarray,  # [P+1, P] int32
    self_pdf_table: np.ndarray,  # [P] int32
    den_init_enter: Optional[np.ndarray],  # [P] or None
    den_init_loop: Optional[np.ndarray],
    self_loop_prob: float,
    tol: int,
    num_frames: int,
    max_states: int,
):
    """Batched supervision graphs; returns dict of [B, ...] arrays
    (layout identical to graphs.supervision.make_chunk_supervision)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    b = len(phone_seqs)
    p = lm_probs.shape[1]
    s, t = max_states, num_frames
    phones, offsets = _ragged(phone_seqs)
    if begin_seqs is not None:
        begins, boff = _ragged(begin_seqs)
        ends, eoff = _ragged(end_seqs)
        assert (boff == offsets).all() and (eoff == offsets).all()
        bp, ep = _i32p(begins), _i32p(ends)
    else:
        bp = ctypes.cast(None, ctypes.POINTER(ctypes.c_int32))
        ep = ctypes.cast(None, ctypes.POINTER(ctypes.c_int32))
    lm = np.ascontiguousarray(lm_probs, np.float32)
    fwd = np.ascontiguousarray(fwd_pdf_table, np.int32)
    slf = np.ascontiguousarray(self_pdf_table, np.int32)
    trans = np.zeros((b, s, s), np.float32)
    pdf = np.zeros((b, s), np.int32)
    init = np.zeros((b, s), np.float32)
    final = np.zeros((b, s), np.float32)
    mask = np.zeros((b, t, s), np.float32)
    de = (np.ascontiguousarray(den_init_enter, np.float32)
          if den_init_enter is not None else None)
    dl = (np.ascontiguousarray(den_init_loop, np.float32)
          if den_init_loop is not None else None)
    null_f = ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    lib.build_supervision_batch(
        _i32p(phones), _i32p(offsets), bp, ep, _f32p(lm), _i32p(fwd), _i32p(slf),
        _f32p(de) if de is not None else null_f,
        _f32p(dl) if dl is not None else null_f,
        ctypes.c_float(self_loop_prob), tol, t, s, p, b,
        _f32p(trans), _i32p(pdf), _f32p(init), _f32p(final), _f32p(mask),
    )
    return {"trans": trans, "state_pdf": pdf, "init": init, "final": final,
            "mask": mask}


def tree_tables(tree, num_phones: int):
    """Precompute (fwd_pdf_table [P+1,P], self_pdf_table [P]) for a tree."""
    fwd = np.zeros((num_phones + 1, num_phones), np.int32)
    for left in range(-1, num_phones):
        for p in range(num_phones):
            fwd[left + 1, p] = tree.forward_pdf(p, left)
    slf = np.asarray([tree.self_loop_pdf(p) for p in range(num_phones)], np.int32)
    return fwd, slf


def den_init_tables(den_graph, num_phones: int):
    """(enter [P], loop [P]) den init probs for the CI den-graph layout."""
    g = den_graph
    if g.num_states != 2 * num_phones:
        raise ValueError("den_init_tables supports the CI den layout only")
    return (np.asarray(g.init[:num_phones], np.float32),
            np.asarray(g.init[num_phones:], np.float32))


def _graph_csr(decoding_graph):
    """(log arrays + CSR successors) for a DecodingGraph's StateGraph."""
    g = decoding_graph.graph
    s = g.num_states
    with np.errstate(divide="ignore"):
        lt = np.where(g.trans > 0, np.log(np.maximum(g.trans, 1e-30)), -1e30)
        li = np.where(g.init > 0, np.log(np.maximum(g.init, 1e-30)), -1e30)
        lf = np.where(g.final > 0, np.log(np.maximum(g.final, 1e-30)), -1e30)
    offsets = np.zeros((s + 1,), np.int32)
    dsts, ws = [], []
    for st in range(s):
        nz = np.nonzero(g.trans[st] > 0)[0]
        offsets[st + 1] = offsets[st] + len(nz)
        dsts.append(nz)
        ws.append(lt[st, nz])
    dst = np.concatenate(dsts).astype(np.int32) if dsts else np.zeros(1, np.int32)
    logw = np.concatenate(ws).astype(np.float32) if ws else np.zeros(1, np.float32)
    return (offsets, dst, logw,
            np.ascontiguousarray(g.state_pdf, np.int32),
            np.ascontiguousarray(li, np.float32),
            np.ascontiguousarray(lf, np.float32))


def generate_lattice_native(
    obs_logprob: np.ndarray,  # [T, P]
    decoding_graph,  # decode.wfst.DecodingGraph
    acoustic_scale: float = 1.0,
    beam: float = 16.0,
    lattice_beam: float = 8.0,
):
    """Native lattice generation; same semantics as
    decode.lattice.generate_lattice (tested equivalent)."""
    from tdnnf_nas_tpu.decode.lattice import Lattice

    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    offsets, dst, logw, spdf, li, lf = _graph_csr(decoding_graph)
    s = decoding_graph.graph.num_states
    obs = np.ascontiguousarray(obs_logprob, np.float32)
    t, p = obs.shape
    wos = np.ascontiguousarray(decoding_graph.word_of_state, np.int32)
    # modest initial bounds (beam pruning keeps survivors far below T*S);
    # the rc == -2 retry doubles them on demand, capped within int32
    _I32_MAX = 2**31 - 16
    max_nodes = min(t * s + 2, 64 * t + 2, _I32_MAX)
    max_arcs = min(4 * t * int(offsets[-1]) + 2 * s + 16, 2048 * t + 16,
                   _I32_MAX)
    while True:
        node_time = np.zeros((max_nodes,), np.int32)
        arc_src = np.zeros((max_arcs,), np.int32)
        arc_dst = np.zeros((max_arcs,), np.int32)
        arc_word = np.zeros((max_arcs,), np.int32)
        arc_am = np.zeros((max_arcs,), np.float32)
        arc_gs = np.zeros((max_arcs,), np.float32)
        counts = np.zeros((2,), np.int32)
        rc = lib.generate_lattice(
            _f32p(obs), t, p, _i32p(offsets), _i32p(dst), _f32p(logw),
            _i32p(spdf), _f32p(li), _f32p(lf), _i32p(wos), s,
            ctypes.c_float(acoustic_scale), ctypes.c_float(beam),
            ctypes.c_float(lattice_beam), max_nodes, max_arcs,
            _i32p(node_time), _i32p(arc_src), _i32p(arc_dst), _i32p(arc_word),
            _f32p(arc_am), _f32p(arc_gs), _i32p(counts),
        )
        if rc == -1:
            raise ValueError("no complete path survived the beam")
        if rc == -2:
            if max_nodes >= _I32_MAX and max_arcs >= _I32_MAX:
                raise MemoryError("lattice exceeds int32 node/arc bounds")
            max_nodes = min(max_nodes * 2, _I32_MAX)
            max_arcs = min(max_arcs * 2, _I32_MAX)
            continue
        break
    n_nodes, n_arcs = int(counts[0]), int(counts[1])
    return Lattice(
        num_nodes=n_nodes,
        node_time=node_time[:n_nodes].copy(),
        arc_src=arc_src[:n_arcs].copy(),
        arc_dst=arc_dst[:n_arcs].copy(),
        arc_word=arc_word[:n_arcs].copy(),
        arc_am=arc_am[:n_arcs].copy(),
        arc_gs=arc_gs[:n_arcs].copy(),
    )


def nbest_decode_native(
    obs_logprob: np.ndarray,  # [T, P]
    decoding_graph,  # decode.wfst.DecodingGraph
    n: int = 10,
    acoustic_scale: float = 1.0,
    max_pops: int = 200000,
    max_words: int = 128,
):
    """Native n-best decode; same semantics as decode.nbest.nbest_decode
    (tested equivalent).  Returns [(words, score)] best-first."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    g = decoding_graph.graph
    s = g.num_states
    with np.errstate(divide="ignore"):
        lt = np.where(g.trans > 0, np.log(np.maximum(g.trans, 1e-30)), -1e30)
        li = np.where(g.init > 0, np.log(np.maximum(g.init, 1e-30)), -1e30)
        lf = np.where(g.final > 0, np.log(np.maximum(g.final, 1e-30)), -1e30)
    # CSR successors
    offsets = np.zeros((s + 1,), np.int32)
    dsts, ws = [], []
    for st in range(s):
        nz = np.nonzero(g.trans[st] > 0)[0]
        offsets[st + 1] = offsets[st] + len(nz)
        dsts.append(nz)
        ws.append(lt[st, nz])
    dst = np.concatenate(dsts).astype(np.int32) if dsts else np.zeros(1, np.int32)
    logw = np.concatenate(ws).astype(np.float32) if ws else np.zeros(1, np.float32)
    obs = np.ascontiguousarray(obs_logprob, np.float32)
    t, p = obs.shape
    out_words = np.zeros((n, max_words), np.int32)
    out_lens = np.zeros((n,), np.int32)
    out_scores = np.zeros((n,), np.float32)
    found = lib.decode_nbest(
        _f32p(obs), t, p, _i32p(offsets), _i32p(dst), _f32p(logw),
        _i32p(np.ascontiguousarray(g.state_pdf, np.int32)),
        _f32p(np.ascontiguousarray(li, np.float32)),
        _f32p(np.ascontiguousarray(lf, np.float32)),
        _i32p(np.ascontiguousarray(decoding_graph.word_of_state, np.int32)),
        s, n, ctypes.c_float(acoustic_scale), max_pops, max_words,
        _i32p(out_words), _i32p(out_lens), _f32p(out_scores),
    )
    return [(out_words[i, : out_lens[i]].tolist(), float(out_scores[i]))
            for i in range(found)]


def beam_decode_sparse_csr_native(
    obs_logprob: np.ndarray,  # [T, P]
    g,  # decode.graph_sparse.SparseDecodingGraph
    acoustic_scale: float = 1.0,
    beam: float = 16.0,
    max_active: int = 7000,
    lattice: bool = False,
    lattice_beam: float = 8.0,
):
    """Native beam search over a SparseDecodingGraph — same semantics as
    decode.beam._beam_decode_once (parity-tested).  Returns (words, score,
    Lattice|None); raises decode.beam.BeamSearchDied when no token
    survives a frame (the caller's retry-beam loop handles it)."""
    from tdnnf_nas_tpu.decode.beam import BeamSearchDied
    from tdnnf_nas_tpu.decode.lattice import Lattice

    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    obs = np.ascontiguousarray(obs_logprob, np.float32)
    t, p = obs.shape
    out_start = np.ascontiguousarray(g.out_start, np.int64)
    arc_dst = np.ascontiguousarray(g.arc_dst, np.int32)
    arc_w = np.ascontiguousarray(g.arc_w, np.float32)
    arc_word = np.ascontiguousarray(g.arc_word, np.int32)
    spdf = np.ascontiguousarray(g.state_pdf, np.int32)
    finw = np.ascontiguousarray(g.final_w, np.float32)
    i64p_ = out_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    max_words = max(16, 4 * t)
    max_nodes = (t * min(max_active, 4096) + 2) if lattice else 2
    max_arcs = (32 * max_nodes + 16) if lattice else 2
    while True:
        out_words = np.zeros((max_words,), np.int32)
        out_n = np.zeros((1,), np.int32)
        out_score = np.zeros((1,), np.float32)
        node_time = np.zeros((max_nodes,), np.int32)
        l_src = np.zeros((max_arcs,), np.int32)
        l_dst = np.zeros((max_arcs,), np.int32)
        l_word = np.zeros((max_arcs,), np.int32)
        l_am = np.zeros((max_arcs,), np.float32)
        l_gs = np.zeros((max_arcs,), np.float32)
        counts = np.zeros((2,), np.int32)
        mean_active = np.zeros((1,), np.float32)
        rc = lib.beam_decode_sparse_native(
            _f32p(obs), t, p, i64p_, _i32p(arc_dst), _f32p(arc_w),
            _i32p(arc_word), _i32p(spdf), _f32p(finw),
            int(g.num_states), int(g.start_state),
            ctypes.c_float(acoustic_scale), ctypes.c_float(beam),
            int(max_active), int(bool(lattice)), ctypes.c_float(lattice_beam),
            int(max_words), _i32p(out_words), _i32p(out_n), _f32p(out_score),
            int(max_nodes), int(max_arcs), _i32p(node_time), _i32p(l_src),
            _i32p(l_dst), _i32p(l_word), _f32p(l_am), _f32p(l_gs),
            _i32p(counts), _f32p(mean_active),
        )
        if rc == -1:
            raise BeamSearchDied("beam search died (native)")
        if rc == -2:
            max_words *= 2
            max_nodes = max(max_nodes * 2, 1024)
            max_arcs = max(max_arcs * 2, 16384)
            continue
        break
    words = out_words[: int(out_n[0])].tolist()
    score = float(out_score[0])
    n_active = float(mean_active[0])
    lat = None
    if lattice:
        n_nodes, n_arcs = int(counts[0]), int(counts[1])
        order = np.argsort(l_src[:n_arcs], kind="stable")
        lat = Lattice(
            num_nodes=n_nodes,
            node_time=node_time[:n_nodes].copy(),
            arc_src=l_src[:n_arcs][order].copy(),
            arc_dst=l_dst[:n_arcs][order].copy(),
            arc_word=l_word[:n_arcs][order].copy(),
            arc_am=l_am[:n_arcs][order].copy(),
            arc_gs=l_gs[:n_arcs][order].copy(),
        )
    return words, score, lat, n_active


def edit_distance_batch_native(refs: List[Sequence[int]], hyps: List[Sequence[int]]):
    """[N, 4] int32 counts (sub, ins, del, hits) per pair."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    r, ro = _ragged(refs)
    h, ho = _ragged(hyps)
    out = np.zeros((len(refs), 4), np.int32)
    lib.edit_distance_batch(_i32p(r), _i32p(ro), _i32p(h), _i32p(ho),
                            len(refs), _i32p(out))
    return out
