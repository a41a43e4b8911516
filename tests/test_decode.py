"""Viterbi decode + WER scoring tests."""

import numpy as np
import jax.numpy as jnp

from tdnnf_nas_tpu.decode import viterbi_decode, path_to_phones, edit_distance, wer, score_corpus
from tdnnf_nas_tpu.decode.viterbi import graph_log_arrays
from tdnnf_nas_tpu.graphs import (
    ChainTopology, ContextIndependentTree, estimate_phone_lm,
    build_denominator_graph,
)


def test_viterbi_matches_bruteforce():
    rng = np.random.RandomState(0)
    s, p, t = 5, 4, 6
    trans = rng.rand(s, s) * (rng.rand(s, s) < 0.6)
    trans[np.arange(s), np.arange(s)] += 0.2
    trans /= trans.sum(1, keepdims=True)
    state_pdf = rng.randint(0, p, s)
    init = rng.dirichlet(np.ones(s))
    final = np.ones(s)
    obs = rng.randn(2, t, p).astype(np.float32)

    with np.errstate(divide="ignore"):
        lt = np.log(trans); li = np.log(init); lf = np.log(final)
    lt[~np.isfinite(lt)] = -1e30
    li[~np.isfinite(li)] = -1e30
    score, paths = viterbi_decode(
        jnp.asarray(obs), jnp.asarray(lt, jnp.float32), jnp.asarray(state_pdf),
        jnp.asarray(li, jnp.float32), jnp.asarray(lf, jnp.float32),
    )
    # brute force over all state paths
    from itertools import product
    for b in range(2):
        best, best_path = -np.inf, None
        for path in product(range(s), repeat=t):
            lp = li[path[0]] + obs[b, 0, state_pdf[path[0]]]
            for i in range(1, t):
                lp += lt[path[i - 1], path[i]] + obs[b, i, state_pdf[path[i]]]
            lp += lf[path[-1]]
            if lp > best:
                best, best_path = lp, path
        np.testing.assert_allclose(float(score[b]), best, rtol=1e-4)
        assert tuple(np.asarray(paths[b])) == best_path


def test_viterbi_recovers_planted_sequence():
    """With near-deterministic emissions the decode recovers the true phones."""
    num_phones = 5
    rng = np.random.RandomState(1)
    seqs = [rng.randint(0, num_phones, size=8).tolist() for _ in range(30)]
    lm = estimate_phone_lm(seqs, num_phones)
    topo = ChainTopology(num_phones)
    tree = ContextIndependentTree(num_phones)
    den = build_denominator_graph(lm, topo, tree)

    true_phones = [2, 0, 3, 1, 4]
    durs = [3, 2, 4, 2, 3]
    pdfs = []
    for ph, d in zip(true_phones, durs):
        pdfs.append(tree.forward_pdf(ph))
        pdfs.extend([tree.self_loop_pdf(ph)] * (d - 1))
    t = len(pdfs)
    obs = np.full((1, t, tree.num_pdfs), -8.0, np.float32)
    for i, pdf in enumerate(pdfs):
        obs[0, i, pdf] = 0.0
    lt, spdf, li, lf = graph_log_arrays(den)
    _, paths = viterbi_decode(jnp.asarray(obs), lt, spdf, li, lf)
    decoded = path_to_phones(np.asarray(paths[0]), num_phones)
    assert decoded == true_phones, (decoded, true_phones)


def test_edit_distance_and_wer():
    c = edit_distance([1, 2, 3, 4], [1, 5, 4])
    assert c["sub"] == 1 and c["del"] == 1 and c["ins"] == 0 and c["hits"] == 2
    assert wer([1, 2, 3, 4], [1, 5, 4]) == 50.0
    assert wer([1, 2], [1, 2]) == 0.0
    r = score_corpus([[1, 2], [3]], [[1, 2], [4]])
    assert r["ref_len"] == 3 and r["sub"] == 1
    np.testing.assert_allclose(r["wer"], 100.0 / 3, rtol=1e-6)
