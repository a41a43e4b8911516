"""Stats-driven clustered tree (graphs/tree_cluster.py) — the build_tree.sh
equivalent."""

import numpy as np
import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.data import (SyntheticCorpusConfig, make_synthetic_corpus,
                                EgsConfig, make_egs, batch_iterator)
from tdnnf_nas_tpu.graphs import (
    ChainTopology, build_denominator_graph, den_init_lookup,
    estimate_phone_lm, accumulate_tree_stats, build_clustered_tree,
    build_tree_from_corpus, TreeStats,
)


def _synthetic_stats(num_phones=4, d=3, seed=0):
    """Stats where, per phone, contexts {0,1} share a Gaussian and
    {2..} share a different one — the clustering ground truth."""
    rng = np.random.RandomState(seed)
    n_ctx = num_phones + 1
    counts = np.full((num_phones, n_ctx), 50.0)
    sums = np.zeros((num_phones, n_ctx, d))
    sumsqs = np.zeros((num_phones, n_ctx, d))
    for p in range(num_phones):
        mu_a = rng.randn(d) * 3
        mu_b = rng.randn(d) * 3 + 10
        for c in range(n_ctx):
            mu = mu_a if c < 2 else mu_b
            x = mu + 0.1 * rng.randn(int(counts[p, c]), d)
            sums[p, c] = x.sum(0)
            sumsqs[p, c] = (x * x).sum(0)
    return TreeStats(counts, sums, sumsqs)


def test_clustering_merges_identical_contexts_first():
    num_phones = 4
    stats = _synthetic_stats(num_phones)
    # 2 clusters per phone = exactly the ground truth
    tree = build_clustered_tree(stats, num_leaves=2 * num_phones)
    assert tree._n_fwd == 2 * num_phones
    for p in range(num_phones):
        a = {tree.forward_pdf(p, lc) for lc in (-1, 0)}
        b = {tree.forward_pdf(p, lc) for lc in range(1, num_phones)}
        assert len(a) == 1 and len(b) == 1, (p, a, b)
        assert a != b
    # pdf ids are dense and in range
    all_pdfs = {tree.pdf(p, k, lc) for p in range(num_phones)
                for k in (0, 1) for lc in range(-1, num_phones)}
    assert all_pdfs == set(range(tree.num_pdfs))


def test_clustering_respects_phone_boundaries():
    stats = _synthetic_stats(3, seed=1)
    tree = build_clustered_tree(stats, num_leaves=3)  # 1 leaf per phone
    assert tree._n_fwd == 3
    fwd = {p: tree.forward_pdf(p, -1) for p in range(3)}
    assert len(set(fwd.values())) == 3  # never tied across central phones


def test_tree_from_corpus_trains_e2e():
    """Clustered tree plugs into den graph + egs + a couple of train steps."""
    from tdnnf_nas_tpu.models import TdnnfModelConfig, model_context
    from tdnnf_nas_tpu.ops.fwdbwd import DenGraphArrays
    from tdnnf_nas_tpu.train import (TrainerConfig, OptimizerConfig,
                                     init_train_state, make_train_step)

    cfg = SyntheticCorpusConfig(num_utts=24, num_phones=5, feat_dim=8)
    utts, phone_seqs, _, topo = make_synthetic_corpus(cfg)
    tree = build_tree_from_corpus(
        utts, phone_seqs, cfg.num_phones, num_leaves=12,
        frame_subsampling_factor=cfg.frame_subsampling_factor)
    full = cfg.num_phones * (cfg.num_phones + 1)
    assert tree._n_fwd == 12 < full
    assert tree.num_pdfs == 12 + cfg.num_phones

    lm = estimate_phone_lm(phone_seqs, cfg.num_phones)
    den = build_denominator_graph(lm, topo, tree)
    assert den.num_pdfs == tree.num_pdfs
    model_cfg = TdnnfModelConfig(
        feat_dim=8, ivector_dim=0, hidden_dim=32, bottleneck_dim=8,
        time_strides=(1, 3), num_pdfs=tree.num_pdfs, prefinal_big=32,
        prefinal_small=16, compute_dtype="float32")
    left, right = model_context(model_cfg)
    chunks = make_egs(utts, lm, topo, tree,
                      EgsConfig(chunk_width=10, left_context=left,
                                right_context=right, max_phones_per_chunk=12),
                      den_init_fn=den_init_lookup(den, cfg.num_phones))
    tr = TrainerConfig(optimizer=OptimizerConfig(kind="adam", lr_initial=2e-3,
                                                 lr_final=1e-3, num_steps=10))
    state = init_train_state(model_cfg, tr, jax.random.PRNGKey(0))
    step = make_train_step(model_cfg, tr, DenGraphArrays.from_graph(den))
    it = batch_iterator(chunks, batch_size=4, rng=np.random.RandomState(0))
    key = jax.random.PRNGKey(1)
    for i, batch in enumerate(it):
        if i >= 3:
            break
        state, metrics = step(state, batch, key)
    assert np.isfinite(float(metrics["objf_mmi"]))


def test_rare_contexts_go_to_fallback():
    num_phones = 3
    stats = _synthetic_stats(num_phones, seed=2)
    stats.counts[0, 2] = 0.0  # unseen context
    tree = build_clustered_tree(stats, num_leaves=100)  # no merging pressure
    # unseen context maps to phone-0's fallback cluster, a valid pdf
    pdf = tree.forward_pdf(0, 1)
    assert 0 <= pdf < tree._n_fwd
