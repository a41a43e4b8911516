"""Dropout schedule + mixed chunk widths (VERDICT round-1 item #9).

Reference anchors: `--trainer.dropout-schedule` machinery in
`steps/libs/nnet3/train/common.py` (used with dropout-per-dim-continuous,
`run_tdnn_7q_fbk_40_manual.sh:140`) and mixed `--egs.chunk-width 150,110,100
(`:186`)."""

import numpy as np
import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.data import (SyntheticCorpusConfig, make_synthetic_corpus,
                                EgsConfig, make_egs, batch_iterator)
from tdnnf_nas_tpu.graphs import (estimate_phone_lm, build_denominator_graph,
                                  den_init_lookup)
from tdnnf_nas_tpu.models import TdnnfModelConfig, model_context
from tdnnf_nas_tpu.ops.fwdbwd import DenGraphArrays
from tdnnf_nas_tpu.train import (TrainerConfig, OptimizerConfig,
                                 init_train_state, make_train_step)


def _setup(extra_widths=()):
    corpus_cfg = SyntheticCorpusConfig(num_utts=32, num_phones=5, feat_dim=10,
                                       min_phones=8, max_phones=20)
    utts, phone_seqs, tree, topo = make_synthetic_corpus(corpus_cfg)
    lm = estimate_phone_lm(phone_seqs, 5)
    den = build_denominator_graph(lm, topo, tree)
    model_cfg = TdnnfModelConfig(
        feat_dim=10, ivector_dim=0, hidden_dim=24, bottleneck_dim=8,
        time_strides=(1, 2), num_pdfs=tree.num_pdfs, prefinal_big=24,
        prefinal_small=12, compute_dtype="float32",
        dropout_proportion=0.0)
    left, right = model_context(model_cfg)
    egs_cfg = EgsConfig(chunk_width=14, extra_chunk_widths=extra_widths,
                        left_context=left, right_context=right,
                        max_phones_per_chunk=14)
    chunks = make_egs(utts, lm, topo, tree, egs_cfg,
                      den_init_fn=den_init_lookup(den, 5))
    return model_cfg, den, chunks


def test_dropout_schedule_values_and_effect():
    model_cfg, den, chunks = _setup()
    sched = ((0.0, 0.0), (0.5, 0.6), (1.0, 0.0))
    tc = TrainerConfig(dropout_schedule=sched,
                       optimizer=OptimizerConfig(num_steps=10))
    state = init_train_state(model_cfg, tc, jax.random.PRNGKey(0))
    step = make_train_step(model_cfg, tc, DenGraphArrays.from_graph(den),
                           donate=False)
    it = batch_iterator(chunks, batch_size=4, rng=np.random.RandomState(0))
    key = jax.random.PRNGKey(1)
    ps = []
    for i, batch in enumerate(it):
        if i >= 10:
            break
        state, m = step(state, batch, key)
        ps.append(float(m["dropout_p"]))
        assert np.isfinite(float(m["objf_mmi"]))
    # piecewise-linear: rises to 0.6 at f=0.5 then falls
    expect = np.interp(np.arange(10) / 10.0, [0, 0.5, 1.0], [0, 0.6, 0])
    np.testing.assert_allclose(ps, expect, atol=1e-5)


def test_mixed_chunk_widths_train():
    model_cfg, den, chunks = _setup(extra_widths=(10, 8))
    t_sizes = {c.feats.shape[0] for c in chunks}
    assert len(t_sizes) == 3, t_sizes  # three width buckets materialized
    tc = TrainerConfig(optimizer=OptimizerConfig(lr_initial=2e-3,
                                                 lr_final=5e-4,
                                                 num_steps=40))
    state = init_train_state(model_cfg, tc, jax.random.PRNGKey(0))
    step = make_train_step(model_cfg, tc, DenGraphArrays.from_graph(den),
                           donate=False)
    it = batch_iterator(chunks, batch_size=4, rng=np.random.RandomState(0))
    key = jax.random.PRNGKey(1)
    seen_t = set()
    objs = []
    for i, batch in enumerate(it):
        if i >= 40:
            break
        # every batch is single-width
        assert batch["feats"].shape[1] in {c.feats.shape[0] for c in chunks}
        seen_t.add(batch["feats"].shape[1])
        state, m = step(state, batch, key)
        objs.append(float(m["objf_mmi"]))
    assert len(seen_t) == 3, seen_t  # all jit shapes actually exercised
    assert all(np.isfinite(o) for o in objs)
    # still learns across bucketed shapes
    assert np.mean(objs[-8:]) > np.mean(objs[:8]) + 0.1, (
        np.mean(objs[:8]), np.mean(objs[-8:]))


def test_chunk_tiling_covers_tails():
    """Utterance tails shorter than min(width) get a snapped-back
    overlapping final chunk — full frame coverage, so the chunk count per
    utterance is exactly ceil(t_out / w) (ADVICE r2: the rotating tiler
    silently dropped tails without counting them)."""
    corpus_cfg = SyntheticCorpusConfig(num_utts=24, num_phones=5, feat_dim=10,
                                       min_phones=8, max_phones=20)
    utts, phone_seqs, tree, topo = make_synthetic_corpus(corpus_cfg)
    lm = estimate_phone_lm(phone_seqs, 5)
    den = build_denominator_graph(lm, topo, tree)
    w = 14
    egs_cfg = EgsConfig(chunk_width=w, left_context=4, right_context=4,
                        max_phones_per_chunk=999)
    stats = {}
    make_egs(utts, lm, topo, tree, egs_cfg,
             den_init_fn=den_init_lookup(den, 5), stats=stats)
    t_outs = [len(u.pdf_align) for u in utts]
    assert any(t % w for t in t_outs if t >= w)  # tails actually exercised
    expected = sum(-(-t // w) for t in t_outs if t >= w)
    assert stats["num_chunks"] + stats["dropped_chunks"] == expected
