"""End-to-end LF-MMI training on the synthetic corpus (CPU-runnable).

The round-1 integration test per SURVEY.md §4: a tiny TDNN-F trained with
the chain objective on HMM-generated data must push the MMI objective up
substantially (toward 0) — verifying model, graphs, supervision, objective
and optimizer end-to-end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdnnf_nas_tpu.data import (
    SyntheticCorpusConfig,
    make_synthetic_corpus,
    EgsConfig,
    make_egs,
    batch_iterator,
)
from tdnnf_nas_tpu.graphs import (
    estimate_phone_lm,
    build_denominator_graph,
    den_init_lookup,
)
from tdnnf_nas_tpu.models import TdnnfModelConfig, model_context
from tdnnf_nas_tpu.ops.fwdbwd import DenGraphArrays
from tdnnf_nas_tpu.train import (
    TrainerConfig,
    ChainObjectiveConfig,
    OptimizerConfig,
    init_train_state,
    make_train_step,
    make_valid_step,
)


@pytest.fixture(scope="module")
def setup():
    corpus_cfg = SyntheticCorpusConfig(num_utts=48, num_phones=6, feat_dim=12)
    utts, phone_seqs, tree, topo = make_synthetic_corpus(corpus_cfg)
    lm = estimate_phone_lm(phone_seqs, corpus_cfg.num_phones)
    den = build_denominator_graph(lm, topo, tree)
    model_cfg = TdnnfModelConfig(
        feat_dim=12, ivector_dim=0, hidden_dim=48, bottleneck_dim=12,
        time_strides=(1, 3), num_pdfs=tree.num_pdfs, prefinal_big=48,
        prefinal_small=24, compute_dtype="float32",
    )
    left, right = model_context(model_cfg)
    egs_cfg = EgsConfig(chunk_width=16, left_context=left, right_context=right,
                        max_phones_per_chunk=12)
    chunks = make_egs(utts, lm, topo, tree, egs_cfg,
                      den_init_fn=den_init_lookup(den, corpus_cfg.num_phones))
    assert len(chunks) >= 20, len(chunks)
    return model_cfg, chunks, den, lm, tree, topo


def test_e2e_training_improves_objective(setup):
    model_cfg, chunks, den, lm, tree, topo = setup
    trainer_cfg = TrainerConfig(
        objective=ChainObjectiveConfig(xent_regularize=0.1, leaky_hmm_coef=0.1),
        optimizer=OptimizerConfig(kind="adam", lr_initial=2e-3, lr_final=5e-4,
                                  num_steps=60),
    )
    state = init_train_state(model_cfg, trainer_cfg, jax.random.PRNGKey(0))
    den_arr = DenGraphArrays.from_graph(den)
    step = make_train_step(model_cfg, trainer_cfg, den_arr)
    rng = np.random.RandomState(0)
    it = batch_iterator(chunks, batch_size=8, rng=rng, epochs=None)
    key = jax.random.PRNGKey(42)

    first_objf = None
    last = None
    for i, batch in enumerate(it):
        if i >= 60:
            break
        state, metrics = step(state, batch, key)
        if first_objf is None:
            first_objf = float(metrics["objf_mmi"])
        last = metrics
    final_objf = float(last["objf_mmi"])
    # MMI objective (<=0-ish) must improve substantially on learnable data
    assert final_objf > first_objf + 0.5, (first_objf, final_objf)
    assert final_objf > -1.0, final_objf
    assert np.isfinite(float(last["objf_xent"]))
    # sanity: numerator subset => objective stays (near) non-positive
    assert final_objf < 0.05


def test_valid_step_runs(setup):
    model_cfg, chunks, den, *_ = setup
    trainer_cfg = TrainerConfig()
    state = init_train_state(model_cfg, trainer_cfg, jax.random.PRNGKey(1))
    valid = make_valid_step(model_cfg, trainer_cfg, DenGraphArrays.from_graph(den))
    rng = np.random.RandomState(1)
    batch = next(batch_iterator(chunks, batch_size=4, rng=rng))
    m = valid(state, batch)
    assert np.isfinite(float(m["objf_mmi"]))


def test_e2e_training_with_ng_optimizer(setup):
    """The natural-gradient preconditioner (kind='ng') trains the chain
    model end-to-end: objective improves, state stays finite."""
    model_cfg, chunks, den, lm, tree, topo = setup
    trainer_cfg = TrainerConfig(
        objective=ChainObjectiveConfig(xent_regularize=0.1, leaky_hmm_coef=0.1),
        optimizer=OptimizerConfig(kind="ng", lr_initial=3e-2, lr_final=1e-2,
                                  num_steps=70, ng_update_period=4),
    )
    state = init_train_state(model_cfg, trainer_cfg, jax.random.PRNGKey(0))
    den_arr = DenGraphArrays.from_graph(den)
    step = make_train_step(model_cfg, trainer_cfg, den_arr)
    rng = np.random.RandomState(2)
    it = batch_iterator(chunks, batch_size=8, rng=rng, epochs=None)
    key = jax.random.PRNGKey(7)
    first = last = None
    for i, batch in enumerate(it):
        if i >= 70:
            break
        state, metrics = step(state, batch, key)
        if first is None:
            first = float(metrics["objf_mmi"])
        last = float(metrics["objf_mmi"])
    assert np.isfinite(last)
    assert last > first + 0.3, (first, last)
