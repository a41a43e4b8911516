"""LHUC speaker adaptation tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdnnf_nas_tpu.data import (
    SyntheticCorpusConfig, make_synthetic_corpus, batch_iterator,
)
from tdnnf_nas_tpu.models import TdnnfModelConfig, init_model, apply_model
from tdnnf_nas_tpu.models.lhuc import init_lhuc, apply_model_lhuc, adapt_lhuc
from tdnnf_nas_tpu.recipes import prepare_data, train_model
from tdnnf_nas_tpu.train import TrainerConfig, OptimizerConfig


def test_identity_at_init():
    cfg = TdnnfModelConfig(
        feat_dim=8, ivector_dim=0, hidden_dim=16, bottleneck_dim=4,
        time_strides=(1, 2), num_pdfs=6, prefinal_big=16, prefinal_small=8,
        compute_dtype="float32",
    )
    params, bn = init_model(cfg, jax.random.PRNGKey(0))
    # output layers are zero-initialized; give them mass so scaling shows
    params["output_chain"]["w"] = jnp.asarray(
        np.random.RandomState(9).randn(8, 6).astype(np.float32) * 0.1)
    lhuc = init_lhuc(cfg)
    t_in = 8 + 4 * 3 + 1 + 8
    x = jnp.asarray(np.random.RandomState(0).randn(2, t_in, 8).astype(np.float32))
    c0, _, _ = apply_model(cfg, params, bn, x, train=False)
    c1, _, _ = apply_model_lhuc(cfg, params, bn, lhuc, x, train=False)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=1e-6)
    # nonzero logits change the output
    lhuc2 = {k: v + 0.5 for k, v in lhuc.items()}
    c2, _, _ = apply_model_lhuc(cfg, params, bn, lhuc2, x, train=False)
    assert not np.allclose(np.asarray(c0), np.asarray(c2))


def test_lhuc_adaptation_improves_shifted_speaker():
    """Adapting only LHUC scales on mean-shifted features recovers objective."""
    corpus_cfg = SyntheticCorpusConfig(num_utts=36, num_phones=5, feat_dim=10,
                                       seed=11)
    utts, phone_seqs, tree, topo = make_synthetic_corpus(corpus_cfg)
    bundle = prepare_data(utts, phone_seqs, tree, topo, 5, dev_fraction=0.2)
    cfg = TdnnfModelConfig(
        feat_dim=10, ivector_dim=0, hidden_dim=32, bottleneck_dim=8,
        time_strides=(1, 2), num_pdfs=tree.num_pdfs, prefinal_big=32,
        prefinal_small=16, compute_dtype="float32",
    )
    tr = TrainerConfig(optimizer=OptimizerConfig(kind="adam", lr_initial=3e-3,
                                                 lr_final=1e-3, num_steps=60))
    state, _ = train_model(bundle, cfg, tr, num_steps=60, batch_size=8,
                           chunk_width=14, seed=0)

    # "new speaker": strong multiplicative + additive feature mismatch
    import dataclasses
    rng_shift = np.random.RandomState(5)
    gain = (1.0 + rng_shift.rand(10).astype(np.float32) * 2.0)[None, :]
    bias = rng_shift.randn(10).astype(np.float32)[None, :] * 1.5
    shifted = [dataclasses.replace(u, feats=u.feats * gain + bias)
               for u in bundle.dev_utts]
    b2 = dataclasses.replace(bundle, train_utts=shifted)
    chunks = b2.egs(cfg, chunk_width=14)
    assert len(chunks) >= 4
    batches = list(batch_iterator(chunks, batch_size=4,
                                  rng=np.random.RandomState(0), epochs=1))

    from tdnnf_nas_tpu.train.objective import chain_objective

    def objf(lhuc):
        tot = 0.0
        for batch in batches:
            chain, xent, _ = apply_model_lhuc(cfg, state.params, state.bn_state,
                                              lhuc, jnp.asarray(batch["feats"]),
                                              train=False)
            _, m = chain_objective(chain, xent, bundle.den_arrays, batch["sup"],
                                   tr.objective)
            tot += float(m["objf_mmi"])
        return tot / len(batches)

    base_objf = objf(init_lhuc(cfg))
    adapted, _ = adapt_lhuc(cfg, state.params, state.bn_state,
                            bundle.den_arrays, tr.objective, batches,
                            num_steps=60, lr=1.0)
    adapted_objf = objf(adapted)
    assert adapted_objf > base_objf + 0.008, (base_objf, adapted_objf)
