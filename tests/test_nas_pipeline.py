"""Full two-stage NAS pipeline integration tests (miniature scale).

Mirrors reference steps 6 (context-offset search) and 7 (bottleneck search):
uniform-sample supernet pretrain -> alpha-only gumbel cv-update with frozen
theta/BN -> beam-search extraction -> child retrain.
"""

import numpy as np
import jax
import pytest

from tdnnf_nas_tpu.data import SyntheticCorpusConfig, make_synthetic_corpus
from tdnnf_nas_tpu.models import TdnnfModelConfig
from tdnnf_nas_tpu.recipes import (
    prepare_data,
    run_offset_search_pipeline,
    run_bottleneck_search_pipeline,
    decode_corpus,
    train_model,
)
from tdnnf_nas_tpu.train import TrainerConfig, OptimizerConfig


@pytest.fixture(scope="module")
def bundle():
    cfg = SyntheticCorpusConfig(num_utts=40, num_phones=5, feat_dim=10,
                                min_phones=5, max_phones=14, seed=3)
    utts, phone_seqs, tree, topo = make_synthetic_corpus(cfg)
    return prepare_data(utts, phone_seqs, tree, topo, cfg.num_phones,
                        dev_fraction=0.2)


BASE = TdnnfModelConfig(
    feat_dim=10, ivector_dim=0, hidden_dim=24, bottleneck_dim=8,
    time_strides=(1, 2), num_pdfs=10, prefinal_big=24, prefinal_small=12,
    compute_dtype="float32",
)

TKW = dict(optimizer=OptimizerConfig(kind="adam", lr_initial=2e-3,
                                     lr_final=1e-3, num_steps=40,
                                     alpha_lr_scale=5.0))


def test_offset_search_pipeline(bundle):
    res = run_offset_search_pipeline(
        bundle, BASE, max_stride=2, pretrain_steps=14, cvupdate_steps=12,
        child_steps=14, batch_size=4, chunk_width=14, trainer_kw=TKW,
    )
    # alphas moved during cv-update
    a = np.asarray(res["supernet_state"].alphas["offsets_linear"])
    assert np.abs(a).max() > 1e-4
    assert len(res["archs"]) >= 1
    pairs, lp = res["archs"][0]
    assert len(pairs) == 2 and all(0 <= x <= 2 for pr in pairs for x in pr)
    child = res["children"][0]
    assert np.isfinite(child["metrics"].last("objf_mmi"))
    # child objective improved over its own first steps
    first = child["metrics"].series["objf_mmi"][0][1]
    last = child["metrics"].last("objf_mmi")
    assert last > first


def test_bottleneck_search_pipeline(bundle):
    res = run_bottleneck_search_pipeline(
        bundle, BASE, bottleneck_groups=(4, 4, 8), pretrain_steps=12,
        cvupdate_steps=10, child_steps=12, flops_coef=1e-4, batch_size=4,
        chunk_width=14, trainer_kw=TKW,
    )
    dims, _ = res["archs"][0]
    assert len(dims) == 2 and all(d in (4, 8, 16) for d in dims)
    assert res["child_cfg"].bottleneck_dims == dims
    assert np.isfinite(res["child_metrics"].last("objf_mmi"))


def test_train_and_decode_reduces_per(bundle):
    """Train the tiny baseline a bit and check decode beats a random model."""
    tr = TrainerConfig(optimizer=OptimizerConfig(kind="adam", lr_initial=3e-3,
                                                 lr_final=1e-3, num_steps=80))
    state0 = None
    state, _ = train_model(bundle, BASE, tr, num_steps=80, batch_size=8,
                           chunk_width=14, seed=0)
    trained = decode_corpus(bundle, BASE, state)
    from tdnnf_nas_tpu.train import init_train_state
    rand_state = init_train_state(BASE, tr, jax.random.PRNGKey(99))
    random_res = decode_corpus(bundle, BASE, rand_state)
    assert trained["wer"] < random_res["wer"], (trained, random_res)
    assert trained["wer"] < 80.0, trained


def test_search_finds_planted_lookahead():
    """Planted-lag sanity (docs/search_sanity.json, scripts/
    search_sanity_planted.py): when the disambiguating evidence sits K=6
    output frames ahead, the cv-update must reject the affine strides
    that provably cannot reach it and concentrate on those that can."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import search_sanity_planted as ssp
    from tdnnf_nas_tpu.models import (DartsModelConfig, SearchMode,
                                      TdnnfModelConfig)
    from tdnnf_nas_tpu.recipes.chain_recipes import prepare_data, train_model
    from tdnnf_nas_tpu.train import OptimizerConfig, TrainerConfig

    utts, phone_seqs, tree, topo = ssp.make_planted_corpus(num_utts=96)
    bundle = prepare_data(utts, phone_seqs, tree, topo, tree.num_phones,
                          dev_fraction=0.12)
    base = TdnnfModelConfig(
        feat_dim=24, ivector_dim=0, hidden_dim=64, bottleneck_dim=16,
        time_strides=(1,), num_pdfs=tree.num_pdfs, prefinal_big=64,
        prefinal_small=32, compute_dtype="float32")
    darts = DartsModelConfig(base=base, search_offsets=True, max_stride=3)
    opt = dict(kind="adam", lr_initial=2e-3, lr_final=5e-4)
    pre = TrainerConfig(train_theta=True, train_alpha=False,
                        search_mode=SearchMode.UNIFORM,
                        optimizer=OptimizerConfig(num_steps=200, **opt))
    sup, _ = train_model(bundle, darts, pre, 200, batch_size=16,
                         chunk_width=20, seed=0, supernet=True)
    cv = TrainerConfig(train_theta=False, train_alpha=True, bn_frozen=True,
                       search_mode=SearchMode.SOFTMAX,
                       optimizer=OptimizerConfig(num_steps=500,
                                                 alpha_lr_scale=30.0, **opt))
    sup, _ = train_model(bundle, darts, cv, 500, batch_size=16,
                         chunk_width=20, seed=1, supernet=True,
                         init_state=sup, dev=True)
    a_aff = np.asarray(sup.alphas["offsets_affine"])
    p = np.exp(a_aff) / np.exp(a_aff).sum(-1, keepdims=True)
    assert p[0, 2] + p[0, 3] > 0.7, p[0]  # reachable strides win
    assert p[0, 0] < 0.15 and p[0, 1] < 0.2, p[0]  # unreachable rejected
