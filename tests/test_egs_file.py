"""Binary egs shard + native streaming loader tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdnnf_nas_tpu.data import (
    SyntheticCorpusConfig, make_synthetic_corpus, EgsConfig, make_egs,
)
from tdnnf_nas_tpu.data.native import get_lib
from tdnnf_nas_tpu.data.egs_file import write_egs_file, NativeEgsLoader
from tdnnf_nas_tpu.graphs import (
    estimate_phone_lm, build_denominator_graph, den_init_lookup,
)
from tdnnf_nas_tpu.models import TdnnfModelConfig, model_context
from tdnnf_nas_tpu.ops.fwdbwd import DenGraphArrays
from tdnnf_nas_tpu.train import TrainerConfig, init_train_state, make_train_step

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    corpus_cfg = SyntheticCorpusConfig(num_utts=24, num_phones=5, feat_dim=10)
    utts, phone_seqs, tree, topo = make_synthetic_corpus(corpus_cfg)
    lm = estimate_phone_lm(phone_seqs, 5)
    den = build_denominator_graph(lm, topo, tree)
    model_cfg = TdnnfModelConfig(
        feat_dim=10, ivector_dim=0, hidden_dim=24, bottleneck_dim=8,
        time_strides=(1, 2), num_pdfs=tree.num_pdfs, prefinal_big=24,
        prefinal_small=12, compute_dtype="float32",
    )
    left, right = model_context(model_cfg)
    egs_cfg = EgsConfig(chunk_width=12, left_context=left, right_context=right,
                        max_phones_per_chunk=10)
    chunks = make_egs(utts, lm, topo, tree, egs_cfg,
                      den_init_fn=den_init_lookup(den, 5))
    path = str(tmp_path_factory.mktemp("egs") / "train.tegs")
    write_egs_file(chunks, path)
    return chunks, path, model_cfg, den


def test_loader_yields_original_chunks(world):
    chunks, path, _, _ = world
    loader = NativeEgsLoader(path, batch_size=4, seed=1)
    assert loader.num_chunks == len(chunks)
    # hash original feats for membership checks
    orig = {c.feats.tobytes(): i for i, c in enumerate(chunks)}
    seen = set()
    it = iter(loader)
    for _ in range(3):
        batch = next(it)
        assert batch["feats"].shape == (4, chunks[0].feats.shape[0], 10)
        for b in range(4):
            key = np.ascontiguousarray(batch["feats"][b], np.float32).tobytes()
            assert key in orig, "loader yielded unknown chunk"
            i = orig[key]
            seen.add(i)
            np.testing.assert_array_equal(batch["sup"].state_pdf[b],
                                          chunks[i].sup.state_pdf)
            np.testing.assert_allclose(batch["sup"].next_w[b],
                                       chunks[i].sup.next_w, atol=1e-6)
            np.testing.assert_allclose(batch["sup"].mask[b],
                                       chunks[i].sup.mask, atol=1e-6)
            np.testing.assert_allclose(batch["sup"].init[b],
                                       chunks[i].sup.init, atol=1e-6)
    assert len(seen) > 4  # shuffling draws from across the shard
    loader.close()


def test_train_step_from_native_loader(world):
    chunks, path, model_cfg, den = world
    loader = NativeEgsLoader(path, batch_size=4, seed=2)
    trainer_cfg = TrainerConfig()
    state = init_train_state(model_cfg, trainer_cfg, jax.random.PRNGKey(0))
    step = make_train_step(model_cfg, trainer_cfg, DenGraphArrays.from_graph(den))
    it = iter(loader)
    key = jax.random.PRNGKey(1)
    for i in range(3):
        batch = jax.tree.map(jnp.asarray, next(it))
        state, metrics = step(state, batch, key)
    assert np.isfinite(float(metrics["objf_mmi"]))
    loader.close()
