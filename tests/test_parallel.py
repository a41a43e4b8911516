"""Data-parallel mesh tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdnnf_nas_tpu.parallel import make_mesh, put_replicated, put_batch


def _tiny_setup():
    from tdnnf_nas_tpu.data import (
        SyntheticCorpusConfig, make_synthetic_corpus, EgsConfig, make_egs,
        batch_iterator,
    )
    from tdnnf_nas_tpu.graphs import (
        estimate_phone_lm, build_denominator_graph, den_init_lookup,
    )
    from tdnnf_nas_tpu.models import TdnnfModelConfig, model_context
    from tdnnf_nas_tpu.ops.fwdbwd import DenGraphArrays
    from tdnnf_nas_tpu.train import TrainerConfig, init_train_state, make_train_step

    corpus_cfg = SyntheticCorpusConfig(num_utts=32, num_phones=5, feat_dim=10)
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
    trainer_cfg = TrainerConfig()
    state = init_train_state(model_cfg, trainer_cfg, jax.random.PRNGKey(0))
    step = make_train_step(model_cfg, trainer_cfg, DenGraphArrays.from_graph(den),
                           donate=False)
    batch = next(batch_iterator(chunks, batch_size=8, rng=np.random.RandomState(0)))
    return state, step, batch


def test_eight_devices_available():
    assert jax.device_count() >= 8, jax.devices()


def test_dp_step_matches_single_device():
    state, step, batch = _tiny_setup()
    key = jax.random.PRNGKey(3)

    # single device
    s1, m1 = step(state, jax.tree.map(jnp.asarray, batch), key)

    # 8-way data parallel: replicated state, sharded batch
    mesh = make_mesh(8)
    state8 = put_replicated(state, mesh)
    batch8 = put_batch(batch, mesh)
    s8, m8 = step(state8, batch8, key)

    np.testing.assert_allclose(float(m1["objf_mmi"]), float(m8["objf_mmi"]),
                               rtol=1e-5, atol=1e-5)
    # updated params agree (exact psum DP == single-device math)
    l1 = jax.tree.leaves(s1.params)
    l8 = jax.tree.leaves(s8.params)
    # adam's g/sqrt(v) normalization amplifies f32 psum reduction-order noise
    # into ~1e-4 absolute differences on ~1e-3 updates; compare absolutely
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=5e-4)


def test_dryrun_multichip_entrypoint():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_host_sharded_iterator_single_process():
    """host_sharded_iterator on one process == plain batching, globally
    sharded over the mesh."""
    import numpy as np
    from tdnnf_nas_tpu.parallel.multihost import (global_mesh,
                                                  host_sharded_iterator,
                                                  local_shard_range)
    from tdnnf_nas_tpu.data import (SyntheticCorpusConfig,
                                    make_synthetic_corpus, EgsConfig,
                                    make_egs)
    from tdnnf_nas_tpu.graphs import (estimate_phone_lm,
                                      build_denominator_graph,
                                      den_init_lookup)

    cfg = SyntheticCorpusConfig(num_utts=24, num_phones=5, feat_dim=8)
    utts, phone_seqs, tree, topo = make_synthetic_corpus(cfg)
    lm = estimate_phone_lm(phone_seqs, cfg.num_phones)
    den = build_denominator_graph(lm, topo, tree)
    chunks = make_egs(utts, lm, topo, tree,
                      EgsConfig(chunk_width=8, left_context=4,
                                right_context=4, max_phones_per_chunk=12),
                      den_init_fn=den_init_lookup(den, cfg.num_phones))
    assert local_shard_range(len(chunks)) == (0, len(chunks))
    mesh = global_mesh()
    it = host_sharded_iterator(chunks, batch_size=8, mesh=mesh,
                               rng=np.random.RandomState(0))
    batch = next(it)
    assert batch["feats"].shape[0] == 8
    # globally addressable and sharded over the dp axis
    assert len(batch["feats"].sharding.device_set) == len(mesh.devices.ravel())
