"""Flagship-scale DARTS supernet on TPU: uniform pretrain -> gumbel cv-update
-> extraction.  Validates the search path at full size (K=7 candidate
branches x 14 layers, 6034 pdfs) and records the alpha trajectory."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(stage="A", pretrain_steps=200, cv_steps=60):
    from tdnnf_nas_tpu.data import (
        SyntheticCorpusConfig, make_synthetic_corpus, EgsConfig, make_egs,
        batch_iterator,
    )
    from tdnnf_nas_tpu.graphs import (
        estimate_phone_lm, build_denominator_graph, den_init_lookup,
    )
    from tdnnf_nas_tpu.graphs.topology import BiphoneTree
    from tdnnf_nas_tpu.models import (
        TdnnfModelConfig, DartsModelConfig, SearchMode, supernet_context,
        count_params,
    )
    from tdnnf_nas_tpu.nas import extract_offsets
    from tdnnf_nas_tpu.ops.fwdbwd import DenGraphArrays
    from tdnnf_nas_tpu.train import (
        TrainerConfig, ChainObjectiveConfig, OptimizerConfig,
        init_train_state, make_train_step,
    )

    num_phones = 46
    corpus_cfg = SyntheticCorpusConfig(
        num_utts=96, num_phones=num_phones, feat_dim=40, min_phones=14,
        max_phones=34, mean_dur=4.0, seed=0,
    )
    utts, phone_seqs, _, topo = make_synthetic_corpus(corpus_cfg)
    tree = BiphoneTree(num_phones, num_leaves=6034 - num_phones)
    lm = estimate_phone_lm(phone_seqs, num_phones)
    den = build_denominator_graph(lm, topo, tree)
    den_arr = DenGraphArrays.from_graph(den)

    base = TdnnfModelConfig(num_pdfs=tree.num_pdfs, ivector_dim=0)
    darts_cfg = DartsModelConfig(base=base, search_offsets=True, max_stride=6)
    left, right = supernet_context(darts_cfg)
    egs_cfg = EgsConfig(chunk_width=50, left_context=left, right_context=right,
                        max_phones_per_chunk=44)
    chunks = make_egs(utts, lm, topo, tree, egs_cfg,
                      den_init_fn=den_init_lookup(den, num_phones))
    print(f"chunks: {len(chunks)} context: ({left},{right})", flush=True)

    from tdnnf_nas_tpu.core.checkpoint import save_checkpoint, load_checkpoint

    batch = 32
    ckpt_dir = "/tmp/flagship_search_ckpt"
    # stage A: uniform one-hot pretrain
    pre_cfg = TrainerConfig(
        objective=ChainObjectiveConfig(pallas_den=True),
        optimizer=OptimizerConfig(kind="adam", lr_initial=1e-3, lr_final=3e-4,
                                  num_steps=pretrain_steps),
        search_mode=SearchMode.UNIFORM,
    )
    state = init_train_state(darts_cfg, pre_cfg, jax.random.PRNGKey(0),
                             supernet=True)
    print(f"supernet params: {count_params(state.params):,}", flush=True)
    key = jax.random.PRNGKey(3)
    if stage == "A":
        step = make_train_step(darts_cfg, pre_cfg, den_arr, supernet=True)
        rng = np.random.RandomState(0)
        t0 = time.time()
        for i, b in enumerate(batch_iterator(chunks, batch_size=batch, rng=rng)):
            if i >= pretrain_steps:
                break
            state, m = step(state, jax.tree.map(jnp.asarray, b), key)
            if i % 10 == 0:
                print(f"[pretrain] step {i} objf={float(m['objf_mmi']):.4f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
        save_checkpoint(ckpt_dir, pretrain_steps, state)
        print("stage A done; checkpoint saved", flush=True)
        return

    state, _, _ = load_checkpoint(ckpt_dir, state)
    # stage B: gumbel alpha-only cv-update (theta/BN frozen)
    cv_cfg = TrainerConfig(
        objective=ChainObjectiveConfig(pallas_den=True),
        optimizer=OptimizerConfig(kind="adam", lr_initial=1e-2, lr_final=3e-3,
                                  num_steps=cv_steps, alpha_lr_scale=1.0),
        search_mode=SearchMode.GUMBEL, train_theta=False, train_alpha=True,
        bn_frozen=True,
    )
    import dataclasses as dc
    state = dc.replace(state, step=jnp.zeros((), jnp.int32))
    step2 = make_train_step(darts_cfg, cv_cfg, den_arr, supernet=True)
    for i, b in enumerate(batch_iterator(chunks, batch_size=batch,
                                         rng=np.random.RandomState(1))):
        if i >= cv_steps:
            break
        state, m = step2(state, jax.tree.map(jnp.asarray, b), key)
        if i % 10 == 0:
            print(f"[cvupdate] step {i} objf={float(m['objf_mmi']):.4f} "
                  f"tau={float(m['tau']):.3f}", flush=True)

    archs = extract_offsets(np.asarray(state.alphas["offsets_linear"]),
                            np.asarray(state.alphas["offsets_affine"]), top_k=3)
    out = {
        "alpha_linear": np.asarray(state.alphas["offsets_linear"]).tolist(),
        "alpha_affine": np.asarray(state.alphas["offsets_affine"]).tolist(),
        "top_archs": [[list(map(list, a)), lp] for a, lp in archs],
        "final_objf": float(m["objf_mmi"]),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "flagship_search.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("top arch:", archs[0][0], flush=True)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "A")
