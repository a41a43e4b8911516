"""Train the flagship 7q model on the synthetic SWBD-scale setup (TPU).

Produces docs/flagship_curve.json with the objective trajectory — the
round-1 stand-in for the reference's accuracy.report (`train.py:617-624`),
demonstrating stable bf16 LF-MMI convergence at the full model scale
(18.6M params, 6034 pdfs, biphone den graph).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(num_steps=400):
    from tdnnf_nas_tpu.data import (
        SyntheticCorpusConfig, make_synthetic_corpus, EgsConfig, make_egs,
        batch_iterator,
    )
    from tdnnf_nas_tpu.graphs import (
        estimate_phone_lm, build_denominator_graph, den_init_lookup,
    )
    from tdnnf_nas_tpu.graphs.topology import BiphoneTree
    from tdnnf_nas_tpu.models import TdnnfModelConfig, model_context, count_params
    from tdnnf_nas_tpu.ops.fwdbwd import DenGraphArrays
    from tdnnf_nas_tpu.train import (
        TrainerConfig, ChainObjectiveConfig, OptimizerConfig,
        init_train_state, make_train_step,
    )

    num_phones = 46
    corpus_cfg = SyntheticCorpusConfig(
        num_utts=128, num_phones=num_phones, feat_dim=40, min_phones=10,
        max_phones=30, mean_dur=4.0, seed=0,
    )
    utts, phone_seqs, _, topo = make_synthetic_corpus(corpus_cfg)
    tree = BiphoneTree(num_phones, num_leaves=6034 - num_phones)
    lm = estimate_phone_lm(phone_seqs, num_phones)
    den = build_denominator_graph(lm, topo, tree)

    model_cfg = TdnnfModelConfig(num_pdfs=tree.num_pdfs)
    left, right = model_context(model_cfg)
    egs_cfg = EgsConfig(chunk_width=50, left_context=left, right_context=right,
                        max_phones_per_chunk=40)
    chunks = make_egs(utts, lm, topo, tree, egs_cfg,
                      den_init_fn=den_init_lookup(den, num_phones))
    print(f"chunks: {len(chunks)}", flush=True)

    trainer_cfg = TrainerConfig(
        objective=ChainObjectiveConfig(pallas_den=True),
        optimizer=OptimizerConfig(kind="adam", lr_initial=1e-3, lr_final=2e-4,
                                  num_steps=num_steps),
    )
    state = init_train_state(model_cfg, trainer_cfg, jax.random.PRNGKey(0))
    print(f"params: {count_params(state.params):,}", flush=True)
    step = make_train_step(model_cfg, trainer_cfg, DenGraphArrays.from_graph(den))

    rng = np.random.RandomState(0)
    it = batch_iterator(chunks, batch_size=64, rng=rng)
    key = jax.random.PRNGKey(7)
    curve = []
    t0 = time.time()
    for i, batch in enumerate(it):
        if i >= num_steps:
            break
        batch["ivectors"] = np.zeros((batch["feats"].shape[0], 100), np.float32)
        batch = jax.tree.map(jnp.asarray, batch)
        state, metrics = step(state, batch, key)
        if i % 20 == 0 or i == num_steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            m["step"] = i
            m["wall_s"] = time.time() - t0
            curve.append(m)
            print(f"step {i:4d} objf_mmi={m['objf_mmi']:.4f} "
                  f"xent={m.get('objf_xent', 0):.4f} "
                  f"gnorm={m['grad_norm']:.2f}", flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "flagship_curve.json")
    with open(out, "w") as f:
        json.dump(curve, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400)
