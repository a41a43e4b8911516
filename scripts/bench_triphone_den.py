"""Benchmark the composed 4-gram/triphone denominator at flagship scale (TPU).

Builds the full production-shape stack — 46 phones, ~6k-leaf left-2-context
clustered tree (the reference tree tri5_7d has 6034 leaves,
`run_tdnn_7q_fbk_40_manual.sh:26`), 4-gram pruned phone LM with 2000 extra
states (`steps/nnet3/chain/train.py:332` chain-est-phone-lm) — and measures:

  1. den-kernel-only forward+grad (FactoredDenGraph, ops/fwdbwd.py)
  2. the full jitted train step with the composed den

Writes docs/triphone_bench.json.  Usage: python scripts/bench_triphone_den.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(num_steps: int = 30):
    from tdnnf_nas_tpu.data import (
        SyntheticCorpusConfig, make_synthetic_corpus, batch_iterator,
    )
    from tdnnf_nas_tpu.graphs import (
        accumulate_triphone_stats, build_clustered_triphone_tree,
    )
    from tdnnf_nas_tpu.models import TdnnfModelConfig, model_context, count_params
    from tdnnf_nas_tpu.ops.fwdbwd import forward_score_factored
    from tdnnf_nas_tpu.recipes.chain_recipes import prepare_data
    from tdnnf_nas_tpu.train import (
        TrainerConfig, OptimizerConfig, init_train_state, make_train_step,
    )

    num_phones = 46
    corpus_cfg = SyntheticCorpusConfig(
        num_utts=768, num_phones=num_phones, feat_dim=40, min_phones=10,
        max_phones=30, mean_dur=4.0, context_shift=1.0, seed=0,
    )
    t0 = time.time()
    utts, phone_seqs, _, topo = make_synthetic_corpus(corpus_cfg)
    stats = accumulate_triphone_stats(
        [u.feats for u in utts], phone_seqs, [u.begins for u in utts],
        num_phones, corpus_cfg.frame_subsampling_factor)
    tree = build_clustered_triphone_tree(stats, num_leaves=6034 - num_phones)
    t_tree = time.time() - t0
    print(f"tree: {tree.num_pdfs} pdfs in {t_tree:.1f}s", flush=True)

    t0 = time.time()
    bundle = prepare_data(utts, phone_seqs, tree, topo, num_phones,
                          phone_lm_order=4, num_extra_lm_states=2000)
    den = bundle.den_arrays
    t_den = time.time() - t0
    s = int(den.num_states)
    k = int(den.in_pos.shape[1])
    npos = int(den.seg_bounds.shape[0]) - 1
    print(f"den: S={s} positions={npos} K={k} built in {t_den:.1f}s",
          flush=True)

    # --- 1. den kernel alone: fwd+grad over mb 64 x 50 frames ------------
    b, t = 64, 50
    rng = np.random.RandomState(0)
    obs = jnp.asarray(rng.randn(b, t, tree.num_pdfs).astype(np.float32))

    @jax.jit
    def den_fwd_grad(o):
        return jax.grad(
            lambda x: jnp.sum(forward_score_factored(x, den, 0.1)))(o)

    den_fwd_grad(obs).block_until_ready()
    reps = 20
    t0 = time.time()
    r = None
    for _ in range(reps):
        r = den_fwd_grad(obs)
    r.block_until_ready()
    den_ms = (time.time() - t0) / reps * 1e3
    print(f"factored den fwd+grad: {den_ms:.2f} ms  (S={s}, B={b}, T={t})",
          flush=True)

    # --- 2. full train step at flagship scale -----------------------------
    model_cfg = TdnnfModelConfig(num_pdfs=tree.num_pdfs)
    trainer_cfg = TrainerConfig(
        optimizer=OptimizerConfig(kind="adam", lr_initial=1e-3,
                                  lr_final=2e-4, num_steps=200),
    )
    chunks = bundle.egs(model_cfg, chunk_width=50, max_phones_per_chunk=40)
    print(f"chunks: {len(chunks)}  egs_stats: {bundle.egs_stats}", flush=True)
    state = init_train_state(model_cfg, trainer_cfg, jax.random.PRNGKey(0))
    print(f"params: {count_params(state.params):,}", flush=True)
    step = make_train_step(model_cfg, trainer_cfg, den)
    it = batch_iterator(chunks, batch_size=b, rng=np.random.RandomState(0))
    key = jax.random.PRNGKey(7)
    batches = []
    for i, batch in enumerate(it):
        if i >= 2:
            break
        batch["ivectors"] = np.zeros((batch["feats"].shape[0], 100),
                                     np.float32)
        batches.append(jax.tree.map(jnp.asarray, batch))
    state, m = step(state, batches[0], key)  # compile
    jax.block_until_ready(state.params)
    t0 = time.time()
    n_timed = num_steps
    for i in range(n_timed):
        state, m = step(state, batches[i % 2], key)
    jax.block_until_ready(state.params)
    step_ms = (time.time() - t0) / n_timed * 1e3
    audio_per_step = b * t * 3 * 0.01  # subsampled frames x fsf x 10ms
    thr = audio_per_step / (step_ms / 1e3)
    objf = float(m["objf_mmi"])
    print(f"train step: {step_ms:.1f} ms  objf_mmi={objf:.4f}  "
          f"throughput={thr:.0f} audio-sec/s/chip", flush=True)

    out = {
        "num_pdfs": int(tree.num_pdfs),
        "den_states": s,
        "den_positions": npos,
        "den_in_degree_K": k,
        "phone_lm_states": int(bundle.lm.num_states),
        "tree_build_s": round(t_tree, 1),
        "den_build_s": round(t_den, 1),
        "den_fwd_grad_ms": round(den_ms, 2),
        "train_step_ms": round(step_ms, 1),
        "throughput_audio_sec_per_s": round(thr, 0),
        "objf_mmi": round(objf, 4),
        "backend": jax.devices()[0].platform,
        "batch": b,
        "chunk_width": t,
    }
    os.makedirs("docs", exist_ok=True)
    with open("docs/triphone_bench.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
