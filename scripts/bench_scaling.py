"""Weak-scaling efficiency harness: train-step throughput at 1..N devices
with the per-device batch held fixed (the measurement BASELINE.json's
">=85% scaling efficiency at N>=2 hosts" target refers to).

On this machine only one real TPU chip is reachable, so the harness runs on
a virtual CPU mesh by default (numbers validate the HARNESS, not the
hardware); on a real multi-chip slice run with JAX_PLATFORMS unset.

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/bench_scaling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    # sitecustomize pins JAX_PLATFORMS=axon; honor an explicit cpu request
    # (the only way to get a multi-device mesh on this machine)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tdnnf_nas_tpu.data import (SyntheticCorpusConfig,
                                    make_synthetic_corpus, EgsConfig,
                                    make_egs, batch_iterator)
    from tdnnf_nas_tpu.graphs import (estimate_phone_lm,
                                      build_denominator_graph,
                                      den_init_lookup)
    from tdnnf_nas_tpu.models import TdnnfModelConfig, model_context
    from tdnnf_nas_tpu.ops.fwdbwd import DenGraphArrays
    from tdnnf_nas_tpu.parallel import make_mesh, put_replicated, put_batch
    from tdnnf_nas_tpu.train import (TrainerConfig, OptimizerConfig,
                                     init_train_state, make_train_step)

    per_device = int(os.environ.get("BENCH_PER_DEVICE", "4"))
    chunk_w = 16
    corpus_cfg = SyntheticCorpusConfig(num_utts=96, num_phones=6, feat_dim=12)
    utts, phone_seqs, tree, topo = make_synthetic_corpus(corpus_cfg)
    lm = estimate_phone_lm(phone_seqs, corpus_cfg.num_phones)
    den = build_denominator_graph(lm, topo, tree)
    model_cfg = TdnnfModelConfig(
        feat_dim=12, ivector_dim=0, hidden_dim=64, bottleneck_dim=16,
        time_strides=(1, 0, 3), num_pdfs=tree.num_pdfs, prefinal_big=64,
        prefinal_small=32, compute_dtype="float32")
    left, right = model_context(model_cfg)
    chunks = make_egs(utts, lm, topo, tree,
                      EgsConfig(chunk_width=chunk_w, left_context=left,
                                right_context=right, max_phones_per_chunk=12),
                      den_init_fn=den_init_lookup(den, corpus_cfg.num_phones))
    den_arr = DenGraphArrays.from_graph(den)

    n_all = len(jax.devices())
    results = {}
    n = 1
    while n <= n_all:
        mesh = make_mesh(n)
        tr = TrainerConfig(optimizer=OptimizerConfig(num_steps=1000))
        state = put_replicated(
            init_train_state(model_cfg, tr, jax.random.PRNGKey(0)), mesh)
        step = make_train_step(model_cfg, tr, den_arr)
        b = per_device * n
        batch = next(batch_iterator(chunks, batch_size=b,
                                    rng=np.random.RandomState(0)))
        batch = put_batch(batch, mesh)
        key = jax.random.PRNGKey(1)
        for _ in range(3):
            state, m = step(state, batch, key)
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for _ in range(10):
            state, m = step(state, batch, key)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / 10
        results[n] = b / dt  # chunks/sec
        n *= 2

    # ---- exact-DP parity: SAME global batch on every mesh size must give
    # the same objective trajectory (psum grad all-reduce == single-device
    # math; replaces Kaldi's approximate model averaging) ----------------
    b_glob = per_device * n_all
    gbatch = next(batch_iterator(chunks, batch_size=b_glob,
                                 rng=np.random.RandomState(7)))
    objs = {}
    n = 1
    while n <= n_all:
        mesh = make_mesh(n)
        tr = TrainerConfig(optimizer=OptimizerConfig(num_steps=1000))
        state = put_replicated(
            init_train_state(model_cfg, tr, jax.random.PRNGKey(0)), mesh)
        step = make_train_step(model_cfg, tr, den_arr, donate=False)
        db = put_batch(gbatch, mesh)
        key = jax.random.PRNGKey(1)
        traj = []
        for _ in range(10):
            state, m = step(state, db, key)
            traj.append(float(m["objf_mmi"]))
        objs[n] = traj
        n *= 2
    parity = max(max(abs(a - b) for a, b in zip(objs[1], traj))
                 for traj in objs.values())

    base = results[1]
    print(f"{'devices':>8} {'chunks/s':>10} {'speedup':>8} {'efficiency':>10}")
    rows = {}
    for n, thr in results.items():
        print(f"{n:8d} {thr:10.1f} {thr / base:8.2f}x {thr / base / n:9.1%}")
        rows[str(n)] = {"chunks_per_s": round(thr, 1),
                        "speedup": round(thr / base, 3),
                        "efficiency": round(thr / base / n, 4)}
    print(f"10-step objf parity (same global batch, 1 vs N devices): "
          f"max |delta| = {parity:.2e}")
    import json

    out = {
        "backend": jax.devices()[0].platform,
        "note": ("virtual CPU mesh (8 devices share 2 host cores): "
                 "validates the DP harness + exact psum parity, NOT "
                 "hardware scaling — multi-chip hardware is unavailable "
                 "in this environment"),
        "per_device_batch": per_device,
        "throughput": rows,
        "objf_parity_10step_max_abs_delta": parity,
    }
    os.makedirs("docs", exist_ok=True)
    with open("docs/scaling.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
