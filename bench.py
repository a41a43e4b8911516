"""Benchmark: LF-MMI training throughput of the flagship TDNN-F 7q model.

Measures audio-seconds of training data processed per wall-clock second on
one chip, for the full jitted train step (forward + chain objective with a
Switchboard-scale denominator graph + backward + optimizer + semi-orth
constraint) at the reference's minibatch shape: 64 chunks x 150 input
frames (1.5 s audio each — `run_tdnn_7q_fbk_40_manual.sh:186-188`).

Baseline: the reference trains 3 epochs x 858 h (286 h x 3-way speed
perturb) in 30 h on one GPU (`img/search_result.png` row 1, BASELINE.md)
= 85.8 audio-sec/s/chip.  Target >= 5x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

KALDI_GPU_AUDIO_SEC_PER_S = 85.8  # 2574 h audio / 30 h wall, 1 GPU


def main():
    import jax
    import jax.numpy as jnp

    from tdnnf_nas_tpu.data import (
        SyntheticCorpusConfig, make_synthetic_corpus, EgsConfig, make_egs,
        batch_iterator,
    )
    from tdnnf_nas_tpu.graphs import (
        estimate_phone_lm, build_denominator_graph, den_init_lookup,
    )
    from tdnnf_nas_tpu.graphs.topology import BiphoneTree
    from tdnnf_nas_tpu.models import TdnnfModelConfig, model_context
    from tdnnf_nas_tpu.ops.fwdbwd import DenGraphArrays
    from tdnnf_nas_tpu.train import (
        TrainerConfig, OptimizerConfig, init_train_state, make_train_step,
    )

    import os

    batch_size = int(os.environ.get("BENCH_BATCH", "64"))
    chunk_width = 50  # output frames; 150 input frames = 1.5 s at 8 kHz
    num_phones = 46  # Switchboard phone-set size

    # Switchboard-scale corpus stats + a biphone tree sized to the reference's
    # 6034 pdfs (`run_tdnn_7q_fbk_40_manual.sh:26`)
    corpus_cfg = SyntheticCorpusConfig(
        num_utts=max(48, batch_size), num_phones=num_phones, feat_dim=40,
        min_phones=10, max_phones=30, mean_dur=4.0, seed=0,
    )
    utts, phone_seqs, _, topo = make_synthetic_corpus(corpus_cfg)
    tree = BiphoneTree(num_phones, num_leaves=6034 - num_phones)
    lm = estimate_phone_lm(phone_seqs, num_phones)
    den = build_denominator_graph(lm, topo, tree)

    model_cfg = TdnnfModelConfig(num_pdfs=tree.num_pdfs)  # 7q flagship
    left, right = model_context(model_cfg)
    egs_cfg = EgsConfig(
        chunk_width=chunk_width, left_context=left, right_context=right,
        max_phones_per_chunk=40,
    )
    chunks = make_egs(utts, lm, topo, tree, egs_cfg,
                      den_init_fn=den_init_lookup(den, num_phones))
    # emission dims differ (corpus emits CI pdf means); features are random
    # either way for throughput purposes
    assert len(chunks) >= batch_size, len(chunks)

    from tdnnf_nas_tpu.train import ChainObjectiveConfig

    trainer_cfg = TrainerConfig(
        objective=ChainObjectiveConfig(pallas_den=True),
        optimizer=OptimizerConfig(kind="adam", lr_initial=1e-3, lr_final=1e-4,
                                  num_steps=100000),
    )
    state = init_train_state(model_cfg, trainer_cfg, jax.random.PRNGKey(0))
    step = make_train_step(model_cfg, trainer_cfg, DenGraphArrays.from_graph(den))

    it = batch_iterator(chunks, batch_size=batch_size,
                        rng=np.random.RandomState(0), drop_last=False)
    batch = next(it)
    # ivectors for the flagship config
    batch["ivectors"] = np.zeros((batch["feats"].shape[0], model_cfg.ivector_dim),
                                 np.float32)
    batch = jax.tree.map(jnp.asarray, batch)
    key = jax.random.PRNGKey(7)

    # warmup/compile
    for _ in range(3):
        state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics)

    n_steps = 30  # enough to average out the remote-dispatch jitter
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    audio_sec_per_step = batch_size * chunk_width * 3 * 0.010  # 96 s
    value = n_steps * audio_sec_per_step / dt
    print(json.dumps({
        "metric": "lfmmi_train_throughput",
        "value": round(value, 2),
        "unit": "audio_sec/s/chip",
        "vs_baseline": round(value / KALDI_GPU_AUDIO_SEC_PER_S, 2),
    }))
    print(f"# step={dt / n_steps * 1000:.1f} ms  objf_mmi={float(metrics['objf_mmi']):.4f}  "
          f"backend={jax.default_backend()}", file=sys.stderr)

    # ---- sustained throughput: native shard loader streaming DISTINCT
    # batches through the same step (input pipeline in the loop; the
    # device-only number above excludes host egs streaming) ----
    try:
        import tempfile

        from tdnnf_nas_tpu.data.egs_file import (NativeEgsLoader,
                                                 write_egs_file)

        big_cfg = corpus_cfg.replace(num_utts=480, seed=1)
        utts2, phone_seqs2, _, _ = make_synthetic_corpus(big_cfg)
        chunks2 = make_egs(utts2, lm, topo, tree, egs_cfg,
                           den_init_fn=den_init_lookup(den, num_phones))
        with tempfile.TemporaryDirectory() as td:
            shard = os.path.join(td, "egs.tegs")
            write_egs_file(chunks2, shard)
            iv = np.zeros((batch_size, model_cfg.ivector_dim), np.float32)

            def stream(n):
                count = 0
                while count < n:
                    loader = NativeEgsLoader(shard, batch_size, queue_depth=4,
                                             seed=count)
                    for b in loader:
                        if count >= n:
                            break
                        if b["feats"].shape[0] != batch_size:
                            continue
                        b["ivectors"] = iv
                        yield b
                        count += 1
                    loader.close()

            from tdnnf_nas_tpu.parallel import prefetch_to_device

            st = state
            for b in prefetch_to_device(stream(3), size=2):
                st, m2 = step(st, b, key)  # warm the loader-shaped variant
            jax.block_until_ready(m2)
            t0 = time.perf_counter()
            n_sus = 30
            for b in prefetch_to_device(stream(n_sus), size=3):
                st, m2 = step(st, b, key)
            jax.block_until_ready(m2)
            dt_sus = time.perf_counter() - t0
        sus = n_sus * audio_sec_per_step / dt_sus
        print(f"# sustained(loader-in-loop)={sus:.0f} audio_sec/s/chip  "
              f"step={dt_sus / n_sus * 1000:.1f} ms  "
              f"device_only={value:.0f}", file=sys.stderr)
        with open("docs/bench_sustained.json", "w") as f:
            json.dump({"device_only": round(value, 2),
                       "sustained_loader": round(sus, 2),
                       "vs_baseline_sustained":
                           round(sus / KALDI_GPU_AUDIO_SEC_PER_S, 2)}, f)
    except Exception as e:  # keep the primary metric robust
        print(f"# sustained bench skipped: {e!r}", file=sys.stderr)


if __name__ == "__main__":
    main()
