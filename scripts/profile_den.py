"""Micro-profile of the production train step's pieces with honest sync.

Every timing closes with a host fetch of a computed scalar (the remote
backend's block_until_ready returns early — see bench.py:_fetch), over a
chain of n dependent executions.  Pieces:

  model      TDNN-F 7q fwd+bwd only (sum of chain head as loss)
  den_fwd    forward_score_factored on the production den (no grad)
  den_grad   value_and_grad of the same wrt obs
  num_grad   numerator linear-chain kernel fwd+bwd
  gather     _gather_obs [B,T,P]->[B,T,S] fwd+bwd alone
  matmul     the per-frame beta @ trans_pos hi/lo matmul x(T-1), fwd only
  full       the full train step (reference point)

Usage: python -u scripts/profile_den.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, arg, n=10):
    """fn must return (new_arg, scalar); chains arg through n calls.
    Keeps chaining through warmup (fn may donate its input)."""
    out = None
    a = arg
    for _ in range(2):  # warmup/compile
        a, out = fn(a)
    float(out)
    t0 = time.perf_counter()
    for _ in range(n):
        a, out = fn(a)
    float(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from tdnnf_nas_tpu.data import (SyntheticCorpusConfig, batch_iterator,
                                    make_synthetic_corpus)
    from tdnnf_nas_tpu.graphs import (accumulate_triphone_stats,
                                      build_clustered_triphone_tree)
    from tdnnf_nas_tpu.models import TdnnfModelConfig
    from tdnnf_nas_tpu.models.tdnnf import apply_model
    from tdnnf_nas_tpu.ops import fwdbwd
    from tdnnf_nas_tpu.recipes.chain_recipes import prepare_data
    from tdnnf_nas_tpu.train import (ChainObjectiveConfig, OptimizerConfig,
                                     TrainerConfig, init_train_state,
                                     make_train_step)

    num_phones = 46
    corpus_cfg = SyntheticCorpusConfig(
        num_utts=768, num_phones=num_phones, feat_dim=40, min_phones=10,
        max_phones=30, mean_dur=4.0, context_shift=1.0, seed=0)
    utts, phone_seqs, _, topo = make_synthetic_corpus(corpus_cfg)
    stats = accumulate_triphone_stats(
        [u.feats for u in utts], phone_seqs, [u.begins for u in utts],
        num_phones, corpus_cfg.frame_subsampling_factor)
    tree = build_clustered_triphone_tree(stats, num_leaves=6034 - num_phones)
    bundle = prepare_data(utts, phone_seqs, tree, topo, num_phones,
                          phone_lm_order=4, num_extra_lm_states=2000)
    den = bundle.den_arrays
    model_cfg = TdnnfModelConfig(num_pdfs=tree.num_pdfs)
    trainer_cfg = TrainerConfig(
        objective=ChainObjectiveConfig(),
        optimizer=OptimizerConfig(kind="adam", lr_initial=1e-3,
                                  lr_final=1e-4, num_steps=100000))
    chunks = bundle.egs(model_cfg, chunk_width=50, max_phones_per_chunk=40)
    b = next(batch_iterator(chunks, batch_size=64,
                            rng=np.random.RandomState(0)))
    b["ivectors"] = np.random.RandomState(3).randn(
        64, model_cfg.ivector_dim).astype(np.float32)
    batch = jax.tree.map(jnp.asarray, b)
    B, T_in = batch["feats"].shape[:2]
    P = tree.num_pdfs
    S = den.num_states
    T = batch["sup"].mask.shape[1] if hasattr(batch["sup"], "mask") else 50
    T = 50
    print(f"B={B} T={T} P={P} S={S} "
          f"npos={den.seg_bounds.shape[0] - 1 if hasattr(den, 'seg_bounds') else '?'}",
          flush=True)

    results = {}

    # full step reference
    state = init_train_state(model_cfg, trainer_cfg, jax.random.PRNGKey(0))
    step = make_train_step(model_cfg, trainer_cfg, den)
    key = jax.random.PRNGKey(7)

    def full(st):
        st, m = step(st, batch, key)
        return st, m["objf_mmi"]

    # model fwd+bwd only
    params = state.params
    bn = state.bn_state

    @jax.jit
    def model_fb(p):
        def loss(p):
            chain, xent, _ = apply_model(model_cfg, p, bn, batch["feats"],
                                         batch["ivectors"], train=True)
            return jnp.sum(chain * chain) * 1e-6 + jnp.sum(xent) * 1e-9
        l, g = jax.value_and_grad(loss)(p)
        # chain into the returned params so calls serialize
        p2 = jax.tree.map(lambda a, ga: a + 0.0 * ga, p, g)
        return p2, l

    results["model_fwd_bwd"] = timeit(model_fb, params, n=8)
    print(f"model fwd+bwd: {results['model_fwd_bwd'] * 1e3:.1f} ms",
          flush=True)

    # obs tensor for den-only pieces
    obs0 = jax.random.normal(jax.random.PRNGKey(1), (B, T, P), jnp.float32)

    @jax.jit
    def den_fwd(o):
        s = fwdbwd.forward_score_factored(o, den, leaky_coef=0.1)
        return o + 0.0 * s[:, None, None], jnp.sum(s)

    results["den_fwd"] = timeit(den_fwd, obs0, n=8)
    print(f"den fwd: {results['den_fwd'] * 1e3:.1f} ms", flush=True)

    @jax.jit
    def den_grad(o):
        def loss(o):
            return jnp.sum(fwdbwd.forward_score_factored(o, den,
                                                         leaky_coef=0.1))
        l, g = jax.value_and_grad(loss)(o)
        return o + 0.0 * g, l

    results["den_fwd_bwd"] = timeit(den_grad, obs0, n=8)
    print(f"den fwd+bwd: {results['den_fwd_bwd'] * 1e3:.1f} ms", flush=True)

    # gather alone (what _gather_obs does for the shared graph)
    @jax.jit
    def gather_fb(o):
        def loss(o):
            mx = jax.lax.stop_gradient(jnp.max(o, axis=-1, keepdims=True))
            oe = jnp.exp(jnp.maximum(o - mx, -30.0))
            os_ = jnp.take(oe, den.state_pdf, axis=-1)
            return jnp.sum(os_ * os_) * 1e-6
        l, g = jax.value_and_grad(loss)(o)
        return o + 0.0 * g, l

    results["gather_fwd_bwd"] = timeit(gather_fb, obs0, n=8)
    print(f"obs gather fwd+bwd: {results['gather_fwd_bwd'] * 1e3:.1f} ms",
          flush=True)

    # per-frame matmul chain (fwd only), T-1 iterations
    if getattr(den, "trans_pos", None) is not None:
        npos = den.trans_pos.shape[0]
        beta0 = jax.random.uniform(jax.random.PRNGKey(2), (B, npos))

        @jax.jit
        def mm_chain(beta):
            def stepf(bta, _):
                a = fwdbwd._bmm_shared_split(bta, den.trans_pos)
                # renormalize + fold back to positions via segment sum
                c = jnp.maximum(jnp.sum(a, -1), 1e-30)
                a = a / c[:, None]
                cs = jnp.concatenate(
                    [jnp.zeros((B, 1)), jnp.cumsum(a, -1)], -1)
                bta = cs[:, den.seg_bounds[1:]] - cs[:, den.seg_bounds[:-1]]
                return bta, jnp.log(c)
            bta, logc = jax.lax.scan(stepf, beta, None, length=T - 1)
            return bta + 0.0, jnp.sum(logc)

        def mm_wrap(bta):
            return mm_chain(bta)

        results["pos_matmul_scan_fwd"] = timeit(mm_wrap, beta0, n=8)
        print(f"pos-matmul scan fwd (T-1 frames): "
              f"{results['pos_matmul_scan_fwd'] * 1e3:.1f} ms", flush=True)

    results["full"] = timeit(full, state, n=8)
    print(f"full step: {results['full'] * 1e3:.1f} ms", flush=True)
    print({k: round(v * 1e3, 2) for k, v in sorted(results.items())},
          flush=True)


if __name__ == "__main__":
    main()
