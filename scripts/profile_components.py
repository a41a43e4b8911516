"""Per-component timing on the current backend: model fwd / fwd+bwd,
denominator forward / forward+grad, numerator forward.  Run on TPU to see
where the train step's time goes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0  # ms


def main():
    from tdnnf_nas_tpu.data import SyntheticCorpusConfig, make_synthetic_corpus
    from tdnnf_nas_tpu.graphs import estimate_phone_lm, build_denominator_graph
    from tdnnf_nas_tpu.graphs.topology import BiphoneTree
    from tdnnf_nas_tpu.models import TdnnfModelConfig, init_model, apply_model, chunk_input_frames
    from tdnnf_nas_tpu.ops.fwdbwd import DenGraphArrays, forward_score

    b, w = 64, 50
    num_phones = 46
    corpus_cfg = SyntheticCorpusConfig(num_utts=8, num_phones=num_phones,
                                       feat_dim=40, min_phones=10, max_phones=30)
    _, phone_seqs, _, topo = make_synthetic_corpus(corpus_cfg)
    tree = BiphoneTree(num_phones, num_leaves=6034 - num_phones)
    lm = estimate_phone_lm(phone_seqs, num_phones)
    den = build_denominator_graph(lm, topo, tree)
    den_arr = DenGraphArrays.from_graph(den)
    print(f"den graph: S={den.num_states} P={den.num_pdfs}")

    cfg = TdnnfModelConfig(num_pdfs=tree.num_pdfs)
    params, bn = init_model(cfg, jax.random.PRNGKey(0))
    t_in = chunk_input_frames(cfg, w)
    feats = jnp.asarray(np.random.RandomState(0).randn(b, t_in, 40), jnp.float32)
    ivecs = jnp.zeros((b, 100), jnp.float32)

    fwd = jax.jit(lambda p, s, f, i: apply_model(cfg, p, s, f, i, train=False)[0])
    print(f"model fwd:        {timeit(fwd, params, bn, feats, ivecs):8.2f} ms")

    def loss_model(p):
        return jnp.sum(apply_model(cfg, p, bn, feats, ivecs, train=True)[0])

    g_model = jax.jit(jax.grad(loss_model))
    print(f"model fwd+bwd:    {timeit(g_model, params):8.2f} ms")

    obs = fwd(params, bn, feats, ivecs)
    den_fwd = jax.jit(lambda o: forward_score(
        o, den_arr.trans, den_arr.state_pdf, den_arr.init, den_arr.final,
        leaky_coef=0.1))
    print(f"den forward:      {timeit(den_fwd, obs):8.2f} ms")

    den_grad = jax.jit(jax.grad(lambda o: jnp.sum(forward_score(
        o, den_arr.trans, den_arr.state_pdf, den_arr.init, den_arr.final,
        leaky_coef=0.1))))
    print(f"den fwd+grad:     {timeit(den_grad, obs):8.2f} ms")

    # numerator scale: S=80 per-seq graphs
    s_num = 80
    rng = np.random.RandomState(1)
    tr = rng.rand(b, s_num, s_num).astype(np.float32)
    tr /= tr.sum(-1, keepdims=True)
    spdf = rng.randint(0, tree.num_pdfs, (b, s_num)).astype(np.int32)
    init = np.ones((b, s_num), np.float32) / s_num
    final = np.ones((b, s_num), np.float32)
    mask = np.ones((b, w, s_num), np.float32)
    args = tuple(map(jnp.asarray, (tr, spdf, init, final, mask)))
    num_grad = jax.jit(jax.grad(lambda o: jnp.sum(forward_score(
        o, args[0], args[1], args[2], args[3], mask=args[4]))))
    print(f"num fwd+grad:     {timeit(num_grad, obs):8.2f} ms")


if __name__ == "__main__":
    main()
