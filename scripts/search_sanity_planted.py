"""Search-sanity experiment: does the two-stage DARTS search find a
PLANTED context offset?

On natural(istic) corpora all stride choices give near-identical dev
objectives, so alpha stays near uniform — an honest negative (the
reference's own search moves Avg WER only 15.5 -> 14.8 after 160 h,
`img/search_result.png`).  This experiment constructs a corpus where the
offset choice PROVABLY matters, and shows the machinery discriminates:

  * phones come in pairs that share IDENTICAL frame emissions in the
    first feature block (frame-level homophones);
  * the disambiguating identity lives in a second feature block DELAYED
    by K output frames — the phone at output frame t is revealed at
    feature frame t+K;
  * the model's usable lookahead is lda_splice(+1) + affine stride s +
    the +-2 numerator tolerance shift, so with K = 6 and candidates
    s in {0..3} only s in {2, 3} can reach the evidence (s=3 directly,
    s=2 via the tolerance shift); s in {0, 1} provably cannot.

A correct search must therefore move the affine alpha mass onto {2, 3}
and reject {0, 1}.  Writes docs/search_sanity.json: alpha entropy before/after,
per-candidate softmax, top-1 arch, and the planted-vs-ablated child
objectives.  (Ref: the reference searches the same [0,s] affine offsets,
`generate_config.py:25-43`; uniform pretrain + gumbel cv-update,
`run_TDNN_DARTSV3_fbk_stride_{pretrain,cvupdate}.sh`.)

Usage: python scripts/search_sanity_planted.py  (CPU-friendly)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# force the CPU backend: this is a small-model sanity experiment, and the
# environment pins JAX_PLATFORMS=axon (the one real TPU chip only admits a
# single process) — see scripts/bench_scaling.py for the same dance
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

# planted lookahead (output frames).  Reachable lag for affine stride s is
# lda_splice(+1) + s + numerator tolerance(2); with candidates {0..3} a lag
# of 6 is reachable ONLY at s = 3.
K_LAG = 6


def make_planted_corpus(num_phones=8, num_utts=160, feat_dim=24,
                        noise=0.35, mean_dur=1.15, seed=0):
    from tdnnf_nas_tpu.data.synthetic import Utterance
    from tdnnf_nas_tpu.graphs.topology import (ChainTopology,
                                               ContextIndependentTree)

    rng = np.random.RandomState(seed)
    tree = ContextIndependentTree(num_phones)
    topo = ChainTopology(num_phones)
    half = feat_dim // 2
    # block 1: PAIRED means — phones 2i and 2i+1 are identical here, and
    # forward/self-loop pdfs of a pair collapse onto the pair mean
    pair_mean = rng.randn(num_phones // 2, half) * 2.0
    # block 2: full phone identity, but written with a K-frame DELAY
    ident = rng.randn(num_phones, feat_dim - half) * 2.0
    fs = 3

    utts = []
    for _ in range(num_utts):
        n = rng.randint(10, 22)
        phones = rng.randint(0, num_phones, size=n).tolist()
        begins, ends, pdfs, frame_phone = [], [], [], []
        t = 0
        for p in phones:
            dur = 1 + rng.geometric(1.0 / mean_dur)
            begins.append(t)
            ends.append(t + dur - 1)
            pdfs.append(tree.forward_pdf(p))
            pdfs.extend([tree.self_loop_pdf(p)] * (dur - 1))
            frame_phone.extend([p] * dur)
            t += dur
        pdf_align = np.asarray(pdfs, np.int32)
        fp = np.asarray(frame_phone)
        t_out = len(fp)
        # delayed identity: frame t shows the phone of frame t - K_LAG
        delayed = np.concatenate([np.full(K_LAG, fp[0]), fp[:-K_LAG]]) \
            if t_out > K_LAG else np.full(t_out, fp[0])
        block1 = pair_mean[fp // 2]
        block2 = ident[delayed]
        out_feats = np.concatenate([block1, block2], axis=1)
        feats = (np.repeat(out_feats, fs, axis=0)
                 + rng.randn(t_out * fs, feat_dim) * noise)
        utts.append(Utterance(feats.astype(np.float32), phones, begins,
                              ends, pdf_align))
    return utts, [u.phones for u in utts], tree, topo


def main(pretrain_steps=320, cv_steps=800, child_steps=260):
    import jax

    from tdnnf_nas_tpu.models import (DartsModelConfig, SearchMode,
                                      TdnnfModelConfig)
    from tdnnf_nas_tpu.nas import extract_offsets, child_config_from_arch
    from tdnnf_nas_tpu.recipes.chain_recipes import prepare_data, train_model
    from tdnnf_nas_tpu.train import (ChainObjectiveConfig, OptimizerConfig,
                                     TrainerConfig, make_valid_step)
    from tdnnf_nas_tpu.data.egs import batch_iterator
    import jax.numpy as jnp

    t0 = time.time()
    utts, phone_seqs, tree, topo = make_planted_corpus()
    bundle = prepare_data(utts, phone_seqs, tree, topo, tree.num_phones,
                          dev_fraction=0.12)
    base = TdnnfModelConfig(
        feat_dim=24, ivector_dim=0, hidden_dim=64, bottleneck_dim=16,
        time_strides=(1,), num_pdfs=tree.num_pdfs, prefinal_big=64,
        prefinal_small=32, compute_dtype="float32")
    darts = DartsModelConfig(base=base, search_offsets=True, max_stride=3)
    opt = dict(kind="adam", lr_initial=2e-3, lr_final=5e-4)

    pre_tc = TrainerConfig(train_theta=True, train_alpha=False,
                           search_mode=SearchMode.UNIFORM,
                           optimizer=OptimizerConfig(num_steps=pretrain_steps,
                                                     **opt))
    sup, _ = train_model(bundle, darts, pre_tc, pretrain_steps,
                         batch_size=16, chunk_width=20, seed=0,
                         supernet=True)
    ent0 = _entropies(sup)

    cv_tc = TrainerConfig(train_theta=False, train_alpha=True,
                          bn_frozen=True, search_mode=SearchMode.SOFTMAX,
                          optimizer=OptimizerConfig(num_steps=cv_steps,
                                                    alpha_lr_scale=30.0,
                                                    **opt))
    sup, _ = train_model(bundle, darts, cv_tc, cv_steps, batch_size=16,
                         chunk_width=20, seed=1, supernet=True,
                         init_state=sup, dev=True)
    ent1 = _entropies(sup)
    a_lin = np.asarray(sup.alphas["offsets_linear"])
    a_aff = np.asarray(sup.alphas["offsets_affine"])
    p_aff = np.exp(a_aff) / np.exp(a_aff).sum(-1, keepdims=True)
    archs = extract_offsets(a_lin, a_aff, top_k=1)
    top1 = archs[0][0]
    found = int(top1[0][1])
    mass_reach = float(p_aff[0, 2] + p_aff[0, 3])
    print(f"planted lag K={K_LAG}: affine softmax {np.round(p_aff[0], 3)} "
          f"-> top1 affine stride {found} "
          f"(reachable mass {mass_reach:.3f})", flush=True)

    # child A/B: the planted stride vs a no-lookahead child, equal budget
    table = {}
    for name, pairs in (("searched_top1", top1),
                        ("no_lookahead", ((int(top1[0][0]), 0),))):
        ccfg = child_config_from_arch(base, stride_pairs=pairs)
        tc = TrainerConfig(objective=ChainObjectiveConfig(),
                           optimizer=OptimizerConfig(num_steps=child_steps,
                                                     **opt))
        st, mets = train_model(bundle, ccfg, tc, child_steps, batch_size=16,
                               chunk_width=20, seed=7)
        vstep = make_valid_step(ccfg, tc, bundle.den_arrays)
        vals = []
        for i, b in enumerate(batch_iterator(
                bundle.egs(ccfg, chunk_width=20, dev=True), 16,
                np.random.RandomState(0))):
            if i >= 4:
                break
            vals.append(float(vstep(st, jax.tree.map(jnp.asarray, b))
                              ["objf_mmi"]))
        table[name] = {"pairs": [list(p) for p in pairs],
                       "train_objf": round(mets.last("objf_mmi"), 4),
                       "dev_objf": round(float(np.mean(vals)), 4)}
        print(f"{name}: {table[name]}", flush=True)

    out = {
        "planted_lag": K_LAG,
        "alpha_entropy_uniform": round(float(np.log(a_aff.shape[-1])), 3),
        "alpha_entropy_after_pretrain": ent0,
        "alpha_entropy_after_cvupdate": ent1,
        "affine_softmax": [round(float(x), 4) for x in p_aff[0]],
        "top1_affine_stride": found,
        "reachable_strides": [2, 3],
        "reachable_mass": round(mass_reach, 4),
        "planted_reach_found": bool(found in (2, 3) and mass_reach > 0.8),
        "child_table": table,
        "dev_objf_gap": round(table["searched_top1"]["dev_objf"]
                              - table["no_lookahead"]["dev_objf"], 4),
        "seconds": round(time.time() - t0),
    }
    os.makedirs("docs", exist_ok=True)
    with open("docs/search_sanity.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


def _entropies(sup):
    out = {}
    for k in ("offsets_linear", "offsets_affine"):
        a = np.asarray(sup.alphas[k])
        p = np.exp(a) / np.exp(a).sum(-1, keepdims=True)
        out[k] = round(float(np.mean(-(p * np.log(p + 1e-20)).sum(-1))), 3)
    return out


if __name__ == "__main__":
    main()
