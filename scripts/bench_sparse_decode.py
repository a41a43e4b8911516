"""Benchmark the sparse HCLG + beam decoder at real-vocabulary scale (host).

VERDICT round-1 item #2: decode a >=5k-word vocabulary over a >=100k-state
trigram graph at real-time-or-better with lattices preserved (the reference
decodes eval2000 over the sw1_tg 3-gram HCLG,
`run_tdnn_7q_fbk_40_manual.sh:216-237`).

Writes docs/sparse_decode_bench.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(vocab_size=5000, num_phones=42, n_train_sents=30000, n_test=20,
         out_name="sparse_decode_bench.json", noise=0.75, pron_len=(3, 7),
         beam=14.0, max_active=7000):
    from tdnnf_nas_tpu.decode.beam import beam_decode_sparse
    from tdnnf_nas_tpu.decode.graph_sparse import build_hclg_sparse
    from tdnnf_nas_tpu.decode.lattice import lattice_best_path
    from tdnnf_nas_tpu.decode.scoring import score_corpus
    from tdnnf_nas_tpu.decode.wfst import Lexicon
    from tdnnf_nas_tpu.graphs.topology import ChainTopology, BiphoneTree
    from tdnnf_nas_tpu.lm.ngram import estimate_ngram_lm

    rng = np.random.RandomState(0)
    # --- lexicon: unique random prons, 3-6 phones ---
    prons = {}
    seen = set()
    w = 0
    while w < vocab_size:
        n = rng.randint(*pron_len)
        pron = tuple(rng.randint(0, num_phones, size=n).tolist())
        if pron in seen:
            continue
        seen.add(pron)
        prons[w] = pron
        w += 1
    lex = Lexicon(prons)
    word_sym = [f"w{w}" for w in range(vocab_size)]

    # --- text: Zipf unigram + first-order Markov flavor ---
    zipf = 1.0 / np.arange(1, vocab_size + 1)
    zipf /= zipf.sum()
    # sparse bigram flavor: each word prefers a random small successor set
    succ = rng.randint(0, vocab_size, size=(vocab_size, 20))
    sents = []
    for _ in range(n_train_sents):
        n = rng.randint(4, 14)
        s = [int(rng.choice(vocab_size, p=zipf))]
        for _ in range(n - 1):
            if rng.rand() < 0.7:
                s.append(int(succ[s[-1], rng.randint(20)]))
            else:
                s.append(int(rng.choice(vocab_size, p=zipf)))
        sents.append([word_sym[x] for x in s])
    t0 = time.time()
    lm = estimate_ngram_lm(sents, order=3)
    t_lm = time.time() - t0
    n_ngrams = len(lm.logprobs)
    print(f"trigram LM: {n_ngrams} ngrams in {t_lm:.1f}s", flush=True)

    topo = ChainTopology(num_phones)
    tree = BiphoneTree(num_phones)
    t0 = time.time()
    g = build_hclg_sparse(lex, lm, word_sym, topo, tree)
    t_graph = time.time() - t0
    print(f"HCLG: {g.num_states} states, {g.num_arcs} arcs in {t_graph:.1f}s",
          flush=True)

    # --- test utterances with noisy oracle observations ---
    fs_sec = 0.03  # 30ms per output frame (10ms x subsampling 3)
    refs, hyps, rtfs, lat_ok = [], [], [], 0
    act, py_rtfs = [], []
    t_total_py = 0.0
    t_total, audio_total = 0.0, 0.0
    for i in range(n_test):
        n = rng.randint(8, 16)
        wordsq = [int(rng.choice(vocab_size, p=zipf))]
        for _ in range(n - 1):
            if rng.rand() < 0.7:
                wordsq.append(int(succ[wordsq[-1], rng.randint(20)]))
            else:
                wordsq.append(int(rng.choice(vocab_size, p=zipf)))
        phones = [p for wd in wordsq for p in prons[wd]]
        pdfs = []
        prev = -1
        for p in phones:
            dur = 1 + rng.geometric(1.0 / 3.0)
            pdfs.append(tree.forward_pdf(p, prev))
            pdfs.extend([tree.self_loop_pdf(p)] * (dur - 1))
            prev = p
        t_len = len(pdfs)
        obs = np.full((t_len, tree.num_pdfs), -8.0, np.float32)
        obs[np.arange(t_len), pdfs] = 0.0
        obs += noise * rng.randn(t_len, tree.num_pdfs).astype(np.float32)

        t0 = time.time()
        res = beam_decode_sparse(obs, g, beam=beam, max_active=max_active,
                                 lattice=True, lattice_beam=7.0,
                                 retry_beam=4 * beam)
        dt = time.time() - t0
        # numpy reference on the same obs (the round-3 decoder) for the
        # native-vs-python speedup line
        t0 = time.time()
        res_py = beam_decode_sparse(obs, g, beam=beam,
                                    max_active=max_active, lattice=True,
                                    lattice_beam=7.0, retry_beam=4 * beam,
                                    native="never")
        dt_py = time.time() - t0
        if res_py.words != res.words:
            print(f"# WARNING: native/python hyp mismatch on utt {i}",
                  flush=True)
        audio = t_len * fs_sec
        t_total += dt
        t_total_py += dt_py
        audio_total += audio
        rtfs.append(dt / audio)
        py_rtfs.append(dt_py / audio)
        act.append(res.num_active_mean)
        refs.append(wordsq)
        hyps.append(res.words)
        lw, _ = lattice_best_path(res.lattice)
        lat_ok += int(lw == res.words)
    rep = score_corpus(refs, hyps)
    rtf = t_total / audio_total
    out = {
        "vocab": vocab_size,
        "lm_ngrams": n_ngrams,
        "graph_states": int(g.num_states),
        "graph_arcs": int(g.num_arcs),
        "lm_build_s": round(t_lm, 1),
        "graph_build_s": round(t_graph, 1),
        "wer": rep["wer"],
        "obs_noise": noise,
        "beam": beam,
        "rtf": round(rtf, 4),
        "rtf_python": round(t_total_py / audio_total, 4),
        "xrt_speedup": round(1.0 / rtf, 1),
        "mean_active": round(float(np.mean(act)), 1),
        "lattice_bestpath_match": f"{lat_ok}/{n_test}",
        "utterances": n_test,
    }
    os.makedirs("docs", exist_ok=True)
    with open(os.path.join("docs", out_name), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "30k":
        # reference-scale: ~30k-word lexicon x >=1M-ngram trigram G
        # (the sw1_tg scale of `run.sh:24-79`).  Longer prons + lower noise:
        # 30k RANDOM short prons are far more confusable than a real
        # lexicon; this benchmarks graph/search scale, not AM quality.
        # beam 18: pushed LM weights mean a rare word pays its full cost on
        # the entry arc, so the beam must cover the worst unigram-vs-seen
        # cost gap or correct entries die early (same reason Kaldi decodes
        # at beam 11-15 over REAL LMs with far lower tail perplexity).
        main(vocab_size=30000, n_train_sents=150000, n_test=20,
             out_name="sparse_decode_bench_30k.json", noise=0.5,
             pron_len=(4, 9), beam=18.0, max_active=14000)
    else:
        main()
