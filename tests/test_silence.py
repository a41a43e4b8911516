"""Optional-silence modeling (prepare_lang semantics).

The corpus inserts a dedicated silence phone between words
(`WordCorpusConfig.silence_prob`); the HCLG gets optional-silence chains
after every word with silence-aware cross-word left context
(`build_hclg_sparse(sil_phone=..., sil_prob=...)`).  Ref:
`utils/prepare_lang.sh` optional-silence semantics (upstream; invoked by
`/root/reference/run.sh:24-79` data prep).
"""

import numpy as np
import pytest

from tdnnf_nas_tpu.data.synthetic import WordCorpusConfig, make_word_corpus
from tdnnf_nas_tpu.decode.beam import beam_decode_sparse
from tdnnf_nas_tpu.decode.graph_sparse import build_hclg_sparse
from tdnnf_nas_tpu.decode.scoring import score_corpus
from tdnnf_nas_tpu.decode.wfst import Lexicon
from tdnnf_nas_tpu.lm.ngram import estimate_ngram_lm


@pytest.fixture(scope="module")
def sil_world():
    cfg = WordCorpusConfig(vocab_size=14, num_phones=9, num_utts=40,
                           min_words=3, max_words=7, silence_prob=0.6,
                           seed=5)
    utts, prons, word_seqs, phone_seqs, tree, topo = make_word_corpus(cfg)
    word_sym = [f"w{w}" for w in range(cfg.vocab_size)]
    lm = estimate_ngram_lm(
        [[word_sym[w] for w in ws] for ws in word_seqs], order=3)
    return cfg, utts, word_seqs, prons, tree, topo, lm, word_sym


def _oracle_obs(utt, tree):
    t = len(utt.pdf_align)
    obs = np.full((t, tree.num_pdfs), -8.0, np.float32)
    obs[np.arange(t), utt.pdf_align] = 0.0
    return obs


def test_corpus_has_silence_and_clean_refs(sil_world):
    cfg, utts, word_seqs, prons, tree, topo, lm, word_sym = sil_world
    sil = cfg.silence_phone
    assert sil == cfg.num_phones - 1
    # silence appears in phone streams but never in pronunciations/refs
    assert any(sil in u.phones for u in utts)
    assert all(sil not in pron for pron in prons.values())


def test_silence_graph_recovers_words(sil_world):
    cfg, utts, word_seqs, prons, tree, topo, lm, word_sym = sil_world
    g = build_hclg_sparse(Lexicon(prons), lm, word_sym, topo, tree,
                          sil_phone=cfg.silence_phone, sil_prob=0.5)
    refs, hyps = [], []
    for utt, ws in list(zip(utts, word_seqs))[:12]:
        res = beam_decode_sparse(_oracle_obs(utt, tree), g, beam=14.0)
        refs.append(list(ws))
        hyps.append(res.words)
    rep = score_corpus(refs, hyps)
    assert rep["wer"] == 0.0, rep
    # the silence-free graph cannot explain the silence frames
    g0 = build_hclg_sparse(Lexicon(prons), lm, word_sym, topo, tree)
    hyps0 = []
    for utt, ws in list(zip(utts, word_seqs))[:12]:
        res = beam_decode_sparse(_oracle_obs(utt, tree), g0, beam=14.0,
                                 retry_beam=28.0)
        hyps0.append(res.words)
    rep0 = score_corpus(refs, hyps0)
    assert rep0["wer"] > rep["wer"]


def test_silence_graph_structure(sil_world):
    cfg, utts, word_seqs, prons, tree, topo, lm, word_sym = sil_world
    g = build_hclg_sparse(Lexicon(prons), lm, word_sym, topo, tree,
                          sil_phone=cfg.silence_phone, sil_prob=0.5)
    g0 = build_hclg_sparse(Lexicon(prons), lm, word_sym, topo, tree)
    # junction block doubled, silence chains added, CSR consistent
    assert g.num_states > g0.num_states
    assert g.out_start[-1] == g.num_arcs
    assert (g.arc_dst < g.num_states).all()
    # silence pdfs present in the graph's emitting states
    sil_loop = tree.self_loop_pdf(cfg.silence_phone)
    assert (np.asarray(g.state_pdf) == sil_loop).any()


def test_pronunciation_variants_decode():
    """lexiconp.txt semantics: words with alternative pronunciations get
    one shared chain per variant with ln(pron prob) on the entry arc;
    utterances generated with either variant decode to the right words."""
    cfg = WordCorpusConfig(vocab_size=14, num_phones=8, num_utts=60,
                           min_words=3, max_words=7, pron_variant_prob=0.5,
                           seed=7)
    utts, lex, word_seqs, phone_seqs, tree, topo = make_word_corpus(cfg)
    from tdnnf_nas_tpu.decode.wfst import Lexicon as _Lx

    assert isinstance(lex, _Lx) and lex.alt  # corpus returned a Lexicon
    assert any(len(lex.variants(w)) == 2 for w in range(cfg.vocab_size))
    # some utterance actually used an alternative pronunciation
    def used_alt(u):
        i = 0
        for wd in u.words:
            n = len(lex.prons[wd])
            for pron, _ in lex.variants(wd):
                if tuple(u.phones[i:i + len(pron)]) == pron:
                    if pron != tuple(lex.prons[wd]):
                        return True
                    i += len(pron)
                    break
            else:
                return False
        return False
    assert any(used_alt(u) for u in utts)
    word_sym = [f"w{w}" for w in range(cfg.vocab_size)]
    lm = estimate_ngram_lm(
        [[word_sym[w] for w in ws] for ws in word_seqs], order=3)
    g = build_hclg_sparse(_Lx(lex), lm, word_sym, topo, tree)
    refs, hyps = [], []
    for utt, ws in list(zip(utts, word_seqs))[:15]:
        res = beam_decode_sparse(_oracle_obs(utt, tree), g, beam=14.0)
        refs.append(list(ws))
        hyps.append(res.words)
    rep = score_corpus(refs, hyps)
    assert rep["wer"] == 0.0, rep
