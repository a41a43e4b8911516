"""Recurrent (LSTM) language model for n-best rescoring.

Equivalent of the reference's kaldi-rnnlm stage
(`local/rnnlm/run_tdnn_lstm_fbk40_mod_hasfisher_large_drop_e40.sh`:
TDNN-LSTM LM, embed 1024 / cell 2048, trained on SWBD+Fisher text, used for
lattice/n-best rescoring).  Here: a pure-JAX LSTM LM (manual cell under
`lax.scan`, Adam, dropout), with a `score()` interface compatible with
`decode/rescore.rescore_nbest` (log10, like the n-gram LM).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tdnnf_nas_tpu.core.config import Config

_LOG10E = 1.0 / math.log(10.0)


@dataclasses.dataclass(frozen=True)
class RnnLMConfig(Config):
    vocab_size: int = 100  # real words; BOS/EOS appended internally
    embed_dim: int = 64
    hidden_dim: int = 128
    # LSTMP recurrent projection (Kaldi-RNNLM "rpd"; the reference rescorer
    # is embed 1024 / cell 2048 / rpd 512,
    # local/rnnlm/run_tdnn_lstm_fbk40_mod_hasfisher_large_drop_e40.sh:27-36);
    # 0 = plain LSTM (projection off)
    proj_dim: int = 0
    # TDNN splice layer over embeddings before the LSTM (the "tdnn" in the
    # reference's tdnn-lstm rescorer): ReLU(W [x_{t-1}; x_t]); off by default
    tdnn_splice: bool = False
    dropout: float = 0.15  # reference uses 0.15
    tie_embeddings: bool = False

    @property
    def rec_dim(self) -> int:
        """Recurrent state width seen by the gates / output layer."""
        return self.proj_dim or self.hidden_dim

    @property
    def bos(self) -> int:
        return self.vocab_size

    @property
    def eos(self) -> int:
        return self.vocab_size + 1

    @property
    def full_vocab(self) -> int:
        return self.vocab_size + 2


def init_rnnlm(cfg: RnnLMConfig, key: jax.Array):
    k = jax.random.split(key, 6)
    v, e, h, r = cfg.full_vocab, cfg.embed_dim, cfg.hidden_dim, cfg.rec_dim
    params = {
        "embed": jax.random.normal(k[0], (v, e)) * 0.1,
        "lstm": {
            "wx": jax.random.normal(k[1], (e, 4 * h)) / np.sqrt(e),
            "wh": jax.random.normal(k[2], (r, 4 * h)) / np.sqrt(r),
            "b": jnp.zeros((4 * h,)),
        },
        "out": {
            "w": jax.random.normal(k[3], (r, v)) / np.sqrt(r),
            "b": jnp.zeros((v,)),
        },
    }
    if cfg.proj_dim:
        params["lstm"]["wp"] = jax.random.normal(k[4], (h, r)) / np.sqrt(h)
    if cfg.tdnn_splice:
        params["tdnn"] = {
            "w": jax.random.normal(k[5], (2 * e, e)) / np.sqrt(2 * e),
            "b": jnp.zeros((e,)),
        }
    return params


def _lstm_cell(params, h, c, x_t):
    """One (optionally projected) LSTM step: returns (h_rec, c).  With a
    projection matrix wp the recurrent/output state is h = (o*tanh(c))@wp
    (Sak et al. LSTMP, Kaldi-RNNLM's rpd)."""
    lstm = params["lstm"]
    gates = x_t @ lstm["wx"] + h @ lstm["wh"] + lstm["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    m = jax.nn.sigmoid(o) * jnp.tanh(c)
    wp = lstm.get("wp")
    return (m @ wp if wp is not None else m), c


def _lstm_scan(params, x, h0=None, c0=None):
    """x [B,T,E] -> recurrent states [B,T,R]."""
    b, t, _ = x.shape
    h_dim = params["lstm"]["wx"].shape[1] // 4
    r_dim = params["lstm"]["wh"].shape[0]
    h = jnp.zeros((b, r_dim)) if h0 is None else h0
    c = jnp.zeros((b, h_dim)) if c0 is None else c0

    def step(carry, x_t):
        h, c = carry
        h, c = _lstm_cell(params, h, c, x_t)
        return (h, c), h

    (_, _), hs = jax.lax.scan(step, (h, c), jnp.moveaxis(x, 1, 0))
    return jnp.moveaxis(hs, 0, 1)


def rnnlm_logits(cfg: RnnLMConfig, params, tokens: jax.Array,
                 dropout_key=None, train: bool = False):
    """tokens [B,T] (inputs, BOS-prefixed) -> next-token logits [B,T,V]."""
    x = params["embed"][tokens]
    if train and cfg.dropout > 0 and dropout_key is not None:
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(dropout_key, keep, x.shape)
        x = x * mask / keep
    if cfg.tdnn_splice:
        # ReLU splice over (x_{t-1}, x_t); t=0 repeats the first frame
        prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
        x = jax.nn.relu(jnp.concatenate([prev, x], axis=-1)
                        @ params["tdnn"]["w"] + params["tdnn"]["b"])
    h = _lstm_scan(params, x)
    if cfg.tie_embeddings:
        return h @ params["embed"].T
    return h @ params["out"]["w"] + params["out"]["b"]


def _pad_batch(sents: Sequence[Sequence[int]], cfg: RnnLMConfig):
    t = max(len(s) for s in sents) + 1  # +1 for EOS target
    inp = np.full((len(sents), t), cfg.eos, np.int32)
    tgt = np.full((len(sents), t), -1, np.int32)  # -1 = ignore
    for i, s in enumerate(sents):
        inp[i, 0] = cfg.bos
        inp[i, 1 : len(s) + 1] = s
        tgt[i, : len(s)] = s
        tgt[i, len(s)] = cfg.eos
    return jnp.asarray(inp[:, :t]), jnp.asarray(tgt)


def train_rnnlm(
    sentences: Sequence[Sequence[int]],
    cfg: RnnLMConfig,
    num_steps: int = 200,
    batch_size: int = 16,
    lr: float = 2e-3,
    lr_final: float = None,
    seed: int = 0,
    heldout: Sequence[Sequence[int]] = None,
    eval_every: int = 2000,
):
    """Adam training; returns (params, final_perplexity).

    ``lr_final`` enables an exponential LR decay lr -> lr_final over
    ``num_steps`` (the reference trains 40 epochs with rnnlm-train's
    per-epoch halving schedule; constant-LR Adam plateaus well short of
    that optimum).  None keeps the legacy constant LR.

    ``heldout`` sentences enable early stopping: every ``eval_every``
    steps the held-out loss is evaluated and the best parameters kept
    (kaldi-rnnlm tracks dev objf per epoch the same way).  Without it a
    large LM memorizes a small synthetic corpus — observed train ppl 3.7
    with held-out ppl in the hundreds of thousands.  The returned
    perplexity is then the best HELD-OUT perplexity.
    """
    params = init_rnnlm(cfg, jax.random.PRNGKey(seed))
    m = jax.tree.map(jnp.zeros_like, params)
    v = jax.tree.map(jnp.zeros_like, params)
    rng = np.random.RandomState(seed)
    decay = (np.log(lr_final / lr) / max(num_steps - 1, 1)
             if lr_final else 0.0)

    @jax.jit
    def step(params, m, v, inp, tgt, t_step, dk):
        def loss_fn(p):
            logits = rnnlm_logits(cfg, p, inp, dropout_key=dk, train=True)
            mask = (tgt >= 0)
            tgt_safe = jnp.maximum(tgt, 0)
            lp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(lp, tgt_safe[..., None], axis=-1)[..., 0]
            nll = jnp.where(mask, nll, 0.0)
            return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1)

        loss, g = jax.value_and_grad(loss_fn)(params)
        t = t_step + 1.0
        lr_t = lr * jnp.exp(decay * t_step)
        m = jax.tree.map(lambda a, b: 0.9 * a + 0.1 * b, m, g)
        v = jax.tree.map(lambda a, b: 0.999 * a + 0.001 * b * b, v, g)
        params = jax.tree.map(
            lambda p, m_, v_: p - lr_t * (m_ / (1 - 0.9**t))
            / (jnp.sqrt(v_ / (1 - 0.999**t)) + 1e-8),
            params, m, v,
        )
        return params, m, v, loss

    @jax.jit
    def eval_loss(params, inp, tgt):
        logits = rnnlm_logits(cfg, params, inp)
        mask = (tgt >= 0)
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, jnp.maximum(tgt, 0)[..., None],
                                   axis=-1)[..., 0]
        return (jnp.sum(jnp.where(mask, nll, 0.0)),
                jnp.sum(mask.astype(jnp.float32)))

    loss = None
    key = jax.random.PRNGKey(seed + 1)
    # bucket to a fixed max length for stable jit shapes
    max_len = max(len(s) for s in sentences)

    def pad_to(inp, tgt):
        pad_t = max_len + 1
        if inp.shape[1] < pad_t:
            pad = pad_t - inp.shape[1]
            inp = jnp.pad(inp, ((0, 0), (0, pad)), constant_values=cfg.eos)
            tgt = jnp.pad(tgt, ((0, 0), (0, pad)), constant_values=-1)
        return inp, tgt

    held_batches = []
    if heldout:
        hs = [list(s)[:max_len] for s in heldout]
        for j in range(0, min(len(hs), 512), batch_size):
            hb = hs[j: j + batch_size]
            if len(hb) == batch_size:
                held_batches.append(pad_to(*_pad_batch(hb, cfg)))

    def held_ppl(params):
        tot, n = 0.0, 0.0
        for inp, tgt in held_batches:
            s, k = eval_loss(params, inp, tgt)
            tot += float(s)
            n += float(k)
        return float(np.exp(tot / max(n, 1.0)))

    best = None  # (ppl, params)
    for i in range(num_steps):
        idx = rng.choice(len(sentences), batch_size)
        batch = [list(sentences[j])[:max_len] for j in idx]
        inp, tgt = pad_to(*_pad_batch(batch, cfg))
        key, dk = jax.random.split(key)
        params, m, v, loss = step(params, m, v, inp, tgt, jnp.asarray(float(i)), dk)
        if held_batches and ((i + 1) % eval_every == 0 or i == num_steps - 1):
            p = held_ppl(params)
            if best is None or p < best[0]:
                best = (p, jax.tree.map(lambda a: a.copy(), params))
    if best is not None:
        return best[1], best[0]
    ppl = float(jnp.exp(loss)) if loss is not None else float("inf")
    return params, ppl


class RnnLMScorer:
    """rescore_nbest-compatible scorer (log10 sentence scores)."""

    def __init__(self, cfg: RnnLMConfig, params):
        self.cfg = cfg
        self.params = params
        # params are a jit ARGUMENT (closing over large arrays bakes them
        # into the HLO as constants — very slow remote compiles at scale)
        self._score_jit = jax.jit(self._score_batch)

    def _score_batch(self, params, inp, tgt):
        logits = rnnlm_logits(self.cfg, params, inp)
        lp = jax.nn.log_softmax(logits, axis=-1)
        mask = (tgt >= 0)
        tgt_safe = jnp.maximum(tgt, 0)
        tok_lp = jnp.take_along_axis(lp, tgt_safe[..., None], axis=-1)[..., 0]
        return jnp.sum(jnp.where(mask, tok_lp, 0.0), axis=-1)

    def score(self, words: Sequence[int]) -> float:
        """log10 P(words </s> | <s>)."""
        inp, tgt = _pad_batch([list(int(w) for w in words)], self.cfg)
        return float(self._score_jit(self.params, inp, tgt)[0]) * _LOG10E

    def _token_lp(self, params, inp, tgt):
        logits = rnnlm_logits(self.cfg, params, inp)
        lp = jax.nn.log_softmax(logits, axis=-1)
        mask = tgt >= 0
        tok = jnp.take_along_axis(lp, jnp.maximum(tgt, 0)[..., None],
                                  axis=-1)[..., 0]
        return jnp.where(mask, tok, 0.0)

    def token_logprobs(self, inp, tgt):
        """Per-token ln P (0 where tgt < 0) — the batched-rescoring path
        (decode/rescore.rescore_nbest_rnnlm_batched)."""
        if not hasattr(self, "_toklp_jit"):
            self._toklp_jit = jax.jit(self._token_lp)
        return self._toklp_jit(self.params, inp, tgt)

    # -- incremental API (lattice rescoring, decode/lattice.py) ----------
    # A state is (h [R], c [H], prev_x [E], logp [V]) after consuming some
    # prefix; natural-log scores (the lattice works in ln).

    def _step_fn(self, params, h, c, prev_x, token):
        x = params["embed"][token]
        x_in = x
        if self.cfg.tdnn_splice:
            x_in = jax.nn.relu(
                jnp.concatenate([prev_x, x]) @ params["tdnn"]["w"]
                + params["tdnn"]["b"])
        h, c = _lstm_cell(params, h, c, x_in)
        if self.cfg.tie_embeddings:
            logits = h @ params["embed"].T
        else:
            logits = h @ params["out"]["w"] + params["out"]["b"]
        return h, c, x, jax.nn.log_softmax(logits)

    @property
    def _step_jit(self):
        if not hasattr(self, "_step_cache"):
            self._step_cache = jax.jit(self._step_fn)
        return self._step_cache

    def initial_state(self):
        h = jnp.zeros((self.cfg.rec_dim,))
        c = jnp.zeros((self.cfg.hidden_dim,))
        # BOS has no predecessor embedding: splice repeats it (same
        # convention as the batch path's first frame)
        x0 = self.params["embed"][self.cfg.bos]
        h, c, px, lp = self._step_jit(self.params, h, c, x0,
                                      jnp.asarray(self.cfg.bos))
        return (h, c, px, np.asarray(lp))

    def advance(self, state, word: int):
        """(ln P(word | prefix), state after consuming word)."""
        h, c, px, lp = state
        logp = float(lp[int(word)])
        h2, c2, px2, lp2 = self._step_jit(self.params, h, c, px,
                                          jnp.asarray(int(word)))
        return logp, (h2, c2, px2, np.asarray(lp2))

    def final_logprob(self, state) -> float:
        """ln P(</s> | prefix)."""
        return float(state[-1][self.cfg.eos])

    # -- frontier-batched API (decode/lattice.rescore_lattices_rnnlm) ----
    # Device states are (h [N,R], c [N,H], px [N,E]) WITHOUT the cached
    # host softmax: the per-arc incremental path ships the full [V]
    # distribution to the host on every advance (~30k floats through the
    # tunnel per expansion — the round-4 bottleneck, STATUS #8); here one
    # jitted call advances a whole frontier and returns only the consumed
    # tokens' log-probs (+ EOS) as N floats.

    def _advance_batch_fn(self, params, h, c, px, words):
        if self.cfg.tie_embeddings:
            logits = h @ params["embed"].T
        else:
            logits = h @ params["out"]["w"] + params["out"]["b"]
        lp_all = jax.nn.log_softmax(logits, axis=-1)
        lp_w = jnp.take_along_axis(
            lp_all, jnp.maximum(words, 0)[:, None], axis=-1)[:, 0]
        lp_eos = lp_all[:, self.cfg.eos]
        x = params["embed"][jnp.maximum(words, 0)]
        x_in = x
        if self.cfg.tdnn_splice:
            x_in = jax.nn.relu(
                jnp.concatenate([px, x], axis=-1) @ params["tdnn"]["w"]
                + params["tdnn"]["b"])
        h2, c2 = _lstm_cell(params, h, c, x_in)
        # lp_w/lp_eos stacked into ONE output: the caller host-fetches them
        # synchronously every frontier level, and a remote-device tunnel
        # pays a full round trip per fetched array — one stacked fetch
        # instead of two halves the rescorer's serial latency floor
        return h2, c2, x, jnp.stack([lp_w, lp_eos])

    def initial_state_batch(self):
        """Device (h, c, px) for the <s> prefix, batch shape [1, ...]."""
        h, c, px, _ = self.initial_state()
        return (jnp.asarray(h)[None], jnp.asarray(c)[None],
                jnp.asarray(px)[None])

    def advance_batch(self, h, c, px, words: np.ndarray):
        """Advance N states by N words in one device call.

        Returns (h2, c2, px2) ON DEVICE (padded rows garbage-in/out) and
        host arrays (lp_w [N], lp_eos [N]) — ln P(word_i | prefix_i) under
        the PRE-advance distributions, and ln P(</s> | prefix_i).
        Rows are padded to power-of-two buckets for stable jit shapes.
        """
        if not hasattr(self, "_adv_jit"):
            self._adv_jit = jax.jit(self._advance_batch_fn)
        n = len(words)
        n_pad = max(8, 1 << (n - 1).bit_length())
        pad = n_pad - n

        def padrows(a):
            return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

        w = jnp.asarray(np.pad(np.asarray(words, np.int32), (0, pad)))
        h2, c2, px2, lp = self._adv_jit(
            self.params, padrows(h), padrows(c), padrows(px), w)
        lp = np.asarray(lp)  # single host fetch per level (see _advance_batch_fn)
        return (h2, c2, px2, lp[0, :n], lp[1, :n])


def reverse_sentences(sents: Sequence[Sequence[int]]):
    """Word-reversed corpus for training a backward LM — the reference's
    `_back_` recipe trains kaldi-rnnlm on reversed text
    (`local/rnnlm/run_tdnn_lstm_fbk40_mod_hasfisher_large_drop_e40_back_.sh`)."""
    return [list(s)[::-1] for s in sents]


class BidirectionalRnnLMScorer:
    """Interpolated forward + backward RNNLM sentence scorer.

    The reference rescores n-best lists with a forward RNNLM and a
    backward RNNLM (trained on reversed text) and averages the two scores
    (bidirectional rescoring, the `_back_` recipe pair).  `backward`
    must have been trained on `reverse_sentences(corpus)`; its score of a
    hypothesis is taken on the reversed word sequence.

    score() is log10 — drop-in for `decode/rescore.rescore_nbest`.
    """

    def __init__(self, forward: RnnLMScorer, backward: RnnLMScorer,
                 interp: float = 0.5):
        assert 0.0 <= interp <= 1.0
        self.forward = forward
        self.backward = backward
        self.interp = interp

    def score(self, words: Sequence[int]) -> float:
        f = self.forward.score(words)
        b = self.backward.score(list(words)[::-1])
        return self.interp * f + (1.0 - self.interp) * b
