"""Pipeline recipes: the reference's shell-script stages as Python functions.

1:1 with `README.md` steps 5–8 of the reference (SURVEY.md §2.4):

  prepare_data            ~ run.sh + Prepare_NAS_data.sh (here: any utterance
                            source incl. the synthetic corpus; 95/5 split)
  train_model             ~ steps/nnet3/chain/train.py (any model/trainer cfg)
  run_offset_search_pipeline
                          ~ run_TDNN_DARTSV3_fbk_stride_pretrain.sh (uniform
                            one-hot 95% pretrain) -> ..._cvupdate.sh
                            (gumbel/softmax alpha-only update on the 5% dev
                            split, BN frozen) -> generate_top_list.py
                            (beam-search extraction) ->
                            run_TDNN_DARTS_Child_mod_fbk.sh (child retrain)
  run_bottleneck_search_pipeline
                          ~ run_TDNNf_DARTS_mod_fbk_bottleneckCBshare_*
                            (one-hot pretrain -> flops-penalized cv-update ->
                            extraction -> child retrain)
  decode_corpus           ~ decode + scoring (round 1: Viterbi phone decode
                            + PER; word-level WFST decode in later rounds)
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Tuple

import jax
import numpy as np

from tdnnf_nas_tpu.core.metrics import MetricsLogger
from tdnnf_nas_tpu.core.checkpoint import save_checkpoint
from tdnnf_nas_tpu.data.egs import EgsConfig, batch_iterator, make_egs
from tdnnf_nas_tpu.decode.scoring import score_corpus
from tdnnf_nas_tpu.decode.viterbi import graph_log_arrays, path_to_phones, viterbi_decode
from tdnnf_nas_tpu.graphs import (
    build_denominator_graph,
    compile_denominator_fsa,
    den_init_lookup,
    estimate_ngram_phone_lm,
    estimate_phone_lm,
)
from tdnnf_nas_tpu.models import (
    DartsModelConfig,
    SearchMode,
    TdnnfModelConfig,
    model_context,
    supernet_context,
)
from tdnnf_nas_tpu.nas import (
    child_config_from_arch,
    extract_bottlenecks,
    extract_offsets,
)
from tdnnf_nas_tpu.ops.fwdbwd import DenGraphArrays
from tdnnf_nas_tpu.parallel import put_batch, put_replicated
from tdnnf_nas_tpu.train import (
    TrainerConfig,
    TrainState,
    init_train_state,
    make_train_step,
)


@dataclasses.dataclass
class DataBundle:
    lm: object
    den: object  # dense StateGraph (None when the composed graph is too big)
    den_arrays: object  # DenGraphArrays | FactoredDenGraph
    tree: object
    topo: object
    train_utts: list
    dev_utts: list
    num_phones: int
    den_fsa: object = None  # CompiledDenFsa on the composed (4-gram/triphone) path
    egs_stats: dict = dataclasses.field(default_factory=dict)
    # per-utterance i-vectors aligned with train_utts / dev_utts
    # (Prepare_NAS_data.sh:37-41 online i-vectors), fed into egs + decode
    train_ivectors: object = None
    dev_ivectors: object = None
    _egs_cache: dict = dataclasses.field(default_factory=dict)

    def egs(self, model_cfg, chunk_width=20, dev=False, tol=2,
            max_phones_per_chunk=24, supernet_cfg=None):
        if supernet_cfg is not None:
            left, right = supernet_context(supernet_cfg)
        else:
            left, right = model_context(model_cfg)
        # memo: chunks depend only on (context, widths, tol, split) — models
        # with the same receptive field (e.g. bf16/f32 A/B, repeated child
        # retrains) reuse one build instead of re-cutting the whole corpus
        key = (left, right, chunk_width, dev, tol, max_phones_per_chunk)
        cached = self._egs_cache.get(key)
        if cached is not None:
            return cached
        cfg = EgsConfig(
            chunk_width=chunk_width, left_context=left, right_context=right,
            tolerance=tol, max_phones_per_chunk=max_phones_per_chunk,
        )
        utts = self.dev_utts if dev else self.train_utts
        ivs = self.dev_ivectors if dev else self.train_ivectors
        if self.den_fsa is not None:
            chunks = make_egs(utts, self.lm, self.topo, self.tree, cfg,
                              den_fsa=self.den_fsa, stats=self.egs_stats,
                              ivectors=ivs)
        else:
            chunks = make_egs(
                utts, self.lm, self.topo, self.tree, cfg,
                den_init_fn=den_init_lookup(self.den, self.num_phones),
                stats=self.egs_stats, ivectors=ivs)
        self._egs_cache[key] = chunks
        return chunks


def bootstrap_alignments_gmm(utts, phone_seqs, num_phones: int,
                             speakers=None, ladder_cfg=None):
    """Replace the utterances' phone begin/end alignments with GMM-ladder
    ones (mono -> LDA+MLLT -> SAT/fMLLR, gmm/ladder.py) — the classical
    bootstrap of the reference (`run.sh` GMM stages +
    `Prepare_NAS_data.sh:66-75` fMLLR aligns).  The alternative is the
    flat-start chain self-alignment (decode/align.py).

    Mutates and returns ``utts``; also returns the ladder result (model,
    transforms, diagnostics).
    """
    from tdnnf_nas_tpu.gmm import GmmLadderConfig, run_gmm_ladder

    cfg = ladder_cfg or GmmLadderConfig()
    res = run_gmm_ladder([u.feats for u in utts], phone_seqs, num_phones,
                         cfg, speakers=speakers)
    for u, b, e in zip(utts, res.begins, res.ends):
        u.begins = list(b)
        u.ends = list(e)
    return utts, res


def prepare_data(utts, phone_seqs, tree, topo, num_phones: int,
                 dev_fraction: float = 0.05,
                 phone_lm_order: int = 2,
                 num_extra_lm_states: int = 2000,
                 max_dense_states: int = 4096,
                 ivectors=None) -> DataBundle:
    """Estimate the phone LM, build the den graph, split train/dev.

    The 95/5 split mirrors `Prepare_NAS_data.sh:5-7` (dev = the alpha-update
    cv split).  ``phone_lm_order > 2`` (Kaldi default 4,
    `steps/nnet3/chain/train.py:332` chain-est-phone-lm) or a tree with
    context_width > 2 switches to the composed den FSA + factored sparse
    kernel; a dense export is kept alongside when small enough (diagnostic
    phone decode).
    """
    n_dev = max(1, int(len(utts) * dev_fraction))
    dev, train = utts[:n_dev], utts[n_dev:]
    iv_dev = ivectors[:n_dev] if ivectors is not None else None
    iv_train = ivectors[n_dev:] if ivectors is not None else None
    composed = (phone_lm_order > 2 or getattr(tree, "context_width", 1) > 2
                or getattr(tree, "right_context", 0) > 0)
    if not composed:
        lm = estimate_phone_lm(phone_seqs, num_phones)
        den = build_denominator_graph(lm, topo, tree)
        return DataBundle(
            lm=lm, den=den, den_arrays=DenGraphArrays.from_graph(den),
            tree=tree, topo=topo, train_utts=train, dev_utts=dev,
            num_phones=num_phones,
            train_ivectors=iv_train, dev_ivectors=iv_dev,
        )
    lm = estimate_ngram_phone_lm(phone_seqs, num_phones,
                                 order=max(phone_lm_order, 2),
                                 num_extra_lm_states=num_extra_lm_states)
    comp = compile_denominator_fsa(lm, topo, tree)
    den = comp.to_state_graph() if comp.num_states <= max_dense_states else None
    try:
        den_arrays = comp.to_blocked()
    except ValueError:  # degenerate class structure: padded blocks too big
        den_arrays = comp.to_factored()
    return DataBundle(
        lm=lm, den=den, den_arrays=den_arrays, tree=tree, topo=topo,
        train_utts=train, dev_utts=dev, num_phones=num_phones, den_fsa=comp,
        train_ivectors=iv_train, dev_ivectors=iv_dev,
    )


def train_model(
    bundle: DataBundle,
    model_cfg,
    trainer_cfg: TrainerConfig,
    num_steps: int,
    batch_size: int = 8,
    chunk_width: int = 20,
    seed: int = 0,
    supernet: bool = False,
    init_state: Optional[TrainState] = None,
    dev: bool = False,
    metrics: Optional[MetricsLogger] = None,
    ckpt_dir: Optional[str] = None,
    ckpt_interval: int = 0,
    mesh=None,
    prefetch: int = 2,
    log_every: int = 0,
) -> Tuple[TrainState, MetricsLogger]:
    """The iteration loop (`train.py:473-570` equivalent).

    Batches are staged on device by a background thread (``prefetch``
    buffers, parallel/mesh.prefetch_to_device) and metrics logging is
    deferred (core/metrics.py), so the loop never blocks on a host<->device
    round trip per step — through a remote-device tunnel those two syncs
    dominated wall clock by >10x.  ``log_every`` prints step/objf/rate
    progress (the per-iteration compute_prob log of `train.py:473-570`)."""
    chunks = bundle.egs(
        model_cfg if not supernet else None, chunk_width=chunk_width, dev=dev,
        supernet_cfg=model_cfg if supernet else None,
    )
    if len(chunks) < batch_size:
        raise ValueError(f"only {len(chunks)} chunks for batch {batch_size}")
    state = init_state
    if state is None:
        state = init_train_state(model_cfg, trainer_cfg,
                                 jax.random.PRNGKey(seed), supernet=supernet)
    else:
        # the jitted step donates its input state; don't consume the caller's
        import jax.numpy as _jnp
        state = jax.tree.map(_jnp.array, state)
    if mesh is not None:
        state = put_replicated(state, mesh)
    step = make_train_step(model_cfg, trainer_cfg, bundle.den_arrays,
                           supernet=supernet)
    metrics = metrics or MetricsLogger()
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed + 1)
    it = batch_iterator(chunks, batch_size=batch_size, rng=rng)
    if prefetch:
        from tdnnf_nas_tpu.parallel import prefetch_to_device

        it = prefetch_to_device(it, size=prefetch, mesh=mesh)
    t_last, i_last = time.time(), 0
    for i, batch in enumerate(it):
        if i >= num_steps:
            break
        if mesh is not None and not prefetch:
            batch = put_batch(batch, mesh)
        state, m = step(state, batch, key)
        metrics.log(i, m)
        if log_every and (i + 1) % log_every == 0:
            now = time.time()
            rate = (i + 1 - i_last) / max(now - t_last, 1e-9)
            t_last, i_last = now, i + 1
            print(f"[train] step {i + 1}/{num_steps} "
                  f"objf_mmi={metrics.last('objf_mmi'):.4f} "
                  f"({rate:.1f} steps/s)", flush=True)
        if ckpt_dir and ckpt_interval and (i + 1) % ckpt_interval == 0:
            save_checkpoint(ckpt_dir, i + 1, state)
    if ckpt_dir:
        save_checkpoint(ckpt_dir, num_steps, state)
    return state, metrics


def decode_corpus(
    bundle: DataBundle,
    model_cfg,
    state: TrainState,
    utts=None,
    chunk_output_frames: int = 0,
) -> dict:
    """Viterbi phone decode of whole utterances + PER vs the true phones.

    Pads each utterance's features with the model context and decodes the
    full output sequence against the denominator (phone-bigram) graph —
    the diagnostic decoder; WFST word decode lands in later rounds.
    """
    from tdnnf_nas_tpu.models import apply_model
    import jax.numpy as jnp

    utts = utts if utts is not None else bundle.dev_utts
    left, right = model_context(model_cfg)
    lt, spdf, li, lf = graph_log_arrays(bundle.den)
    refs, hyps = [], []
    bucket = 32  # pad output lengths to multiples => few jit shapes
    fs = model_cfg.frame_subsampling_factor
    for utt in utts:
        t_out = len(utt.pdf_align)
        t_pad = ((t_out + bucket - 1) // bucket) * bucket
        need = left + (t_pad - 1) * fs + 1 + right
        feats = np.concatenate([
            np.repeat(utt.feats[:1], left, 0), utt.feats,
            np.repeat(utt.feats[-1:], need, 0),
        ])[None][:, :need]
        chain, _, _ = apply_model(model_cfg, state.params, state.bn_state,
                                  jnp.asarray(feats), train=False)
        _, paths = viterbi_decode(chain[:, :t_out], lt, spdf, li, lf)
        hyps.append(path_to_phones(np.asarray(paths[0]), bundle.num_phones))
        refs.append(list(utt.phones))
    return score_corpus(refs, hyps)


def forward_corpus(
    bundle_or_cfg,
    model_cfg,
    state: TrainState,
    utts,
    bucket: int = 64,
    batch_size: int = 16,
    ivectors=None,
):
    """Batched acoustic forward of whole utterances on TPU.

    Utterances are bucketed by padded output length (few jit shapes) and
    stacked into [B, T_in, F] batches — the eval-set-scale replacement for
    the per-utterance Python loop (`nnet3-compute`'s batched analogue).
    ``ivectors``: per-utterance [D] vectors (zeros if omitted and the model
    takes them).  Returns per-utterance [T_out, P] log-output arrays
    (chain head).
    """
    from tdnnf_nas_tpu.models import apply_model
    import jax
    import jax.numpy as jnp

    left, right = model_context(model_cfg)
    fs = model_cfg.frame_subsampling_factor

    # params/bn_state as jit ARGUMENTS, not closure constants: closed-over
    # device arrays are baked into the lowered HLO as constants, and at
    # flagship scale (~19M params = 75 MB) that makes every (bucket, batch)
    # shape variant re-serialize and re-compile a constant-stuffed program
    # through the remote compile service — minutes per shape, and observed
    # to wedge it entirely on the LHUC path
    @jax.jit
    def fwd(params, bn_state, feats, ivectors):
        chain, _, _ = apply_model(model_cfg, params, bn_state,
                                  feats, ivectors, train=False)
        return chain

    buckets = {}
    for i, utt in enumerate(utts):
        t_out = len(utt.pdf_align) if utt.pdf_align is not None else (
            utt.feats.shape[0] // fs)
        t_pad = ((t_out + bucket - 1) // bucket) * bucket
        buckets.setdefault(t_pad, []).append((i, utt, t_out))

    outs = [None] * len(utts)
    for t_pad, items in sorted(buckets.items()):
        need = left + (t_pad - 1) * fs + 1 + right
        for j in range(0, len(items), batch_size):
            group = items[j: j + batch_size]
            n = len(group)
            feats = np.stack([
                np.concatenate([
                    np.repeat(u.feats[:1], left, 0), u.feats,
                    np.repeat(u.feats[-1:], need, 0)])[:need]
                for _, u, _ in group])
            if ivectors is not None:
                iv = np.stack([np.asarray(ivectors[i], np.float32)
                               for i, _, _ in group])
            else:
                iv = (np.zeros((n, model_cfg.ivector_dim), np.float32)
                      if model_cfg.ivector_dim else None)
            if n < batch_size:  # pad the tail group: one shape per bucket
                feats = np.concatenate(
                    [feats, np.repeat(feats[:1], batch_size - n, 0)])
                if iv is not None:
                    iv = np.concatenate(
                        [iv, np.repeat(iv[:1], batch_size - n, 0)])
            chain = fwd(state.params, state.bn_state, jnp.asarray(feats),
                        None if iv is None else jnp.asarray(iv))
            chain = np.asarray(chain, np.float32)
            for (i, _, t_out), row in zip(group, chain[:n]):
                outs[i] = row[:t_out]
    return outs


_DECODE_SHARED = None  # (graph, outs, kwargs) for forked decode workers


def _decode_worker(i: int):
    from tdnnf_nas_tpu.decode.beam import beam_decode_sparse

    graph, outs, kw = _DECODE_SHARED
    res = beam_decode_sparse(outs[i], graph, **kw)
    return i, res.words, (res.lattice if kw["lattice"] else None)


def decode_corpus_words(
    bundle_or_cfg,
    model_cfg,
    state: TrainState,
    graph,
    utts,
    acoustic_scale: float = 1.0,
    beam: float = 14.0,
    max_active: int = 7000,
    lattice: bool = False,
    lattice_beam: float = 7.0,
    bucket: int = 64,
    batch_size: int = 16,
    num_workers: int = 0,
    retry_beam: float = 0.0,
    ivectors=None,
) -> dict:
    """Eval-set word decoding: batched TPU forward + sparse beam search +
    WER (the `steps/nnet3/decode.sh` + scoring equivalent over the
    graph_sparse HCLG).  Returns {"wer", "hyps", "lattices"?}.

    ``num_workers`` > 0 fans the per-utterance beam searches out over
    forked host processes (Kaldi's decode.sh --nj split; the TPU forward
    stays batched in the parent — workers touch only numpy).  A died beam
    is re-decoded up to ``retry_beam`` (default 4x ``beam``)."""
    from tdnnf_nas_tpu.decode.beam import beam_decode_sparse
    from tdnnf_nas_tpu.decode.scoring import score_corpus

    outs = forward_corpus(bundle_or_cfg, model_cfg, state, utts,
                          bucket=bucket, batch_size=batch_size,
                          ivectors=ivectors)
    kw = dict(acoustic_scale=acoustic_scale, beam=beam,
              max_active=max_active, lattice=lattice,
              lattice_beam=lattice_beam,
              retry_beam=retry_beam if retry_beam else beam * 4.0)
    if num_workers and len(outs) > 1:
        import multiprocessing as mp

        global _DECODE_SHARED
        _DECODE_SHARED = (graph, outs, kw)
        try:
            ctx = mp.get_context("fork")
            with ctx.Pool(num_workers) as pool:
                results = pool.map(_decode_worker, range(len(outs)),
                                   chunksize=1)
        finally:
            _DECODE_SHARED = None
        results.sort(key=lambda r: r[0])
        hyps = [r[1] for r in results]
        lats = [r[2] for r in results]
    else:
        hyps, lats = [], []
        for obs in outs:
            res = beam_decode_sparse(obs, graph, **kw)
            hyps.append(res.words)
            lats.append(res.lattice if lattice else None)
    refs = [list(u.words) for u in utts]
    rep = score_corpus(refs, hyps)
    rep["hyps"] = hyps
    if lattice:
        rep["lattices"] = lats
    return rep


def run_offset_search_pipeline(
    bundle: DataBundle,
    base_cfg: TdnnfModelConfig,
    max_stride: int = 3,
    pretrain_steps: int = 60,
    cvupdate_steps: int = 40,
    child_steps: int = 60,
    cv_mode: str = SearchMode.GUMBEL,
    batch_size: int = 8,
    chunk_width: int = 20,
    seed: int = 0,
    trainer_kw: Optional[dict] = None,
    child_top_k: int = 1,
):
    """Full two-stage context-offset DARTS (reference steps 6a-6d).

    Returns dict with supernet state, extracted archs, child cfg + state,
    and metric loggers.
    """
    tkw = trainer_kw or {}
    darts_cfg = DartsModelConfig(base=base_cfg, search_offsets=True,
                                 max_stride=max_stride)
    # --- stage A: 95% uniform-sample pretrain (theta only) ---
    pre_cfg = TrainerConfig(
        train_theta=True, train_alpha=False,
        search_mode=SearchMode.UNIFORM, **tkw,
    )
    sup_state, pre_metrics = train_model(
        bundle, darts_cfg, pre_cfg, pretrain_steps, batch_size=batch_size,
        chunk_width=chunk_width, seed=seed, supernet=True,
    )
    # --- stage B: 5% cv alpha-only update, theta + BN frozen ---
    cv_cfg = TrainerConfig(
        train_theta=False, train_alpha=True, bn_frozen=True,
        search_mode=cv_mode, **tkw,
    )
    sup_state, cv_metrics = train_model(
        bundle, darts_cfg, cv_cfg, cvupdate_steps, batch_size=batch_size,
        chunk_width=chunk_width, seed=seed + 1, supernet=True,
        init_state=sup_state, dev=True,
    )
    # --- extraction (beam search over alpha softmax) ---
    archs = extract_offsets(
        np.asarray(sup_state.alphas["offsets_linear"]),
        np.asarray(sup_state.alphas["offsets_affine"]),
        top_k=max(child_top_k, 1),
    )
    results = {
        "supernet_state": sup_state,
        "pretrain_metrics": pre_metrics,
        "cvupdate_metrics": cv_metrics,
        "archs": archs,
        "children": [],
    }
    # --- stage C: child retrain on full data ---
    for pairs, lp in archs[:child_top_k]:
        child_cfg = child_config_from_arch(base_cfg, stride_pairs=pairs)
        child_tr = TrainerConfig(**tkw)
        child_state, child_metrics = train_model(
            bundle, child_cfg, child_tr, child_steps, batch_size=batch_size,
            chunk_width=chunk_width, seed=seed + 2,
        )
        results["children"].append(
            {"cfg": child_cfg, "state": child_state, "metrics": child_metrics,
             "arch_logprob": lp}
        )
    return results


def run_bottleneck_search_pipeline(
    bundle: DataBundle,
    base_cfg: TdnnfModelConfig,
    bottleneck_groups: Tuple[int, ...] = (4, 4, 8),
    fixed_strides: Optional[Tuple[Tuple[int, int], ...]] = None,
    pretrain_steps: int = 60,
    cvupdate_steps: int = 40,
    child_steps: int = 60,
    flops_coef: float = 0.0,
    batch_size: int = 8,
    chunk_width: int = 20,
    seed: int = 0,
    trainer_kw: Optional[dict] = None,
):
    """Bottleneck-dim search (reference steps 7a-7d; stage-8 combo when
    fixed_strides comes from a prior offset search)."""
    tkw = trainer_kw or {}
    strides = fixed_strides or base_cfg.stride_pairs
    darts_cfg = DartsModelConfig(
        base=base_cfg, search_offsets=False, fixed_strides=tuple(strides),
        search_bottleneck=True, bottleneck_groups=tuple(bottleneck_groups),
    )
    pre_cfg = TrainerConfig(train_theta=True, train_alpha=False,
                            search_mode=SearchMode.UNIFORM, **tkw)
    sup_state, pre_metrics = train_model(
        bundle, darts_cfg, pre_cfg, pretrain_steps, batch_size=batch_size,
        chunk_width=chunk_width, seed=seed, supernet=True,
    )
    cv_cfg = TrainerConfig(
        train_theta=False, train_alpha=True, bn_frozen=True,
        search_mode=SearchMode.GUMBEL, flops_coef=flops_coef, **tkw,
    )
    sup_state, cv_metrics = train_model(
        bundle, darts_cfg, cv_cfg, cvupdate_steps, batch_size=batch_size,
        chunk_width=chunk_width, seed=seed + 1, supernet=True,
        init_state=sup_state, dev=True,
    )
    archs = extract_bottlenecks(
        np.asarray(sup_state.alphas["bottleneck"]),
        darts_cfg.bottleneck_candidates, top_k=1,
    )
    dims, lp = archs[0]
    child_cfg = child_config_from_arch(
        base_cfg, stride_pairs=tuple(strides), bottleneck_dims=dims
    )
    child_state, child_metrics = train_model(
        bundle, child_cfg, TrainerConfig(**tkw), child_steps,
        batch_size=batch_size, chunk_width=chunk_width, seed=seed + 2,
    )
    return {
        "supernet_state": sup_state,
        "pretrain_metrics": pre_metrics,
        "cvupdate_metrics": cv_metrics,
        "archs": archs,
        "child_cfg": child_cfg,
        "child_state": child_state,
        "child_metrics": child_metrics,
    }
