"""Feature-space transforms for the GMM ladder: splicing, LDA, MLLT
(global semi-tied covariance), and per-speaker fMLLR (CMLLR).

Equivalents of the reference's `run.sh` tri3 (LDA+MLLT,
steps/train_lda_mllt.sh) and tri4 (SAT/fMLLR, steps/train_sat.sh +
steps/align_fmllr.sh used by `Prepare_NAS_data.sh:66-75`).  All standard
estimation formulas (Gales 1998 for fMLLR; Gopinath 1998 for MLLT),
host-side numpy — these run once per corpus at bootstrap time.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def splice_frames(feats: np.ndarray, context: int = 3) -> np.ndarray:
    """[T, D] -> [T, D*(2*context+1)] with edge replication."""
    t = feats.shape[0]
    cols = []
    for off in range(-context, context + 1):
        idx = np.clip(np.arange(t) + off, 0, t - 1)
        cols.append(feats[idx])
    return np.concatenate(cols, axis=1)


def _class_stats(
    feats_list: Sequence[np.ndarray],
    class_ids_list: Sequence[np.ndarray],
    num_classes: int,
):
    """Per-class (count, sum, raw scatter) + global versions."""
    d = feats_list[0].shape[1]
    counts = np.zeros((num_classes,))
    sums = np.zeros((num_classes, d))
    scatter = np.zeros((d, d))
    for x, c in zip(feats_list, class_ids_list):
        np.add.at(counts, c, 1.0)
        np.add.at(sums, c, x)
        scatter += x.T @ x
    return counts, sums, scatter


def estimate_lda(
    feats_list: Sequence[np.ndarray],
    class_ids_list: Sequence[np.ndarray],
    num_classes: int,
    out_dim: int,
) -> np.ndarray:
    """LDA transform [out_dim, D] from per-frame class labels (classes =
    aligned GMM-HMM states, as in Kaldi's acc-lda over alignments).

    Rows are scaled so the projected within-class covariance is identity
    (Kaldi's lda-est default), which is what the diagonal GMMs built on
    top of the projection want.
    """
    counts, sums, total_scatter = _class_stats(feats_list, class_ids_list,
                                               num_classes)
    n = counts.sum()
    mean = sums.sum(axis=0) / n
    # between-class scatter
    nz = counts > 0
    mu_c = sums[nz] / counts[nz][:, None]
    diff = mu_c - mean
    sb = (counts[nz][:, None] * diff).T @ diff / n
    st = total_scatter / n - np.outer(mean, mean)
    sw = st - sb
    sw += 1e-5 * np.trace(sw) / sw.shape[0] * np.eye(sw.shape[0])
    # solve the generalized eigenproblem via the symmetric whitening trick
    evals_w, evecs_w = np.linalg.eigh(sw)
    w_inv_half = evecs_w @ np.diag(1.0 / np.sqrt(np.maximum(evals_w, 1e-10))) \
        @ evecs_w.T
    m = w_inv_half @ sb @ w_inv_half
    evals, evecs = np.linalg.eigh(m)
    order = np.argsort(evals)[::-1][:out_dim]
    # rows: top directions in whitened space, mapped back
    return (evecs[:, order].T @ w_inv_half).astype(np.float64)


def _gmm_state_stats(
    feats_list: Sequence[np.ndarray],
    class_ids_list: Sequence[np.ndarray],
    num_classes: int,
):
    """Per-class count/mean/diag-var (single-Gaussian per class)."""
    d = feats_list[0].shape[1]
    counts = np.zeros((num_classes,))
    sums = np.zeros((num_classes, d))
    sqs = np.zeros((num_classes, d))
    for x, c in zip(feats_list, class_ids_list):
        np.add.at(counts, c, 1.0)
        np.add.at(sums, c, x)
        np.add.at(sqs, c, x**2)
    nz = counts > 0
    means = np.zeros_like(sums)
    variances = np.ones_like(sqs)
    means[nz] = sums[nz] / counts[nz][:, None]
    variances[nz] = np.maximum(sqs[nz] / counts[nz][:, None] - means[nz]**2,
                               1e-4)
    return counts, means, variances


def estimate_mllt(
    feats_list: Sequence[np.ndarray],
    class_ids_list: Sequence[np.ndarray],
    num_classes: int,
    num_iters: int = 10,
) -> Tuple[np.ndarray, List[float]]:
    """Global MLLT / semi-tied covariance transform M [D, D].

    Maximizes sum_c gamma_c * (log|det M| - 0.5 log diag(M S_c M^T))
    with the classic row-wise cofactor update (Gopinath 1998; Kaldi
    est-mllt).  Classes are aligned HMM states.  Returns (M, auxiliary
    objective per iteration — non-decreasing).
    """
    d = feats_list[0].shape[1]
    counts, means, _ = _gmm_state_stats(feats_list, class_ids_list,
                                        num_classes)
    # per-class centered scatter S_c (full), weighted
    s_c = np.zeros((num_classes, d, d))
    for x, c in zip(feats_list, class_ids_list):
        xc = x - means[c]
        for cls in np.unique(c):
            sel = xc[c == cls]
            s_c[cls] += sel.T @ sel
    nz = counts > 0
    s_c[nz] /= counts[nz][:, None, None]
    beta = counts.sum()

    m = np.eye(d)
    aux_hist: List[float] = []

    def aux(m):
        val = beta * np.linalg.slogdet(m)[1]
        for cls in np.nonzero(nz)[0]:
            diag = np.einsum("ij,jk,ik->i", m, s_c[cls], m)
            val -= 0.5 * counts[cls] * np.log(np.maximum(diag, 1e-10)).sum()
        return float(val)

    for _ in range(num_iters):
        # G_i = sum_c gamma_c S_c / sigma2_{c,i}  with sigma2 = (M S_c M^T)_ii
        g = np.zeros((d, d, d))
        for cls in np.nonzero(nz)[0]:
            diag = np.einsum("ij,jk,ik->i", m, s_c[cls], m)
            g += (counts[cls] / np.maximum(diag, 1e-10))[:, None, None] \
                * s_c[cls][None]
        for i in range(d):
            cof = np.linalg.inv(m).T[i] * np.linalg.det(m)  # cofactor row
            gi_inv = np.linalg.inv(g[i] + 1e-8 * np.eye(d))
            scale = np.sqrt(beta / max(cof @ gi_inv @ cof, 1e-20))
            m[i] = scale * (cof @ gi_inv)
        aux_hist.append(aux(m))
    # normalize overall scale (Kaldi leaves det free; keep det>0 for sanity)
    if np.linalg.det(m) < 0:
        m[0] = -m[0]
    return m, aux_hist


def estimate_fmllr(
    feats_list: Sequence[np.ndarray],  # one speaker's utterances
    post_means: Sequence[np.ndarray],  # [T, D] per-frame Gaussian mean
    post_invvars: Sequence[np.ndarray],  # [T, D] per-frame inverse variance
    num_iters: int = 5,
) -> np.ndarray:
    """Per-speaker fMLLR (CMLLR) transform W = [A b] ([D, D+1]).

    Maximizes the auxiliary Q(W) = beta log|det A| - 0.5 sum_t
    (W x+_t - mu_t)^T Sigma_t^{-1} (W x+_t - mu_t) with the standard
    row-wise iterative update (Gales 1998 §3; Kaldi fmllr-diag-gmm).
    Inputs are the per-frame aligned Gaussian's mean/inv-var (hard
    alignment posterior = 1, matching align_fmllr.sh usage).
    """
    d = post_means[0].shape[1]
    k = np.zeros((d, d + 1))
    g = np.zeros((d, d + 1, d + 1))
    beta = 0.0
    for x, mu, iv in zip(feats_list, post_means, post_invvars):
        t = x.shape[0]
        xp = np.concatenate([x, np.ones((t, 1))], axis=1)  # [T, D+1]
        beta += t
        k += (mu * iv).T @ xp
        # G_i = xp^T diag(iv_i) xp for all i as ONE [D,T]x[T,(D+1)^2]
        # BLAS call (the per-dimension loop dominated SAT estimation)
        xsq = (xp[:, :, None] * xp[:, None, :]).reshape(t, (d + 1) ** 2)
        g += (iv.T @ xsq).reshape(d, d + 1, d + 1)
    w = np.concatenate([np.eye(d), np.zeros((d, 1))], axis=1)
    gi_inv = [np.linalg.inv(g[i] + 1e-6 * np.eye(d + 1)) for i in range(d)]
    for _ in range(num_iters):
        for i in range(d):
            a = w[:, :d]
            cof = np.concatenate([np.linalg.inv(a).T[i] * np.linalg.det(a),
                                  [0.0]])
            # stationary point: w_i = (alpha*cof + k_i) G_i^{-1} with alpha
            # from qa*alpha^2 + qb*alpha - beta = 0 (alpha = beta/det A)
            p = gi_inv[i] @ cof
            qa = cof @ p
            qb = k[i] @ p
            disc = qb * qb + 4.0 * qa * beta
            if qa <= 0 or disc <= 0:
                continue
            alpha = (-qb + np.sqrt(disc)) / (2.0 * qa)
            w[i] = (alpha * cof + k[i]) @ gi_inv[i]
    return w


def apply_fmllr(feats: np.ndarray, w: np.ndarray) -> np.ndarray:
    """[T, D] x W [D, D+1] -> [T, D]."""
    return feats @ w[:, :-1].T + w[:, -1]


def fmllr_auxf(
    feats_list: Sequence[np.ndarray],
    post_means: Sequence[np.ndarray],
    post_invvars: Sequence[np.ndarray],
    w: np.ndarray,
) -> float:
    """Per-frame fMLLR auxiliary objective (for tests/diagnostics)."""
    d = w.shape[0]
    total, frames = 0.0, 0
    logdet = np.linalg.slogdet(w[:, :d])[1]
    for x, mu, iv in zip(feats_list, post_means, post_invvars):
        y = apply_fmllr(x, w)
        total += x.shape[0] * logdet - 0.5 * float(((y - mu) ** 2 * iv).sum())
        frames += x.shape[0]
    return total / max(frames, 1)
