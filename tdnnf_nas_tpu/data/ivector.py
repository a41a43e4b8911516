"""I-vector speaker embeddings: diagonal-UBM + total-variability extractor.

TPU-native equivalent of the reference's i-vector pipeline
(`local/nnet3/run_ivector_common_fbk_40.sh` / upstream
`steps/online/nnet2/{train_diag_ubm,train_ivector_extractor}.sh`): a
diagonal-covariance GMM (UBM) trained with EM, then a total-variability
matrix T trained with the standard i-vector EM, and per-utterance (or
per-speaker) i-vector extraction

    w_hat = (I + sum_m N_m T_m^T Sigma_m^-1 T_m)^-1 sum_m T_m^T Sigma_m^-1 F_m

feeding the acoustic model's `ivectors` input (TdnnfModelConfig.ivector_dim).
All loops are batched jnp (posteriors = one [N,M] log-prob matmul;
per-component solves via vmap'd cholesky), scaled for the small M,D,R this
uses (64-2048 gauss, 40-d feats, 100-d i-vectors).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tdnnf_nas_tpu.core.config import Config


@dataclasses.dataclass(frozen=True)
class UbmConfig(Config):
    num_gauss: int = 64
    em_iters: int = 6
    var_floor: float = 1e-3
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class IvectorConfig(Config):
    dim: int = 100
    em_iters: int = 5
    seed: int = 0


def _log_gauss_post(feats, means, inv_vars, log_w):
    """[N,D] -> responsibilities [N,M] for a diagonal GMM."""
    # log N(x; mu_m, var_m) = -0.5*sum((x-mu)^2/var + log var + log 2pi)
    x2 = feats**2 @ inv_vars.T  # [N,M]
    xm = feats @ (means * inv_vars).T
    m2 = jnp.sum(means**2 * inv_vars, axis=1)
    log_det = jnp.sum(jnp.log(inv_vars), axis=1)
    ll = -0.5 * (x2 - 2 * xm + m2[None, :]) + 0.5 * log_det[None, :] + log_w[None, :]
    return jax.nn.softmax(ll, axis=1)


def _cpu():
    """The host CPU device: UBM/T-matrix EM is small host-side math, and on
    a remote-tunneled accelerator the per-op round trips would dominate by
    orders of magnitude (measured: minutes for a 200-utt extraction)."""
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return jax.devices()[0]


def train_ubm(feats: np.ndarray, cfg: UbmConfig):
    """feats [N, D] pooled training frames -> dict(means, vars, weights)."""
    with jax.default_device(_cpu()):
        return _train_ubm(feats, cfg)


def _train_ubm(feats: np.ndarray, cfg: UbmConfig):
    rng = np.random.RandomState(cfg.seed)
    n, d = feats.shape
    m = cfg.num_gauss
    means = feats[rng.choice(n, m, replace=False)].astype(np.float32)
    variances = np.tile(feats.var(0, keepdims=True) + cfg.var_floor, (m, 1)).astype(np.float32)
    weights = np.full((m,), 1.0 / m, np.float32)
    x = jnp.asarray(feats, jnp.float32)

    @jax.jit
    def em_step(means, variances, weights):
        post = _log_gauss_post(x, means, 1.0 / variances, jnp.log(weights))
        nk = jnp.sum(post, axis=0) + 1e-8  # [M]
        new_means = (post.T @ x) / nk[:, None]
        ex2 = (post.T @ (x * x)) / nk[:, None]
        new_vars = jnp.maximum(ex2 - new_means**2, cfg.var_floor)
        new_w = nk / jnp.sum(nk)
        return new_means, new_vars, new_w

    mj, vj, wj = jnp.asarray(means), jnp.asarray(variances), jnp.asarray(weights)
    for _ in range(cfg.em_iters):
        mj, vj, wj = em_step(mj, vj, wj)
    return {"means": np.asarray(mj), "vars": np.asarray(vj),
            "weights": np.asarray(wj)}


@partial(jax.jit, static_argnames=())
def _utt_stats(feats, mask, means, inv_vars, log_w):
    """Padded [T,D] + [T] mask -> (N [M], F [M,D] centered first-order)."""
    post = _log_gauss_post(feats, means, inv_vars, log_w) * mask[:, None]
    n = jnp.sum(post, axis=0)  # [M]
    f = post.T @ feats - n[:, None] * means  # centered
    return n, f


def _collect_stats(utt_feats: Sequence[np.ndarray], ubm, pad: int = 0):
    """Batched: utterances are padded/stacked and vmapped in groups so the
    whole pass is a handful of dispatches, not one per utterance."""
    means = jnp.asarray(ubm["means"])
    inv_vars = jnp.asarray(1.0 / ubm["vars"])
    log_w = jnp.log(jnp.asarray(ubm["weights"]))
    t_max = max(f.shape[0] for f in utt_feats)
    d = utt_feats[0].shape[1]
    batched = jax.jit(jax.vmap(_utt_stats, in_axes=(0, 0, None, None, None)))
    ns, fs = [], []
    group = 256
    for j in range(0, len(utt_feats), group):
        sel = utt_feats[j: j + group]
        fp = np.zeros((len(sel), t_max, d), np.float32)
        mask = np.zeros((len(sel), t_max), np.float32)
        for i, f in enumerate(sel):
            fp[i, : f.shape[0]] = f
            mask[i, : f.shape[0]] = 1.0
        n_m, f_m = batched(jnp.asarray(fp), jnp.asarray(mask), means,
                           inv_vars, log_w)
        ns.append(np.asarray(n_m))
        fs.append(np.asarray(f_m))
    return np.concatenate(ns), np.concatenate(fs)  # [U,M], [U,M,D]


def train_ivector_extractor(
    utt_feats: Sequence[np.ndarray], ubm, cfg: IvectorConfig
):
    """Returns T [M, D, R] total-variability matrix."""
    with jax.default_device(_cpu()):
        return _train_ivector_extractor(utt_feats, ubm, cfg)


def _train_ivector_extractor(
    utt_feats: Sequence[np.ndarray], ubm, cfg: IvectorConfig
):
    rng = np.random.RandomState(cfg.seed)
    m, d = ubm["means"].shape
    r = cfg.dim
    t_mat = jnp.asarray(rng.randn(m, d, r).astype(np.float32) * 0.1)
    inv_vars = jnp.asarray(1.0 / ubm["vars"])  # [M,D]
    ns, fs = _collect_stats(utt_feats, ubm)
    ns_j, fs_j = jnp.asarray(ns), jnp.asarray(fs)

    @jax.jit
    def e_step(t_mat):
        # per-utterance posterior of w
        tsig = t_mat * inv_vars[:, :, None]  # [M,D,R]

        def per_utt(n_u, f_u):
            # L = I + sum_m n_m T_m^T Sig^-1 T_m
            gram = jnp.einsum("mdr,mds->mrs", tsig, t_mat)  # [M,R,R]
            l_mat = jnp.eye(r) + jnp.einsum("m,mrs->rs", n_u, gram)
            b = jnp.einsum("mdr,md->r", tsig, f_u)
            cov = jnp.linalg.inv(l_mat)
            w = cov @ b
            eww = cov + jnp.outer(w, w)
            return w, eww

        w_all, eww_all = jax.vmap(per_utt)(ns_j, fs_j)
        # M-step accumulators
        acc_fw = jnp.einsum("umd,ur->mdr", fs_j, w_all)  # [M,D,R]
        acc_nw = jnp.einsum("um,urs->mrs", ns_j, eww_all)  # [M,R,R]
        return w_all, acc_fw, acc_nw

    for _ in range(cfg.em_iters):
        _, acc_fw, acc_nw = e_step(t_mat)
        # T_m rows solve: acc_nw_m T_m(d,:)^T = acc_fw_m(d,:)
        sol = jax.vmap(lambda a, b: jnp.linalg.solve(
            a + 1e-4 * jnp.eye(r), b.T).T)(acc_nw, acc_fw)
        t_mat = sol
    return np.asarray(t_mat)


def extract_ivectors(
    utt_feats: Sequence[np.ndarray], ubm, t_mat: np.ndarray
) -> np.ndarray:
    """[U, R] i-vectors."""
    with jax.default_device(_cpu()):
        return _extract_ivectors(utt_feats, ubm, t_mat)


def _extract_ivectors(
    utt_feats: Sequence[np.ndarray], ubm, t_mat: np.ndarray
) -> np.ndarray:
    r = t_mat.shape[-1]
    inv_vars = jnp.asarray(1.0 / ubm["vars"])
    t_j = jnp.asarray(t_mat)
    tsig = t_j * inv_vars[:, :, None]
    ns, fs = _collect_stats(utt_feats, ubm)

    @jax.jit
    def per_utt(n_u, f_u):
        gram = jnp.einsum("mdr,mds->mrs", tsig, t_j)
        l_mat = jnp.eye(r) + jnp.einsum("m,mrs->rs", n_u, gram)
        b = jnp.einsum("mdr,md->r", tsig, f_u)
        return jnp.linalg.solve(l_mat, b)

    return np.asarray(jax.vmap(per_utt)(jnp.asarray(ns), jnp.asarray(fs)))
