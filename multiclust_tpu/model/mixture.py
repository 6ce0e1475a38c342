"""Mixture model: each individual drawn wholly from one cluster.

Likelihood (logL_mixture, log_likelihood.c:157-232):
    L_i = sum_k eta_k * prod_{l,m} p_klm^{x_ilm}

TPU formulation: the per-(i,k) log score
    score_ik = log eta_k + sum_{l,m} x_ilm log p_klm
is one [I, LM] x [LM, K] matmul on the MXU, replacing the reference's
quadruple loop (e_step_mixture, em_alg.c:763-897).  The E-step posterior is a
row softmax of the scores; its logsumexp accumulates the log likelihood.

M-step (m_step_mixture, em_alg.c:907-1011) parity notes:
* eta_k = sum_i v_ik / I, then optional simplex projection;
* p_klm starts from ``p_lower_bound`` (NOT zero - asymmetric with the
  admixture M-step, em_alg.c:972 vs :713) before adding expected counts
  v^T x, then per-(k,l) normalization over valid lanes and projection.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from multiclust_tpu.model.common import Array, EMConfig, ModelData, Params, \
    safe_log
from multiclust_tpu.ops import df64
from multiclust_tpu.ops.simplex import project_rows


def scores(params: Params, md: ModelData) -> Array:
    """[I, K] per-individual per-cluster log scores."""
    logp = safe_log(params.p, md.mask[None])          # [K, L, M]
    logp2 = logp.reshape(params.K, -1)
    s = md.x2d @ logp2.T                              # MXU
    return s + safe_log(params.eta)[None, :]


def _posterior_and_ll(s: Array, row_valid=None):
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    tot = jnp.sum(e, axis=1, keepdims=True)
    v = e / tot
    per_i = jnp.log(tot[:, 0]) + m[:, 0]              # [I]
    if row_valid is not None:
        v = jnp.where(row_valid[:, None], v, 0.0)
        per_i = jnp.where(row_valid, per_i, 0.0)
    ll = df64.df_sum(per_i)
    # f32 elementwise-rounding noise scale for convergence floors: the terms
    # all share sign, so sum|per_i| ~ |logL|; use the RMS-based estimate.
    scale = jnp.sqrt(jnp.sum(per_i * per_i))
    return v, ll, scale


def e_step(params: Params, md: ModelData):
    """Posterior v[I,K] plus df64 log likelihood of the input params."""
    return _posterior_and_ll(scores(params, md), md.row_valid)


def log_likelihood(params: Params, md: ModelData):
    """df64 logL (logL_mixture) without materializing the posterior."""
    _, ll, scale = _posterior_and_ll(scores(params, md), md.row_valid)
    return ll, scale


def m_step(v: Array, md: ModelData, cfg: EMConfig) -> Params:
    """Parameter update given posteriors (m_step_mixture)."""
    dtype = v.dtype
    eta = jnp.sum(v, axis=0)
    eta = eta / jnp.sum(eta)
    if cfg.do_projection:
        eta = project_rows(eta, jnp.ones_like(eta, dtype=bool),
                           eta.shape[0], cfg.eta_lower_bound)

    K = v.shape[1]
    mask2 = md.mask.reshape(-1)                       # [LM]
    pc = v.T @ md.x2d                                 # [K, LM], MXU
    pc = pc + jnp.where(mask2, jnp.asarray(cfg.p_lower_bound, dtype), 0.0)
    pc = pc.reshape(K, md.L, md.M)
    tot = jnp.sum(pc, axis=2, keepdims=True)
    p = jnp.where(md.mask[None], pc / tot, 0.0)
    if cfg.do_projection:
        p = project_rows(p, md.mask[None], md.n_alleles[None, :],
                         cfg.p_lower_bound)
    return Params(eta=eta, p=p)


def em_step(params: Params, md: ModelData,
            cfg: EMConfig) -> Tuple[Params, df64.DF, Array, Array]:
    """One EM iteration: returns (new params, df64 logL(params), scale, v).

    As in the reference (em_step, em_alg.c:195-207) the returned logL is the
    likelihood of the INPUT parameters ("one step late").
    """
    v, ll, scale = e_step(params, md)
    new = m_step(v, md, cfg)
    return new, ll, scale, v
