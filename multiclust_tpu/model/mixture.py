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
import numpy as np

from multiclust_tpu.model.common import Array, EMConfig, ModelData, Params, \
    safe_log
from multiclust_tpu.ops import df64
from multiclust_tpu.ops.simplex import project_rows


def _mask_scores(s: Array, params: Params) -> Array:
    """Dynamic-K lattices (Params.kmask): padded cluster lanes carry
    zero eta and safe_log maps that to 0, not -inf, so their scores must
    be forced to -inf for the softmax/logsumexp to ignore them."""
    if params.kmask is None:
        return s
    return jnp.where(params.kmask > 0.5, s, -jnp.inf)


def scores(params: Params, md: ModelData) -> Array:
    """[I, K] per-individual per-cluster log scores."""
    logp = safe_log(params.p, md.mask[None])          # [K, L, M]
    logp2 = logp.reshape(params.K, -1)
    s = md.x2d @ logp2.T                              # MXU
    return _mask_scores(s + safe_log(params.eta)[None, :], params)


def _scores_bi(params: Params, md: ModelData, ploidy: int) -> Array:
    """Biallelic missing-free scores in ONE [I, L] x [L, K] matmul:
    with x1 = ploidy - x0,
        sum_lm x_ilm log p_klm = x0 @ (log p0 - log p1)^T
                                 + ploidy * sum_l log p1_kl
    - half the contraction width and half the genotype stream of the
    generic path.  Requires every (i, l) to carry exactly ``ploidy``
    observed copies (cfg.biallelic and not cfg.has_missing)."""
    logp = safe_log(params.p, md.mask[None])          # [K, L, 2]
    d = (logp[:, :, 0] - logp[:, :, 1]).T             # [L, K]
    base = ploidy * jnp.sum(logp[:, :, 1], axis=1)    # [K]
    x0 = (md.x_bi[0] if md.x_bi is not None
          else md.x[:, :, 0]).astype(md.dtype)
    s = x0 @ d                                        # MXU
    return _mask_scores(s + (base + safe_log(params.eta))[None, :], params)


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


def log_likelihood(params: Params, md: ModelData, cfg: EMConfig = None):
    """df64 logL (logL_mixture) without materializing the posterior."""
    s = (_scores_bi(params, md, cfg.ploidy)
         if cfg is not None and _bi_fast(md, cfg) else scores(params, md))
    _, ll, scale = _posterior_and_ll(s, md.row_valid)
    return ll, scale


def _finish_p(pc: Array, md: ModelData, cfg: EMConfig, dtype) -> Array:
    pc = pc + jnp.where(md.mask[None], jnp.asarray(cfg.p_lower_bound,
                                                   dtype), 0.0)
    tot = jnp.sum(pc, axis=2, keepdims=True)
    p = jnp.where(md.mask[None], pc / tot, 0.0)
    if cfg.do_projection:
        p = project_rows(p, md.mask[None], md.n_alleles[None, :],
                         cfg.p_lower_bound)
    return p


def _finish_eta(v: Array, cfg: EMConfig, kmask=None) -> Array:
    eta = jnp.sum(v, axis=0)
    eta = eta / jnp.sum(eta)
    if cfg.do_projection:
        mask = (kmask > 0.5 if kmask is not None
                else jnp.ones_like(eta, dtype=bool))
        eta = project_rows(eta, mask, eta.shape[0], cfg.eta_lower_bound)
    return eta


def m_step(v: Array, md: ModelData, cfg: EMConfig, kmask=None) -> Params:
    """Parameter update given posteriors (m_step_mixture).  Padded
    cluster rows of p (dynamic-K, v columns exactly zero) become the
    lb-smoothed uniform row - inert, since their scores are masked to
    -inf (_mask_scores)."""
    dtype = v.dtype
    eta = _finish_eta(v, cfg, kmask)
    K = v.shape[1]
    pc = (v.T @ md.x2d).reshape(K, md.L, md.M)        # [K, LM], MXU
    return Params(eta=eta, p=_finish_p(pc, md, cfg, dtype), kmask=kmask)


def _m_step_bi(v: Array, md: ModelData, cfg: EMConfig, kmask=None) -> Params:
    """Biallelic missing-free M-step in ONE matmul: with
    x1 = ploidy - x0, the complement expected counts are
    pc1_kl = ploidy * (sum_i v_ik) - pc0_kl - no second contraction and
    no x1 stream.  Zero rows (mesh padding, masked by row_valid in the
    E-step) contribute to neither side."""
    dtype = v.dtype
    eta = _finish_eta(v, cfg, kmask)
    x0 = (md.x_bi[0] if md.x_bi is not None
          else md.x[:, :, 0]).astype(md.dtype)
    pc0 = v.T @ x0                                    # [K, L], MXU
    vtot = jnp.sum(v, axis=0)                         # [K]
    pc1 = cfg.ploidy * vtot[:, None] - pc0
    pc = jnp.stack([pc0, pc1], axis=-1)               # [K, L, 2]
    return Params(eta=eta, p=_finish_p(pc, md, cfg, dtype), kmask=kmask)


def _bi_fast(md: ModelData, cfg: EMConfig) -> bool:
    """Static gate for the single-matmul biallelic path: every locus has
    exactly 2 valid alleles and every copy is observed, so
    x1 = ploidy - x0 identically (mesh padding rows are excluded by
    row_valid before the M-step)."""
    return (cfg.biallelic and not cfg.has_missing and md.M == 2)


def _kernel_ok(md: ModelData, cfg: EMConfig, params: Params) -> bool:
    """Static gate for the fused Pallas mixture step (ops/kernels.py
    mixture_sweep_resident / mixture_fullstep_biallelic): biallelic
    panels, f32 compute, single device (meshed mixture fits stay on the
    XLA/GSPMD formulation).

    OPT-IN on real hardware (MULTICLUST_MIXTURE_KERNEL=1): the mixture
    step at small K is f32-MXU CONTRACTION-bound - the E contraction
    s = x @ d and M merge B = v^T x both contract over L with the K
    output padded to 128 MXU lanes, ~175us/iter at the bench shape -
    and the XLA formulation (with the x_bi aliases) already sits at that
    roofline (372 Gcells/s measured vs 322 single-pass / 275 two-pass
    kernel; BASELINE.md round-4 decomposition).  The kernels' halved
    genotype traffic cannot pay for their poorer DMA/compute overlap.
    Interpret mode stays on so the CPU parity suite exercises them."""
    import os
    if cfg.use_pallas == "on" and os.environ.get(
            "MULTICLUST_MIXTURE_KERNEL", "0") != "1":
        return False
    if params.kmask is not None:  # dynamic-K: XLA formulation only
        return False
    return (cfg.use_pallas != "off" and cfg.biallelic and md.M == 2
            and params.p.dtype == jnp.float32
            and (cfg.mesh is None or
                 (cfg.data_shards == 1 and cfg.model_shards == 1)))


def _em_step_bi_kernel(params: Params, md: ModelData, cfg: EMConfig):
    """Fused biallelic mixture step: scores/softmax/logL and the count
    merges + p update run in two Pallas passes (ops/kernels.py has the
    pass layout; e_step_mixture em_alg.c:763-897, m_step_mixture
    :907-1011).  Missing-free panels stream x0 alone via the
    x1 = ploidy - x0 fold (_scores_bi/_m_step_bi math); panels WITH
    missing data stream both alleles (the mixture model simply skips
    missing slots).  Parameters stay in the standard [K, L, 2] layout;
    the [Kp, Lp] kernel pads are per-iteration glue (cheap at mixture's
    O(K L) parameter sizes, unlike the admixture chains' p0
    representation).  Returns None when no tile admits (caller falls
    through to XLA)."""
    from multiclust_tpu.model.common import k_padded_size
    from multiclust_tpu.ops.kernels import mixture_fullstep_biallelic, \
        mixture_sweep_resident, pick_layout_mixture, \
        pick_layout_mixture_resident

    K = params.K
    Kp = k_padded_size(K, 32)
    with_x1 = cfg.has_missing
    # prefer the single-pass resident kernel (x read once); fall back to
    # the two-pass split when the [ti, Lp] row block outgrows VMEM
    rti, rIp, rLp = pick_layout_mixture_resident(md.I, Kp, md.L, with_x1)
    if rti:
        ti, tl, Ip, Lp = rti, 0, rIp, rLp
    else:
        ti, tl, Ip, Lp = pick_layout_mixture(md.I, Kp, md.L, with_x1)
    if not ti:
        return None
    f32 = jnp.float32
    dK, dL, dI = Kp - K, Lp - md.L, Ip - md.I

    x0 = md.x_bi[0] if md.x_bi is not None else md.x[:, :, 0]
    x1 = md.x_bi[1] if md.x_bi is not None else md.x[:, :, 1]
    if dI or dL:  # x pads are loop-invariant: XLA hoists them
        x0 = jnp.pad(x0, ((0, dI), (0, dL)))
        x1 = jnp.pad(x1, ((0, dI), (0, dL)))

    lp0 = safe_log(params.p[:, :, 0])                 # [K, L]
    lp1 = safe_log(params.p[:, :, 1])
    log_eta = safe_log(params.eta)                    # [K]
    if with_x1:
        blk0 = jnp.pad(lp0, ((0, dK), (0, dL)))
        blk1 = jnp.pad(lp1, ((0, dK), (0, dL)))
        bias_k = log_eta
    else:
        blk0 = jnp.pad(lp0 - lp1, ((0, dK), (0, dL)))
        blk1 = None
        bias_k = cfg.ploidy * jnp.sum(lp1, axis=1) + log_eta
    # K-pad lanes at -1e30: their softmax mass is exactly zero
    bias = jnp.full((1, Kp), -1e30, f32).at[0, :K].set(bias_k.astype(f32))

    row_valid = md.row_valid
    if dI:
        in_range = jnp.arange(Ip) < md.I
        row_valid = (in_range if row_valid is None
                     else in_range & jnp.pad(row_valid, (0, dI)))

    interpret = cfg.use_pallas == "interpret"
    plb = float(cfg.p_lower_bound)
    if rti:
        v, t, b0, b1 = mixture_sweep_resident(
            blk0, x0, bias, blk1, x1 if with_x1 else None, ti=ti,
            interpret=interpret)
        if row_valid is not None:
            # pad rows carry softmax(bias) posteriors and garbage t;
            # their x rows are zero so B never saw them, but vtot/eta/
            # logL reductions must not
            v = jnp.where(row_valid[:, None], v, 0.0)
            t = jnp.where(row_valid, t, 0.0)
        vsum = jnp.sum(v, axis=0)                     # [Kp], pads zero
        pc0 = b0[:K, :md.L] + plb
        if with_x1:
            pc1 = b1[:K, :md.L] + plb
        else:
            pc1 = cfg.ploidy * vsum[:K, None] - b0[:K, :md.L] + plb
        p0n = pc0 / (pc0 + pc1)
        if cfg.do_projection:
            ub = float(np.float32(1.0) - np.float32(
                max(plb, float(np.finfo(np.float32).eps))))
            p0n = jnp.clip(p0n, plb, ub)
    else:
        v, t, p0n = mixture_fullstep_biallelic(
            blk0, x0, bias, blk1, x1 if with_x1 else None, row_valid,
            ti=ti, tl=tl, plb=plb, ploidy=cfg.ploidy,
            project=cfg.do_projection, interpret=interpret)
        p0n = p0n[:K, :md.L]

    ll = df64.df_sum(t)
    scale = jnp.sqrt(jnp.sum(t * t))
    v = v[:md.I, :K]
    eta = _finish_eta(v, cfg)
    p_new = jnp.stack([p0n, 1.0 - p0n], axis=-1)
    return Params(eta=eta, p=p_new), ll, scale, v


def _em_step_bucketed(params: Params, bd, cfg: EMConfig):
    """Jagged-M mixture EM step over locus buckets (model/bucketed.py,
    round 5): the score contraction sum_lm x_ilm log p_klm and the
    M-step count merge v^T x are both lane-additive over (l, m), so each
    bucket contributes its own term at its own allele ceiling - the
    jagged `uniquealleles` semantics (read_file.c:443-600) without
    M_max padding, for the MIXTURE model (e_step_mixture
    em_alg.c:763-897; m_step_mixture :907-1011)."""
    from multiclust_tpu.model.bucketed import split_params_like

    params = split_params_like(params, bd)
    K = params.p[0].shape[-3]
    s = None
    for md_b, p_b in zip(bd.buckets, params.p):
        logp = safe_log(p_b, md_b.mask[None]).reshape(K, -1)
        s_b = md_b.x2d @ logp.T
        s = s_b if s is None else s + s_b
    s = _mask_scores(s + safe_log(params.eta)[None, :], params)
    v, ll, scale = _posterior_and_ll(s, bd.buckets[0].row_valid)
    dtype = v.dtype
    eta = _finish_eta(v, cfg, params.kmask)
    new_ps = []
    for md_b, p_b in zip(bd.buckets, params.p):
        pc = (v.T @ md_b.x2d).reshape(K, md_b.L, md_b.M)
        new_ps.append(_finish_p(pc, md_b, cfg, dtype))
    return params._replace(eta=eta, p=tuple(new_ps)), ll, scale, v


def log_likelihood_bucketed(params: Params, bd):
    from multiclust_tpu.model.bucketed import split_params_like

    params = split_params_like(params, bd)
    K = params.p[0].shape[-3]
    s = None
    for md_b, p_b in zip(bd.buckets, params.p):
        logp = safe_log(p_b, md_b.mask[None]).reshape(K, -1)
        s_b = md_b.x2d @ logp.T
        s = s_b if s is None else s + s_b
    s = _mask_scores(s + safe_log(params.eta)[None, :], params)
    _, ll, scale = _posterior_and_ll(s, bd.buckets[0].row_valid)
    return ll, scale


def em_step(params: Params, md: ModelData,
            cfg: EMConfig) -> Tuple[Params, df64.DF, Array, Array]:
    """One EM iteration: returns (new params, df64 logL(params), scale, v).

    As in the reference (em_step, em_alg.c:195-207) the returned logL is the
    likelihood of the INPUT parameters ("one step late").
    """
    from multiclust_tpu.model.bucketed import BucketedData
    if isinstance(md, BucketedData):
        return _em_step_bucketed(params, md, cfg)
    if _kernel_ok(md, cfg, params):
        out = _em_step_bi_kernel(params, md, cfg)
        if out is not None:
            return out
    if _bi_fast(md, cfg):
        v, ll, scale = _posterior_and_ll(
            _scores_bi(params, md, cfg.ploidy), md.row_valid)
        return _m_step_bi(v, md, cfg, params.kmask), ll, scale, v
    v, ll, scale = e_step(params, md)
    new = m_step(v, md, cfg, params.kmask)
    return new, ll, scale, v
