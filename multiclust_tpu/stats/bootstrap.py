"""Parametric bootstrap LRT of H0: K=k-1 vs Ha: K=k.

Reference: run_bootstrap (multiclust.c:675-708) + parametric_bootstrap
(bootstrap.c:31-175).  Each replicate simulates data from the H0 MLEs with
per-entry missingness preserved, then refits BOTH models with the full
multi-start procedure; the p-value is the fraction of replicate test
statistics >= the observed one.

Deviations (documented):
* the reference's p-value uses integer division (multiclust.c:703), always
  yielding 0 or 1 - we compute the real fraction;
* replicate generation is device-side with jax.random (threefry keys split
  per replicate) instead of libc rand().

Under the admixture model a copy's allele is marginally distributed as
q_ilm = sum_k eta_ik p_klm, so replicate counts are Multinomial(n_obs_il,
q_il) draws - no per-copy cluster labels needed.  Under the mixture model
the individual's cluster is drawn first (bootstrap.c:138-146), then counts
are Multinomial(n_obs_il, p[k_i, l]).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multiclust_tpu.model.common import ModelData, Params


def _multinomial_counts(key, probs, n_draws, max_draws: int):
    """counts[i, l, m] ~ Multinomial(n_draws[i, l], probs[i, l, :]) via
    per-copy inverse-CDF (matching bootstrap.c:95-120 draw-by-draw)."""
    I, L, M = probs.shape
    cdf = jnp.cumsum(probs, axis=-1)
    cdf = cdf / cdf[..., -1:]
    u = jax.random.uniform(key, (I, L, max_draws), dtype=probs.dtype)
    slot = jnp.sum(u[..., None] > cdf[:, :, None, :], axis=-1)  # [I,L,P]
    slot = jnp.minimum(slot, M - 1)
    valid = jnp.arange(max_draws)[None, None, :] < n_draws[:, :, None]
    onehot = jax.nn.one_hot(slot, M, dtype=probs.dtype)
    return jnp.sum(onehot * valid[..., None], axis=2)


def simulate_replicate(key, params: Params, md: ModelData, ploidy: int,
                       admixture: bool) -> jnp.ndarray:
    """New count tensor from fitted params, preserving md.miss."""
    K = params.K
    p2 = params.p.reshape(K, -1)
    n_obs = ploidy - md.miss
    if admixture:
        eta = params.eta
        if eta.ndim == 1:
            eta = jnp.broadcast_to(eta[None, :], (md.I, K))
        q = (eta @ p2).reshape(md.I, md.L, md.M)
    else:
        kkey, key = jax.random.split(key)
        z = jax.random.categorical(kkey, jnp.log(params.eta), shape=(md.I,))
        q = params.p[z]                                  # [I, L, M]
    q = jnp.where(md.mask[None], q, 0.0)
    counts = _multinomial_counts(key, q, n_obs, ploidy)
    return counts


@dataclasses.dataclass
class BootstrapResult:
    ts_obs: float
    ts_bs: List[float]
    pvalue: float
    null_K: int
    alt_K: int


def run_bootstrap(key, md: ModelData, opt, n_parameters_fn, ts_obs: float,
                  h0_params: Params, ploidy: int,
                  codes_fn: Optional[Callable] = None,
                  log: Optional[Callable] = None) -> BootstrapResult:
    """run_bootstrap (multiclust.c:675-708)."""
    from multiclust_tpu.init.random import codes_from_counts
    from multiclust_tpu.runtime.ksweep import estimate_model

    ntime = 0
    ts_list = []
    for rep in range(opt.n_bootstrap):
        key, ksim, kfit = jax.random.split(key, 3)
        counts = simulate_replicate(ksim, h0_params, md, ploidy,
                                    opt.admixture)
        md_rep = md._replace(x=counts.astype(md.x.dtype),  # keeps storage dtype
                             x_flat=None)
        codes = None
        if opt.admixture:
            codes = jnp.asarray(codes_from_counts(
                np.asarray(counts, dtype=np.int64),
                np.asarray(md.miss, dtype=np.int64), ploidy))
        est = estimate_model(kfit, md_rep, opt, n_parameters_fn,
                             codes=codes, bootstrap=True)
        ts_list.append(est.ts)
        if est.ts >= ts_obs:
            ntime += 1
        if log:
            log(rep, est.ts, ntime)
    return BootstrapResult(
        ts_obs=ts_obs, ts_bs=ts_list,
        pvalue=ntime / opt.n_bootstrap,
        null_K=opt.max_K - 1, alt_K=opt.max_K)
