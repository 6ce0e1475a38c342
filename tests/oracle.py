"""NumPy float64 oracle of the reference's E/M math on the dense layout.

Direct transliterations of the loops in em_alg.c / log_likelihood.c onto the
padded (counts, miss, mask) representation, used to certify the fused TPU
formulations.  Intentionally slow and explicit.
"""

from __future__ import annotations

import numpy as np

from multiclust_tpu.ops.simplex import michelot_reference


def mixture_e_step(eta, p, counts, mask):
    """e_step_mixture (em_alg.c:763-897): returns (v[I,K], logL)."""
    I, L, M = counts.shape
    K = eta.shape[0]
    v = np.zeros((I, K))
    logL = 0.0
    log_eta = np.log(eta)
    for i in range(I):
        for k in range(K):
            acc = log_eta[k]
            for l in range(L):
                for m in range(M):
                    if mask[l, m] and counts[i, l, m] and p[k, l, m] != 0.0:
                        acc += counts[i, l, m] * np.log(p[k, l, m])
            v[i, k] = acc
        mx = v[i].max()
        e = np.exp(v[i] - mx)
        tot = e.sum()
        v[i] = e / tot
        logL += np.log(tot) + mx
    return v, logL


def mixture_m_step(v, counts, mask, p_lower_bound, eta_lower_bound,
                   do_projection=True):
    """m_step_mixture (em_alg.c:907-1011)."""
    I, L, M = counts.shape
    K = v.shape[1]
    eta = v.sum(axis=0)
    eta = eta / eta.sum()
    if do_projection:
        eta = michelot_reference(eta, eta_lower_bound)
    p = np.zeros((K, L, M))
    for k in range(K):
        for l in range(L):
            tot = 0.0
            for m in range(M):
                if mask[l, m]:
                    p[k, l, m] = p_lower_bound + (v[:, k] * counts[:, l, m]).sum()
                    tot += p[k, l, m]
            for m in range(M):
                if mask[l, m]:
                    p[k, l, m] /= tot
            if do_projection:
                valid = mask[l]
                p[k, l, valid] = michelot_reference(p[k, l, valid],
                                                    p_lower_bound)
    return eta, p


def admixture_e_step(eta, p, counts, miss, mask):
    """e_step_admixture_orig (em_alg.c:291-486): returns (d[I,K,L,M], logL).

    eta is [I,K] or [K] (constrained)."""
    I, L, M = counts.shape
    K = p.shape[0]
    if eta.ndim == 1:
        eta = np.broadcast_to(eta[None, :], (I, K))
    d = np.zeros((I, K, L, M))
    logL = 0.0
    for i in range(I):
        for l in range(L):
            for m in range(M):
                if not mask[l, m] or counts[i, l, m] == 0:
                    continue
                terms = eta[i] * p[:, l, m]
                tot = terms.sum()
                d[i, :, l, m] = counts[i, l, m] * terms / tot
                logL += counts[i, l, m] * np.log(tot)
            if miss[i, l] > 0:
                for m in range(M):
                    if mask[l, m]:
                        d[i, :, l, m] += eta[i] * p[:, l, m] * miss[i, l]
    return d, logL


def admixture_m_step(d, counts, miss, mask, eta_constrained,
                     eta_lower_bound, p_lower_bound, do_projection=True):
    """m_step_admixture_orig (em_alg.c:592-754)."""
    I, K, L, M = d.shape
    if eta_constrained:
        eta = np.zeros(K)
        for k in range(K):
            eta[k] = d[:, k][:, mask].sum()
        eta = eta / eta.sum()
        if do_projection:
            eta = michelot_reference(eta, eta_lower_bound)
    else:
        eta = np.zeros((I, K))
        for i in range(I):
            for k in range(K):
                eta[i, k] = d[i, k][mask].sum()
            eta[i] /= eta[i].sum()
            if do_projection:
                eta[i] = michelot_reference(eta[i], eta_lower_bound)
    p = np.zeros((K, L, M))
    for k in range(K):
        for l in range(L):
            tot = 0.0
            for m in range(M):
                if mask[l, m]:
                    p[k, l, m] = d[:, k, l, m].sum()
                    tot += p[k, l, m]
            for m in range(M):
                if mask[l, m]:
                    p[k, l, m] /= tot
            if do_projection:
                valid = mask[l]
                p[k, l, valid] = michelot_reference(p[k, l, valid],
                                                    p_lower_bound)
    return eta, p


def admixture_log_likelihood(eta, p, counts, mask):
    """logL_admixture (log_likelihood.c:96-147)."""
    I, L, M = counts.shape
    K = p.shape[0]
    if eta.ndim == 1:
        eta = np.broadcast_to(eta[None, :], (I, K))
    logL = 0.0
    for i in range(I):
        for l in range(L):
            for m in range(M):
                if mask[l, m] and counts[i, l, m]:
                    logL += counts[i, l, m] * np.log(
                        (eta[i] * p[:, l, m]).sum())
    return logL
