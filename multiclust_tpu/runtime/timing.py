"""Repeat-timing harness (-w): timed_model_estimation
(multiclust.c:201-347).

Repeats the whole model-estimation process at least n times / at least t
seconds / at most m seconds and reports mean +/- sd of wall-clock, logL,
iterations, initializations, and AIC/BIC-chosen K.  This is the reference's
benchmarking entry point and doubles as ours.
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Callable, List, Optional

import jax

from multiclust_tpu.config import Options
from multiclust_tpu.runtime.ksweep import estimate_model


@dataclasses.dataclass
class TimingStats:
    n_repeats: int = 0
    converged_repeats: int = 0
    target_reached: int = 0
    total_seconds: float = 0.0
    max_ll: float = -float("inf")
    first_ll: float = -float("inf")
    first_hit_index: int = 0
    min_aic: float = 0.0
    min_bic: float = 0.0
    max_ar: float = -1.0
    max_ll_rand: float = 0.0
    lls: List[float] = dataclasses.field(default_factory=list)
    inits: List[int] = dataclasses.field(default_factory=list)
    iters: List[int] = dataclasses.field(default_factory=list)
    aic_Ks: List[int] = dataclasses.field(default_factory=list)
    bic_Ks: List[int] = dataclasses.field(default_factory=list)
    ars: List[float] = dataclasses.field(default_factory=list)

    @staticmethod
    def _mean_sd(vals):
        n = len(vals)
        if not n:
            return 0.0, 0.0
        mean = sum(vals) / n
        if n < 2:
            return mean, 0.0
        var = sum((v - mean) ** 2 for v in vals) / (n - 1)
        return mean, math.sqrt(max(var, 0.0))


def timed_model_estimation(key, md, ds, opt: Options, n_parameters_fn,
                           codes=None, warm=None, true_partition=None,
                           emit: Optional[Callable[[str], None]] = None,
                           score_fn: Optional[Callable] = None
                           ) -> TimingStats:
    """``score_fn(mres) -> arand`` replaces the in-engine -A scoring for
    multi-process runs (runtime/ingest.score_arand_distributed: the
    contingency tables allgather-sum; the engine's own scorer needs
    host-global arrays)."""
    emit = emit or (lambda s: print(s))
    st = TimingStats()
    start = time.time()
    enough_time = not opt.repeat_seconds

    while st.n_repeats < opt.n_repeat or not enough_time:
        key, sub = jax.random.split(key)
        est = estimate_model(sub, md, opt, n_parameters_fn, codes=codes,
                             warm=warm, true_partition=true_partition)
        res = est.last
        if score_fn is not None and res.best_params is not None:
            res.arand = score_fn(res)
        if res.max_logL > st.max_ll:
            st.max_ll = res.max_logL
            st.min_aic = res.aic
            st.min_bic = res.bic
            st.max_ll_rand = res.arand
            if abs(res.max_logL - st.first_ll) > (opt.abs_error or 1e-15):
                st.first_ll = res.max_logL
                st.first_hit_index = st.n_repeats
        st.max_ar = max(st.max_ar, res.arand)
        st.lls.append(res.max_logL)
        st.inits.append(res.n_init)
        st.iters.append(res.n_total_iter)
        st.aic_Ks.append(est.aic_K)
        st.bic_Ks.append(est.bic_K)
        if opt.afile:
            st.ars.append(res.arand)
        st.n_repeats += 1
        if res.ever_converged:
            st.converged_repeats += 1
        if res.n_targetll_times:
            st.target_reached += 1

        esec = time.time() - start
        st.total_seconds = esec
        if not enough_time or opt.max_repeat_seconds:
            # -w t/m clock decisions gate whole estimate_model rounds
            # (collective-participating under --mesh): sync them across
            # processes (runtime/mesh.sync_host_flag)
            from multiclust_tpu.runtime.mesh import sync_host_flag
            if not enough_time and sync_host_flag(
                    esec > opt.repeat_seconds):
                enough_time = True
            if opt.max_repeat_seconds and sync_host_flag(
                    esec > opt.max_repeat_seconds):
                break

    n = st.n_repeats
    model = ("admix constrained" if opt.admixture and opt.eta_constrained
             else "admix" if opt.admixture else "mix")
    emit(f"Data, Method, Model: {opt.filename}, "
         f"{opt.accel_abbreviation}, {model}")
    emit(f"Number of repetitions: {n} of {opt.n_repeat} requested, "
         f"{st.converged_repeats} converged, "
         f"{st.target_reached} reach target")
    emit(f"Average time: {st.total_seconds / max(n, 1):f}s "
         f"(total: {st.total_seconds:f}s)")
    m, s = st._mean_sd(st.lls)
    emit(f"Average log likelihood: {m:f} (+/- {s:f})")
    emit(f"Maximum log likelihood: {st.max_ll:f} first hit at run "
         f"{st.first_hit_index} (AIC {st.min_aic:f}; BIC {st.min_bic:f}; "
         f"RAND: {st.max_ll_rand:f})")
    if opt.max_K != opt.min_K:
        m, s = st._mean_sd(st.aic_Ks)
        emit(f"Average K (AIC): {m:f} (+/- {s:f})")
        m, s = st._mean_sd(st.bic_Ks)
        emit(f"Average K (BIC): {m:f} (+/- {s:f})")
    else:
        emit(f"Total initializations, iterations: {sum(st.inits)}, "
             f"{sum(st.iters)}")
        m, s = st._mean_sd(st.inits)
        emit(f"Average initializations: {m:f} (+/- {s:f})")
        m, s = st._mean_sd(st.iters)
        emit(f"Average iterations: {m:f} (+/- {s:f})")
    return st
