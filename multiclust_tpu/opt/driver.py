"""Fit drivers: host-orchestrated (reference-faithful) and fully compiled.

The host driver mirrors ``em()`` (em_alg.c:44-90): optional plain warmup
iterations (-i), pre-collection of q-1 secant pairs, then plain or
accelerated iterations until convergence, an iteration cap, or a wall-clock
cap (-t, stop_condition em_alg.c:145-161).  Wall-clock and per-iteration
verbosity are host-side concerns, so this driver steps the jitted state
machine one iteration at a time.

The compiled driver wraps the same step functions in one
``lax.while_loop`` - no host sync per iteration - for benchmarking, vmapped
multi-start batches, and sharded multi-chip execution.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from multiclust_tpu.config import AccelScheme
from multiclust_tpu.model.common import EMConfig, ModelData, Params
from multiclust_tpu.opt import em as em_mod


@dataclasses.dataclass
class FitResult:
    state: em_mod.EMState
    time_stop: bool = False
    seconds: float = 0.0

    @property
    def logL(self) -> float:
        return float(self.state.logL)

    @property
    def converged(self) -> bool:
        return bool(self.state.converged)

    @property
    def n_iter(self) -> int:
        return int(self.state.n_iter)


@functools.lru_cache(maxsize=64)
def _jitted_steps(cfg: EMConfig):
    plain = jax.jit(lambda s, md: em_mod.plain_step(s, md, cfg),
                    donate_argnums=0)
    # check-interval variant for the main loop (warmup keeps plain: the
    # reference's -i warmup iterations are individually stop()-checked)
    plain_chk = jax.jit(lambda s, md: em_mod.plain_macro_step(s, md, cfg),
                        donate_argnums=0)
    collect = jax.jit(lambda s, md: em_mod.two_em_steps(s, md, cfg)[0],
                      donate_argnums=0)
    macro = jax.jit(lambda s, md: em_mod.accel_macro_step(s, md, cfg),
                    donate_argnums=0)
    k1 = jax.jit(lambda p, md: em_mod.fit_k1(p, md, cfg))
    return plain, plain_chk, collect, macro, k1


def fit(params0: Params, md: ModelData, cfg: EMConfig, *,
        n_seconds: float = 0.0,
        start_time: Optional[float] = None,
        trace: Optional[Callable] = None) -> FitResult:
    """Run one EM chain to convergence, host-orchestrated."""
    plain, plain_chk, collect, macro, k1 = _jitted_steps(cfg)
    t0 = time.time() if start_time is None else start_time
    md = md.prepare_for_em(bi=cfg.bi_repr_active or cfg.biallelic)  # hoist x aliases once

    if params0.K == 1:
        state = k1(params0, md)
        return FitResult(state=state, seconds=time.time() - t0)

    # the state is donated across iterations; copy so the caller's params
    # survive (they may seed several fits)
    params0 = jax.tree_util.tree_map(jnp.copy, params0)
    state = em_mod.init_state(params0, cfg)
    accel = cfg.accel_scheme != int(AccelScheme.NONE)

    def timed_out() -> bool:
        if not n_seconds:
            return False
        # clock decisions gate the next (possibly collective-
        # participating) jit call: sync across processes so a meshed
        # multi-host -t fit cannot hang on divergent clocks
        from multiclust_tpu.runtime.mesh import sync_host_flag
        return sync_host_flag((time.time() - t0) > n_seconds)

    # warmup (em_alg.c:61-64)
    for _ in range(cfg.n_init_iter):
        if bool(state.stopped) or timed_out():
            break
        state = plain(state, md)
        if trace:
            trace(state, kind="EM")

    time_stop = False
    if accel:
        # collect all but the last secant condition (em_alg.c:69-74)
        for _ in range(cfg.q - 1):
            if bool(state.stopped) or timed_out():
                break
            state = collect(state, md)
            if trace:
                trace(state, kind="EM")

    step = macro if accel else plain_chk
    while not bool(state.stopped):
        if timed_out():
            time_stop = True
            break
        state = step(state, md)
        if trace:
            trace(state, kind=cfg_label(cfg, bool(state.accel_step)))

    return FitResult(state=state, time_stop=time_stop,
                     seconds=time.time() - t0)


def cfg_label(cfg: EMConfig, accel_step: bool) -> str:
    if not accel_step:
        return "EM"
    return {1: "S1", 2: "S2", 3: "S3", 4: f"Q{cfg.q}"}.get(
        int(cfg.accel_scheme), "EM")


# ---------------------------------------------------------------------------
# compiled whole-fit (throughput path)

def make_compiled_fit(cfg: EMConfig, max_iter_cap: int = 100_000):
    """Build fit_fn(params0, md) -> EMState as one compiled while_loop.

    Wall-clock stopping is unavailable here; ``max_iter_cap`` bounds the
    loop when cfg.max_iter is 0 (the reference's "unlimited").
    """
    accel = cfg.accel_scheme != int(AccelScheme.NONE)
    cap = cfg.max_iter if cfg.max_iter else max_iter_cap

    def fit_fn(params0: Params, md: ModelData) -> em_mod.EMState:
        md = md.prepare_for_em(bi=cfg.bi_repr_active or cfg.biallelic)  # hoist x aliases
        state = em_mod.init_state(params0, cfg)

        if cfg.n_init_iter:
            def wcond(s):
                return jnp.any((s.n_iter < cfg.n_init_iter) & ~s.stopped)

            state = jax.lax.while_loop(
                wcond, lambda s: em_mod.plain_step(s, md, cfg), state)

        if accel and cfg.q > 1:
            for _ in range(cfg.q - 1):
                state = em_mod.two_em_steps(state, md, cfg)[0]

        body = (em_mod.accel_macro_step if accel
                else em_mod.plain_macro_step)

        def cond(s):
            return jnp.any(~s.stopped & (s.n_iter < cap))

        return jax.lax.while_loop(cond, lambda s: body(s, md, cfg), state)

    return fit_fn
