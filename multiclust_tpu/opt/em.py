"""EM chain state machine.

Replaces the reference's ``em()`` driver loop (em_alg.c:44-90) and its
stopping logic (``stop`` em_alg.c:101-143, ``stop_condition`` :145-161,
``converged`` :163-182) with pure, jittable, vmap-safe step functions.  The
loop itself lives either in a host-side driver (reference-faithful: per
iteration verbosity, wall-clock caps) or in a single compiled
``lax.while_loop`` (throughput path, runtime/); both consume the functions
here.

vmap-safety: every update is expressed as a masked select on a ``live``
flag so that batched chains (multi-start, bootstrap) can run lockstep with
individually frozen lanes.

Numerical note: logL values are df64 pairs (ops/df64.py).  The convergence
tolerance is floored at ``noise_factor * eps(dtype) * scale`` where scale is
the RMS magnitude of the per-individual logL terms - on f32 TPU the
reference's abs tolerance of 1e-4 can sit below representable precision; on
f64 the floor is negligible and reference semantics are exact.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from multiclust_tpu.config import AccelScheme
from multiclust_tpu.model import admixture, mixture
from multiclust_tpu.model.common import Array, EMConfig, ModelData, Params
from multiclust_tpu.ops import df64

tree_map = jax.tree_util.tree_map


# ---------------------------------------------------------------------------
# pytree vector-space helpers (parameters as flat vectors)

def tree_sub(a: Params, b: Params) -> Params:
    return tree_map(jnp.subtract, a, b)


def tree_vdot(a: Params, b: Params) -> Array:
    """Dot product over every parameter block (step_size sums etaik/etak and
    pklm blocks together, accel_em.c:140-184)."""
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return sum(jnp.vdot(x, y) for x, y in zip(leaves_a, leaves_b))


def tree_axpy(alpha, x: Params, y: Params) -> Params:
    return tree_map(lambda xv, yv: alpha * xv + yv, x, y)


def tree_select(pred: Array, a: Params, b: Params) -> Params:
    return tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


# ---------------------------------------------------------------------------
# state

class AccelRing(NamedTuple):
    """q-deep ring of secant increments (reference u_*/v_* ring buffers,
    multiclust.h:285-293)."""

    u: Params     # leading axis [q]
    v: Params     # leading axis [q]
    pos: Array    # next write slot
    count: Array  # filled slots


class EMState(NamedTuple):
    params: Params
    logL_hi: Array
    logL_lo: Array
    scale: Array          # noise scale of the latest logL
    n_iter: Array
    converged: Array      # bool
    stopped: Array        # bool: converged | iteration cap | failure
    failed: Array         # bool: NaN or fatal monotonicity violation
    mono_viol: Array      # bool: any monotonicity violation observed
    accel_step: Array     # bool: last accepted step was accelerated
    n_accel: Array        # accepted accelerated steps
    ring: Optional[AccelRing]
    # adaptive check-interval (cfg.check_interval == 0): logL-free EM
    # iterations to run before the next stop() check, escalated while the
    # per-iteration logL delta is far above tolerance (plain_macro_step)
    interval: Array = None

    @property
    def logL(self) -> Array:
        return self.logL_hi + self.logL_lo


def _zeros_ring(params: Params, q: int) -> AccelRing:
    z = tree_map(lambda x: jnp.zeros((q,) + x.shape, x.dtype), params)
    return AccelRing(u=z, v=tree_map(jnp.copy, z),
                     pos=jnp.zeros((), jnp.int32),
                     count=jnp.zeros((), jnp.int32))


def init_state(params: Params, cfg: EMConfig) -> EMState:
    dtype = params.p.dtype
    f = functools.partial(jnp.asarray, dtype=dtype)
    b = functools.partial(jnp.zeros, (), jnp.bool_)
    ring = (_zeros_ring(params, cfg.q)
            if cfg.accel_scheme != int(AccelScheme.NONE) else None)
    return EMState(
        params=params, logL_hi=f(-jnp.inf), logL_lo=f(0.0), scale=f(0.0),
        n_iter=jnp.zeros((), jnp.int32), converged=b(), stopped=b(),
        failed=b(), mono_viol=b(), accel_step=b(),
        n_accel=jnp.zeros((), jnp.int32), ring=ring,
        interval=jnp.ones((), jnp.int32))


# ---------------------------------------------------------------------------
# model dispatch

def model_em_step(params: Params, md: ModelData, cfg: EMConfig,
                  want_ll: bool = True):
    if cfg.admixture:
        new, ll, scale = admixture.em_step(params, md, cfg, want_ll)
    else:
        # mixture logL falls out of the E-step's logsumexp for free
        new, ll, scale, _ = mixture.em_step(params, md, cfg)
    return new, ll, scale


def model_log_likelihood(params: Params, md: ModelData, cfg: EMConfig):
    from multiclust_tpu.model.bucketed import BucketedData
    if cfg.admixture:
        from multiclust_tpu.model.common import is_bi_repr
        if isinstance(md, BucketedData):
            return admixture.log_likelihood_bucketed(params, md)
        if cfg.bi_repr_active and is_bi_repr(params):
            return admixture.log_likelihood_bi_repr(params, md)
        return admixture.log_likelihood(params, md)
    if isinstance(md, BucketedData):
        return mixture.log_likelihood_bucketed(params, md)
    return mixture.log_likelihood(params, md, cfg)


# ---------------------------------------------------------------------------
# stopping logic

def _converged(cfg: EMConfig, prev_hi, prev_lo, ll: df64.DF, scale) -> Array:
    """converged() (em_alg.c:163-182) with the f32 noise floor."""
    dtype = ll[0].dtype
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    diff = df64.df_value(df64.df_sub(ll, (prev_hi, prev_lo)))
    abs_diff = jnp.abs(diff)
    finite_prev = jnp.isfinite(prev_hi)
    eff_abs = jnp.maximum(jnp.asarray(cfg.abs_error, dtype),
                          cfg.noise_factor * eps * scale)
    keep = jnp.zeros((), jnp.bool_)
    if cfg.abs_error:
        keep = keep | (abs_diff > eff_abs)
    if cfg.rel_error:
        rel = abs_diff / jnp.abs(df64.df_value((prev_hi, prev_lo)))
        keep = keep | (rel > jnp.asarray(cfg.rel_error, dtype))
    return jnp.where(finite_prev, ~keep, jnp.zeros((), jnp.bool_))


def _apply_stop(state: EMState, new_params: Params, ll: df64.DF, scale,
                cfg: EMConfig, live: Array, accel: Array) -> EMState:
    """stop() bookkeeping (em_alg.c:101-143) for one EM iteration.

    ``live`` masks chains that must not advance (vmap lanes already stopped).
    """
    dtype = ll[0].dtype
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    n_iter = state.n_iter + 1
    # NaN detection must inspect the parameters too: the masked-log guards
    # (safe_log) deliberately zero non-finite contributions, so a poisoned
    # parameter set can otherwise produce a finite-looking logL
    params_ok = jnp.asarray(True)
    for leaf in jax.tree_util.tree_leaves(new_params):
        params_ok = params_ok & jnp.all(jnp.isfinite(leaf))
    nan_fail = ~jnp.isfinite(ll[0]) | ~params_ok

    conv = _converged(cfg, state.logL_hi, state.logL_lo, ll, scale)
    iter_cap = (jnp.asarray(cfg.max_iter > 0)
                & (n_iter > jnp.asarray(max(cfg.max_iter, 1), jnp.int32)))
    stopped = conv | iter_cap | nan_fail

    # monotonicity: any decrease beyond the noise floor while not stopped is
    # a fatal error in the reference (em_alg.c:115-120)
    prev = df64.df_value((state.logL_hi, state.logL_lo))
    floor = cfg.noise_factor * eps * jnp.maximum(scale, state.scale)
    decrease = (df64.df_value(ll) < prev - floor) & jnp.isfinite(prev)
    mono_viol = decrease & ~stopped
    failed = nan_fail
    if cfg.monotonicity == "fatal":
        failed = failed | mono_viol
        stopped = stopped | mono_viol

    sel = lambda a, b: jnp.where(live, a, b)  # noqa: E731
    return EMState(
        params=tree_select(live, new_params, state.params),
        logL_hi=sel(ll[0], state.logL_hi),
        logL_lo=sel(ll[1], state.logL_lo),
        scale=sel(scale, state.scale),
        n_iter=jnp.where(live, n_iter, state.n_iter),
        converged=sel(conv, state.converged),
        stopped=sel(stopped, state.stopped),
        failed=sel(failed, state.failed),
        mono_viol=sel(mono_viol | state.mono_viol, state.mono_viol),
        accel_step=sel(accel, state.accel_step),
        n_accel=state.n_accel,
        ring=state.ring,
        interval=state.interval)


# ---------------------------------------------------------------------------
# plain EM iteration

def plain_step(state: EMState, md: ModelData, cfg: EMConfig) -> EMState:
    """One EM iteration (em_step, em_alg.c:195-207)."""
    live = ~state.stopped
    new_params, ll, scale = model_em_step(state.params, md, cfg)
    return _apply_stop(state, new_params, ll, scale, cfg, live,
                       accel=jnp.zeros((), jnp.bool_))


def blind_plain_steps(state: EMState, md: ModelData, cfg: EMConfig,
                      n) -> EMState:
    """``n`` logL-free EM iterations with NO stop() checks in between
    (check-interval mode, config.Options.check_interval; no reference
    counterpart - the reference evaluates stop() every iteration,
    em_alg.c:101-143).  ``n`` may be a traced scalar (adaptive mode; under
    vmap per-lane bounds batch into a masked while_loop).

    Safe by EM monotonicity: the logL is non-decreasing over any number of
    EM steps, so checking only every N-th iteration can stop LATER than
    per-iteration checking but never prematurely, and converges to the
    same fixed point.  NaN poisoning is still caught: the next checked
    step's _apply_stop inspects the parameters themselves.  Stopped vmap
    lanes stay frozen via the same masked select as plain_step.
    """
    live = ~state.stopped

    def body(_, params):
        new, _, _ = model_em_step(params, md, cfg, want_ll=False)
        return tree_select(live, new, params)

    params = jax.lax.fori_loop(0, n, body, state.params)
    return state._replace(
        params=params,
        n_iter=state.n_iter + jnp.where(live, n, 0).astype(jnp.int32))


# adaptive check-interval tuning (cfg.check_interval == 0): escalate 1 ->
# 2 -> 4 -> ... -> CAP while the average per-iteration logL gain is more
# than ESCALATE x the effective tolerance, reset to 1 otherwise.  EM logL
# deltas decay slowly and smoothly (geometric with ratio near 1), so by
# the time the delta has fallen within ESCALATE x tolerance of the stop
# threshold there are always many interval-1 checks left before
# convergence - the stop iteration matches per-iteration checking.
ADAPTIVE_CAP = 16
ADAPTIVE_ESCALATE = 64.0


def _adapt_interval(state: EMState, prev: df64.DF, prev_finite, live,
                    cfg: EMConfig) -> EMState:
    dtype = state.logL_hi.dtype
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    delta = df64.df_value(df64.df_sub((state.logL_hi, state.logL_lo), prev))
    avg = delta / jnp.maximum(state.interval, 1).astype(dtype)
    eff = jnp.maximum(jnp.asarray(cfg.abs_error, dtype),
                      cfg.noise_factor * eps * state.scale)
    if cfg.rel_error:
        eff = jnp.maximum(eff, jnp.asarray(cfg.rel_error, dtype)
                          * jnp.abs(state.logL_hi))
    fast = (avg > ADAPTIVE_ESCALATE * eff) | ~prev_finite
    new_int = jnp.where(fast, jnp.minimum(state.interval * 2, ADAPTIVE_CAP),
                        1).astype(jnp.int32)
    return state._replace(
        interval=jnp.where(live, new_int, state.interval))


def plain_macro_step(state: EMState, md: ModelData,
                     cfg: EMConfig) -> EMState:
    """One macro plain-EM iteration with ONE stop() evaluation.

    cfg.check_interval semantics: 1 = exactly plain_step (per-iteration
    checking, the reference contract); N > 1 = N-1 logL-free iterations
    (the per-cell logs are the dominant VPU cost at small K, BASELINE.md)
    then a full plain_step; 0 = ADAPTIVE - the blind-run length lives in
    the chain state (state.interval) and is escalated/reset from the
    measured per-iteration logL delta (_adapt_interval)."""
    if cfg.check_interval == 0:
        live = ~state.stopped
        prev = (state.logL_hi, state.logL_lo)
        prev_finite = jnp.isfinite(state.logL_hi)
        state = blind_plain_steps(state, md, cfg, state.interval - 1)
        state = plain_step(state, md, cfg)
        return _adapt_interval(state, prev, prev_finite, live, cfg)
    if cfg.check_interval > 1:
        state = blind_plain_steps(state, md, cfg, cfg.check_interval - 1)
    return plain_step(state, md, cfg)


# ---------------------------------------------------------------------------
# secant collection (em_2_steps, em_alg.c:1072-1211)

def _ring_push(ring: AccelRing, u: Params, v: Params, live: Array,
               q: int) -> AccelRing:
    def write(buf, val):
        updated = tree_map(
            lambda b, x: jax.lax.dynamic_update_index_in_dim(
                b, x, ring.pos, axis=0), buf, val)
        return tree_select(live, updated, buf)
    return AccelRing(
        u=write(ring.u, u), v=write(ring.v, v),
        pos=jnp.where(live, (ring.pos + 1) % q, ring.pos),
        count=jnp.where(live, jnp.minimum(ring.count + 1, q), ring.count))


def two_em_steps(state: EMState, md: ModelData, cfg: EMConfig
                 ) -> Tuple[EMState, Params]:
    """Take two EM steps, record the secant pair u=F(x)-x, v=F(F(x))-F(x).

    Returns the updated state (params = F(F(x)) unless stopped earlier) and
    the base point x for the subsequent accelerated update.
    """
    x0 = state.params
    s1 = plain_step(state, md, cfg)
    u = tree_sub(s1.params, x0)
    s2 = plain_step(s1, md, cfg)
    v = tree_sub(s2.params, s1.params)
    pushed = ~s1.stopped  # second step only counts when the first survived
    ring = _ring_push(s2.ring, u, v, pushed, cfg.q)
    return s2._replace(ring=ring), x0


# ---------------------------------------------------------------------------
# accelerated updates (accel_em.c)

def _slot(ring: AccelRing, q: int, back: int):
    """Fetch the (u, v) pair written `back` pushes ago (1 = newest)."""
    idx = (ring.pos - back) % q
    take = lambda t: tree_map(  # noqa: E731
        lambda b: jax.lax.dynamic_index_in_dim(b, idx, axis=0,
                                               keepdims=False), t)
    return take(ring.u), take(ring.v)


def _newest(ring: AccelRing, q: int):
    return _slot(ring, q, 1)


def step_size(scheme: int, u: Params, v: Params, dtype) -> Array:
    """SQUAREM/QN1 step size (step_size, accel_em.c:130-243)."""
    utu = tree_vdot(u, u)
    vmu = tree_sub(v, u)
    utvu = tree_vdot(u, vmu)
    vutvu = tree_vdot(vmu, vmu)
    if scheme == int(AccelScheme.SQS1):
        s = utu / utvu
    elif scheme == int(AccelScheme.SQS2):
        s = utvu / vutvu
    elif scheme == int(AccelScheme.SQS3):
        s = jnp.where(jnp.sqrt(utu) < 1e-8, jnp.nan,
                      -jnp.sqrt(utu / vutvu))
    elif scheme == int(AccelScheme.QN):
        s = -utu / utvu
    else:
        s = jnp.asarray(-1.0, dtype)
    if scheme < int(AccelScheme.QN):
        s = jnp.minimum(s, jnp.asarray(-1.0, dtype))
    return s.astype(dtype)


def squarem_point(x0: Params, u: Params, v: Params, s: Array) -> Params:
    """x' = x0 - 2 s u + s^2 (v - u)   (accelerated_update,
    accel_em.c:460-466)."""
    return tree_map(lambda x, uu, vv: x - 2.0 * s * uu + s * s * (vv - uu),
                    x0, u, v)


def qn1_point(x0: Params, u: Params, v: Params, s: Array) -> Params:
    """x' = x0 + u + s v   (accelerated_update QN branch,
    accel_em.c:449-454)."""
    return tree_map(lambda x, uu, vv: x + uu + s * vv, x0, u, v)


def _project_params(params: Params, md: ModelData, cfg: EMConfig) -> Params:
    from multiclust_tpu.model.admixture import _k_valid, _project_eta_rows
    from multiclust_tpu.model.common import is_bi_repr
    from multiclust_tpu.ops.simplex import project_rows
    if not cfg.do_projection:
        return params
    eta = _project_eta_rows(params.eta, cfg, params.kmask)
    kdyn = (params.kmask > 0.5 if params.kmask is not None else None)
    if isinstance(params.p, tuple):
        # jagged-M bucketed representation: project each bucket with its
        # own mask/allele counts (model/bucketed.py)
        ps = []
        for md_b, pb in zip(md.buckets, params.p):
            pb = project_rows(pb, md_b.mask[None], md_b.n_alleles[None, :],
                              cfg.p_lower_bound)
            kv = kdyn if kdyn is not None else _k_valid(cfg, pb.shape[0])
            if kv is not None:
                pb = jnp.where(kv[:, None, None], pb, 0.0)
            ps.append(pb)
        return params._replace(eta=eta, p=tuple(ps))
    if cfg.bi_repr_active and is_bi_repr(params):
        # p0-representation: project the implicit (p0, 1-p0) pair - the
        # closed 2-simplex form is clip (ops/simplex.py M=2 branch).
        # Upper bound stays strictly below 1 (largest representable
        # 1-max(lb, ulp)): with the reference's 1e-8 bound, 1-lb rounds
        # to 1.0 in f32 and the implicit complement would become an exact
        # zero probability (see ops/simplex.project_rows).  Padded
        # rows/cols drift to lb but are inert and reset to zero by the
        # next kernel step's p update.
        import numpy as _np
        fi = _np.finfo(_np.asarray(0, params.p.dtype).dtype)
        ub = float(fi.dtype.type(1.0)
                   - fi.dtype.type(max(cfg.p_lower_bound, float(fi.eps))))
        lb = jnp.asarray(cfg.p_lower_bound, params.p.dtype)
        p = jnp.clip(params.p, lb, ub)
        return params._replace(eta=eta, p=p)
    p = project_rows(params.p, md.mask[None], md.n_alleles[None, :],
                     cfg.p_lower_bound)
    kv = kdyn if kdyn is not None else _k_valid(cfg, p.shape[0])
    if kv is not None:
        p = jnp.where(kv[:, None, None], p, 0.0)
    return params._replace(eta=eta, p=p)


def qn_point(x0: Params, ring: AccelRing, cfg: EMConfig) -> Params:
    """Quasi-Newton update with q>1 secants (Zhou/Alexander/Lange 2011;
    qn_accelerated_update, accel_em.c:262-419).

    x' = x0 + u_add + sum_j y_j V_j  with  y = A^{-1} c,
    A[j,n] = <U_j, U_n> - <U_j, V_n>,  c[n] = <u_new, U_n>.

    The V-sum is invariant to the ring's slot permutation, so no rolling is
    needed.  For trajectory parity, ``u_add`` replicates the reference's
    index arithmetic exactly (accel_em.c:267-268, :364-375): the SECOND
    newest u when q > 1, the newest when q = 1.  (Zhou 2011's formula calls
    for the newest in both cases - a likely latent bug in the reference that
    we reproduce deliberately; the guarded accept makes it safe.)
    """
    q = cfg.q
    u_new, _ = _newest(ring, q)
    u_add, _ = _slot(ring, q, 2 if q > 1 else 1)

    def pairdot(a_stack, b_stack):
        # [q, ...] x [q, ...] -> [q, q] summed over all parameter blocks
        la = jax.tree_util.tree_leaves(a_stack)
        lb = jax.tree_util.tree_leaves(b_stack)
        return sum(jnp.tensordot(x.reshape(q, -1), y.reshape(q, -1),
                                 axes=[[1], [1]]) for x, y in zip(la, lb))

    A = pairdot(ring.u, ring.u) - pairdot(ring.u, ring.v)
    la = jax.tree_util.tree_leaves(ring.u)
    ln = jax.tree_util.tree_leaves(u_new)
    c = sum(x.reshape(q, -1) @ y.reshape(-1) for x, y in zip(la, ln))
    y = jnp.linalg.solve(A, c)                       # tiny q x q system

    def upd(x, uu, vv):
        return x + uu + jnp.tensordot(y, vv.reshape(q, -1),
                                      axes=1).reshape(x.shape)
    return tree_map(upd, x0, u_add, ring.v)


def accel_macro_step(state: EMState, md: ModelData,
                     cfg: EMConfig) -> EMState:
    """One accelerated iteration (accelerated_em_step, accel_em.c:35-114):
    two EM steps to collect a secant pair, then a guarded accelerated jump
    with optional Varadhan backtracking, falling back to the EM iterate."""
    scheme = int(cfg.accel_scheme)
    dtype = state.params.p.dtype
    pre_stopped = state.stopped

    state2, x0 = two_em_steps(state, md, cfg)
    live = ~pre_stopped & ~state2.stopped
    x2 = state2.params                                # latest EM iterate

    # log likelihood of the EM iterate (accel_em.c:53)
    emll_df, emll_scale = model_log_likelihood(x2, md, cfg)
    emll = df64.df_value(emll_df)

    u, v = _newest(state2.ring, cfg.q)

    if scheme == int(AccelScheme.QN) and cfg.q > 1:
        xt = _project_params(qn_point(x0, state2.ring, cfg), md, cfg)
        ll_df, ll_scale = model_log_likelihood(xt, md, cfg)
        accept = live & (df64.df_value(ll_df) > emll) \
            & jnp.isfinite(df64.df_value(ll_df))
    else:
        s = step_size(scheme, u, v, dtype)
        s_ok = jnp.isfinite(s)

        def make_point(sv):
            if scheme == int(AccelScheme.QN):
                pt = qn1_point(x0, u, v, sv)
            else:
                pt = squarem_point(x0, u, v, sv)
            return _project_params(pt, md, cfg)

        xt = make_point(s)
        ll_df, ll_scale = model_log_likelihood(xt, md, cfg)

        if cfg.adjust_step > 0:
            # backtracking: s <- (s-1)/2 while the trial underperforms
            # (accel_em.c:76-82)
            def cond(carry):
                n, sv, ll, _, _ = carry
                return jnp.any((n < cfg.adjust_step)
                               & (df64.df_value(ll) < emll) & (sv < -1.0))

            def body(carry):
                n, sv, ll, lsc, pt = carry
                active = ((n < cfg.adjust_step)
                          & (df64.df_value(ll) < emll) & (sv < -1.0))
                sv2 = jnp.where(active, (sv - 1.0) / 2.0, sv)
                pt2 = make_point(sv2)
                ll2, lsc2 = model_log_likelihood(pt2, md, cfg)
                ll_sel = (jnp.where(active, ll2[0], ll[0]),
                          jnp.where(active, ll2[1], ll[1]))
                return (n + 1, sv2, ll_sel,
                        jnp.where(active, lsc2, lsc),
                        tree_select(active, pt2, pt))

            init = (jnp.zeros((), jnp.int32), s, ll_df, ll_scale, xt)
            _, s, ll_df, ll_scale, xt = jax.lax.while_loop(cond, body, init)

        accept = (live & s_ok & (df64.df_value(ll_df) > emll)
                  & jnp.isfinite(df64.df_value(ll_df)))

    # accept the accelerated point or fall back to the EM iterate
    # (accel_em.c:90-113); the accelerated jump itself does not call stop()
    final_params = tree_select(accept, xt, x2)
    out = state2._replace(
        params=final_params,
        accel_step=jnp.where(live, accept, state2.accel_step),
        n_accel=state2.n_accel + jnp.where(accept, 1, 0),
    )
    return out


# ---------------------------------------------------------------------------
# K = 1 closed-form-ish fit (em, em_alg.c:49-58)

def fit_k1(params: Params, md: ModelData, cfg: EMConfig) -> EMState:
    state = init_state(params, cfg)
    new_params, _, _ = model_em_step(params, md, cfg)
    ll, scale = model_log_likelihood(new_params, md, cfg)
    one = jnp.ones((), jnp.bool_)
    return state._replace(
        params=new_params, logL_hi=ll[0], logL_lo=ll[1], scale=scale,
        n_iter=jnp.ones((), jnp.int32), converged=one, stopped=one)
