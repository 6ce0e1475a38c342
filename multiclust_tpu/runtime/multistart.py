"""Multi-start likelihood maximization.

Replaces the reference's serial init loop (maximize_likelihood,
multiclust.c:471-656) with BATCHES of vmapped EM chains: each round draws a
batch of initializations from split PRNG keys, runs them to convergence in
lockstep (stopped lanes frozen via the masked updates in opt/em.py), then
replays the reference's bookkeeping over the batch in serial order so the
four stop regimes keep their semantics:

1. fixed count   (-n n_init)
2. wall-clock    (-t minutes; checked between jitted segments)
3. target logL   (-u l <ll>, optionally x times)
4. revisit count (-u n <times> of the best logL)

Batching may compute a few extra chains past the stopping init (parallel
speculation); they are discarded, preserving reference-equivalent results
while filling the chip.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multiclust_tpu.config import AccelScheme, Options
from multiclust_tpu.init import random as rinit
from multiclust_tpu.model.common import EMConfig, ModelData, Params
from multiclust_tpu.model.likelihood import aic as aic_fn, bic as bic_fn
from multiclust_tpu.opt import em as em_mod

tree_map = jax.tree_util.tree_map


def cfg_from_options(opt: Options, K: int,
                     md: Optional[ModelData] = None) -> EMConfig:
    """Static EM config; ``md`` (if given) fixes the trace-time
    ``has_missing`` flag so missing-free fits skip the miss reductions."""
    has_missing = True
    biallelic = False
    if md is not None:
        has_missing = bool(jax.device_get(jnp.any(md.miss > 0)))
        biallelic = md.M == 2 and bool(
            jax.device_get(jnp.all(md.n_alleles == 2)))
    use_pallas, _ = opt.device_policy()
    k_true = K if (opt.admixture and not opt.eta_constrained) else 0
    mesh = None
    if opt.mesh_shape:
        from multiclust_tpu.runtime.mesh import cached_mesh
        mesh = cached_mesh(tuple(opt.mesh_shape))
    return EMConfig(
        admixture=opt.admixture, eta_constrained=opt.eta_constrained,
        do_projection=opt.do_projection,
        eta_lower_bound=opt.eta_lower_bound,
        p_lower_bound=opt.p_lower_bound,
        abs_error=opt.abs_error, rel_error=opt.rel_error,
        max_iter=opt.max_iter, accel_scheme=int(opt.accel_scheme),
        q=opt.q, n_init_iter=opt.n_init_iter, adjust_step=opt.adjust_step,
        monotonicity=opt.resolved_monotonicity(),
        use_pallas="on" if use_pallas else "off",
        has_missing=has_missing, biallelic=biallelic, k_true=k_true,
        ploidy=opt.ploidy, check_interval=opt.check_interval, mesh=mesh)


def _pad_k(params: Params, cfg: EMConfig) -> Params:
    """K-pad admixture params to the Pallas 32-lane layout (pads zero);
    no-op for the XLA/CPU paths.  Both the biallelic and the generic
    fullstep/sweep kernels take 32-lane K: their A/B accumulator outputs
    (and VMEM residency) scale with Kp - measured 20% faster at K=20 -
    while matmul contraction depth <= 128 is time-flat on the MXU, so the
    smaller padding loses nothing (BASELINE.md small-K analysis)."""
    if (cfg.use_pallas != "off" and cfg.admixture
            and not cfg.eta_constrained and cfg.k_true):
        from multiclust_tpu.model.common import k_padded_size, pad_params_k
        return pad_params_k(params, k_padded_size(cfg.k_true, 32))
    return params


def _to_bi_repr(params: Params, cfg: EMConfig, Ip: int, L: int) -> Params:
    """Convert K-padded full params to the biallelic p0-representation
    (model/common.EMConfig.bi_repr_active): p [.., Kp, L, 2] ->
    [.., Kp, Lp] holding allele-0 frequencies in the kernel tile layout.
    No-op when inactive or the shapes don't tile.

    Under a LOCI-sharded mesh (model_shards > 1) the input L must
    already be per-shard tile-aligned (the engine pads the fit data with
    _loci_pad_target first): a tail pad here would land entirely on the
    last model shard and misalign p0 columns against the x sharding.

    Dynamic-K chains (params.kmask) ride the representation too: the
    kernels take ``project_eta=False`` so only the eta Michelot (whose
    lane set is the static k_true) moves to XLA with the kmask, while
    the in-kernel p update keeps its 2-simplex clip.  (Round-5 lesson:
    a blanket project=False silently dropped that clip and
    swept-lattice chains converged ~1.5x worse.)"""
    if not cfg.bi_repr_active or params.p.ndim == params.eta.ndim:
        return params
    from multiclust_tpu.ops.kernels import pick_layout_biallelic_any
    Kp = params.eta.shape[-1]
    dd, mm = cfg.data_shards, cfg.model_shards
    meshed = dd > 1 or mm > 1
    # under a mesh the kernels tile PER-SHARD rows/loci with emit_b
    # variants (same divisors/flags the meshed step uses,
    # model/admixture._em_step_bi_repr_meshed)
    if L % mm:
        return params
    ti, tl, Lp_loc, _ = pick_layout_biallelic_any(
        Ip // dd, Kp, L // mm, emit_b=meshed)
    if not ti or (mm > 1 and Lp_loc != L // mm):
        return params  # untileable: the glue fallback handles full p
    Lp = Lp_loc if mm == 1 else L
    p0 = params.p[..., 0]
    d = Lp - p0.shape[-1]
    if d > 0:
        pw = [(0, 0)] * (p0.ndim - 1) + [(0, d)]
        p0 = jnp.pad(p0, pw)
    return params._replace(p=p0)


def _unpad_k(params: Params, cfg: EMConfig,
             n_rows: Optional[int] = None,
             n_loci: Optional[int] = None,
             bd=None, M_full: Optional[int] = None,
             k_lane: Optional[int] = None) -> Params:
    """``k_lane`` overrides cfg.k_true for mixed-K swept lattices, where
    the harvested lane's true K is per-chain host knowledge (ksweep.py);
    the dynamic kmask is dropped - harvested params are dense K-sized."""
    if params.kmask is not None:
        params = params._replace(kmask=None)
    kt_cfg = k_lane or cfg.k_true
    if isinstance(params.p, tuple):
        # jagged-M bucketed representation: merge back to the dense
        # original-order layout before any slicing (model/bucketed.py)
        from multiclust_tpu.model.bucketed import merge_params_like
        params = merge_params_like(params, bd, M_full)
    if cfg.bi_repr_active and params.p.ndim == params.eta.ndim:
        # reconstruct full p from the p0-representation (harvest time only)
        kt = kt_cfg or params.p.shape[-2]
        p0 = params.p[..., :kt, :]
        if n_loci is not None:
            p0 = p0[..., :n_loci]
        params = params._replace(eta=params.eta[..., :kt],
                                 p=jnp.stack([p0, 1.0 - p0], axis=-1))
    if kt_cfg and params.p.shape[-3] != kt_cfg:
        from multiclust_tpu.model.common import unpad_params_k
        params = unpad_params_k(params, kt_cfg)
    if (n_rows is not None and params.eta.ndim >= 2
            and params.eta.shape[-2] != n_rows):
        params = params._replace(eta=params.eta[..., :n_rows, :])
    if n_loci is not None and params.p.shape[-2] != n_loci:
        params = params._replace(p=params.p[..., :n_loci, :])
    return params


def _pad_params_loci(params: Params, Lp: int) -> Params:
    """Zero-pad the loci axis of p to the (mesh-padded) fit data's L;
    padded loci are fully masked, hence inert (test_padded_rows_are_inert)."""
    if params.p.ndim == params.eta.ndim:
        return params  # p0-representation: loci padded at conversion
    d = Lp - params.p.shape[-2]
    if d <= 0:
        return params
    pw = [(0, 0)] * (params.p.ndim - 2) + [(0, d), (0, 0)]
    return params._replace(p=jnp.pad(params.p, pw))


def _loci_pad_target(L: int, Ip: int, cfg: EMConfig) -> int:
    """Loci count the fit data should pad to (global, pads at the tail).

    Baseline: a multiple of model_shards so the L axis shards evenly.
    When the biallelic p0-representation will run on a loci-sharded mesh,
    each shard's local block must ALSO be kernel-tile-aligned - the
    representation keeps p0 columns and x columns on the same shards, so
    the alignment must happen in the GLOBAL padding, before conversion
    (model/admixture._em_step_bi_repr_meshed layout contract).  Padded
    loci are fully masked, hence inert (test_padded_rows_are_inert)."""
    mm = cfg.model_shards
    if mm <= 1:
        return L
    L_loc = -(-L // mm)
    if cfg.bi_repr_active:
        from multiclust_tpu.model.common import k_padded_size
        from multiclust_tpu.ops.kernels import pick_layout_biallelic_any
        Kp = k_padded_size(cfg.k_true, 32)
        ti, tl, Lp_loc, _ = pick_layout_biallelic_any(
            max(Ip // cfg.data_shards, 1), Kp, L_loc, emit_b=True)
        if ti:
            L_loc = Lp_loc
    return mm * L_loc


def _row_pad_target(I: int, cfg: EMConfig) -> int:
    """Rows to pad the chain state/data to so the full-step Pallas kernel
    can tile the individual axis (0 = leave unpadded).  Pad rows carry zero
    counts/missing and uniform eta - an exact fixed point of the EM update,
    so secant pairs and step sizes see zeros there.

    Under a mesh the PER-SHARD row count must tile, so the target is a
    multiple of data_shards * tile."""
    dd = cfg.data_shards
    if not (cfg.use_pallas != "off" and cfg.admixture
            and not cfg.eta_constrained and cfg.k_true):
        # XLA/GSPMD paths have no tile constraint; pad only for even
        # sharding over the data axis
        if dd > 1 and I % dd:
            return -(-I // dd) * dd
        return 0
    # pad toward the fullstep tile ladder (ops/kernels._FULLSTEP_TILES):
    # large datasets earn the 1024/512-row tiles (~+30% sweep throughput),
    # small ones keep the pad overhead bounded
    I_loc = -(-I // dd)
    if I_loc >= 8192:
        m = 1024
    elif I_loc >= 4096:
        m = 512
    elif I_loc >= 2048:
        m = 256
    else:
        m = 64
    if I % (m * dd) == 0:
        return 0
    return -(-I_loc // m) * m * dd


def _pad_md_rows(md: ModelData, Ip: int) -> ModelData:
    from multiclust_tpu.model.bucketed import BucketedData
    if isinstance(md, BucketedData):
        return md._replace(buckets=tuple(_pad_md_rows(b, Ip)
                                         for b in md.buckets),
                           x_lanes=None)  # derived; prepare rebuilds
    d = Ip - md.I
    if d <= 0:
        return md
    return md._replace(
        x=jnp.pad(md.x, ((0, d), (0, 0), (0, 0))),
        miss=jnp.pad(md.miss, ((0, d), (0, 0))),
        row_valid=(None if md.row_valid is None
                   else jnp.pad(md.row_valid, (0, d))),
        x_flat=None, x_bi=None, miss_st=None)


def _pad_params_rows(params: Params, Ip: int, cfg: EMConfig) -> Params:
    if params.eta.ndim < 2:  # mixture / constrained eta carries no I rows
        return params
    d = Ip - params.eta.shape[-2]
    if d <= 0:
        return params
    if params.kmask is not None:
        # dynamic-K: uniform over the chain's true lanes (any value is an
        # EM fixed point on zero-count rows; uniform is projection-stable)
        row = params.kmask / jnp.sum(params.kmask, axis=-1, keepdims=True)
        pad = jnp.broadcast_to(
            row[..., None, :],
            params.eta.shape[:-2] + (d, params.eta.shape[-1]))
    else:
        row = jnp.zeros((params.eta.shape[-1],), params.eta.dtype)
        kt = cfg.k_true or params.eta.shape[-1]
        row = row.at[:kt].set(1.0 / kt)
        pad = jnp.broadcast_to(row,
                               params.eta.shape[:-2] + (d, row.shape[0]))
    return params._replace(
        eta=jnp.concatenate([params.eta, pad], axis=-2))


@dataclasses.dataclass
class MaximizeResult:
    """Statistics across initializations (mirrors the _model fields kept
    across inits, multiclust.h:337-355)."""

    K: int
    best_params: Optional[Params] = None
    max_logL: float = -np.inf
    first_max_logL: float = -np.inf
    aic: float = np.inf
    bic: float = np.inf
    n_init: int = 0            # counted (converged) initializations
    n_launched: int = 0        # chains actually computed (incl. speculative)
    n_total_iter: int = 0
    n_max_iter: int = 0
    n_maxll_init: int = -1
    n_maxll_times: int = 0
    n_targetll_times: int = 0
    n_targetll_init: int = 0
    time_stop: bool = False
    ever_converged: bool = False
    any_failed: bool = False
    mono_viol: bool = False
    arand: float = 0.0
    seconds: float = 0.0


def _host_converged(opt: Options, a: float, b: float) -> bool:
    """Host-side converged() (em_alg.c:163-182) for solution comparison."""
    if not np.isfinite(b):
        return False
    abs_diff = abs(a - b)
    keep = False
    if opt.abs_error:
        keep |= abs_diff > opt.abs_error
    if opt.rel_error:
        keep |= abs_diff / abs(b) > opt.rel_error
    return not keep


@functools.lru_cache(maxsize=64)
def _init_batch_fn(cfg: EMConfig, K: int, method, procedure,
                   n_rand_em_init: int):
    """Jit-compiled batched initializer (round 5): the eager vmap'd
    rand-EM races dispatch thousands of small ops - ~100 s per call
    through the TPU tunnel vs ~1 s compiled.  md/codes/md_score are jit
    ARGUMENTS, never closed-over constants (the remote-compile relay
    rejects big embedded constants with HTTP 413 - CLAUDE.md)."""
    def batch(keys, md, codes, md_score):
        fn = functools.partial(
            rinit.initialize, K=K, cfg=cfg, method=method,
            procedure=procedure, n_rand_em_init=n_rand_em_init)
        return jax.vmap(lambda k: fn(k, md=md, codes=codes,
                                     md_score=md_score))(keys)
    return jax.jit(batch)


def _draw_init_batch(key, n: int, md, K: int, cfg: EMConfig, opt: Options,
                     codes, md_score):
    fn = _init_batch_fn(cfg, K, opt.initialization_method,
                        opt.initialization_procedure, opt.n_rand_em_init)
    return fn(jax.random.split(key, n), md, codes, md_score)


@functools.lru_cache(maxsize=64)
def _init_batch_fn_dyn(cfg: EMConfig, Kp: int, method, procedure,
                       n_rand_em_init: int):
    """Dynamic-K batched initializer: the true K is a TRACED argument, so
    ONE compiled program draws inits for every K of a swept lattice (the
    static variant recompiles per K; ~90 s each through the tunnel).
    Returns Kp-padded params carrying their kmask."""
    def batch(keys, kdyn, md, codes, md_score):
        fn = functools.partial(
            rinit.initialize_dyn, kdyn=kdyn, Kp=Kp, cfg=cfg,
            method=method, procedure=procedure,
            n_rand_em_init=n_rand_em_init)
        return jax.vmap(lambda k: fn(k, md=md, codes=codes,
                                     md_score=md_score))(keys)
    return jax.jit(batch)


def _draw_init_batch_dyn(key, n: int, md, K: int, Kp: int, cfg: EMConfig,
                         opt: Options, codes, md_score):
    fn = _init_batch_fn_dyn(cfg, Kp, opt.initialization_method,
                            opt.initialization_procedure,
                            opt.n_rand_em_init)
    return fn(jax.random.split(key, n), jnp.asarray(K, jnp.int32), md,
              codes, md_score)


@functools.lru_cache(maxsize=64)
def _batch_fns(cfg: EMConfig, segment: int):
    accel = cfg.accel_scheme != int(AccelScheme.NONE)
    # plain_macro_step honors cfg.check_interval (1 = exactly plain_step)
    body = (em_mod.accel_macro_step if accel else em_mod.plain_macro_step)

    def constrain(state):
        """Pin the chain-state shardings under a mesh so the segment carry
        stays stable across calls (runtime/mesh.constrain_chain_state)."""
        if cfg.mesh is None:
            return state
        from multiclust_tpu.runtime.mesh import constrain_chain_state
        return constrain_chain_state(state, cfg.mesh)

    def prep(md):
        """Row-pad for kernel tiling + flatten x, ONCE per jitted segment
        (shapes are static at trace time, so this is a trace-time branch)."""
        Ip = _row_pad_target(md.I, cfg)
        if Ip:
            md = _pad_md_rows(md, Ip)
        return md.prepare_for_em(bi=cfg.bi_repr_active or cfg.biallelic)

    def prologue_one(state, md):
        md = prep(md)
        for _ in range(cfg.n_init_iter):
            state = em_mod.plain_step(state, md, cfg)
        if accel:
            for _ in range(cfg.q - 1):
                state = em_mod.two_em_steps(state, md, cfg)[0]
        return state

    def seg_one(state, md):
        md = prep(md)
        return jax.lax.fori_loop(
            0, segment, lambda i, s: body(s, md, cfg), state)

    def init_one(params, md):
        # pad the chain rows/loci to the fit data's (possibly mesh-padded)
        # shape, rows further to the kernel tile target
        from multiclust_tpu.model.bucketed import BucketedData, \
            split_params_like
        Ip = _row_pad_target(md.I, cfg) or md.I
        params = _pad_params_rows(params, Ip, cfg)
        if isinstance(md, BucketedData):
            params = split_params_like(params, md)
        else:
            params = _pad_params_loci(params, md.L)
            params = _to_bi_repr(params, cfg, Ip, md.L)
        return em_mod.init_state(params, cfg)

    def refill_one(state, params, replace, md):
        """Swap a fresh initialization into a stopped lane (with its
        warmup/secant prologue) while leaving live lanes untouched.
        ``replace`` is this lane's scalar flag (vmapped)."""
        fresh = prologue_one(init_one(params, md), md) \
            if (cfg.n_init_iter or accel) else init_one(params, md)
        return jax.tree_util.tree_map(
            lambda new, old: jnp.where(replace, new, old), fresh, state)

    prologue = jax.jit(
        lambda st, md: constrain(
            jax.vmap(prologue_one, in_axes=(0, None))(st, md)),
        donate_argnums=0)
    seg = jax.jit(
        lambda st, md: constrain(
            jax.vmap(seg_one, in_axes=(0, None))(st, md)),
        donate_argnums=0)
    mk_state = jax.jit(
        lambda pb, md: constrain(
            jax.vmap(init_one, in_axes=(0, None))(pb, md)))
    refill = jax.jit(
        lambda st, pb, rep, md: constrain(
            jax.vmap(refill_one, in_axes=(0, 0, 0, None))(st, pb, rep, md)),
        donate_argnums=0)
    k1 = jax.jit(lambda p, md: em_mod.fit_k1(p, md, cfg))
    return prologue, seg, mk_state, k1, refill


def fit_batch(params_b: Params, md: ModelData, cfg: EMConfig, *,
              segment: int = 16, n_seconds: float = 0.0,
              start_time: Optional[float] = None):
    """Run a batch of chains to convergence; returns (EMState batch,
    timed_out)."""
    prologue, seg, mk_state, _, _ = _batch_fns(cfg, segment)
    t0 = time.time() if start_time is None else start_time
    state = mk_state(params_b, md)
    if cfg.n_init_iter or cfg.accel_scheme != int(AccelScheme.NONE):
        state = prologue(state, md)
    timed_out = False
    while True:
        stopped = np.asarray(state.stopped)
        if stopped.all():
            break
        if n_seconds:
            # clock decisions must be process-consistent: they gate the
            # next collective-participating segment (mesh.sync_host_flag)
            from multiclust_tpu.runtime.mesh import sync_host_flag
            if sync_host_flag((time.time() - t0) > n_seconds):
                timed_out = True
                break
        state = seg(state, md)
    return state, timed_out


def _mesh_place_chain_batch(pb: Params, cfg: EMConfig,
                            md_fit: ModelData) -> Params:
    """Pad a fresh chain batch to the fit shape, convert to the kernel
    representation, and place it on the mesh with its final shardings -
    all OUTSIDE the sharded jitted functions.  Letting GSPMD re-shard
    freshly-initialized batches inside mk_state/refill triggers
    involuntary full rematerialization of the concatenate/broadcast pads
    (the round-2 dryrun warnings); the jitted padding helpers are no-ops
    on already-padded params."""
    if cfg.mesh is None or cfg.eta_is_vector:
        return pb
    from multiclust_tpu.model.bucketed import BucketedData, \
        split_params_like
    from multiclust_tpu.runtime.mesh import shard_chain_params
    Ip = _row_pad_target(md_fit.I, cfg) or md_fit.I
    pb = _pad_params_rows(pb, Ip, cfg)
    if isinstance(md_fit, BucketedData):
        pb = split_params_like(pb, md_fit)
    else:
        pb = _pad_params_loci(pb, md_fit.L)
        pb = _to_bi_repr(pb, cfg, Ip, md_fit.L)
    return shard_chain_params(pb, cfg.mesh)


def _initialize_batch(key, md: ModelData, K: int, cfg: EMConfig,
                      opt: Options, codes, warm: Optional[Params],
                      md_score: Optional[ModelData] = None,
                      md_fit: Optional[ModelData] = None):
    if warm is not None:
        # -Q/-P warm start: every init identical (initialize_model,
        # rnd_init.c:74-76)
        warm = _pad_k(warm, cfg)
        pb = tree_map(lambda x: jnp.broadcast_to(x[None], (1,) + x.shape),
                      warm)
        if md_fit is not None:
            pb = _mesh_place_chain_batch(pb, cfg, md_fit)
        return pb, 1

    B = opt.batch_chains or min(max(opt.n_init, 1), 8)
    pb = _pad_k(_draw_init_batch(key, B, md, K, cfg, opt, codes,
                                 md_score), cfg)
    if md_fit is not None:
        pb = _mesh_place_chain_batch(pb, cfg, md_fit)
    return pb, B



def _make_progress(opt: Options, K: int, t0: float, quiet: bool):
    """Per-init completion line (multiclust.c:618-627): printed at
    verbosity > QUIET when writing files.  The reference reports the
    init's own wall-clock; batched chains complete together, so the
    hh:mm:ss here is elapsed time since the sweep started."""
    if quiet or opt.verbosity <= 2 or not opt.write_files:
        return None

    def pr(res: MaximizeResult, ll: float, conv: bool, iters: int) -> None:
        d = int(time.time() - t0)
        print("K = %d, initialization = %d: %f (%s) in %3d iterations, "
              "%02d:%02d:%02d (%f; %d), seed: %u"
              % (K, res.n_launched - 1, ll,
                 "converged" if conv else "not converged", iters,
                 d // 3600, (d % 3600) // 60, d % 60, res.max_logL,
                 res.n_maxll_times, opt.seed))
    return pr


def _bookkeep_lane(res: MaximizeResult, opt: Options, n_parameters: int,
                   I: int, ll: float, conv: bool, iters: int, failed: bool,
                   mono: bool, get_params, timed_out: bool,
                   on_improve=None, progress=None) -> bool:
    """Per-chain bookkeeping (multiclust.c:538-652); returns True when a
    stop regime is satisfied."""
    res.n_launched += 1
    res.any_failed |= failed
    res.mono_viol |= mono
    if conv:
        res.ever_converged = True
    # iteration stats (multiclust.c:538-543)
    if conv or (res.n_init == 0 and timed_out):
        res.n_total_iter += iters
        res.n_max_iter = max(res.n_max_iter, iters)
        res.n_init += 1
    # same-solution bookkeeping (multiclust.c:546-554)
    if conv and _host_converged(opt, ll, res.first_max_logL):
        res.n_maxll_times += 1
    elif conv and ll > res.first_max_logL:
        res.n_maxll_times = 1
        res.first_max_logL = ll
        res.n_maxll_init = res.n_init
    # better solution (multiclust.c:557-560)
    if ll > res.max_logL and np.isfinite(ll):
        res.max_logL = ll
        res.aic = aic_fn(ll, n_parameters)
        res.bic = bic_fn(ll, n_parameters, I)
        res.best_params = get_params()
        if on_improve is not None:
            # best-so-far persistence: the reference rewrites the per-K
            # output files every time an init improves the best logL
            # (multiclust.c:584-600) - they double as crash-recoverable,
            # inspect-while-running state
            on_improve(res)
    if progress is not None:
        progress(res, ll, conv, iters)

    # stop regimes (multiclust.c:629-652)
    if timed_out:
        res.time_stop = True
        return True
    if (opt.target_revisit and not opt.target_ll
            and res.n_maxll_times >= opt.target_revisit):
        return True
    if opt.target_ll and (ll > opt.desired_ll
                          or _host_converged(opt, ll, opt.desired_ll)):
        if not res.n_targetll_times:
            res.n_targetll_init = res.n_init
        res.n_targetll_times += 1
        if (not opt.target_revisit
                or opt.target_revisit <= res.n_targetll_times):
            return True
    if (not opt.target_revisit and not opt.target_ll
            and not opt.n_seconds and res.n_launched >= opt.n_init):
        return True
    return False


def _run_continuous(key, res: MaximizeResult, md: ModelData,
                    md_fit: ModelData, K: int, cfg: EMConfig, opt: Options,
                    n_parameters: int, codes, t0: float,
                    checkpoint_dir=None, segment: int = 16,
                    md_score: Optional[ModelData] = None,
                    on_improve=None, progress=None,
                    shared_Kp: int = 0) -> None:
    """Continuous-batching multi-start engine: B vmapped chains run in
    lockstep segments; a stopped lane is immediately harvested and refilled
    with a fresh initialization instead of idling until the slowest chain
    finishes.  Bookkeeping runs in completion order (the reference's serial
    ordinals like n_maxll_init refer to completed-chain counts here).

    ``shared_Kp``: dynamic-K mode - cfg carries k_true=shared_Kp and the
    chains their kmask, so every K of a K-sweep reuses THIS engine's
    compiled programs (ksweep shared-program serial sweep)."""
    prologue, seg, mk_state, _, refill = _batch_fns(cfg, segment)
    fixed_n = (not opt.target_revisit and not opt.target_ll
               and not opt.n_seconds)
    B = opt.batch_chains or min(max(opt.n_init, 1), 8)
    if fixed_n:
        B = min(B, opt.n_init)

    def make_inits(k, n):
        # always draw a full-width batch (ONE compiled init program per
        # K; distinct widths would recompile) and slice the lanes needed
        if shared_Kp:
            pb = _draw_init_batch_dyn(k, B, md, K, shared_Kp, cfg, opt,
                                      codes, md_score)
        else:
            pb = _draw_init_batch(k, B, md, K, cfg, opt, codes, md_score)
        if n != B:
            pb = tree_map(lambda t: t[:n], pb)
        if not shared_Kp:
            pb = _pad_k(pb, cfg)
        return _mesh_place_chain_batch(pb, cfg, md_fit)

    key, sub = jax.random.split(key)
    state = mk_state(make_inits(sub, B), md_fit)
    if cfg.n_init_iter or cfg.accel_scheme != int(AccelScheme.NONE):
        state = prologue(state, md_fit)
    launched = B
    harvested = np.zeros(B, dtype=bool)
    timed_out = False

    while True:
        stopped = np.asarray(state.stopped)
        fresh_lanes = np.nonzero(stopped & ~harvested)[0]
        if fresh_lanes.size:
            lls = np.asarray(state.logL_hi + state.logL_lo)
            convs = np.asarray(state.converged)
            iters = np.asarray(state.n_iter)
            faileds = np.asarray(state.failed)
            monos = np.asarray(state.mono_viol)
            for lane in fresh_lanes:
                harvested[lane] = True
                done = _bookkeep_lane(
                    res, opt, n_parameters, md.I, float(lls[lane]),
                    bool(convs[lane]), int(iters[lane]),
                    bool(faileds[lane]), bool(monos[lane]),
                    lambda ln=lane: _unpad_k(
                        tree_map(lambda t: t[ln], state.params), cfg,
                        md.I, md.L, bd=md_fit, M_full=md.M,
                        k_lane=K if shared_Kp else None),
                    timed_out, on_improve=on_improve, progress=progress)
                if done:
                    return
            if checkpoint_dir:
                from multiclust_tpu.runtime import checkpoint as ckpt
                res.seconds = time.time() - t0
                ckpt.save(checkpoint_dir, K, res, key=key)

        want_more = (launched < opt.n_init) if fixed_n else True
        refillable = np.nonzero(harvested)[0]
        if want_more and refillable.size:
            nref = refillable.size
            if fixed_n:
                nref = min(nref, opt.n_init - launched)
            lanes = refillable[:nref]
            key, sub = jax.random.split(key)
            fresh = make_inits(sub, nref)
            # scatter the nref fresh inits into their lanes
            idx_map = np.zeros(B, dtype=np.int32)
            idx_map[lanes] = np.arange(nref)
            params_b = tree_map(lambda t: t[jnp.asarray(idx_map)], fresh)
            replace = np.zeros(B, dtype=bool)
            replace[lanes] = True
            state = refill(state, params_b, jnp.asarray(replace), md_fit)
            launched += nref
            harvested[lanes] = False
        elif harvested.all():
            return  # nothing active and no more chains wanted

        if opt.n_seconds:
            from multiclust_tpu.runtime.mesh import sync_host_flag
            if sync_host_flag((time.time() - t0) > opt.n_seconds):
                # harvest still-active lanes as timed out (best-so-far
                # logL counts, multiclust.c:538-560 with time_stop);
                # clock decisions sync across processes (mesh hang
                # otherwise - see sync_host_flag)
                lls = np.asarray(state.logL_hi + state.logL_lo)
                convs = np.asarray(state.converged)
                iters = np.asarray(state.n_iter)
                faileds = np.asarray(state.failed)
                monos = np.asarray(state.mono_viol)
                for lane in np.nonzero(~harvested)[0]:
                    harvested[lane] = True
                    if _bookkeep_lane(
                            res, opt, n_parameters, md.I, float(lls[lane]),
                            bool(convs[lane]), int(iters[lane]),
                            bool(faileds[lane]), bool(monos[lane]),
                            lambda ln=lane: _unpad_k(
                                tree_map(lambda t: t[ln], state.params),
                                cfg, md.I, md.L, bd=md_fit, M_full=md.M,
                                k_lane=K if shared_Kp else None),
                            True, on_improve=on_improve,
                            progress=progress):
                        return
                res.time_stop = True
                return

        state = seg(state, md_fit)


def _prepare_fit_data(md: ModelData, cfg: EMConfig, opt: Options):
    """(md_fit, md_score, bucketed) for a multi-start engine run -
    K-independent, shared by maximize_likelihood and the mixed-K swept
    lattice (ksweep.py; cfg carries the PADDED Kp there)."""
    # constrained-eta admixture fits depend on the data only through its
    # column sums: collapse once (the full md still serves init + scoring)
    if cfg.admixture and cfg.eta_constrained:
        from multiclust_tpu.model.common import collapse_for_constrained
        md_fit = collapse_for_constrained(md)
    else:
        md_fit = md

    # jagged-M panels (mixed SNP/microsatellite): bucket loci by allele
    # count so each launch pads only to its own M ceiling
    # (model/bucketed.py; SURVEY.md section 7 "hard parts").  Applies to
    # ALL model types since round 5 (mixture/constrained steps are
    # lane-additive too) and composes with DATA-axis meshes (the XLA
    # bucket loop shards under GSPMD; the fused kernels stay
    # single-device).  Loci-sharded meshes keep the dense layout (a
    # bucket is smaller than a useful loci shard).  Worth it when the
    # dense padding waste crosses ~25%.
    bucketed = False
    if md.M > 2 and cfg.model_shards == 1:
        from multiclust_tpu.model.bucketed import bucketize_model_data, \
            lane_pad, plan_buckets, worth_bucketing
        n_all = np.asarray(jax.device_get(md.n_alleles))
        if worth_bucketing(n_all):
            # TIGHT plan (no per-bucket tile alignment - the fused
            # single-launch kernel and the XLA loop only need the
            # concatenated total aligned, and per-bucket pads were the
            # entire gap to the uniform rate, BASELINE round-4 cont.);
            # fall back to the aligned plan when the fused kernel will
            # NOT admit the tight width (the chained per-bucket
            # launches need per-launch tile alignment)
            plan = plan_buckets(n_all, md.M, tight=True)
            if (plan is not None and cfg.use_pallas != "off"
                    and cfg.k_true and cfg.admixture
                    and not cfg.eta_constrained and cfg.mesh is None):
                from multiclust_tpu.model.common import k_padded_size
                from multiclust_tpu.ops.kernels import pick_layout
                LMt = sum((hi - lo) * M_b
                          for (lo, hi), M_b in zip(plan.ranges, plan.Ms))
                Ip = _row_pad_target(md_fit.I, cfg) or md_fit.I
                W = lane_pad(Ip, LMt)
                Kp = k_padded_size(cfg.k_true, 32)
                ti, _, LMp = pick_layout(Ip, Kp, W)
                if not ti or LMp != W:
                    # fused kernel won't take the tight width; the
                    # aligned plan only helps if the CHAINED per-bucket
                    # launches admit - otherwise the XLA loop runs and
                    # tight is strictly better (no per-launch alignment
                    # need, VERDICT r4 weak 6)
                    aligned = plan_buckets(n_all, md.M)
                    if aligned is not None and all(
                            pick_layout(Ip, Kp, Lb * Mb)[0]
                            for Lb, Mb in zip(aligned.pad_Ls, aligned.Ms)):
                        plan = aligned
            if plan is not None:
                md_fit = bucketize_model_data(md_fit, plan)
                bucketed = True

    if cfg.mesh is not None:
        # multi-chip production path: pad individuals/loci to shardable
        # sizes (pads are inert, test_sharding) and place the fit data on
        # the (data, loci) mesh.  Chain-state shardings are pinned by the
        # jitted segment functions (_batch_fns); XLA/GSPMD inserts the
        # psum merges, and the Pallas kernels run per data shard under
        # jax.shard_map (model/admixture.py).
        from multiclust_tpu.runtime import mesh as mesh_mod
        Ip = _row_pad_target(md_fit.I, cfg) or md_fit.I
        Lp = _loci_pad_target(md_fit.L, Ip, cfg)
        md_fit = mesh_mod.pad_md_rows_loci(md_fit, Ip, Lp)
        md_fit = mesh_mod.shard_model_data(md_fit, cfg.mesh)

    # Rand-EM candidates score on the FIT data - padded AND sharded under
    # a mesh, so candidate scoring rides the same collectives as the fit
    # (padded rows/loci contribute zero logL; rand_em_initialize adapts
    # the candidate shapes).  Partition construction still uses `md`.
    # Bucketed fits score candidates on the dense md (candidates carry
    # dense p; one-off init cost at the dense rate).
    md_score = md if bucketed else md_fit
    return md_fit, md_score, bucketed


def maximize_likelihood(key, md: ModelData, K: int, opt: Options,
                        n_parameters: int,
                        codes=None, warm: Optional[Params] = None,
                        true_partition=None,
                        checkpoint_dir: Optional[str] = None,
                        on_improve=None, quiet: bool = False,
                        shared_Kp: int = 0) -> MaximizeResult:
    """Maximize over initializations (maximize_likelihood,
    multiclust.c:471-656).  ``checkpoint_dir`` persists/resumes the sweep
    state after every batch of chains (runtime/checkpoint.py);
    ``on_improve(res)`` fires whenever an init improves the best logL
    (best-so-far output persistence, multiclust.c:584-600); ``quiet``
    suppresses per-init progress (bootstrap replicate fits)."""
    # shared_Kp (ksweep shared-program serial sweep): the static config
    # carries the SHARED padded lane count, chains their kmask - every K
    # of the sweep then reuses one compiled program set
    cfg = cfg_from_options(opt, shared_Kp or K, md)
    res = MaximizeResult(K=K)
    t0 = time.time()
    progress = _make_progress(opt, K, t0, quiet)

    md_fit, md_score, bucketed = _prepare_fit_data(md, cfg, opt)

    if checkpoint_dir:
        from multiclust_tpu.runtime import checkpoint as ckpt
        loaded = ckpt.load(checkpoint_dir, K, dtype=md.dtype)
        if loaded is not None:
            res, saved_key = loaded
            if saved_key is not None:
                key = saved_key
            if _regimes_satisfied(res, opt):
                _score_arand(res, md, opt, true_partition)
                return res

    if K == 1:
        _, _, _, k1, _ = _batch_fns(cfg, 16)
        params = _single_init(key, md, K, cfg, opt, codes, warm)
        params = _pad_params_loci(
            _pad_params_rows(params, md_fit.I, cfg), md_fit.L)
        state = k1(params, md_fit)
        ll = float(state.logL_hi + state.logL_lo)
        res.best_params = _unpad_k(state.params, cfg, md.I, md.L,
                                   bd=md_fit, M_full=md.M)
        res.max_logL = res.first_max_logL = ll
        res.aic = aic_fn(ll, n_parameters)
        res.bic = bic_fn(ll, n_parameters, md.I)
        res.n_init = res.n_launched = 1
        res.n_total_iter = res.n_max_iter = 1
        res.n_maxll_init = 1
        res.n_maxll_times = 1
        res.ever_converged = True
        res.seconds = time.time() - t0
        _score_arand(res, md, opt, true_partition)
        return res

    # at verbosity > MINIMAL the reference prints one line per EM iteration
    # (stop, em_alg.c:123-136); that needs serial chains with a tracer
    serial = opt.verbosity > 3

    if not serial and warm is None:
        # continuous-batching engine: stopped lanes refilled immediately
        _run_continuous(key, res, md, md_fit, K, cfg, opt, n_parameters,
                        codes, t0, checkpoint_dir=checkpoint_dir,
                        md_score=md_score, on_improve=on_improve,
                        progress=progress, shared_Kp=shared_Kp)
        res.seconds = time.time() - t0
        if checkpoint_dir:
            from multiclust_tpu.runtime import checkpoint as ckpt
            ckpt.save(checkpoint_dir, K, res, key=key)
        _score_arand(res, md, opt, true_partition)
        return res

    done = False
    while not done:
        key, sub = jax.random.split(key)
        if serial:
            states, timed_out, B = _fit_serial_traced(
                sub, md, md_fit, K, cfg, opt, codes, warm, t0,
                md_score=md_score)
        else:
            params_b, B = _initialize_batch(sub, md, K, cfg, opt, codes,
                                            warm, md_score=md_score,
                                            md_fit=md_fit)
            states, timed_out = fit_batch(
                params_b, md_fit, cfg, n_seconds=opt.n_seconds,
                start_time=t0)

        lls = np.asarray(states.logL_hi + states.logL_lo)
        convs = np.asarray(states.converged)
        iters = np.asarray(states.n_iter)
        faileds = np.asarray(states.failed)
        monos = np.asarray(states.mono_viol)

        for lane in range(B):
            done = _bookkeep_lane(
                res, opt, n_parameters, md.I, float(lls[lane]),
                bool(convs[lane]), int(iters[lane]), bool(faileds[lane]),
                bool(monos[lane]),
                lambda ln=lane: _unpad_k(
                    tree_map(lambda t: t[ln], states.params), cfg,
                    md.I, md.L, bd=md_fit, M_full=md.M),
                timed_out, on_improve=on_improve, progress=progress)
            if done:
                break
        if warm is not None and not done:
            # warm starts are deterministic; more batches are pointless
            # unless a count/target regime explicitly asks for them
            if not (opt.target_revisit or opt.target_ll or opt.n_seconds):
                if res.n_launched >= opt.n_init:
                    done = True

        if checkpoint_dir:
            from multiclust_tpu.runtime import checkpoint as ckpt
            res.seconds = time.time() - t0
            ckpt.save(checkpoint_dir, K, res, key=key)

    res.seconds = time.time() - t0
    _score_arand(res, md, opt, true_partition)
    return res


def swept_eligible(opt: Options, md: ModelData, ks) -> bool:
    """Host-side gate for the mixed-K swept lattice (ksweep.py): the
    default fixed-n regime off-mesh, no warm start/checkpoint/serial
    verbosity, all K sharing one 32-aligned padded lane count, and a
    bounded chain-state HBM footprint.  Everything else runs the
    reference-shaped serial per-K loop (estimate_model,
    multiclust.c:365-452)."""
    from multiclust_tpu.model.common import k_padded_size
    ks = [K for K in ks if K >= 2]
    if len(ks) < 2:
        return False
    if (opt.target_ll or opt.target_revisit or opt.n_seconds
            or opt.verbosity > 3 or opt.n_init < 1):
        return False
    if opt.mesh_shape:
        return False
    if not opt.device_policy()[0]:
        # CPU/f64: serial chains run UNPADDED K-sized arrays, so the
        # swept lattice's Kp=32 padding costs real FLOPs (measured 1.4x
        # slower at K=2..5).  On accelerators every K <= 32 pads to the
        # same 32 lanes anyway, so the lattice is pure win (one compile,
        # all K multi-starts filling the chip).
        return False
    if k_padded_size(min(ks), 32) != k_padded_size(max(ks), 32):
        return False  # mixed lane layouts: serial per Kp block
    # chain-state budget: all groups resident at once (vs <= 8 chains in
    # the serial loop); ~ (3 + 2q) copies of (eta + p) per chain
    Kp = k_padded_size(max(ks), 32)
    B = min(opt.batch_chains or min(max(opt.n_init, 1), 8), opt.n_init)
    per_chain = (md.I * Kp + Kp * md.L * md.M) * 4
    copies = 3 + 2 * (opt.q if int(opt.accel_scheme) else 0)
    return len(ks) * B * per_chain * copies < 4e9


def swept_maximize(keys_by_K, md: ModelData, opt: Options,
                   n_parameters_fn, codes=None, true_partition=None,
                   on_improve=None, quiet: bool = False,
                   segment: int = 16):
    """Fit EVERY K of a K-sweep as ONE mixed-K chain lattice.

    Replaces estimate_model's serial per-K loop (multiclust.c:365-452)
    for the default regime: all K <= Kp share the 32-lane padded layout,
    so chains differ only in their DATA-carried true-lane mask
    (Params.kmask) and the whole sweep shares ONE compiled
    prologue/segment/refill set (the serial loop recompiles per K
    because cfg.k_true is a static jit argument).

    Exact-parity contract with the serial path: each K's group keeps its
    own PRNG stream (``keys_by_K`` in serial loop order), batch width,
    refill schedule, and completion-order bookkeeping, so the set of
    chains fitted - and hence per-K max_logL/AIC/BIC - matches the
    serial engine chain for chain (up to K-lane-padding float
    associativity).  Returns {K: MaximizeResult}.
    """
    from multiclust_tpu.model.common import k_padded_size

    ks = [K for K, _ in keys_by_K]
    Kp = k_padded_size(max(ks), 32)
    cfg = cfg_from_options(opt, Kp, md)
    t0 = time.time()
    md_fit, md_score, bucketed = _prepare_fit_data(md, cfg, opt)
    prologue, seg, mk_state, _, refill = _batch_fns(cfg, segment)

    groups = []
    off = 0
    for K, keyK in keys_by_K:
        B = min(opt.batch_chains or min(max(opt.n_init, 1), 8),
                opt.n_init)
        groups.append({
            "K": K, "key": keyK, "B": B, "off": off,
            "res": MaximizeResult(K=K),
            "harvested": np.zeros(B, dtype=bool),
            "launched": 0, "done": False,
            "n_parameters": n_parameters_fn(K),
            "progress": _make_progress(opt, K, t0, quiet),
        })
        off += B
    B_total = off

    def make_inits(g, k, n):
        # full-width draw + slice, through the ONE dynamic-K compiled
        # init program (draw-for-draw identical to the serial path's
        # static-K init: traced randint bounds and the choice prefix
        # property, init/random.py round-5 notes)
        pb = _draw_init_batch_dyn(k, g["B"], md, g["K"], Kp, cfg, opt,
                                  codes, md_score)
        if n != g["B"]:
            pb = tree_map(lambda t: t[:n], pb)
        return pb

    pbs = []
    for g in groups:
        g["key"], sub = jax.random.split(g["key"])
        pbs.append(make_inits(g, sub, g["B"]))
        g["launched"] = g["B"]
    params_b = tree_map(lambda *xs: jnp.concatenate(xs, axis=0), *pbs)
    state = mk_state(params_b, md_fit)
    if cfg.n_init_iter or cfg.accel_scheme != int(AccelScheme.NONE):
        state = prologue(state, md_fit)

    while not all(g["done"] for g in groups):
        stopped = np.asarray(state.stopped)
        any_fresh = any(
            (stopped[g["off"]:g["off"] + g["B"]] & ~g["harvested"]).any()
            for g in groups if not g["done"])
        if any_fresh:
            lls = np.asarray(state.logL_hi + state.logL_lo)
            convs = np.asarray(state.converged)
            iters = np.asarray(state.n_iter)
            faileds = np.asarray(state.failed)
            monos = np.asarray(state.mono_viol)
            for g in groups:
                if g["done"]:
                    continue
                sl = slice(g["off"], g["off"] + g["B"])
                fresh = np.nonzero(stopped[sl] & ~g["harvested"])[0]
                for lane_l in fresh:
                    g["harvested"][lane_l] = True
                    ln = g["off"] + int(lane_l)
                    if _bookkeep_lane(
                            g["res"], opt, g["n_parameters"], md.I,
                            float(lls[ln]), bool(convs[ln]),
                            int(iters[ln]), bool(faileds[ln]),
                            bool(monos[ln]),
                            lambda ln=ln, K=g["K"]: _unpad_k(
                                tree_map(lambda t: t[ln], state.params),
                                cfg, md.I, md.L, bd=md_fit, M_full=md.M,
                                k_lane=K),
                            False,
                            on_improve=((lambda r, K=g["K"]:
                                         on_improve(K, r))
                                        if on_improve else None),
                            progress=g["progress"]):
                        g["done"] = True
                        break

        # refill finished lanes of unfinished groups, one scatter per
        # loop pass (same per-group key/refill schedule as the serial
        # engine: content depends only on the group's own stream)
        ref_lanes, ref_parts = [], []
        for g in groups:
            if g["done"] or g["launched"] >= opt.n_init:
                continue
            refillable = np.nonzero(g["harvested"])[0]
            nref = min(refillable.size, opt.n_init - g["launched"])
            if not nref:
                continue
            lanes = g["off"] + refillable[:nref]
            g["key"], sub = jax.random.split(g["key"])
            ref_parts.append(make_inits(g, sub, nref))
            ref_lanes.append(lanes)
            g["launched"] += nref
            g["harvested"][refillable[:nref]] = False
        if ref_parts:
            fresh = tree_map(lambda *xs: jnp.concatenate(xs, axis=0),
                             *ref_parts) if len(ref_parts) > 1 \
                else ref_parts[0]
            lanes = np.concatenate(ref_lanes)
            idx_map = np.zeros(B_total, dtype=np.int32)
            idx_map[lanes] = np.arange(lanes.size)
            params_sc = tree_map(lambda t: t[jnp.asarray(idx_map)], fresh)
            replace = np.zeros(B_total, dtype=bool)
            replace[lanes] = True
            state = refill(state, params_sc, jnp.asarray(replace), md_fit)
        elif all(g["done"] or g["harvested"].all() for g in groups):
            break  # nothing active anywhere and no more chains wanted

        if not all(g["done"] for g in groups):
            state = seg(state, md_fit)

    out = {}
    for g in groups:
        g["res"].seconds = time.time() - t0
        _score_arand(g["res"], md, opt, true_partition)
        out[g["K"]] = g["res"]
    return out


def _regimes_satisfied(res: MaximizeResult, opt: Options) -> bool:
    """Is a resumed sweep already past its stop regime?"""
    if res.time_stop:
        return True
    if opt.target_revisit and not opt.target_ll:
        return res.n_maxll_times >= opt.target_revisit
    if opt.target_ll:
        needed = opt.target_revisit or 1
        return res.n_targetll_times >= needed
    if not opt.n_seconds:
        return res.n_launched >= opt.n_init
    return False


def _fit_serial_traced(key, md, md_fit, K, cfg, opt, codes, warm, t0,
                       md_score=None):
    """One traced chain per round (verbosity > MINIMAL)."""
    from multiclust_tpu.opt.driver import fit
    from multiclust_tpu.runtime.observe import make_trace_printer

    printer = make_trace_printer(opt.verbosity)
    params = _single_init(key, md, K, cfg, opt, codes, warm,
                          md_score=md_score)
    from multiclust_tpu.model.bucketed import BucketedData, \
        split_params_like
    if isinstance(md_fit, BucketedData):
        params = split_params_like(
            _pad_params_rows(params, md_fit.I, cfg), md_fit)
    else:
        params = _pad_params_loci(
            _pad_params_rows(params, md_fit.I, cfg), md_fit.L)
    res = fit(params, md_fit, cfg, n_seconds=opt.n_seconds, start_time=t0,
              trace=(lambda st, kind="EM": printer(st, kind))
              if printer else None)
    states = tree_map(lambda x: jnp.asarray(x)[None], res.state)
    return states, res.time_stop, 1


def _single_init(key, md, K, cfg, opt, codes, warm, md_score=None):
    if warm is not None:
        return _pad_k(warm, cfg)
    return _pad_k(rinit.initialize(
        key, md, K, cfg, method=opt.initialization_method,
        procedure=opt.initialization_procedure,
        n_rand_em_init=opt.n_rand_em_init, codes=codes,
        md_score=md_score), cfg)


def hard_partition(params: Params, md: ModelData, admixture: bool):
    """MAP cluster per individual (partition_mixture write_file.c:582-600;
    partition_admixture :350-382)."""
    if admixture:
        from multiclust_tpu.model.admixture import posterior_allele_mass
        dik = posterior_allele_mass(params, md)
        return np.asarray(jnp.argmax(dik, axis=1))
    from multiclust_tpu.model.mixture import e_step
    v, _, _ = e_step(params, md)
    return np.asarray(jnp.argmax(v, axis=1))


def _score_arand(res: MaximizeResult, md, opt: Options, true_partition):
    if true_partition is None or res.best_params is None:
        return
    from multiclust_tpu.stats.rand_index import adjusted_rand
    assign = hard_partition(res.best_params, md, opt.admixture)
    res.arand = adjusted_rand(np.asarray(true_partition), assign)
