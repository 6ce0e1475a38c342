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
    n_obs = ploidy - md.miss.astype(jnp.int32)
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
    if md.row_valid is not None:
        # mesh-padding rows (runtime/ingest) are inert ONLY because
        # their counts are zero - a replicate must not hallucinate
        # genotypes for them
        counts = jnp.where(md.row_valid[:, None, None], counts, 0.0)
    return counts


@dataclasses.dataclass
class BootstrapResult:
    ts_obs: float
    ts_bs: List[float]
    pvalue: float
    null_K: int
    alt_K: int


def replicate_chunk(md: ModelData, n_init: int, n_reps: int,
                    hbm_budget: float = 4e9) -> int:
    """Replicates fitted concurrently: each (replicate x init) chain costs
    ~3 [I, L*M] tensors on the XLA path plus its replicate's count tensor."""
    itemsize = jnp.dtype(md.dtype).itemsize
    per_chain = 3 * md.I * md.L * md.M * itemsize
    per_rep = per_chain * max(n_init, 1) + md.I * md.L * md.M * 4
    return max(1, min(n_reps, int(hbm_budget // max(per_rep, 1))))


def _fit_lattice(params_rb: Params, md_b: ModelData, cfg, segment: int = 16):
    """Run an [R, B] lattice of EM chains to convergence in lockstep -
    params leaves [R, B, ...], data leaves [R, ...] (each replicate's B
    init chains share its data).  The per-chain masked stopping machinery
    (opt/em.py) freezes finished lanes; the loop exits when every chain in
    the lattice has stopped."""
    from multiclust_tpu.config import AccelScheme
    from multiclust_tpu.opt import em as em_mod

    accel = cfg.accel_scheme != int(AccelScheme.NONE)
    body = (em_mod.accel_macro_step if accel else em_mod.plain_step)

    def start_one(params, md):
        md = md.prepare_for_em(bi=cfg.bi_repr_active or cfg.biallelic)
        state = em_mod.init_state(params, cfg)
        for _ in range(cfg.n_init_iter):
            state = em_mod.plain_step(state, md, cfg)
        if accel:
            for _ in range(cfg.q - 1):
                state = em_mod.two_em_steps(state, md, cfg)[0]
        return state

    def seg_one(state, md):
        md = md.prepare_for_em(bi=cfg.bi_repr_active or cfg.biallelic)
        return jax.lax.fori_loop(
            0, segment, lambda i, s: body(s, md, cfg), state)

    start = jax.jit(jax.vmap(jax.vmap(start_one, in_axes=(0, None)),
                             in_axes=(0, 0)))
    seg = jax.jit(jax.vmap(jax.vmap(seg_one, in_axes=(0, None)),
                           in_axes=(0, 0)), donate_argnums=0)

    state = start(params_rb, md_b)
    while True:
        stopped = np.asarray(state.stopped)
        if stopped.all():
            return state
        state = seg(state, md_b)


def _batched_ts(key, md: ModelData, opt, h0_params: Params, ploidy: int,
                n_reps: int, checkpoint_dir=None) -> np.ndarray:
    """Fit H0 (K-1) and Ha (K) on ``n_reps`` simulated replicates as
    vmapped (replicate x init) chain lattices; returns the replicate test
    statistics.  Replaces the reference's serial refit loop
    (multiclust.c:681) per SURVEY.md section 2.3 (bootstrap parallelism).

    ``checkpoint_dir`` persists (ts-so-far, next replicate, PRNG key)
    after every chunk (runtime/checkpoint.save_bootstrap); a resumed run
    skips completed replicates and reproduces the identical ts list (the
    per-chunk key splits are replayed from the saved key)."""
    from multiclust_tpu.init.random import codes_from_counts_jax, initialize
    from multiclust_tpu.runtime.multistart import _loci_pad_target, \
        _pad_k, _pad_md_rows, _pad_params_loci, _pad_params_rows, \
        _row_pad_target, _to_bi_repr, cfg_from_options

    B = max(opt.n_init, 1)
    chunk = replicate_chunk(md, B, n_reps)

    # jagged-M panels: replicate lattices ride the bucketed
    # representation too (round 5; model/bucketed.py) - each replicate's
    # count tensor buckets by the SHARED plan (n_alleles is
    # replicate-invariant).  Off-mesh only (the jagged mesh composition
    # is data-axis GSPMD, which the [R, B] lattice does not use).
    plan = bd_template = None
    if md.M > 2 and not opt.mesh_shape:
        from multiclust_tpu.model.bucketed import bucketize_model_data, \
            plan_buckets, worth_bucketing
        n_all = np.asarray(jax.device_get(md.n_alleles))
        if worth_bucketing(n_all):
            plan = plan_buckets(n_all, md.M, tight=True)
            if plan is not None:
                bd_template = bucketize_model_data(md, plan)
    ts = []
    start = 0
    if checkpoint_dir:
        loaded = _load_bootstrap_synced(checkpoint_dir, opt.max_K - 1,
                                        opt.max_K, n_reps, key)
        # resume only on a chunk boundary consistent with this run's
        # deterministic chunking (chunk size derives from md/opt alone)
        if loaded is not None and loaded[1] % chunk == 0 \
                and loaded[1] == len(loaded[0]):
            done_ts, start, key = loaded
            if start:
                ts.append(done_ts)
    for lo in range(start, n_reps, chunk):
        c = min(chunk, n_reps - lo)
        key, ksim, kinit = jax.random.split(key, 3)
        counts_b = jax.vmap(
            lambda k: simulate_replicate(k, h0_params, md, ploidy,
                                         opt.admixture)
        )(jax.random.split(ksim, c))                   # [c, I, L, M]
        codes_b = None
        if opt.admixture:
            codes_b = jax.vmap(
                lambda x: codes_from_counts_jax(x, md.miss, ploidy)
            )(counts_b)

        maxll = {}
        for K in (opt.max_K - 1, opt.max_K):
            cfg = cfg_from_options(opt, K, md)
            # candidates initialize on the UNPADDED replicate data (codes
            # carry the unpadded [I, L, P] shape); the lattice fit runs on
            # the row/loci-padded - and, under --mesh, sharded - variant
            md_b = jax.vmap(
                lambda x: md._replace(x=x.astype(md.x.dtype), x_flat=None,
                                      x_bi=None, miss_st=None)
            )(counts_b)
            Ip = _row_pad_target(md.I, cfg) or md.I
            Lp = _loci_pad_target(md.L, Ip, cfg)
            if plan is not None:
                from multiclust_tpu.model.bucketed import \
                    bucketize_model_data
                md_fit_b = jax.vmap(
                    lambda m: _pad_md_rows(
                        bucketize_model_data(m, plan), Ip))(md_b)
            else:
                md_fit_b = md_b
                if Ip != md.I or Lp != md.L:
                    from multiclust_tpu.runtime import mesh as mesh_mod
                    md_fit_b = jax.vmap(
                        lambda m: mesh_mod.pad_md_rows_loci(m, Ip, Lp)
                    )(md_b)
                if cfg.mesh is not None:
                    # replicate x init stay vmap axes; I/L shard on the
                    # mesh (SURVEY.md 2.3 bootstrap parallelism + DP/TP)
                    md_fit_b = _shard_replicates(md_fit_b, cfg.mesh)

            def init_rep(kr, m, cd):
                def one(k):
                    params = initialize(
                        k, m, K, cfg, method=opt.initialization_method,
                        procedure=opt.initialization_procedure,
                        n_rand_em_init=opt.n_rand_em_init,
                        codes=cd if opt.admixture else None)
                    params = _pad_k(params, cfg)
                    params = _pad_params_rows(params, Ip, cfg)
                    return _pad_params_loci(params, Lp)
                return jax.vmap(one)(jax.random.split(kr, B))

            keys_r = jax.random.split(jax.random.fold_in(kinit, K), c)
            params_rb = jax.jit(jax.vmap(init_rep))(
                keys_r, md_b,
                codes_b if codes_b is not None
                else jnp.zeros((c, 1), jnp.int32))
            if bd_template is not None:
                # pre-split the lattice params by the shared bucket
                # shapes (per-step splitting would re-gather every
                # iteration); batch axes pass through split_params_like
                from multiclust_tpu.model.bucketed import \
                    split_params_like
                params_rb = split_params_like(params_rb, bd_template)
            else:
                # biallelic panels: carry the lattice in the
                # p0-representation so replicate fits run the fused
                # biallelic kernels (only the per-replicate max logL is
                # harvested - no unpad needed)
                params_rb = _to_bi_repr(params_rb, cfg, Ip, Lp)
                if cfg.mesh is not None:
                    params_rb = _shard_lattice_params(params_rb, cfg.mesh)
            state = _fit_lattice(params_rb, md_fit_b, cfg)
            lls = np.asarray(state.logL_hi + state.logL_lo)   # [c, B]
            lls = np.where(np.isfinite(lls), lls, -np.inf)
            maxll[K] = lls.max(axis=1)
        ts.append(maxll[opt.max_K] - maxll[opt.max_K - 1])
        if checkpoint_dir:
            _save_bootstrap_synced(checkpoint_dir, opt.max_K - 1,
                                   opt.max_K, n_reps, np.concatenate(ts),
                                   lo + c, key)
    return np.concatenate(ts)


def _save_bootstrap_synced(checkpoint_dir, null_K, alt_K, n_reps, ts,
                           next_rep, key) -> None:
    """Multi-process-safe checkpoint write: process 0 owns the file (the
    ts/progress/key state is replicated, so one writer suffices and a
    partially-written file can never diverge readers - the load side
    broadcasts process 0's view)."""
    import jax

    from multiclust_tpu.runtime import checkpoint as ckpt
    if jax.process_index() == 0:
        ckpt.save_bootstrap(checkpoint_dir, null_K, alt_K, n_reps, ts,
                            next_rep, key)


def _load_bootstrap_synced(checkpoint_dir, null_K, alt_K, n_reps, key):
    """Multi-process-safe checkpoint load: process 0 reads (the
    processes need not share a filesystem) and BROADCASTS (found, ts,
    next_rep, key) so every process resumes from the identical state -
    the round-4 gate's partially-visible-file divergence cannot happen
    (VERDICT r4 item 3c; runtime/mesh.sync_host_flag pattern)."""
    import jax

    from multiclust_tpu.runtime import checkpoint as ckpt
    if jax.process_count() == 1:
        return ckpt.load_bootstrap(checkpoint_dir, null_K, alt_K, n_reps)
    from jax.experimental import multihost_utils

    found = np.zeros((), np.int32)
    ts_pad = np.zeros((n_reps,), np.float64)
    nxt = np.zeros((), np.int32)
    key_arr = np.asarray(key)
    if jax.process_index() == 0:
        loaded = ckpt.load_bootstrap(checkpoint_dir, null_K, alt_K,
                                     n_reps)
        if loaded is not None:
            done_ts, start, saved_key = loaded
            if len(done_ts) == start:      # well-formed checkpoint
                found = np.ones((), np.int32)
                ts_pad[:start] = np.asarray(done_ts, np.float64)
                nxt = np.asarray(start, np.int32)
                key_arr = np.asarray(saved_key)
    found, ts_pad, nxt, key_arr = multihost_utils.broadcast_one_to_all(
        (found, ts_pad, nxt, key_arr))
    if not int(found):
        return None
    start = int(nxt)
    return ts_pad[:start], start, jnp.asarray(key_arr)


def _shard_replicates(md_b: ModelData, mesh):
    """Place a replicate-stacked ModelData ([c, ...] leaves) on the mesh:
    individuals on the data axis, loci on the model axis, the replicate
    axis vmapped (replicated placement-wise)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multiclust_tpu.runtime.mesh import DATA_AXIS, MODEL_AXIS, \
        _feasible_spec

    specs = ModelData(
        x=P(None, DATA_AXIS, MODEL_AXIS, None),
        miss=P(None, DATA_AXIS, MODEL_AXIS),
        mask=P(None, MODEL_AXIS, None),
        n_alleles=P(None, MODEL_AXIS),
        row_valid=(P(None, DATA_AXIS) if md_b.row_valid is not None
                   else None))
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, _feasible_spec(x, s, mesh))), md_b,
        specs)


def _shard_lattice_params(params_rb: Params, mesh):
    """Place a [replicate, init, ...] parameter lattice on the mesh
    (admixture eta rows on the data axis, p loci on the model axis)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multiclust_tpu.runtime.mesh import DATA_AXIS, MODEL_AXIS, \
        _feasible_spec

    if params_rb.eta.ndim < 4:   # mixture/constrained: [c, B, K]
        specs = Params(eta=P(), p=P(None, None, None, MODEL_AXIS, None))
    elif params_rb.p.ndim == params_rb.eta.ndim:
        # biallelic p0-representation: p [c, B, Kp, Lp]
        specs = Params(eta=P(None, None, DATA_AXIS, None),
                       p=P(None, None, None, MODEL_AXIS))
    else:
        specs = Params(eta=P(None, None, DATA_AXIS, None),
                       p=P(None, None, None, MODEL_AXIS, None))
    if params_rb.kmask is not None:
        specs = specs._replace(kmask=P())
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, _feasible_spec(x, s, mesh))),
        params_rb, specs)


def run_bootstrap(key, md: ModelData, opt, n_parameters_fn, ts_obs: float,
                  h0_params: Params, ploidy: int,
                  codes_fn: Optional[Callable] = None,
                  log: Optional[Callable] = None,
                  checkpoint_dir: Optional[str] = None) -> BootstrapResult:
    """run_bootstrap (multiclust.c:675-708).

    Default: replicates fit as BATCHED (replicate x init) chain lattices,
    chunked by an HBM estimate - sublinear wall-clock in -b (SURVEY.md
    section 2.3 bootstrap parallelism); under --mesh the lattice's I/L
    axes shard across the device mesh while replicate x init stay vmap
    axes.  The serial per-replicate loop remains for the stop regimes
    whose bookkeeping is inherently sequential (-t / -u) and
    per-iteration verbosity.

    ``checkpoint_dir`` persists progress after every chunk (batched) or
    replicate (serial); a killed run resumes with an identical ts list
    and p-value (the one place A4 checkpointing matters at scale - a
    -b 100 run is 200+ full multi-start fits)."""
    exotic = (opt.target_ll or opt.target_revisit or opt.n_seconds
              or opt.verbosity > 3)
    if not exotic:
        ts_arr = _batched_ts(key, md, opt, h0_params, ploidy,
                             opt.n_bootstrap,
                             checkpoint_dir=checkpoint_dir)
        ntime = 0
        for rep, t in enumerate(ts_arr):
            if t >= ts_obs:
                ntime += 1
            if log:
                log(rep, float(t), ntime)
        return BootstrapResult(
            ts_obs=ts_obs, ts_bs=[float(t) for t in ts_arr],
            pvalue=ntime / opt.n_bootstrap,
            null_K=opt.max_K - 1, alt_K=opt.max_K)

    from multiclust_tpu.init.random import codes_from_counts_jax
    from multiclust_tpu.runtime.ksweep import estimate_model

    ntime = 0
    ts_list = []
    start = 0
    if checkpoint_dir:
        loaded = _load_bootstrap_synced(checkpoint_dir, opt.max_K - 1,
                                        opt.max_K, opt.n_bootstrap, key)
        if loaded is not None and loaded[1] == len(loaded[0]):
            done_ts, start, key = loaded
            ts_list = [float(t) for t in done_ts]
            ntime = sum(1 for t in ts_list if t >= ts_obs)
    for rep in range(start, opt.n_bootstrap):
        key, ksim, kfit = jax.random.split(key, 3)
        counts = simulate_replicate(ksim, h0_params, md, ploidy,
                                    opt.admixture)
        md_rep = md._replace(x=counts.astype(md.x.dtype),  # keeps storage dtype
                             x_flat=None, x_bi=None, miss_st=None)
        codes = None
        if opt.admixture:
            # device-side codes (codes_from_counts_jax): counts may be a
            # multi-process sharded global array a host transfer cannot
            # materialize; the jnp math is identical
            codes = codes_from_counts_jax(counts.astype(jnp.int32),
                                          md.miss, ploidy)
        est = estimate_model(kfit, md_rep, opt, n_parameters_fn,
                             codes=codes, bootstrap=True)
        ts_list.append(est.ts)
        if est.ts >= ts_obs:
            ntime += 1
        if log:
            log(rep, est.ts, ntime)
        if checkpoint_dir:
            _save_bootstrap_synced(checkpoint_dir, opt.max_K - 1,
                                   opt.max_K, opt.n_bootstrap,
                                   np.asarray(ts_list), rep + 1, key)
    return BootstrapResult(
        ts_obs=ts_obs, ts_bs=ts_list,
        pvalue=ntime / opt.n_bootstrap,
        null_K=opt.max_K - 1, alt_K=opt.max_K)
