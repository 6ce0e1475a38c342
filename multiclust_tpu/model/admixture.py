"""Admixture model: each allele copy independently sourced from a cluster.

Likelihood (logL_admixture, log_likelihood.c:96-147):
    logL = sum_{i,l,m} x_ilm log( sum_k eta_(i)k p_klm )

The reference E-step materializes the responsibility tensor
``d[i][k][l][m]`` (e_step_admixture_orig, em_alg.c:291-486) and the M-step
re-reduces it (m_step_admixture_orig, em_alg.c:592-754), with missing copies
contributing unnormalized mass ``eta_ik p_klm miss_il`` (em_alg.c:400-431).

TPU formulation - never materialize d.  With w_ilm = x_ilm / denom_ilm and
denom_ilm = sum_k eta_ik p_klm, the complete EM step is four MXU matmuls:

    denom = eta @ p                    [I,K] x [K,LM] -> [I,LM]
    A     = w @ p^T                    [I,LM] x [LM,K] -> [I,K]
    B     = eta^T @ w                  [K,I] x [I,LM] -> [K,LM]
    C     = eta^T @ miss               [K,I] x [I,L]  -> [K,L]

because  sum_lm d_iklm = eta_ik (A_ik + sum_l miss_il)         (eta update)
and      sum_i  d_iklm = p_klm (B_klm + C_kl)                  (p update),
each normalized exactly as the reference does (per-individual over k; per
(k,l) over valid alleles).  The log likelihood is sum x log(denom).

With constrained eta (-c) the denominator loses its i dependence and the
whole step collapses onto [L,M] tensors via the column sums of x - the
per-iteration cost drops from O(I K L M) to O(K L M) + one-time O(I L M).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multiclust_tpu.model.common import Array, EMConfig, ModelData, Params, \
    safe_log
from multiclust_tpu.ops import df64
from multiclust_tpu.ops.simplex import project_rows


def _safe_div(num: Array, den: Array) -> Array:
    ok = num > 0
    return jnp.where(ok, num / jnp.where(den > 0, den, 1.0), 0.0)


def _k_valid(cfg: EMConfig, Kp: int):
    """Static bool[Kp] marking true clusters under the K-padded layout
    (cfg.k_true), or None when the parameters are unpadded."""
    kt = cfg.k_true or Kp
    if kt == Kp:
        return None
    return jnp.asarray(np.arange(Kp) < kt)


def _project_eta_rows(eta: Array, cfg: EMConfig, kmask=None) -> Array:
    """``kmask`` (Params.kmask, [Kp] 1.0/0.0) overrides the static
    cfg.k_true lane mask: mixed-K swept lattices carry the true-lane set
    as data so one compiled step serves every K (runtime/ksweep.py)."""
    Kp = eta.shape[-1]
    if kmask is not None:
        return project_rows(eta, kmask > 0.5, 0, cfg.eta_lower_bound)
    kv = _k_valid(cfg, Kp)
    if kv is None:
        return project_rows(eta, jnp.ones((Kp,), bool), Kp,
                            cfg.eta_lower_bound)
    return project_rows(eta, kv, cfg.k_true, cfg.eta_lower_bound)


def _normalize_p(pc: Array, md: ModelData, cfg: EMConfig, kmask=None
                 ) -> Array:
    tot = jnp.sum(pc, axis=2, keepdims=True)
    p = jnp.where(md.mask[None] & (tot > 0), pc / jnp.where(tot > 0, tot, 1.0),
                  0.0)
    if cfg.do_projection:
        p = project_rows(p, md.mask[None], md.n_alleles[None, :],
                         cfg.p_lower_bound)
        if kmask is not None:
            p = jnp.where((kmask > 0.5)[:, None, None], p, 0.0)
        else:
            kv = _k_valid(cfg, p.shape[0])
            if kv is not None:
                # keep K-padding rows exactly zero (projection would lift
                # them)
                p = jnp.where(kv[:, None, None], p, 0.0)
    return p


def em_step(params: Params, md: ModelData, cfg: EMConfig,
            want_ll: bool = True) -> Tuple[Params, df64.DF, Array]:
    """One fused E+M iteration; logL is that of the INPUT params.

    ``want_ll=False`` (static) skips the logL accumulation - the per-cell
    log is the dominant VPU cost of the fused kernels once the MXU stops
    being contraction-bound (BASELINE.md small-K analysis) - and returns
    zero ll/scale.  Used by the check-interval driver
    (opt/em.blind_plain_steps) for the iterations between stop() checks.
    """
    from multiclust_tpu.model.bucketed import BucketedData
    if isinstance(md, BucketedData):
        return _em_step_bucketed(params, md, cfg, want_ll)
    if cfg.eta_constrained:
        return _em_step_constrained(params, md, cfg)
    from multiclust_tpu.model.common import is_bi_repr
    if cfg.bi_repr_active and is_bi_repr(params):
        return _em_step_bi_repr(params, md, cfg, want_ll)
    if cfg.use_pallas != "off" and params.p.dtype == jnp.float32:
        return _em_step_unconstrained_pallas(params, md, cfg, want_ll)
    return _em_step_unconstrained(params, md, cfg, want_ll)


def _bi_inputs(md: ModelData):
    """x0/x1 [I, L] per-allele counts in storage dtype.  Prefer the
    prepared md.x_bi alias (ModelData.prepare_for_em(bi=True)): the
    strided x[:, :, m] slices are NOT hoisted out of the EM while-loop by
    XLA and cost ~120us/iter of HBM traffic on the bench shape."""
    if md.x_bi is not None:
        return md.x_bi[0], md.x_bi[1]
    return md.x[:, :, 0], md.x[:, :, 1]


def _bi_miss_inputs(md, cfg, Lp: int, dtype):
    """(c [I,1], miss [I,Lp] or None) for the biallelic kernel.  The miss
    stream uses the storage-dtype alias (ModelData.prepare_for_em) so HBM
    sees 1 byte/cell; pads (loop-invariant, hoisted) are zero = inert."""
    if not cfg.has_missing:
        return jnp.zeros((md.I, 1), dtype), None
    c = jnp.sum(md.miss.astype(dtype), axis=1, keepdims=True)
    miss = md.miss_st if md.miss_st is not None else md.miss
    dL = Lp - md.L
    if dL:
        miss = jnp.pad(miss, ((0, 0), (0, dL)))
    return c, miss


def _p0_clip_bounds(plb: float):
    """(lb, ub) for the closed-form 2-simplex projection of p0: the upper
    bound stays strictly below 1 in f32 (see _fullstep_bi_kernel)."""
    ub = float(np.float32(1.0)
               - np.float32(max(plb, float(np.finfo(np.float32).eps))))
    return float(plb), ub


def _bi_fullstep_fn(mode: str, I: int, Kp: int, L: int, ti: int, tl: int):
    """Kernel callable for the layout ``mode`` picked by
    pick_layout_biallelic_any: 'resident' (single fused launch),
    'chunked' (chained one-pass launches over resident-budget column
    chunks - the biobank-L default), or 'streamed' (two-pass).  All three
    share the (eta, p0, x0, x1, c, miss, **kw) calling convention with
    kw = ti/tl/k_true/lb/plb/project/compute_t/emit_b/emit_a/interpret
    plus the optional runtime ``kmask`` lane mask (dynamic-K sweeps)."""
    from multiclust_tpu.ops.kernels import (
        admixture_fullstep_biallelic,
        admixture_fullstep_biallelic_chunked,
        admixture_fullstep_biallelic_streamed,
        pick_layout_biallelic_chunked)
    if mode == "resident":
        return admixture_fullstep_biallelic
    if mode == "chunked":
        ti2, tl2, Lc, n_chunks = pick_layout_biallelic_chunked(I, Kp, L)
        assert (ti2, tl2) == (ti, tl), (ti2, tl2, ti, tl)
        return functools.partial(admixture_fullstep_biallelic_chunked,
                                 n_chunks=n_chunks)
    assert mode == "streamed", mode
    return admixture_fullstep_biallelic_streamed


def _em_step_bi_repr_meshed(params, md, cfg, want_ll=True):
    """Biallelic p0-representation full step under a (data x loci) mesh:
    each shard runs the fused kernel on its (I_loc, L_loc) tile with
    ``emit_b=True`` - the B0/B1 accumulators are locus-local, so they
    psum only across DATA shards and the p update (normalization +
    closed-form 2-simplex projection) runs per model shard on its own
    loci.  With loci sharded (model_shards > 1) the kernel additionally
    runs ``emit_a=True``: the per-individual A+r accumulator covers only
    the shard's loci, so it (and the logL terms t) psums across MODEL
    shards before the eta epilogue (normalize + Michelot projection)
    finishes in XLA per data shard.  Same collective structure as
    _sharded_fullstep/_sharded_sweep, on the p0 representation.

    Layout contract: the engine pre-pads loci so every model shard's
    block is kernel-tile-aligned (runtime/multistart._loci_pad_target) -
    global pads sit at the tail, inert (zero x/miss, zero p0 kept zero
    by the masked p update)."""
    from jax.sharding import PartitionSpec as P

    from multiclust_tpu.ops.kernels import pick_layout_biallelic_any
    from multiclust_tpu.runtime.mesh import DATA_AXIS, MODEL_AXIS

    eta, p0 = params.eta, params.p
    Kp = eta.shape[-1]
    dd, mm = cfg.data_shards, cfg.model_shards
    assert md.I % dd == 0 and md.L % mm == 0, (md.I, dd, md.L, mm)
    L_loc = md.L // mm
    ti, tl, Lp_loc, mode = pick_layout_biallelic_any(
        md.I // dd, Kp, L_loc, emit_b=True)
    assert ti, (md.I, dd, mm, Kp, md.L)
    if mm > 1:
        # loci sharded: the engine pads loci to the layout's per-shard
        # tile multiple BEFORE converting to the representation
        # (runtime/multistart._loci_pad_target) - a global tail pad here
        # would land entirely on the last shard and misalign x vs p0
        assert Lp_loc == L_loc and p0.shape[-1] == md.L, \
            (md.I, dd, mm, Kp, md.L, p0.shape)
        Lp = md.L
    else:
        Lp = Lp_loc
        assert p0.shape[-1] == Lp, (md.L, Lp, p0.shape)
    fn = _bi_fullstep_fn(mode, md.I // dd, Kp, L_loc, ti, tl)
    emit_a = mm > 1
    x0, x1 = _bi_inputs(md)
    dL = Lp - md.L
    if dL:  # mm == 1: global tail pad, loop-invariant (hoisted)
        x0 = jnp.pad(x0, ((0, 0), (0, dL)))
        x1 = jnp.pad(x1, ((0, 0), (0, dL)))
    c, miss = _bi_miss_inputs(md, cfg, Lp, eta.dtype)
    interpret = cfg.use_pallas == "interpret"
    lb = float(cfg.eta_lower_bound)
    plb, pub = _p0_clip_bounds(cfg.p_lower_bound)

    kmask = params.kmask

    def local(eta_l, p0_l, x0_l, x1_l, c_l, *m):
        aout, per_i, b0, b1 = fn(
            eta_l, p0_l, x0_l, x1_l, c_l, m[0] if m else None,
            ti=ti, tl=tl, k_true=cfg.k_true, lb=lb, plb=plb,
            project=cfg.do_projection,
            project_eta=cfg.do_projection and kmask is None,
            compute_t=want_ll, emit_b=True,
            emit_a=emit_a, interpret=interpret)
        if emit_a:
            # per-individual reductions span all loci: merge A (raw, c
            # NOT included - it is a global total) and t over the model
            # axis, then finish the eta update in XLA per data shard
            A = jax.lax.psum(aout, MODEL_AXIS) + c_l
            if want_ll:
                per_i = jax.lax.psum(per_i, MODEL_AXIS)
            num = eta_l * A
            tot = jnp.sum(num, axis=1, keepdims=True)
            etan = jnp.where(tot > 0,
                             num / jnp.where(tot > 0, tot, 1.0), eta_l)
            if cfg.do_projection and kmask is None:
                etan = _project_eta_rows(etan, cfg)
        else:
            etan = aout
        if dd > 1:
            b0 = jax.lax.psum(b0, DATA_AXIS)
            b1 = jax.lax.psum(b1, DATA_AXIS)
        pc0 = p0_l * b0
        pc1 = (1.0 - p0_l) * b1
        tot = pc0 + pc1
        q0 = jnp.where(tot > 0, pc0 / jnp.where(tot > 0, tot, 1.0), 0.0)
        if cfg.do_projection:
            q0 = jnp.where(tot > 0, jnp.clip(q0, plb, pub), 0.0)
        return etan, per_i, q0

    in_specs = [P(DATA_AXIS, None), P(None, MODEL_AXIS),
                P(DATA_AXIS, MODEL_AXIS), P(DATA_AXIS, MODEL_AXIS),
                P(DATA_AXIS, None)]
    args = [eta, p0, x0, x1, c]
    if miss is not None:
        in_specs.append(P(DATA_AXIS, MODEL_AXIS))
        args.append(miss)
    eta_new, per_i, p0n = jax.shard_map(
        local, mesh=cfg.mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS), P(None, MODEL_AXIS)),
        check_vma=False)(*args)
    if cfg.do_projection and kmask is not None:
        # dynamic-K: the masked Michelot runs on the (row-sharded) global
        # eta - purely rowwise, so GSPMD keeps it collective-free
        eta_new = _project_eta_rows(eta_new, cfg, kmask)
    if not want_ll:
        z = jnp.zeros((), eta.dtype)
        return params._replace(eta=eta_new, p=p0n), (z, z), z
    ll = df64.df_sum(per_i)
    scale = jnp.sqrt(jnp.sum(per_i * per_i))
    return params._replace(eta=eta_new, p=p0n), ll, scale


def _em_step_bi_repr(params, md, cfg, want_ll=True):
    """Biallelic full step on the p0-representation: params.p IS p0
    [Kp, Lp] (kernel tile layout, pads zero), so NO per-iteration [K, L, 2]
    relayout happens - one pallas_call per EM iteration (two for the
    streamed biobank-L variant), everything else is the [I] logL
    reduction."""
    from multiclust_tpu.ops.kernels import pick_layout_biallelic_any

    if cfg.mesh is not None and (cfg.data_shards > 1
                                 or cfg.model_shards > 1):
        return _em_step_bi_repr_meshed(params, md, cfg, want_ll)

    eta, p0 = params.eta, params.p
    Kp = eta.shape[-1]
    ti, tl, Lp, mode = pick_layout_biallelic_any(md.I, Kp, md.L)
    assert ti and p0.shape[-1] == Lp, (md.I, Kp, md.L, p0.shape)
    x0, x1 = _bi_inputs(md)
    dL = Lp - md.L
    if dL:
        x0 = jnp.pad(x0, ((0, 0), (0, dL)))
        x1 = jnp.pad(x1, ((0, 0), (0, dL)))
    c, miss = _bi_miss_inputs(md, cfg, Lp, eta.dtype)
    fn = _bi_fullstep_fn(mode, md.I, Kp, md.L, ti, tl)
    # dynamic-K: the kernel reads the RUNTIME kmask and keeps the whole
    # eta Michelot on-chip (round-5: the XLA-relocation alternative
    # measured +43% per EM segment; and the p clip must never be
    # dropped with it - it shares the `project` flag)
    eta_new, per_i, p0n = fn(
        eta, p0, x0, x1, c, miss, kmask=params.kmask,
        ti=ti, tl=tl, k_true=cfg.k_true,
        lb=float(cfg.eta_lower_bound), plb=float(cfg.p_lower_bound),
        project=cfg.do_projection,
        compute_t=want_ll, interpret=cfg.use_pallas == "interpret")
    if not want_ll:
        z = jnp.zeros((), eta.dtype)
        return params._replace(eta=eta_new, p=p0n), (z, z), z
    ll = df64.df_sum(per_i)
    scale = jnp.sqrt(jnp.sum(per_i * per_i))
    return params._replace(eta=eta_new, p=p0n), ll, scale


def log_likelihood_bi_repr(params: Params, md: ModelData):
    """df64 logL on the p0-representation (used by the accelerated accept
    test); same math as the kernel's t accumulation."""
    eta = params.eta
    p0 = params.p[:, :md.L]
    d0 = eta @ p0                                     # [I, L]
    s = jnp.sum(eta, axis=1, keepdims=True)
    d1 = s - d0
    x0 = md.x[:, :, 0].astype(md.dtype)
    x1 = md.x[:, :, 1].astype(md.dtype)
    t = x0 * safe_log(d0) + x1 * safe_log(d1)
    per_i = jnp.sum(t, axis=1)
    return df64.df_sum(per_i), jnp.sqrt(jnp.sum(per_i * per_i))


def _sharded_fullstep(params, md, cfg, p2, x2, interpret, want_ll=True):
    """Pallas full step under jax.shard_map over the data axis (loci
    unsharded): each shard runs the fused kernel on its I-rows - the
    in-kernel eta update is purely per-individual, hence shard-local - and
    the p-update numerators B are psum-merged across data shards
    (SURVEY.md section 2.3: E-step embarrassingly parallel over i, M-step
    merges are psums).  Returns (eta_new, per_i, B2d) or None when the
    local shapes don't tile."""
    from jax.sharding import PartitionSpec as P

    from multiclust_tpu.ops.kernels import admixture_fullstep, pick_layout
    from multiclust_tpu.runtime.mesh import DATA_AXIS, MODEL_AXIS

    dd = cfg.data_shards
    K = params.K
    LM = md.L * md.M
    if md.I % dd != 0:
        return None
    ti, tl, LMp = pick_layout(md.I // dd, K, LM)
    if not ti:
        return None
    if LMp != LM:
        x2 = jnp.pad(x2, ((0, 0), (0, LMp - LM)))
        p2 = jnp.pad(p2, ((0, 0), (0, LMp - LM)))
    c = (jnp.sum(md.miss.astype(params.eta.dtype), axis=1,
                 keepdims=True) if cfg.has_missing
         else jnp.zeros((md.I, 1), params.eta.dtype))

    def local_step(eta_l, p2_g, x2_l, c_l):
        etan, per_i, B = admixture_fullstep(
            eta_l, p2_g, x2_l, c_l, ti=ti, tl=tl, k_true=cfg.k_true,
            lb=float(cfg.eta_lower_bound), project=cfg.do_projection,
            compute_t=want_ll, interpret=interpret)
        return etan, per_i, jax.lax.psum(B, DATA_AXIS)

    eta_new, per_i, B = jax.shard_map(
        local_step, mesh=cfg.mesh,
        in_specs=(P(DATA_AXIS, None), P(None, None),
                  P(DATA_AXIS, None), P(DATA_AXIS, None)),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS), P(None, None)),
        check_vma=False)(params.eta, p2, x2, c)
    return eta_new, per_i, B[:, :LM]


def _sharded_sweep(params, md, cfg, p2, x2, interpret, want_ll=True):
    """Pallas sweep statistics under a 2-D (data x loci) mesh: each shard
    streams its (I_local, LM_local) tile of x through the fused-sweep
    kernel; A/t psum over the loci axis (per-individual reductions span
    all loci), B psums over the data axis.  The eta/p epilogues run in XLA
    on the merged statistics."""
    from jax.sharding import PartitionSpec as P

    from multiclust_tpu.ops.kernels import admixture_sweep_fused, \
        admixture_sweep_stats, fused_fits, pad_for_kernel
    from multiclust_tpu.runtime.mesh import DATA_AXIS, MODEL_AXIS

    dd, mm = cfg.data_shards, cfg.model_shards
    K = params.K
    LM = md.L * md.M
    if md.I % dd != 0 or LM % mm != 0:
        return None

    def local_sweep(eta_l, p2_l, x2_l):
        eta_p, p2_p, x2_p, (I_l, K_l, LM_l) = pad_for_kernel(
            eta_l, p2_l, x2_l)
        if fused_fits(eta_p.shape[1], p2_p.shape[1]):
            A_p, t_p, B_p = admixture_sweep_fused(
                eta_p, p2_p, x2_p, compute_t=want_ll, interpret=interpret)
        else:
            A_p, t_p, B_p = admixture_sweep_stats(
                eta_p, p2_p, x2_p, compute_t=want_ll, interpret=interpret)
        A = jax.lax.psum(A_p[:I_l, :K_l], MODEL_AXIS)
        t = jax.lax.psum(t_p[:I_l], MODEL_AXIS)
        B = jax.lax.psum(B_p[:K_l, :LM_l], DATA_AXIS)
        return A, t, B

    return jax.shard_map(
        local_sweep, mesh=cfg.mesh,
        in_specs=(P(DATA_AXIS, None), P(None, MODEL_AXIS),
                  P(DATA_AXIS, MODEL_AXIS)),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS), P(None, MODEL_AXIS)),
        check_vma=False)(params.eta, p2, x2)


def _em_step_unconstrained(params, md, cfg, want_ll=True):
    eta, p = params.eta, params.p                     # [I,K], [K,L,M]
    K = params.K
    p2 = p.reshape(K, -1)                             # [K, LM]
    x2 = md.x2d                                       # [I, LM]

    denom = eta @ p2                                  # [I, LM]  (MXU)
    w = _safe_div(x2, denom)                          # [I, LM]

    if want_ll:
        t = jnp.where(x2 > 0, x2 * safe_log(denom), 0.0)
        per_i = jnp.sum(t, axis=1)
        ll = df64.df_sum(per_i)
        scale = jnp.sqrt(jnp.sum(per_i * per_i))
    else:
        z = jnp.zeros((), eta.dtype)
        ll, scale = (z, z), z

    # eta update: sum_lm d_iklm = eta_ik (A_ik + c_i)
    A = w @ p2.T                                      # [I, K]  (MXU)
    if cfg.has_missing:
        A = A + jnp.sum(md.miss.astype(A.dtype), axis=1, keepdims=True)
    eta_num = eta * A
    tot_eta = jnp.sum(eta_num, axis=1, keepdims=True)
    # padding rows (zero counts, zero missing) have zero mass; keep their
    # eta unchanged instead of 0/0
    eta_new = jnp.where(tot_eta > 0,
                        eta_num / jnp.where(tot_eta > 0, tot_eta, 1.0), eta)
    if cfg.do_projection:
        eta_new = _project_eta_rows(eta_new, cfg, params.kmask)

    # p update: sum_i d_iklm = p_klm (B_klm + C_kl)
    B = (eta.T @ w).reshape(K, md.L, md.M)            # [K, LM] (MXU)
    if cfg.has_missing:
        C = eta.T @ md.miss.astype(eta.dtype)         # [K, L]  (MXU)
        B = B + C[:, :, None]
    pc = p * B
    p_new = _normalize_p(pc, md, cfg, params.kmask)

    return params._replace(eta=eta_new, p=p_new), ll, scale


_K_LADDER_NOTICED = set()


def _notice_k_beyond_ladder(K: int) -> None:
    if K not in _K_LADDER_NOTICED:
        _K_LADDER_NOTICED.add(K)
        import sys
        print(f"multiclust-tpu: K lanes ({K}) exceed the TPU-verified "
              f"kernel ladder (1024); using the XLA formulation",
              file=sys.stderr)


def _em_step_unconstrained_pallas(params, md, cfg, want_ll=True):
    """Pallas path: the [I, LM] denominators/weights never touch HBM
    (ops/kernels.py); identical math to _em_step_unconstrained.

    Prefers the single-kernel FULL step (x streamed once, denominator
    matmul once per tile, B resident in VMEM, eta update+projection done
    on-chip at the last l step, eta buffer aliased in place) when the
    parameters carry the K-padded layout (cfg.k_true) and the shapes tile;
    otherwise the fused-sweep kernel with the epilogue in XLA; two-pass
    kernels when B would not fit in VMEM (very large LM)."""
    from multiclust_tpu.ops.kernels import admixture_fullstep, \
        admixture_sweep_fused, admixture_sweep_stats, fused_fits, \
        pad_for_kernel, pick_layout

    eta, p = params.eta, params.p
    K = params.K
    if K > 1024:
        # the kernel ladders are compile-verified only to Kp=1024
        # (ops/kernels round-5 probes); reference -k is unbounded
        # (multiclust.c:1447-1453), so larger fits take the XLA
        # formulation with a one-time notice
        _notice_k_beyond_ladder(K)
        return _em_step_unconstrained(params, md, cfg, want_ll)
    p2 = p.reshape(K, -1)
    # keep x in its storage dtype (possibly int8): the kernels cast tiles
    # in VMEM, so HBM sees 1 byte/cell instead of 4; prefer the
    # pre-flattened alias (md.prepare_for_em) so the reshape-relayout
    # happens outside the EM loop, not per iteration
    x2 = md.x_storage_2d
    interpret = cfg.use_pallas == "interpret"

    padded = cfg.k_true and K % 32 == 0 and eta.shape[-1] == K

    if cfg.mesh is not None and (cfg.data_shards > 1
                                 or cfg.model_shards > 1):
        return _em_step_unconstrained_pallas_meshed(
            params, md, cfg, p2, x2, padded, interpret, want_ll)

    if (cfg.bi_repr_active and cfg.k_true and K % 32 == 0
            and eta.shape[-1] == K):
        # full-p params outside the engine (serial driver, fit_k1): use
        # the biallelic kernel with per-iteration [K, L, 2] glue
        out = _em_step_biallelic_pallas(params, md, cfg, interpret, want_ll)
        if out is not None:
            return out

    ti = tl = LMp = 0
    if padded:
        ti, tl, LMp = pick_layout(md.I, K, md.L * md.M)
    if ti:
        LM = md.L * md.M
        if LMp != LM:  # x2 is loop-invariant: XLA hoists this pad
            x2 = jnp.pad(x2, ((0, 0), (0, LMp - LM)))
            p2 = jnp.pad(p2, ((0, 0), (0, LMp - LM)))
        c = (jnp.sum(md.miss.astype(params.eta.dtype), axis=1,
                 keepdims=True) if cfg.has_missing
             else jnp.zeros((md.I, 1), eta.dtype))
        # dynamic-K lattices (params.kmask): the kernel reads the
        # runtime lane mask and the Michelot stays on-chip
        eta_new, per_i, B = admixture_fullstep(
            eta, p2, x2, c, kmask=params.kmask,
            ti=ti, tl=tl, k_true=cfg.k_true,
            lb=float(cfg.eta_lower_bound),
            project=cfg.do_projection,
            compute_t=want_ll, interpret=interpret)
        B = B[:, :LM]
    else:
        eta_p, p2_p, x2_p, (I, _, LM) = pad_for_kernel(eta, p2, x2)
        if fused_fits(eta_p.shape[1], p2_p.shape[1]):
            A_p, t_p, B_p = admixture_sweep_fused(
                eta_p, p2_p, x2_p, compute_t=want_ll, interpret=interpret)
        else:
            A_p, t_p, B_p = admixture_sweep_stats(
                eta_p, p2_p, x2_p, compute_t=want_ll, interpret=interpret)
        A = A_p[:I, :K]
        B = B_p[:K, :LM]
        per_i = t_p[:I]

        if cfg.has_missing:
            A = A + jnp.sum(md.miss.astype(A.dtype), axis=1, keepdims=True)
        eta_num = eta * A
        tot_eta = jnp.sum(eta_num, axis=1, keepdims=True)
        eta_new = jnp.where(tot_eta > 0,
                            eta_num / jnp.where(tot_eta > 0, tot_eta, 1.0),
                            eta)
        if cfg.do_projection:
            eta_new = _project_eta_rows(eta_new, cfg, params.kmask)

    ll = df64.df_sum(per_i)
    scale = jnp.sqrt(jnp.sum(per_i * per_i))

    B = B.reshape(K, md.L, md.M)
    if cfg.has_missing:
        C = eta.T @ md.miss.astype(eta.dtype)
        B = B + C[:, :, None]
    pc = p * B
    p_new = _normalize_p(pc, md, cfg, params.kmask)
    return params._replace(eta=eta_new, p=p_new), ll, scale


def _em_step_biallelic_pallas(params, md, cfg, interpret, want_ll=True):
    """Biallelic full step: ONE kernel does the sweep, the eta update AND
    the p update (ops/kernels.admixture_fullstep_biallelic) - p1 = 1 - p0
    halves the denominator/A matmuls vs the generic fullstep and the B
    accumulators never leave VMEM.  Returns None when the shapes don't
    tile (caller falls through to the generic path).

    Edge divergence from the XLA path (documented): with projection OFF, a
    cluster whose eta column is exactly zero gets p = (0, 1) here vs the
    XLA epilogue's (0, 0)-then-unprojected row; with projection on (the
    default) eta >= lb makes the case unreachable."""
    from multiclust_tpu.ops.kernels import pick_layout_biallelic_any

    eta, p = params.eta, params.p
    K = params.K                                  # = Kp (K-padded layout)
    ti, tl, Lp, mode = pick_layout_biallelic_any(md.I, K, md.L)
    if not ti:
        return None
    dL = Lp - md.L
    p0 = p[:, :, 0]
    x = md.x                                      # [I, L, 2] storage dtype
    x0, x1 = x[:, :, 0], x[:, :, 1]
    if dL:  # loop-invariant: XLA hoists these pads out of the EM loop
        p0 = jnp.pad(p0, ((0, 0), (0, dL)))
        x0 = jnp.pad(x0, ((0, 0), (0, dL)))
        x1 = jnp.pad(x1, ((0, 0), (0, dL)))
    c, miss = _bi_miss_inputs(md, cfg, Lp, eta.dtype)
    fn = _bi_fullstep_fn(mode, md.I, K, md.L, ti, tl)
    eta_new, per_i, p0n = fn(
        eta, p0, x0, x1, c, miss, kmask=params.kmask,
        ti=ti, tl=tl, k_true=cfg.k_true,
        lb=float(cfg.eta_lower_bound), plb=float(cfg.p_lower_bound),
        project=cfg.do_projection,
        compute_t=want_ll, interpret=interpret)
    p0n = p0n[:, :md.L]
    kv = (params.kmask > 0.5 if params.kmask is not None
          else _k_valid(cfg, K))
    p1n = 1.0 - p0n if kv is None else jnp.where(kv[:, None], 1.0 - p0n,
                                                 0.0)
    p_new = jnp.stack([p0n, p1n], axis=-1)
    ll = df64.df_sum(per_i)
    scale = jnp.sqrt(jnp.sum(per_i * per_i))
    return params._replace(eta=eta_new, p=p_new), ll, scale


def _em_step_unconstrained_pallas_meshed(params, md, cfg, p2, x2, padded,
                                         interpret, want_ll=True):
    """Multi-chip Pallas step: full-step kernel per data shard when loci
    are unsharded, sweep kernels + XLA epilogue on a 2-D mesh, and the
    plain XLA/GSPMD formulation when the local shapes don't tile."""
    eta, p = params.eta, params.p
    K = params.K

    eta_new = None
    if cfg.model_shards == 1 and padded:
        out = _sharded_fullstep(params, md, cfg, p2, x2, interpret, want_ll)
        if out is not None:
            eta_new, per_i, B = out
    if eta_new is None:
        out = _sharded_sweep(params, md, cfg, p2, x2, interpret, want_ll)
        if out is None:
            return _em_step_unconstrained(params, md, cfg, want_ll)
        A, per_i, B = out
        if cfg.has_missing:
            A = A + jnp.sum(md.miss.astype(A.dtype), axis=1, keepdims=True)
        eta_num = eta * A
        tot_eta = jnp.sum(eta_num, axis=1, keepdims=True)
        eta_new = jnp.where(tot_eta > 0,
                            eta_num / jnp.where(tot_eta > 0, tot_eta, 1.0),
                            eta)
        if cfg.do_projection:
            eta_new = _project_eta_rows(eta_new, cfg)

    ll = df64.df_sum(per_i)
    scale = jnp.sqrt(jnp.sum(per_i * per_i))

    B = B.reshape(K, md.L, md.M)
    if cfg.has_missing:
        C = eta.T @ md.miss.astype(eta.dtype)
        B = B + C[:, :, None]
    pc = p * B
    p_new = _normalize_p(pc, md, cfg)
    return Params(eta=eta_new, p=p_new), ll, scale


def _bucket_sweep(eta, p_b, md_b, cfg, want_ll):
    """One bucket's XLA sweep statistics (A_b, t_b, B_b); A_b/t_b
    accumulate across buckets in the caller, B_b is locus-local."""
    K = p_b.shape[-3]
    p2 = p_b.reshape(K, md_b.L * md_b.M)
    x2 = md_b.x2d
    denom = eta @ p2
    w = _safe_div(x2, denom)
    if want_ll:
        t = jnp.sum(jnp.where(x2 > 0, x2 * safe_log(denom), 0.0), axis=1)
    else:
        t = jnp.zeros((md_b.I,), eta.dtype)
    return w @ p2.T, t, eta.T @ w


def _finish_bucket_p(p_b, B2, md_b, eta, cfg, kmask=None):
    """Per-bucket p epilogue: missing mass + normalization + projection
    (locus-local, em_alg.c:592-754)."""
    B = B2.reshape(p_b.shape[-3], md_b.L, md_b.M)
    if cfg.has_missing:
        C = eta.T @ md_b.miss.astype(eta.dtype)
        B = B + C[:, :, None]
    return _normalize_p(p_b * B, md_b, cfg, kmask)


def _bucketed_p_epilogue(Bs, params, bd, cfg, eta):
    """ONE consolidated p epilogue over all buckets (sorted locus
    order): missing mass, normalization and projection are latency-bound
    in XLA op COUNT, not work, so n_buckets separate epilogues cost
    ~n_buckets x the single dense one (round-4 probes: ~150 us/launch of
    small-op dispatch).  ``Bs`` are the per-bucket [K, LM_b] p-update
    numerators."""
    M_max = bd.M
    pcs = []
    for md_b, p_b, B2 in zip(bd.buckets, params.p, Bs):
        B = B2.reshape(p_b.shape[-3], md_b.L, md_b.M)
        if cfg.has_missing:
            Cb = eta.T @ md_b.miss.astype(eta.dtype)
            B = B + Cb[:, :, None]
        pc = p_b * B
        if md_b.M < M_max:
            pc = jnp.pad(pc, ((0, 0), (0, 0), (0, M_max - md_b.M)))
        pcs.append(pc)
    pc_all = jnp.concatenate(pcs, axis=1)              # [K, L, M_max]
    mask_all = jnp.concatenate(
        [jnp.pad(b.mask, ((0, 0), (0, M_max - b.M))) for b in bd.buckets],
        axis=0)                                        # loop-invariant
    n_all = jnp.concatenate([b.n_alleles for b in bd.buckets])
    md_like = bd.buckets[0]._replace(mask=mask_all, n_alleles=n_all)
    p_dense = _normalize_p(pc_all, md_like, cfg, params.kmask)
    new_ps = []
    lo = 0
    for b in bd.buckets:
        new_ps.append(p_dense[:, lo:lo + b.L, :b.M])
        lo += b.L
    return tuple(new_ps)


def _bucketed_fullstep_fused(params, bd, cfg, want_ll):
    """Jagged-M Pallas path: the admixture kernel treats every (l, m)
    LANE independently - locus structure only matters in the p epilogue
    - so the WHOLE jagged panel runs as ONE fullstep launch over the
    concatenated bucket lane matrix (bd.x_lanes), at uniform-kernel
    efficiency with zero M_max padding (em_alg.c:291-486 restructured
    over the jagged `uniquealleles` lane space of read_file.c:443-600).
    The in-kernel eta update (normalize + Michelot) and the resident B
    accumulator work exactly as in the uniform case; B splits back per
    bucket for the consolidated locus-local p epilogue.  Falls back to
    the chained per-bucket variant (B beyond the VMEM budget) and then
    to XLA matmuls when shapes don't admit."""
    from multiclust_tpu.ops.kernels import admixture_fullstep, pick_layout

    eta = params.eta
    K = eta.shape[-1]
    lane_sizes = [md_b.L * md_b.M for md_b in bd.buckets]
    LM = sum(lane_sizes)
    x2 = bd.x_lanes
    if x2 is None:
        # prepare_for_em not called (shouldn't happen in the engine):
        # build the lane matrix here - the pad is then per-iteration
        # (not hoisted), so this path is correct but slow
        from multiclust_tpu.model.bucketed import lane_pad
        x2 = jnp.concatenate(
            [md_b.x_storage_2d for md_b in bd.buckets], axis=1)
        W = lane_pad(bd.I, LM)
        if W != LM:
            x2 = jnp.pad(x2, ((0, 0), (0, W - LM)))
    W = x2.shape[1]
    ti, tl, LMp = pick_layout(bd.I, K, W)
    if not ti or LMp != W:
        # W is already tile-aligned (prepare_for_em lane_pad), so this
        # only fires when I doesn't divide any ladder tile or the
        # resident-B budget fails - the chained/XLA fallbacks take over
        return None
    p2 = jnp.concatenate(
        [p_b.reshape(K, n) for p_b, n in zip(params.p, lane_sizes)],
        axis=1)
    if W != LM:
        # TIGHT plans: only the [Kp, W-LM] zero tail of p2 is built per
        # iteration (sub-100KB) - the x tail pad is baked into x_lanes
        p2 = jnp.pad(p2, ((0, 0), (0, W - LM)))
    c = (sum(jnp.sum(md_b.miss.astype(eta.dtype), axis=1, keepdims=True)
             for md_b in bd.buckets) if cfg.has_missing
         else jnp.zeros((bd.I, 1), eta.dtype))
    eta_new, per_i, B = admixture_fullstep(
        eta, p2, x2, c, kmask=params.kmask,
        ti=ti, tl=tl, k_true=cfg.k_true,
        lb=float(cfg.eta_lower_bound),
        project=cfg.do_projection,
        compute_t=want_ll, interpret=cfg.use_pallas == "interpret")
    Bs = []
    lo = 0
    for n in lane_sizes:
        Bs.append(B[:, lo:lo + n])
        lo += n
    new_ps = _bucketed_p_epilogue(Bs, params, bd, cfg, eta)
    if want_ll:
        ll = df64.df_sum(per_i)
        scale = jnp.sqrt(jnp.sum(per_i * per_i))
    else:
        z = jnp.zeros((), eta.dtype)
        ll, scale = (z, z), z
    return params._replace(eta=eta_new, p=new_ps), ll, scale


def _bucketed_fullstep_chain(params, bd, cfg, want_ll):
    """Chained per-bucket FULLSTEP launches for jagged panels whose
    concatenated lane space exceeds the fused kernel's resident-B
    budget: the per-individual A accumulator THREADS through the chain
    (a0 input, ops/kernels.admixture_fullstep) - non-final buckets emit
    raw A (emit_a), the final bucket adds the missing totals and
    finishes the eta update on-chip.  Returns None when a bucket's
    shape doesn't tile (caller falls back to the XLA loop)."""
    from multiclust_tpu.ops.kernels import admixture_fullstep, pick_layout

    eta = params.eta
    K = eta.shape[-1]
    layouts = [pick_layout(bd.I, K, md_b.L * md_b.M) for md_b in bd.buckets]
    if any(ti == 0 for ti, _, _ in layouts):
        return None
    interpret = cfg.use_pallas == "interpret"
    zero_c = jnp.zeros((bd.I, 1), eta.dtype)
    c = zero_c
    if cfg.has_missing:
        c = sum(jnp.sum(md_b.miss.astype(eta.dtype), axis=1, keepdims=True)
                for md_b in bd.buckets)

    a0 = None
    per_i = None
    Bs = []
    n = len(bd.buckets)
    for j, (md_b, p_b) in enumerate(zip(bd.buckets, params.p)):
        ti, tl, LMp = layouts[j]
        LM = md_b.L * md_b.M
        p2 = p_b.reshape(K, LM)
        x2 = md_b.x_storage_2d
        if LMp != LM:  # loop-invariant x pad (lane counts tile-aligned
            p2 = jnp.pad(p2, ((0, 0), (0, LMp - LM)))   # by _pad_L, so
            x2 = jnp.pad(x2, ((0, 0), (0, LMp - LM)))   # normally 0)
        last = j == n - 1
        aout, t_b, B = admixture_fullstep(
            eta, p2, x2, c if last else zero_c, a0, params.kmask,
            ti=ti, tl=tl, k_true=cfg.k_true,
            lb=float(cfg.eta_lower_bound),
            project=cfg.do_projection,
            compute_t=want_ll, emit_a=not last, interpret=interpret)
        per_i = t_b if per_i is None else per_i + t_b
        Bs.append(B[:, :LM])
        a0 = aout  # raw A for the next launch; eta_new on the last

    new_ps = _bucketed_p_epilogue(Bs, params, bd, cfg, eta)
    if want_ll:
        ll = df64.df_sum(per_i)
        scale = jnp.sqrt(jnp.sum(per_i * per_i))
    else:
        z = jnp.zeros((), eta.dtype)
        ll, scale = (z, z), z
    return params._replace(eta=a0, p=new_ps), ll, scale


def _em_step_constrained_bucketed(params, bd, cfg):
    """Constrained-eta (-c) EM step over locus buckets (round 5): the
    collapsed column-sum statistics (em_alg.c constrained restriction)
    are lane-additive over (l, m), so each bucket contributes its own
    a-term at its own allele ceiling while the S/p updates stay
    bucket-local.  Same math as _em_step_constrained per true lane."""
    from multiclust_tpu.model.bucketed import split_params_like

    params = split_params_like(params, bd)
    eta = params.eta                                  # [K]
    K = eta.shape[-1]
    a = None
    ts = []
    new_ps = []
    for md_b, p_b in zip(bd.buckets, params.p):
        p2 = p_b.reshape(K, -1)
        colx = jnp.sum(md_b.x2d, axis=0)              # [LM_b]
        msum = jnp.sum(md_b.miss.astype(md_b.dtype), axis=0)
        denom = eta @ p2
        ts.append(jnp.where(colx > 0, colx * safe_log(denom), 0.0))
        S = _safe_div(colx, denom).reshape(md_b.L, md_b.M) \
            + msum[:, None]
        S = jnp.where(md_b.mask, S, 0.0)
        a_b = p2 @ S.reshape(-1)
        a = a_b if a is None else a + a_b
        pc = p_b * S[None]
        new_ps.append(_normalize_p(pc, md_b, cfg, params.kmask))
    eta_num = eta * a
    eta_new = eta_num / jnp.sum(eta_num)
    if cfg.do_projection:
        eta_new = _project_eta_rows(eta_new, cfg, params.kmask)
    t_all = jnp.concatenate(ts)
    ll = df64.df_sum(t_all)
    scale = jnp.sqrt(jnp.sum(t_all * t_all))
    return params._replace(eta=eta_new, p=tuple(new_ps)), ll, scale


def _em_step_bucketed(params, bd, cfg, want_ll=True):
    """Jagged-M admixture EM step over locus buckets (model/bucketed.py):
    one sweep launch per bucket with that bucket's own allele ceiling -
    A[i,k] and the logL terms t[i] accumulate across launches, the B/p
    updates are locus-local per bucket, and the eta update runs once on
    the merged A (em_alg.c:291-486/:592-754 restructured additively over
    locus groups; the jagged `uniquealleles` semantics of
    read_file.c:443-600 without M_max padding waste)."""
    from multiclust_tpu.model.bucketed import split_params_like

    if cfg.eta_constrained:
        return _em_step_constrained_bucketed(params, bd, cfg)

    params = split_params_like(params, bd)
    eta = params.eta

    if (cfg.use_pallas != "off" and cfg.mesh is None
            and eta.dtype == jnp.float32
            and cfg.k_true and eta.shape[-1] % 32 == 0):
        out = _bucketed_fullstep_fused(params, bd, cfg, want_ll)
        if out is None:
            out = _bucketed_fullstep_chain(params, bd, cfg, want_ll)
        if out is not None:
            return out

    A = None
    per_i = None
    new_ps = []
    for md_b, p_b in zip(bd.buckets, params.p):
        A_b, t_b, B2 = _bucket_sweep(eta, p_b, md_b, cfg, want_ll)
        A = A_b if A is None else A + A_b
        per_i = t_b if per_i is None else per_i + t_b
        new_ps.append(_finish_bucket_p(p_b, B2, md_b, eta, cfg,
                                       params.kmask))

    if cfg.has_missing:
        c = sum(jnp.sum(md_b.miss.astype(A.dtype), axis=1, keepdims=True)
                for md_b in bd.buckets)
        A = A + c
    eta_num = eta * A
    tot_eta = jnp.sum(eta_num, axis=1, keepdims=True)
    eta_new = jnp.where(tot_eta > 0,
                        eta_num / jnp.where(tot_eta > 0, tot_eta, 1.0),
                        eta)
    if cfg.do_projection:
        eta_new = _project_eta_rows(eta_new, cfg, params.kmask)

    if want_ll:
        ll = df64.df_sum(per_i)
        scale = jnp.sqrt(jnp.sum(per_i * per_i))
    else:
        z = jnp.zeros((), eta.dtype)
        ll, scale = (z, z), z
    return params._replace(eta=eta_new, p=tuple(new_ps)), ll, scale


def log_likelihood_bucketed(params, bd):
    """df64 logL over locus buckets (logL_admixture restructured)."""
    from multiclust_tpu.model.bucketed import split_params_like

    params = split_params_like(params, bd)
    per_i = None
    for md_b, p_b in zip(bd.buckets, params.p):
        K = p_b.shape[-3]
        p2 = p_b.reshape(K, -1)
        denom = params.eta @ p2
        x2 = md_b.x2d
        t = jnp.sum(jnp.where(x2 > 0, x2 * safe_log(denom), 0.0), axis=1)
        per_i = t if per_i is None else per_i + t
    return df64.df_sum(per_i), jnp.sqrt(jnp.sum(per_i * per_i))


def _em_step_constrained(params, md, cfg):
    eta, p = params.eta, params.p                     # [K], [K,L,M]
    K = params.K
    p2 = p.reshape(K, -1)
    colx = jnp.sum(md.x2d, axis=0)                    # [LM] (hoistable)
    msum = jnp.sum(md.miss.astype(md.dtype), axis=0)  # [L]

    denom = eta @ p2                                  # [LM]
    t = jnp.where(colx > 0, colx * safe_log(denom), 0.0)
    ll = df64.df_sum(t)
    scale = jnp.sqrt(jnp.sum(t * t))

    S = _safe_div(colx, denom).reshape(md.L, md.M) + msum[:, None]
    S = jnp.where(md.mask, S, 0.0).reshape(-1)        # [LM]

    a = p2 @ S                                        # [K]
    eta_num = eta * a
    eta_new = eta_num / jnp.sum(eta_num)
    if cfg.do_projection:
        eta_new = _project_eta_rows(eta_new, cfg, params.kmask)

    pc = p * S.reshape(1, md.L, md.M)
    p_new = _normalize_p(pc, md, cfg, params.kmask)

    return params._replace(eta=eta_new, p=p_new), ll, scale


def log_likelihood(params: Params, md: ModelData):
    """df64 logL at the given params (logL_admixture)."""
    K = params.K
    p2 = params.p.reshape(K, -1)
    if params.eta.ndim == 1:
        colx = jnp.sum(md.x2d, axis=0)
        denom = params.eta @ p2
        t = jnp.where(colx > 0, colx * safe_log(denom), 0.0)
        return df64.df_sum(t), jnp.sqrt(jnp.sum(t * t))
    denom = params.eta @ p2
    t = jnp.where(md.x2d > 0, md.x2d * safe_log(denom), 0.0)
    per_i = jnp.sum(t, axis=1)
    return df64.df_sum(per_i), jnp.sqrt(jnp.sum(per_i * per_i))


def posterior_allele_mass(params: Params, md: ModelData) -> Array:
    """dik[i,k] = sum_{l,m} d_iklm - expected alleles sourced from cluster k.

    Used for hard assignments and CLUMPP outputs (partition_admixture,
    write_file.c:350-382; indivq_admix :525-543; popq_admix :446-459).
    """
    K = params.K
    p2 = params.p.reshape(K, -1)
    eta = params.eta
    if eta.ndim == 1:
        eta = jnp.broadcast_to(eta[None, :], (md.I, K))
    denom = eta @ p2
    w = _safe_div(md.x2d, denom)
    A = w @ p2.T
    c = jnp.sum(md.miss.astype(md.dtype), axis=1, keepdims=True)
    return eta * (A + c)


def responsibilities_dense(params: Params, md: ModelData) -> Array:
    """Materialized d[I,K,L,M]; TEST ORACLE ONLY (memory-hungry)."""
    K = params.K
    eta = params.eta
    if eta.ndim == 1:
        eta = jnp.broadcast_to(eta[None, :], (md.I, K))
    num = eta[:, :, None, None] * params.p[None]      # [I,K,L,M]
    denom = jnp.sum(num, axis=1, keepdims=True)
    x = md.x.astype(md.dtype)
    d = jnp.where(x[:, None] > 0,
                  x[:, None] * num / jnp.where(denom > 0, denom, 1.0), 0.0)
    d = d + num * md.miss.astype(md.dtype)[:, None, :, None]
    return jnp.where(md.mask[None, None], d, 0.0)
