"""Jagged-M locus bucketing (model/bucketed.py; VERDICT r3 item 5).

Oracle parity on mixed panels (SNP M=2 + microsatellite M=8 loci,
interleaved) and production-engine equivalence: the bucketed fit must
reach the dense fit's optimum while doing only ~sum M_l worth of work.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiclust_tpu.model import admixture
from multiclust_tpu.model.bucketed import (BucketedData,
                                           bucketize_model_data,
                                           jagged_savings, merge_params_like,
                                           plan_buckets, split_params_like,
                                           worth_bucketing)
from multiclust_tpu.model.common import EMConfig, ModelData, Params
from multiclust_tpu.ops import df64


def make_mixed_panel(rng, I=40, L=100, K=3, missing=0.1, frac_snp=0.8):
    """Interleaved mixed panel: ~frac_snp M=2 loci, the rest M=8."""
    Ml = np.where(rng.random(L) < frac_snp, 2, 8)
    M = int(Ml.max())
    counts = np.zeros((I, L, M), np.int64)
    miss = rng.binomial(2, missing, size=(I, L))
    for i in range(I):
        for l in range(L):
            for _ in range(2 - miss[i, l]):
                counts[i, l, rng.integers(0, Ml[l])] += 1
    md = ModelData(x=jnp.asarray(counts, jnp.float64),
                   miss=jnp.asarray(miss, jnp.float64),
                   mask=jnp.asarray(np.arange(M)[None] < Ml[:, None]),
                   n_alleles=jnp.asarray(Ml, jnp.int32))
    p = rng.random((K, L, M)) * (np.arange(M)[None, None] < Ml[None, :, None])
    p = p / p.sum(2, keepdims=True)
    eta = rng.dirichlet(np.full(K, 2.0), size=I)
    params = Params(eta=jnp.asarray(eta), p=jnp.asarray(p))
    return md, params, Ml


def test_plan_buckets_shape():
    Ml = np.array([2] * 100 + [4] * 70 + [8] * 3 + [12] * 2)
    plan = plan_buckets(Ml, 12, min_bucket=16)
    assert plan is not None
    # tiny M=8/M=12 runs merge upward into one bucket with ceiling 12
    assert plan.ranges[-1][1] == Ml.size
    assert plan.Ms[-1] == 12
    assert all(m_lo <= m_hi for m_lo, m_hi in zip(plan.Ms, plan.Ms[1:]))
    assert jagged_savings(np.full(10, 2)) == 0.0
    assert worth_bucketing(Ml)
    # uniform panels never bucket
    assert plan_buckets(np.full(50, 2), 2) is None


def test_bucketed_mixture_step_matches_dense(rng):
    """Jagged composition (round 5): the MIXTURE model rides the same
    concatenated-lane representation - scores and count merges are
    lane-additive (model/mixture._em_step_bucketed)."""
    from multiclust_tpu.model import mixture

    md, params, Ml = make_mixed_panel(rng, missing=0.1)
    params = params._replace(eta=jnp.asarray(
        np.random.default_rng(1).dirichlet(np.full(3, 2.0))))
    cfg = EMConfig(admixture=False, has_missing=True)
    ref, llr, _, vr = mixture.em_step(params, md, cfg)

    plan = plan_buckets(np.asarray(Ml), md.M, min_bucket=4)
    bd = bucketize_model_data(md, plan)
    out, llb, _, vb = mixture.em_step(params, bd, cfg)
    got = merge_params_like(out, bd, md.M)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(ref.p),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.eta), np.asarray(ref.eta),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(vr), atol=1e-12)
    assert abs(float(df64.df_value(llr))
               - float(df64.df_value(llb))) < 1e-8
    ll2, _ = mixture.log_likelihood_bucketed(params, bd)
    assert abs(float(df64.df_value(ll2))
               - float(df64.df_value(llr))) < 1e-8


def test_bucketed_constrained_step_matches_dense(rng):
    """Jagged composition (round 5): the constrained-eta (-c) step's
    collapsed statistics are lane-additive too
    (model/admixture._em_step_constrained_bucketed)."""
    from multiclust_tpu.model.common import collapse_for_constrained

    md, params, Ml = make_mixed_panel(rng, missing=0.1)
    params = params._replace(eta=jnp.asarray(
        np.random.default_rng(2).dirichlet(np.full(3, 2.0))))
    cfg = EMConfig(admixture=True, eta_constrained=True, has_missing=True)
    mdc = collapse_for_constrained(md)
    ref, llr, _ = admixture.em_step(params, mdc, cfg)

    plan = plan_buckets(np.asarray(Ml), md.M, min_bucket=4)
    bd = bucketize_model_data(mdc, plan)
    out, llb, _ = admixture.em_step(params, bd, cfg)
    got = merge_params_like(out, bd, md.M)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(ref.p),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.eta), np.asarray(ref.eta),
                               atol=1e-12)
    assert abs(float(df64.df_value(llr))
               - float(df64.df_value(llb))) < 1e-8


@pytest.mark.parametrize("missing", [0.0, 0.15])
def test_bucketed_step_matches_dense(rng, missing):
    """One bucketed EM step == the dense step to f64 roundoff (A/t
    accumulate across launches, B/p locus-local; em_alg.c:291-486)."""
    md, params, Ml = make_mixed_panel(rng, missing=missing)
    cfg = EMConfig(admixture=True, has_missing=missing > 0)
    ref, llr, _ = admixture.em_step(params, md, cfg)

    plan = plan_buckets(np.asarray(Ml), md.M, min_bucket=4)
    bd = bucketize_model_data(md, plan)
    out, llb, _ = admixture.em_step(params, bd, cfg)
    got = merge_params_like(out, bd, md.M)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(ref.p),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.eta), np.asarray(ref.eta),
                               atol=1e-12)
    assert abs(float(df64.df_value(llr))
               - float(df64.df_value(llb))) < 1e-8
    # logL function parity (accelerated accept tests use it)
    ll2, _ = admixture.log_likelihood_bucketed(params, bd)
    assert abs(float(df64.df_value(ll2))
               - float(df64.df_value(llr))) < 1e-8


def test_bucketed_pallas_chain_matches(rng):
    """The CHAINED per-bucket fullstep kernels (interpret mode, f32,
    int8 storage; a0-threaded A accumulator, emit_a for non-final
    buckets, in-kernel eta finish on the last) match the dense XLA
    step.  I=64 forces row padding handled by pick_layout tiling."""
    from multiclust_tpu.model import admixture as adm
    from multiclust_tpu.model.common import k_padded_size, pad_params_k

    md, params, Ml = make_mixed_panel(rng, I=64, missing=0.1)
    md8 = md._replace(x=md.x.astype(jnp.int8), miss=md.miss.astype(jnp.int8))
    K = 3
    params32 = Params(eta=params.eta.astype(jnp.float32),
                      p=params.p.astype(jnp.float32))
    cfg = EMConfig(admixture=True, has_missing=True)
    ref, llr, _ = admixture.em_step(
        params32, md._replace(x=md.x.astype(jnp.float32),
                              miss=md.miss.astype(jnp.float32)), cfg)

    plan = plan_buckets(np.asarray(Ml), md.M, min_bucket=4)
    bd = bucketize_model_data(md8, plan).prepare_for_em()
    cfg_k = cfg._replace(use_pallas="interpret", k_true=K)
    pad = pad_params_k(params32, k_padded_size(K, 32))
    # the chain path must actually engage (not the XLA fallback)
    assert adm._bucketed_fullstep_chain(
        __import__("multiclust_tpu.model.bucketed", fromlist=["x"])
        .split_params_like(pad, bd), bd, cfg_k, True) is not None
    out, llb, _ = admixture.em_step(pad, bd, cfg_k)
    got = merge_params_like(out, bd, md.M)
    np.testing.assert_allclose(np.asarray(got.p[:K]), np.asarray(ref.p),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.eta[:, :K]),
                               np.asarray(ref.eta), rtol=2e-4, atol=1e-5)
    assert abs(float(df64.df_value(llb))
               - float(df64.df_value(llr))) < 5e-2


def test_bucketed_fused_tight_matches(rng):
    """The single-launch FUSED path on a TIGHT plan (no per-bucket lane
    alignment - prepare_for_em pads only the concatenated tail, round-4
    probe: per-bucket pads were 20% of the lane space and the whole gap
    to the uniform rate) matches the dense XLA step."""
    from multiclust_tpu.model import admixture as adm
    from multiclust_tpu.model.bucketed import lane_pad
    from multiclust_tpu.model.common import k_padded_size, pad_params_k

    md, params, Ml = make_mixed_panel(rng, I=64, missing=0.1)
    md8 = md._replace(x=md.x.astype(jnp.int8), miss=md.miss.astype(jnp.int8))
    K = 3
    params32 = Params(eta=params.eta.astype(jnp.float32),
                      p=params.p.astype(jnp.float32))
    cfg = EMConfig(admixture=True, has_missing=True)
    ref, llr, _ = admixture.em_step(
        params32, md._replace(x=md.x.astype(jnp.float32),
                              miss=md.miss.astype(jnp.float32)), cfg)

    plan = plan_buckets(np.asarray(Ml), md.M, min_bucket=4, tight=True)
    # tight plan: zero per-bucket padding
    assert plan.pad_Ls == tuple(hi - lo for lo, hi in plan.ranges)
    bd = bucketize_model_data(md8, plan).prepare_for_em()
    LM = sum(b.L * b.M for b in bd.buckets)
    assert bd.x_lanes.shape[1] == lane_pad(64, LM) >= LM
    cfg_k = cfg._replace(use_pallas="interpret", k_true=K)
    pad = pad_params_k(params32, k_padded_size(K, 32))
    from multiclust_tpu.model.bucketed import split_params_like
    # the FUSED path must engage on the tail-padded lane matrix
    assert adm._bucketed_fullstep_fused(
        split_params_like(pad, bd), bd, cfg_k, True) is not None
    out, llb, _ = admixture.em_step(pad, bd, cfg_k)
    got = merge_params_like(out, bd, md.M)
    np.testing.assert_allclose(np.asarray(got.p[:K]), np.asarray(ref.p),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.eta[:, :K]),
                               np.asarray(ref.eta), rtol=2e-4, atol=1e-5)
    assert abs(float(df64.df_value(llb))
               - float(df64.df_value(llr))) < 5e-2


@pytest.mark.parametrize("accel", [0, 1])
def test_bucketed_production_engine(rng, accel):
    """The multi-start engine auto-buckets jagged admixture fits (plain
    and SQUAREM-accelerated: ring buffers / projections / guarded accept
    all ride the tuple-p pytree) and reaches the dense fit's optimum."""
    from multiclust_tpu.config import Options
    from multiclust_tpu.init.random import codes_from_counts
    import multiclust_tpu.model.bucketed as bk
    from multiclust_tpu.runtime.multistart import maximize_likelihood

    md, _, Ml = make_mixed_panel(rng, I=36, L=60, missing=0.1)
    codes = jnp.asarray(codes_from_counts(
        np.asarray(md.x, np.int64), np.asarray(md.miss, np.int64), 2))
    base = dict(admixture=True, n_init=3, batch_chains=3, min_K=3,
                max_K=3, dtype="float64", n_rand_em_init=3,
                accel_scheme=accel, adjust_step=2 if accel else 0)
    opt = Options(**base).synchronize(md.I, 2)

    assert worth_bucketing(np.asarray(Ml))
    res_b = maximize_likelihood(jax.random.PRNGKey(3), md, 3, opt,
                                n_parameters=50, codes=codes)
    # dense reference: disable the bucketing gate
    orig = bk.worth_bucketing
    bk.worth_bucketing = lambda *a, **k: False
    try:
        res_d = maximize_likelihood(jax.random.PRNGKey(3), md, 3, opt,
                                    n_parameters=50, codes=codes)
    finally:
        bk.worth_bucketing = orig
    assert res_b.ever_converged
    assert res_b.best_params.p.shape == res_d.best_params.p.shape
    assert abs(res_b.max_logL - res_d.max_logL) < 1e-6, \
        (res_b.max_logL, res_d.max_logL)
    np.testing.assert_allclose(np.asarray(res_b.best_params.p),
                               np.asarray(res_d.best_params.p), atol=1e-6)
    # dense padded lanes restored as exact zeros in original locus order
    mask = np.asarray(md.mask)
    assert (np.asarray(res_b.best_params.p)[:, ~mask] == 0).all()


def test_bucketed_production_engine_mixture(rng):
    """Round-5 composition: MIXTURE fits on jagged panels auto-bucket
    and reach the dense fit's optimum."""
    from multiclust_tpu.config import Options
    import multiclust_tpu.model.bucketed as bk
    from multiclust_tpu.runtime.multistart import maximize_likelihood

    md, _, Ml = make_mixed_panel(rng, I=36, L=60, missing=0.1)
    opt = Options(admixture=False, n_init=2, batch_chains=2, min_K=3,
                  max_K=3, dtype="float64",
                  n_rand_em_init=2).synchronize(md.I, 2)
    res_b = maximize_likelihood(jax.random.PRNGKey(5), md, 3, opt,
                                n_parameters=50)
    orig = bk.worth_bucketing
    bk.worth_bucketing = lambda *a, **k: False
    try:
        res_d = maximize_likelihood(jax.random.PRNGKey(5), md, 3, opt,
                                    n_parameters=50)
    finally:
        bk.worth_bucketing = orig
    assert res_b.ever_converged
    assert res_b.best_params.p.shape == res_d.best_params.p.shape
    assert abs(res_b.max_logL - res_d.max_logL) < 1e-6
    np.testing.assert_allclose(np.asarray(res_b.best_params.p),
                               np.asarray(res_d.best_params.p), atol=1e-6)


def test_bucketed_production_engine_constrained(rng):
    """Round-5 composition: constrained-eta fits bucket the COLLAPSED
    column-sum dataset and reach the dense optimum."""
    from multiclust_tpu.config import Options
    from multiclust_tpu.init.random import codes_from_counts
    import multiclust_tpu.model.bucketed as bk
    from multiclust_tpu.runtime.multistart import maximize_likelihood

    md, _, Ml = make_mixed_panel(rng, I=36, L=60, missing=0.1)
    codes = jnp.asarray(codes_from_counts(
        np.asarray(md.x, np.int64), np.asarray(md.miss, np.int64), 2))
    opt = Options(admixture=True, eta_constrained=True, n_init=2,
                  batch_chains=2, min_K=3, max_K=3, dtype="float64",
                  n_rand_em_init=2).synchronize(md.I, 2)
    res_b = maximize_likelihood(jax.random.PRNGKey(7), md, 3, opt,
                                n_parameters=50, codes=codes)
    orig = bk.worth_bucketing
    bk.worth_bucketing = lambda *a, **k: False
    try:
        res_d = maximize_likelihood(jax.random.PRNGKey(7), md, 3, opt,
                                    n_parameters=50, codes=codes)
    finally:
        bk.worth_bucketing = orig
    assert res_b.ever_converged
    assert abs(res_b.max_logL - res_d.max_logL) < 1e-6
    np.testing.assert_allclose(np.asarray(res_b.best_params.p),
                               np.asarray(res_d.best_params.p), atol=1e-6)


def test_bucketed_production_engine_meshed(rng):
    """Round-5 composition: jagged fits on a DATA-axis mesh - buckets
    shard over individuals (GSPMD on the XLA bucket loop) and the fit
    matches the off-mesh bucketed fit."""
    from multiclust_tpu.config import Options
    from multiclust_tpu.init.random import codes_from_counts
    from multiclust_tpu.runtime.multistart import maximize_likelihood

    md, _, Ml = make_mixed_panel(rng, I=40, L=60, missing=0.1)
    codes = jnp.asarray(codes_from_counts(
        np.asarray(md.x, np.int64), np.asarray(md.miss, np.int64), 2))
    base = dict(admixture=True, n_init=2, batch_chains=2, min_K=3,
                max_K=3, dtype="float64", n_rand_em_init=2)
    opt0 = Options(**base).synchronize(md.I, 2)
    optM = Options(**base, mesh_shape=(8, 1)).synchronize(md.I, 2)
    res0 = maximize_likelihood(jax.random.PRNGKey(9), md, 3, opt0,
                               n_parameters=50, codes=codes)
    resM = maximize_likelihood(jax.random.PRNGKey(9), md, 3, optM,
                               n_parameters=50, codes=codes)
    assert resM.ever_converged
    assert abs(res0.max_logL - resM.max_logL) < 1e-6, \
        (res0.max_logL, resM.max_logL)
    np.testing.assert_allclose(np.asarray(resM.best_params.p),
                               np.asarray(res0.best_params.p), atol=1e-6)


def test_bucketed_batched_bootstrap(rng):
    """Round-5 composition: the batched bootstrap lattice rides the
    jagged representation - ts lists match a dense-forced run."""
    from multiclust_tpu.config import Options
    import multiclust_tpu.model.bucketed as bk
    from multiclust_tpu.model.common import Params
    from multiclust_tpu.stats.bootstrap import _batched_ts

    md, params, Ml = make_mixed_panel(rng, I=36, L=60, missing=0.1)
    opt = Options(admixture=True, n_init=1, min_K=2, max_K=3,
                  n_bootstrap=2, dtype="float64", max_iter=150,
                  n_rand_em_init=2).synchronize(md.I, 2)
    h0 = Params(eta=params.eta[:, :2] /
                jnp.sum(params.eta[:, :2], 1, keepdims=True),
                p=params.p[:2])
    key = jax.random.PRNGKey(11)
    ts_b = _batched_ts(key, md, opt, h0, 2, 2)
    orig = bk.worth_bucketing
    bk.worth_bucketing = lambda *a, **k: False
    try:
        ts_d = _batched_ts(key, md, opt, h0, 2, 2)
    finally:
        bk.worth_bucketing = orig
    np.testing.assert_allclose(ts_b, ts_d, atol=1e-6)
