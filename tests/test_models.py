"""Certify the fused TPU E/M formulations against the f64 numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from multiclust_tpu.io.dataset import Dataset
from multiclust_tpu.model import admixture, mixture
from multiclust_tpu.model.common import EMConfig, ModelData, Params, \
    model_data_from_dataset
from multiclust_tpu.ops import df64
from multiclust_tpu.ops.simplex import michelot_reference, project_rows
from multiclust_tpu.stats.sim import random_model, simulate_admixture_fast, \
    simulate_mixture


def make_data(rng, I=12, L=6, M=3, K=3, missing_rate=0.15, ploidy=2):
    Q, P = random_model(rng, K, L, M, I=I)
    ds = simulate_admixture_fast(rng, Q, P, ploidy=ploidy,
                                 missing_rate=missing_rate)
    return ds


def rand_params(rng, K, md, per_individual=False):
    I, L, M = md.I, md.L, md.M
    mask = np.asarray(md.mask)
    p = rng.random((K, L, M)) + 0.1
    p = np.where(mask[None], p, 0.0)
    p = p / p.sum(axis=2, keepdims=True)
    if per_individual:
        eta = rng.random((I, K)) + 0.1
        eta = eta / eta.sum(axis=1, keepdims=True)
    else:
        eta = rng.random(K) + 0.1
        eta = eta / eta.sum()
    return Params(eta=jnp.asarray(eta, jnp.float64),
                  p=jnp.asarray(p, jnp.float64))


def to_md(ds):
    return model_data_from_dataset(ds, dtype=jnp.float64)


class TestSimplex:
    def test_matches_michelot(self, rng):
        for n in (2, 3, 5, 17):
            for _ in range(20):
                v = rng.normal(size=n) * rng.choice([0.1, 1.0, 10.0])
                lb = 10 ** rng.uniform(-9, -2)
                ours = np.asarray(project_rows(
                    jnp.asarray(v), jnp.ones(n, bool), n, lb))
                ref = michelot_reference(v, lb)
                np.testing.assert_allclose(ours, ref, atol=1e-12)
                assert abs(ours.sum() - 1.0) < 1e-9
                assert (ours >= lb - 1e-15).all()

    def test_iterative_matches_sorted(self, rng):
        """The iterative Michelot (compute path) and the closed-form sorted
        projection agree on batched masked rows."""
        from multiclust_tpu.ops.simplex import project_rows_sorted
        M = 8
        v = rng.normal(size=(64, M)) * rng.choice([0.1, 1.0, 10.0],
                                                  size=(64, 1))
        n_valid = rng.integers(2, M + 1, size=64)
        mask = np.arange(M)[None, :] < n_valid[:, None]
        for lb in (0.0, 1e-8, 1e-3):
            a = np.asarray(project_rows(
                jnp.asarray(v), jnp.asarray(mask), jnp.asarray(n_valid), lb))
            b = np.asarray(project_rows_sorted(
                jnp.asarray(v), jnp.asarray(mask), jnp.asarray(n_valid), lb))
            np.testing.assert_allclose(a, b, atol=1e-10)

    def test_masked_rows(self, rng):
        # batched rows with different valid counts
        M = 6
        v = rng.normal(size=(4, M))
        n_valid = np.array([2, 3, 6, 4])
        mask = np.arange(M)[None, :] < n_valid[:, None]
        out = np.asarray(project_rows(jnp.asarray(v), jnp.asarray(mask),
                                      jnp.asarray(n_valid), 1e-6))
        for r in range(4):
            ref = michelot_reference(v[r, :n_valid[r]], 1e-6)
            np.testing.assert_allclose(out[r, :n_valid[r]], ref, atol=1e-12)
            assert (out[r, n_valid[r]:] == 0).all()


class TestMixture:
    def test_e_step_matches_oracle(self, rng):
        ds = make_data(rng)
        md = to_md(ds)
        params = rand_params(rng, 3, md)
        v, ll, _ = mixture.e_step(params, md)
        v_ref, ll_ref = oracle.mixture_e_step(
            np.asarray(params.eta), np.asarray(params.p), ds.counts, ds.mask)
        np.testing.assert_allclose(np.asarray(v), v_ref, atol=1e-10)
        np.testing.assert_allclose(float(df64.df_value(ll)), ll_ref,
                                   rtol=1e-12)

    @pytest.mark.parametrize("do_projection", [True, False])
    def test_m_step_matches_oracle(self, rng, do_projection):
        ds = make_data(rng)
        md = to_md(ds)
        cfg = EMConfig(admixture=False, do_projection=do_projection,
                       p_lower_bound=1e-5, eta_lower_bound=1e-5)
        params = rand_params(rng, 3, md)
        v, _, _ = mixture.e_step(params, md)
        new = mixture.m_step(v, md, cfg)
        eta_ref, p_ref = oracle.mixture_m_step(
            np.asarray(v), ds.counts, ds.mask, 1e-5, 1e-5,
            do_projection=do_projection)
        np.testing.assert_allclose(np.asarray(new.eta), eta_ref, atol=1e-10)
        np.testing.assert_allclose(np.asarray(new.p), p_ref, atol=1e-10)


class TestAdmixture:
    @pytest.mark.parametrize("constrained", [False, True])
    @pytest.mark.parametrize("missing_rate", [0.0, 0.2])
    def test_em_step_matches_oracle(self, rng, constrained, missing_rate):
        ds = make_data(rng, missing_rate=missing_rate)
        md = to_md(ds)
        K = 3
        cfg = EMConfig(admixture=True, eta_constrained=constrained,
                       do_projection=True, p_lower_bound=1e-6,
                       eta_lower_bound=1e-6)
        params = rand_params(rng, K, md, per_individual=not constrained)
        new, ll, _ = admixture.em_step(params, md, cfg)

        d_ref, ll_ref = oracle.admixture_e_step(
            np.asarray(params.eta), np.asarray(params.p),
            ds.counts, ds.miss, ds.mask)
        eta_ref, p_ref = oracle.admixture_m_step(
            d_ref, ds.counts, ds.miss, ds.mask, constrained, 1e-6, 1e-6)
        np.testing.assert_allclose(float(df64.df_value(ll)), ll_ref,
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(new.eta), eta_ref, atol=1e-9)
        np.testing.assert_allclose(np.asarray(new.p), p_ref, atol=1e-9)

    def test_dense_responsibilities_match_oracle(self, rng):
        ds = make_data(rng, missing_rate=0.25)
        md = to_md(ds)
        params = rand_params(rng, 3, md, per_individual=True)
        d = admixture.responsibilities_dense(params, md)
        d_ref, _ = oracle.admixture_e_step(
            np.asarray(params.eta), np.asarray(params.p),
            ds.counts, ds.miss, ds.mask)
        np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-10)

    def test_posterior_allele_mass(self, rng):
        ds = make_data(rng, missing_rate=0.1)
        md = to_md(ds)
        params = rand_params(rng, 3, md, per_individual=True)
        dik = admixture.posterior_allele_mass(params, md)
        d_ref, _ = oracle.admixture_e_step(
            np.asarray(params.eta), np.asarray(params.p),
            ds.counts, ds.miss, ds.mask)
        np.testing.assert_allclose(np.asarray(dik),
                                   d_ref.sum(axis=(2, 3)), atol=1e-9)
        # every individual's mass totals ploidy * L
        np.testing.assert_allclose(np.asarray(dik).sum(axis=1),
                                   ds.ploidy * ds.L, rtol=1e-9)

    def test_log_likelihood(self, rng):
        ds = make_data(rng, missing_rate=0.1)
        md = to_md(ds)
        for per_ind in (True, False):
            params = rand_params(rng, 3, md, per_individual=per_ind)
            ll, _ = admixture.log_likelihood(params, md)
            ll_ref = oracle.admixture_log_likelihood(
                np.asarray(params.eta), np.asarray(params.p),
                ds.counts, ds.mask)
            np.testing.assert_allclose(float(df64.df_value(ll)), ll_ref,
                                       rtol=1e-12)


class TestDf64:
    def test_df_sum_precision(self, rng):
        # sum of values whose f32 naive sum loses the small terms
        big = np.float32(1e6)
        vals = np.concatenate([[big], np.full(1000, np.float32(1e-3))])
        hi, lo = df64.df_sum(jnp.asarray(vals, jnp.float32))
        got = float(hi) + float(lo)
        assert abs(got - (1e6 + 1.0)) < 1e-3


class TestInt8Storage:
    def test_int8_storage_matches_f64(self, rng):
        """x stored as int8 must give identical E/M results (counts are
        exact in any dtype; x2d casts to the compute dtype)."""
        import jax
        ds = make_data(rng, missing_rate=0.15)
        md64 = to_md(ds)
        md8 = model_data_from_dataset(ds, dtype=jnp.float64,
                                      storage_dtype=jnp.int8)
        assert md8.x.dtype == jnp.int8 and md8.dtype == jnp.float64
        cfg = EMConfig(admixture=True)
        params = rand_params(rng, 3, md64, per_individual=True)
        a, ll_a, _ = admixture.em_step(params, md64, cfg)
        b, ll_b, _ = admixture.em_step(params, md8, cfg)
        np.testing.assert_array_equal(np.asarray(a.p), np.asarray(b.p))
        np.testing.assert_array_equal(np.asarray(a.eta), np.asarray(b.eta))
        assert float(df64.df_value(ll_a)) == float(df64.df_value(ll_b))
        # mixture path + init path
        cfgm = EMConfig(admixture=False)
        pm = rand_params(rng, 3, md64)
        am, la, _, _ = mixture.em_step(pm, md64, cfgm)
        bm, lb, _, _ = mixture.em_step(pm, md8, cfgm)
        np.testing.assert_array_equal(np.asarray(am.p), np.asarray(bm.p))
        from multiclust_tpu.init.random import initialize
        i64 = initialize(jax.random.PRNGKey(0), md64, 3, cfgm)
        i8 = initialize(jax.random.PRNGKey(0), md8, 3, cfgm)
        np.testing.assert_array_equal(np.asarray(i64.p), np.asarray(i8.p))


class TestBacktracking:
    def test_squarem_backtracking_engages(self):
        """Varadhan backtracking (accel_em.c:76-82) actually ENGAGING: at
        this seed SQUAREM-3 proposes s=-5.66 whose trial point is ~329
        logL units WORSE than the EM iterate, so the s <- (s-1)/2 loop
        must fire.  The test replays the loop by hand (same halving rule,
        same guarded accept, accel_em.c:90-113) and checks
        ``accel_macro_step`` lands on the same point."""
        import jax

        from multiclust_tpu.opt import em as em_mod
        from multiclust_tpu.opt.em import (_newest, _project_params,
                                           model_log_likelihood,
                                           squarem_point, step_size,
                                           two_em_steps)

        rng = np.random.default_rng(2)
        I, L, K = 40, 30, 3
        p_true = rng.choice([0.15, 0.85], size=(K, L))
        eta_true = rng.dirichlet(np.full(K, 0.3), size=I)
        x0c = rng.binomial(2, eta_true @ p_true)
        counts = np.stack([x0c, 2 - x0c], axis=2).astype(np.float64)
        md = ModelData(x=jnp.asarray(counts),
                       miss=jnp.zeros((I, L)),
                       mask=jnp.ones((L, 2), bool),
                       n_alleles=jnp.full((L,), 2, jnp.int32)
                       ).prepare_for_em()
        eta0 = rng.dirichlet(np.full(K, 2.0), I)
        q = rng.uniform(0.2, 0.8, (K, L))
        params = Params(eta=jnp.asarray(eta0),
                        p=jnp.asarray(np.stack([q, 1 - q], axis=2)))
        cfg = EMConfig(admixture=True, has_missing=False, accel_scheme=3,
                       adjust_step=5)

        state = em_mod.accel_macro_step(em_mod.init_state(params, cfg),
                                        md, cfg)

        # manual replay of the next macro step
        s2, x0 = two_em_steps(state, md, cfg)
        emll = float(df64.df_value(
            model_log_likelihood(s2.params, md, cfg)[0]))
        u, v = _newest(s2.ring, cfg.q)
        s = float(step_size(3, u, v, jnp.float64))

        def trial(sv):
            pt = _project_params(squarem_point(x0, u, v, sv), md, cfg)
            return pt, float(df64.df_value(
                model_log_likelihood(pt, md, cfg)[0]))

        pt, ll = trial(s)
        # the engagement preconditions - the whole point of this test
        assert s < -1.0
        assert ll < emll - 100.0, (ll, emll)

        n, sv = 0, s
        while n < cfg.adjust_step and ll < emll and sv < -1.0:
            sv = (sv - 1.0) / 2.0
            pt, ll = trial(sv)
            n += 1
        assert n > 0                      # it really backtracked
        accept = ll > emll and np.isfinite(ll)
        expected = pt if accept else s2.params

        out = em_mod.accel_macro_step(state, md, cfg)
        np.testing.assert_allclose(np.asarray(out.params.eta),
                                   np.asarray(expected.eta), atol=1e-9)
        np.testing.assert_allclose(np.asarray(out.params.p),
                                   np.asarray(expected.p), atol=1e-9)
        assert bool(out.accel_step) == accept
        # guarded accept keeps the chain monotone despite the bad trial
        assert float(out.logL_hi + out.logL_lo) >= \
            float(state.logL_hi + state.logL_lo) - 1e-6


import pytest


@pytest.mark.parametrize("ploidy", [2, 4])
def test_mixture_biallelic_fast_path_matches_generic(rng, ploidy):
    """The single-matmul biallelic mixture path (x1 = ploidy - x0 folded
    into per-cluster constants, model/mixture._scores_bi/_m_step_bi)
    reproduces the generic path exactly on missing-free SNP data,
    including mesh-style padded rows/loci - at diploid AND tetraploid
    ploidy (cfg.ploidy is pinned from the data by Options.synchronize)."""
    import jax.numpy as jnp

    from multiclust_tpu.model import mixture
    from multiclust_tpu.model.common import EMConfig, ModelData, Params

    I, L, K = 40, 30, 3
    x0 = rng.integers(0, ploidy + 1, size=(I, L))
    counts = np.stack([x0, ploidy - x0], axis=2)
    # pad 3 rows (row_valid) and 2 masked loci, as the mesh padding does
    Ip, Lp = I + 3, L + 2
    c = np.zeros((Ip, Lp, 2), np.int64)
    c[:I, :L] = counts
    md = ModelData(
        x=jnp.asarray(c, jnp.float64),
        miss=jnp.zeros((Ip, Lp), jnp.float64),
        mask=jnp.asarray(np.arange(Lp)[:, None] < L).repeat(2, axis=1),
        n_alleles=jnp.asarray(np.where(np.arange(Lp) < L, 2, 0),
                              jnp.int32),
        row_valid=jnp.asarray(np.arange(Ip) < I)).prepare_for_em(bi=True)
    eta = rng.dirichlet(np.full(K, 2.0))
    p0 = rng.uniform(0.2, 0.8, size=(K, L))
    p = np.zeros((K, Lp, 2))
    p[:, :L, 0], p[:, :L, 1] = p0, 1 - p0
    params = Params(eta=jnp.asarray(eta, jnp.float64),
                    p=jnp.asarray(p, jnp.float64))

    cfg_gen = EMConfig(admixture=False, has_missing=False,
                       biallelic=False, ploidy=ploidy)
    cfg_bi = cfg_gen._replace(biallelic=True)
    ref, bi = params, params
    for _ in range(4):
        ref, ll_r, _, _ = mixture.em_step(ref, md, cfg_gen)
        bi, ll_b, _, _ = mixture.em_step(bi, md, cfg_bi)
        np.testing.assert_allclose(np.asarray(bi.eta), np.asarray(ref.eta),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(bi.p), np.asarray(ref.p),
                                   rtol=1e-12, atol=1e-14)
        from multiclust_tpu.ops import df64
        assert abs(float(df64.df_value(ll_b))
                   - float(df64.df_value(ll_r))) < 1e-8
    # Options.synchronize pins the data ploidy into cfg
    from multiclust_tpu.config import Options
    assert Options().synchronize(I, ploidy).ploidy == ploidy
    # log_likelihood takes the same fast path
    ll_fast, _ = mixture.log_likelihood(bi, md, cfg_bi)
    ll_gen, _ = mixture.log_likelihood(bi, md)
    from multiclust_tpu.ops import df64
    assert abs(float(df64.df_value(ll_fast))
               - float(df64.df_value(ll_gen))) < 1e-8


@pytest.mark.slow
def test_property_random_shapes_match_oracle(rng):
    """Randomized property sweep: both models' EM steps match the f64
    numpy oracle across random (I, L, M, K, ploidy, missing) combos -
    jagged loci, polyploidy, constrained eta, monotone logL."""
    import jax.numpy as jnp

    from multiclust_tpu.model import admixture as adx, mixture as mx
    from multiclust_tpu.model.common import EMConfig
    from multiclust_tpu.opt import em as em_mod
    import oracle

    for case in range(8):
        I = int(rng.integers(5, 25))
        L = int(rng.integers(3, 12))
        M = int(rng.integers(2, 6))
        K = int(rng.integers(2, 5))
        ploidy = int(rng.choice([1, 2, 4]))
        missing_rate = float(rng.choice([0.0, 0.1, 0.3]))
        admix = bool(rng.integers(0, 2))
        constrained = admix and bool(rng.integers(0, 2))
        ds = make_data(rng, I=I, L=L, M=M, K=K,
                       missing_rate=missing_rate, ploidy=ploidy)
        md = to_md(ds)
        cfg = EMConfig(admixture=admix, eta_constrained=constrained,
                       p_lower_bound=1e-6, eta_lower_bound=1e-6,
                       ploidy=ploidy)
        params = rand_params(rng, K, md,
                             per_individual=admix and not constrained)
        tag = (case, I, L, M, K, ploidy, missing_rate, admix, constrained)
        if admix:
            new, ll, _ = adx.em_step(params, md, cfg)
            d_ref, ll_ref = oracle.admixture_e_step(
                np.asarray(params.eta), np.asarray(params.p),
                ds.counts, ds.miss, ds.mask)
            eta_ref, p_ref = oracle.admixture_m_step(
                d_ref, ds.counts, ds.miss, ds.mask, constrained,
                1e-6, 1e-6)
        else:
            new, ll, _, _ = mx.em_step(params, md, cfg)
            v_ref, ll_ref = oracle.mixture_e_step(
                np.asarray(params.eta), np.asarray(params.p),
                ds.counts, ds.mask)
            eta_ref, p_ref = oracle.mixture_m_step(
                v_ref, ds.counts, ds.mask, 1e-6, 1e-6,
                do_projection=True)
        np.testing.assert_allclose(float(df64.df_value(ll)), ll_ref,
                                   rtol=1e-10, err_msg=str(tag))
        np.testing.assert_allclose(np.asarray(new.eta), eta_ref,
                                   atol=1e-8, err_msg=str(tag))
        np.testing.assert_allclose(np.asarray(new.p), p_ref,
                                   atol=1e-8, err_msg=str(tag))
        # EM monotonicity: a second step never decreases the logL
        _, ll2, _ = em_mod.model_em_step(new, md, cfg)
        assert float(df64.df_value(ll2)) >= float(df64.df_value(ll)) - 1e-9, \
            tag
