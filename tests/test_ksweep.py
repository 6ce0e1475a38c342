"""Mixed-K swept-lattice K-sweep (VERDICT r4 item 1).

The swept engine (runtime/multistart.swept_maximize) fits every K of a
K-sweep as ONE chain lattice sharing one compiled program: chains carry
their true-lane set as DATA (Params.kmask) instead of the static
cfg.k_true.  Parity contract: per-K results equal the serial per-K loop
(estimate_model, multiclust.c:365-452) chain for chain - each group keeps
the serial path's PRNG stream, batch width and refill schedule.

These tests run the swept engine directly (on CPU the production gate
swept_eligible routes to the serial loop, where unpadded K-sized chains
are faster; on accelerators every K <= 32 pads to 32 lanes anyway).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiclust_tpu.config import Options
from multiclust_tpu.model import admixture, mixture
from multiclust_tpu.model.common import EMConfig, Params, k_padded_size, \
    make_kmask, model_data_from_dataset, pad_params_k, unpad_params_k
from multiclust_tpu.ops import df64
from multiclust_tpu.stats.sim import random_model, simulate_admixture_fast


def _dataset(rng, K=3, I=50, L=30, M=2, missing_rate=0.0):
    Q, P = random_model(rng, K, L, M, I=I, concentration=0.3)
    return simulate_admixture_fast(rng, Q, P, ploidy=2,
                                   missing_rate=missing_rate)


def _rand_params(rng, K, L, M, I=None, dtype=jnp.float64):
    p = rng.dirichlet(np.ones(M), size=(K, L))
    if I is None:
        eta = rng.dirichlet(np.ones(K))
    else:
        eta = rng.dirichlet(np.ones(K), size=I)
    return Params(eta=jnp.asarray(eta, dtype), p=jnp.asarray(p, dtype))


# ---------------------------------------------------------------------------
# dynamic-K (Params.kmask) step parity vs the static k_true layout


@pytest.mark.parametrize("use_pallas", ["off", "interpret"])
def test_kmask_admixture_step_matches_static(rng, use_pallas):
    """K-padded chains with a DATA kmask reproduce the static-k_true
    trajectory on the XLA path and on the interpret-mode kernels (where
    the in-kernel Michelot is bypassed for an XLA projection)."""
    K, I, L, M = 3, 16, 50, 3
    ds = _dataset(rng, K=K, I=I, L=L, M=M, missing_rate=0.1)
    dtype = jnp.float32 if use_pallas != "off" else jnp.float64
    md = model_data_from_dataset(ds, dtype=dtype).prepare_for_em()
    params = _rand_params(rng, K, L, ds.M, I=I, dtype=dtype)
    Kp = k_padded_size(K, 32) if use_pallas != "off" else 8

    cfg_static = EMConfig(admixture=True, use_pallas=use_pallas, k_true=K)
    cfg_dyn = EMConfig(admixture=True, use_pallas=use_pallas, k_true=Kp)

    ref = pad_params_k(params, Kp)
    dyn = pad_params_k(params, Kp)._replace(
        kmask=make_kmask(K, Kp, dtype))
    tol = dict(rtol=2e-5, atol=1e-5) if dtype == jnp.float32 \
        else dict(rtol=1e-12, atol=1e-13)
    for _ in range(4):
        ref, ll_r, _ = admixture.em_step(ref, md, cfg_static)
        dyn, ll_d, _ = admixture.em_step(dyn, md, cfg_dyn)
        assert dyn.kmask is not None  # the mask must survive the step
        np.testing.assert_array_equal(np.asarray(dyn.eta[:, K:]), 0.0)
        got = unpad_params_k(dyn, K)
        want = unpad_params_k(ref, K)
        np.testing.assert_allclose(np.asarray(got.eta),
                                   np.asarray(want.eta), **tol)
        np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                                   **tol)
        assert abs(float(df64.df_value(ll_d)) - float(df64.df_value(ll_r))
                   ) < (5e-3 if dtype == jnp.float32 else 1e-9)


def test_kmask_mixture_step_matches_static(rng):
    K, I, L, M = 3, 40, 25, 2
    ds = _dataset(rng, K=K, I=I, L=L, M=M)
    md = model_data_from_dataset(ds, dtype=jnp.float64).prepare_for_em()
    params = _rand_params(rng, K, L, ds.M, dtype=jnp.float64)
    Kp = 8
    cfg = EMConfig(admixture=False)
    ref = params
    dyn = pad_params_k(params, Kp)._replace(
        kmask=make_kmask(K, Kp, jnp.float64))
    for _ in range(4):
        ref, ll_r, _, _ = mixture.em_step(ref, md, cfg)
        dyn, ll_d, _, _ = mixture.em_step(dyn, md, cfg)
        assert dyn.kmask is not None
        np.testing.assert_array_equal(np.asarray(dyn.eta[K:]), 0.0)
        got = unpad_params_k(dyn, K)
        np.testing.assert_allclose(np.asarray(got.eta),
                                   np.asarray(ref.eta), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(got.p), np.asarray(ref.p),
                                   rtol=1e-12, atol=1e-14)
        assert abs(float(df64.df_value(ll_d))
                   - float(df64.df_value(ll_r))) < 1e-8


def test_kmask_constrained_step_matches_static(rng):
    K, I, L, M = 3, 40, 25, 3
    ds = _dataset(rng, K=K, I=I, L=L, M=M, missing_rate=0.1)
    md = model_data_from_dataset(ds, dtype=jnp.float64).prepare_for_em()
    params = _rand_params(rng, K, L, ds.M, dtype=jnp.float64)
    Kp = 8
    cfg = EMConfig(admixture=True, eta_constrained=True)
    ref = params
    dyn = pad_params_k(params, Kp)._replace(
        kmask=make_kmask(K, Kp, jnp.float64))
    for _ in range(4):
        ref, ll_r, _ = admixture.em_step(ref, md, cfg)
        dyn, ll_d, _ = admixture.em_step(dyn, md, cfg)
        got = unpad_params_k(dyn, K)
        np.testing.assert_allclose(np.asarray(got.eta),
                                   np.asarray(ref.eta), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(got.p), np.asarray(ref.p),
                                   rtol=1e-12, atol=1e-14)
        assert abs(float(df64.df_value(ll_d))
                   - float(df64.df_value(ll_r))) < 1e-8


# ---------------------------------------------------------------------------
# swept lattice vs serial per-K loop


def _run_sweep(ds, md, opt, codes, seed, swept: bool):
    from multiclust_tpu.runtime.ksweep import estimate_model
    from multiclust_tpu.runtime.multistart import swept_maximize

    npar = lambda K: ds.n_parameters(K, opt.admixture,  # noqa: E731
                                     opt.eta_constrained)
    key = jax.random.PRNGKey(seed)
    if not swept:
        return estimate_model(key, md, opt, npar, codes=codes).per_K
    # replicate estimate_model's per-K key-split discipline
    keys_by_K = []
    for K in range(opt.min_K, opt.max_K + 1):
        key, sub = jax.random.split(key)
        keys_by_K.append((K, sub))
    return swept_maximize(keys_by_K, md, opt, npar, codes=codes,
                          quiet=True)


@pytest.mark.parametrize("accel", [0, 1, 4])
def test_swept_admixture_matches_serial(rng, accel):
    ds = _dataset(rng, K=3, I=48, L=30)
    md = model_data_from_dataset(ds, dtype=jnp.float64)
    from multiclust_tpu.init.random import codes_from_counts
    codes = jnp.asarray(codes_from_counts(ds.counts, ds.miss, 2))
    opt = Options(admixture=True, min_K=2, max_K=4, n_init=3,
                  accel_scheme=accel, dtype="float64", max_iter=250)
    opt = opt.synchronize(ds.I, ds.ploidy)
    got = _run_sweep(ds, md, opt, codes, 7, swept=True)
    want = _run_sweep(ds, md, opt, codes, 7, swept=False)
    # plain EM: K-lane padding only shifts summation order (~ulp);
    # accelerated schemes amplify the ulp through the fp-chaotic
    # accept/backtrack (same phenomenon as the golden-test tolerance)
    rtol = 1e-9 if accel == 0 else 1e-5
    for K in want:
        g, w = got[K], want[K]
        assert g.n_launched == w.n_launched and g.n_init == w.n_init
        np.testing.assert_allclose(g.max_logL, w.max_logL, rtol=rtol)
        np.testing.assert_allclose(g.aic, w.aic, rtol=rtol)
        np.testing.assert_allclose(g.bic, w.bic, rtol=rtol)
        assert g.best_params.p.shape == w.best_params.p.shape
        assert g.best_params.kmask is None


def test_swept_mixture_matches_serial(rng):
    ds = _dataset(rng, K=3, I=48, L=30)
    md = model_data_from_dataset(ds, dtype=jnp.float64)
    opt = Options(admixture=False, min_K=2, max_K=4, n_init=3,
                  dtype="float64", max_iter=250)
    opt = opt.synchronize(ds.I, ds.ploidy)
    got = _run_sweep(ds, md, opt, None, 5, swept=True)
    want = _run_sweep(ds, md, opt, None, 5, swept=False)
    for K in want:
        g, w = got[K], want[K]
        assert g.n_launched == w.n_launched
        np.testing.assert_allclose(g.max_logL, w.max_logL, rtol=1e-9)
        np.testing.assert_allclose(g.bic, w.bic, rtol=1e-9)


def test_swept_constrained_matches_serial(rng):
    ds = _dataset(rng, K=3, I=48, L=30, M=3)
    md = model_data_from_dataset(ds, dtype=jnp.float64)
    from multiclust_tpu.init.random import codes_from_counts
    codes = jnp.asarray(codes_from_counts(ds.counts, ds.miss, 2))
    opt = Options(admixture=True, eta_constrained=True, min_K=2, max_K=4,
                  n_init=2, dtype="float64", max_iter=250)
    opt = opt.synchronize(ds.I, ds.ploidy)
    got = _run_sweep(ds, md, opt, codes, 3, swept=True)
    want = _run_sweep(ds, md, opt, codes, 3, swept=False)
    for K in want:
        np.testing.assert_allclose(got[K].max_logL, want[K].max_logL,
                                   rtol=1e-9)


def test_swept_eligibility_gate():
    """The production gate: serial on CPU (device_policy off), and serial
    for non-default regimes even when padding would be free."""
    from multiclust_tpu.runtime.multistart import swept_eligible

    class FakeMD:
        I, L, M = 100, 50, 2
    md = FakeMD()
    base = Options(admixture=True, min_K=2, max_K=5, n_init=4)
    ks = list(range(2, 6))
    # CPU default: device_policy()[0] False -> serial
    assert not swept_eligible(base.synchronize(100, 2), md, ks)


def test_swept_jagged_matches_serial(rng):
    """Swept lattice x jagged-M bucketing: the kmask rides the tuple-p
    pytree and per-K results match the serial (also bucketed) loop."""
    ds = _dataset(rng, K=3, I=40, L=40, M=6)
    assert ds.M > 2
    md = model_data_from_dataset(ds, dtype=jnp.float64)
    from multiclust_tpu.init.random import codes_from_counts
    codes = jnp.asarray(codes_from_counts(ds.counts, ds.miss, 2))
    opt = Options(admixture=True, min_K=2, max_K=3, n_init=2,
                  dtype="float64", max_iter=200, n_rand_em_init=2)
    opt = opt.synchronize(ds.I, ds.ploidy)
    got = _run_sweep(ds, md, opt, codes, 13, swept=True)
    want = _run_sweep(ds, md, opt, codes, 13, swept=False)
    for K in want:
        np.testing.assert_allclose(got[K].max_logL, want[K].max_logL,
                                   rtol=1e-9)
        assert got[K].best_params.p.shape == want[K].best_params.p.shape


def test_swept_biallelic_interpret_matches_serial(rng):
    """Swept lattice on BIALLELIC data with the interpret-mode kernels:
    dynamic-K chains take the generic fullstep (p epilogue in XLA,
    masked through the kmask) while the serial path runs the
    p0-representation kernels - converged optima must agree (round-5
    regression guard: with the in-kernel p clip silently disabled,
    swept chains converged ~1.5x worse)."""
    import multiclust_tpu.runtime.multistart as ms

    ds = _dataset(rng, K=3, I=32, L=64, M=2)
    md = model_data_from_dataset(ds, dtype=jnp.float32,
                                 storage_dtype=jnp.int8)
    from multiclust_tpu.init.random import codes_from_counts
    codes = jnp.asarray(codes_from_counts(ds.counts, ds.miss, 2))
    opt = Options(admixture=True, min_K=2, max_K=3, n_init=2,
                  n_rand_em_init=2, max_iter=80)
    opt = opt.synchronize(ds.I, ds.ploidy)

    orig = ms.cfg_from_options
    ms.cfg_from_options = (lambda o, k, m=None:
                           orig(o, k, m)._replace(use_pallas="interpret"))
    try:
        got = _run_sweep(ds, md, opt, codes, 21, swept=True)
        want = _run_sweep(ds, md, opt, codes, 21, swept=False)
    finally:
        ms.cfg_from_options = orig
    for K in want:
        # identical inits; generic-vs-p0 kernels differ in fp path, so
        # compare at a tolerance that still flags lost projections
        np.testing.assert_allclose(got[K].max_logL, want[K].max_logL,
                                   rtol=2e-3)
        assert got[K].n_launched == want[K].n_launched


def test_shared_serial_sweep_matches_static(rng):
    """Shared-program serial sweep (maximize_likelihood shared_Kp): the
    per-K engine runs on Kp-padded kmask chains sharing one compiled
    program set; results match the static per-K engine chain for chain."""
    from multiclust_tpu.runtime.multistart import maximize_likelihood

    ds = _dataset(rng, K=3, I=48, L=30)
    md = model_data_from_dataset(ds, dtype=jnp.float64)
    from multiclust_tpu.init.random import codes_from_counts
    codes = jnp.asarray(codes_from_counts(ds.counts, ds.miss, 2))
    opt = Options(admixture=True, n_init=3, dtype="float64",
                  max_iter=250, min_K=2, max_K=4)
    opt = opt.synchronize(ds.I, ds.ploidy)
    for K in (2, 3, 4):
        key = jax.random.PRNGKey(100 + K)
        dyn = maximize_likelihood(key, md, K, opt, 50, codes=codes,
                                  quiet=True, shared_Kp=32)
        st = maximize_likelihood(key, md, K, opt, 50, codes=codes,
                                 quiet=True)
        assert dyn.n_launched == st.n_launched
        np.testing.assert_allclose(dyn.max_logL, st.max_logL, rtol=1e-9)
        assert dyn.best_params.p.shape == st.best_params.p.shape
        assert dyn.best_params.kmask is None


def test_shared_serial_mixture_matches_static(rng):
    """Shared-program serial mode for the MIXTURE model: k_true stays 0
    (no admixture padding machinery) and the kmask alone carries the
    dynamic lane set."""
    from multiclust_tpu.runtime.multistart import maximize_likelihood

    ds = _dataset(rng, K=3, I=48, L=30)
    md = model_data_from_dataset(ds, dtype=jnp.float64)
    opt = Options(admixture=False, n_init=2, dtype="float64",
                  max_iter=250, min_K=2, max_K=4, n_rand_em_init=2)
    opt = opt.synchronize(ds.I, ds.ploidy)
    for K in (2, 4):
        key = jax.random.PRNGKey(200 + K)
        dyn = maximize_likelihood(key, md, K, opt, 50, quiet=True,
                                  shared_Kp=32)
        st = maximize_likelihood(key, md, K, opt, 50, quiet=True)
        assert dyn.n_launched == st.n_launched
        np.testing.assert_allclose(dyn.max_logL, st.max_logL, rtol=1e-9)
        assert dyn.best_params.p.shape == st.best_params.p.shape
