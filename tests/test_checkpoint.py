import jax
import pytest
import jax.numpy as jnp
import numpy as np

from multiclust_tpu.config import Options
from multiclust_tpu.model.common import model_data_from_dataset
from multiclust_tpu.runtime import checkpoint as ckpt
from multiclust_tpu.runtime.multistart import maximize_likelihood
from multiclust_tpu.stats.sim import random_model, simulate_mixture


def make(rng):
    P = rng.dirichlet(np.full(3, 0.3), size=(3, 25))
    ds, _ = simulate_mixture(rng, np.array([.3, .3, .4]), P, I=50)
    return ds


def test_checkpoint_roundtrip(tmp_path, rng):
    ds = make(rng)
    md = model_data_from_dataset(ds, dtype=jnp.float64)
    opt = Options(n_init=3, min_K=2, max_K=2, dtype="float64")
    key = jax.random.PRNGKey(0)
    res = maximize_likelihood(key, md, 2, opt,
                              ds.n_parameters(2, False, False),
                              checkpoint_dir=str(tmp_path))
    assert (tmp_path / "multiclust_ckpt.K=2.npz").exists()

    loaded, saved_key = ckpt.load(str(tmp_path), 2)
    assert loaded.max_logL == res.max_logL
    assert loaded.n_launched == res.n_launched
    np.testing.assert_allclose(np.asarray(loaded.best_params.p),
                               np.asarray(res.best_params.p))


def test_checkpoint_resume_skips_completed(tmp_path, rng):
    ds = make(rng)
    md = model_data_from_dataset(ds, dtype=jnp.float64)
    opt = Options(n_init=3, min_K=2, max_K=2, dtype="float64")
    key = jax.random.PRNGKey(0)
    res1 = maximize_likelihood(key, md, 2, opt,
                               ds.n_parameters(2, False, False),
                               checkpoint_dir=str(tmp_path))
    # a completed sweep resumes instantly with identical results
    res2 = maximize_likelihood(jax.random.PRNGKey(777), md, 2, opt,
                               ds.n_parameters(2, False, False),
                               checkpoint_dir=str(tmp_path))
    assert res2.max_logL == res1.max_logL
    assert res2.n_launched == res1.n_launched


def _bootstrap_setup(rng):
    """Small structured admixture problem + its observed fit."""
    from multiclust_tpu.init.random import codes_from_counts
    from multiclust_tpu.runtime.ksweep import estimate_model
    from multiclust_tpu.stats.sim import simulate_admixture_fast

    P2 = np.stack([np.stack([np.full(20, 0.9), np.full(20, 0.1)], 1),
                   np.stack([np.full(20, 0.1), np.full(20, 0.9)], 1)])
    Q2 = np.tile(np.array([[1.0, 0.0]]), (24, 1))
    Q2[12:] = [0.0, 1.0]
    ds = simulate_admixture_fast(rng, Q2, P2, ploidy=2)
    md = model_data_from_dataset(ds, dtype=jnp.float64)
    codes = jnp.asarray(codes_from_counts(ds.counts, ds.miss, 2))
    opt = Options(admixture=True, n_init=2, min_K=2, max_K=2,
                  n_bootstrap=6, dtype="float64")
    npar = lambda K: ds.n_parameters(K, True, False)  # noqa: E731
    est = estimate_model(jax.random.PRNGKey(0), md, opt, npar, codes=codes)
    return ds, md, opt, npar, est


@pytest.mark.slow
def test_bootstrap_checkpoint_resume_identical(tmp_path, rng, monkeypatch):
    """Kill a batched -b run mid-way, resume from the checkpoint, and get
    an IDENTICAL ts list and p-value (VERDICT r3 item 4; the reference's
    run_bootstrap, multiclust.c:675-708, restarts from zero)."""
    from multiclust_tpu.stats import bootstrap as bs

    ds, md, opt, npar, est = _bootstrap_setup(rng)
    key = jax.random.PRNGKey(11)

    # force multi-chunk batching so "mid-way" exists (chunking must be
    # identical across all runs: it drives the per-chunk key splits)
    monkeypatch.setattr(bs, "replicate_chunk", lambda *a, **k: 2)

    ref = bs.run_bootstrap(key, md, opt, npar, est.ts, est.h0_params, 2)

    # interrupted run: die inside the second chunk's lattice fits
    real_fit = bs._fit_lattice
    calls = {"n": 0}

    def dying_fit(*a, **k):
        calls["n"] += 1
        if calls["n"] > 2:          # 2 calls (H0+Ha) = first chunk done
            raise RuntimeError("killed mid-bootstrap")
        return real_fit(*a, **k)

    monkeypatch.setattr(bs, "_fit_lattice", dying_fit)
    try:
        bs.run_bootstrap(key, md, opt, npar, est.ts, est.h0_params, 2,
                         checkpoint_dir=str(tmp_path))
        raise AssertionError("interruption did not fire")
    except RuntimeError:
        pass
    assert (tmp_path / "multiclust_ckpt.bootstrap.K=1v2.npz").exists()

    # resume: completes only the remaining chunks, identical results
    monkeypatch.setattr(bs, "_fit_lattice", real_fit)
    res = bs.run_bootstrap(key, md, opt, npar, est.ts, est.h0_params, 2,
                           checkpoint_dir=str(tmp_path))
    np.testing.assert_array_equal(np.asarray(res.ts_bs),
                                  np.asarray(ref.ts_bs))
    assert res.pvalue == ref.pvalue


@pytest.mark.slow
def test_bootstrap_checkpoint_serial_path(tmp_path, rng, monkeypatch):
    """Same contract on the serial per-replicate loop (-t/-u/verbose
    regimes): interrupt after one replicate, resume, identical ts."""
    from multiclust_tpu.stats import bootstrap as bs

    ds, md, opt, npar, est = _bootstrap_setup(rng)
    opt.n_bootstrap = 3
    opt.verbosity = 4          # exotic regime -> serial replicate loop
    key = jax.random.PRNGKey(5)

    ref = bs.run_bootstrap(key, md, opt, npar, est.ts, est.h0_params, 2)

    def dying_log(rep, ts, ntime):
        if rep >= 1:
            raise RuntimeError("killed mid-bootstrap")

    try:
        bs.run_bootstrap(key, md, opt, npar, est.ts, est.h0_params, 2,
                         log=dying_log, checkpoint_dir=str(tmp_path))
        raise AssertionError("interruption did not fire")
    except RuntimeError:
        pass

    res = bs.run_bootstrap(key, md, opt, npar, est.ts, est.h0_params, 2,
                           checkpoint_dir=str(tmp_path))
    np.testing.assert_array_equal(np.asarray(res.ts_bs),
                                  np.asarray(ref.ts_bs))
    assert res.pvalue == ref.pvalue


def test_checkpoint_resume_continues(tmp_path, rng):
    ds = make(rng)
    md = model_data_from_dataset(ds, dtype=jnp.float64)
    key = jax.random.PRNGKey(0)
    npar = ds.n_parameters(2, False, False)
    # partial sweep: 2 inits
    opt_small = Options(n_init=2, min_K=2, max_K=2, dtype="float64")
    res1 = maximize_likelihood(key, md, 2, opt_small, npar,
                               checkpoint_dir=str(tmp_path))
    assert res1.n_launched == 2
    # resume and extend to 6 inits
    opt_big = Options(n_init=6, min_K=2, max_K=2, dtype="float64")
    res2 = maximize_likelihood(key, md, 2, opt_big, npar,
                               checkpoint_dir=str(tmp_path))
    assert res2.n_launched >= 6
    assert res2.max_logL >= res1.max_logL
