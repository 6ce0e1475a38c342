import jax
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
