"""Multi-chip sharding: shard-invariance on a virtual 8-device CPU mesh.

SURVEY.md section 4: the sharded psum-merged E/M step must equal the
single-device step (tolerance for reduction-order differences).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiclust_tpu.model import admixture, mixture
from multiclust_tpu.model.common import EMConfig, ModelData, Params, \
    model_data_from_dataset
from multiclust_tpu.ops import df64
from multiclust_tpu.runtime import mesh as mesh_mod
from multiclust_tpu.stats.sim import random_model, simulate_admixture_fast


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(99)
    Q, P = random_model(rng, 4, 16, 3, I=64)
    ds = simulate_admixture_fast(rng, Q, P, ploidy=2, missing_rate=0.1)
    return ds


def make_params(rng, K, ds, per_individual):
    mask = ds.mask
    p = rng.random((K, ds.L, ds.M)) + 0.1
    p = np.where(mask[None], p, 0.0)
    p = p / p.sum(axis=2, keepdims=True)
    if per_individual:
        eta = rng.dirichlet(np.full(K, 2.0), size=ds.I)
    else:
        eta = rng.dirichlet(np.full(K, 2.0))
    return Params(eta=jnp.asarray(eta, jnp.float64),
                  p=jnp.asarray(p, jnp.float64))


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
@pytest.mark.parametrize("admix", [True, False])
def test_em_step_shard_invariance(data, shape, admix):
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(5)
    ds = data
    md = model_data_from_dataset(ds, dtype=jnp.float64)
    params = make_params(rng, 4, ds, per_individual=admix)
    cfg = EMConfig(admixture=admix, eta_lower_bound=1e-8,
                   p_lower_bound=1e-8)

    step = (admixture.em_step if admix
            else lambda p, m, c: mixture.em_step(p, m, c)[:3])
    ref_params, ref_ll, _ = jax.jit(step, static_argnums=2)(params, md, cfg)

    m = mesh_mod.make_mesh(shape)
    md_s = mesh_mod.shard_model_data(md, m)
    params_s = mesh_mod.shard_params(params, m)
    out_params, out_ll, _ = jax.jit(step, static_argnums=2)(
        params_s, md_s, cfg)

    np.testing.assert_allclose(np.asarray(out_params.p),
                               np.asarray(ref_params.p), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out_params.eta),
                               np.asarray(ref_params.eta), atol=1e-12)
    assert abs(float(df64.df_value(out_ll))
               - float(df64.df_value(ref_ll))) < 1e-8


def test_sharded_full_fit_matches(data):
    """A compiled fit on a 4x2 mesh equals the single-device fit."""
    from multiclust_tpu.opt.driver import make_compiled_fit
    rng = np.random.default_rng(6)
    ds = data
    md = model_data_from_dataset(ds, dtype=jnp.float64)
    params = make_params(rng, 3, ds, per_individual=True)
    m = mesh_mod.make_mesh((4, 2))

    # plain EM trajectories only differ by reduction order: tight bound
    cfg = EMConfig(admixture=True)
    fit_fn = make_compiled_fit(cfg)
    ref = fit_fn(params, md)
    out = jax.jit(fit_fn)(mesh_mod.shard_params(params, m),
                          mesh_mod.shard_model_data(md, m))
    assert bool(out.converged)
    assert abs(float(out.logL_hi + out.logL_lo)
               - float(ref.logL_hi + ref.logL_lo)) < 1e-6
    np.testing.assert_allclose(np.asarray(out.params.p),
                               np.asarray(ref.params.p), atol=1e-6)

    # accelerated accept/backtrack flips on reduction order: same optimum
    cfg = EMConfig(admixture=True, accel_scheme=1, adjust_step=5)
    fit_fn = make_compiled_fit(cfg)
    ref = fit_fn(params, md)
    out = jax.jit(fit_fn)(mesh_mod.shard_params(params, m),
                          mesh_mod.shard_model_data(md, m))
    assert bool(out.converged)
    assert abs(float(out.logL_hi + out.logL_lo)
               - float(ref.logL_hi + ref.logL_lo)) < 2e-2


@pytest.mark.parametrize("admix,constrained",
                         [(True, False), (False, False), (True, True)])
def test_production_fit_sharded_matches(data, admix, constrained):
    """The PRODUCTION multi-start engine (maximize_likelihood) on a 4x2
    mesh equals the single-device fit end-to-end - the CLI --mesh contract
    (VERDICT round 1, item 1)."""
    from multiclust_tpu.config import Options
    from multiclust_tpu.init.random import codes_from_counts
    from multiclust_tpu.runtime.multistart import maximize_likelihood

    ds = data
    md = model_data_from_dataset(ds, dtype=jnp.float64)
    codes = jnp.asarray(codes_from_counts(ds.counts, ds.miss, ds.ploidy))
    base = dict(admixture=admix, eta_constrained=constrained, n_init=3,
                batch_chains=3, min_K=3, max_K=3, dtype="float64",
                n_rand_em_init=4)
    ref = maximize_likelihood(
        jax.random.PRNGKey(7), md, 3,
        Options(**base).synchronize(ds.I, ds.ploidy),
        n_parameters=40, codes=codes)
    out = maximize_likelihood(
        jax.random.PRNGKey(7), md, 3,
        Options(**base, mesh_shape=(4, 2)).synchronize(ds.I, ds.ploidy),
        n_parameters=40, codes=codes)
    assert abs(ref.max_logL - out.max_logL) < 1e-6
    assert out.best_params.p.shape == ref.best_params.p.shape
    assert out.best_params.eta.shape == ref.best_params.eta.shape
    np.testing.assert_allclose(np.asarray(out.best_params.p),
                               np.asarray(ref.best_params.p), atol=1e-7)


def test_pallas_kernels_under_shard_map(data):
    """The Pallas full-step (data-sharded) and sweep (2-D mesh) paths match
    the XLA step in interpret mode."""
    from multiclust_tpu.model.common import k_padded_size, pad_params_k

    rng = np.random.default_rng(11)
    ds = data
    md = model_data_from_dataset(ds, dtype=jnp.float32)
    K = 4
    params = Params(
        eta=jnp.asarray(rng.dirichlet(np.full(K, 2.0), size=ds.I),
                        jnp.float32),
        p=jnp.asarray(np.asarray(make_params(rng, K, ds, True).p),
                      jnp.float32))

    cfg0 = EMConfig(admixture=True)
    ref_params, ref_ll, _ = jax.jit(
        admixture.em_step, static_argnums=2)(params, md, cfg0)

    params_p = pad_params_k(params, k_padded_size(K))
    for shape in [(8, 1), (4, 2)]:
        m = mesh_mod.cached_mesh(shape)
        cfg = EMConfig(admixture=True, use_pallas="interpret", k_true=K,
                       mesh=m)
        md_s = mesh_mod.shard_model_data(md, m)
        out, ll, _ = jax.jit(admixture.em_step, static_argnums=2)(
            params_p, md_s, cfg)
        np.testing.assert_allclose(np.asarray(out.eta[:, :K]),
                                   np.asarray(ref_params.eta), atol=3e-6)
        np.testing.assert_allclose(np.asarray(out.p[:K]),
                                   np.asarray(ref_params.p), atol=3e-6)
        assert abs(float(df64.df_value(ll))
                   - float(df64.df_value(ref_ll))) < 1e-2


def test_sharded_sweep_two_pass_kernels(data, monkeypatch):
    """L-sharded Pallas path falls back to the two-pass sweep kernels when
    the fused B accumulator exceeds the VMEM budget (biobank-scale LM),
    and still matches the XLA step (VERDICT round 1, weak 6)."""
    from multiclust_tpu.model.common import k_padded_size, pad_params_k
    from multiclust_tpu.ops import kernels

    # force the two-pass path: pretend B never fits
    monkeypatch.setattr(kernels, "FUSED_B_VMEM_LIMIT", 0)

    rng = np.random.default_rng(13)
    ds = data
    md = model_data_from_dataset(ds, dtype=jnp.float32)
    K = 4
    params = Params(
        eta=jnp.asarray(rng.dirichlet(np.full(K, 2.0), size=ds.I),
                        jnp.float32),
        p=jnp.asarray(np.asarray(make_params(rng, K, ds, True).p),
                      jnp.float32))
    cfg0 = EMConfig(admixture=True)
    ref_params, ref_ll, _ = jax.jit(
        admixture.em_step, static_argnums=2)(params, md, cfg0)

    m = mesh_mod.cached_mesh((2, 4))
    cfg = EMConfig(admixture=True, use_pallas="interpret",
                   k_true=K, mesh=m)
    md_s = mesh_mod.shard_model_data(md, m)
    params_p = pad_params_k(params, k_padded_size(K))
    out, ll, _ = jax.jit(admixture.em_step, static_argnums=2)(
        params_p, md_s, cfg)
    np.testing.assert_allclose(np.asarray(out.eta[:, :K]),
                               np.asarray(ref_params.eta), atol=3e-6)
    np.testing.assert_allclose(np.asarray(out.p[:K]),
                               np.asarray(ref_params.p), atol=3e-6)
    assert abs(float(df64.df_value(ll))
               - float(df64.df_value(ref_ll))) < 1e-2


def test_padded_rows_are_inert(data):
    """Padding individuals/loci to shardable sizes must not change the
    fit (mixture uses row_valid; admixture pads are inert)."""
    rng = np.random.default_rng(7)
    ds = data
    md = model_data_from_dataset(ds, dtype=jnp.float64)

    I_pad, L_pad = ds.I + 5, ds.L + 3
    c, mi, na = mesh_mod.pad_dataset_arrays(ds.counts, ds.miss,
                                            ds.n_alleles, I_pad, L_pad)
    row_valid = np.arange(I_pad) < ds.I
    md_pad = ModelData(
        x=jnp.asarray(c, jnp.float64), miss=jnp.asarray(mi, jnp.float64),
        mask=jnp.asarray(np.arange(ds.M)[None] < na[:, None]),
        n_alleles=jnp.asarray(na, jnp.int32),
        row_valid=jnp.asarray(row_valid))

    for admix in (True, False):
        cfg = EMConfig(admixture=admix)
        params = make_params(rng, 3, ds, per_individual=admix)
        if admix:
            eta_pad = np.full((I_pad, 3), 1.0 / 3)
            eta_pad[:ds.I] = np.asarray(params.eta)
            params_pad = Params(eta=jnp.asarray(eta_pad, jnp.float64),
                                p=jnp.pad(params.p,
                                          ((0, 0), (0, 3), (0, 0))))
            new_p, ll_p, _ = admixture.em_step(params_pad, md_pad, cfg)
            new_r, ll_r, _ = admixture.em_step(params, md, cfg)
            np.testing.assert_allclose(np.asarray(new_p.eta)[:ds.I],
                                       np.asarray(new_r.eta), atol=1e-12)
        else:
            params_pad = Params(eta=params.eta,
                                p=jnp.pad(params.p,
                                          ((0, 0), (0, 3), (0, 0))))
            new_p, ll_p, _, _ = mixture.em_step(params_pad, md_pad, cfg)
            new_r, ll_r, _, _ = mixture.em_step(params, md, cfg)
            np.testing.assert_allclose(np.asarray(new_p.eta),
                                       np.asarray(new_r.eta), atol=1e-12)
        np.testing.assert_allclose(np.asarray(new_p.p)[:, :ds.L],
                                   np.asarray(new_r.p), atol=1e-12)
        assert abs(float(df64.df_value(ll_p))
                   - float(df64.df_value(ll_r))) < 1e-9
