"""Pallas fused-sweep kernels vs the XLA reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiclust_tpu.model import admixture
from multiclust_tpu.model.common import EMConfig, Params, \
    model_data_from_dataset
from multiclust_tpu.ops import df64
from multiclust_tpu.ops.kernels import admixture_sweep_fused, \
    admixture_sweep_stats, fused_fits, pad_for_kernel
from multiclust_tpu.stats.sim import random_model, simulate_admixture_fast


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    K = 3
    Q, P = random_model(rng, K, 40, 3, I=70)
    ds = simulate_admixture_fast(rng, Q, P, ploidy=2, missing_rate=0.1)
    md = model_data_from_dataset(ds, dtype=jnp.float32)
    eta = rng.dirichlet(np.full(K, 2.0), size=ds.I)
    p = rng.random((K, ds.L, ds.M)) + 0.1
    p = np.where(ds.mask[None], p, 0.0)
    p = p / p.sum(axis=2, keepdims=True)
    params = Params(eta=jnp.asarray(eta, jnp.float32),
                    p=jnp.asarray(p, jnp.float32))
    return ds, md, params


def test_sweep_stats_match_xla(setup):
    ds, md, params = setup
    K = params.K
    p2 = params.p.reshape(K, -1)
    x2 = md.x2d
    # XLA reference quantities
    denom = params.eta @ p2
    w = jnp.where(x2 > 0, x2 / denom, 0.0)
    A_ref = w @ p2.T
    B_ref = params.eta.T @ w
    t_ref = jnp.sum(jnp.where(x2 > 0, x2 * jnp.log(denom), 0.0), axis=1)

    eta_p, p2_p, x2_p, (I, Kk, LM) = pad_for_kernel(params.eta, p2, x2,
                                                    ti=32, tl=128)
    A, t, B = admixture_sweep_stats(eta_p, p2_p, x2_p, ti=32, tl=128,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(A[:I, :Kk]), np.asarray(A_ref),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(B[:Kk, :LM]), np.asarray(B_ref),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t[:I]), np.asarray(t_ref),
                               rtol=2e-5, atol=5e-3)


@pytest.mark.parametrize("x_dtype", [jnp.float32, jnp.int8])
def test_fused_sweep_matches_xla(setup, x_dtype):
    """Single-pass kernel == two-pass kernels == XLA, f32 and int8 x."""
    ds, md, params = setup
    K = params.K
    p2 = params.p.reshape(K, -1)
    x2 = md.x2d
    denom = params.eta @ p2
    w = jnp.where(x2 > 0, x2 / denom, 0.0)
    A_ref = w @ p2.T
    B_ref = params.eta.T @ w
    t_ref = jnp.sum(jnp.where(x2 > 0, x2 * jnp.log(denom), 0.0), axis=1)

    eta_p, p2_p, x2_p, (I, Kk, LM) = pad_for_kernel(
        params.eta, p2, x2.astype(x_dtype), ti=32, tl=128)
    assert fused_fits(eta_p.shape[1], p2_p.shape[1])
    A, t, B = admixture_sweep_fused(eta_p, p2_p, x2_p, ti=32, tl=128,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(A[:I, :Kk]), np.asarray(A_ref),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(B[:Kk, :LM]), np.asarray(B_ref),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t[:I]), np.asarray(t_ref),
                               rtol=2e-5, atol=5e-3)
    # padding rows/cols carry no mass
    np.testing.assert_array_equal(np.asarray(A[I:]), 0.0)
    np.testing.assert_array_equal(np.asarray(B[Kk:]), 0.0)


def test_k_padded_em_step_matches_unpadded(setup):
    """The K-padded layout (cfg.k_true, zero pad rows/lanes) reproduces the
    unpadded trajectory on both the XLA and Pallas paths, and the pads stay
    exactly zero across iterations."""
    from multiclust_tpu.model.common import pad_params_k, unpad_params_k

    ds, md, params = setup
    K = params.K
    Kp = 8
    for use_pallas in ("off", "interpret"):
        cfg = EMConfig(admixture=True, use_pallas=use_pallas)
        cfg_pad = cfg._replace(k_true=K)
        ref = params
        pad = pad_params_k(params, Kp)
        for _ in range(4):
            ref, ll_r, _ = admixture.em_step(ref, md, cfg)
            pad, ll_p, _ = admixture.em_step(pad, md, cfg_pad)
            np.testing.assert_array_equal(np.asarray(pad.eta[:, K:]), 0.0)
            np.testing.assert_array_equal(np.asarray(pad.p[K:]), 0.0)
            got = unpad_params_k(pad, K)
            np.testing.assert_allclose(np.asarray(got.eta),
                                       np.asarray(ref.eta),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(got.p), np.asarray(ref.p),
                                       rtol=1e-5, atol=1e-6)
            assert abs(float(df64.df_value(ll_p))
                       - float(df64.df_value(ll_r))) < 5e-3


@pytest.mark.parametrize("missing_rate", [0.0, 0.15])
def test_fullstep_kernel_matches_xla(missing_rate):
    """The single-kernel full step (K-padded layout, eta update on-chip)
    reproduces the XLA trajectory, including missing data and jagged loci."""
    from multiclust_tpu.model.common import (ModelData, k_padded_size,
                                             model_data_from_dataset,
                                             pad_params_k, unpad_params_k)
    from multiclust_tpu.stats.sim import random_model, \
        simulate_admixture_fast

    rng = np.random.default_rng(5)
    K, I, L, M = 3, 16, 50, 3
    Q, P = random_model(rng, K, L, M, I=I)
    ds = simulate_admixture_fast(rng, Q, P, ploidy=2,
                                 missing_rate=missing_rate)
    md = model_data_from_dataset(ds, dtype=jnp.float32)
    eta = rng.dirichlet(np.full(K, 2.0), size=I)
    p = rng.random((K, ds.L, ds.M)) + 0.1
    p = np.where(ds.mask[None], p, 0.0)
    p = p / p.sum(axis=2, keepdims=True)
    params = Params(eta=jnp.asarray(eta, jnp.float32),
                    p=jnp.asarray(p, jnp.float32))

    cfg = EMConfig(admixture=True)
    cfg_full = cfg._replace(k_true=K, use_pallas="interpret")
    ref = params
    pad = pad_params_k(params, k_padded_size(K))
    assert pad.eta.shape[1] == 128  # fullstep dispatch requires 128k lanes
    for _ in range(3):
        ref, ll_r, _ = admixture.em_step(ref, md, cfg)
        pad, ll_p, _ = admixture.em_step(pad, md, cfg_full)
        np.testing.assert_array_equal(np.asarray(pad.eta[:, K:]), 0.0)
        np.testing.assert_array_equal(np.asarray(pad.p[K:]), 0.0)
        got = unpad_params_k(pad, K)
        np.testing.assert_allclose(np.asarray(got.eta), np.asarray(ref.eta),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got.p), np.asarray(ref.p),
                                   rtol=1e-5, atol=1e-6)
        assert abs(float(df64.df_value(ll_p))
                   - float(df64.df_value(ll_r))) < 5e-3


def test_pallas_em_step_matches_xla(setup):
    ds, md, params = setup
    cfg_x = EMConfig(admixture=True)
    cfg_p = EMConfig(admixture=True, use_pallas="interpret")
    new_x, ll_x, _ = admixture.em_step(params, md, cfg_x)
    new_p, ll_p, _ = admixture.em_step(params, md, cfg_p)
    np.testing.assert_allclose(np.asarray(new_p.eta), np.asarray(new_x.eta),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_p.p), np.asarray(new_x.p),
                               rtol=1e-5, atol=1e-6)
    assert abs(float(df64.df_value(ll_p)) - float(df64.df_value(ll_x))) \
        < 5e-3
