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


@pytest.mark.parametrize("missing_rate,k_mult",
                         [(0.0, 128), (0.15, 128), (0.0, 32), (0.15, 32)])
def test_fullstep_kernel_matches_xla(missing_rate, k_mult):
    """The single-kernel full step (K-padded layout, eta update on-chip)
    reproduces the XLA trajectory, including missing data and jagged loci,
    at both the legacy 128-lane and the production 32-lane K padding."""
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
    pad = pad_params_k(params, k_padded_size(K, k_mult))
    assert pad.eta.shape[1] == k_mult  # 32-lane granularity dispatches
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


@pytest.mark.parametrize("missing_rate", [0.0, 0.15])
def test_biallelic_fullstep_matches_xla(missing_rate):
    """The biallelic full step (p1 = 1 - p0; p update entirely on-chip,
    missing mass folded into the in-kernel B matmuls) reproduces the XLA
    trajectory on strictly-biallelic data."""
    from multiclust_tpu.model.common import (ModelData, k_padded_size,
                                             pad_params_k, unpad_params_k)

    rng = np.random.default_rng(9)
    I, L, K = 48, 70, 4
    p0t = rng.uniform(0.2, 0.8, size=(K, L))
    eta = rng.dirichlet(np.full(K, 2.0), size=I)
    miss = (rng.binomial(2, missing_rate, size=(I, L))
            if missing_rate else np.zeros((I, L), np.int64))
    x0 = rng.binomial(2 - miss, 0.5, size=(I, L))
    counts = np.stack([x0, 2 - miss - x0], axis=2)
    md = ModelData(x=jnp.asarray(counts, jnp.int8),
                   miss=jnp.asarray(miss, jnp.float32),
                   mask=jnp.ones((L, 2), bool),
                   n_alleles=jnp.full((L,), 2, jnp.int32))
    md_f = md._replace(x=md.x.astype(jnp.float32))
    md = md.prepare_for_em(bi=True)
    assert md.miss_st.dtype == jnp.int8
    params = Params(eta=jnp.asarray(eta, jnp.float32),
                    p=jnp.asarray(np.stack([p0t, 1 - p0t], axis=2),
                                  jnp.float32))

    cfg = EMConfig(admixture=True, has_missing=missing_rate > 0)
    cfg_bi = cfg._replace(k_true=K, use_pallas="interpret", biallelic=True)
    ref = params
    pad = pad_params_k(params, k_padded_size(K))
    for it in range(4):
        ref, ll_r, _ = admixture.em_step(ref, md_f, cfg)
        pad, ll_p, _ = admixture.em_step(pad, md, cfg_bi)
        np.testing.assert_array_equal(np.asarray(pad.eta[:, K:]), 0.0)
        np.testing.assert_array_equal(np.asarray(pad.p[K:]), 0.0)
        got = unpad_params_k(pad, K)
        np.testing.assert_allclose(np.asarray(got.eta), np.asarray(ref.eta),
                                   rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got.p), np.asarray(ref.p),
                                   rtol=1e-4, atol=5e-5)
        assert abs(float(df64.df_value(ll_p))
                   - float(df64.df_value(ll_r))) < 5e-3
        # p rows stay exact complements (the invariant the kernel exploits)
        np.testing.assert_allclose(
            np.asarray(got.p).sum(axis=2), 1.0, atol=1e-6)


def test_chunked_mode_engine_step_matches_xla(monkeypatch):
    """_em_step_bi_repr with the CHUNKED layout (resident ladder forced
    inadmissible, tiny per-copy budget so a 512-locus panel splits into 4
    chained launches) tracks the XLA trajectory - the production
    biobank-L path end-to-end through the p0-representation step."""
    from multiclust_tpu.model.common import (ModelData, k_padded_size,
                                             pad_params_k, unpad_params_k)
    from multiclust_tpu.ops import kernels
    from multiclust_tpu.runtime.multistart import _to_bi_repr

    monkeypatch.setattr(kernels, "pick_layout_biallelic",
                        lambda I, Kp, L, emit_b=False: (0, 0, 0))
    # budget sized so the 3/4 chunk-mode cap still admits Lc=128
    monkeypatch.setattr(kernels, "_FULLSTEP_BI_TILES",
                        ((64, 128, 2 * 128 * 32 * 4),))

    rng = np.random.default_rng(41)
    I, L, K = 64, 500, 4
    p0t = rng.uniform(0.2, 0.8, size=(K, L))
    eta = rng.dirichlet(np.full(K, 2.0), size=I)
    miss = rng.binomial(2, 0.05, size=(I, L))
    x0 = rng.binomial(2 - miss, 0.5)
    counts = np.stack([x0, 2 - miss - x0], axis=2)
    md = ModelData(x=jnp.asarray(counts, jnp.int8),
                   miss=jnp.asarray(miss, jnp.float32),
                   mask=jnp.ones((L, 2), bool),
                   n_alleles=jnp.full((L,), 2, jnp.int32)).prepare_for_em(
                       bi=True)
    md_f = md._replace(x=md.x.astype(jnp.float32))
    params = Params(eta=jnp.asarray(eta, jnp.float32),
                    p=jnp.asarray(np.stack([p0t, 1 - p0t], axis=2),
                                  jnp.float32))
    cfg = EMConfig(admixture=True, has_missing=True)
    cfg_bi = cfg._replace(k_true=K, use_pallas="interpret", biallelic=True)
    Kp = k_padded_size(K, 32)
    assert kernels.pick_layout_biallelic_any(I, Kp, L)[3] == "chunked"
    bi = _to_bi_repr(pad_params_k(params, Kp), cfg_bi, I, L)
    assert bi.p.ndim == 2 and bi.p.shape[1] % 128 == 0  # Lp = 4 x 128
    ref = params
    for it in range(3):
        ref, ll_r, _ = admixture.em_step(ref, md_f, cfg)
        bi, ll_b, _ = admixture.em_step(bi, md, cfg_bi)
        assert abs(float(df64.df_value(ll_b))
                   - float(df64.df_value(ll_r))) < 5e-3
    p0n = np.asarray(bi.p)[:K, :L]
    np.testing.assert_allclose(p0n, np.asarray(ref.p)[:, :, 0],
                               rtol=1e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(bi.eta)[:, :K],
                               np.asarray(ref.eta), rtol=1e-4, atol=5e-5)


@pytest.mark.parametrize("accel,missing_rate",
                         [(0, 0.0), (1, 0.0), (0, 0.1), (1, 0.1)])
def test_bi_repr_engine_matches_xla(accel, missing_rate):
    """The multi-start engine on the biallelic p0-REPRESENTATION (the
    production TPU layout: p carried as [Kp, Lp] across whole segments)
    reaches the XLA fit's results, plain and SQUAREM-accelerated (the
    acceleration machinery runs on the p0 pytree: ring buffers, step
    sizes, projection of trial points, guarded accept)."""
    from multiclust_tpu.model.common import model_data_from_dataset
    from multiclust_tpu.runtime.multistart import _pad_k, _to_bi_repr, \
        _unpad_k, fit_batch

    rng = np.random.default_rng(21)
    I, L, K = 64, 80, 3
    # STRUCTURED data (well-separated optima): basin comparison is
    # meaningless on unstructured noise
    p_true = rng.choice([0.1, 0.9], size=(K, L))
    eta_true = rng.dirichlet(np.full(K, 0.3), size=I)
    q = eta_true @ p_true
    miss = (rng.binomial(2, missing_rate, size=(I, L))
            if missing_rate else np.zeros((I, L), np.int64))
    x0 = rng.binomial(2 - miss, q)
    counts = np.stack([x0, 2 - miss - x0], axis=2)
    p0t = rng.uniform(0.2, 0.8, size=(K, L))
    eta = rng.dirichlet(np.full(K, 2.0), size=I)
    from multiclust_tpu.model.common import ModelData
    md = ModelData(x=jnp.asarray(counts, jnp.int8),
                   miss=jnp.asarray(miss, jnp.float32),
                   mask=jnp.ones((L, 2), bool),
                   n_alleles=jnp.full((L,), 2, jnp.int32))
    md_f = md._replace(x=md.x.astype(jnp.float32))
    params = Params(eta=jnp.asarray(eta, jnp.float32),
                    p=jnp.asarray(np.stack([p0t, 1 - p0t], axis=2),
                                  jnp.float32))
    batched = jax.tree_util.tree_map(lambda t: t[None], params)

    # cap both paths at the same iteration count: near convergence the
    # logL plateau is flat while parameters still drift, so free-running
    # chains stop at different ridge points and parameter comparison is
    # meaningless; at equal iterations the trajectories track closely
    # plain EM: run both to a fixed iteration cap - trajectories track
    # within fp noise, so states are directly comparable.  Accelerated:
    # accept/backtrack decisions flip on rounding and the trajectories
    # diverge chaotically (while both monotonically improve), so compare
    # converged logL at basin tolerance like the accelerated goldens.
    hm = missing_rate > 0
    if accel:
        base = dict(admixture=True, has_missing=hm, accel_scheme=1,
                    adjust_step=5)
    else:
        base = dict(admixture=True, has_missing=hm, accel_scheme=0,
                    max_iter=120, abs_error=1e-12, noise_factor=0.0)
    cfg_x = EMConfig(**base)
    cfg_b = EMConfig(**base, use_pallas="interpret", biallelic=True,
                     k_true=K)
    assert cfg_b.bi_repr_active

    ref_state, _ = fit_batch(batched, md_f, cfg_x)
    bi = _to_bi_repr(_pad_k(batched, cfg_b), cfg_b, I, L)
    assert bi.p.ndim == 3 and bi.p.shape[-1] != 2  # really the p0 repr
    out_state, _ = fit_batch(bi, md, cfg_b)
    got = _unpad_k(jax.tree_util.tree_map(lambda t: t[0], out_state.params),
                   cfg_b, I, L)
    ref_ll = float(ref_state.logL_hi[0] + ref_state.logL_lo[0])
    out_ll = float(out_state.logL_hi[0] + out_state.logL_lo[0])
    assert bool(out_state.stopped[0])
    if accel:
        # accelerated f32 chains stop at different plateau points; the
        # invariant is that the bi-repr chain converges no worse
        assert bool(out_state.converged[0])
        assert out_ll >= ref_ll - 2.0, (out_ll, ref_ll)
    else:
        assert abs(int(out_state.n_iter[0])
                   - int(ref_state.n_iter[0])) <= 2
        # the missing-mass fold adds another rounding pathway, so the f32
        # trajectories drift a bit further apart over the 120 capped
        # iterations (per-step parity is the tight check:
        # test_biallelic_fullstep_matches_xla at rtol 1e-4)
        ll_tol, p_tol = (1.0, 5e-2) if missing_rate else (0.1, 2e-2)
        assert abs(out_ll - ref_ll) < ll_tol, (out_ll, ref_ll)
        ref_params = jax.tree_util.tree_map(lambda t: t[0],
                                            ref_state.params)
        np.testing.assert_allclose(np.asarray(got.eta),
                                   np.asarray(ref_params.eta), atol=p_tol)
        np.testing.assert_allclose(np.asarray(got.p),
                                   np.asarray(ref_params.p), atol=p_tol)
    # the p rows remain exact complements after reconstruction
    np.testing.assert_allclose(np.asarray(got.p).sum(axis=2), 1.0,
                               atol=1e-6)


@pytest.mark.parametrize("with_miss,compute_t",
                         [(False, True), (True, True), (True, False)])
def test_streamed_biallelic_matches_resident(with_miss, compute_t):
    """The streamed two-pass biallelic kernel (biobank-L path: p0 and
    B0/B1 as [Kp, tl] blocks, no resident [Kp, Lp] arrays) reproduces the
    resident single-kernel full step on identical inputs."""
    from multiclust_tpu.ops.kernels import (
        admixture_fullstep_biallelic, admixture_fullstep_biallelic_streamed)

    rng = np.random.default_rng(17)
    I, L, Kp, kt = 128, 256, 32, 5
    eta = np.zeros((I, Kp), np.float32)
    eta[:, :kt] = rng.dirichlet(np.full(kt, 2.0), size=I)
    p0 = np.zeros((Kp, L), np.float32)
    p0[:kt] = rng.uniform(0.2, 0.8, size=(kt, L))
    miss = (rng.binomial(2, 0.1, size=(I, L)) if with_miss
            else np.zeros((I, L), np.int64))
    x0 = rng.binomial(2 - miss, 0.5)
    x1 = 2 - miss - x0
    args = [jnp.asarray(eta), jnp.asarray(p0),
            jnp.asarray(x0, jnp.int8), jnp.asarray(x1, jnp.int8),
            jnp.asarray(miss.sum(axis=1, keepdims=True), jnp.float32),
            jnp.asarray(miss, jnp.int8) if with_miss else None]
    kw = dict(k_true=kt, lb=1e-8, plb=1e-8, project=True,
              compute_t=compute_t, interpret=True)
    er, tr, pr = admixture_fullstep_biallelic(*args, ti=64, tl=128, **kw)
    es, ts, ps = admixture_fullstep_biallelic_streamed(
        *args, ti=64, tl=128, **kw)
    np.testing.assert_allclose(np.asarray(es), np.asarray(er),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(pr),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ts), np.asarray(tr),
                               rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("with_miss,emit", [(False, ""), (True, ""),
                                            (False, "b"), (True, "ab")])
def test_chunked_biallelic_matches_resident(with_miss, emit):
    """The chained ONE-PASS chunked biallelic path (resident launches
    over tl-aligned column chunks, A threaded through the a0 input via
    static block-spec offsets) reproduces the resident single-kernel
    full step bit-for-... well, to fp tolerance - including the emit_b
    (data-mesh) and emit_a+emit_b (loci-mesh) raw-accumulator
    variants."""
    from multiclust_tpu.ops.kernels import (
        admixture_fullstep_biallelic, admixture_fullstep_biallelic_chunked)

    rng = np.random.default_rng(31)
    I, L, Kp, kt = 128, 512, 32, 5
    eta = np.zeros((I, Kp), np.float32)
    eta[:, :kt] = rng.dirichlet(np.full(kt, 2.0), size=I)
    p0 = np.zeros((Kp, L), np.float32)
    p0[:kt] = rng.uniform(0.2, 0.8, size=(kt, L))
    miss = (rng.binomial(2, 0.1, size=(I, L)) if with_miss
            else np.zeros((I, L), np.int64))
    x0 = rng.binomial(2 - miss, 0.5)
    x1 = 2 - miss - x0
    args = [jnp.asarray(eta), jnp.asarray(p0),
            jnp.asarray(x0, jnp.int8), jnp.asarray(x1, jnp.int8),
            jnp.asarray(miss.sum(axis=1, keepdims=True), jnp.float32),
            jnp.asarray(miss, jnp.int8) if with_miss else None]
    kw = dict(ti=64, tl=128, k_true=kt, lb=1e-8, plb=1e-8, project=True,
              compute_t=True, emit_b="b" in emit, emit_a="a" in emit,
              interpret=True)
    ref = admixture_fullstep_biallelic(*args, **kw)
    got = admixture_fullstep_biallelic_chunked(*args, n_chunks=4, **kw)
    names = (("A" if "a" in emit else "eta'"), "t", "B0", "B1") \
        if "b" in emit else ("eta'", "t", "p0'")
    for name, g, r in zip(names, got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=2e-3, err_msg=name)


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


def test_fullstep_compute_t_off_same_params(setup):
    """want_ll=False (check-interval mode) must leave the parameter update
    bit-identical and only zero the logL - for the generic fullstep, the
    biallelic fullstep, and the XLA path."""
    ds, md, params = setup
    from multiclust_tpu.model.common import k_padded_size, pad_params_k

    # XLA path
    cfg = EMConfig(admixture=True)
    new_on, ll_on, _ = admixture.em_step(params, md, cfg, want_ll=True)
    new_off, ll_off, sc = admixture.em_step(params, md, cfg, want_ll=False)
    np.testing.assert_array_equal(np.asarray(new_off.eta),
                                  np.asarray(new_on.eta))
    np.testing.assert_array_equal(np.asarray(new_off.p),
                                  np.asarray(new_on.p))
    assert float(df64.df_value(ll_off)) == 0.0 and float(sc) == 0.0

    # generic fullstep kernel (K-padded layout)
    K = params.K
    cfg_full = cfg._replace(k_true=K, use_pallas="interpret")
    pad = pad_params_k(params, k_padded_size(K))
    f_on, _, _ = admixture.em_step(pad, md, cfg_full, want_ll=True)
    f_off, ll_f, _ = admixture.em_step(pad, md, cfg_full, want_ll=False)
    np.testing.assert_array_equal(np.asarray(f_off.eta),
                                  np.asarray(f_on.eta))
    np.testing.assert_array_equal(np.asarray(f_off.p), np.asarray(f_on.p))
    assert float(df64.df_value(ll_f)) == 0.0


def test_biallelic_compute_t_off_same_params():
    from multiclust_tpu.model.common import ModelData, k_padded_size, \
        pad_params_k

    rng = np.random.default_rng(3)
    I, L, K = 16, 40, 3
    x0 = rng.binomial(2, 0.5, size=(I, L))
    md = ModelData(x=jnp.asarray(np.stack([x0, 2 - x0], axis=2), jnp.int8),
                   miss=jnp.zeros((I, L), jnp.float32),
                   mask=jnp.ones((L, 2), bool),
                   n_alleles=jnp.full((L,), 2, jnp.int32))
    eta = rng.dirichlet(np.full(K, 2.0), size=I)
    p0t = rng.uniform(0.2, 0.8, size=(K, L))
    params = pad_params_k(
        Params(eta=jnp.asarray(eta, jnp.float32),
               p=jnp.asarray(np.stack([p0t, 1 - p0t], axis=2), jnp.float32)),
        k_padded_size(K))
    cfg = EMConfig(admixture=True, has_missing=False, biallelic=True,
                   k_true=K, use_pallas="interpret")
    b_on, _, _ = admixture.em_step(params, md, cfg, want_ll=True)
    b_off, ll_b, _ = admixture.em_step(params, md, cfg, want_ll=False)
    np.testing.assert_array_equal(np.asarray(b_off.eta),
                                  np.asarray(b_on.eta))
    np.testing.assert_array_equal(np.asarray(b_off.p), np.asarray(b_on.p))
    assert float(df64.df_value(ll_b)) == 0.0


@pytest.mark.parametrize("use_pallas", ["off", "interpret"])
def test_check_interval_fit_same_optimum(setup, use_pallas):
    """A check_interval=4 fit reaches the same optimum as per-iteration
    checking, with n_iter a multiple of the interval and never fewer
    iterations (interval checking can only stop later)."""
    from multiclust_tpu.opt.driver import fit

    ds, md, params = setup
    base = EMConfig(admixture=True, abs_error=1e-2, max_iter=5000,
                    use_pallas=use_pallas)
    r1 = fit(params, md, base)
    r4 = fit(params, md, base._replace(check_interval=4))
    assert r1.converged and r4.converged, (r1.n_iter, r4.n_iter)
    assert r4.n_iter % 4 == 0
    assert r4.n_iter >= r1.n_iter
    # interval checking is conservative: it can only run LONGER (the
    # logL diff over 4 iterations must drop below abs_error), so the
    # interval fit is at least as good, and stays in the same basin
    assert r4.logL >= r1.logL - 1e-4
    assert abs(r4.logL - r1.logL) < 10.0


def test_check_interval_counts_blind_iters(setup):
    """blind_plain_steps advances n_iter and freezes stopped lanes."""
    from multiclust_tpu.opt import em as em_mod

    ds, md, params = setup
    cfg = EMConfig(admixture=True)
    state = em_mod.init_state(params, cfg)
    state = em_mod.blind_plain_steps(state, md, cfg, 3)
    assert int(state.n_iter) == 3
    stopped = state._replace(stopped=jnp.ones((), bool))
    frozen = em_mod.blind_plain_steps(stopped, md, cfg, 3)
    assert int(frozen.n_iter) == 3  # unchanged
    np.testing.assert_array_equal(np.asarray(frozen.params.eta),
                                  np.asarray(stopped.params.eta))


def test_check_interval_production_engine(setup):
    """The PRODUCTION multi-start engine honors --check-interval (fixed
    AND the adaptive default): same starts (identical keys), same best
    basin, at least as good an optimum (interval chains check later,
    never earlier).  The batched engine exercises per-lane adaptive
    intervals under vmap."""
    from multiclust_tpu.config import Options
    from multiclust_tpu.init.random import codes_from_counts
    from multiclust_tpu.runtime.multistart import maximize_likelihood

    ds, md, _ = setup
    codes = jnp.asarray(codes_from_counts(ds.counts, ds.miss, ds.ploidy))
    base = dict(admixture=True, n_init=3, batch_chains=3, min_K=3,
                max_K=3, n_rand_em_init=4, abs_error=1e-2, max_iter=3000)
    ref = maximize_likelihood(
        jax.random.PRNGKey(7), md, 3,
        Options(**base, check_interval=1).synchronize(ds.I, ds.ploidy),
        n_parameters=40, codes=codes)
    for ci in (4, 0):  # fixed interval and the adaptive default
        out = maximize_likelihood(
            jax.random.PRNGKey(7), md, 3,
            Options(**base, check_interval=ci).synchronize(ds.I, ds.ploidy),
            n_parameters=40, codes=codes)
        assert out.ever_converged
        assert out.max_logL >= ref.max_logL - 1e-3
        assert abs(out.max_logL - ref.max_logL) < 10.0


@pytest.mark.parametrize("use_pallas", ["off", "interpret"])
def test_check_interval_adaptive_fit(setup, use_pallas):
    """Adaptive check-interval (0, the production default) reaches the
    same optimum as per-iteration checking, and - because the interval
    resets to 1 once the per-iteration delta nears tolerance - stops at
    (nearly) the same iteration."""
    from multiclust_tpu.opt.driver import fit

    ds, md, params = setup
    base = EMConfig(admixture=True, abs_error=1e-2, max_iter=5000,
                    use_pallas=use_pallas)
    r1 = fit(params, md, base)
    ra = fit(params, md, base._replace(check_interval=0))
    assert r1.converged and ra.converged, (r1.n_iter, ra.n_iter)
    assert ra.logL >= r1.logL - 1e-4
    assert abs(ra.logL - r1.logL) < 10.0
    # near-convergence checks run at interval 1, so the stop point can
    # overshoot by at most the last blind run
    from multiclust_tpu.opt.em import ADAPTIVE_CAP
    assert r1.n_iter <= ra.n_iter <= r1.n_iter + ADAPTIVE_CAP, \
        (r1.n_iter, ra.n_iter)


@pytest.mark.slow
def test_bootstrap_lattice_bi_repr_matches_xla():
    """Batched bootstrap replicate lattices on biallelic panels carry the
    p0-representation (fused biallelic kernels under the replicate x init
    vmap lattice) and produce the same test statistics as the XLA path."""
    from multiclust_tpu.config import Options
    from multiclust_tpu.model.common import ModelData
    from multiclust_tpu.stats import bootstrap as bs
    import multiclust_tpu.runtime.multistart as ms

    rng = np.random.default_rng(51)
    I, L, K = 128, 40, 3
    p_true = rng.choice([0.2, 0.8], size=(2, L))
    eta_true = rng.dirichlet(np.full(2, 0.5), size=I)
    x0 = rng.binomial(2, eta_true @ p_true)
    counts = np.stack([x0, 2 - x0], axis=2)
    md = ModelData(x=jnp.asarray(counts, jnp.int8),
                   miss=jnp.zeros((I, L), jnp.float32),
                   mask=jnp.ones((L, 2), bool),
                   n_alleles=jnp.full((L,), 2, jnp.int32))
    h0 = Params(eta=jnp.asarray(eta_true, jnp.float32),
                p=jnp.asarray(np.stack([p_true, 1 - p_true], axis=2),
                              jnp.float32))
    base = dict(admixture=True, n_init=2, max_K=3, min_K=3, n_bootstrap=2,
                n_rand_em_init=2)

    orig = ms.cfg_from_options

    def interp(opt, Kk, mdd=None):
        return orig(opt, Kk, mdd)._replace(use_pallas="interpret")

    opt_x = Options(**base, use_pallas=False).synchronize(I, 2)
    ts_x = bs._batched_ts(jax.random.PRNGKey(9), md, opt_x, h0, 2, 2)

    ms.cfg_from_options = interp
    try:
        opt_b = Options(**base, use_pallas=True).synchronize(I, 2)
        assert interp(opt_b, 3, md).bi_repr_active
        ts_b = bs._batched_ts(jax.random.PRNGKey(9), md, opt_b, h0, 2, 2)
    finally:
        ms.cfg_from_options = orig
    assert ts_x.shape == ts_b.shape == (2,)
    assert np.all(np.isfinite(ts_b))
    # identical keys -> identical replicates/starts; kernels differ only
    # in rounding, and the LRT statistic is a difference of converged
    # max-logLs
    np.testing.assert_allclose(ts_b, ts_x, atol=0.5)


def test_layout_choosers():
    """pick_layout_biallelic prefers the minimum padded-Lp among
    admissible tiles (tie -> ladder/speed order; advisor round-2
    finding), and the streamed chooser's Kp-aware scoped-vmem model
    shrinks tiles as K grows instead of shipping a compile OOM."""
    from multiclust_tpu.ops.kernels import (_stream_vmem_fits,
                                            pick_layout_biallelic,
                                            pick_layout_biallelic_any,
                                            pick_layout_biallelic_streamed)

    # L=2560: (512,512) -> Lp=2560 beats (256,2048) -> Lp=4096
    ti, tl, Lp = pick_layout_biallelic(4096, 32, 2560)
    assert Lp == 2560, (ti, tl, Lp)
    # L=2048: Lp ties at 2048 -> the fastest ladder entry wins
    assert pick_layout_biallelic(4096, 32, 2048)[:2] == (256, 2048)

    # streamed: bigger Kp -> no bigger tiles than the calibrated budget
    t32 = pick_layout_biallelic_streamed(8192, 32, 131072)
    t512 = pick_layout_biallelic_streamed(8192, 512, 131072)
    assert t32[0] * t32[1] >= t512[0] * t512[1]
    assert not _stream_vmem_fits(1024, 2048, 32)   # measured 34.2 MB OOM
    assert not _stream_vmem_fits(256, 2048, 128)   # measured compile OOM
    assert _stream_vmem_fits(256, 2048, 32)        # measured OK

    # beyond the resident-copy ceiling the mode switches to the chained
    # one-pass chunked path (round 4); streamed remains the fallback when
    # no resident tile divides I at all
    assert pick_layout_biallelic_any(8192, 32, 16384)[3] == "resident"
    ti, tl, Lp, mode = pick_layout_biallelic_any(8192, 32, 131072)
    assert mode == "chunked" and Lp == 131072, (ti, tl, Lp, mode)

    from multiclust_tpu.ops.kernels import pick_layout_biallelic_chunked
    ti, tl, Lc, n_chunks = pick_layout_biallelic_chunked(8192, 32, 131072)
    # chunk budget is 3/4 of the 2M resident cap (no p0n VMEM-window
    # sharing) -> Lc_max = 12288 at Kp=32, and the divisor preference
    # lands on 8192 (16 launches, zero per-iteration x pads) on the
    # (256,512) tile that measured fastest at the biobank shape
    assert (ti, tl, Lc, n_chunks) == (256, 512, 8192, 16), \
        (ti, tl, Lc, n_chunks)
    # non-power-of-two L: padding spreads evenly and stays tl-aligned
    ti, tl, Lc, n_chunks = pick_layout_biallelic_chunked(8192, 32, 20000)
    assert Lc % tl == 0 and Lc * n_chunks >= 20000 \
        and Lc * (n_chunks - 1) < 20000 + tl, (ti, tl, Lc, n_chunks)
    # Kp scales the per-copy bytes: chunks shrink, count grows
    ti64, tl64, Lc64, n64 = pick_layout_biallelic_chunked(8192, 64, 131072)
    assert Lc64 <= Lc and n64 >= 8, (Lc64, n64)


def test_generic_layout_large_k_guard():
    """pick_layout/_fullstep_k_fits reject the probe-confirmed large-K
    compile-OOM tiles: (512,1024) at Kp=256 and (512,512) at Kp=512 OOM
    the real TPU's scoped vmem while (256,512) passes at both."""
    from multiclust_tpu.ops.kernels import _fullstep_k_fits, pick_layout

    assert _fullstep_k_fits(1024, 512, 128)
    assert not _fullstep_k_fits(512, 1024, 256)
    assert _fullstep_k_fits(512, 512, 256)
    assert not _fullstep_k_fits(512, 512, 512)
    assert _fullstep_k_fits(256, 512, 512)
    # a K=500 fit picks an admissible tile rather than a compile OOM
    ti, tl, LMp = pick_layout(2048, 512, 2048)
    assert (ti, tl) == (0, 0) or ti * tl <= 256 * 512


# ---------------------------------------------------------------------------
# mixture fullstep kernels (C7)

@pytest.mark.parametrize("variant", ["resident", "two-pass"])
@pytest.mark.parametrize("missing_rate", [0.0, 0.15])
def test_mixture_fullstep_matches_xla(missing_rate, variant, monkeypatch):
    """Fused biallelic mixture step (ops/kernels.mixture_sweep_resident
    single-pass / mixture_fullstep_biallelic two-pass, via
    model/mixture._em_step_bi_kernel) == the XLA path, covering the
    single-stream x1=ploidy-x0 fold (missing-free) and the two-stream
    missing-data variant, with I=70 exercising the row-pad/row_valid
    masking."""
    from multiclust_tpu.model import mixture
    from multiclust_tpu.model.common import ModelData

    if variant == "two-pass":  # force the fallback split
        import multiclust_tpu.ops.kernels as kmod
        monkeypatch.setattr(kmod, "pick_layout_mixture_resident",
                            lambda *a, **k: (0, 0, 0))

    rng = np.random.default_rng(5)
    I, L, K = 70, 50, 3
    miss = rng.binomial(2, missing_rate, size=(I, L))
    x0 = rng.binomial(2 - miss, rng.uniform(0.2, 0.8, size=(1, L)))
    counts = np.stack([x0, 2 - miss - x0], axis=2)
    md = ModelData(x=jnp.asarray(counts, jnp.int8),
                   miss=jnp.asarray(miss, jnp.int8),
                   mask=jnp.ones((L, 2), bool),
                   n_alleles=jnp.full((L,), 2, jnp.int32)
                   ).prepare_for_em(bi=True)
    p0t = rng.uniform(0.2, 0.8, size=(K, L))
    params = Params(eta=jnp.asarray(rng.dirichlet(np.full(K, 2.0)),
                                    jnp.float32),
                    p=jnp.asarray(np.stack([p0t, 1 - p0t], -1), jnp.float32))
    cfg_x = EMConfig(admixture=False, biallelic=True,
                     has_missing=missing_rate > 0, ploidy=2)
    cfg_k = cfg_x._replace(use_pallas="interpret")

    ref, llr, _, vr = mixture.em_step(params, md, cfg_x)
    assert mixture._kernel_ok(md, cfg_k, params)
    new, llk, _, vk = mixture.em_step(params, md, cfg_k)
    np.testing.assert_allclose(np.asarray(vk), np.asarray(vr),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new.eta), np.asarray(ref.eta),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new.p), np.asarray(ref.p),
                               rtol=2e-4, atol=1e-5)
    assert abs(float(df64.df_value(llk)) - float(df64.df_value(llr))) < 1e-2


def test_mixture_kernel_production_engine():
    """The multi-start engine reaches the same optimum through the fused
    mixture kernels as through XLA (mixture fits dispatch inside
    model/mixture.em_step - no engine plumbing)."""
    from multiclust_tpu.config import Options
    from multiclust_tpu.model.common import ModelData
    from multiclust_tpu.runtime.multistart import maximize_likelihood

    rng = np.random.default_rng(9)
    I, L, K = 48, 30, 2
    pop = rng.integers(0, 2, I)
    freq = np.where(pop[:, None] == 0,
                    rng.uniform(0.7, 0.95, (1, L)),
                    rng.uniform(0.05, 0.3, (1, L)))
    x0 = rng.binomial(2, freq)
    counts = np.stack([x0, 2 - x0], axis=2)
    md = ModelData(x=jnp.asarray(counts, jnp.int8),
                   miss=jnp.zeros((I, L), jnp.int8),
                   mask=jnp.ones((L, 2), bool),
                   n_alleles=jnp.full((L,), 2, jnp.int32))
    results = {}
    for up in (False, True):
        opt = Options(admixture=False, n_init=3, min_K=K, max_K=K,
                      use_pallas=up, batch_chains=3)
        opt = opt.synchronize(I, 2)
        import multiclust_tpu.runtime.multistart as ms
        orig = ms.cfg_from_options
        if up:  # CPU tests: interpret-mode kernels
            ms.cfg_from_options = lambda o, k, m=None: orig(
                o, k, m)._replace(use_pallas="interpret")
        try:
            res = maximize_likelihood(jax.random.PRNGKey(1), md, K, opt,
                                      n_parameters=2 * L + 1)
        finally:
            ms.cfg_from_options = orig
        results[up] = res
    assert np.isfinite(results[True].max_logL)
    assert abs(results[True].max_logL - results[False].max_logL) < 0.5
    assert results[True].ever_converged


def test_mixture_layout_chooser():
    from multiclust_tpu.ops.kernels import pick_layout_mixture

    ti, tl, Ip, Lp = pick_layout_mixture(70, 32, 50, with_x1=False)
    assert ti and Ip % ti == 0 and Lp % tl == 0 and Ip >= 70 and Lp >= 50
    # two-stream variant never picks a bigger tile than single-stream
    t1 = pick_layout_mixture(16384, 128, 2048, with_x1=False)
    t2 = pick_layout_mixture(16384, 128, 2048, with_x1=True)
    assert t1[0] * t1[1] >= t2[0] * t2[1]


def test_large_k_ladder_admission():
    """Round-5 large-K calibration points (real-TPU probe outcomes) are
    encoded in the admission models; beyond the verified Kp=1024 ceiling
    every admission refuses and the engine takes the XLA fallback."""
    from multiclust_tpu.ops.kernels import _bi_k_fits, _fullstep_k_fits, \
        _stream_vmem_fits, pick_layout

    # generic fullstep: (256,512) OOMs at 768/1024; (128,512) passes
    # plain at both but its jagged-CHAIN binding OOMs at 1024
    assert _fullstep_k_fits(128, 512, 768)
    assert _fullstep_k_fits(64, 512, 1024)
    assert not _fullstep_k_fits(128, 512, 1024)
    assert not _fullstep_k_fits(256, 512, 768)
    assert not _fullstep_k_fits(64, 512, 1056)
    assert pick_layout(1024, 1056, 4096) == (0, 0, 0)
    # streamed: measured pass/fail boundary per Kp ((64,512)@768 OOMs
    # in its logL-free binding, so tl caps at 256 beyond Kp=512)
    assert _stream_vmem_fits(256, 512, 512)
    assert not _stream_vmem_fits(512, 512, 512)  # flaky edge: refused
    assert not _stream_vmem_fits(256, 1024, 512)
    assert _stream_vmem_fits(64, 256, 768)
    assert not _stream_vmem_fits(64, 512, 768)
    assert not _stream_vmem_fits(128, 512, 768)
    assert _stream_vmem_fits(64, 256, 1024)
    assert not _stream_vmem_fits(64, 512, 1024)
    assert not _stream_vmem_fits(64, 128, 1056)
    # resident biallelic: the calibrated exclusions (full-sweep round 5)
    assert not _bi_k_fits(1024, 256, 512)
    assert _bi_k_fits(512, 256, 512) and _bi_k_fits(256, 512, 768)
    assert not _bi_k_fits(256, 512, 1024)  # project_eta binding OOMs
    assert _bi_k_fits(128, 512, 1024)
    assert not _bi_k_fits(512, 256, 1024, emit_b=True)
    assert _bi_k_fits(256, 256, 1024, emit_b=True)
    assert not _bi_k_fits(64, 128, 1056)
    # chunk bindings: verified region is Kp <= 128
    from multiclust_tpu.ops.kernels import pick_layout_biallelic_chunked
    assert pick_layout_biallelic_chunked(4096, 128, 65536)[0]
    assert pick_layout_biallelic_chunked(4096, 256, 65536) == (0, 0, 0, 0)


def test_k_beyond_ladder_xla_fallback(rng):
    """K lanes beyond the verified ladder: the pallas step dispatches to
    the XLA formulation (with a one-time stderr notice) instead of
    trusting an uncalibrated compile."""
    from multiclust_tpu.stats.sim import random_model, \
        simulate_admixture_fast

    K, I, L = 3, 8, 16
    Q, P = random_model(rng, K, L, 2, I=I)
    ds = simulate_admixture_fast(rng, Q, P, ploidy=2)
    md = model_data_from_dataset(ds, dtype=jnp.float32).prepare_for_em()
    Kp = 1056  # 33 * 32: beyond the 1024 ceiling
    eta = jnp.zeros((I, Kp), jnp.float32).at[:, :K].set(
        jnp.asarray(rng.dirichlet(np.ones(K), size=I), jnp.float32))
    p = jnp.zeros((Kp, L, 2), jnp.float32).at[:K].set(
        jnp.asarray(rng.dirichlet(np.ones(2), size=(K, L)), jnp.float32))
    params = Params(eta=eta, p=p)
    cfg = EMConfig(admixture=True, use_pallas="interpret", k_true=K,
                   biallelic=True, has_missing=False)
    ref, ll_r, _ = admixture._em_step_unconstrained(params, md, cfg)
    got, ll_g, _ = admixture.em_step(params, md, cfg)
    np.testing.assert_allclose(np.asarray(got.eta), np.asarray(ref.eta),
                               rtol=1e-6, atol=1e-7)
    assert abs(float(df64.df_value(ll_g))
               - float(df64.df_value(ll_r))) < 1e-3
