"""Benchmark: admixture EM throughput vs the C reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: genotype-cells/sec/chip for the admixture EM sweep at K=20
(BASELINE.md).  A "cell" is one (individual, locus, allele) entry of the
dense sufficient-statistics tensor touched per EM iteration (= I*L*M).

Baseline: the compiled reference binary's EM throughput on the same model
family, measured via its own iteration counter on a scaled-down dataset
(the reference is single-threaded C; its per-cell rate is size-independent
once out of cache).  vs_baseline = ours / reference.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import time

import numpy as np

REF_SRC = "/root/reference"
REF_BUILD = "/tmp/refbuild"
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_ref_cache.json")


# v5e bf16 peak (the MXU pass rate XLA/Mosaic use for f32 matmuls here)
PEAK_FLOPS = 197e12


def our_throughput(I=16384, L=2048, M=2, K=20, steps=400, repeats=3,
                   interval=None):
    # steps amortize the ~25ms scalar-fetch round trip through the axon
    # tunnel; at 400 steps the reported rate is within ~3% of device rate
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from multiclust_tpu.model.admixture import em_step
    from multiclust_tpu.model.common import EMConfig, ModelData, Params, \
        k_padded_size, pad_params_k

    # BENCH_MODEL=mixture benchmarks the mixture family (C7: fused Pallas
    # step when BENCH_PALLAS=1 and the panel is biallelic, XLA otherwise)
    mixture_model = os.environ.get("BENCH_MODEL", "admixture") == "mixture"
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    biallelic = M == 2 and os.environ.get("BENCH_BIALLELIC", "1") == "1"
    # BENCH_MISSING=rate (e.g. 0.02) benchmarks the missing-data fast path:
    # the biallelic kernel streams miss per tile and folds C = eta^T @ miss
    # into the B matmuls in-kernel (em_alg.c:400-431)
    miss_rate = float(os.environ.get("BENCH_MISSING", "0"))
    if miss_rate > 0 and M != 2:
        raise SystemExit("BENCH_MISSING is only generated for the "
                         "biallelic bench shapes (BENCH_M=2)")
    # mirror the engine's device policy (config.Options.device_policy):
    # int8 genotype storage on every accelerator f32 fit (the XLA paths
    # fuse the widening cast into the matmuls)
    cfg = EMConfig(admixture=not mixture_model,
                   use_pallas="on" if use_pallas else "off",
                   has_missing=miss_rate > 0, biallelic=biallelic,
                   k_true=K if (use_pallas and not mixture_model) else 0)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    ploidy = 2
    storage = jnp.int8
    miss = None
    if M == 2:
        # biobank-capable generation: chunk the bernoulli draws over rows
        # so the f32 uniforms never exceed ~2 GB (a one_hot over [I, L, P]
        # int32 draws costs 2 x I*L bytes PER PLOIDY in f32 - 32 GB at the
        # large config - and OOMs 16 GB HBM before the fit even starts)
        rows = max(1, min(I, (1 << 29) // max(L, 1)))
        if miss_rate > 0:
            rows = max(1, rows // 2)  # two uniform draws live per chunk
        chunks = []
        miss_chunks = []
        kk = k1
        for i0 in range(0, I, rows):
            kk, sub = jax.random.split(kk)
            n = min(rows, I - i0)
            u = jax.random.uniform(sub, (ploidy, n, L))
            if miss_rate > 0:
                kk, sub2 = jax.random.split(kk)
                um = jax.random.uniform(sub2, (ploidy, n, L))
                mc = jnp.sum(um < miss_rate, axis=0).astype(jnp.int8)
                miss_chunks.append(mc)
                chunks.append(
                    jnp.minimum(jnp.sum(u < 0.5, axis=0),
                                ploidy - mc).astype(jnp.int8))
            else:
                chunks.append(jnp.sum(u < 0.5, axis=0).astype(jnp.int8))
        x0 = jnp.concatenate(chunks, axis=0)
        if miss_rate > 0:
            miss = jnp.concatenate(miss_chunks, axis=0)
            counts = jnp.stack([x0, ploidy - miss - x0],
                               axis=-1).astype(storage)
        else:
            counts = jnp.stack([x0, ploidy - x0], axis=-1).astype(storage)
        del x0, chunks
    else:
        draws = jax.random.randint(k1, (I, L, ploidy), 0, M)
        counts = jnp.zeros((I, L, M), jnp.float32)
        for a in range(ploidy):
            counts = counts + jax.nn.one_hot(draws[:, :, a], M,
                                             dtype=jnp.float32)
        counts = counts.astype(storage)
    # miss stays int8 (production storage mode, model/common.ModelData
    # .dtype): a compute-dtype miss alone is 4.3 GB at the large config
    # and 200 GB at true biobank scale; every consumer casts fused
    md = ModelData(x=counts,
                   miss=(miss if miss is not None
                         else jnp.zeros((I, L), jnp.int8)),
                   mask=jnp.ones((L, M), bool),
                   n_alleles=jnp.full((L,), M, jnp.int32))
    eta = (jax.random.dirichlet(k2, jnp.full((K,), 2.0))
           if mixture_model
           else jax.random.dirichlet(k2, jnp.full((K,), 2.0), (I,)))
    p = jax.random.dirichlet(k3, jnp.full((M,), 1.0), (K, L))
    params = Params(eta=eta.astype(jnp.float32), p=p.astype(jnp.float32))
    if use_pallas and not mixture_model:
        # production layout (runtime/multistart): K-padded lanes (32 for
        # the biallelic kernel, 128 otherwise) and the p0-representation
        # when biallelic, so no per-iteration relayout is needed
        from multiclust_tpu.runtime.multistart import _pad_k, _to_bi_repr
        params = _pad_k(params, cfg)
        params = _to_bi_repr(params, cfg, I, L)

    # BENCH_INTERVAL measures the --check-interval path: N-1 logL-free
    # iterations (want_ll=False skips the per-cell logs, the dominant VPU
    # cost at small K) per full stop()-checked step.  The production
    # default is ADAPTIVE (config.Options.check_interval=0), which sits at
    # the escalation cap for the bulk of any non-trivial fit - so the
    # bench default mirrors that steady state (opt/em.ADAPTIVE_CAP = 16);
    # BENCH_INTERVAL=1 measures reference per-iteration semantics.  The
    # driver JSON reports BOTH (main() second pass at interval=1) so
    # cross-round comparisons cannot silently mix semantics.
    if interval is None:
        interval = max(1, int(os.environ.get("BENCH_INTERVAL", "16")))
    n_macro = max(1, steps // interval)
    steps = n_macro * interval

    # pass md as an argument: closing over it would embed the genotype
    # tensor as an HLO constant (huge programs; the axon remote-compile
    # relay rejects them with HTTP 413)
    if mixture_model:
        from multiclust_tpu.model.mixture import em_step as mix_em_step

    @jax.jit
    def run(params, md):
        md = md.prepare_for_em(bi=cfg.bi_repr_active or cfg.biallelic)
        if mixture_model:
            # the mixture logL falls out of the E-step softmax for free;
            # there is no logL-free variant to interleave
            def macro(_, p):
                return mix_em_step(p, md, cfg)[0]
            return jax.lax.fori_loop(0, steps, macro, params)
        def blind(_, p):
            new, _, _ = em_step(p, md, cfg, want_ll=False)
            return new
        def macro(_, p):
            if interval > 1:
                p = jax.lax.fori_loop(0, interval - 1, blind, p)
            new, _, _ = em_step(p, md, cfg)
            return new
        return jax.lax.fori_loop(0, n_macro, macro, params)

    # Through the remote-execution tunnel block_until_ready can return
    # before the computation finishes; force completion with a scalar
    # device->host fetch (costs ~30ms, amortized over `steps`).
    float(run(params, md).p.reshape(-1)[0])       # compile + warmup
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(params, md).p.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    iters_per_sec = steps / best
    cells_per_sec = I * L * M * iters_per_sec
    # useful-FLOP MFU: only the 3 matmul contractions over the TRUE K per
    # genotype cell count as useful work (2*K FLOPs each); K-lane padding,
    # recomputed denominators and elementwise ops do not
    useful_flops = cells_per_sec * 3 * 2 * K
    return {
        "I": I, "L": L, "M": M, "K": K,
        "iters_per_sec": iters_per_sec,
        "cells_per_sec": cells_per_sec,
        "useful_mfu": useful_flops / PEAK_FLOPS,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }


def jagged_throughput(I=16384, L=2048, K=20, frac_snp=0.8, M_big=8,
                      steps=400, repeats=3):
    """BENCH_JAGGED=1: mixed-M panel (frac_snp M=2 loci + the rest
    M=8, interleaved).  Reports USEFUL genotype-cells/s (I * sum_l M_l
    per sweep) for the bucketed representation (model/bucketed.py);
    BENCH_BUCKETED=0 measures the dense M_max-padded layout for the
    waste comparison."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from multiclust_tpu.model.admixture import em_step
    from multiclust_tpu.model.bucketed import bucketize_model_data, \
        jagged_savings, plan_buckets
    from multiclust_tpu.model.common import EMConfig, ModelData, Params

    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    bucketed = os.environ.get("BENCH_BUCKETED", "1") == "1"
    rng = np.random.default_rng(0)
    Ml = np.where(rng.random(L) < frac_snp, 2, M_big)
    M = int(Ml.max())
    # synthetic counts: 2 copies per (i, l) over the locus's own lanes
    lanes = np.minimum(rng.integers(0, M_big, size=(2, I, L)),
                       Ml[None, None, :] - 1)
    counts = np.zeros((I, L, M), np.int8)
    for a in range(2):
        np.add.at(counts, (np.arange(I)[:, None],
                           np.arange(L)[None, :], lanes[a]), 1)
    md = ModelData(x=jnp.asarray(counts),
                   miss=jnp.zeros((I, L), jnp.int8),
                   mask=jnp.asarray(np.arange(M)[None] < Ml[:, None]),
                   n_alleles=jnp.asarray(Ml, jnp.int32))
    p = rng.random((K, L, M)) * (np.arange(M)[None, None]
                                 < Ml[None, :, None])
    p = p / p.sum(2, keepdims=True)
    eta = rng.dirichlet(np.full(K, 2.0), size=I)
    params = Params(eta=jnp.asarray(eta, jnp.float32),
                    p=jnp.asarray(p, jnp.float32))
    cfg = EMConfig(admixture=True, has_missing=False,
                   use_pallas="on" if use_pallas else "off",
                   k_true=K if use_pallas else 0)
    if use_pallas:
        from multiclust_tpu.runtime.multistart import _pad_k
        params = _pad_k(params, cfg)
    md_fit = md
    if bucketed:
        # TIGHT plan (production selection, runtime/multistart): the
        # fused single-launch kernel only needs the concatenated lane
        # total tile-aligned, not each bucket
        plan = plan_buckets(Ml, M, tight=True)
        md_fit = bucketize_model_data(md, plan)

    # mirror the main bench's adaptive-steady-state semantics
    interval = max(1, int(os.environ.get("BENCH_INTERVAL", "16")))
    n_macro = max(1, steps // interval)
    steps = n_macro * interval

    @jax.jit
    def run(params, md_fit):
        md_p = md_fit.prepare_for_em()
        if bucketed:
            # the loop carry must already hold the per-bucket tuple p
            from multiclust_tpu.model.bucketed import split_params_like
            params0 = split_params_like(params, md_p)
        else:
            params0 = params
        def blind(_, pp):
            new, _, _ = em_step(pp, md_p, cfg, want_ll=False)
            return new
        def macro(_, pp):
            if interval > 1:
                pp = jax.lax.fori_loop(0, interval - 1, blind, pp)
            new, _, _ = em_step(pp, md_p, cfg)
            return new
        return jax.lax.fori_loop(0, n_macro, macro, params0)

    out = run(params, md_fit)
    float(jax.tree_util.tree_leaves(out.p)[0].reshape(-1)[0])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jax.tree_util.tree_leaves(
            run(params, md_fit).p)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    useful_cells = int(np.sum(Ml)) * I
    return {
        "I": I, "L": L, "M": M, "K": K,
        "cells_per_sec": useful_cells * steps / best,
        "useful_mfu": 0.0,
        "padding_waste": jagged_savings(Ml),
        "bucketed": bucketed,
    }


def reference_throughput(I=200, L=500, K=20, max_iter=100):
    """Measure the reference binary's admixture EM cells/sec."""
    if os.path.exists(CACHE):
        try:
            with open(CACHE) as fh:
                return json.load(fh)
        except Exception:
            pass
    binary = os.path.join(REF_BUILD, "multiclust")
    if not os.path.exists(binary):
        os.makedirs(REF_BUILD, exist_ok=True)
        for f in os.listdir(REF_SRC):
            if f.endswith((".c", ".h")) or f == "makefile":
                shutil.copy(os.path.join(REF_SRC, f), REF_BUILD)
        subprocess.run(["make"], cwd=REF_BUILD, check=True,
                       capture_output=True)

    # biallelic STRUCTURE file
    rng = np.random.default_rng(0)
    data = os.path.join(REF_BUILD, "bench.str")
    with open(data, "w") as fh:
        fh.write(" ".join(f"l{i}" for i in range(L)) + "\n")
        for i in range(I):
            for a in range(2):
                fh.write(f"i{i} p0 "
                         + " ".join(map(str, rng.integers(0, 2, L))) + "\n")

    # count per-iteration trace lines (verbosity > MINIMAL prints one per
    # EM iteration, stop() em_alg.c:123-136) and time the whole run; EM
    # iterations dominate the wall clock at -T 100
    t0 = time.perf_counter()
    out = subprocess.run(
        [binary, "-f", "bench.str", "-a", "-k", str(K), "-n", "1",
         "-m", "0", "-T", str(max_iter), "-w", "n", "1", "-v", "4"],
        cwd=REF_BUILD, capture_output=True, text=True, timeout=600)
    secs = time.perf_counter() - t0
    iters = len(re.findall(r"^ *\d+ \(", out.stderr, re.M))
    if iters == 0:
        raise RuntimeError("no iteration trace found in reference output")
    cells = I * L * 2  # T = sum_l M_l = 2L for biallelic
    result = {"I": I, "L": L, "K": K, "iters": iters, "seconds": secs,
              "cells_per_sec": cells * iters / secs}
    with open(CACHE, "w") as fh:
        json.dump(result, fh)
    return result


def main():
    size = os.environ.get("BENCH_SIZE", "full")
    # BENCH_M > 2 benchmarks the multi-allelic generic kernels (e.g.
    # microsatellite panels); the biallelic specializations gate on M == 2
    bench_m = int(os.environ.get("BENCH_M", "2"))
    # BENCH_K sweeps the cluster count (reference -k is unbounded,
    # multiclust.c:1447-1453); large K exercises the ladder admission
    # models' calibrated fallbacks (resident -> streamed -> generic)
    bench_k = int(os.environ.get("BENCH_K", "20"))
    # second measurement pass at check-interval 1 (reference per-iteration
    # stop semantics, em_alg.c:101-143) so the JSON is self-describing;
    # skipped when the user pins BENCH_INTERVAL=1 (then value IS interval-1)
    def interval1(**kw):
        if int(os.environ.get("BENCH_INTERVAL", "16")) == 1:
            return None
        # keep the full step count: fewer steps under-amortize the
        # ~30 ms tunnel scalar-fetch and understate the rate
        kw.setdefault("repeats", 2)
        return our_throughput(interval=1, **kw)

    if os.environ.get("BENCH_JAGGED", "0") == "1":
        ours = jagged_throughput()
        ours1 = None
    elif size == "small":
        ours = our_throughput(I=2048, L=512, M=bench_m, steps=10,
                              repeats=2)
        ours1 = interval1(I=2048, L=512, M=bench_m, steps=10)
    elif size == "large":
        # biobank-scale single-chip config (BASELINE.md config 5): 65k
        # individuals x 16k SNPs.  Since the VMEM-budget fix this runs the
        # (256,512)-tiled biallelic fullstep (206.7 Gcells/s); set
        # BENCH_BIALLELIC=0 to force the generic path and measure the
        # two-pass sweep kernels (B streamed to HBM) instead.  int8
        # genotypes are 2 GB unpadded but XLA lays [I, L, 2] out at 2x
        # (M padded to the 4-sublane tile) and the one-time x_flat
        # relayout keeps a second copy live, so budget ~6 GB for x
        # steps=60: ~0.6 s device time/run - the 20-step config paid
        # ~14% of tunnel scalar-fetch amortization (round-4 finding)
        ours = our_throughput(I=65536, L=16384, M=2, K=20, steps=60,
                              repeats=2)
        ours1 = interval1(I=65536, L=16384, M=2, K=20, steps=60)
    elif size == "xl":
        # biobank-L single-chip config: Lp far beyond the resident-B
        # ceiling (16384 at Kp=32), so the chained ONE-PASS chunked path
        # runs (ops/kernels.admixture_fullstep_biallelic_chunked; the
        # two-pass streamed kernels remain the fallback when no resident
        # tile divides I); I scaled down to keep the int8 genotype
        # tensors inside HBM
        ours = our_throughput(I=8192, L=131072, M=2, K=20, steps=60,
                              repeats=2)
        ours1 = interval1(I=8192, L=131072, M=2, K=20, steps=60)
    else:
        ours = our_throughput(M=bench_m, K=bench_k)
        ours1 = interval1(M=bench_m, K=bench_k)
    try:
        ref = reference_throughput()
        vs = ours["cells_per_sec"] / ref["cells_per_sec"]
    except Exception as e:
        print(f"# reference baseline unavailable: {e}", file=sys.stderr)
        ref = None
        vs = 0.0
    model = os.environ.get("BENCH_MODEL", "admixture")
    out = {
        "metric": f"{model} EM genotype-cells/sec/chip (K={ours['K']})",
        "value": round(ours["cells_per_sec"], 1),
        "unit": "cells/s",
        "vs_baseline": round(vs, 2),
        "useful_mfu": round(ours["useful_mfu"], 4),
        "shape": [ours["I"], ours["L"], ours["M"]],
        # value = adaptive-check-interval steady state (the production
        # default); value_interval1 = reference per-iteration stop
        # semantics (logL computed every EM iteration)
        "value_interval1": round((ours1 or ours)["cells_per_sec"], 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
