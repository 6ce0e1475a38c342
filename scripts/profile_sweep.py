"""Profile the admixture EM sweep variants on the current backend.

Usage: python scripts/profile_sweep.py [I L M K steps]

Times (per EM iteration) the XLA path, the two-pass Pallas kernels and the
single-pass fused kernel, each with f32 and int8 genotype storage, plus the
kernel-only sweep (no eta/p normalization) to locate the bottleneck.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from multiclust_tpu.model.admixture import em_step
from multiclust_tpu.model.common import EMConfig, ModelData, Params
from multiclust_tpu.ops.kernels import (admixture_sweep_fused,
                                        admixture_sweep_stats, fused_fits,
                                        pad_for_kernel)


def make_problem(I, L, M, K, storage):
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    draws = jax.random.randint(k1, (I, L, 2), 0, M)
    counts = jnp.zeros((I, L, M), jnp.float32)
    for a in range(2):
        counts = counts + jax.nn.one_hot(draws[:, :, a], M, dtype=jnp.float32)
    md = ModelData(x=counts.astype(storage),
                   miss=jnp.zeros((I, L), jnp.float32),
                   mask=jnp.ones((L, M), bool),
                   n_alleles=jnp.full((L,), M, jnp.int32))
    eta = jax.random.dirichlet(k2, jnp.full((K,), 2.0), (I,))
    p = jax.random.dirichlet(k3, jnp.full((M,), 1.0), (K, L))
    return Params(eta=eta.astype(jnp.float32),
                  p=p.astype(jnp.float32)), md


def time_step(fn, *args, steps=50, repeats=3):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])          # compile + warmup, forced fetch
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jax.tree_util.tree_leaves(fn(*args))[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    argv = [int(a) for a in sys.argv[1:]]
    I, L, M, K, steps = (argv + [16384, 2048, 2, 20, 50])[:5]
    cells = I * L * M
    print(f"# I={I} L={L} M={M} K={K} steps={steps} "
          f"device={jax.devices()[0]}")

    for storage in (jnp.float32, jnp.int8):
        params, md = make_problem(I, L, M, K, storage)
        sname = jnp.dtype(storage).name

        for label, cfg in (("xla", EMConfig(admixture=True, use_pallas="off")),
                           ("pallas", EMConfig(admixture=True,
                                               use_pallas="on"))):
            @jax.jit
            def run(params, md, cfg=cfg):
                def body(_, p):
                    new, _, _ = em_step(p, md_c, cfg)
                    return new
                md_c = md
                return jax.lax.fori_loop(0, steps, body, params)

            dt = time_step(lambda p, m: run(p, m).p, params, md,
                           steps=1) / steps
            print(f"{sname:8s} {label:12s} {dt*1e3:8.3f} ms/iter "
                  f"{cells/dt/1e9:8.2f} Gcells/s")

        # kernel-only timings
        p2 = params.p.reshape(K, -1)
        x2 = md.x.reshape(I, L * M)
        eta_p, p2_p, x2_p, _ = pad_for_kernel(params.eta, p2, x2)

        @jax.jit
        def run_two(eta_p, p2_p, x2_p):
            def body(_, c):
                a, t, b = admixture_sweep_stats(eta_p, p2_p, x2_p)
                return c + t[0]
            return jax.lax.fori_loop(0, steps, body, 0.0)

        dt = time_step(lambda *a: run_two(*a), eta_p, p2_p, x2_p,
                       steps=1) / steps
        print(f"{sname:8s} {'two-kernel':12s} {dt*1e3:8.3f} ms/iter "
              f"{cells/dt/1e9:8.2f} Gcells/s")

        if fused_fits(eta_p.shape[1], p2_p.shape[1]):
            @jax.jit
            def run_fused(eta_p, p2_p, x2_p):
                def body(_, c):
                    a, t, b = admixture_sweep_fused(eta_p, p2_p, x2_p)
                    return c + t[0]
                return jax.lax.fori_loop(0, steps, body, 0.0)

            dt = time_step(lambda *a: run_fused(*a), eta_p, p2_p, x2_p,
                           steps=1) / steps
            print(f"{sname:8s} {'fused-kernel':12s} {dt*1e3:8.3f} ms/iter "
                  f"{cells/dt/1e9:8.2f} Gcells/s")


if __name__ == "__main__":
    main()
